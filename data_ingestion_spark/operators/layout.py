"""Storage-layout operators: multi-dimensional clustering for data
skipping.

Reference anchor: the reference writes flat parquet between stages
(ingestion-pipeline.py artifact passing) with no layout control. At
100 TB, layout IS the query plan: parquet row-group min/max stats
prune scans only when rows with similar values sit together, and a
table queried by TWO dimensions (user AND time window; host AND
crawl date) cannot be sorted to serve both — unless it is sorted by
a space-filling curve. Z-ordering (bit interleaving) is the standard
answer (Delta/Iceberg OPTIMIZE ZORDER); this module is that key,
computed as pure JVM bit arithmetic so any writer can
``repartitionByRange`` + sort by it.

Scale notes:
- The z-key is scan-side scalar math — zero shuffles to compute; the
  one range-exchange in `cluster_by_zorder` replaces the write's
  existing repartition, it does not add one.
- Interleaving low bits assumes the caller pre-bucketed each
  dimension into [0, 2^bits) (modulo id, days-since-epoch, …).
  Range-normalizing arbitrary values needs a stats pass — that is a
  caller decision (one `approxQuantile` job), not hidden cost here.
- Pruning math: sorting by z over b-bit buckets gives row groups
  whose span in EACH dimension shrinks ~sqrt of the single-sort
  case — a two-dim selective filter prunes on both predicates
  instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a single BIGINT Morton key: bit i of ``c1`` lands at
    position 2i, bit i of ``c2`` at 2i+1 (c2 is the high dimension of
    each pair). 2*bits ≤ 62 keeps the key in signed-64 range.

    Pure bitwise/additive JVM expressions (shiftright / AND /
    constant multiplies) — identical in any SQL engine, no UDF.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    z: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + (F.shiftright(c1.cast("bigint"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
        z = z + (F.shiftright(c2.cast("bigint"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
    return z.cast("bigint")


def zorder_key_sql(c1: str, c2: str, bits: int = 16) -> str:
    """The DuckDB/ANSI twin of `zorder_key` (oracle + documentation
    of exactly what the JVM expression computes)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({c1} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({c2} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def cluster_by_zorder(
    df: DataFrame,
    c1: str,
    c2: str,
    bits: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    """Physically cluster ``df`` for two-dimensional data skipping:
    range-partition + sort by the Morton key of (c1, c2), ready for a
    parquet write whose row-group min/max stats prune on EITHER
    dimension. The range exchange replaces (not adds to) the
    repartition a bulk write performs anyway."""
    keyed = df.withColumn("__z", zorder_key(F.col(c1), F.col(c2), bits))
    parted = (
        keyed.repartitionByRange(partitions, "__z")
        if partitions
        else keyed.repartitionByRange("__z")
    )
    return parted.sortWithinPartitions("__z").drop("__z")
