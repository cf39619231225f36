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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key_n(cols: Sequence[Column], bits: int = 16) -> Column:
    """Round-robin bit interleave over N non-negative integer
    columns (the general Delta/Iceberg ``OPTIMIZE ZORDER BY (c1,
    ..., cN)`` key): bit i of column j lands at position ``i*N + j``
    — dimension j=0 holds the lowest bit of each round, matching the
    2-column layout (c1 at 2i, c2 at 2i+1). ``N*bits ≤ 62`` keeps
    the key in signed-64 range.

    Pure bitwise/additive JVM expressions (shiftright / AND /
    constant multiplies) — identical in any SQL engine, no UDF.
    """
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key_n needs at least one column")
    if not 1 <= bits <= 62:
        raise ValueError(f"bits must be in [1, 62], got {bits}")
    if n * bits > 62:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} key bits; "
            "n*bits must be <= 62 to stay in signed-64 range"
        )
    z: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z + (
                F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1))
                * F.lit(1 << (i * n + j))
            )
    return z.cast("bigint")


def zorder_key_n_sql(cols: Sequence[str], bits: int = 16) -> str:
    """The DuckDB/ANSI twin of `zorder_key_n` (oracle +
    documentation of exactly what the JVM expression computes)."""
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(f"(({c} >> {i}) & 1) * {1 << (i * n + j)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Two-dimensional Morton key — ``zorder_key_n([c1, c2], bits)``
    (bit i of ``c1`` at position 2i, of ``c2`` at 2i+1)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    return zorder_key_n([c1, c2], bits)


def zorder_key_sql(c1: str, c2: str, bits: int = 16) -> str:
    """The DuckDB/ANSI twin of `zorder_key`."""
    return zorder_key_n_sql([c1, c2], bits)


def cluster_by_zorder(
    df: DataFrame,
    c1: str,
    c2: str,
    bits: int = 16,
    partitions: int | None = None,
    *more_cols: str,
) -> DataFrame:
    """Physically cluster ``df`` for multi-dimensional data skipping:
    range-partition + sort by the Morton key of (c1, c2,
    *more_cols), ready for a parquet write whose row-group min/max
    stats prune on ANY of the dimensions. The range exchange
    replaces (not adds to) the repartition a bulk write performs
    anyway."""
    cols = [F.col(c) for c in (c1, c2, *more_cols)]
    keyed = df.withColumn("__z", zorder_key_n(cols, bits))
    parted = (
        keyed.repartitionByRange(partitions, "__z")
        if partitions
        else keyed.repartitionByRange("__z")
    )
    return parted.sortWithinPartitions("__z").drop("__z")
