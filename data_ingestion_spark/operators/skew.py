"""Skew-mitigation operators (SURVEY.md §7.3: one product dominates).

The reference's corpus is skewed by construction — one product's docs
dwarf the others (ingestion-pipeline.py:18-38) — and at 100 TB a
single hot key (one collection, one ubiquitous shingle) turns a
groupBy into one straggler task. Two standard remedies, both plain
DataFrame composition:

- ``salted_group_count``: two-stage aggregation — salt the key into
  ``buckets`` sub-keys, partial-count per (key, salt), then re-agg per
  key. The result is bit-identical to a plain groupBy count (the
  oracle for the driver check IS the plain count), but the first
  shuffle spreads each hot key over ``buckets`` reducers.
- ``salted_broadcast_left``: for joins where the build side is small
  but the probe side has hot keys, broadcasting already avoids
  shuffling the skewed side; included as the decision rule — salt the
  *aggregation*, broadcast the *join*, and let AQE's skew-join
  handling cover sort-merge cases.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType


def _contains_map(dt: DataType) -> bool:
    """True when a type embeds a MapType anywhere — xxhash64 raises
    on maps (unordered, no canonical hash), so such columns can't
    feed the content salt."""
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _row_salt(df: DataFrame, buckets: int, salt_cols: list[str] | None) -> Column:
    """Content-derived salt: hash of ``salt_cols`` (default: every
    hashable column — map-bearing columns are excluded, since
    ``xxhash64`` raises AnalysisException on MapType). Any assignment
    is correct for an algebraic aggregate — collisions just share a
    bucket — but deriving it from row CONTENT (not
    ``monotonically_increasing_id``, which depends on partition
    layout) makes task retries and re-runs row-for-row deterministic.

    Caveat: byte-identical rows hash to ONE bucket, so a hot key made
    of duplicate rows is NOT fanned out by the default salt — pass
    ``salt_cols`` naming a distinguishing column (an id, an offset)
    for duplicate-heavy data. When no hashable column exists at all,
    the salt degrades to a partition-local counter: still correct for
    algebraic aggregates, but bucket assignment then depends on
    partition layout (not retry-deterministic)."""
    if salt_cols is not None:
        cols = salt_cols
    else:
        cols = [f.name for f in df.schema.fields if not _contains_map(f.dataType)]
    if not cols:
        return F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_group_count(
    df: DataFrame,
    key: str,
    buckets: int = 16,
    alias: str = "cnt",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-stage (salted) count per key; result ≡ plain
    ``groupBy(key).count()`` with the hot-key shuffle fanned out."""
    salted = df.withColumn("__salt", _row_salt(df, buckets, salt_cols))
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").cast("bigint").alias(alias))


def salted_group_sum(
    df: DataFrame,
    key: str,
    value: Column,
    buckets: int = 16,
    alias: str = "total",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Salted two-stage sum (same shape; any algebraic aggregate
    decomposes this way — partial per salt, merge per key)."""
    salted = df.withColumn("__salt", _row_salt(df, buckets, salt_cols))
    partial = salted.groupBy(key, "__salt").agg(F.sum(value).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").alias(alias))


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_cols: list[str],
    n_salt: int = 8,
) -> DataFrame:
    """Explicit salt-replicate equi join for pathologically skewed
    fact keys (the remedy when the dim is too big to broadcast and
    AQE's skew split is unavailable — e.g. a forced shuffle-hash
    plan or a stream-static join).

    The fact side derives a deterministic salt from ``salt_cols`` (a
    unique-ish row identity — deterministic so retries and oracle
    comparisons see the same assignment); the dim side replicates
    each row ``n_salt`` times. The join key becomes (key, salt), so a
    hot key's rows land on ``n_salt`` reducers instead of one
    straggler. Cost: dim side inflated ×n_salt — use for
    mid-size dims; broadcast remains the answer for small ones.
    Result is row-identical to the plain join by construction.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salt))
    f = fact.withColumn("_salt", salt.cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return f.join(d, [key, "_salt"]).drop("_salt")
