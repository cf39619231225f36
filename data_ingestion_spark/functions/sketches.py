"""Mergeable frequency sketches: count-min over token streams.

Reference anchor: the reference has no corpus-statistics layer at
all (its pipelines move documents; frequency questions go to the
search backend). A training-data pipeline needs cheap answers to
"how often does this token/URL/fingerprint occur across 100 TB"
without a full-cardinality groupBy: boilerplate detection, stopword
discovery, skew-key identification for salting decisions. The
count-min sketch (Cormode & Muthukrishnan 2005) is the standard
answer: a depth x width counter table whose size is CONSTANT in the
corpus (width*depth rows), overestimates only (never under), and
merges across shards by cell-wise addition.

Determinism: bucket hashes are md5-derived (``conv(substr(md5(
depth|value),1,15),16,10) % width``) — bit-identical in any engine
(the embed-oracle pattern), no seed, no JVM-specific xxhash. The
build is explode(depth) → groupBy (depth, bucket): partial
aggregation means the exchange moves at most partitions x depth x
width partial counts — the sketch costs one bounded shuffle no
matter the corpus size, which is precisely why you build a sketch
instead of a full groupBy at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_WIDTH = 256
DEFAULT_DEPTH = 4


def _bucket(value: Column, depth_idx: Column, width: int) -> Column:
    """md5-derived bucket in [0, width): engine-portable, seedless."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(depth_idx.cast("string"), F.lit("|"), value.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (h % width).cast("int")


def cms_build(
    df: DataFrame,
    col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """Count-min sketch of the values in ``col`` (NULLs ignored;
    values hash via their string cast, so use string/integer columns
    — float formatting is engine-specific and would fragment keys):
    one row per (depth_idx, bucket) with the summed count. Cells no
    value hashed into are absent (semantically zero). Sketches over
    different data slices MERGE by unioning and re-summing per
    (depth_idx, bucket) — the property that lets each crawl shard
    sketch locally and a reducer add the tables."""
    j = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("depth_idx")
    return (
        df.select(F.col(col).alias("__v"))
        .filter(F.col("__v").isNotNull())
        .select("__v", j)
        .select("depth_idx", _bucket(F.col("__v"), F.col("depth_idx"), width).alias("bucket"))
        .groupBy("depth_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise addition of sketches built with the same
    (width, depth) — the cross-shard reduce."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("depth_idx", "bucket").agg(F.sum("cnt").alias("cnt"))


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Exact heavy hitters via the classic two-pass sketch pipeline:
    pass 1 builds the count-min sketch; pass 2 re-scans, estimates
    each row's value via ``depth`` broadcast joins against the
    constant-size sketch, keeps rows whose estimate clears the
    threshold, and exact-counts ONLY those. CMS never
    underestimates, so every true heavy hitter survives the filter
    (no false negatives); the final exact count drops the false
    positives — the result EQUALS ``GROUP BY col HAVING count >=
    min_count``, but the aggregation hash state is bounded by the
    candidate set instead of the full vocabulary. That bound is the
    point at 100 TB: a naive groupBy carries vocabulary-sized state
    per executor; this carries |heavy values| (tiny by definition —
    few values can exceed a meaningful threshold).

    Returns (``col``, n) with exact counts, heavy values only.
    """
    from pyspark import StorageLevel

    # the sketch feeds `depth` broadcast subtrees — persist it (it is
    # depth x width rows) so the corpus is scanned once for pass 1,
    # not once per depth row
    # cached blocks are not GC-reclaimed: cache_handles receives the
    # persisted sketch for caller-side unpersist in long-lived drivers
    sketch = cms_build(df, col, width, depth).persist(StorageLevel.MEMORY_AND_DISK)
    if cache_handles is not None:
        cache_handles.append(sketch)
    vals = df.select(F.col(col).alias("__v")).filter(F.col("__v").isNotNull())
    est: Column | None = None
    cur = vals
    for j in range(depth):
        s_j = sketch.filter(F.col("depth_idx") == j).select(
            F.col("bucket").alias(f"__b{j}"), F.col("cnt").alias(f"__c{j}")
        )
        cur = cur.withColumn(f"__b{j}", _bucket(F.col("__v"), F.lit(j), width)).join(
            F.broadcast(s_j), f"__b{j}", "left_outer"
        )
        cj = F.coalesce(F.col(f"__c{j}"), F.lit(0))
        est = cj if est is None else F.least(est, cj)
    return (
        cur.filter(est >= min_count)
        .groupBy(F.col("__v").alias(col))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str = "item",
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """Point-frequency estimates: for each item, min over the depth
    rows of its bucket counts (absent cell = 0). Count-min guarantee:
    estimate >= true count always; overestimate bounded by
    collisions (~2N/width with probability 1 - 2^-depth). The items
    table is tiny (probes), so the probe is a broadcast join against
    the constant-size sketch."""
    probes = items.select(F.col(item_col).alias("__item")).distinct()
    expanded = probes.select(
        "__item",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("depth_idx"),
    ).select(
        "__item",
        "depth_idx",
        _bucket(F.col("__item"), F.col("depth_idx"), width).alias("bucket"),
    )
    joined = expanded.join(F.broadcast(sketch), ["depth_idx", "bucket"], "left_outer")
    return (
        joined.groupBy("__item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate"))
        .select(F.col("__item").alias(item_col), F.col("estimate").cast("bigint").alias("estimate"))
    )
