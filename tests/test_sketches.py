"""Count-min sketch: the overestimate guarantee, exactness without
collisions, and cell-wise mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_spark.functions.sketches import cms_build, cms_estimate, cms_merge


def test_cms_never_underestimates_and_exact_when_sparse(spark):
    rows = [("a",)] * 100 + [("b",)] * 17 + [("c",)] * 3 + [("d",)] * 1
    df = spark.createDataFrame(rows, "v string")
    sketch = cms_build(df, "v", width=1024, depth=4)
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("absent",)], "item string")
    est = {r.item: r.estimate for r in cms_estimate(sketch, probes, width=1024, depth=4).collect()}
    truth = {"a": 100, "b": 17, "c": 3, "d": 1, "absent": 0}
    for k, t in truth.items():
        assert est[k] >= t, (k, est[k], t)
    # 4 distinct values in 1024 buckets x 4 rows: collisions are
    # impossible to all 4 rows simultaneously only probabilistically —
    # but with 4 values the chance all depth rows collide is ~0; the
    # md5 buckets are FIXED, so just assert the known exact outcome
    assert est == truth


def test_cms_merge_equals_whole(spark):
    rows = [(i, f"tok{i % 13}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v string")
    half1 = df.filter(F.col("id") < 250)
    half2 = df.filter(F.col("id") >= 250)
    whole = cms_build(df, "v")
    merged = cms_merge(cms_build(half1, "v"), cms_build(half2, "v"))
    a = {(r.depth_idx, r.bucket): r.cnt for r in whole.collect()}
    b = {(r.depth_idx, r.bucket): r.cnt for r in merged.collect()}
    assert a == b


def test_cms_constant_size(spark):
    big = spark.range(50_000).select(F.concat(F.lit("v"), (F.col("id") % 9999).cast("string")).alias("v"))
    sketch = cms_build(big, "v", width=128, depth=4)
    assert sketch.count() <= 128 * 4


def test_heavy_hitters_exact_equivalence_and_bounded_candidates(spark):
    """Two-pass result == plain groupBy-having EXACTLY (CMS has no
    false negatives, exact pass drops false positives), including at
    a width small enough to force collisions."""
    rows = (
        [("hot1",)] * 300 + [("hot2",)] * 150
        + [(f"cold{i}",) for i in range(400)] * 2  # 400 values x2
    )
    df = spark.createDataFrame(rows, "v string")
    from pyspark.sql import functions as F2

    truth = {
        r.v: r.n
        for r in df.groupBy("v").agg(F2.count(F2.lit(1)).alias("n"))
        .filter(F2.col("n") >= 100).collect()
    }
    # tiny width=16: heavy collision pressure, result must still be exact
    from data_ingestion_spark.functions.sketches import heavy_hitters

    got = {
        r.v: r.n
        for r in heavy_hitters(df, "v", min_count=100, width=16, depth=4).collect()
    }
    assert got == truth == {"hot1": 300, "hot2": 150}
