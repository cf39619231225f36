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


def test_hll_merge_equals_whole_and_constant_size(spark):
    """Shard-local sketches max-merge to the whole-corpus registers
    (bit-identical — the cross-shard reduce), state stays <= 2^p
    rows, and duplicates don't move a register (max is idempotent)."""
    from data_ingestion_spark.functions.sketches import hll_build, hll_merge

    df = spark.range(20000).select(F.col("id").cast("string").alias("v"))
    whole = {(r.bucket, r.rho) for r in hll_build(df, "v", p=8).collect()}
    a = hll_build(df.filter(F.col("id") < 12000), "v", p=8)
    b = hll_build(df.filter(F.col("id") >= 8000), "v", p=8)  # overlapping shards
    merged = {(r.bucket, r.rho) for r in hll_merge(a, b).collect()}
    assert merged == whole
    assert len(whole) <= 256
    dup = df.union(df).union(df)
    assert {(r.bucket, r.rho) for r in hll_build(dup, "v", p=8).collect()} == whole


def test_hll_estimate_accuracy_and_regimes(spark):
    """Raw-HLL regime within ~3 standard errors at 100k distinct;
    linear-counting regime within 5% at 700; empty input estimates 0
    (V = m, ln(1) = 0)."""
    from data_ingestion_spark.functions.sketches import hll_build, hll_estimate

    big = spark.range(100_000).select(F.col("id").cast("string").alias("v"))
    est = hll_estimate(hll_build(big, "v")).collect()[0]
    se = 1.04 / (2048 ** 0.5)  # ~2.3%
    assert abs(est.est - 100_000) <= 3 * se * 100_000
    small = spark.range(700).select(F.col("id").cast("string").alias("v"))
    est_s = hll_estimate(hll_build(small, "v")).collect()[0]
    assert abs(est_s.est - 700) <= 35
    empty = spark.createDataFrame([], "v string")
    est_e = hll_estimate(hll_build(empty, "v")).collect()[0]
    assert est_e.est == 0 and est_e.nonzero == 0


def test_hll_registers_partitioning_invariant(spark):
    """The integer-exact discipline: registers and the BIGINT
    harmonic denominator are identical under any repartitioning."""
    from data_ingestion_spark.functions.sketches import hll_build, hll_estimate

    df = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    r1 = hll_estimate(hll_build(df, "v")).collect()[0]
    r2 = hll_estimate(hll_build(df.repartition(17), "v")).collect()[0]
    assert (r1.inv_sum_scaled, r1.nonzero, r1.est) == (
        r2.inv_sum_scaled, r2.nonzero, r2.est
    )


def test_bloom_no_false_negatives_merge_and_duplicates(spark):
    """Bloom frontier dedup: every inserted key probes true (no
    false negatives EVER — the safe direction for a crawler), false
    positives stay near the analytic rate, overlapping shard filters
    bit_or-merge to the whole, the bitmap stays <= ceil(m/63) words,
    and byte-identical duplicate candidates each keep their row."""
    from data_ingestion_spark.functions.sketches import (
        DEFAULT_BLOOM_BITS,
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    seen = spark.range(5000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("v")
    )
    bf = bloom_build(seen, "v")
    assert bf.count() <= DEFAULT_BLOOM_BITS // 63 + 1
    cand = spark.range(10000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("v")
    )
    out = bloom_probe(cand, bf, "v").collect()
    assert len(out) == 10000
    misses = [r.v for r in out if int(r.v[1:]) < 5000 and not r.maybe_seen]
    assert misses == []  # no false negatives
    fp = sum(1 for r in out if int(r.v[1:]) >= 5000 and r.maybe_seen)
    assert fp / 5000 < 0.01  # analytic ~2e-4 at this load; 1% margin
    a = bloom_build(seen.filter(F.col("v") < "u3"), "v")
    b = bloom_build(seen.filter(F.col("v") >= "u2"), "v")  # overlap
    assert {(r.word_idx, r.word) for r in bloom_merge(a, b).collect()} == {
        (r.word_idx, r.word) for r in bf.collect()
    }
    dup = spark.createDataFrame([("u1",)] * 3 + [("zzz",)], "v string")
    rows = bloom_probe(dup, bf, "v").collect()
    assert sorted((r.v, r.maybe_seen) for r in rows) == [
        ("u1", True), ("u1", True), ("u1", True), ("zzz", False)
    ]


def test_bloom_probe_null_key_false_and_shuffle_free(spark):
    """r12: (a) a NULL candidate key was never inserted, so its
    verdict is FALSE — never NULL (a NULL verdict drops the row from
    both `maybe_seen` and `~maybe_seen` filters, r11 ADVICE); (b) the
    probe side is shuffle-free: k broadcast joins + a conjunction
    fold, no Exchange anywhere in the probe plan (the candidate
    stream is 100 TB; the filter is the broadcastable side)."""
    from data_ingestion_spark.functions.sketches import bloom_build, bloom_probe

    from pyspark import StorageLevel

    seen = spark.createDataFrame([("a",), ("b",)], "v string")
    bf = bloom_build(seen, "v")
    cand = spark.createDataFrame([("a",), ("nope",), (None,)], "v string")
    # r12 ADVICE ownership contract: with neither a caller persist nor
    # cache_handles, bloom_probe must NOT silently persist the caller's
    # frame (leaked executor cache + mutated caller cache state)
    bloom_probe(cand, bf, "v").collect()
    assert bf.storageLevel == StorageLevel.NONE
    # with cache_handles the persist happens and ownership transfers
    handles: list = []
    out = bloom_probe(cand, bf, "v", cache_handles=handles)
    rows = {r.v: r.maybe_seen for r in out.collect()}
    assert rows["a"] is True
    assert rows["nope"] is False
    assert rows[None] is False  # coalesced, not NULL
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The probe mainline is the leftmost spine of the plan: every
    # line before the first broadcast subtree. The filter build's
    # own bounded shuffle lives INSIDE the broadcast/cached subtrees
    # (printed after), so the spine containing the candidate scan
    # must be exchange-free — k BroadcastHashJoins, no regroup.
    final = plan.split("== Initial Plan ==")[0]
    spine = final.split("BroadcastQueryStage")[0].split("BroadcastExchange")[0]
    assert "Exchange" not in spine, final
    assert final.count("BroadcastHashJoin") >= 4  # k probe joins
    # and the filter build ran ONCE: the k broadcast subtrees read
    # the persisted relation, not k rebuilds of the seen-set scan
    assert "InMemoryTableScan" in final
    assert len(handles) == 1  # caller-side unpersist handle
    for h in handles:
        h.unpersist()


def test_hll_p_guard(spark):
    """r12 (r11 ADVICE): the hardcoded alpha approximation needs
    m >= 128 — reject p outside [7, 24] loudly in build and
    estimate instead of returning a silently biased estimate."""
    import pytest

    from data_ingestion_spark.functions.sketches import hll_build, hll_estimate

    df = spark.range(10).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="hll p"):
        hll_build(df, "v", p=4)
    with pytest.raises(ValueError, match="hll p"):
        hll_estimate(hll_build(df, "v", p=8), p=25)


def test_hll_grouped_merge_size_and_accuracy(spark):
    """r12 per-group HLL: (a) shard sketches max-merge to the whole
    per (group, bucket); (b) each group's register block equals the
    single-group build (groups are independent); (c) state <= 2^p
    rows per group; (d) per-group estimates within the LC/raw
    regime's error on known cardinalities."""
    from data_ingestion_spark.functions.sketches import (
        hll_build,
        hll_build_grouped,
        hll_estimate_grouped,
        hll_merge_grouped,
    )

    df = spark.range(30_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        # per-group distinct: g0 sees 0,3,6,... -> 10k distinct each
        F.col("id").cast("string").alias("v"),
    )
    whole = hll_build_grouped(df, "g", "v", p=8)
    a = hll_build_grouped(df.filter(F.col("id") < 20_000), "g", "v", p=8)
    b = hll_build_grouped(df.filter(F.col("id") >= 10_000), "g", "v", p=8)  # overlap
    merged = {(r.g, r.bucket, r.rho) for r in hll_merge_grouped("g", a, b).collect()}
    assert merged == {(r.g, r.bucket, r.rho) for r in whole.collect()}

    # group independence: g='0' block == plain hll_build over g0's values
    solo = {
        (r.bucket, r.rho)
        for r in hll_build(
            df.filter(F.col("g") == "0").select("v"), "v", p=8
        ).collect()
    }
    assert {
        (r.bucket, r.rho) for r in whole.filter(F.col("g") == "0").collect()
    } == solo

    from collections import Counter

    per_group = Counter(r.g for r in whole.collect())
    assert all(n <= 256 for n in per_group.values())

    est = {r.g: r.est for r in hll_estimate_grouped(whole, "g", p=8).collect()}
    for g in ("0", "1", "2"):
        assert abs(est[g] - 10_000) <= 0.25 * 10_000, (g, est[g])  # p=8 sigma ~6.5%

    # NULL group / NULL value rows contribute nothing
    df2 = spark.createDataFrame(
        [("a", "x"), (None, "y"), ("a", None)], "g string, v string"
    )
    got = hll_build_grouped(df2, "g", "v", p=8).collect()
    assert {r.g for r in got} == {"a"} and len(got) == 1


def test_heavy_hitters_grouped_exact_equivalence(spark):
    """r12 per-group two-pass: result EQUALS the naive
    GROUP BY (group, value) HAVING — at a width small enough to
    force cross-group and cross-token collisions — and a value heavy
    in one group but light in another is reported ONLY for the heavy
    group (per-group thresholds, not global)."""
    from data_ingestion_spark.functions.sketches import heavy_hitters_grouped

    rows = (
        [("en", "hot")] * 120 + [("de", "hot")] * 30   # heavy only in en
        + [("de", "warm")] * 100
        + [(g, f"c{i}") for g in ("en", "de") for i in range(150)] * 2
    )
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        (r.g, r.v): r.n
        for r in heavy_hitters_grouped(df, "g", "v", 100, width=16, depth=4).collect()
    }
    truth = {
        (r.g, r.v): r.n
        for r in df.groupBy("g", "v").count().filter("count >= 100")
        .select("g", "v", F.col("count").alias("n")).collect()
    }
    assert got == truth == {("en", "hot"): 120, ("de", "warm"): 100}


def test_heavy_hitters_grouped_shuffle_branch_equals_broadcast(spark):
    """r13 (r12 verdict #4): past ``broadcast_max_cells`` the
    per-depth estimate joins switch from broadcast to shuffle joins
    keyed (group, bucket). Forcing each branch on the same
    high-cardinality-group fixture must give identical results —
    both equal to the naive aggregate — and the plans must actually
    differ in join strategy."""
    from data_ingestion_spark.functions.sketches import heavy_hitters_grouped

    rows = (
        [(f"g{i}", "hot") for i in range(60) for _ in range(20)]  # heavy in all
        + [(f"g{i}", f"c{j}") for i in range(60) for j in range(25)]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    kw = dict(min_count=20, width=16, depth=4)

    bcast = heavy_hitters_grouped(df, "g", "v", **kw)  # default: broadcasts
    shuf = heavy_hitters_grouped(df, "g", "v", **kw, broadcast_max_cells=0)

    # the guard drops the broadcast HINT; with a toy sketch Catalyst
    # may still auto-broadcast by size estimate (fine — at scale the
    # big sketch exceeds autoBroadcastJoinThreshold and shuffles), so
    # pin the strategy difference with auto-broadcast off
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        p_b = bcast._jdf.queryExecution().executedPlan().toString()
        p_s = shuf._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in p_b  # hinted: broadcast survives
        assert "BroadcastHashJoin" not in p_s and "SortMergeJoin" in p_s
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    truth = {
        (r.g, r.v): r.n
        for r in df.groupBy("g", "v").count().filter("count >= 20")
        .select("g", "v", F.col("count").alias("n")).collect()
    }
    assert {(r.g, r.v): r.n for r in bcast.collect()} == truth
    assert {(r.g, r.v): r.n for r in shuf.collect()} == truth
    assert truth  # 60 groups x 1 heavy value
