"""Corpus-assembly operators (functions/corpus.py): semantics + plan
shape. Parity with DuckDB is covered for all six registered queries by
tests/test_parity.py; these tests pin the properties parity can't see
— split stability under corpus growth, quota bounds, packing-bin
invariants, and the broadcast side of the decontamination join."""

from __future__ import annotations

import pytest

from pyspark.sql import Row, functions as F

from tests.conftest import SF_SMALL, SF_ORACLE

from data_ingestion_spark.functions import corpus as C
from data_ingestion_spark.sources.catalog import load_table


def test_split_assignment_stable_under_growth(spark):
    """A doc's split must not change when the corpus grows: assignment
    depends only on the doc's own id, never on corpus statistics."""
    small = load_table(spark, SF_SMALL, "documents")
    big = load_table(spark, SF_ORACLE, "documents")
    s = {
        r.doc_id: r.split
        for r in small.select(
            "doc_id", C.split_assign(F.col("doc_id")).alias("split")
        ).collect()
    }
    b = {
        r.doc_id: r.split
        for r in big.select(
            "doc_id", C.split_assign(F.col("doc_id")).alias("split")
        ).collect()
    }
    assert all(b[k] == v for k, v in s.items())
    assert {"train", "val", "test"} == set(b.values())
    # hash split should land near 75/12.5/12.5 at n=500
    n_train = sum(1 for v in b.values() if v == "train")
    assert 0.65 <= n_train / len(b) <= 0.85


def test_per_source_quota_bounds_and_determinism(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    out = C.per_source_quota(docs, "source", "doc_id", 7)
    per = out.groupBy("source").count().collect()
    assert all(r["count"] <= 7 for r in per)
    # deterministic: two runs pick the identical doc set
    ids1 = {r.doc_id for r in out.select("doc_id").collect()}
    ids2 = {
        r.doc_id
        for r in C.per_source_quota(docs, "source", "doc_id", 7)
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2


def test_pack_sequences_bin_invariants(spark):
    rows = [Row(grp="a", i=n, text=" ".join(["tok"] * 100)) for n in range(50)]
    df = spark.createDataFrame(rows)
    out = C.pack_sequences(df, "grp", "i", "text", budget=256).collect()
    by_i = {r.i: r for r in out}
    assert all(r.n_tokens == 100 for r in out)
    # cumsum strictly increasing in pack order; bin = window the doc starts in
    for n in range(50):
        r = by_i[n]
        assert r.cum_tokens == (n + 1) * 100
        assert r.bin_id == (n * 100) // 256
    # bins are contiguous from 0
    bins = sorted({r.bin_id for r in out})
    assert bins == list(range(bins[-1] + 1))


def test_decontaminate_finds_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="completely different words in this row entirely"),
        ]
    )
    ev = spark.createDataFrame(
        [Row(doc_id=100, text="quick brown fox jumps over the lazy dog")]
    )
    hits = C.decontaminate_overlap(corpus, ev, "text", "doc_id", n=3, min_overlap=3)
    got = [(r.doc_id, r.eval_id) for r in hits.collect()]
    assert got == [(1, 100)]
    # the eval side must be the broadcast build side: corpus explode
    # stays shuffle-free
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_mix_weights_flatten_property(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    out = C.mix_weights(docs, "source", "text").collect()
    assert abs(sum(r.share for r in out) - 1.0) < 1e-4
    # weight * share is constant (= 1/k): the flattened mixture is uniform
    k = len(out)
    for r in out:
        assert abs(r.weight * r.share - 1.0 / k) < 1e-4


def test_training_export_pipeline_two_shuffles(spark):
    """The capstone export (length gate -> dedup window -> split ->
    pack window) must cost exactly two hash exchanges end-to-end —
    the fingerprint window and the pack window. A third exchange
    means a regression (e.g. the split stage stopped being
    map-side)."""
    import re

    import __spark_entry__ as entrymod

    df = entrymod.queries()["training_export_pipeline"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2


def test_pack_sequences_invariants_random_lengths(spark):
    """Randomized (seeded) token lengths: cum telescopes within each
    shard in pack order, bin_id is exactly floor(tokens-before/budget)
    and nondecreasing — document boundaries never reorder."""
    import random

    rng = random.Random(11)
    rows = [
        Row(grp=g, i=n, text=" ".join(["tok"] * rng.randrange(1, 400)))
        for g in ("a", "b", "c")
        for n in range(60)
    ]
    out = C.pack_sequences(
        spark.createDataFrame(rows), "grp", "i", "text", budget=512
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r)
    assert len(out) == len(rows)
    for grp, rs in by_grp.items():
        rs.sort(key=lambda r: r.i)
        cum = 0
        prev_bin = 0
        for r in rs:
            assert r.bin_id == cum // 512
            cum += r.n_tokens
            assert r.cum_tokens == cum
            assert r.bin_id >= prev_bin
            prev_bin = r.bin_id


def test_hash_sample_threshold_monotone(spark):
    """A lower hex threshold must select a SUBSET of a higher one
    (same seed): thresholds are nested, so sampling rates can be
    tuned without churning membership."""
    docs = load_table(spark, SF_ORACLE, "documents")
    small = {r.doc_id for r in docs.filter(C.hash_sample("doc_id", "2")).collect()}
    big = {r.doc_id for r in docs.filter(C.hash_sample("doc_id", "8")).collect()}
    assert small <= big
    assert 0 < len(small) < len(big) < 500


def test_per_source_quota_skew_guard_matches_exact(spark):
    """skew_guard thins hot sources map-side BEFORE the window but
    must not change the result: the gate keeps the smallest-hash
    rows, a superset of the window's winners. Built skewed: one
    source holds ~90% of rows."""
    rows = [Row(source="hot" if n % 10 else "cold", doc_id=n) for n in range(2000)]
    df = spark.createDataFrame(rows)
    exact = {
        (r.source, r.doc_id)
        for r in C.per_source_quota(df, "source", "doc_id", 25).collect()
    }
    guarded = C.per_source_quota(df, "source", "doc_id", 25, skew_guard=True)
    got = {(r.source, r.doc_id) for r in guarded.collect()}
    assert got == exact
    # the guard actually thinned the hot source pre-shuffle: the plan
    # carries the hash-prefix filter
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "conv(" in plan


def test_per_source_quota_skew_guard_leaves_small_sources_alone(spark):
    """Sources smaller than guard_factor*quota pass the gate whole
    (frac >= 1 keeps every row), so tiny sources can never be
    under-sampled by the guard."""
    rows = [Row(source=f"s{n % 40}", doc_id=n) for n in range(400)]  # 10 rows/source
    df = spark.createDataFrame(rows)
    out = C.per_source_quota(df, "source", "doc_id", 7, skew_guard=True)
    per = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert all(v == 7 for v in per.values())


def test_decontaminate_falls_back_to_shuffle_join(spark):
    """When the eval side's word-count upper bound on index rows
    exceeds max_broadcast_rows (or broadcast=False is forced) the
    broadcast hint must be dropped (shuffle join, not a failed
    broadcast) and the result must be unchanged."""
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="completely different words in this row entirely"),
        ]
    )
    ev = spark.createDataFrame(
        [Row(doc_id=100, text="quick brown fox jumps over the lazy dog")]
    )
    # with auto-broadcast off, only the (dropped) hint could force a
    # BHJ — so the plan shape proves the hint really was dropped
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hits = C.decontaminate_overlap(
            corpus, ev, "text", "doc_id", n=3, min_overlap=3, max_broadcast_rows=0
        )
        assert [(r.doc_id, r.eval_id) for r in hits.collect()] == [(1, 100)]
        plan = hits._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        # forcing broadcast=False behaves the same and stays lazy
        forced = C.decontaminate_overlap(
            corpus, ev, "text", "doc_id", n=3, min_overlap=3, broadcast=False
        )
        fplan = forced._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in fplan
        # and below the threshold the hint IS applied even with
        # auto-broadcast off
        hinted = C.decontaminate_overlap(corpus, ev, "text", "doc_id", n=3, min_overlap=3)
        hplan = hinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in hplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_per_source_quota_skew_guard_null_keys_match_exact(spark):
    """NULL part_col rows form their own window group and NULL id_col
    rows sort first (NULL hash) — the guard must preserve both, not
    equi-join/filter them away."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("source", StringType()), StructField("doc_id", LongType())]
    )
    rows = [("hot" if n % 10 else None, n) for n in range(300)]
    rows += [("cold", 1000), ("cold", None)]
    df = spark.createDataFrame(rows, schema)
    key = lambda r: (r.source, r.doc_id)  # noqa: E731
    exact = {key(r) for r in C.per_source_quota(df, "source", "doc_id", 9).collect()}
    got = {
        key(r)
        for r in C.per_source_quota(
            df, "source", "doc_id", 9, skew_guard=True
        ).collect()
    }
    assert got == exact
    assert any(s is None for s, _ in got)  # NULL source group survived
    assert ("cold", None) in got  # NULL id row survived


def test_pack_sequences_tiebreak_makes_duplicate_order_deterministic(spark):
    """With a non-unique order_col and a unique tiebreak_col, packing
    is fully determined: bin assignment follows (order, tiebreak)."""
    rows = [Row(grp="a", o=n // 5, i=n, text=" ".join(["tok"] * 100)) for n in range(30)]
    df = spark.createDataFrame(rows)
    out = C.pack_sequences(df, "grp", "o", "text", budget=256, tiebreak_col="i").collect()
    by_i = {r.i: r for r in out}
    for n in range(30):  # (o, i) order == i order here
        assert by_i[n].cum_tokens == (n + 1) * 100
        assert by_i[n].bin_id == (n * 100) // 256


def test_per_source_quota_skew_guard_shuffle_shape(spark):
    """The guard's cost model, plan-asserted: exactly TWO hash
    exchanges (the tiny per-source counts aggregate + the quota
    window) and ONE broadcast (the counts joined back map-side).
    A third hash exchange would mean the corpus is shuffling for the
    guard itself — the thing the guard exists to avoid."""
    import re

    rows = [Row(source="hot" if n % 10 else "cold", doc_id=n) for n in range(2000)]
    df = spark.createDataFrame(rows)
    out = C.per_source_quota(df, "source", "doc_id", 25, skew_guard=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    assert len(re.findall(r"BroadcastExchange", plan)) == 1


def test_per_source_quota_rejects_helper_column_collision(spark):
    """Input columns that collide with the guard's helper columns or
    the output rank column must raise, not be silently clobbered."""
    import pytest

    for bad in ("__psq_part_key", "__psq_n_src", "rk"):
        df = spark.createDataFrame(
            [Row(source="a", doc_id=1, **{bad: 9})]
        )
        with pytest.raises(ValueError, match="collide"):
            C.per_source_quota(df, "source", "doc_id", 5)


def test_per_source_quota_verify_guard_falls_back_on_shortfall(spark):
    """Adversarial ids whose hash keys mostly land above the gate
    bound make the guard under-return; verify_guard must detect the
    shortfall, warn, and return the exact unguarded result."""
    import hashlib
    import warnings as W

    def keyint(i):
        return int(hashlib.md5(f"quota|{i}".encode()).hexdigest()[:8], 16)

    lo, hi = [], []
    i = 0
    while len(lo) < 4 or len(hi) < 16:
        (lo if keyint(i) < (1 << 31) else hi).append(i)
        i += 1
    ids = lo[:4] + hi[:16]  # frac=0.5 gate keeps only the 4 low ids
    df = spark.createDataFrame([Row(source="s", doc_id=d) for d in ids])

    exact = {
        r.doc_id
        for r in C.per_source_quota(df, "source", "doc_id", 10).collect()
    }
    assert len(exact) == 10
    # without verification the guard silently under-returns
    under = C.per_source_quota(
        df, "source", "doc_id", 10, skew_guard=True, guard_factor=1
    ).count()
    assert under < 10
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        got = {
            r.doc_id
            for r in C.per_source_quota(
                df, "source", "doc_id", 10,
                skew_guard=True, guard_factor=1, verify_guard=True,
            ).collect()
        }
    assert got == exact
    assert any("under-returned" in str(w.message) for w in caught)


def test_per_source_quota_verify_guard_detects_total_loss(spark):
    """The worst shortfall: EVERY row of a >=quota source gated out
    (all rows share one id whose hash prefix lands above the bound),
    so the source has no survivor group at all. An inner-join check
    would drop the group and miss it — the net must anchor on the
    pre-gate counts, detect 0 < quota, warn, and fall back."""
    import hashlib
    import warnings as W

    # find an id whose md5 key prefix is in the TOP quarter of the
    # space: with frac = guard_factor*quota/n = 8/16 = 0.5, the gate
    # bound is 2^31 and this id's every duplicate row is dropped
    bad = next(
        i for i in range(1000)
        if int(hashlib.md5(f"quota|{i}".encode()).hexdigest()[:8], 16) > (3 << 30)
    )
    df = spark.createDataFrame([Row(source="s", doc_id=bad)] * 16)

    exact = C.per_source_quota(df, "source", "doc_id", 8).count()
    assert exact == 8
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        got = C.per_source_quota(
            df, "source", "doc_id", 8,
            skew_guard=True, guard_factor=1, verify_guard=True,
        ).count()
    assert got == exact
    assert any("under-returned" in str(w.message) for w in caught)


def test_per_source_quota_verify_guard_detects_null_source_shortfall(spark):
    """A NULL part_col source is thinned by the gate like any other
    (the guard joins eqNullSafe), so its shortfall must be detected
    too — a null-unsafe survivor join would never match the NULL
    group and miss it."""
    import hashlib
    import warnings as W

    bad = next(
        i for i in range(1000)
        if int(hashlib.md5(f"quota|{i}".encode()).hexdigest()[:8], 16) > (3 << 30)
    )
    rows = [Row(source=None, doc_id=bad)] * 16 + [
        Row(source="ok", doc_id=i) for i in range(20)
    ]
    df = spark.createDataFrame(rows)

    def by_source(res):
        counts: dict = {}
        for r in res:
            counts[r.source] = counts.get(r.source, 0) + 1
        return counts

    exact = by_source(C.per_source_quota(df, "source", "doc_id", 8).collect())
    assert exact == {None: 8, "ok": 8}
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        got = by_source(
            C.per_source_quota(
                df, "source", "doc_id", 8,
                skew_guard=True, guard_factor=1, verify_guard=True,
            ).collect()
        )
    assert got == exact  # fallback returned the exact window
    assert any("under-returned" in str(w.message) for w in caught)


def test_per_source_quota_verify_guard_noop_when_guard_holds(spark):
    """On well-behaved data the verification changes nothing (and
    emits no warning)."""
    import warnings as W

    df = spark.createDataFrame(
        [Row(source=f"s{i % 3}", doc_id=i) for i in range(300)]
    )
    exact = {
        (r.source, r.doc_id)
        for r in C.per_source_quota(df, "source", "doc_id", 10).collect()
    }
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        got = {
            (r.source, r.doc_id)
            for r in C.per_source_quota(
                df, "source", "doc_id", 10, skew_guard=True, verify_guard=True
            ).collect()
        }
    assert got == exact
    assert not [w for w in caught if "under-returned" in str(w.message)]


def test_weighted_sample_exact_keys_and_exclusions(spark):
    """r14 Y-series: the selected set is exactly the n smallest
    -ln(u)/w keys (recomputed independently in Python), non-positive
    and NULL weights are excluded, ranks are 1..n."""
    import hashlib
    import math

    from data_ingestion_spark.functions.corpus import weighted_sample

    rows = [(i, float(i % 7 + 1)) for i in range(1, 101)]
    rows += [(200, 0.0), (201, -3.0), (202, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    out = weighted_sample(df, "w", 10, id_col="doc_id").collect()
    assert [r.sample_rank for r in sorted(out, key=lambda r: r.sample_rank)] == list(
        range(1, 11)
    )

    def key(i, w):
        u = (int(hashlib.md5(f"{i}|ws".encode()).hexdigest()[:8], 16) + 1.0) / 4294967297.0
        return -math.log(u) / w

    want = sorted(((key(i, w), i) for i, w in rows[:100]))[:10]
    assert {r.doc_id for r in out} == {i for _, i in want}
    assert {200, 201, 202}.isdisjoint({r.doc_id for r in out})


def test_weighted_sample_weight_monotone(spark):
    """Heavier rows appear more often: with half the corpus at 100x
    weight, the sample is dominated by heavy ids (deterministic,
    not a flaky statistical assertion — fixed hash draws)."""
    from data_ingestion_spark.functions.corpus import weighted_sample

    df = spark.createDataFrame(
        [(i, 100.0 if i % 2 == 0 else 1.0) for i in range(1, 401)],
        "doc_id bigint, w double",
    )
    out = weighted_sample(df, "w", 40, id_col="doc_id").collect()
    heavy = sum(1 for r in out if r.doc_id % 2 == 0)
    assert heavy >= 30  # ~100:1 odds per slot; fixed draws make this stable


def test_weighted_sample_contracts(spark):
    import pytest

    from data_ingestion_spark.functions.corpus import weighted_sample

    df = spark.createDataFrame([(1, 1.0)], "doc_id bigint, w double")
    with pytest.raises(ValueError, match="n must be"):
        weighted_sample(df, "w", 0)
    bad = spark.createDataFrame([(1, 1.0, 2)], "doc_id bigint, w double, sample_rank int")
    with pytest.raises(ValueError, match="collides"):
        weighted_sample(bad, "w", 1)


def test_mixture_temperature_weights_endpoints(spark):
    """α=1 is the natural mixture (all weights 1); α=0 flattens to
    uniform target shares; α=0.5 sits between, preserving order."""
    import pytest
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.corpus import (
        mixture_temperature_weights,
    )

    d = spark.createDataFrame(
        [(i, "a" if i < 80 else ("b" if i < 95 else "c")) for i in range(100)],
        "doc_id long, src string",
    )
    nat = {r.src: r for r in mixture_temperature_weights(d, "src", 1.0).collect()}
    assert all(abs(r.weight - 1.0) < 1e-9 for r in nat.values())
    assert nat["a"].share == 0.8 and nat["a"].temp_share == 0.8

    uni = {r.src: r for r in mixture_temperature_weights(d, "src", 0.0).collect()}
    for r in uni.values():
        assert abs(r.temp_share - 1 / 3) < 1e-6  # uniform target
    # rare sources upweighted, dominant downweighted
    assert uni["c"].weight > 1.0 > uni["a"].weight

    half = {r.src: r for r in mixture_temperature_weights(d, "src", 0.5).collect()}
    assert half["a"].temp_share < nat["a"].temp_share  # damped
    assert half["c"].temp_share > nat["c"].temp_share  # lifted
    # target shares still a distribution
    assert abs(sum(r.temp_share for r in half.values()) - 1.0) < 1e-5

    with pytest.raises(ValueError, match="alpha"):
        mixture_temperature_weights(d, "src", 1.5)


@pytest.mark.slow
def test_bigram_lm_score_hand_case_and_ordering(spark):
    """Hand-checked add-1 bigram NLL + the quality-signal property:
    a reference-like doc scores LOWER mean NLL than gibberish."""
    import math

    import pytest

    from data_ingestion_spark.functions.textops import bigram_lm_score

    ref = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",)], "text string"
    )
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zx qv zx qv zx")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_lm_score(docs, ref).collect()}
    # model: c(the,cat)=2, c(cat,sat)=1, c(cat,ran)=1; c(the)=2,
    # c(cat)=2; V=4 (the,cat,sat,ran); k=1
    nll_the_cat = math.log((2 + 4) / (2 + 1))
    nll_cat_sat = math.log((2 + 4) / (1 + 1))
    exp = (round(nll_the_cat * 1e6) + round(nll_cat_sat * 1e6)) // 2
    assert out[1].n_bigrams == 2
    assert out[1].nll_micros == exp
    # gibberish: every bigram unseen context -> ln((0+4)/(0+1)) = ln 4
    assert out[2].nll_micros == round(math.log(4.0) * 1e6)
    assert out[1].nll_micros < out[2].nll_micros

    with pytest.raises(ValueError, match="k_smooth"):
        bigram_lm_score(docs, ref, k_smooth=0)


def test_bigram_lm_score_degenerate_inputs(spark):
    """r15 ADVICE: an empty-vocabulary reference must refuse LOUDLY
    (otherwise every score is ln(0) = NULL in Spark while the DuckDB
    oracle errors — silent engine divergence); sub-2-token candidate
    docs carry no bigrams and are absent by documented design."""
    import pytest

    from data_ingestion_spark.functions.textops import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "word"), (3, "")],
        "doc_id long, text string",
    )
    empty_ref = spark.createDataFrame([("",), ("   ",)], "text string")
    with pytest.raises(ValueError, match="empty vocabulary"):
        bigram_lm_score(docs, empty_ref)

    ref = spark.createDataFrame([("the cat sat",)], "text string")
    ids = {r.doc_id for r in bigram_lm_score(docs, ref).collect()}
    assert ids == {1}  # 0- and 1-token docs have no bigrams to score


def test_shuffle_shards_permutation_and_single_exchange(spark):
    """Every row lands exactly once; positions are contiguous
    1..|shard|; a new seed is a different permutation; the plan pays
    ONE shuffle (shard hash + within-shard sort share the exchange)."""
    import pytest
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.corpus import shuffle_shards

    d = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = shuffle_shards(d, 8).cache()
    assert out.count() == 1000
    assert out.select("doc_id").distinct().count() == 1000
    per = out.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("shard_pos").alias("mx"),
        F.min("shard_pos").alias("mn"),
    ).collect()
    assert len(per) == 8
    for r in per:
        assert r.mn == 1 and r.mx == r.n  # contiguous positions
    a = [(r.shard_id, r.shard_pos) for r in out.orderBy("doc_id").collect()]
    b = [
        (r.shard_id, r.shard_pos)
        for r in shuffle_shards(d, 8, seed="epoch2").orderBy("doc_id").collect()
    ]
    assert a != b  # fresh permutation per seed
    # rerun determinism
    c = [(r.shard_id, r.shard_pos) for r in shuffle_shards(d, 8).orderBy("doc_id").collect()]
    assert a == c
    out.unpersist()

    plan = shuffle_shards(d, 8)._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1

    with pytest.raises(ValueError, match="n_shards"):
        shuffle_shards(d, 0)
    with pytest.raises(ValueError, match="collides"):
        shuffle_shards(d.withColumn("shard_id", F.lit(1)), 4)


def test_trigram_lm_score_all_three_backoff_tiers(spark):
    """Hand-checked stupid backoff (r15 verdict #3): a seen trigram
    scores c(w123)/c(w12); an unseen trigram with a seen (w2,w3)
    bigram backs off to 0.4-discounted bigram; a fully unseen
    continuation hits the add-1 unigram floor — plus the ordering
    property and the empty-reference refusal."""
    import math

    import pytest

    from data_ingestion_spark.functions.textops import trigram_lm_score

    ref = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",)], "text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),        # tier 1: seen trigram
            (2, "the cat jumped"),     # tier 3: unseen w3 entirely
            (3, "sat the cat sat"),    # tiers 2 then 1
            (4, "zx qv zx qv"),        # gibberish: unigram floor twice
            (5, "so short"),           # < 3 tokens: absent by design
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in trigram_lm_score(docs, ref).collect()}
    # model: tm (the,cat,sat)=1, (the,cat,ran)=1; tctx (the,cat)=2;
    # bm (the,cat)=2, (cat,sat)=1, (cat,ran)=1; bctx the=2, cat=2;
    # N=6 tokens, V=4
    assert out[1].n_trigrams == 1
    assert out[1].nll_micros == round(math.log(2.0 / 1.0) * 1e6)
    assert out[2].nll_micros == round(math.log(10.0 / (0.16 * 1)) * 1e6)
    t_sat_the_cat = round(math.log(2.0 / (0.4 * 2)) * 1e6)  # bigram tier
    t_the_cat_sat = round(math.log(2.0 / 1.0) * 1e6)        # trigram tier
    assert out[3].n_trigrams == 2
    assert out[3].nll_micros == (t_sat_the_cat + t_the_cat_sat) // 2
    # quality ordering: reference-like < unseen-tail < gibberish-floor
    assert out[1].nll_micros < out[3].nll_micros < out[4].nll_micros
    assert 5 not in out

    empty_ref = spark.createDataFrame([("",)], "text string")
    with pytest.raises(ValueError, match="empty vocabulary"):
        trigram_lm_score(docs, empty_ref)


def test_mixture_epoch_plan_math_and_contracts(spark):
    """Hand-checked data-constrained plan (r16): token shares drive
    the mixture, the epoch count is alloc/supply in integer micros,
    and the 4-epoch cap marks (not redistributes) unsatisfiable
    asks; zero-token sources are excluded."""
    import pytest

    rows = [
        ("big", 900),   # dominant supply
        ("small", 100), # rare: temperature lifts its ask past 4 epochs
        ("empty", 0),   # excluded
    ]
    df = spark.createDataFrame(
        [(s, t) for s, t in rows], "source string, tok long"
    )
    out = {
        r.source: r
        for r in C.mixture_epoch_plan(
            df, "source", "tok", 2_000, alpha=0.0, max_epochs=4
        ).collect()
    }
    assert set(out) == {"big", "small"}
    # alpha=0: uniform target -> each gets 1000 tokens asked
    assert out["big"].target_tokens == 1000
    assert out["small"].target_tokens == 1000
    # small supplies 100 -> ask is 10 epochs, capped at 4 (400 tokens)
    assert out["small"].capped and out["small"].epochs_micros == 4_000_000
    # big: 1000/900 epochs, uncapped
    assert not out["big"].capped
    assert out["big"].epochs_micros == (1000 * 1_000_000) // 900
    # alpha=1: natural shares -> epochs equal across sources (2e3/1e3)
    nat = {
        r.source: r
        for r in C.mixture_epoch_plan(
            df, "source", "tok", 2_000, alpha=1.0
        ).collect()
    }
    assert nat["big"].epochs_micros == nat["small"].epochs_micros == 2_000_000
    assert not any(r.capped for r in nat.values())

    with pytest.raises(ValueError, match="alpha"):
        C.mixture_epoch_plan(df, "source", "tok", 10_000, alpha=2.0)
    with pytest.raises(ValueError, match="token_budget"):
        C.mixture_epoch_plan(df, "source", "tok", 0)
    with pytest.raises(ValueError, match="max_epochs"):
        C.mixture_epoch_plan(df, "source", "tok", 10, max_epochs=0)


def test_mixture_epoch_plan_trillion_token_no_overflow(spark):
    """r16 ADVICE: epochs_micros must survive a trillion-token-scale
    allocation — (alloc * 1e6) overflows 2^63 for alloc > ~9.2e12, so
    the multiply runs in DECIMAL(38,0). 9e15 tokens alloc at 4 epochs
    of a 9e15-token source = exactly 1.111111 epochs of supply vs the
    1e16 ask."""
    df = spark.createDataFrame(
        [("big", 9_000_000_000_000_000), ("tiny", 10)],
        "source string, tok long",
    )
    rows = {
        r["source"]: r
        for r in C.mixture_epoch_plan(
            df, "source", "tok", 10_000_000_000_000_000, alpha=0.5, max_epochs=4
        ).collect()
    }
    # share ~ 1.0 -> target ~ 1e16, alloc = min(1e16, 4*9e15) = 1e16
    # epochs = 1e16 * 1e6 div 9e15 = 1111111 (would overflow in bigint)
    assert rows["big"]["epochs_micros"] == 1_111_111
    assert not rows["big"]["capped"]
