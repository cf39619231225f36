"""Two-pass exact quantiles: agreement with a sorted-list reference
across tie/negative/skew shapes, edge contracts, and the bounded
pass-2 scan claim."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_ingestion_spark.operators.quantiles import (
    exact_group_quantiles,
    exact_quantiles_two_pass,
)


def _ref(values, q):
    s = sorted(values)
    return s[max(1, math.ceil(q * len(s))) - 1]


@pytest.mark.parametrize(
    "values",
    [
        [float(x) for x in range(1000)],            # uniform
        [1.0] * 500 + [2.0] * 500,                  # massive ties
        [float(x) for x in range(-500, 500)],       # negatives
        [2.0 ** (x % 30) for x in range(997)],      # skewed, odd n
        [3.14],                                     # single row
    ],
    ids=["uniform", "ties", "negatives", "skewed", "single"],
)
def test_matches_sorted_reference(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    qs = [0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = {r.q: r.value for r in exact_quantiles_two_pass(df, "v", qs, buckets=64).collect()}
    assert got == {q: _ref(values, q) for q in qs}


def test_edge_contracts(spark):
    empty = spark.createDataFrame([], "v double")
    assert exact_quantiles_two_pass(empty, "v", [0.5]).collect() == []
    # NULL and NaN excluded
    df = spark.createDataFrame(
        [(None,), (float("nan"),), (1.0,), (2.0,), (3.0,)], "v double"
    )
    got = {r.q: r.value for r in exact_quantiles_two_pass(df, "v", [0.5, 1.0]).collect()}
    assert got == {0.5: 2.0, 1.0: 3.0}
    with pytest.raises(ValueError, match="quantiles"):
        exact_quantiles_two_pass(df, "v", [0.0])
    with pytest.raises(ValueError, match="at least one"):
        exact_quantiles_two_pass(df, "v", [])


def test_pass2_scan_is_bucket_bounded(spark):
    """The scale claim: pass 2 touches ~n/buckets rows per target
    bucket, not the corpus — counted through the same filter the
    plan pushes down."""
    df = spark.range(100_000).select((F.col("id") % 9973).cast("double").alias("v"))
    out = exact_quantiles_two_pass(df, "v", [0.5, 0.99], buckets=256)
    assert {r.q for r in out.collect()} == {0.5, 0.99}
    # replicate the internal bucket filter to measure selectivity
    lo, hi, n = 0.0, 9972.0, 100_000
    width = (hi - lo) / 256
    b50 = int(min(255, ((_ref([float(x % 9973) for x in range(100_000)], 0.5)) - lo) // width))
    cnt = df.filter(
        F.least(F.lit(255), F.floor((F.col("v") - lo) / width)).cast("int") == b50
    ).count()
    assert cnt < n / 100  # one bucket holds ~n/256 of the rows


def test_group_quantiles_match_reference_and_ties(spark):
    """Per-group exact quantiles agree with the sorted reference per
    group (incl. ties and a single-row group); NULL/NaN excluded;
    invalid q raises."""
    rows = (
        [("a", float(x)) for x in range(100)]
        + [("b", 5.0)] * 10
        + [("c", 42.0)]
        + [("a", None), ("b", float("nan"))]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    qs = [0.5, 0.99, 1.0]
    got = {
        (r.g, r.q): r.value
        for r in exact_group_quantiles(df, "g", "v", qs).collect()
    }
    vals = {"a": [float(x) for x in range(100)], "b": [5.0] * 10, "c": [42.0]}
    exp = {(g, q): _ref(v, q) for g, v in vals.items() for q in qs}
    assert got == exp
    with pytest.raises(ValueError, match="quantiles"):
        exact_group_quantiles(df, "g", "v", [1.5])


def test_nonfinite_excluded_both_forms(spark):
    """r12 (r11 ADVICE): ±Infinity is excluded alongside NULL/NaN —
    an infinite min/max would make the histogram width infinite
    (every finite row in bucket 0, inf rows lost from the histogram
    but counted in n). Both quantile forms share one finiteness rule
    and agree with the reference over the finite subset."""
    inf = float("inf")
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    rows = [(v,) for v in vals] + [(inf,), (-inf,), (float("nan"),), (None,)]
    df = spark.createDataFrame(rows, "v double")
    got = {r.q: r.value for r in exact_quantiles_two_pass(df, "v", [0.5, 1.0]).collect()}
    assert got == {0.5: 3.0, 1.0: 5.0}  # rank over the 5 finite rows

    gdf = spark.createDataFrame([("g", r[0]) for r in rows], "g string, v double")
    gg = {r.q: r.value for r in exact_group_quantiles(gdf, "g", "v", [0.5, 1.0]).collect()}
    assert gg == {0.5: 3.0, 1.0: 5.0}


def test_exact_rank_select_equals_sorted_reference(spark):
    """The composite-key rank select (r16) picks exactly the sorted
    (value, tiebreak) element at each rank — across ties, negatives,
    and the all-equal single-bucket degenerate."""
    from data_ingestion_spark.operators.quantiles import exact_rank_select

    cases = [
        [((i * 37) % 11, i) for i in range(1, 201)],   # heavy ties
        [(-(i % 5), i) for i in range(1, 50)],         # negative ties
        [(7, i) for i in range(1, 30)],                # all values equal
        [(i, 1000 - i) for i in range(1, 20)],         # unique values
    ]
    for rows in cases:
        df = spark.createDataFrame(rows, "v long, tid long")
        ref = sorted(rows)
        ranks = [1, len(rows) // 3 or 1, len(rows) // 2 or 1, len(rows)]
        got = exact_rank_select(df, "v", ranks, "tid", buckets=8)
        for k in ranks:
            assert got[k] == ref[k - 1], (rows[:5], k)

    df = spark.createDataFrame([(1, 1)], "v long, tid long")
    with pytest.raises(ValueError, match="ranks"):
        exact_rank_select(df, "v", [2], "tid")
    with pytest.raises(ValueError, match="ranks"):
        exact_rank_select(df, "v", [], "tid")


@pytest.mark.slow
def test_ntile_buckets_equals_window_ntile(spark):
    """r15 verdict #2: the broadcast-threshold tercile cut is
    row-for-row identical to NTILE(b) OVER (ORDER BY v, tid) for
    ragged N (including N < b), heavy ties, and b != 3 — and its
    RETURNED plan contains no window at all (the only window the
    construction runs is per-histogram-bucket)."""
    from pyspark.sql import Window

    from data_ingestion_spark.operators.quantiles import ntile_buckets

    w = Window.orderBy("v", "tid")
    for n in (1, 2, 3, 4, 5, 7, 10, 11, 12, 100):
        for b in (2, 3, 5):
            df = spark.createDataFrame(
                [(((i * 13) % 4), i) for i in range(1, n + 1)],
                "v long, tid long",
            )
            got = {
                r.tid: r.bucket
                for r in ntile_buckets(df, "v", "tid", b, buckets=8).collect()
            }
            want = {
                r.tid: r.t
                for r in df.select("tid", F.ntile(b).over(w).alias("t")).collect()
            }
            assert got == want, (n, b)

    # labeled form used by quality_ppl_buckets
    df = spark.createDataFrame(
        [((i % 6), i) for i in range(1, 32)], "v long, tid long"
    )
    lab = ntile_buckets(
        df, "v", "tid", 3, labels=["head", "middle", "tail"], buckets=8
    )
    assert "Window" not in lab._jdf.queryExecution().executedPlan().toString()
    got = {r.tid: r.bucket for r in lab.collect()}
    names = {1: "head", 2: "middle", 3: "tail"}
    want = {
        r.tid: names[r.t]
        for r in df.select("tid", F.ntile(3).over(w).alias("t")).collect()
    }
    assert got == want

    with pytest.raises(ValueError, match="n_tiles"):
        ntile_buckets(df, "v", "tid", 1)
    with pytest.raises(ValueError, match="labels"):
        ntile_buckets(df, "v", "tid", 3, labels=["a"])


def test_ntile_buckets_refuses_null_values(spark):
    """r16 ADVICE: window NTILE sorts NULLs FIRST (tile 1) while the
    boundary CASE would dump them in the LAST tile — the operator
    refuses loudly instead of silently diverging from its contract."""
    from data_ingestion_spark.operators.quantiles import ntile_buckets

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0), (4, 2.0)], "tid long, v double"
    )
    with pytest.raises(ValueError, match="NULL"):
        ntile_buckets(df, "v", "tid", 2)
    # NULL-free input is unaffected
    assert ntile_buckets(df.filter("v IS NOT NULL"), "v", "tid", 3).count() == 3
