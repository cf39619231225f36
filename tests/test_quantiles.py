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
