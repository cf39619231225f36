"""Exact distributed quantiles with bounded state.

Reference anchor: the reference has no numeric-analytics layer (its
pipelines move documents); an engine serving curation decisions needs
exact percentiles ("the p99 document length", "the median quality
score") over corpora where a global sort is unaffordable and
``approx_percentile``'s error is unquantified for the tail.

The two-pass shape (the heavy-hitters discipline applied to order
statistics): pass 1 reduces the corpus to a CONSTANT-size value
histogram (``buckets`` cells, partial-agg bounded shuffle); the
driver locates, per requested quantile q, the bucket containing the
global rank ``k = max(1, ceil(q*n))`` and its within-bucket offset;
pass 2 re-scans with a pushed-down bucket filter — ~n/buckets rows
per target bucket — and a per-bucket ``row_number`` picks the exact
value. No global sort, no vocabulary-sized aggregation state, and
the only window runs over the tiny filtered slice. At 100 TB: two
scans and a B-cell exchange buy EXACT order statistics.

Determinism: bucketing is ``floor((v - min) / width)`` on doubles —
the identical IEEE expression in any engine — and the value at
global rank k over a sorted multiset is well-defined even with ties
(row_number may permute tied rows, but the VALUE at the rank cannot
change). The driver-side histogram probe is the AnnStore/batch-BM25
probe pattern (tiny collect shaping the pass-2 plan).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F


def _finite(c: Column) -> Column:
    """NULL / NaN / ±Infinity excluded — both quantile forms share
    one finiteness rule so they agree on the same input."""
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) != float("inf"))


def exact_quantiles_two_pass(
    df: DataFrame,
    col: str,
    qs: list[float],
    buckets: int = 1024,
) -> DataFrame:
    """(q, value) rows — ``value`` is the EXACT lower (type-1)
    quantile: the element at 1-based rank ``max(1, ceil(q*n))`` of
    the sorted values. NULL, NaN and ±Infinity values are excluded —
    an infinite min/max would make the histogram width infinite,
    collapsing every finite row into bucket 0 and losing the inf rows
    from the histogram entirely while still counting them in n (r11
    ADVICE); order statistics over non-finite data are not
    meaningful, so the exclusion is explicit and documented. An
    empty input returns no rows."""
    if not qs:
        raise ValueError("qs must name at least one quantile")
    if not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    spark = df.sparkSession
    v = F.col(col).cast("double")
    vals = df.select(v.alias("__v")).filter(_finite(F.col("__v")))
    st = vals.agg(
        F.count(F.lit(1)).alias("n"), F.min("__v").alias("lo"), F.max("__v").alias("hi")
    ).collect()[0]
    n, lo, hi = st["n"], st["lo"], st["hi"]
    if n == 0:
        return spark.createDataFrame([], "q double, value double")
    if lo == hi:  # single-valued column: every quantile is that value
        return spark.createDataFrame([(float(q), float(lo)) for q in qs], "q double, value double")

    width = (hi - lo) / buckets
    bucket_of = F.least(
        F.lit(buckets - 1), F.floor((F.col("__v") - lo) / width)
    ).cast("int")
    hist = {
        r.b: r.cnt
        for r in vals.select(bucket_of.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # per q: the target bucket and the rank within it
    pairs: list[tuple[int, int, float]] = []
    for q in qs:
        k = max(1, math.ceil(q * n))
        below = 0
        for b in range(buckets):
            cnt = hist.get(b, 0)
            if below + cnt >= k:
                pairs.append((b, k - below, float(q)))
                break
            below += cnt
    pair_df = spark.createDataFrame(pairs, "__b int, __rn int, q double")
    target_buckets = sorted({b for b, _, _ in pairs})
    w = Window.partitionBy("__b").orderBy("__v")
    return (
        vals.withColumn("__b", bucket_of)
        .filter(F.col("__b").isin(target_buckets))
        .withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(pair_df), ["__b", "__rn"])
        .select("q", F.col("__v").alias("value"))
    )


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
) -> DataFrame:
    """(group, q, value) EXACT type-1 quantiles per group — the
    curation-report shape ("p50/p99 document length PER LANGUAGE /
    per source"). One window over the group partition (rank +
    per-group count ride the same sort; spillable state, one
    shuffle), then each requested q picks the element at rank
    ``max(1, ceil(q·n_g))`` via a broadcast qs join. Groups are
    assumed many-and-moderate (the report shape); for ONE huge
    group use ``exact_quantiles_two_pass`` — it bounds state by the
    histogram instead of the group sort."""
    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    spark = df.sparkSession
    v = F.col(value_col).cast("double")
    vals = df.select(F.col(group_col).alias("__g"), v.alias("__v")).filter(
        _finite(F.col("__v"))
    )
    w = Window.partitionBy("__g").orderBy("__v")
    ranked = vals.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("__g"))
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    pick = F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("__n")))
    return (
        ranked.join(F.broadcast(qdf), F.col("__rn") == pick)
        .select(
            F.col("__g").alias(group_col),
            "q",
            F.col("__v").alias("value"),
        )
    )
