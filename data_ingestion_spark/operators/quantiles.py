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


def exact_rank_select(
    df: DataFrame,
    value_col: str,
    ranks: list[int],
    tiebreak_col: str,
    buckets: int = 1024,
) -> dict[int, tuple]:
    """The exact element at each 1-based global rank of
    ``ORDER BY (value_col, tiebreak_col)`` — WITHOUT a global sort.
    Returns ``{rank: (value, tiebreak)}`` with the ORIGINAL column
    types (no double round-trip on bigint values).

    Same two-pass discipline as ``exact_quantiles_two_pass``, extended
    to a composite key: pass 1 reduces the corpus to a constant-size
    value histogram; the driver maps each requested global rank to
    (bucket, rank-within-bucket); pass 2 re-scans only the target
    buckets and a PER-BUCKET ``row_number`` ordered by the full
    composite key picks the element. Bucketing is a function of the
    value alone, so equal values always share a bucket and the
    within-bucket composite order IS the global order restricted to
    that bucket — the tiebreak column never has to be histogrammed.
    Driver state: ≤ ``buckets`` histogram cells + ``len(ranks)``
    boundary rows. Degenerate all-equal values collapse to one bucket
    (pass 2 then sorts only ties — the unavoidable worst case)."""
    if not ranks:
        raise ValueError("ranks must name at least one rank")
    spark = df.sparkSession
    vals = df.select(
        F.col(value_col).alias("__v"), F.col(tiebreak_col).alias("__t")
    ).filter(F.col("__v").isNotNull())
    st = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__v").alias("lo"),
        F.max("__v").alias("hi"),
    ).collect()[0]
    n, lo, hi = st["n"], st["lo"], st["hi"]
    if not all(1 <= k <= n for k in ranks):
        raise ValueError(f"ranks must be within [1, {n}], got {ranks}")
    lo_d, hi_d = float(lo), float(hi)
    if lo_d == hi_d:
        bucket_of = F.lit(0).cast("int")
        width = None
    else:
        width = (hi_d - lo_d) / buckets
        bucket_of = F.greatest(
            F.lit(0),
            F.least(
                F.lit(buckets - 1),
                F.floor((F.col("__v").cast("double") - lo_d) / width),
            ),
        ).cast("int")
    hist = {
        r.b: r.cnt
        for r in vals.select(bucket_of.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    pairs: list[tuple[int, int, int]] = []
    for k in sorted(set(ranks)):
        below = 0
        for b in range(buckets):
            cnt = hist.get(b, 0)
            if below + cnt >= k:
                pairs.append((b, k - below, k))
                break
            below += cnt
    pair_df = spark.createDataFrame(pairs, "__b int, __rn int, __k long")
    target = sorted({b for b, _, _ in pairs})
    w = Window.partitionBy("__b").orderBy("__v", "__t")
    out = (
        vals.withColumn("__b", bucket_of)
        .filter(F.col("__b").isin(target))
        .withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(pair_df), ["__b", "__rn"])
        .select("__k", "__v", "__t")
        .collect()
    )
    return {int(r["__k"]): (r["__v"], r["__t"]) for r in out}


def ntile_buckets(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    n_tiles: int,
    labels: list[str] | None = None,
    buckets: int = 1024,
) -> DataFrame:
    """``NTILE(n_tiles) OVER (ORDER BY value_col, tiebreak_col)`` —
    with the SAME row-to-tile assignment as the window function, but
    no single-partition global sort (the r15 scale-killer: an
    unpartitioned window makes one task sort the whole table).

    NTILE over N rows gives tile i the boundary rank
    ``i·(N div b) + min(i, N mod b)`` (the first ``N mod b`` tiles get
    one extra row). With a UNIQUE tiebreak the assignment is a pure
    function of each row's composite key vs the b-1 boundary
    ELEMENTS — so: count, ``exact_rank_select`` the boundaries (two
    bounded passes), broadcast the b-1 pairs, bucket with a CASE.
    Three scans + a constant-size exchange instead of a global sort;
    output adds a ``bucket`` column (1-based tile, or ``labels[i]``).
    Requires the tiebreak to be unique (else assignment at a
    boundary tie is ambiguous in BOTH forms) and ``value_col`` to be
    NULL-free — window NTILE sorts NULLs FIRST into tile 1 while the
    boundary CASE would dump them in the LAST tile (every comparison
    fails), so rather than silently diverge this refuses loudly (r16
    ADVICE); filter or coalesce NULL scores upstream."""
    if n_tiles < 2:
        raise ValueError(f"n_tiles must be >= 2, got {n_tiles}")
    if labels is not None and len(labels) != n_tiles:
        raise ValueError(f"need {n_tiles} labels, got {len(labels)}")
    counts = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col(value_col).isNull(), 1)).alias("n_null"),
    ).collect()[0]
    n = int(counts["n"])
    if int(counts["n_null"]) > 0:
        raise ValueError(
            f"ntile_buckets: value_col {value_col!r} has "
            f"{int(counts['n_null'])} NULL rows — NTILE sorts NULLs first "
            "(tile 1) but the boundary CASE would bucket them last; filter "
            "or coalesce the NULLs upstream to keep the assignment "
            "well-defined"
        )
    if n == 0:
        typ = "string" if labels is not None else "int"
        return df.withColumn("bucket", F.lit(None).cast(typ))
    base, rem = divmod(n, n_tiles)
    # dedupe equal boundary ranks keeping the SMALLEST tile: when
    # n < n_tiles the trailing tiles are empty and a boundary element
    # belongs to the first tile whose range ends on it (NTILE fills
    # front-to-back)
    bound_tiles: list[tuple[int, int]] = []
    seen: set[int] = set()
    for i in range(1, n_tiles):
        r = i * base + min(i, rem)
        if r >= 1 and r not in seen:
            seen.add(r)
            bound_tiles.append((r, i))
    picked = exact_rank_select(
        df, value_col, [r for r, _ in bound_tiles], tiebreak_col, buckets
    )
    v, t = F.col(value_col), F.col(tiebreak_col)
    expr = None
    for r, i in bound_tiles:
        bv, bt = picked[r]
        le = (v < F.lit(bv)) | ((v == F.lit(bv)) & (t <= F.lit(bt)))
        lab = labels[i - 1] if labels is not None else i
        expr = F.when(le, lab) if expr is None else expr.when(le, lab)
    last = labels[-1] if labels is not None else n_tiles
    # empty leading tiles (n < n_tiles) produce no boundary rank >= 1;
    # rows beyond the last boundary take the final tile, matching NTILE
    return df.withColumn("bucket", expr.otherwise(last))
