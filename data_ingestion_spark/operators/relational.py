"""Relational operator zoo: joins, aggregations, windows, set ops, sorts.

The reference performs exactly one (implicit) join — broadcasting its
4-row product dim into every chunk's metadata
(ingestion-pipeline.py:217-222 driven by the loop at 268-278) — and
its aggregations are Python ``len()`` / ``list.extend`` over collected
records (ingestion-pipeline-website-local.py:94-118,
ingestion-pipeline.py:250-259). This module re-expresses those, plus
the full standard zoo the engine needs (SURVEY.md §2.3-§2.7), as lazy
DataFrame transforms.

Scale notes (100 TB posture):
- ``broadcast_enrich`` pins the small side as a broadcast hash join —
  no shuffle of the fact table.
- ``range_join_bounded`` keeps an equi key in the join condition so
  Spark plans a hash join with the range as a post-join filter,
  never a nested-loop cross product.
- ``asof_join`` is the union+window sort-based merge — one shuffle on
  the key, no per-row subqueries.
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


# ---------------------------------------------------------------- joins

def broadcast_enrich(fact: DataFrame, dim: DataFrame, on: str | list[str]) -> DataFrame:
    """J1: dimension enrichment as an explicit broadcast hash join.

    Mirrors the reference denormalizing product metadata onto every
    chunk (ingestion-pipeline.py:217-222) — a join in disguise.
    """
    return fact.join(F.broadcast(dim), on=on, how="inner")


def semi_join(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """J4 left-semi: rows of ``left`` with a match — the engine's
    'already ingested?' check (skip-if-exists, website-ingestion-pipeline.py:116-118)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """J4 left-anti: rows of ``left`` with no match — 'not yet ingested'."""
    return left.join(right, on=on, how="left_anti")


def range_join_bounded(
    left: DataFrame,
    right: DataFrame,
    equi: Column,
    range_cond: Column,
) -> DataFrame:
    """J6: range join with an equi anchor.

    Passing ``equi & range_cond`` as one condition lets Catalyst use
    the equality as the hash-join key and apply the range predicate as
    a join filter — the scalable shape. A pure range join would fall
    back to BroadcastNestedLoopJoin, which dies at 100 TB; when no
    natural equi key exists, bucket the range dimension (e.g. explode
    bounded time buckets) to manufacture one.
    """
    return left.join(right, on=equi & range_cond, how="inner")


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lo_offset_s: int,
    hi_offset_s: int,
    bucket_s: int | None = None,
) -> DataFrame:
    """J6 without a natural equi key: manufacture one by bucketing.

    For ``right.ts BETWEEN left.ts + lo AND left.ts + hi``: pick a
    bucket width ≥ the range span, explode each left row into the
    2 candidate buckets its window can touch, equi-join on bucket,
    then apply the exact range as a filter. Cost: |left|·2 rows into a
    hash join instead of a nested loop over |left|·|right| — the
    standard interval-join decomposition when Spark would otherwise
    plan BroadcastNestedLoopJoin.
    """
    span = hi_offset_s - lo_offset_s
    w = bucket_s or max(span, 1)
    l_sec = F.unix_micros(F.col(f"l.{left_ts}").cast("timestamp")) / F.lit(1_000_000.0)
    r_sec = F.unix_micros(F.col(f"r.{right_ts}").cast("timestamp")) / F.lit(1_000_000.0)
    lt = left.alias("l").withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.floor((l_sec + lo_offset_s) / w),
                F.floor((l_sec + hi_offset_s) / w),
            )
        ),
    ).dropDuplicates(left.columns + ["__bucket"])
    rt = right.alias("r").withColumn("__bucket", F.floor(r_sec / w))
    joined = lt.join(rt, on="__bucket", how="inner")
    l_sec_j = F.unix_micros(F.col(f"l.{left_ts}").cast("timestamp")) / F.lit(1_000_000.0)
    r_sec_j = F.unix_micros(F.col(f"r.{right_ts}").cast("timestamp")) / F.lit(1_000_000.0)
    return joined.filter(
        (r_sec_j >= l_sec_j + lo_offset_s) & (r_sec_j <= l_sec_j + hi_offset_s)
    ).drop("__bucket")


def merge_upsert(
    current: DataFrame, updates: DataFrame, key: str | list[str]
) -> DataFrame:
    """MERGE INTO semantics without a table format: updated rows
    replace matches, unmatched updates insert, everything else
    persists — expressed as anti-join + union (one shuffle on the
    key). With Delta/Iceberg available this becomes a real MERGE with
    file-level pruning; the logical contract is identical.

    Key equality is null-safe (``<=>``), matching ``merge_into_sql``:
    a NULL-key update row REPLACES a NULL-key current row on both
    paths instead of duplicating it on this one."""
    keys = [key] if isinstance(key, str) else list(key)
    cur, upd = current.alias("__cur"), updates.select(*keys).alias("__upd")
    cond = None
    for k in keys:
        c = F.col(f"__cur.{k}").eqNullSafe(F.col(f"__upd.{k}"))
        cond = c if cond is None else (cond & c)
    kept = cur.join(upd, on=cond, how="left_anti")
    return kept.unionByName(updates.select(current.columns))


#: table providers whose Spark integration supports a real MERGE INTO
MERGE_CAPABLE_PROVIDERS = {"delta", "iceberg"}


def _quote_ident(name: str) -> str:
    """Backtick-quote a possibly-dotted TABLE name part-wise
    (``db.tbl`` → ```db`.`tbl```) so table names are never
    interpolated raw into MERGE SQL. Not for columns — splitting on
    '.' would turn a column literally named ``a.b`` into a struct
    field path; use :func:`_quote_col` for those."""
    return ".".join("`" + p.replace("`", "``") + "`" for p in name.split("."))


def _quote_col(name: str) -> str:
    """Backtick-quote a COLUMN name as one atom: dots stay inside the
    single backtick pair, so a column named ``a.b`` resolves as that
    column, not as field ``b`` of column ``a``."""
    return "`" + name.replace("`", "``") + "`"


def merge_into_sql(target: str, source: str, keys: list[str]) -> str:
    """The MERGE statement the table-format path issues — upsert-all
    semantics matching ``merge_upsert`` (null-safe key equality so a
    null key updates rather than double-inserting). Identifiers are
    backtick-quoted."""
    cond = " AND ".join(f"t.{_quote_col(k)} <=> s.{_quote_col(k)}" for k in keys)
    return (
        f"MERGE INTO {_quote_ident(target)} t USING {_quote_ident(source)} s ON {cond} "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def table_provider(spark, table: str) -> str | None:
    """The storage provider of a saved table (``delta``, ``iceberg``,
    ``parquet``, …), lowercased; None when the catalog doesn't
    record one."""
    for row in spark.sql(f"DESCRIBE FORMATTED {_quote_ident(table)}").collect():
        if row.col_name.strip().lower() == "provider":
            return row.data_type.strip().lower()
    return None


def merge_upsert_table(spark, target_table: str, updates: DataFrame, key: str | list[str]) -> DataFrame:
    """MERGE INTO a saved table, picking the physical strategy by
    table format:

    - Delta/Iceberg target → a real ``MERGE INTO`` (file-level
      pruning, no full rewrite; the statement is ``merge_into_sql``).
    - anything else (parquet stand-in) → the logical
      ``merge_upsert`` plan materialized and written back whole.

    Both paths implement the identical contract (matched rows
    replaced, unmatched updates inserted, everything else persists)
    — asserted by the parity test in tests/test_operators.py.
    Returns the post-merge table.
    """
    keys = [key] if isinstance(key, str) else list(key)
    provider = table_provider(spark, target_table)
    if provider in MERGE_CAPABLE_PROVIDERS:
        # uuid suffix: concurrent merges into the same target in one
        # SparkSession must not race on create/drop of a shared view
        src = f"__merge_src_{uuid.uuid4().hex[:12]}"
        updates.createOrReplaceTempView(src)
        try:
            spark.sql(merge_into_sql(target_table, src, keys))
        finally:
            spark.catalog.dropTempView(src)
    else:
        current = spark.table(target_table)
        # localCheckpoint materializes the merge before the overwrite
        # drops the files it was computed from
        merged = merge_upsert(current, updates, keys).localCheckpoint()
        merged.write.mode("overwrite").saveAsTable(target_table)
    return spark.table(target_table)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    carry: dict[str, str] | None = None,
) -> DataFrame:
    """J6 as-of: for each left row, the most recent right row at or
    before ``left_ts`` with the same ``key``.

    Sort-based merge via union + last(ignorenulls) over an ordered
    window: one shuffle on ``key``, linear scan per partition — the
    plan you want at scale (no correlated subquery, no nested loop).
    ``carry`` maps output alias → right column to carry over (default:
    the right timestamp itself as ``asof_ts``). Right rows at exactly
    ``left_ts`` match (<=): on ties the right row sorts first.
    """
    carry = carry or {"asof_ts": right_ts}
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(a) for a, c in carry.items()]).alias("__carry"),
    )
    lt = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rt.schema["__carry"].dataType).alias("__carry"),
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("__last", F.last("__carry", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1).select(
        *left.columns, *[F.col(f"__last.{a}").alias(a) for a in carry]
    )
    return out


# ----------------------------------------------------------- aggregates

def group_count(df: DataFrame, *keys: str, alias: str = "cnt") -> DataFrame:
    """A1: count per group — partial+final hash agg, vs the
    reference's fetch-everything-then-``len`` count
    (ingestion-pipeline-website-local.py:94-118)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


def collect_sorted_csv(df: DataFrame, key: str, value: str, alias: str = "members") -> DataFrame:
    """A3: deterministic collect_list per group — the reference's
    per-index split grouping (ingestion-pipeline.py:255-278) as
    ``sort_array ∘ collect_list``, emitted as CSV so results are
    engine-comparable."""
    return df.groupBy(key).agg(
        F.array_join(F.sort_array(F.collect_list(F.col(value).cast("string"))), ",").alias(alias)
    )


def rollup_count(df: DataFrame, *keys: str, alias: str = "cnt") -> DataFrame:
    """A6: rollup across dimensions (ingestion report shape)."""
    return df.rollup(*keys).agg(F.count(F.lit(1)).alias(alias))


# -------------------------------------------------------------- windows

def row_number_in(df: DataFrame, part: str, order: Sequence[str], alias: str = "rn") -> DataFrame:
    """W1: ordinal within a partition (chunk ordinal within document,
    implicit in the reference's splitter order, ingestion-pipeline.py:231-243)."""
    w = Window.partitionBy(part).orderBy(*[F.col(c) for c in order])
    return df.withColumn(alias, F.row_number().over(w))


def top_k_per_group(
    df: DataFrame, part: Column | str, order: Sequence[Column], k: int
) -> DataFrame:
    """W2: rank-and-filter top-k per group (the similarity search
    ``with_limit(k)`` shape, ingestion-pipeline-website-local.py:172-175)."""
    w = Window.partitionBy(part).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def sessionize(
    df: DataFrame, key: str, ts: str, gap_minutes: int
) -> DataFrame:
    """ST4 batch equivalent: session windows via gap detection.

    lag + cumulative-sum-of-boundaries — one shuffle on ``key``; the
    streaming twin is ``F.session_window`` (streaming/pipeline.py).
    """
    w = Window.partitionBy(key).orderBy(ts)
    # seconds-since-epoch as double (NTZ-safe via unix_micros; the
    # session tz is pinned UTC so the NTZ→LTZ cast is the identity)
    sec = F.unix_micros(F.col(ts).cast("timestamp")) / F.lit(1_000_000.0)
    gap = sec - F.lag(sec).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new")


# ---------------------------------------------------------- sorts / topk

def top_n(df: DataFrame, order: Sequence[Column], n: int) -> DataFrame:
    """O2: order-by + limit → Spark plans TakeOrderedAndProject (no
    global sort materialization). Orderings passed in must be total
    (unique tiebreak) for deterministic results."""
    return df.orderBy(*order).limit(n)


# ---------------------------------------------------------- snapshot diff

def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    content: str = "body_md5",
    assert_unique: bool = False,
) -> DataFrame:
    """Crawl-generation delta: classify every key across two corpus
    snapshots as added / removed / changed / unchanged by comparing a
    content fingerprint — the decision step in front of incremental
    re-ingestion (plans/ingestion.py::incremental_ingest re-ingests
    'added' + 'changed'; 'removed' feeds index deletion, S10).

    Inputs need (key, content) columns; pass md5(body) as the
    fingerprint so the compare moves 32-byte digests, not page
    bodies — at 100 TB the full-outer join shuffles ~50 bytes/page
    instead of the corpus. One full outer join = the two key-hashed
    exchanges; everything else is scalar CASE logic.

    Precondition: ``key`` unique within each snapshot (canonicalize
    URLs first — `functions.html.canonical_url` — and distinct);
    duplicate keys multiply through the join. Pass
    ``assert_unique=True`` to fail LOUDLY at execution time instead
    (a windowed per-key count feeding ``assert_true`` — one extra
    exchange per side, so it is an opt-in debug/validation mode, not
    the production default).

    Presence is tracked with explicit per-side flags, NOT the
    fingerprint's nullability: a page whose stored fingerprint is
    NULL (md5 of a NULL body) must classify by key presence, and a
    NULL↔non-NULL transition is 'changed' (``eqNullSafe``), not
    silently 'unchanged' — a crawl where a page gains real content
    after an empty fetch must be re-ingested.
    """
    o = old.select(
        F.col(key).alias("__k"),
        F.col(content).alias("__old"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(key).alias("__k"),
        F.col(content).alias("__new"),
        F.lit(True).alias("__in_new"),
    )
    if assert_unique:
        w = Window.partitionBy("__k")
        def guard(side: DataFrame, label: str) -> DataFrame:
            # window count materialized as a column (window exprs are
            # illegal directly in WHERE), then asserted in a filter so
            # the optimizer cannot prune the check away: assert_true
            # yields NULL when it passes, so isNull() keeps valid rows
            side = side.withColumn("__kcnt", F.count(F.lit(1)).over(w))
            chk = F.assert_true(
                F.col("__kcnt") == 1,
                F.concat(
                    F.lit(f"snapshot_diff: duplicate {key} in {label} snapshot: "),
                    F.col("__k").cast("string"),
                ),
            )
            return side.filter(chk.isNull()).drop("__kcnt")
        o = guard(o, "old")
        n = guard(n, "new")
    return (
        o.join(n, "__k", "full_outer")
        .select(
            F.col("__k").alias(key),
            F.when(F.col("__in_old").isNull(), "added")
            .when(F.col("__in_new").isNull(), "removed")
            .when(~F.col("__old").eqNullSafe(F.col("__new")), "changed")
            .otherwise("unchanged")
            .alias("status"),
        )
    )


# ---------------------------------------------------------- funnel analysis

def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each user who performed
    ``steps[0]``, the earliest time they completed each subsequent
    step STRICTLY AFTER the previous one (first-touch attribution),
    plus ``reached`` = how deep they got. The classic product
    analytics query (view → click → purchase), here as ONE shuffle:
    every per-step time is a conditional window-min over the same
    user partitioning (chained selects reuse the exchange — k steps
    cost k window passes over already-partitioned data, not k
    joins), and the final per-user reduce rides the same hash
    partitioning. Users who never did step 0 are absent (funnel
    entrants only)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col)
    cur = events.select(user_col, ts_col, type_col)
    prev: str | None = None
    tcols = []
    for s in steps:
        tcol = f"t_{s}"
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        cur = cur.withColumn(tcol, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = tcol
        tcols.append(tcol)
    # per-user reduce: window results are constant per user, min()
    # collapses without moving data (same hash partitioning)
    out = (
        cur.groupBy(user_col)
        .agg(*[F.min(t).alias(t) for t in tcols])
        .filter(F.col(tcols[0]).isNotNull())
    )
    reached = F.lit(0)
    for i, t in enumerate(tcols):
        reached = F.when(F.col(t).isNotNull(), F.lit(i + 1)).otherwise(reached)
    return out.withColumn("reached", reached.cast("int"))



def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix: (cohort_week, week_offset,
    n_users) — of the users whose FIRST event fell in cohort_week
    (Monday-truncated), how many were active again week_offset weeks
    later. week_offset 0 is the cohort size itself, so
    retention-rate = n_users / n_users@offset0 downstream. The
    standard growth-analytics readout (complement of funnel_steps:
    funnels measure depth within a visit, cohorts measure return
    across weeks).

    Plan — 3 shuffles, all on keys the data is already skew-safe on:
    (1) per-user min(ts) agg keyed on user; (2) join of events back
    to their user's cohort — keyed on user, and the agg output
    arrives already hash-partitioned by user so AQE reuses the
    exchange; (3) the distinct-(cohort, offset, user) + count agg.
    A user's weekly activity collapses to ≤ 1 row per (user, week)
    BEFORE the final count via the distinct, partial-aggregated
    map-side. No window over the raw event stream — at 100 TB the
    per-user agg is the cheap half and the join fans each event row
    to exactly one output row.
    """
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    cohort = F.date_trunc("week", F.col("__first_ts")).cast("date")
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    return (
        events.select(user_col, ts_col)
        .join(first, user_col)
        .select(
            F.col(user_col).alias("__u"),
            cohort.alias("cohort_week"),
            (F.datediff(week, cohort) / 7).cast("int").alias("week_offset"),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = "event_id",
    min_count: int = 1,
) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence: (from_type, to_type, n, p_micros) where p_micros is
    the integer-micros conditional probability of to_type given
    from_type (n * 1_000_000 // row_total — exact BIGINT arithmetic,
    the cross-engine-hashable discipline PageRank/HITS use; the
    floor leaves Σp ≤ 1e6 per row, ordering unaffected). The
    session-path / next-event model behind "users who error next do
    X" analyses and synthetic-session generators.

    Plan: ONE window (lead over (user) ordered by (ts, tiebreak) —
    the tiebreak makes the sequence deterministic under equal
    timestamps, which cross-engine correctness requires) → pair
    count agg → a per-from_type total via a second window over the
    counted matrix, which is |types|² rows, not |events| — the
    row-normalization never touches event-scale data. 2 event-scale
    shuffles total (window + agg); the matrix-scale window is free.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.select(user_col, ts_col, type_col, *([tiebreak_col] if tiebreak_col else []))
        .withColumn("__next", F.lead(type_col).over(w))
        .where(F.col("__next").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"), F.col("__next").alias("to_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Row totals BEFORE the min_count filter: p_micros stays the true
    # conditional probability even when rare transitions are pruned
    # from the report. The multiply runs in DECIMAL(38,0) (r14
    # ADVICE): a BIGINT n * 1e6 would overflow silently past ~9.2e12
    # transitions per pair — improbable, but the module promises
    # 100 TB arithmetic, so the promise is in the type, not a hope.
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.expr(
            "(cast(n as decimal(38,0)) * 1000000)"
            " div sum(n) over (partition by from_type)"
        )
        .cast("bigint")
        .alias("p_micros"),
    ).where(F.col("n") >= int(min_count))
