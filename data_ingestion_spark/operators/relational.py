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
