"""Retrieval ranking evaluation: MRR, recall@k, nDCG@k.

Reference anchor: the reference serves similarity search and RAG
(ingestion-pipeline-website-local.py Q:160–188) but has no way to
MEASURE retrieval quality; an engine shipping BM25/hybrid/ANN
rankings needs the standard eval metrics next to them, computed
in-engine over (ranking, relevance-judgment) tables — the offline
eval loop every serving stack runs.

Determinism (the integer-micros discipline): every per-hit float
term (1/rank, 1/log2(rank+1)) is rounded to BIGINT micros BEFORE
the per-query sum, so aggregation order cannot flap a value; the
ideal-DCG denominators are PRECOMPUTED integer constants indexed by
|relevant| (an array literal, not a float sum at runtime); the
final nDCG is one deterministic division of two integers. Shape:
one broadcastable qrels join + one per-query reduce — no windows
over the corpus, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _idcg_prefix_micros(k: int) -> list[int]:
    """idcg_micros[i-1] = Σ_{j=1..i} round(1e6 / log2(j+1)) — the
    ideal DCG for i relevant docs under binary relevance, as exact
    integer constants shared verbatim with the SQL oracle."""
    out, acc = [], 0
    for j in range(1, k + 1):
        acc += round(1_000_000 / math.log2(j + 1))
        out.append(acc)
    return out


def retrieval_metrics(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query binary-relevance metrics over a top-``k`` ranking:

    - ``n_rel`` — total relevant docs for the query (from qrels);
    - ``hits`` — relevant docs inside the top-k;
    - ``rr_micros`` — 1e6/first-relevant-rank (0 when no hit);
    - ``recall_k_micros`` — 1e6 * hits/n_rel;
    - ``ndcg_k_micros`` — 1e6 * DCG@k/IDCG@k, every term
      micros-rounded pre-sum, IDCG from the precomputed constants.

    ``ranked``: (query_id, doc_id, rank) with rank 1..k per query —
    the shape `bm25_rank_batch`/`hybrid` emit. ``qrels``: (query_id,
    doc_id) pairs judged relevant (binary). Queries present in
    ``qrels`` but retrieving zero relevant docs still appear (zero
    metrics); queries absent from ``qrels`` are dropped — no
    judgments means no score, not a zero."""
    r = ranked.select(
        F.col(query_id_col).alias("__q"),
        F.col(id_col).alias("__d"),
        F.col(rank_col).alias("__rank"),
    ).filter(F.col("__rank") <= k)
    j = qrels.select(
        F.col(query_id_col).alias("__q"), F.col(id_col).alias("__d")
    ).distinct()
    n_rel = j.groupBy("__q").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = r.join(j, ["__q", "__d"], "inner").select(
        "__q",
        "__rank",
        F.round(F.lit(1_000_000.0) / F.col("__rank")).cast("bigint").alias("__rr"),
        F.round(
            F.lit(1_000_000.0) / F.log2(F.col("__rank") + F.lit(1.0))
        ).cast("bigint").alias("__gain"),
    )
    per_q = hits.groupBy("__q").agg(
        F.count(F.lit(1)).alias("hits"),
        F.max("__rr").alias("rr_micros"),  # max(1/rank) == first hit
        F.sum("__gain").alias("__dcg"),
    )
    idcg = F.element_at(
        F.array(*[F.lit(v) for v in _idcg_prefix_micros(k)]),
        F.least(F.col("n_rel"), F.lit(k)).cast("int"),
    )
    return (
        n_rel.join(per_q, "__q", "left_outer")
        .select(
            F.col("__q").alias(query_id_col),
            "n_rel",
            F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits"),
            F.coalesce(F.col("rr_micros"), F.lit(0)).cast("bigint").alias("rr_micros"),
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)) * F.lit(1_000_000.0)
                / F.col("n_rel")
            ).cast("bigint").alias("recall_k_micros"),
            F.round(
                F.coalesce(F.col("__dcg"), F.lit(0)) * F.lit(1_000_000.0) / idcg
            ).cast("bigint").alias("ndcg_k_micros"),
        )
    )
