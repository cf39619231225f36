"""Retrieval metrics: hand-computed values, zero-hit and
unjudged-query contracts, micros determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestion_spark.functions.ranking_eval import (
    _idcg_prefix_micros,
    retrieval_metrics,
)


def test_metrics_hand_computed(spark):
    ranked = spark.createDataFrame(
        # q1: relevant at ranks 1 and 3 (of 3 relevant overall)
        [(1, 101, 1), (1, 102, 2), (1, 103, 3)]
        # q2: no relevant retrieved
        + [(2, 201, 1), (2, 202, 2)]
        # q3: perfect single hit at rank 2 (1 relevant overall)
        + [(3, 301, 1), (3, 302, 2)],
        "query_id int, doc_id int, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 101), (1, 103), (1, 999), (2, 555), (3, 302)],
        "query_id int, doc_id int",
    )
    got = {r.query_id: r for r in retrieval_metrics(ranked, qrels, k=10).collect()}
    assert set(got) == {1, 2, 3}

    g1 = round(1e6 / math.log2(2)) + round(1e6 / math.log2(4))  # ranks 1, 3
    idcg3 = _idcg_prefix_micros(10)[2]  # 3 relevant
    assert (got[1].n_rel, got[1].hits, got[1].rr_micros) == (3, 2, 1_000_000)
    assert got[1].recall_k_micros == round(2 * 1e6 / 3)
    assert got[1].ndcg_k_micros == round(g1 * 1e6 / idcg3)

    assert (got[2].n_rel, got[2].hits, got[2].rr_micros,
            got[2].recall_k_micros, got[2].ndcg_k_micros) == (1, 0, 0, 0, 0)

    idcg1 = _idcg_prefix_micros(10)[0]
    assert (got[3].n_rel, got[3].hits, got[3].rr_micros) == (1, 1, 500_000)
    assert got[3].recall_k_micros == 1_000_000
    assert got[3].ndcg_k_micros == round(round(1e6 / math.log2(3)) * 1e6 / idcg1)


def test_unjudged_queries_dropped_and_rank_cut(spark):
    """No judgments -> no row (not a zero); hits past k ignored."""
    ranked = spark.createDataFrame(
        [(1, 11, 1), (9, 11, 1), (1, 12, 11)],  # q9 unjudged; rank 11 beyond k
        "query_id int, doc_id int, rank int",
    )
    qrels = spark.createDataFrame([(1, 12)], "query_id int, doc_id int")
    rows = retrieval_metrics(ranked, qrels, k=10).collect()
    assert [(r.query_id, r.hits) for r in rows] == [(1, 0)]  # rank-11 hit not counted


def test_idcg_constants_are_prefix_sums():
    pref = _idcg_prefix_micros(10)
    assert pref[0] == 1_000_000
    assert all(b > a for a, b in zip(pref, pref[1:]))
    assert pref[1] == 1_000_000 + round(1e6 / math.log2(3))


def test_bool_phrase_serving_quality_pinned(spark, tmp_path):
    """r13 (r12 verdict #8): the boolean and phrase serving paths are
    quality-gated by the same MRR/recall/nDCG harness as the hybrid
    stack — exact pinned micros at sf0.001 (integer-deterministic
    arithmetic, arithmetic qrels rel(q,d) <=> d % (7+3q) = 0). Any
    index-layout change that moves a bool/phrase ranking flips these
    numbers; BENCH_NOTES carries the sf0.1 table."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from quality_metrics_bool_phrase import bool_phrase_metrics

    b, p = bool_phrase_metrics(spark, "/root/testdata/sf0.001", str(tmp_path))
    key = lambda r: (r.query_id, r.n_rel, r.hits, r.rr_micros,
                     r.recall_k_micros, r.ndcg_k_micros)
    assert sorted(map(key, b.collect())) == [
        (1, 50, 2, 250000, 40000, 164220),
        (2, 39, 2, 250000, 51282, 168152),
        (3, 32, 0, 0, 0, 0),
    ]
    assert sorted(map(key, p.collect())) == [
        (1, 50, 1, 200000, 20000, 85143),
        (2, 39, 1, 166667, 25641, 78398),
        (3, 32, 0, 0, 0, 0),
        (4, 27, 0, 0, 0, 0),
    ]
