#!/usr/bin/env python
"""r13 (r12 verdict #8): tracked retrieval-quality numbers for the
BOOLEAN and PHRASE serving paths — the same MRR/recall@10/nDCG@10
harness that already gates the hybrid stack (hybrid_eval_metrics),
applied to the other two index-serving surfaces so an index-layout
change is quality-gated everywhere it serves. Arithmetic qrels
rel(q,d) <=> d % (7+3q) = 0 (the retrieval_eval_metrics convention).

Usage: python scripts/quality_metrics_bool_phrase.py [sf_dir ...]
Prints one markdown table per surface per sf; numbers land in
BENCH_NOTES.md and are pinned at sf0.001 in tests/test_ranking_eval
(test_bool_phrase_serving_quality_pinned).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window, functions as F


def bool_phrase_metrics(spark, sf_dir: str, idx_root: str):
    """(bool_metrics_df, phrase_metrics_df) at ``sf_dir`` — the exact
    computation the pytest pin and the BENCH_NOTES table share."""
    from data_ingestion_spark.functions.ranking_eval import retrieval_metrics
    from data_ingestion_spark.functions.similarity import (
        bool_search_indexed,
        build_postings_index,
        phrase_match,
    )
    from data_ingestion_spark.queries_vector import _BOOL_QUERIES, _PHRASE_QUERIES

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    idx = os.path.join(idx_root, "idx")
    build_postings_index(d, idx, positions=True)

    qids = spark.createDataFrame(
        [(i,) for i, *_ in _BOOL_QUERIES], "query_id int"
    )
    qrels = (
        d.select("doc_id")
        .join(F.broadcast(qids))
        .filter(F.col("doc_id") % (7 + F.col("query_id") * 3) == 0)
        .select("query_id", "doc_id")
    )

    bq = spark.createDataFrame(
        _BOOL_QUERIES,
        "query_id int, must array<string>, should array<string>, "
        "must_not array<string>",
    )
    bool_ranked = bool_search_indexed(spark, bq, idx, topk=10)
    bool_m = retrieval_metrics(bool_ranked, qrels, k=10)

    pq = spark.createDataFrame(_PHRASE_QUERIES, "query_id int, query_text string")
    hits = phrase_match(spark, pq, idx)
    w = Window.partitionBy("query_id").orderBy(F.col("n_hits").desc(), "doc_id")
    phrase_ranked = (
        hits.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10)
    )
    pids = spark.createDataFrame(
        [(i,) for i, _ in _PHRASE_QUERIES], "query_id int"
    )
    p_qrels = (
        d.select("doc_id")
        .join(F.broadcast(pids))
        .filter(F.col("doc_id") % (7 + F.col("query_id") * 3) == 0)
        .select("query_id", "doc_id")
    )
    phrase_m = retrieval_metrics(phrase_ranked, p_qrels, k=10)
    return bool_m, phrase_m


def main() -> None:
    sfs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sf in sfs:
        with tempfile.TemporaryDirectory(prefix="qm13_") as tmp:
            bool_m, phrase_m = bool_phrase_metrics(spark, sf, tmp)
            for name, m in (("bool", bool_m), ("phrase", phrase_m)):
                print(f"\n### {name} serving @ {sf}")
                print("| query | n_rel | hits | MRR | recall@10 | nDCG@10 |")
                print("|---|---|---|---|---|---|")
                for r in sorted(m.collect(), key=lambda r: r.query_id):
                    print(
                        f"| q{r.query_id} | {r.n_rel} | {r.hits} | "
                        f"{r.rr_micros / 1e6:.4f} | "
                        f"{r.recall_k_micros / 1e6:.4f} | "
                        f"{r.ndcg_k_micros / 1e6:.4f} |"
                    )


if __name__ == "__main__":
    main()
