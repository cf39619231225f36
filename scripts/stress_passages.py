"""repeated_passage_spans stress at 1M documents (SCALE.md evidence
for the r09 sub-document dedup operator).

Reuses stress_dedup's pure-SQL corpus synthesizer (1M docs, ~360
chars each → ~19 strided 64-char shingles/doc ≈ 19M exploded rows),
then plants the two regimes that only matter at size:

- a shared boilerplate prefix on 5% of docs (one popular passage
  whose shingle hashes collect ~50k docs each — the window-skew case
  the min/max plan must survive without a collect_set blowup);
- the synthesizer's hot groups (identical docs sharing EVERY
  shingle).

Times the full operator and prints one JSON line. The correctness
anchor: every boilerplate carrier must be reported.

Usage: python scripts/stress_passages.py [--n-unique 940000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-unique", type=int, default=940000)
    ap.add_argument("--n-groups", type=int, default=10000)
    ap.add_argument("--group-size", type=int, default=5)
    ap.add_argument("--n-hot", type=int, default=5)
    ap.add_argument("--hot-size", type=int, default=2000)
    args = ap.parse_args()

    from data_ingestion_spark.functions.dedup import repeated_passage_spans
    from data_ingestion_spark.session import get_spark
    from scripts.stress_dedup import synth_corpus

    spark = get_spark("stress-passages")
    corpus = synth_corpus(
        spark, args.n_unique, args.n_groups, args.group_size, args.n_hot, args.hot_size
    )
    boiler = "COMMON LICENSE BOILERPLATE ALL RIGHTS RESERVED WORLDWIDE TERMS APPLY. "
    docs = corpus.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 20 == 0, F.concat(F.lit(boiler), F.col("text"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).persist()
    n_total = docs.count()  # materialize: timing excludes synthesis

    t0 = time.time()
    out = repeated_passage_spans(docs, "text", "doc_id", k=64, stride=16)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs_with_shared"),
        F.sum("n_shared_spans").alias("total_shared_spans"),
    ).collect()[0]
    t = time.time() - t0

    # correctness anchor: all boilerplate carriers report shared spans
    carriers = docs.filter(F.col("doc_id") % 20 == 0).count()
    found_carriers = out.filter(F.col("doc_id") % 20 == 0).count()
    docs.unpersist()
    assert found_carriers == carriers, (found_carriers, carriers)

    print(
        json.dumps(
            {
                "metric": "passages_stress",
                "n_docs": n_total,
                "boiler_carriers": carriers,
                "docs_with_shared": agg["docs_with_shared"],
                "total_shared_spans": int(agg["total_shared_spans"]),
                "sec": round(t, 2),
                "docs_per_sec": round(n_total / t, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
