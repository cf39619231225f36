"""Round-15 stress: bigram LM quality scoring at corpus scale —
1M synthetic documents (~30 tokens each, ~30M bigrams) scored against
a 100k-doc reference model. Validates the V7 posture: model = two
partial-agg shuffles over the reference; scoring = two token-keyed
equi-joins + one per-doc agg; no Python anywhere.

Docs mix two dialects: even ids draw tokens from the reference
vocabulary (should score LOW NLL), odd ids from a disjoint gibberish
vocabulary (HIGH NLL — every bigram smooths to the floor). The
separation check is the quality-signal property at scale.

Usage: python scripts/stress_lm.py [--n-docs 1000000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from data_ingestion_spark.functions.textops import (
    bigram_lm_score,
    trigram_lm_score,
)
from data_ingestion_spark.session import get_spark


def _synth(spark, n: int, vocab_prefix: str, tokens_per_doc: int = 30):
    """Structured 'language': token_j = prefix + (h0(doc) + j) % 500 —
    a closed-form Markov walk (successor = +1 mod 500), so documents
    sharing the dialect share a SMALL, heavily-repeated bigram set
    (what real language looks like to a bigram model), while h0
    varies the window per doc. A uniform-random draw would make even
    same-dialect bigrams mostly unseen and flatten the NLL signal —
    the add-k floor for an unseen CONTEXT (ln V/k) is lower than for
    an unseen pair under a seen context (ln (c+kV)/k), an instructive
    smoothing artifact the structured generator sidesteps."""
    h0 = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint"),
        F.lit(500),
    )
    tok = F.transform(
        F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
        lambda j: F.concat(
            F.lit(vocab_prefix),
            F.pmod(h0 + j, F.lit(500)).cast("string"),
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", tok).alias("text")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=1_000_000)
    ap.add_argument("--n-ref", type=int, default=100_000)
    ap.add_argument(
        "--order",
        choices=("bigram", "trigram"),
        default="bigram",
        help="score with the add-k bigram or the stupid-backoff trigram "
        "(r16 — one more count table + joins; same micros discipline)",
    )
    ap.add_argument(
        "--buckets",
        action="store_true",
        help="also time the r16 scale-safe tercile cut (ntile_buckets) "
        "over the scored table and check cohort purity",
    )
    args = ap.parse_args()
    spark = get_spark("stress-lm", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    ref = _synth(spark, args.n_ref, "w").select("text")
    docs = _synth(spark, args.n_docs // 2, "w").unionByName(
        _synth(spark, args.n_docs // 2, "g").select(
            (F.col("doc_id") + args.n_docs).alias("doc_id"), "text"
        )
    )
    t0 = time.time()
    scorer = bigram_lm_score if args.order == "bigram" else trigram_lm_score
    scored = scorer(docs, ref)
    agg = (
        scored.select(
            F.when(F.col("doc_id") < args.n_docs, "ref_like")
            .otherwise("gibberish")
            .alias("cohort"),
            "nll_micros",
        )
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.avg("nll_micros") / 1e6).alias("mean_nll"),
            (F.max("nll_micros") / 1e6).alias("max_nll"),
            (F.min("nll_micros") / 1e6).alias("min_nll"),
        )
        .collect()
    )
    wall = round(time.time() - t0, 1)
    rows = {r.cohort: r for r in agg}
    rec = {
        "case": f"{args.order}_lm_1m",
        "n_docs": args.n_docs,
        "n_ref": args.n_ref,
        "wall_sec": wall,
        "docs_per_sec": round(args.n_docs / wall),
        "ref_like_mean_nll": round(rows["ref_like"].mean_nll, 3),
        "gibberish_mean_nll": round(rows["gibberish"].mean_nll, 3),
        # full separation: the worst reference-like doc still beats
        # the best gibberish doc
        "separated": rows["ref_like"].max_nll < rows["gibberish"].min_nll,
    }
    if args.buckets:
        # the CCNet tercile cut at scale, on the r16 scale-safe path
        # (ntile_buckets: bounded histogram + boundary elements +
        # broadcast CASE — no unpartitioned window). Correctness
        # check rides the cohort structure: the gibberish half scores
        # strictly above the reference half, so 'tail' must be 100%
        # gibberish and 'head' 100% reference-like.
        from data_ingestion_spark.operators.quantiles import ntile_buckets

        nll = scorer(docs, ref).select("doc_id", "nll_micros").persist()
        t1 = time.time()
        bucketed = ntile_buckets(
            nll, "nll_micros", "doc_id", 3, labels=["head", "middle", "tail"]
        )
        mix = {
            (r.bucket, r.cohort): r.n
            for r in bucketed.select(
                "bucket",
                F.when(F.col("doc_id") < args.n_docs, "ref_like")
                .otherwise("gibberish")
                .alias("cohort"),
            )
            .groupBy("bucket", "cohort")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        nll.unpersist()
        rec["buckets_wall_sec"] = round(time.time() - t1, 1)
        rec["head_pure_ref"] = ("head", "gibberish") not in mix
        rec["tail_pure_gibberish"] = ("tail", "ref_like") not in mix
    print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
