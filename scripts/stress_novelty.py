"""Round-16 stress: the incremental-crawl novelty gate at corpus
scale — a 100k-doc crawl DELTA gated against a 1M-doc at-rest
generation. Validates the K7 posture: cost is priced by the delta
(band_table over both sides = explode + partial-agg groupBy; the
semi-join is Σ|delta_bucket|·|rest_bucket|; the at-rest corpus is
never self-paired).

The delta plants all three cohorts at known rates: 1/4 exact
re-entries of at-rest docs, 1/4 tail-edited near-dups of at-rest
docs, 1/2 genuinely novel text (disjoint token space). The check is
that the gate admits exactly the novel half (near-dup banding is
md5-deterministic, so the expected admit set is exact, not
probabilistic-banded: a tail edit on a 30-token doc leaves >90% of
3-shingles shared, and with 8 hashes x 4 bands every planted
near-dup collides on at least one band in this generator).

Usage: python scripts/stress_novelty.py [--n-rest 1000000 --n-delta 100000]
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

from data_ingestion_spark.functions.dedup import novelty_gate
from data_ingestion_spark.session import get_spark


def _text(prefix: str, tokens_per_doc: int = 30, span: int = 5000):
    """Structured text: token_j = prefix + (h0(doc_id) + j) % span —
    same-dialect docs share windows of a small token space (the
    stress_lm generator), so shingles repeat the way real text does."""
    h0 = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint"),
        F.lit(span),
    )
    tok = F.transform(
        F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
        lambda j: F.concat(
            F.lit(prefix), F.pmod(h0 + j, F.lit(span)).cast("string")
        ),
    )
    return F.concat_ws(" ", tok)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-rest", type=int, default=1_000_000)
    ap.add_argument("--n-delta", type=int, default=100_000)
    args = ap.parse_args()
    spark = get_spark("stress-novelty", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    rest = spark.range(args.n_rest).select(
        F.col("id").alias("doc_id"), _text("w").alias("text")
    )
    q = args.n_delta // 4
    exact = rest.filter(F.col("doc_id") < q).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    near = rest.filter(F.col("doc_id").between(q, 2 * q - 1)).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" edited tail")).alias("text"),
    )
    novel = spark.range(args.n_delta - 2 * q).select(
        (F.col("id") + 30_000_000).alias("doc_id"), _text("z").alias("text")
    )
    delta = exact.unionByName(near).unionByName(novel)

    t0 = time.time()
    admitted = novelty_gate(delta, rest, "text", "doc_id")
    n_admit = admitted.count()
    wall = round(time.time() - t0, 1)
    admit_novel = admitted.filter(F.col("doc_id") >= 30_000_000).count()
    rec = {
        "case": "novelty_gate_1m_rest_100k_delta",
        "n_rest": args.n_rest,
        "n_delta": args.n_delta,
        "wall_sec": wall,
        "delta_docs_per_sec": round(args.n_delta / wall),
        "admitted": n_admit,
        "expected_novel": args.n_delta - 2 * q,
        "admitted_all_novel": n_admit == admit_novel,
        "exact_and_near_all_dropped": n_admit == args.n_delta - 2 * q,
    }
    print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
