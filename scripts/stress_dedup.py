"""Dedup-chain stress at 1M documents (SCALE.md §6 evidence).

Synthesizes a corpus whose skew profile only appears at size:

- ``n_unique`` singletons (no duplicate exists);
- ``n_groups`` near-duplicate groups of ``group_size`` (one word
  perturbed per member) — the payload LSH must find;
- ``n_hot`` groups of ``hot_size`` IDENTICAL docs — the adversarial
  case: every band bucket for these floods to ``hot_size`` ids and
  would expand to hot_size²/2 pairs per band without the guard.

Then runs the production chain and times each stage:

1. exact dedup (hash groupBy) — collapses the identical hot groups;
2. MinHash-LSH fast path (xxhash64, ``max_bucket`` ON) over the
   exact-dedup representatives;
3. connected components (``dup_clusters``) over the candidates;
4. the b² demonstration: the LSH pair stage WITHOUT the exact pass,
   capped vs uncapped, on the raw corpus — showing the guard turning
   an unbounded quadratic expansion into a bounded one.

Usage: python scripts/stress_dedup.py [--n-unique 940000]
       [--n-groups 10000] [--group-size 5] [--n-hot 5]
       [--hot-size 2000] [--skip-uncapped]
Prints one JSON line per stage and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synth_corpus(spark, n_unique, n_groups, group_size, n_hot, hot_size):
    """1M-doc corpus as pure SQL expressions (no driver-side data).

    Texts are 40 words of 8 hex chars each, seeded from the logical
    doc identity, so the generator is deterministic and runs where the
    data lives. Near-dup members perturb exactly one word position.
    """
    n_near = n_groups * group_size
    n_total = n_unique + n_near + n_hot * hot_size

    def words(seed_col, perturb_pos=None, perturb_seed=None):
        def one(w):
            base = F.substring(F.md5(F.concat(seed_col, F.lit(f"|w{w}"))), 1, 8)
            if perturb_pos is None:
                return base
            return F.when(
                perturb_pos == w,
                F.substring(F.md5(F.concat(perturb_seed, F.lit(f"|p{w}"))), 1, 8),
            ).otherwise(base)

        return F.concat_ws(" ", *[one(w) for w in range(40)])

    ids = spark.range(n_total).withColumnRenamed("id", "doc_id")
    is_unique = F.col("doc_id") < n_unique
    near_off = F.col("doc_id") - n_unique
    is_near = (~is_unique) & (near_off < n_near)
    g = (near_off / group_size).cast("long")  # near-dup group
    m = (near_off % group_size).cast("int")  # member in group
    hot_off = near_off - n_near
    hot_g = (hot_off / hot_size).cast("long")

    text = (
        F.when(is_unique, words(F.concat(F.lit("u|"), F.col("doc_id"))))
        .when(
            is_near,
            words(
                F.concat(F.lit("g|"), g),
                perturb_pos=m,  # member m rewrites word m
                perturb_seed=F.concat(F.lit("g|"), g, F.lit("|m|"), m),
            ),
        )
        .otherwise(words(F.concat(F.lit("h|"), hot_g)))
    )
    return ids.select("doc_id", text.alias("text"))


def timed(label, fn):
    t0 = time.monotonic()
    out = fn()
    wall = round(time.monotonic() - t0, 1)
    print(json.dumps({"stage": label, "wall_sec": wall, **out}), flush=True)
    return wall, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-unique", type=int, default=940_000)
    ap.add_argument("--n-groups", type=int, default=10_000)
    ap.add_argument("--group-size", type=int, default=5)
    ap.add_argument("--n-hot", type=int, default=5)
    ap.add_argument("--hot-size", type=int, default=2_000)
    ap.add_argument("--skip-uncapped", action="store_true")
    args = ap.parse_args()

    import os

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_ingestion_spark.functions.dedup import (
        dup_clusters,
        minhash_lsh_candidates_fast,
    )

    corpus = synth_corpus(
        spark, args.n_unique, args.n_groups, args.group_size, args.n_hot, args.hot_size
    ).repartition(int(cpus) * 2)
    t_synth, _ = timed(
        "synthesize+materialize",
        lambda: {"docs": corpus.localCheckpoint().count()},
    )

    # --- 1. exact pass: identical docs collapse in ONE shuffle -------
    reps = corpus.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id"), F.first("text").alias("text")
    )
    # capture the checkpointed frame produced INSIDE the timed closure
    # (a second .localCheckpoint() outside it would re-materialize the
    # whole stage untimed, double-counting the work)
    ckpt: dict[str, object] = {}
    t_exact, exact_out = timed(
        "exact_dedup_representatives",
        lambda: {
            "representatives": ckpt.setdefault("reps", reps.localCheckpoint()).count()
        },
    )
    reps = ckpt["reps"]

    # --- 2. LSH fast path over representatives (cap ON) --------------
    cand = minhash_lsh_candidates_fast(reps, "text", "doc_id")
    t_lsh, lsh_out = timed(
        "minhash_lsh_fast_capped",
        lambda: {
            "candidate_pairs": ckpt.setdefault("cand", cand.localCheckpoint()).count()
        },
    )
    cand = ckpt["cand"]

    # --- 3. connected components over candidates ----------------------
    def run_cc():
        clusters = dup_clusters(cand)
        sizes = clusters.groupBy("cluster_id").count()
        agg = sizes.agg(
            F.count("*").alias("n_clusters"), F.max("count").alias("max_size")
        ).collect()[0]
        return {"n_clusters": agg.n_clusters, "max_cluster_size": agg.max_size}

    t_cc, cc_out = timed("connected_components", run_cc)

    # --- 4. the b² demonstration: no exact pass, capped vs uncapped ---
    t_adv_cap, adv_cap = timed(
        "adversarial_lsh_capped",
        lambda: {
            "pairs": minhash_lsh_candidates_fast(corpus, "text", "doc_id").count()
        },
    )
    t_adv_un = None
    if not args.skip_uncapped:
        t_adv_un, adv_un = timed(
            "adversarial_lsh_UNCAPPED",
            lambda: {
                "pairs": minhash_lsh_candidates_fast(
                    corpus, "text", "doc_id", max_bucket=None
                ).count()
            },
        )

    print(
        json.dumps(
            {
                "summary": "dedup_chain_1m",
                "docs": args.n_unique
                + args.n_groups * args.group_size
                + args.n_hot * args.hot_size,
                "chain_sec": round(t_exact + t_lsh + t_cc, 1),
                "stages": {
                    "synth": t_synth,
                    "exact": t_exact,
                    "lsh": t_lsh,
                    "cc": t_cc,
                    "adversarial_capped": t_adv_cap,
                    "adversarial_uncapped": t_adv_un,
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
