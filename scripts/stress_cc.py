"""Connected-components stress: label propagation vs star contraction.

The two CC implementations (functions/dedup.py) trade per-round cost
against round count:

- ``dup_clusters`` (min-label propagation): 1 join + 1 groupBy per
  round, O(diameter) rounds — right for LSH near-dup graphs (cliques,
  diameter 2-3).
- ``dup_clusters_star`` (large-star/small-star, Kiveris et al.
  SoCC'14): 2 joins + 2 groupBys per round, O(log² n) rounds
  regardless of diameter — the safe default for unknown edge
  structure (URL graphs, citation chains).

This script makes the crossover measurable at 1M nodes:

1. a CLIQUE-HEAVY graph (200k components of size 5 — the LSH dedup
   shape): propagation should win (2-3 rounds either way, star pays
   double per round);
2. a DEEP-CHAIN graph (1M nodes in chains of length 10,000 —
   diameter 9,999): propagation needs 10k rounds (we cap it and show
   it DID NOT CONVERGE); star converges in ~O(log) alternating
   rounds.

Usage: python scripts/stress_cc.py [--n 1000000] [--chain-len 10000]
Prints one JSON line per case and a summary line.
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

from data_ingestion_spark.functions.dedup import dup_clusters, dup_clusters_star


def log(**kw) -> None:
    print(json.dumps(kw), flush=True)


def clique_edges(spark, n: int, size: int):
    """n nodes in n/size cliques: edges (i, j) within each block."""
    base = spark.range(n).select(
        (F.col("id") - F.col("id") % size).alias("root"), F.col("id")
    )
    a = base.alias("a")
    b = base.alias("b")
    return (
        a.join(b, (F.col("a.root") == F.col("b.root")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )


def chain_edges(spark, n: int, chain_len: int):
    """n nodes in n/chain_len disjoint paths: edge (i, i+1) unless i
    ends a chain."""
    return (
        spark.range(n)
        .filter((F.col("id") % chain_len) != chain_len - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )


def run_case(name: str, edges, algos: dict) -> dict:
    edges = edges.localCheckpoint()  # same materialized input for both
    n_edges = edges.count()
    out = {"case": name, "n_edges": n_edges}
    for algo_name, (fn, kwargs, expect_converged) in algos.items():
        size = kwargs.pop("_size")
        t0 = time.perf_counter()
        labels = fn(edges, **kwargs)
        n_clusters = labels.select("cluster_id").distinct().count()
        wall = round(time.perf_counter() - t0, 2)
        # convergence witness: every cluster_id must be the component
        # min — for our synthetic graphs that means cluster_id % size
        # == 0; an unconverged propagation leaves intermediate labels
        bad = labels.filter(F.col("cluster_id") % size != 0).count()
        out[algo_name] = {
            "wall_s": wall,
            "n_clusters": n_clusters,
            "unconverged_labels": bad,
            "expected_converged": expect_converged,
        }
        log(case=name, algo=algo_name, **out[algo_name])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--chain-len", type=int, default=10_000)
    ap.add_argument("--clique-size", type=int, default=5)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .appName("stress-cc")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    results.append(
        run_case(
            "clique_heavy",
            clique_edges(spark, args.n, args.clique_size),
            {
                "propagation": (
                    dup_clusters,
                    {"max_iters": 20, "_size": args.clique_size},
                    True,
                ),
                "star": (
                    dup_clusters_star,
                    {"max_iters": 50, "_size": args.clique_size},
                    True,
                ),
            },
        )
    )
    results.append(
        run_case(
            "deep_chain",
            chain_edges(spark, args.n, args.chain_len),
            {
                # capped at 12 rounds: demonstrates propagation CANNOT
                # finish a diameter-10k graph in bounded rounds
                "propagation_capped12": (
                    dup_clusters,
                    {"max_iters": 12, "_size": args.chain_len},
                    False,
                ),
                "star": (
                    dup_clusters_star,
                    {"max_iters": 50, "_size": args.chain_len},
                    True,
                ),
            },
        )
    )
    log(summary=results)


if __name__ == "__main__":
    main()
