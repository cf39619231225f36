"""Round-15 stress (r14 verdict #4): HyperBall harmonic centrality at
crawl scale — 1M nodes / 5M edges, p in {6, 7}, radius 4.

Measures the three things the SURVEY 2.16 posture claims:

1. wall time PER ROUND (the ``round_stats`` hook) — each round is one
   state-join + register-max shuffle, so per-round wall is the number
   that extrapolates to a 1000-executor cluster;
2. state rows vs the ``|V| * 2^p`` bound — in practice
   ``|V| * min(ball, 2^p)`` because only nonzero registers exist as
   rows; the ratio says how much headroom the p dial has left;
3. estimate error vs EXACT reverse-BFS ball sizes on a 20-node sample
   — the observed |reach_est / exact - 1| read against the HLL
   standard error 1.04 / sqrt(2^p) (13 % at p=6, 9.2 % at p=7).

Graph: deterministic pseudo-random 5-out (same multiplicative-hash
family as stress_r14_wave4, WITHOUT the hub skew — harmonic is a
reachability sketch, not a wedge count; register rows per node are
bounded by 2^p regardless of degree, so skew stresses nothing here
that uniform doesn't).

Usage: python scripts/stress_hyperball.py [--nodes 1000000 --mult 5]
Prints one JSON line per p.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from data_ingestion_spark.functions.graph import harmonic_centrality
from data_ingestion_spark.session import get_spark

RADIUS = 4
N_SAMPLE = 20


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--mult", type=int, default=5)
    ap.add_argument("--ps", type=int, nargs="*", default=[6, 7])
    args = ap.parse_args()
    spark = get_spark("stress-hyperball", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    n, m = args.nodes, args.mult
    edges = (
        spark.range(n * m)
        .select(
            (F.col("id") % n).alias("src"),
            (
                (
                    (F.col("id") % n) * 2654435761
                    + (F.col("id") - F.col("id") % n) / n * 40503
                    + 7
                )
                % n
            )
            .cast("bigint")
            .alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    from pyspark import StorageLevel

    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = edges.count()

    # ---- exact ground truth: reverse BFS in-balls for a sample ----
    # mode="in" balls = nodes that can REACH v, so walk edges
    # backwards: frontier (sid, node) joins dst -> adds src.
    step = max(1, n // N_SAMPLE)
    sample = list(range(0, n, step))[:N_SAMPLE]
    rev = edges.select(
        F.col("dst").alias("__at"), F.col("src").alias("__nxt")
    )
    ball = spark.createDataFrame(
        [(s, s) for s in sample], "sid bigint, node bigint"
    )
    frontier = ball
    t0 = time.time()
    for _ in range(RADIUS):
        grown = (
            frontier.join(rev, frontier["node"] == rev["__at"])
            .select("sid", F.col("__nxt").alias("node"))
            .distinct()
        )
        new = grown.join(ball, ["sid", "node"], "left_anti").localCheckpoint(
            eager=True
        )
        ball = ball.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    exact = {
        r.sid: r.sz
        for r in ball.groupBy("sid").agg(F.count(F.lit(1)).alias("sz")).collect()
    }
    bfs_wall = round(time.time() - t0, 1)

    for p in args.ps:
        stats: list = []
        t0 = time.time()
        out = harmonic_centrality(
            edges, radius=RADIUS, p=p, mode="in", round_stats=stats
        )
        got = {
            r.node: (r.reach_est, r.harmonic_micros)
            for r in out.where(F.col("node").isin(sample)).collect()
        }
        wall = round(time.time() - t0, 1)
        errs = [
            abs(got[s][0] / exact[s] - 1.0) for s in sample if s in got
        ]
        rec = {
            "case": "hyperball_1m",
            "p": p,
            "radius": RADIUS,
            "nodes": n,
            "edges": n_edges,
            "wall_sec": wall,
            "rounds": [
                {"r": r, "sec": round(w, 1), "state_rows": rows}
                for r, w, rows in stats
            ],
            "state_rows_final": stats[-1][2],
            "state_bound_v_2p": n * (1 << p),
            "state_fill": round(stats[-1][2] / (n * (1 << p)), 3),
            "sample_mean_abs_rel_err": round(sum(errs) / len(errs), 4),
            "sample_max_abs_rel_err": round(max(errs), 4),
            "hll_stderr_expected": round(1.04 / (1 << p) ** 0.5, 4),
            "bfs_truth_wall_sec": bfs_wall,
        }
        print(json.dumps(rec), flush=True)

    edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
