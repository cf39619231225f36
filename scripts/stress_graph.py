"""PageRank + count-min sketch stress at crawl-ish scale.

1. PageRank: a 1M-node / 5M-edge preferential-attachment-flavored
   graph (dst skewed toward low ids — hub structure like a real web
   graph), 5 integer iterations. Reports wall time, edges/s, and a
   determinism double-run check (bit-identical rank vectors).
2. Count-min: sketch 10M token occurrences (Zipf-ish over 100k
   vocab), verify the constant sketch size and that heavy-hitter
   estimates stay within the CMS bound of truth.

Usage: python scripts/stress_graph.py [--nodes 1000000] [--mult 5]
Prints one JSON line per case.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from data_ingestion_spark.functions.graph import pagerank_scores
from data_ingestion_spark.functions.sketches import cms_build, cms_estimate
from data_ingestion_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--mult", type=int, default=5)  # edges per node
    ap.add_argument("--tokens", type=int, default=10_000_000)
    args = ap.parse_args()
    spark = get_spark("stress-graph", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    n, m = args.nodes, args.mult
    # hub-skewed dst: square a uniform hash so low ids get more
    # in-links (web-graph-ish); deterministic, no RNG
    edges = (
        spark.range(n * m)
        .select(
            (F.col("id") % n).alias("src"),
            (
                (F.col("id") * 2654435761 % n) * (F.col("id") * 40503 % n) / n
            ).cast("bigint").alias("dst"),
        )
        .filter(F.col("dst") < n)
    )
    edges = edges.persist()
    n_edges = edges.count()
    t0 = time.perf_counter()
    r1 = pagerank_scores(edges, iters=5)
    top1 = r1.orderBy(F.col("rank_micros").desc(), "node").limit(10).collect()
    wall = time.perf_counter() - t0
    # determinism: a second independent run must be bit-identical
    t1 = time.perf_counter()
    top2 = (
        pagerank_scores(edges, iters=5)
        .orderBy(F.col("rank_micros").desc(), "node")
        .limit(10)
        .collect()
    )
    wall2 = time.perf_counter() - t1
    same = [(r.node, r.rank_micros) for r in top1] == [
        (r.node, r.rank_micros) for r in top2
    ]
    print(json.dumps({
        "case": "pagerank_1m",
        "nodes": n,
        "edges": n_edges,
        "iters": 5,
        "wall_sec": round(wall, 2),
        "edges_per_sec_per_iter": int(n_edges * 5 / wall),
        "second_run_sec": round(wall2, 2),
        "bit_identical_reruns": same,
        "top1": {"node": top1[0].node, "rank_micros": top1[0].rank_micros},
    }))
    assert same, "integer PageRank must be bit-identical across runs"

    # ---- count-min over a Zipf-ish token stream
    toks = spark.range(args.tokens).select(
        F.concat(
            F.lit("t"),
            (F.col("id") * 2654435761 % 100_000 * (F.col("id") % 97) / 97)
            .cast("bigint")
            .cast("string"),
        ).alias("v")
    )
    t0 = time.perf_counter()
    sketch = cms_build(toks, "v", width=4096, depth=4).persist()
    cells = sketch.count()
    wall = time.perf_counter() - t0
    truth = {
        r.v: r.c
        for r in toks.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc()).limit(5).collect()
    }
    probes = spark.createDataFrame([(k,) for k in truth], "item string")
    est = {
        r.item: r.estimate
        for r in cms_estimate(sketch, probes, width=4096, depth=4).collect()
    }
    overest = {k: est[k] - truth[k] for k in truth}
    assert all(v >= 0 for v in overest.values()), "CMS underestimated"
    print(json.dumps({
        "case": "cms_10m_tokens",
        "tokens": args.tokens,
        "sketch_cells": cells,
        "build_sec": round(wall, 2),
        "tokens_per_sec": int(args.tokens / wall),
        "top5_overestimate": overest,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
