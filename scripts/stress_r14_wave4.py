"""Round-14 wave-4 stress: triangle counting + blocked fuzzy ER at
crawl-ish scale.

1. Triangles: a 1M-node / 5M-edge hub-skewed graph (same generator
   shape as stress_graph.py — dst skewed toward low ids, so the
   low-id hubs have huge degree: exactly the curse-of-the-last-
   reducer shape the degree-ordered orientation must survive).
   Reports wall time, edges/s, total triangles, and the max wedge
   owner's share (the skew the orientation bounds).
2. Blocked fuzzy ER: 1M synthetic names (3-token, ~20 chars) each
   matched against a 1M clean catalog with one planted deletion at
   position >= 3; reports wall time, pairs/s, recall of the planted
   match (should be 1.0 — the blocking is complete for these edits),
   and the candidate-pair count vs the n^2 it avoided.

Usage: python scripts/stress_r14_wave4.py [--nodes 1000000]
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

from data_ingestion_spark.functions.dedup import fuzzy_join_blocked
from data_ingestion_spark.functions.graph import triangle_count
from data_ingestion_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--mult", type=int, default=5)
    ap.add_argument("--names", type=int, default=1_000_000)
    args = ap.parse_args()
    spark = get_spark("stress-wave4", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    n, m = args.nodes, args.mult
    # ring chords (j=1,2) guarantee a triangle at every node — the
    # (i, i+1, i+2) closure — while the remaining edges are
    # hub-skewed toward low ids (squared-hash, web-graph-ish), so the
    # low-id hubs collect O(n)-scale degree: the exact
    # last-reducer shape the degree orientation must bound.
    edges = (
        spark.range(n * m)
        .select(
            (F.col("id") % n).alias("src"),
            (F.col("id") - F.col("id") % n).alias("jn"),
        )
        .select(
            "src",
            F.when(
                (F.col("jn") / n >= 1) & (F.col("jn") / n <= 2),
                (F.col("src") + F.col("jn") / n) % n,
            )
            .otherwise(
                (F.col("src") * 2654435761 % n)
                * ((F.col("src") + F.col("jn") / n) * 40503 % n)
                / n
            )
            .cast("bigint")
            .alias("dst"),
        )
    )
    handles: list = []
    t0 = time.time()
    tri = triangle_count(edges, cache_handles=handles)
    total = tri.agg(
        F.coalesce(F.sum("n_tri"), F.lit(0)).alias("s"),
        F.coalesce(F.max("n_tri"), F.lit(0)).alias("mx"),
        F.count(F.lit(1)).alias("nodes"),
    ).collect()[0]
    dt = time.time() - t0
    print(json.dumps({
        "case": "triangle_1m_nodes_5m_edges",
        "sec": round(dt, 2),
        "edges_per_sec": int(n * m / dt),
        "triangles": int(total.s) // 3,
        "nodes_in_triangles": int(total.nodes),
        "max_node_share": round(float(total.mx) / float(total.s), 4) if total.s else 0.0,
    }))
    for h in handles:
        h.unpersist()

    # --- blocked fuzzy ER at 1M x 1M -------------------------------
    # Hex account-code first token: realistic ER name entropy (block
    # prefixes spread over ~256 cells instead of 10 hot ones — the
    # block_prefix_len dial's documented lever; deletions at pos >= 3
    # never touch the 2-char prefix, so blocking stays complete).
    words = "alpha bravo carbon delta ember falcon garnet harbor iris juniper".split()
    nn = args.names
    clean = spark.range(nn).select(
        F.col("id").alias("rid"),
        F.concat_ws(
            " ",
            F.lpad(F.conv((F.col("id") * 2654435761 % nn).cast("string"), 10, 16), 5, "0"),
            F.element_at(F.array(*[F.lit(w) for w in words]), (F.col("id") % 10 + 1).cast("int")),
            F.element_at(F.array(*[F.lit(w) for w in words]), (F.expr("id div 10") % 10 + 1).cast("int")),
            F.conv(F.col("id").cast("string"), 10, 16),
        ).alias("rname"),
    )
    # Deletions planted at position >= 6, so block_prefix_len=5 is
    # complete for them — the documented dial: size the block prefix
    # to the workload's minimum edit position. The hex first token
    # makes the 5-char prefix high-entropy, so blocks stay tiny.
    corrupt = clean.select(
        F.col("rid").alias("lid"),
        F.expr(
            "concat(substr(rname, 1, cast(5 + rid % (length(rname) - 5) as int)), "
            "substr(rname, cast(7 + rid % (length(rname) - 5) as int)))"
        ).alias("lname"),
    )
    t0 = time.time()
    matched = fuzzy_join_blocked(
        corrupt, clean, "lname", "rname", max_dist=1, block_prefix_len=5
    )
    stats = matched.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum(F.when(F.col("lid") == F.col("rid"), 1).otherwise(0)).alias("planted"),
    ).collect()[0]
    dt = time.time() - t0
    print(json.dumps({
        "case": "fuzzy_er_1m_x_1m",
        "sec": round(dt, 2),
        "candidate_pairs_verified": int(stats.pairs),
        "planted_recall": round(float(stats.planted) / nn, 6),
        "naive_pairs_avoided": nn * nn,
        "left_rows_per_sec": int(nn / dt),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
