"""IVF-PQ stress at 1M vectors (SCALE.md evidence, r14 Y-series).

Measures the third ANN layout end to end against the same synthetic
1M x 64d corpus the LSH stress uses:

1. ``build``: driver-side Lloyd fit (bounded sample) + Arrow-batched
   full-corpus encode + partitioned writes;
2. bytes at rest: codes/ vs raw/ (the PQ compression claim, measured
   on disk, parquet encoding included);
3. ``probe``: ADC candidates from n_probe pruned cells + exact
   re-rank, timed over ``--n-queries`` queries at two n_probe dials,
   recall@5 vs brute force;
4. ``probe_batch``: all queries in ONE plan vs the per-query loop.

Usage: python scripts/stress_pq.py [--n-vectors 1000000]
       [--n-queries 16] [--dim 64] [--n-cells 1024] [--m 8]
Prints one JSON line per stage and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synth_vectors(spark, n: int, dim: int):
    """Deterministic executor-side vectors (the stress_ann generator)."""
    comps = [
        (
            F.conv(
                F.substring(F.md5(F.concat(F.col("vec_id"), F.lit(f"|c{j}"))), 1, 8),
                16,
                10,
            ).cast("double")
            / F.lit(float(2**32))
            * 2.0
            - 1.0
        ).cast("float")
        for j in range(dim)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-vectors", type=int, default=1_000_000)
    ap.add_argument("--n-queries", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--n-cells", type=int, default=1024)
    ap.add_argument("--m", type=int, default=8)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .appName("stress-pq")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_ingestion_spark.functions.pq import write_ivfpq_store
    from data_ingestion_spark.functions.similarity import brute_force_topk

    out: dict[str, object] = {
        "n_vectors": args.n_vectors,
        "dim": args.dim,
        "n_cells": args.n_cells,
        "m": args.m,
    }

    vecs = synth_vectors(spark, args.n_vectors, args.dim).localCheckpoint()
    vecs.count()

    root = tempfile.mkdtemp(prefix="stress_pq_")
    t0 = time.perf_counter()
    store = write_ivfpq_store(
        vecs, root, n_cells=args.n_cells, m=args.m, max_fit_rows=50_000
    )
    out["build_sec"] = round(time.perf_counter() - t0, 2)
    out["codes_mb"] = round(_dir_bytes(os.path.join(root, "codes")) / 1e6, 1)
    out["raw_mb"] = round(_dir_bytes(os.path.join(root, "raw")) / 1e6, 1)
    print(
        json.dumps(
            {
                "stage": "build",
                "sec": out["build_sec"],
                "codes_mb": out["codes_mb"],
                "raw_mb": out["raw_mb"],
                "compression_x": round(out["raw_mb"] / max(out["codes_mb"], 0.1), 1),
            }
        )
    )

    qrows = vecs.filter(F.col("vec_id") < args.n_queries).collect()
    exact_by_qid: dict[int, set] = {}
    for qr in qrows:
        qcol = F.array(*[F.lit(float(x)) for x in qr.embedding])
        exact_by_qid[qr.vec_id] = {
            r.vec_id for r in brute_force_topk(vecs, qcol, k=5).collect()
        }

    for n_probe in (8, 32):
        times, hits = [], 0
        for qr in qrows:
            qv = [float(x) for x in qr.embedding]
            t0 = time.perf_counter()
            top = store.probe(qv, k=5, n_probe=n_probe, keep=256).collect()
            times.append(time.perf_counter() - t0)
            hits += len(exact_by_qid[qr.vec_id] & {r.vec_id for r in top})
        out[f"probe_np{n_probe}_median_sec"] = round(statistics.median(times), 3)
        out[f"probe_np{n_probe}_recall5"] = round(hits / (5 * len(qrows)), 3)
        print(
            json.dumps(
                {
                    "stage": f"probe_np{n_probe}",
                    "median_sec": out[f"probe_np{n_probe}_median_sec"],
                    "recall_at_5": out[f"probe_np{n_probe}_recall5"],
                }
            )
        )

    queries = spark.createDataFrame(
        [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows],
        "query_id bigint, qvec array<double>",
    )
    t0 = time.perf_counter()
    batch = store.probe_batch(queries, k=5, n_probe=32, keep=256).collect()
    out["batch_sec"] = round(time.perf_counter() - t0, 2)
    loop_est = out["probe_np32_median_sec"] * len(qrows)
    out["batch_vs_loop_x"] = round(loop_est / max(out["batch_sec"], 0.001), 2)
    print(
        json.dumps(
            {
                "stage": "probe_batch",
                "n_queries": len(qrows),
                "sec": out["batch_sec"],
                "rows": len(batch),
                "loop_estimate_sec": round(loop_est, 2),
                "speedup_x": out["batch_vs_loop_x"],
            }
        )
    )
    print(json.dumps({"stage": "summary", **out}))


if __name__ == "__main__":
    main()
