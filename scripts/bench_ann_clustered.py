#!/usr/bin/env python
"""Clustered-embedding ANN sweep — the second recall regime.

Every recall dial in bench.py is measured on the driver-generated
embeddings table, whose vectors are near-uniform on the sphere —
the regime where sign-LSH is weak BY CONSTRUCTION (BENCH_NOTES notes
this honestly). Real text-embedding corpora (nomic-embed outputs,
reference ingestion-pipeline.py:334-339) are clustered: documents
about one topic share a cone of the sphere. This script generates a
deterministic mixture-of-Gaussians corpus with the exact
embeddings.parquet schema (vec_id bigint, embedding array<float>,
label int = mixture component) and reports the SAME dials — LSH
bits×tables with candidate fractions, k-means IVF multi-probe, and
the at-rest AnnStore point — so BENCH_NOTES can show both regimes
side by side and justify the default dial on the regime that
matters.

Geometry: component centers ~ N(0, I_64) (pairwise near-orthogonal in
64-dim), points = center + sigma*N(0, I) with sigma=0.65, giving
within-cluster cosine ~= 1/(1+sigma^2) ~= 0.70 and cross-cluster
cosine ~= 0 — the shape of a real topic-clustered embedding corpus.
All randomness is seeded; output is bit-stable across runs.

Usage: python scripts/bench_ann_clustered.py [--n 2000] [--clusters 16]
       [--auto-only]   (prints one JSON line)

``--n`` scales the corpus; pass ``--clusters`` ALONGSIDE it to keep
the mixture geometry comparable (components do NOT auto-scale — the
BENCH_NOTES 100k rows used ``--n 100000 --clusters 64``);
``--auto-only`` skips the LSH/store sweeps and reports just the
k-means rows (the full sweep is quadratic-ish in probe count and
meant for the 2k default).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_ap = argparse.ArgumentParser()
_ap.add_argument("--n", type=int, default=2000)
_ap.add_argument("--clusters", type=int, default=16)
_ap.add_argument("--auto-only", action="store_true")
_ap.add_argument(
    "--flips-sweep",
    action="store_true",
    help="run ONLY the flips x clustered x at-rest AnnStore cell "
    "(b4t4 and b5t6 stores, extra_flips 0/1/2, measured "
    "partitions-read) — the production configuration SCALE.md "
    "recommends, missing from the r07 two-regime table",
)
_ARGS = _ap.parse_args()

N_VECTORS = _ARGS.n
DIM = 64
N_CLUSTERS = _ARGS.clusters
SIGMA = 0.65
SEED = 7
N_QUERIES = 20
K = 5


def make_clustered(n: int, dim: int, n_clusters: int, sigma: float, seed: int):
    """Deterministic mixture-of-Gaussians rows: (vec_id, unit-norm
    embedding, component label)."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, n_clusters, size=n)
    pts = centers[labels] + sigma * rng.randn(n, dim) / np.sqrt(dim)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return [
        (int(i), [float(x) for x in pts[i]], int(labels[i])) for i in range(n)
    ]


def flips_sweep() -> None:
    """flips x clustered x at-rest: recall + MEASURED partitions-read
    for b4t4 and b5t6 ``AnnStore``s over the clustered fixture, at
    extra_flips 0/1/2. Partitions-read is counted from the candidate
    scan's inputFiles (distinct table=/bucket= dirs), not computed
    from the nominal t*(1+f) — so the number proves pruning survives
    the flip disjunction on disk."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.similarity import AnnStore, brute_force_topk
    from data_ingestion_spark.session import get_spark

    spark = get_spark("ann-clustered-flips")
    emb = spark.createDataFrame(
        make_clustered(N_VECTORS, DIM, N_CLUSTERS, SIGMA, SEED),
        "vec_id bigint, embedding array<float>, label int",
    ).cache()
    n_emb = emb.count()
    qrows = emb.filter(F.col("vec_id") < N_QUERIES).collect()[:10]
    exact_by_qid = {}
    for qr in qrows:
        qv = F.array(*[F.lit(float(x)) for x in qr.embedding])
        exact_by_qid[qr.vec_id] = {
            r.vec_id for r in brute_force_topk(emb, qv, k=K).collect()
        }

    out: dict[str, object] = {"n_vectors": n_emb, "n_clusters": N_CLUSTERS}
    for bits, n_t in ((4, 4), (5, 6)):
        ann_dir = tempfile.mkdtemp(prefix=f"flips_b{bits}t{n_t}_")
        try:
            store = AnnStore(spark, ann_dir, bits=bits, n_tables=n_t)
            store.write(emb)
            for flips in (0, 1, 2):
                h = parts = 0
                walls = []
                for qr in qrows:
                    qv = [float(x) for x in qr.embedding]
                    t0 = time.monotonic()
                    got = {
                        r.vec_id
                        for r in store.probe(qv, k=K, extra_flips=flips).collect()
                    }
                    walls.append(time.monotonic() - t0)
                    h += len(exact_by_qid[qr.vec_id] & got)
                    # inputFiles() lists PRE-pruning (see
                    # tests/test_plans.py) — count the files the scan
                    # actually reads via input_file_name() and fold to
                    # distinct table=t/bucket=b partition dirs
                    read_files = [
                        r.f
                        for r in store.probe_candidates(qv, extra_flips=flips)
                        .select(F.input_file_name().alias("f"))
                        .distinct()
                        .collect()
                    ]
                    parts += len(
                        {"/".join(p.split("/")[-3:-1]) for p in read_files}
                    )
                key = f"b{bits}t{n_t}_f{flips}"
                out[f"{key}_recall_at_5"] = round(h / (K * len(qrows)), 3)
                out[f"{key}_partitions_read"] = round(parts / len(qrows), 1)
                out[f"{key}_of_partitions"] = n_t * (1 << bits)
                out[f"{key}_probe_median_sec"] = round(
                    sorted(walls)[len(walls) // 2], 3
                )
        finally:
            shutil.rmtree(ann_dir, ignore_errors=True)
    emb.unpersist()
    print(json.dumps({"metric": "ann_clustered_flips_at_rest", **out}))
    spark.stop()


def main() -> None:
    if _ARGS.flips_sweep:
        flips_sweep()
        return
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.similarity import (
        AnnStore,
        brute_force_topk,
        ivf_search,
        kmeans_ivf_build,
        kmeans_ivf_search,
        lsh_topk,
        multi_table_sign_condition,
    )
    from data_ingestion_spark.session import get_spark

    spark = get_spark("ann-clustered-bench")
    emb = spark.createDataFrame(
        make_clustered(N_VECTORS, DIM, N_CLUSTERS, SIGMA, SEED),
        "vec_id bigint, embedding array<float>, label int",
    ).cache()
    n_emb = emb.count()

    out: dict[str, float] = {"n_vectors": n_emb, "n_clusters": N_CLUSTERS}
    qrows = emb.filter(F.col("vec_id") < N_QUERIES).collect()

    # exact ground truth once per query, shared by every dial
    exact_by_qid = {}
    hits = {"lsh_default": 0, "lsh8": 0, "ivf_label": 0}
    for qr in qrows:
        qv = F.array(*[F.lit(float(x)) for x in qr.embedding])
        exact = {r.vec_id for r in brute_force_topk(emb, qv, k=K).collect()}
        exact_by_qid[qr.vec_id] = exact
        if _ARGS.auto_only:
            continue
        dflt = {r.vec_id for r in lsh_topk(emb, qv, k=K).collect()}
        lsh8 = {r.vec_id for r in lsh_topk(emb, qv, k=K, n_tables=8).collect()}
        ivf = {
            r.vec_id
            for r in ivf_search(
                emb, qv, F.lit(qr.label), cell_col="label", k=K
            ).collect()
        }
        hits["lsh_default"] += len(exact & dflt)
        hits["lsh8"] += len(exact & lsh8)
        hits["ivf_label"] += len(exact & ivf)
    denom = K * len(qrows)
    if not _ARGS.auto_only:
        out["ann_lsh_default_recall_at_5"] = round(hits["lsh_default"] / denom, 3)
        out["ann_lsh8_recall_at_5"] = round(hits["lsh8"] / denom, 3)
        out["ann_ivf_label_recall_at_5"] = round(hits["ivf_label"] / denom, 3)

    # bits x tables sweep with candidate fraction (the scan cost)
    sweep_q = qrows[:10]
    for bits, n_t in [] if _ARGS.auto_only else [(4, 4), (4, 6), (4, 8), (5, 4), (5, 6)]:
        h = cand = 0
        for qr in sweep_q:
            qv = F.array(*[F.lit(float(x)) for x in qr.embedding])
            got = {
                r.vec_id
                for r in lsh_topk(emb, qv, k=K, bits=bits, n_tables=n_t).collect()
            }
            h += len(exact_by_qid[qr.vec_id] & got)
            cand += emb.filter(
                multi_table_sign_condition(F.col("embedding"), qv, bits, n_t)
            ).count()
        out[f"ann_lsh_b{bits}t{n_t}_recall_at_5"] = round(h / (K * len(sweep_q)), 3)
        out[f"ann_lsh_b{bits}t{n_t}_cand_frac"] = round(
            cand / (n_emb * len(sweep_q)), 3
        )

    # k-means IVF multi-probe (the honest scale path)
    if not _ARGS.auto_only:
        model, assigned = kmeans_ivf_build(emb, n_cells=16)
        assigned = assigned.cache()
        for n_probe in (4, 6):
            h = 0
            for qr in qrows:
                got = {
                    r.vec_id
                    for r in kmeans_ivf_search(
                        assigned, model, list(qr.embedding), k=K, n_probe=n_probe
                    ).collect()
                }
                h += len(exact_by_qid[qr.vec_id] & got)
            out[f"ann_kmeans_ivf{n_probe}_recall_at_5"] = round(h / denom, 3)
        assigned.unpersist()

    # sqrt-n auto-sized cells with sample fit — the shape this takes
    # at 100 TB (n_cells="auto" -> ~sqrt(n) cells; k-means fitted on a
    # capped uniform sample, full corpus assigned by the narrow
    # transform). Probe cost is MEASURED, not nominal: scanned_frac =
    # rows living in the probed cells / corpus, averaged over queries.
    # fit-sample sized to ~30 points per expected centroid (floor 1k):
    # enough for stable centroids, still sqrt-ish in the corpus
    fit_cap = max(1000, 30 * int(round(N_VECTORS ** 0.5)))
    model_a, assigned_a = kmeans_ivf_build(emb, n_cells="auto", max_fit_rows=fit_cap)
    assigned_a = assigned_a.cache()
    centers_a = model_a.clusterCenters()
    out["ann_kmeans_auto_n_cells"] = len(centers_a)
    out["ann_kmeans_auto_fit_cap"] = fit_cap
    cell_sizes = {
        r.ivf_cell: r.cnt
        for r in assigned_a.groupBy("ivf_cell").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for n_probe in (3, 6):
        h = scanned = 0
        for qr in qrows:
            q = np.array(list(qr.embedding), dtype=float)
            order = sorted(
                range(len(centers_a)),
                key=lambda i: float(np.linalg.norm(centers_a[i] - q)),
            )
            scanned += sum(cell_sizes.get(c, 0) for c in order[:n_probe])
            got = {
                r.vec_id
                for r in kmeans_ivf_search(
                    assigned_a, model_a, list(qr.embedding), k=K, n_probe=n_probe
                ).collect()
            }
            h += len(exact_by_qid[qr.vec_id] & got)
        out[f"ann_kmeans_auto_p{n_probe}_recall_at_5"] = round(h / denom, 3)
        out[f"ann_kmeans_auto_p{n_probe}_scanned_frac"] = round(
            scanned / (n_emb * len(qrows)), 3
        )
    assigned_a.unpersist()

    # AnnStore at-rest point at the widened bits
    if _ARGS.auto_only:
        emb.unpersist()
        print(json.dumps({"metric": "ann_clustered_regime", **out}))
        spark.stop()
        return
    ann_dir = tempfile.mkdtemp(prefix="bench_ann_clustered_")
    try:
        store = AnnStore(spark, ann_dir, bits=4, n_tables=4)
        store.write(emb)
        # one loop over the flip dial: f=0 home buckets (timed), f=1
        # multi-probe (1 lowest-margin flip/table, 8/64 partitions)
        walls = []
        for flips, key in ((0, "ann_store_b4t4"), (1, "ann_store_b4t4f1")):
            h = 0
            for qr in sweep_q:
                t0 = time.monotonic()
                got = {
                    r.vec_id
                    for r in store.probe(
                        [float(x) for x in qr.embedding], k=K, extra_flips=flips
                    ).collect()
                }
                if flips == 0:
                    walls.append(time.monotonic() - t0)
                h += len(exact_by_qid[qr.vec_id] & got)
            out[f"{key}_recall_at_5"] = round(h / (K * len(sweep_q)), 3)
        out["ann_store_b4t4_probe_sec"] = round(sorted(walls)[len(walls) // 2], 3)
    finally:
        shutil.rmtree(ann_dir, ignore_errors=True)

    emb.unpersist()
    print(json.dumps({"metric": "ann_clustered_regime", **out}))
    spark.stop()


if __name__ == "__main__":
    main()
