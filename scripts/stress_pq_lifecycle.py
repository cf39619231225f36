"""Round-15 stress: the VERSIONED IVF-PQ lifecycle at 1M vectors —
the reader-safety + maintenance-cost numbers for the r15 in-place
fold (pq.py on the versioned-CURRENT substrate).

Measures, on a 1M x 64d store (n_cells=1024, m=8):

1. base build (train + encode + commit v0);
2. O(delta) upsert of a 1% delta (new segment + commit) — must cost
   the delta, not the store;
3. tombstone delete of 10k ids (commit);
4. IN-PLACE compaction: re-train + fold survivors + commit + vacuum —
   while a READER HANDLE PINNED TO THE PRE-FOLD VERSION keeps serving
   (correctness asserted: its probe results are byte-identical before
   and after the fold);
5. probe latency on the pre-fold handle vs the post-fold handle
   (the fold resets shadow-join depth to zero).

Usage: python scripts/stress_pq_lifecycle.py [--n-vectors 1000000]
Prints one JSON line per stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from data_ingestion_spark.session import get_spark
from stress_pq import synth_vectors, _dir_bytes  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-vectors", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--n-cells", type=int, default=1024)
    ap.add_argument("--m", type=int, default=8)
    args = ap.parse_args()
    spark = get_spark("stress-pq-lifecycle", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    from data_ingestion_spark.functions.pq import (
        IvfPqStore,
        compact_ivfpq_store,
        delete_ivfpq_ids,
        upsert_ivfpq_store,
        write_ivfpq_store,
    )

    n = args.n_vectors
    vecs = synth_vectors(spark, n, args.dim).localCheckpoint()
    vecs.count()
    root = tempfile.mkdtemp(prefix="stress_pq_life_") + "/root"

    t0 = time.perf_counter()
    write_ivfpq_store(
        vecs, root, n_cells=args.n_cells, m=args.m, max_fit_rows=50_000
    )
    print(json.dumps({"stage": "build_v0", "sec": round(time.perf_counter() - t0, 2),
                      "rows": n}), flush=True)

    delta = vecs.filter(F.col("vec_id") % 100 == 0)  # 1% re-embed
    t0 = time.perf_counter()
    upsert_ivfpq_store(
        delta.select("vec_id", F.transform("embedding", lambda x: -x).alias("embedding")),
        root,
    )
    print(json.dumps({"stage": "upsert_1pct", "sec": round(time.perf_counter() - t0, 2),
                      "delta_rows": n // 100}), flush=True)

    dels = spark.range(10_000).select((F.col("id") * 7 + 3).alias("vec_id"))
    t0 = time.perf_counter()
    delete_ivfpq_ids(spark, root, dels)
    print(json.dumps({"stage": "tombstone_10k", "sec": round(time.perf_counter() - t0, 2)}),
          flush=True)

    # pin a reader to the pre-fold version
    pre = IvfPqStore(spark, root)
    qv = [float(x) for x in vecs.filter(F.col("vec_id") == 12345).head().embedding]
    before = [(r.vec_id, r.score) for r in pre.probe(qv, k=5, n_probe=32, keep=256).collect()]

    t0 = time.perf_counter()
    post = compact_ivfpq_store(spark, root, retain=2)
    fold_sec = round(time.perf_counter() - t0, 2)
    # the pinned reader must be untouched by the fold
    t0 = time.perf_counter()
    after = [(r.vec_id, r.score) for r in pre.probe(qv, k=5, n_probe=32, keep=256).collect()]
    pre_probe_sec = round(time.perf_counter() - t0, 3)
    assert after == before, "pre-fold reader drifted during in-place compaction"
    t0 = time.perf_counter()
    post.probe(qv, k=5, n_probe=32, keep=256).collect()
    post_probe_sec = round(time.perf_counter() - t0, 3)
    print(json.dumps({
        "stage": "inplace_compaction",
        "sec": fold_sec,
        "pre_fold_reader_identical": True,
        "pre_fold_probe_sec": pre_probe_sec,
        "post_fold_probe_sec": post_probe_sec,
        "post_segments": post.meta["segments"],
        "quantizer_gen": post.meta["quantizer"],
        "store_mb": round(_dir_bytes(root) / 1e6, 1),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
