#!/usr/bin/env python
"""r13 scale evidence #2: batch vector serving vs the per-query loop.

64 query vectors against the 1M x 64d / 6-table AnnStore — the shape
the reference's query utility handles by looping per query
(Q:167-176). probe_batch should amortize scan + job overhead into ONE
plan; the loop pays it 64 times. Also measures the segmented (LSM)
serve and the quantized batch path. Numbers land in BENCH_NOTES.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s")
    return out, dt


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_ingestion_spark.functions.similarity import (
        AnnStore,
        upsert_ann_store_versioned,
        write_ann_store_versioned,
    )

    dim, nq = 64, 64
    vecs = spark.range(1_000_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(2000)) - 1000)
            / 1000.0,
        ).cast("array<float>").alias("embedding"),
    )
    root = tempfile.mkdtemp(prefix="stress_pb_")
    mono = AnnStore(spark, os.path.join(root, "mono"), bits=3, n_tables=6)
    t("store write 1M x 64d (6 tables)", lambda: mono.write(vecs))

    qrows = vecs.filter(F.col("vec_id") % 15625 == 7).limit(nq).collect()
    qdf = spark.createDataFrame(
        [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows],
        "query_id bigint, qvec array<float>",
    )

    _, t_batch = t(f"probe_batch {nq} queries, ONE plan", lambda: mono.probe_batch(qdf, k=5).collect())
    def loop():
        out = []
        for r in qrows:
            out.extend(mono.probe([float(x) for x in r.embedding], k=5).collect())
        return out
    _, t_loop = t(f"per-query probe loop x{nq} (the reference shape)", loop)
    print(f"  batch speedup: {t_loop / t_batch:.1f}x")

    # segmented serve: versioned base + 1% delta, same batch
    vroot = os.path.join(root, "vers")
    write_ann_store_versioned(vecs, vroot, bits=3, n_tables=6)
    live = upsert_ann_store_versioned(
        vecs.filter(F.col("vec_id") % 100 == 0).withColumn(
            "embedding", F.transform("embedding", lambda x: -x).cast("array<float>")
        ),
        vroot,
    )
    t(f"probe_batch {nq} queries across 2 LSM segments", lambda: live.probe_batch(qdf, k=5).collect())

    # quantized batch path
    q = AnnStore(spark, os.path.join(root, "sq8"), bits=3, n_tables=6)
    t("write_quantized 1M x 64d", lambda: q.write_quantized(vecs))
    t(f"probe_batch_quantized {nq} queries", lambda: q.probe_batch_quantized(qdf, k=5).collect())

    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
