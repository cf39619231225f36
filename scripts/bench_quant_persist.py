#!/usr/bin/env python
"""r14 measurement (r13 verdict #4): the third option for the
batch-quantized candidate subtree.

The subtree feeds three consumers (bucket collect inside _raw_fetch,
the rescore join, the (query,id) pairs side). r13 measured:
lazy recompute 27.2 s vs eager localCheckpoint 50.0 s (serial block
write > pipelined recompute). This measures the unmeasured middle:
persist(MEMORY_AND_DISK) — lazy block write pipelined into the FIRST
consumer, reused by the rest. Result lands in BENCH_NOTES.md; keep
whichever wins.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import SparkSession, functions as F


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s", flush=True)
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

    from data_ingestion_spark.functions.similarity import AnnStore

    dim, nq = 64, 64
    vecs = spark.range(1_000_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(2000)) - 1000)
            / 1000.0,
        ).cast("array<float>").alias("embedding"),
    )
    root = tempfile.mkdtemp(prefix="bench_qp_")
    q = AnnStore(spark, os.path.join(root, "sq8"), bits=3, n_tables=6)
    t("write_quantized 1M x 64d", lambda: q.write_quantized(vecs))

    qrows = vecs.filter(F.col("vec_id") % 15625 == 7).limit(nq).collect()
    qdf = spark.createDataFrame(
        [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows],
        "query_id bigint, qvec array<float>",
    )

    results = {}
    orig = AnnStore._quant_batch_fetch
    handles: list = []

    def persisting(self, cand, *a, **kw):
        cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
        handles.append(cand)
        return orig(self, cand, *a, **kw)

    # alternate the two modes to cancel warm-cache drift
    for rep in range(2):
        AnnStore._quant_batch_fetch = orig
        _, dt = t(
            f"lazy recompute (current) rep{rep}",
            lambda: q.probe_batch_quantized(qdf, k=5).collect(),
        )
        results.setdefault("lazy", []).append(dt)
        AnnStore._quant_batch_fetch = persisting
        _, dt = t(
            f"persist(MEMORY_AND_DISK) rep{rep}",
            lambda: q.probe_batch_quantized(qdf, k=5).collect(),
        )
        results.setdefault("persist", []).append(dt)
        for h in handles:
            h.unpersist(blocking=True)
        handles.clear()
    AnnStore._quant_batch_fetch = orig
    print({k: [round(x, 2) for x in v] for k, v in results.items()})


if __name__ == "__main__":
    main()
