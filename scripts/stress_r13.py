#!/usr/bin/env python
"""r13 scale evidence: the LSM delta-segment upsert vs the r12
full-rewrite numbers (BENCH_NOTES r12: ann 1% delta upsert 15.5 s ~=
the 11.4 s full write; five 2k-doc index upserts ~7.4 s EACH). Same
workloads, new write path — the deltas should cost the delta.
Prints one line per measurement; numbers land in BENCH_NOTES.md."""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label}: {time.perf_counter() - t0:.2f}s {out if out is not None else ''}")
    return out


def du(path: str) -> float:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    ) / 1e6


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
        bm25_rank_batch_indexed,
        build_postings_index_versioned,
        compact_ann_store,
        compact_index,
        index_current_path,
        upsert_ann_store_versioned,
        upsert_postings_index_versioned,
        write_ann_store_versioned,
    )

    root = tempfile.mkdtemp(prefix="stress13_")

    # --- ANN: 1M x 64d, versioned base + 1% delta segment ---
    dim = 64
    vecs = spark.range(1_000_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(2000)) - 1000)
            / 1000.0,
        ).cast("array<float>").alias("embedding"),
    )
    aroot = os.path.join(root, "ann")
    t("ann versioned base write 1M x 64d (6 tables)", lambda: write_ann_store_versioned(
        vecs, aroot, bits=3, n_tables=6) and None)
    delta = vecs.filter(F.col("vec_id") % 100 == 0).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    st = t("ann LSM upsert 1% delta (10k vecs)", lambda: upsert_ann_store_versioned(delta, aroot))
    print(f"  (r12 full-rewrite upsert of the same delta: 15.5 s; store {du(aroot):.0f} MB)")
    qv = [float(x) for x in vecs.limit(1).collect()[0].embedding]
    got = t("probe across 2 segments", lambda: st.probe(qv, 5).collect())
    mono = AnnStore(spark, os.path.join(root, "annmono"), bits=3, n_tables=6)
    truth = vecs.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 100 == 0, F.transform("embedding", lambda x: -x))
        .otherwise(F.col("embedding")),
    )
    mono.write(truth)
    ref = mono.probe(qv, 5).collect()
    same = [(r.vec_id, round(r.score, 6)) for r in got] == [
        (r.vec_id, round(r.score, 6)) for r in ref
    ]
    print(f"  segmented probe == rebuild probe: {same}")
    t("compact_ann_store (fold 2 segments, retain=1)", lambda: compact_ann_store(
        spark, aroot, retain=1) and None)

    # --- postings index: 40k docs + five 2k-doc delta segments ---
    docs = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared vocabulary body token alpha beta gamma delta doc "),
            F.col("id").cast("string"),
            F.lit(" tail "),
            (F.col("id") % 997).cast("string"),
        ).alias("text"),
    )
    iroot = os.path.join(root, "idx")
    t("index build v0 (40k docs)", lambda: build_postings_index_versioned(
        docs.filter(F.col("doc_id") % 5 != 0), iroot))
    t("5 sequential LSM upserts (2k docs each)", lambda: [
        upsert_postings_index_versioned(
            docs.filter((F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 25 == 5 * k)),
            iroot,
        )
        for k in range(5)
    ] and None)
    print("  (r12 full-rewrite upserts of the same deltas: ~7.4 s each, 36.9 s total)")
    qdf = spark.createDataFrame(
        [(1, "alpha beta 997"), (2, "doc tail")], "query_id int, query_text string"
    )
    t("bm25 batch across 6 segments", lambda: bm25_rank_batch_indexed(
        spark, qdf, index_current_path(iroot)).count())
    n_before = len([n for n in os.listdir(iroot) if n.startswith("v_")])
    mb_before = du(iroot)
    t("compact_index (fold 6 segments, retain=1)", lambda: compact_index(
        spark, iroot, retain=1))
    print(
        f"  versions {n_before} -> "
        f"{len([n for n in os.listdir(iroot) if n.startswith('v_')])}; "
        f"bytes {mb_before:.0f} MB -> {du(iroot):.0f} MB"
    )
    t("bm25 batch after fold", lambda: bm25_rank_batch_indexed(
        spark, qdf, index_current_path(iroot)).count())

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
