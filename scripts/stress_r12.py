#!/usr/bin/env python
"""Measured scale evidence for the r12 operators: AnnStore upsert vs
rebuild at 1M vectors, SQ8 store bytes + probe parity, index
compaction over a version chain, and boolean index serving at a 50k
doc corpus. Prints one line per measurement; numbers land in
BENCH_NOTES.md."""

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
    """MB of parquet data under path."""
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
        bool_search_indexed,
        build_postings_index_versioned,
        compact_index,
        index_current_path,
        upsert_postings_index_versioned,
    )

    # --- 1M x 64-dim vectors: upsert a 1% delta vs full rebuild ---
    dim = 64
    vecs = spark.range(1_000_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(2000)) - 1000)
            / 1000.0,
        ).cast("array<float>").alias("embedding"),
    )
    root = tempfile.mkdtemp(prefix="stress12_")
    p0, p1 = os.path.join(root, "s0"), os.path.join(root, "s1")
    st = AnnStore(spark, p0, bits=3, n_tables=6)
    t("ann store write 1M x 64d (6 tables)", lambda: st.write(vecs))
    delta = vecs.filter(F.col("vec_id") % 100 == 0).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    t("ann upsert 1% delta (10k vecs)", lambda: st.upsert(delta, p1))
    print(f"  (vs full rebuild = the 1M write above; raw store {du(p0):.0f} MB)")
    qv = [float(x) for x in vecs.limit(1).collect()[0].embedding]
    t("probe upserted store", lambda: st.__class__.open(spark, p1).probe(qv, 5).collect())

    # --- SQ8: bytes at rest + probe parity ---
    pq = os.path.join(root, "sq8")
    sq = AnnStore(spark, pq, bits=3, n_tables=6)
    t("sq8 write_quantized 1M x 64d", lambda: sq.write_quantized(vecs))
    codes_mb, raw_mb = du(os.path.join(pq, "codes")), du(os.path.join(pq, "raw"))
    print(
        f"  codes {codes_mb:.0f} MB (6-table) + raw-once {raw_mb:.0f} MB"
        f" = {codes_mb + raw_mb:.0f} MB vs raw 6-table {du(p0):.0f} MB"
    )
    got_q = t("sq8 probe (exact re-score)", lambda: sq.probe_quantized(qv, 5).collect())
    got_r = AnnStore.open(spark, p0).probe(qv, 5).collect()
    same = [(r.vec_id, round(r.score, 6)) for r in got_q] == [
        (r.vec_id, round(r.score, 6)) for r in got_r
    ]
    print(f"  quantized == raw probe: {same}")

    # --- index maintenance chain: 5 upserts then compact ---
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
    t("5 sequential upserts (2k docs each)", lambda: [
        upsert_postings_index_versioned(
            docs.filter((F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 25 == 5 * k)),
            iroot,
        )
        for k in range(5)
    ] and None)
    n_before = len([n for n in os.listdir(iroot) if n.startswith("v_")])
    mb_before = du(iroot)
    t("compact_index (retain=1)", lambda: compact_index(spark, iroot, retain=1))
    n_after = len([n for n in os.listdir(iroot) if n.startswith("v_")])
    print(
        f"  versions {n_before} -> {n_after}; bytes {mb_before:.0f} MB"
        f" -> {du(iroot):.0f} MB"
    )

    # --- boolean serving from the compacted index ---
    qdf = spark.createDataFrame(
        [
            (1, ["alpha", "beta"], ["gamma"], ["997"]),
            (2, [], ["doc", "tail"], ["alpha"]),
        ],
        "query_id int, must array<string>, should array<string>, must_not array<string>",
    )
    t(
        "bool search (2 queries, 50k-doc index)",
        lambda: bool_search_indexed(
            spark, qdf, index_current_path(iroot), topk=10
        ).count(),
    )

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
