#!/usr/bin/env python
"""Measured scale evidence for the r11 operators: HLL and bloom at
10M values, two-pass quantiles at 10M rows, and the at-rest index
build/serve at a synthetic 50k-doc corpus. Prints one line per
measurement; numbers land in BENCH_NOTES.md."""

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
    print(f"{label}: {time.perf_counter() - t0:.2f}s {out if out is not None else ''}")
    return out


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_ingestion_spark.functions.sketches import (
        bloom_build,
        bloom_probe,
        hll_build,
        hll_estimate,
    )
    from data_ingestion_spark.operators.quantiles import exact_quantiles_two_pass

    big = spark.range(10_000_000).select(
        (F.col("id") % 3_000_000).cast("string").alias("v")
    )
    est = t("hll 10M rows / 3M distinct", lambda: hll_estimate(hll_build(big, "v")).collect()[0])
    err = abs(est.est - 3_000_000) / 3_000_000
    print(f"  est={est.est} err={err:.3%} (sigma ~2.3%)")

    seen = spark.range(1_000_000).select(F.col("id").cast("string").alias("v"))
    bf = t(
        "bloom build 1M keys",
        lambda: bloom_build(seen, "v", m_bits=1 << 24).persist(),
    )
    n_words = bf.count()
    cand = spark.range(2_000_000).select(F.col("id").cast("string").alias("v"))
    hits = t(
        "bloom probe 2M candidates",
        lambda: bloom_probe(cand, bf, "v", m_bits=1 << 24)
        .filter(F.col("maybe_seen")).count(),
    )
    fp = (hits - 1_000_000) / 1_000_000
    print(f"  words={n_words} maybe_seen={hits} fp_rate={fp:.4%}")

    vals = spark.range(10_000_000).select(
        ((F.col("id") * 2654435761) % 1_000_003).cast("double").alias("v")
    )
    qres = t(
        "two-pass quantiles 10M rows",
        lambda: {r.q: r.value for r in exact_quantiles_two_pass(vals, "v", [0.5, 0.99]).collect()},
    )
    print(f"  {qres}")

    from data_ingestion_spark.functions.similarity import (
        bm25_rank_batch_indexed,
        build_postings_index,
    )

    docs = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body with shared vocabulary token"),
            (F.col("id") % 997).cast("string"),
            F.lit(" and unique tail "),
            F.md5(F.col("id").cast("string")),
        ).alias("text"),
    )
    idx = tempfile.mkdtemp(prefix="stress_idx_")
    t("index build 50k docs", lambda: build_postings_index(docs, idx))
    qdf = spark.createDataFrame(
        [(i, f"token{i * 13 % 997} vocabulary") for i in range(20)],
        "query_id int, query_text string",
    )
    t(
        "indexed serve 20-query batch (cold)",
        lambda: bm25_rank_batch_indexed(spark, qdf, idx).count(),
    )
    t(
        "indexed serve 20-query batch (warm)",
        lambda: bm25_rank_batch_indexed(spark, qdf, idx).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
