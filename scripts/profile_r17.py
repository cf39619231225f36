#!/usr/bin/env python
"""Phase-level wall-clock breakdown of the expensive bench queries
(r17 optimization round, guide §1: measure first).

Runs each lifecycle query's phases separately with job descriptions so
the cost attribution is direct measurement, not guesswork. Usage:

    python scripts/profile_r17.py [ivfpq|bm25|novelty|annstore|all]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label:<42s} {dt:7.3f} s", flush=True)
    return out


def profile_ivfpq(spark):
    import numpy as np

    from pyspark.sql import functions as F

    from data_ingestion_spark.functions import pq as PQ
    from data_ingestion_spark.sources.catalog import load_table

    print("== ann_ivfpq_search build phases ==")
    e = load_table(spark, SF_DIR, "embeddings")
    corpus = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    root = tempfile.mkdtemp(prefix="prof_ivfpq_")
    shutil.rmtree(root, ignore_errors=True)

    # phase 1: the bounded training sample collect
    sample = _t(
        "train: sample collect (TakeOrdered)",
        lambda: (
            corpus.select(
                F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
            )
            .orderBy(F.md5(F.col("id").cast("string")).asc(), F.col("id").asc())
            .limit(PQ.DEFAULT_MAX_FIT_ROWS)
            .collect()
        ),
    )
    X = np.array([r.vec for r in sample], dtype=np.float64)
    Xn = PQ._normalize(X)
    n_cells, m, iters = 8, 8, 12
    k_pq = min(PQ.DEFAULT_PQ_K, len(X))
    C = _t("train: coarse lloyd (k=8)", lambda: PQ._lloyd(Xn, n_cells, iters))
    xsq = (Xn * Xn).sum(axis=1)
    assign = _t(
        "train: assignment",
        lambda: (
            xsq[:, None] - 2.0 * (Xn @ C.T) + (C * C).sum(axis=1)[None, :]
        ).argmin(axis=1),
    )
    R = Xn - C[assign]
    ds = X.shape[1] // m
    CB = _t(
        f"train: codebook lloyds (m={m}, k_pq={k_pq})",
        lambda: np.stack(
            [
                PQ._lloyd(R[:, s * ds : (s + 1) * ds], k_pq, iters)
                for s in range(m)
            ]
        ),
    )
    _t(
        "write quantizer generation",
        lambda: PQ._write_quantizer_gen(spark, root, C, CB),
    )
    src = corpus.select(
        F.col("vec_id").cast("bigint").alias("id"),
        F.col("embedding").alias("vec"),
    )
    enc = src.mapInPandas(
        PQ._make_encoder(C.tolist(), CB.tolist(), ds), PQ._CODES_SCHEMA
    )
    _t(
        "encode + write codes (partitionBy cell)",
        lambda: enc.write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(os.path.join(root, "codes", "seg=0")),
    )
    _t(
        "write raw (partitionBy 64 id buckets)",
        lambda: src.select("id", "vec")
        .withColumn(
            "__rb",
            F.pmod(F.col("id"), F.lit(PQ.DEFAULT_RAW_ID_BUCKETS)).cast("int"),
        )
        .write.mode("overwrite")
        .partitionBy("__rb")
        .parquet(os.path.join(root, "raw", "seg=0")),
    )
    _t(
        "write ids sidecar",
        lambda: src.select("id")
        .write.mode("overwrite")
        .parquet(os.path.join(root, "ids", "seg=0")),
    )
    _t(
        "ids count job",
        lambda: spark.read.parquet(os.path.join(root, "ids", "seg=0")).count(),
    )
    shutil.rmtree(root, ignore_errors=True)

    # end-to-end for comparison
    root2 = tempfile.mkdtemp(prefix="prof_ivfpq_e2e_")
    shutil.rmtree(root2, ignore_errors=True)
    store = _t(
        "END-TO-END write_ivfpq_store(n_cells=8, m=8)",
        lambda: PQ.write_ivfpq_store(corpus, root2, n_cells=8, m=8),
    )
    qhead = e.filter(F.col("vec_id") == 0).select("embedding").head()
    qv = [float(x) for x in qhead[0]]
    df = store.probe(qv, k=5, n_probe=8, keep=128)
    _t(
        "serve: probe noop",
        lambda: df.write.format("noop").mode("overwrite").save(),
    )
    shutil.rmtree(root2, ignore_errors=True)


def profile_bm25(spark):
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions import similarity as SIM
    from data_ingestion_spark.sources.catalog import load_table, spread

    print("== rank_bm25_index_compacted phases ==")
    d = spread(load_table(spark, SF_DIR, "documents")).select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="prof_bm25_")
    shutil.rmtree(root, ignore_errors=True)
    _t(
        "build_postings_index_versioned (80%)",
        lambda: SIM.build_postings_index_versioned(
            d.filter(F.col("doc_id") % 5 != 0), root
        ),
    )
    _t(
        "upsert_postings_index_versioned (20%)",
        lambda: SIM.upsert_postings_index_versioned(
            d.filter(F.col("doc_id") % 5 == 0), root
        ),
    )
    _t("compact_index", lambda: SIM.compact_index(spark, root, retain=1))
    from data_ingestion_spark.queries_vector import _BM25_BATCH_QUERIES

    qdf = spark.createDataFrame(
        _BM25_BATCH_QUERIES, "query_id int, query_text string"
    )
    df = SIM.bm25_rank_batch_indexed(
        spark, qdf, SIM.index_current_path(root), topk=10
    )
    _t(
        "serve: bm25_rank_batch_indexed noop",
        lambda: df.write.format("noop").mode("overwrite").save(),
    )
    shutil.rmtree(root, ignore_errors=True)


def profile_novelty(spark):
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions import dedup as DD
    from data_ingestion_spark.sources.catalog import load_table, spread

    print("== dedup_novelty_indexed phases ==")
    d = spread(load_table(spark, SF_DIR, "documents")).select("doc_id", "text")
    new = (
        d.filter(F.col("doc_id") % 7 == 1)
        .select((F.col("doc_id") + 20000).alias("doc_id"), "text")
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 2).select(
                (F.col("doc_id") + 30000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq")).alias("text"),
            )
        )
        .unionByName(d.filter(F.col("doc_id") % 3 == 0))
    )
    root = tempfile.mkdtemp(prefix="prof_band_")
    shutil.rmtree(root, ignore_errors=True)
    _t(
        "write_band_store (gen 1)",
        lambda: DD.write_band_store(d.filter(F.col("doc_id") % 3 == 1), root),
    )
    _t(
        "upsert_band_store (gen 2)",
        lambda: DD.upsert_band_store(d.filter(F.col("doc_id") % 3 == 2), root),
    )
    df = DD.novelty_gate_indexed(new, root).select("doc_id")
    _t(
        "serve: novelty_gate_indexed noop",
        lambda: df.write.format("noop").mode("overwrite").save(),
    )
    shutil.rmtree(root, ignore_errors=True)


def profile_annstore(spark):
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions import similarity as SIM
    from data_ingestion_spark.sources.catalog import load_table

    print("== ann_probe_batch phases ==")
    e = load_table(spark, SF_DIR, "embeddings")
    queries = e.filter(F.col("vec_id") <= 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    path = tempfile.mkdtemp(prefix="prof_annstore_")
    shutil.rmtree(path, ignore_errors=True)
    store = SIM.AnnStore(spark, path, bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    _t(
        "AnnStore.write",
        lambda: store.write(
            e.filter(F.col("vec_id") > 2).select("vec_id", "embedding")
        ),
    )
    df = store.probe_batch(queries, k=5)
    _t(
        "serve: probe_batch noop",
        lambda: df.write.format("noop").mode("overwrite").save(),
    )
    shutil.rmtree(path, ignore_errors=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from data_ingestion_spark.session import get_spark

    spark = get_spark("profile-r17")
    # warm: JVM, parquet footers, python workers
    from data_ingestion_spark.sources.catalog import load_table

    load_table(spark, SF_DIR, "documents").count()
    load_table(spark, SF_DIR, "embeddings").count()
    profs = {
        "ivfpq": profile_ivfpq,
        "bm25": profile_bm25,
        "novelty": profile_novelty,
        "annstore": profile_annstore,
    }
    t_all0 = time.perf_counter()
    for name, fn in profs.items():
        if which in ("all", name):
            for rep in range(2):  # second rep = warm numbers
                print(f"-- pass {rep} --")
                fn(spark)
    print(f"total {time.perf_counter() - t_all0:.1f} s")
    spark.stop()


if __name__ == "__main__":
    main()
