"""The flagship ingestion plan: the reference's whole pipeline as ONE
lazy DataFrame program.

Reference lifecycle (SURVEY.md §3.1): KFP stages
load_documents → format_documents (fetch → clean → md-split →
char-split → enrich) → ingest_documents (embed → vector-store upsert),
with JSON artifacts between pods (ingestion-pipeline.py:280-309).

Spark-first equivalent: no materialization barriers at all —
documents → chunk (explode+substring, codegen) → broadcast dim enrich
→ deterministic embed → partitioned write. Catalyst prunes columns
into the scan; the only shuffle is the optional final
``repartition(index_name)`` for the partitioned sink (S7 stand-in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.embedding import embed_deterministic
from ..functions.textops import (
    chunk_fixed_overlap,
    content_header,
    normalize_index_name,
    token_count,
)
from ..sources.catalog import lang_dim, load_table, spread_scan


def ingestion_pipeline(
    spark: SparkSession,
    sf_dir: str,
    chunk_size: int = 128,
    overlap: int = 32,
    embed_dim: int = 8,
) -> DataFrame:
    """documents → chunks → enriched → embedded (lazy, end-to-end).

    Chunk params default small because the synthetic docs are ≤ ~600
    chars; the reference's production constants are 2048/256
    (ingestion-pipeline.py:226-227).
    """
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    chunks = chunk_fixed_overlap(
        docs.select("doc_id", "lang", "source", "text"),
        text_col="text",
        id_cols=("doc_id", "lang", "source"),
        size=chunk_size,
        overlap=overlap,
    )
    enriched = (
        chunks.join(F.broadcast(lang_dim(spark)), on="lang", how="left")
        .withColumn(
            "index_name",
            normalize_index_name(F.concat_ws("_", F.col("source"), F.col("lang"))),
        )
        # X1: every chunk carries its section-path header
        # (ingestion-pipeline.py:234-240) — embedded text includes it,
        # exactly as the reference embeds header+content
        .withColumn(
            "chunk_text",
            content_header(
                F.col("source"), F.col("lang"), F.col("chunk_idx").cast("string"),
                F.col("chunk_text"),
            ),
        )
        .withColumn("n_tokens", token_count(F.col("chunk_text")))
        # canonical chunk model (SURVEY.md §1.3): known metadata keys
        # live as real columns (prunable/pushable); the open long-tail
        # dict the reference accumulates by |= merge
        # (ingestion-pipeline.py:218-222) rides as MAP<STRING,STRING>
        .withColumn(
            "metadata",
            F.map_from_arrays(
                F.array(F.lit("source"), F.lit("language"), F.lit("chunk")),
                F.array(
                    F.col("source"), F.col("lang"), F.col("chunk_idx").cast("string")
                ),
            ),
        )
    )
    return enriched.withColumn("embedding", embed_deterministic(F.col("chunk_text"), embed_dim))


def write_vector_store(df: DataFrame, path: str) -> None:
    """S7/S8 stand-in sink: the vector store as an index_name-
    partitioned parquet table (the reference's Weaviate/ES upsert,
    ingestion-pipeline.py:341-349; partitioning ≈ its per-collection
    batching). ``repartition`` first so each partition writes one file
    set — at scale this is the single shuffle of the pipeline."""
    df.repartition("index_name").write.mode("overwrite").partitionBy("index_name").parquet(path)


def flagship_query(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """The ingestion report: chunks + token mass per collection.

    scan → explode-chunk → broadcast-enrich → hash agg, exercising the
    minimum end-to-end slice (SURVEY.md §7.1) plus the embed stage.
    """
    enriched = ingestion_pipeline(spark, sf_dir)
    return (
        enriched.groupBy("index_name", "language_name")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.round(F.avg(F.length("chunk_text")), 2).alias("avg_chunk_chars"),
            F.round(F.sum("n_tokens").cast("double"), 2).alias("total_tokens"),
            F.round(F.avg(F.element_at("embedding", 1)), 6).alias("emb_dim1_mean"),
        )
        .orderBy("index_name")
    )


def incremental_ingest(
    spark: SparkSession,
    store,
    new_docs: DataFrame,
    doc_id_col: str = "doc_id",
    **pipeline_kwargs,
) -> int:
    """Incremental re-ingestion: only docs not yet in the store.

    The reference's idempotence is collection-granular skip-if-exists
    (website-ingestion-pipeline.py:116-118); at 100 TB you want
    document-granular increments: left-anti join the incoming docs
    against stored doc ids (J4), run the ingestion stages on the
    remainder only, append. The stored-ids side reduces to a
    doc_id-only column scan (column pruning), and the anti join keys
    on doc_id — one shuffle of the (small) increment.

    Returns the number of newly ingested chunks.
    """
    from pyspark.errors import AnalysisException

    from ..functions.embedding import embed_deterministic
    from ..functions.textops import chunk_fixed_overlap, token_count

    try:
        seen = store.spark.read.parquet(store.path).select(doc_id_col).distinct()
        fresh = new_docs.join(seen, on=doc_id_col, how="left_anti")
    except AnalysisException:
        # ONLY a missing/empty store path means "nothing ingested yet".
        # Any other failure (corrupt footer, permissions, transient IO)
        # must fail loudly — silently skipping the anti-join here would
        # re-ingest duplicate chunks into a store that actually has data.
        fresh = new_docs
    chunks = chunk_fixed_overlap(
        fresh.select(doc_id_col, "lang", "source", "text"),
        text_col="text",
        id_cols=(doc_id_col, "lang", "source"),
        size=pipeline_kwargs.get("chunk_size", 128),
        overlap=pipeline_kwargs.get("overlap", 32),
    )
    enriched = (
        chunks.withColumn(
            "index_name",
            normalize_index_name(F.concat_ws("_", F.col("source"), F.col("lang"))),
        )
        .withColumn("n_tokens", token_count(F.col("chunk_text")))
        .withColumn(
            "embedding",
            embed_deterministic(F.col("chunk_text"), pipeline_kwargs.get("embed_dim", 8)),
        )
    )
    # Observation: the row count rides along with the ONE write job
    # (metrics collected per-task, merged on the driver) — no second
    # evaluation of the chunk+embed pipeline and no persist() memory
    # footprint. An empty increment writes no files and reports 0.
    from pyspark.sql import Observation

    obs = Observation("incremental_ingest")
    enriched = enriched.observe(obs, F.count(F.lit(1)).alias("n_chunks"))
    enriched.repartition(F.col("index_name")).write.mode("append").partitionBy(
        "index_name"
    ).parquet(store.path)
    return obs.get["n_chunks"]
