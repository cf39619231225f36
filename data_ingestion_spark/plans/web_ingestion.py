"""The website-ingestor pipeline (reference W) as one lazy plan.

Reference lifecycle (SURVEY.md §3.2): ``scrape_website`` (fetch →
body) → ``create_index`` DDL → ``convert_to_md`` (html2text + header
split + char split + header prepend) → ``ingest`` (embed + ES upsert),
parameterized by WEBSITE_URL / VECTORDB_INDEX
(website-ingestion-pipeline.py:22-49, 102-138, 140-174, 177-198,
249-250).

Here: fetch (injectable) → clean_html → markdown header split (depth 4
per W:147-152) → recursive chunking → content header → embed → upsert
into the collection named by the config — one DataFrame program, the
index DDL being partition lifecycle on the store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.embedding import embed_deterministic
from ..functions.html import Fetcher, clean_html, fetch_pages
from ..functions.textops import (
    chunk_recursive,
    content_header,
    normalize_index_name,
    split_markdown_headers,
)
from ..sources.sinks import ParquetVectorStore
from .config import IngestionConfig


def website_ingestion(
    spark: SparkSession,
    cfg: IngestionConfig,
    fetcher: Fetcher | None = None,
) -> DataFrame:
    """Build the lazy website-ingestion plan (no execution)."""
    if not cfg.website_url:
        raise ValueError("cfg.website_url required (WEBSITE_URL env)")
    urls = spark.createDataFrame([(cfg.website_url,)], "url string")
    docs = clean_html(fetch_pages(urls, fetcher=fetcher))
    sections = split_markdown_headers(docs, "page_content", max_level=cfg.md_split_depth)
    sec = sections.select(
        "url",
        "title",
        F.posexplode("sections").alias("section_idx", "section_text"),
    )
    chunks = chunk_recursive(
        sec,
        text_col="section_text",
        id_cols=("url", "title", "section_idx"),
        size=cfg.chunk_size,
        overlap=cfg.chunk_overlap,
    )
    enriched = chunks.withColumn(
        "chunk_text",
        content_header(
            F.col("title"),
            F.col("section_idx").cast("string"),
            F.col("chunk_idx").cast("string"),
            F.col("chunk_text"),
        ),
    ).withColumn("index_name", normalize_index_name(F.lit(cfg.index_name)))
    return enriched.withColumn(
        "embedding", embed_deterministic(F.col("chunk_text"), cfg.embed_dim)
    )


def run_website_ingestion(
    spark: SparkSession,
    cfg: IngestionConfig,
    fetcher: Fetcher | None = None,
) -> int:
    """Execute: create the collection, upsert, return chunk count
    (the reference's component sequence W:230-245 as one job)."""
    store = ParquetVectorStore(spark, cfg.store_path)
    normalized = cfg.index_name.lower().replace("-", "_").replace(".", "_")
    store.create_collection(normalized)
    df = website_ingestion(spark, cfg, fetcher)
    store.upsert(df)
    return store.read_collection(normalized).count()
