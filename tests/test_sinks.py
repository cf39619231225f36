"""Vector-store sink tests: partition lifecycle + executor-side upsert."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from data_ingestion_spark.plans.ingestion import ingestion_pipeline
from data_ingestion_spark.sources.catalog import load_table
from data_ingestion_spark.sources.sinks import (
    FileBackedFakeClient,
    ParquetVectorStore,
    ServiceVectorStore,
)


def test_parquet_store_lifecycle(spark, tmp_path):
    store = ParquetVectorStore(spark, str(tmp_path / "store"), key="lang")
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang", "n_chars")
    store.upsert(docs)
    assert store.list_collections() == ["de", "en", "es", "fr", "zh"]

    back = store.read_collection("en")
    assert back.count() == docs.filter(F.col("lang") == "en").count()

    store.delete_collection("de")
    assert "de" not in store.list_collections()
    assert spark.read.parquet(str(tmp_path / "store")).filter("lang = 'de'").count() == 0


def test_parquet_store_idempotent_reupsert(spark, tmp_path):
    """Dynamic partition overwrite: re-ingesting a collection replaces
    it instead of duplicating (the reference's skip-if-exists becomes
    overwrite-partition)."""
    store = ParquetVectorStore(spark, str(tmp_path / "store"), key="lang")
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang", "n_chars")
    store.upsert(docs)
    store.upsert(docs.filter(F.col("lang") == "en"))  # partial re-run
    back = spark.read.parquet(str(tmp_path / "store"))
    assert back.count() == docs.count()  # no duplication


def test_service_sink_batches(spark, tmp_path):
    out = tmp_path / "client"
    os.makedirs(out)
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang").limit(137)
    sink = ServiceVectorStore(lambda: FileBackedFakeClient(str(out)), batch_size=50)
    sink.upsert(docs)
    ids, batch_sizes = set(), []
    for f in os.listdir(out):
        for line in open(out / f, encoding="utf-8"):
            rec = json.loads(line)
            if "n" in rec:
                batch_sizes.append(rec["n"])
            else:
                ids.add(rec["id"])
    assert len(ids) == 137  # every row upserted exactly once
    assert max(batch_sizes) <= 50  # bounded batches


def test_full_ingestion_to_store(spark, tmp_path):
    """Flagship plan → partitioned vector store, end-to-end lazy."""
    enriched = ingestion_pipeline(spark, SF_SMALL)
    store = ParquetVectorStore(spark, str(tmp_path / "vstore"))
    store.upsert(enriched)
    cols = set(spark.read.parquet(str(tmp_path / "vstore")).columns)
    assert {"doc_id", "chunk_idx", "chunk_text", "embedding", "index_name"} <= cols
    assert len(store.list_collections()) > 50  # source x lang combos


def test_incremental_ingest_document_granular(spark, tmp_path):
    """Second run with overlapping docs ingests only the new ones."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.plans.ingestion import incremental_ingest

    docs = load_table(spark, SF_SMALL, "documents")
    store = ParquetVectorStore(spark, str(tmp_path / "inc"))

    first = incremental_ingest(spark, store, docs.filter(F.col("doc_id") < 100))
    assert first > 0
    total_after_first = spark.read.parquet(store.path).count()

    # overlap: docs 50..149 — only 100..149 are new
    second = incremental_ingest(
        spark, store, docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 150))
    )
    back = spark.read.parquet(store.path)
    assert back.count() == total_after_first + second
    assert back.select("doc_id").distinct().count() == 150
    # no duplicated chunks for the overlapping docs
    dup = (
        back.groupBy("doc_id", "chunk_idx").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0


def test_json_artifact_roundtrip(spark, tmp_path):
    from data_ingestion_spark.sources.catalog import (
        read_json_artifact,
        write_json_artifact,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang", "n_chars")
    p = str(tmp_path / "artifact")
    write_json_artifact(docs, p)
    back = read_json_artifact(spark, p, "doc_id bigint, lang string, n_chars bigint")
    assert back.count() == docs.count()
    a = {r.doc_id: (r.lang, r.n_chars) for r in docs.collect()}
    b = {r.doc_id: (r.lang, r.n_chars) for r in back.collect()}
    assert a == b


def test_binary_dir_source(spark, tmp_path):
    from data_ingestion_spark.functions.multimodal import decode_media_meta
    from data_ingestion_spark.sources.catalog import read_binary_dir
    from pyspark.sql import functions as F

    media = tmp_path / "media"
    media.mkdir()
    for i in range(4):
        (media / f"img_{i}.bin").write_bytes(b"fakeimage" * (i + 1))
    df = read_binary_dir(spark, str(media), "*.bin")
    assert df.count() == 4
    assert {f.name for f in df.schema.fields} == {
        "path", "modificationTime", "length", "content"
    }
    # plumb into the decode stage (payload/mime/doc_id contract)
    shaped = df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("payload"),
        F.lit("image/png").alias("mime"),
    )
    meta = decode_media_meta(shaped).collect()
    assert len(meta) == 4 and all(r.byte_len > 0 for r in meta)


def test_compact_collections(spark, tmp_path):
    from data_ingestion_spark.sources.sinks import compact_collections

    store = ParquetVectorStore(spark, str(tmp_path / "cstore"), key="lang")
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang", "n_chars")
    # simulate incremental appends: many small files per collection
    for i in range(4):
        docs.filter(F.col("doc_id") % 4 == i).repartition(3).write.mode(
            "append"
        ).partitionBy("lang").parquet(store.path)
    total_before = store.read_collection("en").count()

    before = compact_collections(store, target_files=1)
    assert before["en"] > 1  # really was fragmented
    import os

    files_after = [
        f for f in os.listdir(tmp_path / "cstore" / "lang=en") if f.endswith(".parquet")
    ]
    assert len(files_after) == 1
    assert store.read_collection("en").count() == total_before  # lossless
