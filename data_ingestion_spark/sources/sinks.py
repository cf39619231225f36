"""Sinks: vector-store connectors + DDL surface (SURVEY.md §2.1 S7-S10).

The reference upserts chunks into Weaviate or Elasticsearch through
LangChain ``add_documents`` (ingestion-pipeline.py:341-349,
ingestion-pipeline-elastic.py:348-355), creating the index first
(website-ingestion-pipeline.py:102-138 / ingestion-pipeline-website-
local.py:295-318) and deleting per collection
(ingestion-pipeline-website-local.py:119-136).

Spark-first design: two interchangeable sink backends behind one
``VectorStoreSink`` protocol —

- ``ParquetVectorStore``: the testable stand-in; collections are
  partitions of a parquet table (``partitionBy(index_name)``), DDL is
  directory lifecycle, delete is partition overwrite. This is also
  the honest 100 TB architecture for an analytical store.
- ``ServiceVectorStore``: the remote-service shape (Weaviate/ES).
  Executor-side ``foreachPartition`` with a per-partition client and
  bounded batch upserts — the driver never sees the data. The actual
  HTTP client isn't available here, so the client factory is
  injectable; tests use a file-backed fake.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession, functions as F


class VectorStoreSink(Protocol):
    def create_collection(self, name: str) -> None: ...
    def delete_collection(self, name: str) -> None: ...
    def list_collections(self) -> list[str]: ...
    def upsert(self, df: DataFrame) -> None: ...


class ParquetVectorStore:
    """S7/S8 stand-in + S9/S10 DDL as partition lifecycle.

    ``upsert`` repartitions by collection so each collection writes
    from co-located tasks — the one shuffle of the ingestion plan;
    dynamic partition overwrite gives idempotent re-ingestion
    (the reference's 'skip if index exists' becomes 'overwrite the
    collection partition')."""

    def __init__(self, spark: SparkSession, path: str, key: str = "index_name"):
        self.spark, self.path, self.key = spark, path, key

    def create_collection(self, name: str) -> None:
        os.makedirs(os.path.join(self.path, f"{self.key}={name}"), exist_ok=True)

    def delete_collection(self, name: str) -> None:
        """S10: delete = drop the partition directory (at scale:
        ``ALTER TABLE ... DROP PARTITION`` on the metastore)."""
        import shutil

        p = os.path.join(self.path, f"{self.key}={name}")
        if os.path.exists(p):
            shutil.rmtree(p)

    def list_collections(self) -> list[str]:
        """S11: catalog scan over partition names (no data read)."""
        if not os.path.isdir(self.path):
            return []
        return sorted(
            p.split("=", 1)[1]
            for p in os.listdir(self.path)
            if p.startswith(f"{self.key}=")
        )

    def upsert(self, df: DataFrame) -> None:
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            df.repartition(F.col(self.key))
            .write.mode("overwrite")
            .partitionBy(self.key)
            .parquet(self.path)
        )

    def read_collection(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path).filter(F.col(self.key) == name)


#: client factory signature: () -> object with .index(batch: list[dict])
ClientFactory = Callable[[], "ServiceClient"]


class ServiceClient(Protocol):
    def index(self, batch: list[dict]) -> None: ...
    def close(self) -> None: ...


def _upsert_partition(
    rows: Iterator, cols: list[str], factory: ClientFactory, batch_size: int
) -> None:
    client = factory()
    batch: list[dict] = []
    try:
        for row in rows:
            batch.append(dict(zip(cols, row)))
            if len(batch) >= batch_size:
                client.index(batch)
                batch = []
        if batch:
            client.index(batch)
    finally:
        client.close()


class ServiceVectorStore:
    """Remote-service sink shape: one client per executor partition,
    bounded batches (the library-default batching of ``add_documents``
    made explicit, ingestion-pipeline.py:349). Rate limits/retries
    belong in the injected client."""

    def __init__(self, factory: ClientFactory, batch_size: int = 500):
        self.factory, self.batch_size = factory, batch_size

    def upsert(self, df: DataFrame) -> None:
        cols = df.columns
        factory, batch_size = self.factory, self.batch_size
        df.foreachPartition(
            lambda rows: _upsert_partition(rows, cols, factory, batch_size)
        )


class FileBackedFakeClient:
    """Test double for the service client: append-only JSONL per
    process — lets tests observe batch sizes and totals without a
    network service."""

    def __init__(self, out_dir: str):
        import uuid

        self.path = os.path.join(out_dir, f"upserts-{uuid.uuid4().hex}.jsonl")
        self._fh = open(self.path, "a", encoding="utf-8")

    def index(self, batch: list[dict]) -> None:
        self._fh.write(json.dumps({"n": len(batch)}) + "\n")
        for doc in batch:
            self._fh.write(json.dumps({"id": doc.get("doc_id", doc.get("chunk_id"))}) + "\n")

    def close(self) -> None:
        self._fh.close()


def compact_collections(
    store: ParquetVectorStore, target_files: int = 1, collections: list[str] | None = None
) -> dict[str, int]:
    """Small-files compaction: rewrite each collection partition into
    ``target_files`` files (streaming sinks and incremental appends
    accumulate per-batch files; parquet scan efficiency degrades with
    file count). Per-collection dynamic-partition overwrite keeps the
    operation collection-atomic. Returns files-before per collection.
    At 100 TB: run per-partition on a schedule, sized by bytes not
    file count (coalesce(bytes / 512MB))."""
    import os

    before: dict[str, int] = {}
    names = collections or store.list_collections()
    store.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    for name in names:
        part_dir = os.path.join(store.path, f"{store.key}={name}")
        before[name] = len([f for f in os.listdir(part_dir) if f.endswith(".parquet")])
        if before[name] <= target_files:
            continue
        df = store.read_collection(name)
        (
            df.coalesce(target_files)
            .write.mode("overwrite")
            .partitionBy(store.key)
            .parquet(store.path)
        )
    return before
