"""Pipeline parameterization, mirroring the reference's env surface.

The reference parameterizes runs through environment variables —
``WEBSITE_URL`` / ``VECTORDB_INDEX`` for the website ingestor
(website-ingestion-pipeline.py:249-250) and vector-store connection
env injected from secrets (ingestion-pipeline.py:366-372). Same
contract here, engine-appropriate: one dataclass, ``from_env()``
reads the same names, everything overridable in code.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from ..functions.textops import CHUNK_OVERLAP, CHUNK_SIZE


@dataclass(frozen=True)
class IngestionConfig:
    #: target collection (VECTORDB_INDEX, website-ingestion-pipeline.py:250);
    #: normalized exactly like the reference (lowercase, -/. → _)
    index_name: str = "default_index"
    #: source URL for the website path (WEBSITE_URL, website-ingestion-pipeline.py:249)
    website_url: str | None = None
    #: vector store location (the engine's stand-in for WEAVIATE_HOST /
    #: ES connection env, ingestion-pipeline.py:311-326)
    store_path: str = "/tmp/vector_store"
    chunk_size: int = CHUNK_SIZE
    chunk_overlap: int = CHUNK_OVERLAP
    #: markdown split depth: 3 for product docs (ingestion-pipeline.py:
    #: 205-209), 4 for the website ingestor (website-ingestion-pipeline.py:147-152)
    md_split_depth: int = 3
    embed_dim: int = 64
    headers_to_split_on: tuple[str, ...] = field(
        default_factory=lambda: ("#", "##", "###")
    )

    @classmethod
    def from_env(cls, **overrides) -> "IngestionConfig":
        env = {
            "website_url": os.environ.get("WEBSITE_URL"),
            "index_name": os.environ.get("VECTORDB_INDEX", cls.index_name),
            "store_path": os.environ.get("VECTOR_STORE_PATH", cls.store_path),
            "chunk_size": int(os.environ.get("CHUNK_SIZE", cls.chunk_size)),
            "chunk_overlap": int(os.environ.get("CHUNK_OVERLAP", cls.chunk_overlap)),
        }
        env.update(overrides)
        return cls(**env)
