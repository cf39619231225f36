from .ingestion import flagship_query, ingestion_pipeline  # noqa: F401
