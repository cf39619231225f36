from . import textops, embedding, similarity, dedup  # noqa: F401
