from .pipeline import (  # noqa: F401
    stream_events_from_dir,
    tumbling_counts,
    sliding_counts,
    session_counts,
    dedup_within_watermark,
    run_to_vector_store,
)
