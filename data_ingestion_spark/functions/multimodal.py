"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (the reference pins ``pypdf`` but never uses it,
ingestion-pipeline.py:50 / website-ingestion-pipeline.py:17). Design:
media are **opaque BINARY columns** with a typed metadata struct —
Spark shuffles/stores them fine, and all interpretation happens in
Arrow-batched ``mapInPandas`` stages so the bytes never round-trip
through Python row-by-row.

The decode/feature kernels themselves need image/audio libs that are
NOT in this container, so each kernel resolves at runtime:
real library if importable, else a clearly-marked deterministic fake
(hash-derived pseudo-metadata) so the Spark-side plumbing — schema,
batching, partition shape — is fully testable. ``strict=True`` raises
NotImplementedError instead of faking.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_binary(df: DataFrame, text_col: str, mime: str = "text/plain") -> DataFrame:
    """Wrap a column as an opaque binary payload + mime tag (the
    canonical multimodal row shape: payload BINARY, mime STRING)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "mime", F.lit(mime)
    )


IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("byte_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode — stands in for PIL/ffmpeg, which are
    not installed here. Dimensions derived from the payload hash so
    tests are stable; replace ``_decode_real`` to go live."""
    h = hashlib.md5(payload or b"").digest()
    return 16 + h[0] % 64, 16 + h[1] % 64, 1 + h[2] % 8


def _decode_real(payload: bytes, mime: str) -> tuple[int, int, int]:
    try:
        from PIL import Image  # not in this container
        import io

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, getattr(img, "n_frames", 1)
    except ImportError:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg; not available in this environment"
        )


def decode_media_meta(df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode payloads to media metadata via Arrow-batched mapInPandas.

    Batch shape: one pandas DataFrame per Arrow batch; the payload
    column arrives as ``bytes`` objects. Partition-level parallelism —
    at 100 TB, repartition by size before this stage so batches are
    even (binary rows are heavy; don't rely on row-count heuristics).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mime in zip(pdf["doc_id"], pdf["payload"], pdf["mime"]):
                if strict:
                    w, h, nf = _decode_real(payload, mime)
                else:
                    try:
                        w, h, nf = _decode_real(payload, mime)
                    except NotImplementedError:
                        w, h, nf = _fake_dims(payload)
                rows.append((doc_id, mime, len(payload or b""), w, h, nf))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
            )

    return df.select("doc_id", "payload", "mime").mapInPandas(run, IMAGE_META_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling plumbing: explode pseudo-frame indices from the
    decoded n_frames (the video analogue of chunk explode). The frame
    *bytes* extraction is part of the stubbed decode kernel."""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_len", IntegerType()),
    ]
)


def extract_frames(df: DataFrame, every_n: int = 1, strict: bool = False) -> DataFrame:
    """Frame-byte extraction: one row per sampled frame with its raw
    bytes — the video analogue of chunk explode, as an Arrow-batched
    stage (payloads never cross row-by-row).

    Real extraction needs ffmpeg (absent here); the DETERMINISTIC FAKE
    slices the payload into n_frames equal byte ranges (from the same
    hash-derived n_frames as decode_media_meta), so downstream
    partitioning/batching behavior is real and testable. Heavy rows:
    repartition by byte size before this stage at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = payload or b""
                if strict:
                    raise NotImplementedError("frame extraction requires ffmpeg")
                _, _, n_frames = _fake_dims(payload)
                step = max(len(payload) // max(n_frames, 1), 1)
                for i in range(0, n_frames, every_n):
                    fb = payload[i * step : (i + 1) * step] or b"\x00"
                    rows.append((doc_id, i, fb, len(fb)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


def embed_media(df: DataFrame, dim: int = 64, strict: bool = False) -> DataFrame:
    """Media → embedding column (the CLIP-style feature-extract slot
    in a multimodal search pipeline). Kernel resolution as elsewhere
    in this module: a real vision/audio encoder if the env has one,
    else the deterministic hash fake — the Spark-side contract
    (BINARY in, ARRAY<FLOAT> out, Arrow-batched, one pass) is real
    and tested either way; downstream ANN (similarity.AnnStore /
    brute_force_topk) consumes the column unchanged."""
    import numpy as np
    from pyspark.sql.types import ArrayType, FloatType

    if strict:
        raise NotImplementedError(
            "no media encoder available in this environment; "
            "unset strict to use the deterministic fake kernel"
        )

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(payloads: pd.Series) -> pd.Series:
        n_blocks = (dim * 4 + 31) // 32
        out = []
        for p in payloads:
            raw = bytes(p or b"")
            buf = b"".join(
                hashlib.blake2b(raw + bytes([k]), digest_size=32).digest()
                for k in range(n_blocks)
            )
            ints = np.frombuffer(buf, dtype=np.uint32)[:dim].astype(np.float64)
            out.append((ints / np.float64(2**32 - 1) * 2.0 - 1.0).astype(np.float32))
        return pd.Series(out)

    return df.withColumn("embedding", _embed(F.col("payload")))
