"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (the reference pins ``pypdf`` but never uses it,
ingestion-pipeline.py:50 / website-ingestion-pipeline.py:17). Design:
media are **opaque BINARY columns** with a typed metadata struct —
Spark shuffles/stores them fine, and all interpretation happens in
Arrow-batched ``mapInPandas`` stages so the bytes never round-trip
through Python row-by-row.

Kernel reality, format by format (r08): header metadata decode is
REAL for PNG/JPEG/GIF/BMP/WAV (pure struct), and **pixel decode is
REAL for PNG, GIF, BMP AND baseline JPEG** — stdlib+numpy codecs in
``functions/pixels.py`` (zlib inflate + filter reconstruction, LZW,
BI_RGB rows) and ``functions/jpeg.py`` (Huffman + DCT, 4:4:4/4:2:2/
4:2:0) feeding the Arrow-batched ``decode_pixels`` stage. Only
learned media embeddings still need libs absent from this container;
that kernel resolves at runtime — real library if importable, else a
clearly-marked deterministic fake — and ``strict=True`` raises
NotImplementedError instead of faking.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
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


PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: JPEG start-of-frame markers carry the image dimensions; C4 (DHT),
#: C8 (JPG extension) and CC (DAC) share the 0xC0-0xCF range but are
#: not frame headers.
_JPEG_NON_SOF = {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes | None) -> tuple[str, int, int, int] | None:
    """REAL (non-stub) header decode for PNG and JPEG — pure ``struct``
    parsing of a few header bytes, no PIL/ffmpeg needed.

    PNG: 8-byte signature, then the IHDR chunk (always first): length,
    b'IHDR', width/height as big-endian u32, bit depth u8.
    JPEG: SOI then a marker walk; the SOF segment holds precision u8,
    height/width as big-endian u16.

    Returns ``(format, width, height, bit_depth)`` or None for
    anything unrecognized/truncated (callers fall back to the library
    decode or the documented fake).
    """
    if payload is None:
        return None
    b = bytes(payload)
    if b[:8] == PNG_SIG and len(b) >= 29 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h, b[24])
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None  # lost marker sync — not a clean stream
            marker = b[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
                i += 2
                continue
            if marker == 0xD9:  # EOI before any SOF
                return None
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
                if i + 9 > len(b):
                    return None
                depth = b[i + 4]
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("jpeg", w, h, depth)
            i += 2 + seg_len
        return None
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h, 8)
    return _parse_bmp(b)


def _parse_bmp(b: bytes) -> tuple[str, int, int, int] | None:
    if b[:2] == b"BM" and len(b) >= 26:
        # BITMAPINFOHEADER: i32le width/height at offset 18; height may
        # be negative (top-down rows)
        w, h = struct.unpack("<ii", b[18:26])
        return ("bmp", w, abs(h), 8)
    return None


AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("n_samples", LongType()),
    ]
)


def parse_audio_header(payload: bytes | None) -> tuple[str, int, int, int, int] | None:
    """REAL audio metadata decode for WAV (RIFF/WAVE) — pure struct,
    no audio libraries: channels, sample rate, bit depth from the fmt
    chunk; sample count derived from the data chunk length. Returns
    ``(format, n_channels, sample_rate, bits_per_sample, n_samples)``
    or None for unrecognized/truncated streams."""
    if payload is None:
        return None
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    channels = rate = bits = None
    n_samples = 0
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            channels, rate = struct.unpack("<HI", b[i + 10 : i + 16])
            bits = struct.unpack("<H", b[i + 22 : i + 24])[0]
        elif cid == b"data" and channels and bits:
            n_samples = clen // max(channels * bits // 8, 1)
        i += 8 + clen + (clen % 2)  # chunks are word-aligned
    if channels is None:
        return None
    return ("wav", channels, rate, bits, n_samples)


def wav_bytes(
    n_channels: int, sample_rate: int, bits_per_sample: int, n_samples: int
) -> bytes:
    """Minimal valid WAV header + zeroed data chunk (synthesis half of
    the audio header roundtrip tests)."""
    data_len = n_samples * n_channels * bits_per_sample // 8
    byte_rate = sample_rate * n_channels * bits_per_sample // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate,
        n_channels * bits_per_sample // 8, bits_per_sample,
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", data_len) + b"\x00" * data_len
    )


AUDIO_SEGMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("seg_idx", IntegerType()),
        StructField("seg_bytes", BinaryType()),
        StructField("n_samples", LongType()),
    ]
)


def segment_wav(df: DataFrame, seconds: float = 1.0) -> DataFrame:
    """REAL audio segmentation for PCM WAV — no codec needed: locate
    the data chunk via the header walk, then slice the raw sample
    bytes into ``seconds``-long windows (aligned to whole sample
    frames). One output row per segment with its actual bytes — the
    audio twin of chunk explode, Arrow-batched. Non-WAV payloads
    yield no rows (corrupt media is data, not an exception)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta = parse_audio_header(payload)
                if meta is None:
                    continue
                _, ch, rate, bits, _ = meta
                if rate <= 0:
                    # Corrupt fmt chunk: rate==0 collapses the segment
                    # step to one frame, emitting one row per audio
                    # frame — millions of pandas rows from one hostile
                    # WAV (ADVICE r08). Skip: degrade, never amplify.
                    continue
                frame_bytes = max(ch * bits // 8, 1)
                b = bytes(payload)
                # find the data chunk
                i, data = 12, b""
                while i + 8 <= len(b):
                    cid = b[i : i + 4]
                    clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
                    if cid == b"data":
                        data = b[i + 8 : i + 8 + clen]
                        break
                    i += 8 + clen + (clen % 2)
                seg_frames = max(int(rate * seconds), 1)
                step = seg_frames * frame_bytes
                for idx in range(0, max(len(data), 1), step):
                    seg = data[idx : idx + step]
                    if not seg:
                        break
                    rows.append(
                        (doc_id, idx // step, seg, len(seg) // frame_bytes)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SEGMENT_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(run, AUDIO_SEGMENT_SCHEMA)


def pcm_to_float(data: bytes, bits: int, fmt_tag: int = 1):
    """Sample bytes → float array in [-1, 1] — REAL sample decode for
    the encodings WAV actually carries: integer PCM at 8 (unsigned) /
    16 / 24 / 32-bit little-endian (tag 1), IEEE float32 (tag 3), and
    the G.711 telephony companders A-law (tag 6) and µ-law (tag 7),
    both expanded by the spec formulas (µ-law: bias-0x84 segment
    expansion to ±32124; A-law: 0x55 toggle, ±32256 full scale) and
    normalized against the 16-bit range. Returns None for tags or
    widths outside that envelope. numpy-vectorized throughout."""
    import numpy as np

    if fmt_tag == 1:
        if bits == 8:
            return (
                np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        if bits == 16:
            n = len(data) // 2
            return (
                np.frombuffer(data, dtype="<i2", count=n).astype(np.float64)
                / 32768.0
            )
        if bits == 24:
            n = len(data) // 3
            raw = np.frombuffer(data, dtype=np.uint8, count=n * 3).reshape(n, 3)
            v = (
                raw[:, 0].astype(np.int64)
                | (raw[:, 1].astype(np.int64) << 8)
                | (raw[:, 2].astype(np.int64) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            return v.astype(np.float64) / float(1 << 23)
        if bits == 32:
            n = len(data) // 4
            return (
                np.frombuffer(data, dtype="<i4", count=n).astype(np.float64)
                / float(1 << 31)
            )
        return None
    if fmt_tag == 3 and bits == 32:  # IEEE float
        n = len(data) // 4
        return np.frombuffer(data, dtype="<f4", count=n).astype(np.float64)
    if fmt_tag == 7 and bits == 8:  # µ-law (G.711)
        u = ~np.frombuffer(data, dtype=np.uint8) & 0xFF
        exp = (u >> 4) & 7
        mant = u & 0x0F
        mag = (((mant.astype(np.int32) << 3) + 0x84) << exp) - 0x84
        return np.where(u & 0x80, -mag, mag).astype(np.float64) / 32768.0
    if fmt_tag == 6 and bits == 8:  # A-law (G.711)
        a = np.frombuffer(data, dtype=np.uint8) ^ 0x55
        exp = (a >> 4) & 7
        mant = (a & 0x0F).astype(np.int32)
        mag = np.where(
            exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0)
        )
        # sign convention per the G.711 reference expander: after the
        # 0x55 toggle, bit 7 SET means positive (opposite of µ-law)
        return np.where(a & 0x80, mag, -mag).astype(np.float64) / 32768.0
    return None


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("seg_idx", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
    ]
)


def audio_segment_stats(df: DataFrame, seconds: float = 1.0) -> DataFrame:
    """Per-segment loudness features over WAV payloads — the silence/
    clipping filter a training-data audio pipeline runs before
    anything expensive: slice the data chunk into ``seconds`` windows
    (same framing as segment_wav) and emit each segment's RMS and
    peak of the DECODED samples (pcm_to_float: integer PCM, IEEE
    float, µ-law, A-law), normalized to [-1, 1]. Non-WAV or
    unsupported-codec payloads yield no rows; Arrow-batched, numpy
    per segment — no per-sample Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta = parse_audio_header(payload)
                if meta is None:
                    continue
                _, ch, rate, bits, _ = meta
                if rate <= 0:
                    # Corrupt fmt chunk: rate==0 collapses the segment
                    # step to one frame, emitting one row per audio
                    # frame — millions of pandas rows from one hostile
                    # WAV (ADVICE r08). Skip: degrade, never amplify.
                    continue
                frame_bytes = max(ch * bits // 8, 1)
                b = bytes(payload)
                i, data, fmt_tag = 12, b"", 1
                while i + 8 <= len(b):
                    cid = b[i : i + 4]
                    clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
                    if cid == b"fmt " and i + 10 <= len(b):
                        fmt_tag = struct.unpack("<H", b[i + 8 : i + 10])[0]
                    if cid == b"data":
                        data = b[i + 8 : i + 8 + clen]
                        break
                    i += 8 + clen + (clen % 2)
                step = max(int(rate * seconds), 1) * frame_bytes
                for idx in range(0, max(len(data), 1), step):
                    seg = data[idx : idx + step]
                    if not seg:
                        break
                    samples = pcm_to_float(seg, bits, fmt_tag)
                    if samples is None or len(samples) == 0:
                        continue
                    rows.append(
                        (
                            doc_id,
                            idx // step,
                            len(samples),
                            float(np.sqrt(np.mean(samples**2))),
                            float(np.max(np.abs(samples))),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_STATS_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(run, AUDIO_STATS_SCHEMA)


def decode_audio_headers(df: DataFrame) -> DataFrame:
    """WAV header parse over payload bytes, Arrow-batched — the audio
    twin of decode_image_headers: REAL metadata (channels/rate/depth/
    duration), no audio libs; unrecognized payloads yield NULLs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = parse_audio_header(payload)
                if parsed is None:
                    rows.append((doc_id, None, None, None, None, None))
                else:
                    rows.append((doc_id,) + parsed)
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(run, AUDIO_META_SCHEMA)


def png_bytes(width: int, height: int, bit_depth: int = 8) -> bytes:
    """Minimal structurally-valid PNG (signature + IHDR + IEND with
    real CRCs) — the deterministic synthesis half of the header
    roundtrip DQ."""
    ihdr = struct.pack(">II", width, height) + bytes([bit_depth, 6, 0, 0, 0])
    return (
        PNG_SIG
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        + struct.pack(">I", 0) + b"IEND"
        + struct.pack(">I", zlib.crc32(b"IEND"))
    )


def jpeg_bytes(width: int, height: int, bit_depth: int = 8) -> bytes:
    """Minimal JPEG header stream: SOI, APP0/JFIF (so the parser's
    marker walk is exercised), SOF0 with the dimensions, EOI."""
    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11) + bytes([bit_depth])
        + struct.pack(">HH", height, width) + bytes([1, 0x11, 0])
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def gif_frame_spans(payload: bytes | None) -> list[tuple[int, int]] | None:
    """REAL per-frame byte spans for GIF: walk the block stream and
    return each frame's (start, end) range — image descriptor through
    its LZW data sub-blocks (local color table included). The spans
    ARE the per-frame payloads: extracting them needs no LZW decode.
    Handles the global/local color tables and extension sub-block
    chains; returns None for non-GIF or a truncated stream."""
    if payload is None:
        return None
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    flags = b[10]
    i = 13
    if flags & 0x80:  # global color table: 3 * 2^(N+1) bytes
        i += 3 * (2 << (flags & 0x07))
    spans: list[tuple[int, int]] = []
    while i < len(b):
        block = b[i]
        if block == 0x3B:  # trailer
            return spans
        if block == 0x21:  # extension: label + sub-block chain
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif block == 0x2C:  # image descriptor = one frame
            if i + 10 > len(b):
                return None
            start = i
            lflags = b[i + 9]
            i += 10
            if lflags & 0x80:  # local color table
                i += 3 * (2 << (lflags & 0x07))
            i += 1  # LZW minimum code size
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
            spans.append((start, min(i, len(b))))
        else:
            return None  # corrupt block stream
    return None  # ran off the end without a trailer


def parse_gif_frames(payload: bytes | None) -> int | None:
    """REAL frame count for GIF (len of gif_frame_spans)."""
    spans = gif_frame_spans(payload)
    return None if spans is None else len(spans)


def _decode_real(payload: bytes, mime: str) -> tuple[int, int, int]:
    parsed = parse_image_header(payload)
    if parsed is not None:
        fmt, w, h, _ = parsed
        if fmt == "gif":
            n = parse_gif_frames(payload)
            return w, h, n if n else 1
        return w, h, 1
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


IMAGE_HEADER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bit_depth", IntegerType()),
    ]
)


def attach_synthetic_image(df: DataFrame) -> DataFrame:
    """Deterministic synthetic media: encode each row as REAL PNG or
    JPEG header bytes (even doc_id → PNG, odd → JPEG) with
    width = 1 + n_chars % 512 and height = 1 + doc_id % 512. Arrow
    scalar UDF — payload bytes are produced batch-wise, never row-by-
    row through the driver. The arithmetic is the oracle-checkable
    contract: a SQL twin recomputes the expected dims directly."""

    @F.pandas_udf(BinaryType())
    def _synth(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
        out = []
        for d, n in zip(doc_id, n_chars):
            w, h = 1 + int(n) % 512, 1 + int(d) % 512
            out.append(png_bytes(w, h) if int(d) % 2 == 0 else jpeg_bytes(w, h))
        return pd.Series(out)

    return df.withColumn("payload", _synth(F.col("doc_id"), F.col("n_chars")))


def decode_image_headers(df: DataFrame) -> DataFrame:
    """Parse real PNG IHDR / JPEG SOF headers from payload bytes via
    Arrow-batched mapInPandas — the un-stubbed half of T11: no media
    libraries involved, pure struct parsing (parse_image_header).
    Unrecognized payloads yield NULL dims rather than failing the
    batch (corrupt files are data, not exceptions, at corpus scale)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = parse_image_header(payload)
                if parsed is None:
                    rows.append((doc_id, None, None, None, None))
                else:
                    fmt, w, h, depth = parsed
                    rows.append((doc_id, fmt, w, h, depth))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_HEADER_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(run, IMAGE_HEADER_SCHEMA)


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

    For GIF the extraction is REAL: each frame's byte span (image
    descriptor through its LZW data sub-blocks) comes from the block
    walk (gif_frame_spans) — no codec needed. Other formats need
    ffmpeg (absent here); the DETERMINISTIC FAKE slices the payload
    into n_frames equal byte ranges (from the same hash-derived
    n_frames as decode_media_meta), so downstream partitioning/
    batching behavior is real and testable either way. Heavy rows:
    repartition by byte size before this stage at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                spans = gif_frame_spans(payload)
                if spans is not None:  # real per-frame bytes
                    for i in range(0, len(spans), every_n):
                        s, e = spans[i]
                        rows.append((doc_id, i, payload[s:e], e - s))
                    continue
                if strict:
                    raise NotImplementedError(
                        "frame extraction beyond GIF requires ffmpeg"
                    )
                _, _, n_frames = _fake_dims(payload)
                step = max(len(payload) // max(n_frames, 1), 1)
                for i in range(0, n_frames, every_n):
                    fb = payload[i * step : (i + 1) * step] or b"\x00"
                    rows.append((doc_id, i, fb, len(fb)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


PIXEL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def decode_pixels(
    df: DataFrame,
    strict: bool = False,
    max_pixel_bytes: int | None = None,
    max_decode_bytes: int | None = None,
) -> DataFrame:
    """REAL pixel decode for PNG/GIF/BMP/JPEG payloads — stdlib+numpy
    codecs (functions/pixels.py: zlib inflate + the five PNG filters,
    GIF LZW + palette + interlace, BMP BI_RGB; functions/jpeg.py:
    baseline AND progressive Huffman+DCT incl. 4:2:0 subsampling),
    Arrow-batched via mapInPandas. Output rows carry raw interleaved
    pixel bytes plus (width, height, n_channels) — the input contract
    of any downstream feature/resize stage.

    Out-of-envelope (arithmetic-coded/12-bit JPEG, …) and
    unrecognized/corrupt payloads yield NULL pixel rows, or raise
    NotImplementedError under ``strict=True`` — corrupt media is data
    at corpus scale, but strict mode never fakes. Images whose decoded
    size exceeds ``max_pixel_bytes`` (default
    pixels.DEFAULT_MAX_PIXEL_BYTES, 268 MB) also yield NULL — the
    per-executor OOM guard against hostile headers and deflate/LZW
    bombs; ``max_decode_bytes`` additionally bounds the JPEG working
    set (default 4x the output cap — decode_pixel_payload). Pixel
    rows are heavy (w*h*ch bytes): repartition by
    decoded byte size before wide downstream ops at 100 TB."""
    from .pixels import DEFAULT_MAX_PIXEL_BYTES, decode_pixel_payload

    cap = DEFAULT_MAX_PIXEL_BYTES if max_pixel_bytes is None else max_pixel_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                decoded = decode_pixel_payload(payload, cap, max_decode_bytes)
                if decoded is None:
                    if strict:
                        raise NotImplementedError(
                            "pixel decode: corrupt or out-of-envelope payload "
                            "(arithmetic-coded/12-bit JPEG, ...); unset strict "
                            "to emit NULL rows"
                        )
                    rows.append((doc_id, None, None, None, None, None))
                else:
                    rows.append((doc_id,) + decoded)
            yield pd.DataFrame(
                rows, columns=[f.name for f in PIXEL_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(run, PIXEL_SCHEMA)


def resize_pixels(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize over decoded pixel rows (PIXEL_SCHEMA
    in, PIXEL_SCHEMA out with the new dims) — numpy fancy-indexing
    per image inside an Arrow batch, no per-pixel Python loop. The
    standard thumbnail/normalize step between decode and
    feature-extract; NULL pixel rows pass through unchanged."""
    import numpy as np

    if out_w < 1 or out_h < 1:
        raise ValueError("output dims must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, fmt, w, h, ch, px in zip(
                pdf["doc_id"], pdf["format"], pdf["width"], pdf["height"],
                pdf["n_channels"], pdf["pixels"],
            ):
                if px is None:
                    rows.append((doc_id, fmt, None, None, None, None))
                    continue
                w, h, ch = int(w), int(h), int(ch)
                arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, ch)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                rows.append(
                    (doc_id, fmt, out_w, out_h, ch, arr[ys][:, xs].tobytes())
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PIXEL_SCHEMA.fields]
            )

    return df.mapInPandas(run, PIXEL_SCHEMA)


FRAME_PIXEL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def decode_gif_frame_pixels(
    df: DataFrame, every_n: int = 1, max_frames: int | None = None
) -> DataFrame:
    """REAL video-style frame sampling at the PIXEL level: composite
    every GIF frame onto the logical-screen canvas per GIF89a
    semantics (frame rects, local palettes, GCE transparency, all
    disposal methods — pixels.gif_decode_frames) and emit every
    ``every_n``-th composited frame as a full-canvas RGB row. This is
    the pixel-true upgrade of frame_sample/extract_frames (which
    operate on indices and raw frame-rect bytes): a frame rect is
    meaningless without the canvas it patches. Non-GIF/corrupt
    payloads yield no rows; output per doc is bounded by the
    max_pixel_bytes budget inside the core decode (n_frames
    multiplies the canvas), plus ``max_frames`` if given."""
    from .pixels import gif_decode_frames

    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = gif_decode_frames(payload, max_frames=max_frames)
                if not frames:
                    continue
                for fi in range(0, len(frames), every_n):
                    fw, fh, ch, px = frames[fi]
                    rows.append((doc_id, fi, fw, fh, ch, px))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_PIXEL_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_PIXEL_SCHEMA)


def pixel_sum(col):
    """Sum of all decoded pixel bytes as a column (numpy inside an
    Arrow batch) — the scalar witness the pixel-decode DQ checks
    against its closed-form oracle. NULL pixels → NULL."""
    import numpy as np

    @F.pandas_udf(LongType())
    def _sum(px: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if p is None
                else int(np.frombuffer(bytes(p), dtype=np.uint8).sum())
                for p in px
            ],
            dtype="Int64",
        )

    return _sum(col)


def attach_gradient_image(df: DataFrame) -> DataFrame:
    """Deterministic synthetic media with KNOWN pixel content — the
    synthesis half of the pixel-decode DQ. Per doc: w = 1+n_chars%13,
    h = 1+doc_id%11. Format rotates doc_id%4 over REAL encoders, each
    with closed-form pixel content a SQL oracle can recompute:

    - PNG (grayscale, Paeth-filtered), BMP (24-bit, r=g=b=v) and GIF
      (identity palette, LZW) carry the gradient v(x,y) =
      (doc_id%200) + x + y (< 256 by construction: no wraparound,
      sum = ch*(w*h*base + h*Tw + w*Th));
    - JPEG (baseline Huffman+DCT, flat quant) carries the CONSTANT
      v = doc_id%200 + n_chars%50 (< 249): constant blocks hold only
      a DC coefficient, so the lossy pipeline round-trips BIT-EXACTLY
      and sum = w*h*v stays closed-form — driver green certifies true
      Huffman+IDCT decode.

    Arrow scalar UDF."""
    from .jpeg import jpeg_encode
    from .pixels import bmp_encode, gif_encode, png_encode

    @F.pandas_udf(BinaryType())
    def _synth(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for d, n in zip(doc_id, n_chars):
            d, n = int(d), int(n)
            w, h = 1 + n % 13, 1 + d % 11
            gray = (
                (d % 200)
                + np.add.outer(np.arange(h), np.arange(w))
            ).astype(np.uint8)
            m = d % 4
            if m == 0:
                out.append(png_encode(w, h, gray.tobytes(), color_type=0, filter_type=4))
            elif m == 1:
                out.append(bmp_encode(w, h, np.repeat(gray, 3).tobytes()))
            elif m == 2:
                out.append(gif_encode(w, h, gray.tobytes()))
            else:
                v = d % 200 + n % 50
                out.append(jpeg_encode(w, h, bytes([v]) * (w * h)))
        return pd.Series(out)

    return df.withColumn("payload", _synth(F.col("doc_id"), F.col("n_chars")))


def embed_media(df: DataFrame, dim: int = 64, strict: bool = False) -> DataFrame:
    """Media → embedding column (the CLIP-style feature-extract slot
    in a multimodal search pipeline). Unlike the decode kernels in
    this module there is NO runtime encoder resolution: the
    deterministic hash fake is the only implemented kernel (no public
    pure-Python vision/audio encoder exists to resolve to), and
    ``strict=True`` always raises. The Spark-side contract (BINARY in,
    ARRAY<FLOAT> out, Arrow-batched, one pass) is real and tested;
    downstream ANN (similarity.AnnStore / brute_force_topk) consumes
    the column unchanged — swap ``_embed`` for a real encoder UDF to
    go live."""
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


LUMA_GRID_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("luma", ArrayType(IntegerType())),
    ]
)


def luma_grid(
    df: DataFrame,
    grid_w: int = 9,
    grid_h: int = 8,
    max_pixel_bytes: int | None = None,
) -> DataFrame:
    """(doc_id, payload) → (doc_id, luma array<int> of grid_w·grid_h)
    — the perceptual-hash substrate (r13 verdict #3): REAL decode
    (PNG/GIF/BMP/JPEG via functions/pixels.py + functions/jpeg.py),
    nearest-neighbor downsample to the tiny grid, integer ITU-style
    luma ((299R+587G+114B)//1000; grayscale passes through), all in
    ONE Arrow-batched stage. Fusing decode+downsample matters at
    100 TB: a two-stage decode_pixels → resize_pixels plan ships
    full-resolution pixel rows (w·h·ch bytes each) between stages,
    while this stage emits ≤ grid_w·grid_h ints per image — the heavy
    bytes never leave the task that inflated them. The downsample
    uses resize_pixels' exact coordinate rule (ys = y·h // grid_h),
    so an image that is a k× nearest-neighbor upscale of another
    lands on the SAME grid — resize invariance by construction, not
    by tolerance. Undecodable/corrupt payloads yield NULL luma (the
    decode_pixels NULL-row contract)."""
    import numpy as np

    from .pixels import DEFAULT_MAX_PIXEL_BYTES, decode_pixel_payload

    if grid_w < 1 or grid_h < 1:
        raise ValueError("grid dims must be >= 1")
    cap = DEFAULT_MAX_PIXEL_BYTES if max_pixel_bytes is None else max_pixel_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                decoded = decode_pixel_payload(payload, cap, None)
                if decoded is None:
                    rows.append((doc_id, None))
                    continue
                _, w, h, ch, px = decoded
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
                ys = (np.arange(grid_h) * h) // grid_h
                xs = (np.arange(grid_w) * w) // grid_w
                small = arr[ys][:, xs].astype(np.int64)
                if ch >= 3:
                    lum = (
                        299 * small[:, :, 0]
                        + 587 * small[:, :, 1]
                        + 114 * small[:, :, 2]
                    ) // 1000
                else:
                    lum = small[:, :, 0]
                rows.append((doc_id, [int(v) for v in lum.ravel()]))
            yield pd.DataFrame(rows, columns=["doc_id", "luma"])

    return df.select("doc_id", "payload").mapInPandas(run, LUMA_GRID_SCHEMA)


def _pack_bits64(bits: list) -> F.Column:
    """Fold exactly 64 0/1 Columns into one BIGINT, bit k = bits[k].
    Pure JVM arithmetic (shiftleft + sum); bit 63 wraps into the sign
    bit by design — xor/bit_count downstream are sign-agnostic."""
    if len(bits) != 64:
        raise ValueError(f"need exactly 64 bits, got {len(bits)}")
    out = F.lit(0).cast("bigint")
    for k, b in enumerate(bits):
        out = out + F.shiftleft(b.cast("bigint"), k)
    return out


def image_dhash64(df: DataFrame, grid_w: int = 9, grid_h: int = 8) -> DataFrame:
    """Difference hash over the luma grid: bit (x, y) = 1 iff
    luma(x+1, y) > luma(x, y) — 64 bits for the default 9×8 grid.
    The standard re-encode/resize-robust image fingerprint: gradient
    DIRECTIONS survive format changes and nearest-neighbor scaling
    bit-exactly (pytest-pinned), and survive mild lossy re-encoding
    up to a small hamming distance (the banded pair join's budget).
    Input (doc_id, payload); returns (doc_id, dhash bigint), NULL for
    undecodable payloads. Everything after the luma stage is pure
    column arithmetic — no Python touches the hash math."""
    if (grid_w - 1) * grid_h != 64:
        raise ValueError("dhash needs (grid_w - 1) * grid_h == 64")
    g = luma_grid(df, grid_w, grid_h)
    c = F.col("luma")
    bits = [
        F.when(
            c[y * grid_w + x + 1] > c[y * grid_w + x], F.lit(1)
        ).otherwise(F.lit(0))
        for y in range(grid_h)
        for x in range(grid_w - 1)
    ]
    return g.select(
        "doc_id",
        F.when(c.isNotNull(), _pack_bits64(bits)).alias("dhash"),
    )


def image_ahash64(df: DataFrame) -> DataFrame:
    """Average hash over an 8×8 luma grid: bit k = 1 iff luma_k >
    mean(luma) — coarser than dhash (loses gradient direction) but
    the classic thumbnail fingerprint. Same contract as
    ``image_dhash64``: (doc_id, payload) → (doc_id, ahash bigint),
    NULL on undecodable, hash math JVM-side."""
    g = luma_grid(df, 8, 8)
    c = F.col("luma")
    mean = F.aggregate(c, F.lit(0).cast("bigint"), lambda a, x: a + x) / F.lit(64)
    bits = [F.when(c[k] > mean, F.lit(1)).otherwise(F.lit(0)) for k in range(64)]
    return g.select(
        "doc_id",
        F.when(c.isNotNull(), _pack_bits64(bits)).alias("ahash"),
    )


def attach_pattern_image(df: DataFrame) -> DataFrame:
    """Deterministic image-dedup fixture (the phash DQ's synthesis
    half, the ``attach_gradient_image`` discipline): docs form groups
    of three (group g = doc_id // 3) sharing one
    9×8 luma pattern P(x, y) = (g·37 + x·17 + y·53) mod 256 — content
    a SQL oracle recomputes in closed form. Variants per group:

    - doc_id % 3 == 0 → PNG, grayscale 9×8 (the original);
    - doc_id % 3 == 1 → BMP, 24-bit r=g=b, 9×8 (lossless RE-ENCODE:
      identical pixels, different container → identical dhash);
    - doc_id % 3 == 2 → GIF, 18×16 2× nearest-neighbor UPSCALE with
      the (0,0) cell perturbed by +128 mod 256 (a RESIZED near-dup:
      the grid downsample undoes the upscale; the perturbation flips
      exactly the dhash bits that compare against cell (0,0), so the
      pair survives only a hamming-tolerant match, not equality).

    Arrow scalar UDF; real encoders from functions/pixels.py."""
    from .pixels import bmp_encode, gif_encode, png_encode

    @F.pandas_udf(BinaryType())
    def _synth(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for d in doc_id:
            d = int(d)
            g, v = d // 3, d % 3
            pat = (
                g * 37
                + 17 * np.arange(9)[None, :]
                + 53 * np.arange(8)[:, None]
            ) % 256
            if v == 2:
                pat = pat.copy()
                pat[0, 0] = (pat[0, 0] + 128) % 256
            pat = pat.astype(np.uint8)
            if v == 0:
                out.append(png_encode(9, 8, pat.tobytes(), color_type=0))
            elif v == 1:
                out.append(bmp_encode(9, 8, np.repeat(pat, 3).tobytes()))
            else:
                up = np.repeat(np.repeat(pat, 2, axis=0), 2, axis=1)
                out.append(gif_encode(18, 16, up.tobytes()))
        return pd.Series(out)

    return df.withColumn("payload", _synth(F.col("doc_id")))


AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("energies", ArrayType(DoubleType())),
    ]
)


def audio_frame_energies(df: DataFrame, n_frames: int = 65) -> DataFrame:
    """(doc_id, payload) → (doc_id, energies array<double> of
    ``n_frames`` per-frame RMS values) — the audio twin of
    ``luma_grid`` and the substrate of ``audio_fingerprint64``: REAL
    WAV decode (header walk + ``pcm_to_float``: integer PCM, IEEE
    float, µ-law/A-law), samples split into ``n_frames`` equal
    windows (tail remainder trimmed), RMS per window, all in ONE
    Arrow-batched stage. Fusing decode+framing matters exactly like
    the image case: full-resolution sample rows never leave the
    decoding task — the stage emits ``n_frames`` doubles per clip
    regardless of clip length. Non-WAV / unsupported-codec / shorter-
    than-``n_frames`` payloads yield NULL energies (the decode NULL-
    row contract; ``hamming64_pairs`` drops them downstream)."""
    import numpy as np

    if n_frames < 2:
        raise ValueError("n_frames must be >= 2")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta = parse_audio_header(payload)
                if meta is None:
                    rows.append((doc_id, None))
                    continue
                _, ch, rate, bits, _ = meta
                b = bytes(payload)
                i, data, fmt_tag = 12, b"", 1
                while i + 8 <= len(b):
                    cid = b[i : i + 4]
                    clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
                    if cid == b"fmt " and i + 10 <= len(b):
                        fmt_tag = struct.unpack("<H", b[i + 8 : i + 10])[0]
                    if cid == b"data":
                        data = b[i + 8 : i + 8 + clen]
                        break
                    i += 8 + clen + (clen % 2)
                samples = pcm_to_float(data, bits, fmt_tag)
                if samples is None or len(samples) < n_frames:
                    rows.append((doc_id, None))
                    continue
                arr = np.asarray(samples, dtype=np.float64)
                m = (len(arr) // n_frames) * n_frames
                e = np.sqrt(
                    (arr[:m].reshape(n_frames, -1) ** 2).mean(axis=1)
                )
                rows.append((doc_id, [float(x) for x in e]))
            yield pd.DataFrame(rows, columns=["doc_id", "energies"])

    return df.select("doc_id", "payload").mapInPandas(run, AUDIO_ENERGY_SCHEMA)


def audio_fingerprint64(df: DataFrame, n_frames: int = 65) -> DataFrame:
    """Difference hash over the per-frame energy envelope: bit j = 1
    iff RMS(frame j+1) > RMS(frame j) — 64 bits from the default 65
    frames. The audio leg of the near-dup mandate (image leg:
    ``image_dhash64``): energy-delta DIRECTIONS are invariant to
    gain changes (scaling every sample scales every RMS — comparisons
    unchanged) and to PCM re-encoding at a different bit depth
    (quantization error ≪ real inter-frame deltas), and survive mild
    lossy processing up to the banded join's hamming budget. Input
    (doc_id, payload); returns (doc_id, afp bigint), NULL for
    undecodable/short clips. Everything after the energy stage is
    pure column arithmetic (the ``image_dhash64`` discipline — no
    Python touches the hash math); feed the result to
    ``dedup.hamming64_pairs`` for banded candidate pairs."""
    if n_frames != 65:
        raise ValueError("audio_fingerprint64 packs 64 bits: n_frames must be 65")
    g = audio_frame_energies(df, n_frames)
    c = F.col("energies")
    bits = [
        F.when(c[j + 1] > c[j], F.lit(1)).otherwise(F.lit(0)) for j in range(64)
    ]
    return g.select(
        "doc_id",
        F.when(c.isNotNull(), _pack_bits64(bits)).alias("afp"),
    )


def attach_pattern_audio(df: DataFrame) -> DataFrame:
    """Deterministic audio-dedup fixture (the ``attach_pattern_image``
    discipline, synthesis half of the audio-fp DQ): docs form groups
    of three (g = doc_id // 3) sharing one 65-frame amplitude pattern
    p(g, j) = (g·37 + j·53) mod 97 — consecutive frames differ by
    +53 or −44, so every energy comparison is decisive and a SQL
    oracle recomputes the fingerprint BITS in closed form. Each frame
    is 64 samples of a ±amp square wave (RMS of a constant-magnitude
    square wave is exactly |amp|, and /128 and /32768 normalizers are
    exact powers of two — the decoded RMS is bit-exactly the
    amplitude). Variants per group:

    - doc_id % 3 == 0 → 16-bit PCM, amp = (p+1)/100 (the original);
    - doc_id % 3 == 1 → 8-bit PCM RE-ENCODE of the same pattern
      (quantization error ≤ 1/254 ≪ the 0.44 minimum inter-frame
      gap → identical fingerprint, different container);
    - doc_id % 3 == 2 → HALF-GAIN 16-bit (gain invariance) with
      frame 0's amplitude forced to the far side of frame 1's
      (97 or 0 on the p scale) — flips exactly fingerprint bit 0,
      a near-dup at hamming ≤ 1 (for groups where p(g,1) == 0 the
      forced flip is a no-op and the variant stays an exact dup;
      the oracle mirrors the same formula, so both engines agree).

    Arrow scalar UDF; emits real RIFF/WAVE bytes."""

    @F.pandas_udf(BinaryType())
    def _synth(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for d in doc_id:
            d = int(d)
            g, v = d // 3, d % 3
            p = (g * 37 + 53 * np.arange(65)) % 97
            if v == 2:
                p = p.astype(np.int64).copy()
                p[0] = 97 if p[1] > p[0] else 0
            scale = 100.0 if v != 2 else 200.0
            amps = (p + 1) / scale
            bits_ps = 8 if v == 1 else 16
            frames = []
            for a in amps:
                if bits_ps == 16:
                    val = int(round(a * 32767))
                    frame = np.empty(64, dtype="<i2")
                    frame[0::2], frame[1::2] = val, -val
                else:
                    val = int(round(a * 127))
                    frame = np.empty(64, dtype=np.uint8)
                    frame[0::2], frame[1::2] = 128 + val, 128 - val
                frames.append(frame.tobytes())
            data = b"".join(frames)
            byte_rate = 8000 * bits_ps // 8
            fmt = struct.pack(
                "<HHIIHH", 1, 1, 8000, byte_rate, bits_ps // 8, bits_ps
            )
            out.append(
                b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", len(data)) + data
            )
        return pd.Series(out)

    return df.withColumn("payload", _synth(F.col("doc_id")))
