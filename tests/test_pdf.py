"""PDF text extraction (functions/pdf.py) — the document-loading slot
the reference reserved (pypdf==4.0.2 pinned in all three pipelines,
never called). Strategy mirrors the image codecs: round-trips through
our own writer PLUS hand-built content streams with independently
known expected text, negatives, a deflate-bomb guard, and fuzz."""

from __future__ import annotations

import random
import zlib

import pytest

from data_ingestion_spark.functions.pdf import (
    pdf_encode,
    pdf_extract_text,
)


def _wrap_stream(content: bytes, flate: bool = True) -> bytes:
    body = zlib.compress(content) if flate else content
    filt = b" /Filter /FlateDecode" if flate else b""
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode() + filt
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF"
    )


def test_roundtrip_multipage():
    pages = ["Hello (world) \\ done", "Second page\nline two\nline three", ""]
    got = pdf_extract_text(pdf_encode(pages))
    assert got == [p for p in pages if p.strip()]


def test_xref_offsets_are_real():
    # every xref entry must point at the matching "N 0 obj" header —
    # the writer's offsets are load-bearing for real viewers
    enc = pdf_encode(["a", "b"])
    xref = enc[enc.rindex(b"xref") :]
    entries = [
        line for line in xref.split(b"\n")[2:] if line.endswith(b" n ")
    ]
    for num, line in enumerate(entries, start=1):
        off = int(line.split()[0])
        assert enc[off:].startswith(f"{num} 0 obj".encode()), num


def test_hand_built_operators():
    # Tj + TJ array (kerning numbers ignored) + quote operator + hex
    content = (
        b"BT (A) Tj [ (B) -120 (C) ] TJ T* (next line) Tj "
        b"<48656C6C6F> Tj ET"
    )
    got = pdf_extract_text(_wrap_stream(content))
    assert got == ["ABC\nnext lineHello"]
    # ' moves to next line then shows
    got = pdf_extract_text(_wrap_stream(b"BT (one) Tj (two) ' ET"))
    assert got == ["one\ntwo"]


def test_literal_string_escapes():
    content = b"BT (par\\050en\\051 \\n tab\\t oct\\101 nest (in) out) Tj ET"
    got = pdf_extract_text(_wrap_stream(content))
    assert got == ["par(en) \n tab\t octA nest (in) out"]


def test_uncompressed_and_nontext_streams():
    assert pdf_extract_text(_wrap_stream(b"BT (plain) Tj ET", flate=False)) == ["plain"]
    # image-ish stream without BT contributes nothing
    assert pdf_extract_text(_wrap_stream(b"\x00\x01binarystuff", flate=False)) == []
    # unsupported filter skipped, not crashed
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /DCTDecode >>\nstream\n\xff\xd8junk"
        b"\nendstream\nendobj\n%%EOF"
    )
    assert pdf_extract_text(raw) == []


def test_negatives_and_bomb():
    assert pdf_extract_text(None) is None
    assert pdf_extract_text(b"not a pdf") is None
    assert pdf_extract_text(b"%PDF-1.7\n%%EOF") == []
    # deflate bomb: a stream inflating far past the budget truncates at
    # the cap instead of materializing (same guard as the image codecs)
    bomb_content = b"BT " + b"(x) Tj " * 1_000_000 + b"ET"  # ~7 MB raw
    got = pdf_extract_text(_wrap_stream(bomb_content), max_text_bytes=64)
    assert got == [] or all(len(t) < 100 for t in got)


def test_fuzz_never_raises():
    rng = random.Random(2024)
    base = [
        pdf_encode(["Hello world", "page two\nmore"]),
        _wrap_stream(b"BT [ (a) 5 (b) ] TJ (c) ' <4142> Tj ET"),
    ]
    for payload in base:
        for _ in range(1500):
            b = bytearray(payload)
            mode = rng.randrange(3)
            if mode in (0, 2):
                for _ in range(rng.randrange(1, 9)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            if mode in (1, 2):
                b = b[: rng.randrange(1, len(b) + 1)]
            r = pdf_extract_text(bytes(b))
            assert r is None or isinstance(r, list)


def test_spark_stage(spark):
    from data_ingestion_spark.functions.pdf import extract_pdf_text_stage

    enc = pdf_encode(["doc zero text", "and page two"])
    df = spark.createDataFrame(
        [(0, enc), (1, b"not a pdf"), (2, None)], "doc_id long, payload binary"
    )
    rows = extract_pdf_text_stage(df).collect()
    got = {(r["doc_id"], r["stream_idx"]): r["text"] for r in rows}
    assert got == {(0, 0): "doc zero text", (0, 1): "and page two"}
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((Py4JJavaError, PythonException)):
        extract_pdf_text_stage(df, strict=True).collect()
