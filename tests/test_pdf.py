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
    import base64 as b64

    rng = random.Random(2024)
    content = b"BT (fuzz seed text) Tj T* (line) Tj ET"
    base = [
        pdf_encode(["Hello world", "page two\nmore"]),
        _wrap_stream(b"BT [ (a) 5 (b) ] TJ (c) ' <4142> Tj ET"),
        # r09: every new filter path fuzzed too — corrupt LZW codes,
        # truncated a85 groups, odd hex, RLE runs past EOD must all
        # degrade, never raise
        _wrap_filters(_lzw_encode_pdf(content), b"/LZWDecode"),
        _wrap_filters(b64.a85encode(content) + b"~>", b"/ASCII85Decode"),
        _wrap_filters(content.hex().encode() + b">", b"/ASCIIHexDecode"),
        _wrap_filters(
            b64.a85encode(zlib.compress(content)) + b"~>",
            b"[/ASCII85Decode /FlateDecode]",
        ),
        # hex string closing the dict: mutations around the '>>>' run
        # exercise the walk-back matcher (r09 second self-review)
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /ID<ABCD>>>\nstream\n"
        + zlib.compress(content) + b"\nendstream\nendobj\n%%EOF",
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


# ---------------------------------------------------------- r09 filters


def _wrap_filters(body: bytes, filt: bytes) -> bytes:
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode()
        + b" /Filter " + filt
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF"
    )


def _lzw_encode_pdf(data: bytes) -> bytes:
    """Independent MSB-first PDF LZW encoder (EarlyChange=1) — the
    test-side half of the round-trip, written from ISO 32000 §7.4.4,
    not from the decoder."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    emit(256, width)  # leading Clear, as real writers do
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = nxt
        nxt += 1
        # EarlyChange: the ENCODER widens one code early too
        if nxt + 1 > (1 << width) and width < 12:
            width += 1
        if nxt == 4095:
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(257, width)  # EOD
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_decode_roundtrip():
    content = b"BT (lzw text here) Tj T* (line two) Tj ET"
    enc = _lzw_encode_pdf(content)
    got = pdf_extract_text(_wrap_filters(enc, b"/LZWDecode"))
    assert got == ["lzw text here\nline two"]
    # long repetitive stream exercises width growth + table refill
    long = b"BT (" + b"abcab" * 3000 + b") Tj ET"
    got = pdf_extract_text(_wrap_filters(_lzw_encode_pdf(long), b"/LZWDecode"))
    assert got == ["abcab" * 3000]


def test_asciihex_ascii85_runlength():
    content = b"BT (hex ok) Tj ET"
    hx = content.hex().encode() + b">"
    assert pdf_extract_text(_wrap_filters(hx, b"/ASCIIHexDecode")) == ["hex ok"]
    import base64 as b64

    a85 = b64.a85decode  # noqa: F841  (import check)
    enc85 = b64.a85encode(b"BT (eighty five) Tj ET") + b"~>"
    assert pdf_extract_text(_wrap_filters(enc85, b"/ASCII85Decode")) == ["eighty five"]
    # RunLength: literal run (n<128 -> n+1 bytes) + replicate (257-n)
    rl_content = b"BT (aaaaaaaaaaaab) Tj ET"
    # encode by hand: literal "BT (" then 12x'a' replicated, literal rest
    rl = (
        bytes([3]) + b"BT (" + bytes([257 - 12]) + b"a"
        + bytes([len(b"b) Tj ET") - 1]) + b"b) Tj ET" + bytes([128])
    )
    assert pdf_extract_text(_wrap_filters(rl, b"/RunLengthDecode")) == [
        "aaaaaaaaaaaab"
    ]


def test_filter_chain_a85_flate():
    import base64 as b64

    content = b"BT (chained filters) Tj ET"
    body = b64.a85encode(zlib.compress(content)) + b"~>"
    got = pdf_extract_text(
        _wrap_filters(body, b"[/ASCII85Decode /FlateDecode]")
    )
    assert got == ["chained filters"]
    # unsupported member anywhere in the chain -> stream skipped
    got = pdf_extract_text(
        _wrap_filters(body, b"[/ASCII85Decode /DCTDecode]")
    )
    assert got == []


def test_nested_dict_before_filter():
    # ADVICE r08: a nested dict (/DecodeParms << ... >>) BEFORE
    # /Filter must not hide the filter from the stream-dict capture
    content = b"BT (nested dict ok) Tj ET"
    body = zlib.compress(content)
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /DecodeParms << /Columns 4 /Predictor 1 >> "
        b"/Length " + str(len(body)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + body
        + b"\nendstream\nendobj\n%%EOF"
    )
    assert pdf_extract_text(raw) == ["nested dict ok"]
    # and with the compressed bytes containing a spurious 'BT': the
    # filter is now seen, so no garbage rows can leak out
    assert b"BT" not in zlib.compress(b"x")  # sanity of the premise below


def test_lzw_bomb_capped():
    # highly compressible LZW stream inflating past the budget
    # truncates instead of materializing
    long = b"BT (" + b"z" * 5_000_000 + b") Tj ET"
    enc = _lzw_encode_pdf(long)
    got = pdf_extract_text(_wrap_filters(enc, b"/LZWDecode"), max_text_bytes=64)
    assert got == [] or all(len(t) < 100 for t in got)


def test_hostile_dict_stream_pattern_is_linear():
    """r09 self-review (two iterations): the per-keyword backward
    balance walk was cubic-ish (47 KB -> 20 s), and the first forward
    rewrite re-found both tokens per iteration — quadratic once one
    token type is exhausted (2 MB -> 63 s). The cached-pointer matcher
    must handle ALL the adversarial shapes at MB scale in under a
    second each."""
    import time

    hostiles = [
        b"%PDF-1.4\n<<" + b">>\nstream\nBT (x) Tj ET\nendstream\n" * 120_000,
        b"%PDF-1.4\n" + b"<<" * 200_000 + b">>",
        b"%PDF-1.4\n<<" + b">" * 1_000_000 + b"stream\nX\nendstream",
    ]
    for hostile in hostiles:
        t0 = time.perf_counter()
        r = pdf_extract_text(hostile)
        assert time.perf_counter() - t0 < 1.5, len(hostile)
        assert r is None or isinstance(r, list)


def test_hex_string_closing_dict_still_extracts():
    """r09 self-review: a dict whose last value is a hex string
    ('/ID<ABCD>>>' — a three-'>' run) anchors the stream-keyword regex
    one position right of the greedy close token; the run walk-back
    must still find the dict (the first forward rewrite silently
    dropped such streams)."""
    body = zlib.compress(b"BT (hexdict ok) Tj ET")
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(body)).encode() + b" /ID<ABCD>>>\nstream\n" + body
        + b"\nendstream\nendobj\n%%EOF"
    )
    assert pdf_extract_text(raw) == ["hexdict ok"]
