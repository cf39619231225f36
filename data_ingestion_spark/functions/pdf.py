"""Minimal real PDF text extraction — pure stdlib ``zlib``/``re``.

Reference parity anchor: all three reference pipelines PIN
``pypdf==4.0.2`` (ingestion-pipeline.py:49, ingestion-pipeline-
elastic.py:54, website-ingestion-pipeline.py:17) without ever calling
it — the PDF slot is part of the reference's intended surface
(SURVEY §2 T11 notes it explicitly). This module makes that slot
real for the dominant simple-PDF population, the way the sibling
codecs made the image slots real.

Envelope: FlateDecode (zlib), LZWDecode (MSB-first PDF/TIFF flavor
with EarlyChange), ASCIIHexDecode, ASCII85Decode, RunLengthDecode —
including filter CHAINS (``/Filter [/ASCII85Decode /FlateDecode]``) —
and unfiltered content streams; text
shown via the standard operators — ``Tj``, ``'``, ``"``, ``TJ``
(array form with kerning numbers) — inside BT..ET blocks; literal
strings with the full escape set (\\n \\r \\t \\b \\f \\( \\) \\\\
octal \\ddd, line continuations) and hex strings ``<...>``. Bytes
decode as Latin-1 (lossless byte→char; WinAnsi-alike). Out of
envelope — encrypted PDFs, CID/Type0 composite fonts (their show
strings are glyph indices, not character codes), DCT/JBIG2/CCITT
filters, object streams (/ObjStm) — degrades to whatever simple
streams remain, or an empty result; never an exception (corrupt
documents are data at corpus scale).

Line structure: within a BT..ET block, show operators append to the
current line; ``Td``/``TD``/``T*``/``'``/``"`` (the line-advancing
operators) terminate it. One extracted page/stream = the newline-
joined lines of its BT..ET blocks — the same shape a naive
pypdf ``page.extract_text()`` yields for simple PDFs.

Inflation is capped (``max_text_bytes``) the same way the image
codecs cap pixels: a deflate bomb bound-fails instead of
materializing.
"""

from __future__ import annotations

import base64
import re
import zlib

#: Decoded-stream budget per document — text streams are small; a
#: hostile deflate stream claiming GBs bound-fails to truncation.
DEFAULT_MAX_TEXT_BYTES = 1 << 26  # 64 MB of raw content streams

_STREAM_KW_RE = re.compile(rb">>\s*stream\r?\n")


def _stream_dicts(b: bytes):
    """Yield ``(params, data_start)`` per stream: the BALANCED ``<<
    ... >>`` dict preceding each ``stream`` keyword. A non-greedy
    ``<<(.*?)>>`` stops at the FIRST ``>>``, so a nested dict
    (``/DecodeParms << ... >>``) before ``/Filter`` would hide the
    filter and feed compressed bytes to the text walker (ADVICE r08).

    Matching is a single forward pass with an explicit stack
    (close-pos → matching open-pos map), so hostile inputs stay
    LINEAR — each token pointer advances monotonically past its own
    last result, never re-scanning (a per-keyword backward walk was
    cubic-ish on crafted '<<' + many '>> stream' payloads, and a
    naive forward loop that re-finds BOTH tokens each iteration goes
    quadratic once one token type is exhausted; both measured in the
    tens of seconds on sub-MB inputs, violating degrade-never-hang).

    The stream-keyword regex anchors on the LAST two '>' of a run,
    while the greedy tokenizer pairs from the left — so a dict ending
    in a hex string ('/ID<ABCD>>>' → three '>') has its close token
    one-or-more positions left of the regex anchor. The lookup walks
    back through the '>' run to the nearest paired close (bounded by
    the run length, so still linear overall)."""
    match_open: dict[int, int] = {}
    stack: list[int] = []
    next_open = b.find(b"<<")
    next_close = b.find(b">>")
    while next_close != -1:
        if next_open != -1 and next_open < next_close:
            stack.append(next_open)
            next_open = b.find(b"<<", next_open + 2)
        else:
            if stack:
                match_open[next_close] = stack.pop()
            next_close = b.find(b">>", next_close + 2)
    for m in _STREAM_KW_RE.finditer(b):
        k = m.start()
        start = match_open.get(k)
        while start is None and k > 0 and b[k - 1 : k] == b">":
            k -= 1
            start = match_open.get(k)
        if start is not None:
            yield b[start + 2 : m.start()], m.end()


_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")


def _filter_chain(params: bytes) -> list[bytes]:
    """The /Filter entry as an ordered name list ([] if unfiltered)."""
    m = _FILTER_RE.search(params)
    if not m:
        return []
    return re.findall(rb"/([A-Za-z0-9]+)", m.group(1))


def _lzw_decode_pdf(data: bytes, max_out: int) -> bytes | None:
    """PDF/TIFF-flavor LZW (ISO 32000 §7.4.4): MSB-first bit packing,
    8-bit roots, Clear=256, EOD=257, widths 9→12 growing one code
    EARLY (EarlyChange=1, the PDF default). Distinct from the GIF
    twin in functions/pixels.py (LSB-first, variable root width).
    Returns None on corrupt codes; output capped at ``max_out``."""
    CLEAR, EOD = 256, 257
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, acc, nbits = 9, 0, 0
    out = bytearray()
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                table = table[:258]
                width, prev = 9, None
                continue
            if code == EOD:
                return bytes(out)
            if code < len(table) and (code < 256 or table[code]):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                return None
            if prev is not None:
                table.append(prev + entry[:1])
            out += entry
            if len(out) > max_out:
                return bytes(out[:max_out])
            prev = entry
            # EarlyChange: width grows when the NEXT entry would
            # overflow — one code before the table actually fills
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _decode_stream(
    raw: bytes, filters: list[bytes], budget: int
) -> bytes | None:
    """Apply the filter chain in order; None = out of envelope or
    corrupt (caller skips the stream). Every stage is capped at
    ``budget`` decoded bytes (bomb guard applies per-stage, so an
    ASCII85-wrapped deflate bomb can't bypass it)."""
    data = raw
    for f in filters:
        if f == b"FlateDecode" or f == b"Fl":
            try:
                data = zlib.decompressobj().decompress(data, budget)
            except zlib.error:
                return None
        elif f == b"LZWDecode" or f == b"LZW":
            data = _lzw_decode_pdf(data, budget)
            if data is None:
                return None
        elif f == b"ASCIIHexDecode" or f == b"AHx":
            end = data.find(b">")
            hx = re.sub(rb"\s", b"", data if end < 0 else data[:end])
            if len(hx) % 2:
                hx += b"0"
            try:
                data = bytes.fromhex(hx.decode("ascii"))[:budget]
            except (ValueError, UnicodeDecodeError):
                return None
        elif f == b"ASCII85Decode" or f == b"A85":
            s = re.sub(rb"\s", b"", data)
            if s.startswith(b"<~"):
                s = s[2:]
            end = s.find(b"~>")
            if end >= 0:
                s = s[:end]
            try:
                data = base64.a85decode(s)[:budget]
            except ValueError:
                return None
        elif f == b"RunLengthDecode" or f == b"RL":
            out = bytearray()
            i = 0
            while i < len(data) and len(out) <= budget:
                n = data[i]
                if n == 128:
                    break
                if n < 128:
                    out += data[i + 1 : i + 2 + n]
                    i += 2 + n
                else:
                    if i + 1 >= len(data):
                        break
                    out += data[i + 1 : i + 2] * (257 - n)
                    i += 2
            data = bytes(out[:budget])
        else:
            return None  # DCT/JBIG2/CCITT/Crypt: out of envelope
    return data[:budget]

_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
    ord("b"): "\b", ord("f"): "\f",
    ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _parse_literal(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal string starting at the '('; returns
    (text, index past the ')'). Handles nesting, escapes, octal."""
    out = []
    depth = 1
    i += 1
    while i < len(data) and depth:
        c = data[i]
        if c == 0x5C and i + 1 < len(data):  # backslash
            n = data[i + 1]
            if n in _ESCAPES:
                out.append(_ESCAPES[n])
                i += 2
            elif 0x30 <= n <= 0x37:  # octal \d{1,3}
                j = i + 1
                val = 0
                while j < len(data) and j < i + 4 and 0x30 <= data[j] <= 0x37:
                    val = val * 8 + (data[j] - 0x30)
                    j += 1
                out.append(chr(val & 0xFF))
                i = j
            elif n in (0x0A, 0x0D):  # line continuation
                i += 2
                if n == 0x0D and i < len(data) and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: emit the char itself
                out.append(chr(n))
                i += 2
        elif c == 0x28:
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _parse_hex(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``<...>`` hex string starting at the '<'."""
    j = data.find(b">", i)
    if j < 0:
        j = len(data)
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j])
    if len(hx) % 2:
        hx += b"0"  # spec: odd final digit implies trailing 0
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), j + 1
    except ValueError:
        return "", j + 1


def _extract_stream_text(data: bytes) -> str:
    """Text from one decoded content stream: walk BT..ET blocks and
    apply the show / line-advance operators."""
    lines: list[str] = []
    cur: list[str] = []
    pending: list[str] = []  # strings seen since the last operator

    def flush_line() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    i = 0
    in_text = False
    while i < len(data):
        c = data[i]
        if c == 0x28:  # (
            s, i = _parse_literal(data, i)
            if in_text:
                pending.append(s)
            continue
        if c == 0x3C:  # < — hex string (<< dict inside BT is not legal)
            if data[i : i + 2] == b"<<":
                i += 2
                continue
            s, i = _parse_hex(data, i)
            if in_text:
                pending.append(s)
            continue
        if c == 0x25:  # % comment to EOL
            j = data.find(b"\n", i)
            i = len(data) if j < 0 else j + 1
            continue
        m = re.match(rb"[A-Za-z'\"*]+", data[i:])
        if m:
            op = m.group()
            if op == b"BT":
                in_text = True
                pending.clear()
            elif op == b"ET":
                if in_text:
                    cur.extend(pending)
                    pending.clear()
                    flush_line()
                in_text = False
            elif in_text:
                if op == b"Tj":
                    cur.extend(pending)
                    pending.clear()
                elif op == b"TJ":
                    cur.extend(pending)  # array strings, kerning ignored
                    pending.clear()
                elif op in (b"'", b"\""):  # move-to-next-line + show
                    flush_line()
                    cur.extend(pending)
                    pending.clear()
                elif op in (b"Td", b"TD", b"T*"):
                    cur.extend(pending)
                    pending.clear()
                    flush_line()
                else:
                    pending.clear()  # other operators consume operands
            i += len(op)
            continue
        i += 1
    flush_line()
    return "\n".join(lines)


def pdf_extract_text(
    payload: bytes | None, max_text_bytes: int = DEFAULT_MAX_TEXT_BYTES
) -> list[str] | None:
    """PDF → list of per-content-stream extracted texts (empty streams
    skipped, document order). None for non-PDF payloads; corrupt or
    out-of-envelope structures degrade to fewer/empty entries — never
    an exception. Decompressed stream bytes are capped at
    ``max_text_bytes`` cumulatively (deflate-bomb guard)."""
    if payload is None:
        return None
    b = bytes(payload)
    if not b.lstrip()[:5].startswith(b"%PDF-"):
        return None
    texts: list[str] = []
    budget = max_text_bytes
    try:
        for params, start in _stream_dicts(b):
            end = b.find(b"endstream", start)
            if end < 0:
                end = len(b)
            raw = b[start:end].rstrip(b"\r\n")
            if budget <= 0:
                break
            decoded = _decode_stream(raw, _filter_chain(params), budget)
            if decoded is None:
                continue  # unsupported filter or corrupt stream
            data = decoded
            budget -= len(data)
            if b"BT" not in data:
                continue  # not a text-bearing content stream
            text = _extract_stream_text(data)
            if text.strip():
                texts.append(text)
        return texts
    except (ValueError, IndexError, re.error):
        return texts


# ------------------------------------------------------------ encoder


def _esc(s: str) -> bytes:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        .encode("latin-1", errors="replace")
    )


def pdf_encode(pages: list[str]) -> bytes:
    """Minimal REAL single-font PDF writer — the synthesis half of the
    extraction tests: catalog → page tree → one page per entry, each
    with a FlateDecode content stream showing the page's lines via
    Td/Tj, plus a correct xref table and trailer (the file opens in
    real viewers). Newlines in a page become Td line advances."""
    objs: list[bytes] = []  # 1-indexed object bodies

    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    font_num = 3 + 2 * n_pages
    for i, text in enumerate(pages):
        content = bytearray(b"BT /F1 12 Tf 72 720 Td ")
        for line in text.split("\n"):
            content += b"(" + _esc(line) + b") Tj 0 -14 Td "
        content += b"ET"
        flate = zlib.compress(bytes(content))
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {4 + 2 * i} 0 R >>".encode()
        )
        objs.append(
            f"<< /Length {len(flate)} /Filter /FlateDecode >>\nstream\n".encode()
            + flate + b"\nendstream"
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_off}\n%%EOF\n".encode()
    )
    return bytes(out)


def extract_pdf_text_stage(df, strict: bool = False):
    """Spark stage: payload BINARY → one row per text-bearing content
    stream (doc_id, stream_idx, text), Arrow-batched mapInPandas —
    the PDF twin of clean_html for the document-loading slot the
    reference reserved (pypdf pinned, unused). Non-PDF payloads yield
    no rows (or raise under ``strict=True``)."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("stream_idx", IntegerType()),
            StructField("text", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for doc_id, payload in zip(pdf_batch["doc_id"], pdf_batch["payload"]):
                texts = pdf_extract_text(payload)
                if texts is None:
                    if strict:
                        raise ValueError(f"doc {doc_id}: not a PDF payload")
                    continue
                for si, t in enumerate(texts):
                    rows.append((doc_id, si, t))
            yield pd.DataFrame(rows, columns=["doc_id", "stream_idx", "text"])

    return df.select("doc_id", "payload").mapInPandas(run, schema)
