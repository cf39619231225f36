"""WARC (ISO 28500) source — bulk web-archive ingestion, the
Common Crawl-shaped path into the reference's web corpus.

Reference anchor: the reference acquires web content by LIVE fetch
(WebBaseLoader over a URL frontier, ingestion-pipeline.py:166-205;
the website pipeline's crawl step, website-ingestion-pipeline.py).
That shape re-fetches every page on every run; at 100 TB nobody
re-crawls — you read an existing crawl: WARC shards (``.warc.gz``,
~1 GiB each, every record its own gzip member per the spec's
storage recommendation). This module is that source, stdlib-only
(zlib), with the same stage contract as the media codecs:
Arrow-batched ``mapInPandas``, bomb-bounded, degrade-never-crash —
a corrupt record is data, not an exception.

The 100 TB story:
- One ``.warc.gz`` file = one task. gzip is not splittable, and that
  is fine: crawl shards are sized ~1 GiB precisely so file-granular
  parallelism suffices (100 TB ≈ 100k files ≈ 100k tasks — more than
  any executor fleet's slot count).
- The parse stage is a narrow map — zero shuffles. Downstream
  clean/split/chunk/embed reuse the existing ingestion plan
  unchanged (plans/ingestion.py), so WARC input costs exactly one
  extra map stage over the live-fetch path.
- Per-record decompression is capped (``max_record_bytes``) and the
  member walk feeds zlib in bounded 1 MiB slices (no O(blob²) tail
  copies, no unbounded inflate): a gzip bomb degrades to one
  truncated record and a stopped file, never an executor OOM.
"""

from __future__ import annotations

import codecs
import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_GZ_MAGIC = b"\x1f\x8b"
_FEED = 1 << 20  # compressed bytes handed to zlib per call

#: per-record caps — a record block (and its HTTP body after
#: content-decoding) may not exceed this many bytes; beyond it the
#: record is marked truncated and, for decompression bombs, the rest
#: of the file is abandoned (we cannot find the next member boundary
#: without inflating through the bomb).
DEFAULT_MAX_RECORD_BYTES = 8 << 20
DEFAULT_MAX_RECORDS = 100_000


# ---------------------------------------------------------------------
# gzip member walk (bounded)
# ---------------------------------------------------------------------


def iter_gzip_members(blob: bytes, max_member_bytes: int, max_members: int):
    """Yield ``(decompressed_bytes, truncated)`` per gzip member.

    Feeds zlib in ``_FEED``-sized slices so neither the input tail nor
    the output is ever copied unbounded: the only per-member copies
    are ``unused_data`` (≤ one feed slice) and the member's own output
    (capped at ``max_member_bytes``). A member that inflates past the
    cap yields its prefix with ``truncated=True`` and STOPS the walk —
    the next member boundary is unreachable without inflating through
    the bomb, and at corpus scale one abandoned shard beats one dead
    executor.
    """
    mv = memoryview(blob)
    pos = 0
    pending: bytes | memoryview = b""
    members = 0
    while members < max_members:
        if not pending and pos >= len(mv):
            return
        if pending and len(pending) < 2 and pos < len(mv):
            # a member boundary landed 1 byte before a feed-slice
            # boundary: unused_data holds half the next magic — top up
            # before the check or valid members get dropped
            take = bytes(mv[pos : pos + 2 - len(pending)])
            pending = bytes(pending) + take
            pos += len(take)
        head = bytes(pending[:2]) if pending else bytes(mv[pos : pos + 2])
        if not head.startswith(_GZ_MAGIC):
            return  # trailing garbage: clean stop, members so far stand
        d = zlib.decompressobj(31)
        out = bytearray()
        truncated = False
        while True:
            if not pending:
                if pos >= len(mv):
                    truncated = True  # EOF mid-member
                    break
                pending = mv[pos : pos + _FEED]
                pos += len(pending)
            try:
                out += d.decompress(pending, max_member_bytes + 1 - len(out))
            except zlib.error:
                yield bytes(out), True
                return
            # cap check BEFORE the eof check: a member inflating to
            # exactly cap+1 bytes with eof landing on the same
            # decompress call must be flagged truncated, not yielded
            # untruncated at cap+1
            if len(out) > max_member_bytes:
                yield bytes(out[:max_member_bytes]), True
                return  # bomb: abandon the file past this record
            if d.eof:
                pending = d.unused_data  # ≤ one feed slice, next member
                break
            pending = d.unconsumed_tail
        yield bytes(out), truncated
        if truncated:
            return
        members += 1


# ---------------------------------------------------------------------
# WARC record grammar
# ---------------------------------------------------------------------


def _parse_headers(raw: bytes) -> dict[str, str]:
    """``Name: value`` lines to a lower-cased dict (latin-1 decode —
    WARC named fields are ASCII; anything else survives unmangled)."""
    headers: dict[str, str] = {}
    for line in raw.split(b"\r\n"):
        for piece in line.split(b"\n"):  # tolerate bare-LF writers
            if b":" in piece:
                name, _, value = piece.partition(b":")
                headers[name.strip().lower().decode("latin-1")] = value.strip().decode(
                    "latin-1"
                )
    return headers


def iter_warc_records_in_buffer(buf: bytes, max_record_bytes: int, max_records: int):
    """Yield ``(headers, block, truncated)`` for each WARC record in a
    decompressed buffer (a gzip member may hold one record — the spec
    layout — or a whole concatenated file)."""
    pos = 0
    n = 0
    while n < max_records:
        while buf[pos : pos + 2] == b"\r\n":
            pos += 2
        while buf[pos : pos + 1] == b"\n":
            pos += 1
        if pos >= len(buf):
            return
        if buf[pos : pos + 5] != b"WARC/":
            return  # not a record start: stop, records so far stand
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            yield _parse_headers(buf[pos:]), b"", True
            return
        headers = _parse_headers(buf[pos:hdr_end])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            clen = -1
        body_start = hdr_end + 4
        if clen < 0:
            yield headers, b"", True
            return  # cannot find the next record without a length
        take = min(clen, max_record_bytes)
        block = buf[body_start : body_start + take]
        truncated = take < clen or len(block) < take
        yield headers, block, truncated
        pos = body_start + clen  # skip the full declared length
        n += 1


def iter_warc_records(
    blob: bytes,
    max_record_bytes: int = DEFAULT_MAX_RECORD_BYTES,
    max_records: int = DEFAULT_MAX_RECORDS,
):
    """Yield ``(headers, block, truncated)`` from raw shard bytes —
    gzip multi-member (``.warc.gz``) or plain concatenated WARC."""
    if blob[:2] == _GZ_MAGIC:
        emitted = 0
        for member, m_trunc in iter_gzip_members(blob, max_record_bytes, max_records):
            for headers, block, truncated in iter_warc_records_in_buffer(
                member, max_record_bytes, max_records - emitted
            ):
                yield headers, block, truncated or m_trunc
                emitted += 1
                if emitted >= max_records:
                    return
    else:
        yield from iter_warc_records_in_buffer(blob, max_record_bytes, max_records)


# ---------------------------------------------------------------------
# HTTP response payload (the block of WARC-Type: response records)
# ---------------------------------------------------------------------


def _dechunk(body: bytes, max_body_bytes: int) -> tuple[bytes, bool]:
    """Decode Transfer-Encoding: chunked. Malformed framing returns
    what decoded so far with ``truncated=True``."""
    out = bytearray()
    pos = 0
    while True:
        line_end = body.find(b"\r\n", pos)
        if line_end < 0:
            return bytes(out), True
        size_token = body[pos:line_end].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            return bytes(out), True
        if size < 0:  # int('-3', 16) parses; negative framing is hostile
            return bytes(out), True
        if size == 0:
            return bytes(out), False  # trailer ignored
        chunk_start = line_end + 2
        chunk = body[chunk_start : chunk_start + size]
        out += chunk
        if len(chunk) < size or len(out) > max_body_bytes:
            return bytes(out[:max_body_bytes]), True
        pos = chunk_start + size + 2  # skip CRLF after chunk data


def _content_decode(body: bytes, encoding: str, max_body_bytes: int) -> tuple[bytes, bool]:
    """Decode Content-Encoding (gzip / x-gzip / deflate), bounded.
    Undecodable bodies come back RAW with ``truncated=True`` — at
    corpus scale mislabeled encodings are routine and raw bytes beat
    dropped records."""
    enc = encoding.strip().lower()
    if enc in ("", "identity"):
        return body, False
    if enc in ("gzip", "x-gzip", "deflate"):
        wbits = 31 if enc != "deflate" else 15
        try:
            d = zlib.decompressobj(wbits)
            out = d.decompress(body, max_body_bytes + 1)
            if len(out) > max_body_bytes:
                return out[:max_body_bytes], True
            # a clean decode reaches stream end; a truncated member
            # decodes partial output with eof False — flag it
            return out, not d.eof
        except zlib.error:
            if enc == "deflate":
                # some servers send raw-deflate under the name
                try:
                    d = zlib.decompressobj(-15)
                    out = d.decompress(body, max_body_bytes + 1)
                    if len(out) > max_body_bytes:
                        return out[:max_body_bytes], True
                    return out, not d.eof
                except zlib.error:
                    pass
            return body, True
    return body, True  # br etc. need external codecs: raw + flag


def parse_http_response(
    block: bytes, max_body_bytes: int = DEFAULT_MAX_RECORD_BYTES
) -> tuple[int | None, str | None, bytes, bool]:
    """Parse the HTTP response inside a WARC response block.

    Returns ``(status, content_type, body, truncated)`` with the body
    transfer-decoded (chunked) then content-decoded (gzip/deflate) —
    the same order the wire applies them in reverse. Anything
    malformed degrades: status None / raw bytes / truncated flag,
    never an exception.
    """
    split = block.find(b"\r\n\r\n")
    if split < 0:
        return None, None, b"", True
    head, body = block[:split], block[split + 4 :]
    lines = head.split(b"\r\n")
    status: int | None = None
    parts = lines[0].split(None, 2)
    if len(parts) >= 2 and parts[0][:5] == b"HTTP/":
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    headers = _parse_headers(b"\r\n".join(lines[1:]))
    truncated = False
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body, truncated = _dechunk(body, max_body_bytes)
    else:
        clen = headers.get("content-length")
        if clen is not None:
            try:
                n = int(clen)
                if n < 0:  # negative length: body[:n] would CHOP the tail
                    truncated = True
                elif n < len(body):
                    body = body[:n]
                elif n > len(body):
                    truncated = True
            except ValueError:
                pass
    body, enc_trunc = _content_decode(
        body, headers.get("content-encoding", ""), max_body_bytes
    )
    if len(body) > max_body_bytes:
        body, truncated = body[:max_body_bytes], True
    return status, headers.get("content-type"), body, truncated or enc_trunc


# ---------------------------------------------------------------------
# Spark stage
# ---------------------------------------------------------------------

WARC_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("record_idx", IntegerType()),
        StructField("record_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("record_id", StringType()),
        StructField("http_status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("body", BinaryType()),
        StructField("truncated", BooleanType()),
    ]
)


def warc_records(
    df: DataFrame,
    payload_col: str = "content",
    path_col: str = "path",
    max_record_bytes: int = DEFAULT_MAX_RECORD_BYTES,
    max_records: int = DEFAULT_MAX_RECORDS,
) -> DataFrame:
    """Explode WARC shard blobs into one row per record.

    Input: one row per shard (``binaryFile`` rows, or any (key, bytes)
    pair — pass ``path_col``/``payload_col``). Output: WARC_SCHEMA,
    with ``http_status``/``content_type``/``body`` filled for
    ``response`` records (HTTP parse incl. dechunk + gunzip) and NULL
    body for the rest (warcinfo/request/metadata ride along for
    lineage but carry no corpus payload). Narrow map — no shuffle; at
    scale, partition count follows shard-file count.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[path_col], pdf[payload_col]):
                blob = bytes(payload or b"")
                for i, (headers, block, trunc) in enumerate(
                    iter_warc_records(blob, max_record_bytes, max_records)
                ):
                    rtype = headers.get("warc-type")
                    status = ctype = body = None
                    if rtype == "response" and not trunc:
                        status, ctype, body, http_trunc = parse_http_response(
                            block, max_record_bytes
                        )
                        trunc = trunc or http_trunc
                    rows.append(
                        (
                            str(key),
                            i,
                            rtype,
                            headers.get("warc-target-uri"),
                            headers.get("warc-date"),
                            headers.get("warc-record-id"),
                            status,
                            ctype,
                            body,
                            bool(trunc),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in WARC_SCHEMA.fields])

    return df.select(
        F.col(path_col).cast("string").alias(path_col), F.col(payload_col)
    ).mapInPandas(run, WARC_SCHEMA)


# ---------------------------------------------------------------------
# charset-aware body decode
# ---------------------------------------------------------------------

#: charset= parameter in a Content-Type header value
_CT_CHARSET_RE = re.compile(r"charset\s*=\s*[\"']?\s*([A-Za-z0-9_.:\-]+)", re.I)
#: <meta charset=...> / <meta http-equiv content="...charset=..."> in
#: the document head (the sniff window, decoded permissively)
_META_CHARSET_RE = re.compile(
    r"<meta[^>]{0,200}?charset\s*=\s*[\"']?\s*([A-Za-z0-9_.:\-]+)", re.I
)
_META_SNIFF_BYTES = 1024

#: label normalization, WHATWG-style: browsers decode iso-8859-1 /
#: ascii-labelled pages as windows-1252 (the superset real pages use —
#: 0x80–0x9F carry €/™/… there, control chars in true latin-1)
_CHARSET_ALIASES = {
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "cp1252": "windows-1252",
    "x-sjis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "gb2312": "gbk",  # WHATWG maps the gb2312 label to GBK
    "utf8": "utf-8",
}


def _normalize_charset(label: str) -> str | None:
    """Charset label → Python codec name, or None if unknown (an
    unknown declared label falls through to content sniffing rather
    than crashing the record)."""
    name = _CHARSET_ALIASES.get(label.strip().lower(), label.strip().lower())
    try:
        codecs.lookup(name)
    except LookupError:
        return None
    return name


def resolve_charset(body: bytes, content_type: str | None) -> str:
    """Pick the decode charset for an HTTP body, browser-style
    precedence: BOM > Content-Type charset param > <meta charset>
    sniff (first 1 KiB) > strict-UTF-8 probe > windows-1252.

    Real crawls are 15–20%% legacy-charset (windows-1252, Shift-JIS,
    GBK, …) — decoding those as UTF-8 turns every non-ASCII byte into
    replacement-char mojibake that then feeds the clean/chunk/embed
    tail. Reference anchor: the live path delegates this to
    ``requests``' charset handling (website-local/main.py:22-49);
    the WARC path must do it itself.
    """
    if body.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    # UTF-32 BOMs BEFORE UTF-16: BOM_UTF32_LE starts with the
    # UTF-16-LE BOM bytes and would misdetect otherwise
    if body.startswith(codecs.BOM_UTF32_LE):
        return "utf-32-le"
    if body.startswith(codecs.BOM_UTF32_BE):
        return "utf-32-be"
    if body.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le"
    if body.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be"
    m = _CT_CHARSET_RE.search(content_type or "")
    if m:
        name = _normalize_charset(m.group(1))
        if name:
            return name
    head = body[:_META_SNIFF_BYTES].decode("latin-1", "replace")
    m = _META_CHARSET_RE.search(head)
    if m:
        name = _normalize_charset(m.group(1))
        if name:
            return name
    try:
        body.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def decode_http_body(body: bytes, content_type: str | None) -> tuple[str, str]:
    """(decoded text, charset used). Decoding never raises: a declared
    charset with stray invalid sequences degrades per-char
    (errors='replace'), matching browser behavior — and BOM bytes are
    consumed, not emitted as a U+FEFF prefix char."""
    charset = resolve_charset(body, content_type)
    if charset in ("utf-16-le", "utf-16-be"):
        body = body[2:]  # strip the BOM; -le/-be codecs keep it otherwise
    elif charset in ("utf-32-le", "utf-32-be"):
        body = body[4:]
    return body.decode(charset, "replace"), charset


def warc_response_docs(records: DataFrame, with_charset: bool = False) -> DataFrame:
    """response records → document rows ready for the HTML pipeline:
    2xx responses only, body decoded CHARSET-AWARE (BOM / Content-Type
    param / meta sniff / UTF-8 probe / windows-1252 — see
    ``resolve_charset``) in one Arrow-batched stage. Columns
    (url, html) line up with the live-fetch path's page rows so
    clean/split/chunk/embed apply unchanged; ``with_charset=True``
    adds the detected charset column (ingest observability: the
    legacy-charset fraction of a crawl is a quality dial worth
    tracking)."""

    @F.pandas_udf("html string, charset string")
    def _decode(body: pd.Series, ctype: pd.Series) -> pd.DataFrame:
        out = [
            decode_http_body(bytes(b) if b is not None else b"", c)
            for b, c in zip(body, ctype)
        ]
        return pd.DataFrame(out, columns=["html", "charset"])

    docs = (
        records.filter(
            (F.col("record_type") == "response")
            & F.col("http_status").between(200, 299)
            & ~F.col("truncated")
        )
        .select(
            F.col("target_uri").alias("url"),
            _decode(F.col("body"), F.col("content_type")).alias("__dec"),
        )
        .select("url", "__dec.html", "__dec.charset")
    )
    return docs if with_charset else docs.drop("charset")


# ---------------------------------------------------------------------
# writer half — archival sink AND the deterministic fixture encoder
# (same role png_bytes/jpeg_bytes play for the pixel DQ: an
# independent straightforward writer whose output the production
# parser must decode back to oracle-predictable values)
# ---------------------------------------------------------------------


def build_warc_record(
    rtype: str,
    block: bytes,
    uri: str | None = None,
    date: str = "2026-01-01T00:00:00Z",
    record_id: str = "<urn:uuid:0>",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Date: " + date.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(block)).encode(),
    ]
    if uri is not None:
        lines.insert(2, b"WARC-Target-URI: " + uri.encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + block + b"\r\n\r\n"


def gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (zlib's default gzip header:
    mtime 0 — byte-stable across runs, unlike gzip.compress)."""
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    return c.compress(data) + c.flush()


def http_response_block(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    chunked: bool = False,
    gzip_body: bool = False,
    chunk_size: int = 37,
) -> bytes:
    """An HTTP/1.1 response message: optionally content-encoded
    (gzip) then transfer-encoded (chunked) — the wire order."""
    payload = gzip_member(body) if gzip_body else body
    head = [f"HTTP/1.1 {status} OK".encode(), b"Content-Type: " + content_type.encode()]
    if gzip_body:
        head.append(b"Content-Encoding: gzip")
    if chunked:
        head.append(b"Transfer-Encoding: chunked")
        wire = bytearray()
        for i in range(0, len(payload), chunk_size):
            chunk = payload[i : i + chunk_size]
            wire += f"{len(chunk):X}\r\n".encode() + chunk + b"\r\n"
        wire += b"0\r\n\r\n"
        payload = bytes(wire)
    else:
        head.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + payload


def synthetic_warc_gz(doc_id: int, text: str) -> bytes:
    """The fixture shard for one document: warcinfo + request +
    response, each its own gzip member (the spec storage layout).
    Encoding rotates on doc_id so the DQ exercises every decode path:
    %3==0 → chunked, %5==0 → gzip content-encoding (both when both
    divide — dechunk THEN gunzip)."""
    uri = f"https://ex.com/d/{doc_id}"
    rid = f"<urn:uuid:{doc_id:032x}>"
    info = build_warc_record(
        "warcinfo", b"software: synthetic\r\n", content_type="application/warc-fields",
        record_id=rid,
    )
    req = build_warc_record(
        "request",
        b"GET /d/" + str(doc_id).encode() + b" HTTP/1.1\r\nHost: ex.com\r\n\r\n",
        uri=uri,
        content_type="application/http; msgtype=request",
        record_id=rid,
    )
    resp_block = http_response_block(
        text.encode("utf-8"),
        chunked=(doc_id % 3 == 0),
        gzip_body=(doc_id % 5 == 0),
    )
    resp = build_warc_record("response", resp_block, uri=uri, record_id=rid)
    return gzip_member(info) + gzip_member(req) + gzip_member(resp)


#: charset-rotation fixture matrix (doc_id % 4): each row is
#: (marker prepended to the ASCII doc text, python codec to encode
#: with, Content-Type header sent, charset the decoder must DETECT).
#: Case 0 declares the iso-8859-1 LABEL (the alias browsers — and we —
#: decode as windows-1252); case 1 declares only via <meta> (header
#: carries no param); case 2 is BOM-only; case 3 is undeclared
#: non-ASCII UTF-8 (the strict-probe path).
_CHARSET_FIXTURE = [
    ("£é¥ ", "cp1252", "text/html; charset=iso-8859-1", "windows-1252"),
    ('<meta charset="shift_jis">日本語 ', "shift_jis", "text/html", "shift_jis"),
    ("Ünïcode ", "utf-8-sig", "text/html", "utf-8-sig"),
    ("Çafé ", "utf-8", "text/html", "utf-8"),
]


def synthetic_warc_gz_charset(doc_id: int, text: str) -> bytes:
    """Charset-rotating variant of ``synthetic_warc_gz``: the response
    body is a non-ASCII marker + the doc text, encoded in a legacy or
    BOM'd charset per ``_CHARSET_FIXTURE``, with the declaration
    arriving via header param / meta tag / BOM / not at all — on top
    of the same chunked/gzip transfer rotation."""
    marker, codec, ctype, _ = _CHARSET_FIXTURE[doc_id % 4]
    uri = f"https://ex.com/d/{doc_id}"
    rid = f"<urn:uuid:{doc_id:032x}>"
    resp_block = http_response_block(
        (marker + text).encode(codec),
        content_type=ctype,
        chunked=(doc_id % 3 == 0),
        gzip_body=(doc_id % 5 == 0),
    )
    resp = build_warc_record("response", resp_block, uri=uri, record_id=rid)
    return gzip_member(resp)


def attach_synthetic_warc(df: DataFrame, charsets: bool = False) -> DataFrame:
    """DQ encode stage: (doc_id, text) → a real .warc.gz blob per row
    (Arrow scalar UDF, batch-wise); ``charsets=True`` switches to the
    charset-rotation single-record encoder."""
    synth = synthetic_warc_gz_charset if charsets else synthetic_warc_gz

    @F.pandas_udf(BinaryType())
    def _synth(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        return pd.Series(
            [synth(int(d), str(t)) for d, t in zip(doc_id, text)]
        )

    return df.withColumn("payload", _synth(F.col("doc_id"), F.col("text")))


def write_warc_shards(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    body_col: str = "html",
    shards: int | None = None,
) -> None:
    """Archive (url, body) rows as ``.warc.gz`` shards — the writer
    half of the source: one shard per partition, every record its own
    gzip member (the same layout the reader walks), so a corpus
    snapshot round-trips through ``warc_records`` bit-exactly.

    At 100 TB this is the training-data snapshot format: shard count
    = partition count (pass ``shards`` to repartition first — target
    ~1 GiB each), writes are embarrassingly parallel (one file per
    task, no shuffle beyond the optional repartition), and a re-read
    parallelizes file-granular exactly like a crawl. Shard names are
    partition-indexed and deterministic for a fixed partitioning.

    Executor-side file I/O via ``foreachPartition`` — rows stream
    through one open file per task, never accumulating a partition
    in memory. ``out_dir`` must be storage the EXECUTORS see as one
    namespace (a DFS/NFS mount; local mode qualifies) — on an
    object-store cluster, swap the ``open``/``os.replace`` pair for
    a multipart upload inside ``write_partition``; the record
    streaming around it is unchanged.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    if shards is not None:
        df = df.repartition(shards)
    rows = df.select(
        F.col(url_col).alias("url"), F.col(body_col).cast("string").alias("body")
    )

    def write_partition(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        tmp = path + ".inprogress"
        wrote = False
        with open(tmp, "wb") as f:
            for row in it:
                body = (row.body or "").encode("utf-8")
                block = http_response_block(body)
                rec = build_warc_record(
                    "response",
                    block,
                    uri=row.url,
                    record_id=f"<urn:shard:{pid}:{f.tell()}>",
                )
                f.write(gzip_member(rec))
                wrote = True
        if wrote:
            os.replace(tmp, path)  # no empty shards, no partial files
        else:
            os.remove(tmp)

    rows.foreachPartition(write_partition)
