"""WARC source tests: record grammar, gzip member walk, HTTP decode
(chunked / content-encoding), hostile-input degradation, bomb caps,
the Spark stage over real .warc.gz files on disk, the read-the-crawl
ingestion plan, and the warc_extract DQ plan shape."""

from __future__ import annotations

import random
import zlib

import pytest
from pyspark.sql import functions as F

from data_ingestion_spark.sources.warc import (
    DEFAULT_MAX_RECORD_BYTES,
    attach_synthetic_warc,
    build_warc_record,
    gzip_member,
    http_response_block,
    iter_gzip_members,
    iter_warc_records,
    parse_http_response,
    synthetic_warc_gz,
    warc_records,
    warc_response_docs,
)

from tests.conftest import SF_SMALL


# ---------------------------------------------------------------------
# parser units
# ---------------------------------------------------------------------


@pytest.mark.parametrize("doc_id", [0, 3, 5, 7, 15])  # rotates chunked/gzip/both/neither
def test_roundtrip_all_encodings(doc_id):
    text = f"body κόσμος {doc_id} " * 60
    recs = list(iter_warc_records(synthetic_warc_gz(doc_id, text)))
    assert [h.get("warc-type") for h, _, _ in recs] == ["warcinfo", "request", "response"]
    assert all(not t for _, _, t in recs)
    headers, block, _ = recs[2]
    assert headers["warc-target-uri"] == f"https://ex.com/d/{doc_id}"
    status, ctype, body, trunc = parse_http_response(block)
    assert (status, ctype, trunc) == (200, "text/html; charset=utf-8", False)
    assert body == text.encode("utf-8")


def test_plain_concatenated_file():
    blob = b"".join(
        build_warc_record("response", http_response_block(f"b{i}".encode()), uri=f"u{i}")
        for i in range(5)
    )
    recs = list(iter_warc_records(blob))
    assert len(recs) == 5
    assert parse_http_response(recs[3][1])[2] == b"b3"


def test_multi_record_member():
    # one gzip member holding the whole file (tolerated layout)
    inner = b"".join(
        build_warc_record("response", http_response_block(f"b{i}".encode()), uri=f"u{i}")
        for i in range(3)
    )
    assert len(list(iter_warc_records(gzip_member(inner)))) == 3


def test_content_length_trims_overlong_body():
    block = (
        b"HTTP/1.1 200 OK\r\nContent-Length: 3\r\n\r\nabcdefgh"
    )
    status, _, body, trunc = parse_http_response(block)
    assert (status, body, trunc) == (200, b"abc", False)


def test_short_body_flags_truncated():
    block = b"HTTP/1.1 200 OK\r\nContent-Length: 100\r\n\r\nabc"
    _, _, body, trunc = parse_http_response(block)
    assert body == b"abc" and trunc


def test_chunked_with_extensions_and_gzip():
    payload = gzip_member(b"x" * 1000)
    wire = (
        f"{len(payload):x};ext=1\r\n".encode() + payload + b"\r\n0\r\n\r\n"
    )
    block = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + wire
    )
    status, _, body, trunc = parse_http_response(block)
    assert (status, body, trunc) == (200, b"x" * 1000, False)


def test_unknown_content_encoding_keeps_raw_flags_truncated():
    block = b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nrawbytes"
    _, _, body, trunc = parse_http_response(block)
    assert body == b"rawbytes" and trunc


def test_raw_deflate_fallback():
    # servers that send raw-deflate under the name "deflate"
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = c.compress(b"hello" * 20) + c.flush()
    block = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + raw
    _, _, body, trunc = parse_http_response(block)
    assert body == b"hello" * 20 and not trunc


def test_member_bomb_caps_and_stops():
    bomb = gzip_member(b"\x00" * (64 << 20)) + gzip_member(b"tail")
    out = list(iter_gzip_members(bomb, 1 << 16, 100))
    # the bomb member is truncated at the cap and the walk STOPS —
    # the next member boundary is unreachable without inflating through
    assert len(out) == 1 and out[0][1] is True and len(out[0][0]) == 1 << 16


def test_member_exactly_cap_plus_one_flags_truncated():
    """A member inflating to exactly cap+1 bytes, with gzip eof
    landing on the same decompress call, must be flagged truncated —
    the cap check runs BEFORE the eof check (one-byte overshoot
    regression). Members at exactly cap stay untruncated."""
    cap = 1 << 10
    over = gzip_member(b"\x00" * (cap + 1)) + gzip_member(b"tail")
    out = list(iter_gzip_members(over, cap, 100))
    assert len(out) == 1 and out[0][1] is True and len(out[0][0]) == cap
    exact = gzip_member(b"\x00" * cap) + gzip_member(b"tail")
    out = list(iter_gzip_members(exact, cap, 100))
    assert [(len(b), t) for b, t in out] == [(cap, False), (4, False)]


def test_record_content_length_bomb_capped():
    # a declared Content-Length beyond the cap yields a truncated record
    big = build_warc_record("response", b"A" * 2048, uri="u")
    recs = list(iter_warc_records(big, max_record_bytes=100))
    assert recs[0][2] is True and len(recs[0][1]) == 100


def test_max_records_cap():
    blob = b"".join(
        build_warc_record("metadata", b"x", content_type="text/plain")
        for _ in range(50)
    )
    assert len(list(iter_warc_records(blob, max_records=7))) == 7


def test_garbage_and_truncations_never_raise():
    assert list(iter_warc_records(b"not a warc" * 20)) == []
    blob = synthetic_warc_gz(1, "y" * 400)
    for cut in range(0, len(blob), 11):
        list(iter_warc_records(blob[:cut]))


def test_fuzz_byte_flips_never_raise():
    rng = random.Random(0xA1CE)
    blob = synthetic_warc_gz(15, "fuzz target body " * 40)  # chunked+gzip path
    for _ in range(3000):
        b2 = bytearray(blob)
        for _ in range(rng.randint(1, 8)):
            b2[rng.randrange(len(b2))] = rng.randrange(256)
        for headers, block, trunc in iter_warc_records(bytes(b2)):
            if headers.get("warc-type") == "response" and not trunc:
                parse_http_response(block)


def test_fuzz_random_blobs_never_raise():
    rng = random.Random(7)
    for _ in range(500):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 400)))
        for headers, block, trunc in iter_warc_records(blob):
            parse_http_response(block)


# ---------------------------------------------------------------------
# Spark stage + plan
# ---------------------------------------------------------------------


def _write_shards(tmp_path, n_docs=20, docs_per_shard=5):
    paths = []
    for s in range(0, n_docs, docs_per_shard):
        shard = b"".join(
            synthetic_warc_gz(i, f"<html><title>t{i}</title><body><p>doc {i} body</p></body></html>")
            for i in range(s, s + docs_per_shard)
        )
        p = tmp_path / f"shard-{s:05d}.warc.gz"
        p.write_bytes(shard)
        paths.append(p)
    return paths


def test_warc_records_over_binary_files(spark, tmp_path):
    from data_ingestion_spark.sources.catalog import read_binary_dir

    _write_shards(tmp_path)
    recs = warc_records(read_binary_dir(spark, str(tmp_path), "*.warc.gz"))
    rows = recs.collect()
    assert len(rows) == 20 * 3
    resp = [r for r in rows if r.record_type == "response"]
    assert len(resp) == 20
    assert all(r.http_status == 200 and not r.truncated for r in resp)
    docs = warc_response_docs(recs)
    got = {r.url: r.html for r in docs.collect()}
    assert got["https://ex.com/d/7"] == (
        "<html><title>t7</title><body><p>doc 7 body</p></body></html>"
    )


def test_warc_ingestion_plan_end_to_end(spark, tmp_path):
    from data_ingestion_spark.plans.config import IngestionConfig
    from data_ingestion_spark.plans.web_ingestion import website_ingestion_from_warc

    _write_shards(tmp_path)
    cfg = IngestionConfig(index_name="warc-test", chunk_size=64, chunk_overlap=8)
    df = website_ingestion_from_warc(spark, cfg, str(tmp_path))
    rows = df.select("url", "chunk_text", "index_name", "embedding").collect()
    assert len(rows) >= 20  # ≥1 chunk per page
    assert {r.index_name for r in rows} == {"warc_test"}
    assert all(len(r.embedding) == cfg.embed_dim for r in rows)
    assert any("doc 7 body" in r.chunk_text for r in rows)


def test_warc_extract_dq_matches_and_plans_narrow(spark):
    """The DQ's parse stage must be a narrow map: no shuffle before
    the single groupBy (budgeted in shuffle_budget_generated.json)."""
    import data_ingestion_spark.queries_extra  # noqa: F401  (registers)
    from data_ingestion_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["warc_extract"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles == 1 and "BroadcastExchange" not in plan
    sample = {r.doc_id: r for r in df.filter(F.col("doc_id") < 3).collect()}
    assert sample[0].n_records == 3 and sample[0].http_status == 200
    assert all(len(r.body_md5) == 32 for r in sample.values())


def test_truncated_shard_rows_survive(spark, tmp_path):
    """A corrupt shard degrades to truncated/partial rows; the healthy
    shard next to it is unaffected (corrupt files are data)."""
    good = synthetic_warc_gz(1, "good body")
    (tmp_path / "good.warc.gz").write_bytes(good)
    (tmp_path / "bad.warc.gz").write_bytes(good[: len(good) // 2])
    from data_ingestion_spark.sources.catalog import read_binary_dir

    recs = warc_records(read_binary_dir(spark, str(tmp_path), "*.warc.gz"))
    docs = warc_response_docs(recs)
    assert [r.url for r in docs.collect()] == ["https://ex.com/d/1"]


def test_member_walk_every_feed_alignment(monkeypatch):
    """Feed zlib 1..16 bytes at a time: every possible alignment of a
    member boundary against the feed-slice boundary must yield all
    members (regression: a boundary 1 byte before a feed edge left
    half the gzip magic in unused_data and dropped the rest)."""
    import data_ingestion_spark.sources.warc as W

    blob = b"".join(gzip_member(f"member {i} ".encode() * 9) for i in range(6))
    for feed in range(1, 17):
        monkeypatch.setattr(W, "_FEED", feed)
        out = list(W.iter_gzip_members(blob, 1 << 20, 100))
        assert len(out) == 6 and all(not t for _, t in out), feed
        assert out[3][0] == b"member 3 " * 9
    monkeypatch.setattr(W, "_FEED", 1)
    recs = list(W.iter_warc_records(synthetic_warc_gz(15, "align " * 30)))
    assert len(recs) == 3 and not any(t for _, _, t in recs)


def test_write_warc_shards_roundtrip(spark, tmp_path):
    """The archival sink round-trips through the production reader:
    every (url, body) row comes back bit-exact, shards are
    partition-granular, no empty/partial files."""
    import os

    from data_ingestion_spark.sources.catalog import load_table, read_binary_dir
    from data_ingestion_spark.sources.warc import write_warc_shards

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select(
            F.concat(F.lit("https://ex.com/d/"), F.col("doc_id")).alias("url"),
            F.col("text").alias("html"),
        )
    )
    out = str(tmp_path / "snapshot")
    write_warc_shards(docs, out, shards=6)
    files = sorted(os.listdir(out))
    assert 0 < len(files) <= 6 and all(f.endswith(".warc.gz") for f in files)
    assert not any(f.endswith(".inprogress") for f in files)

    back = warc_response_docs(
        warc_records(read_binary_dir(spark, out, "*.warc.gz"))
    )
    orig = {r.url: r.html for r in docs.collect()}
    got = {r.url: r.html for r in back.collect()}
    assert got == orig


def test_resolve_charset_precedence():
    """BOM > Content-Type param > meta sniff > UTF-8 probe >
    windows-1252, with WHATWG alias normalization."""
    from data_ingestion_spark.sources.warc import decode_http_body, resolve_charset

    # BOM wins even over a contradicting header
    assert resolve_charset(b"\xef\xbb\xbfhi", "text/html; charset=shift_jis") == "utf-8-sig"
    assert resolve_charset(b"\xff\xfeh\x00", None) == "utf-16-le"
    assert resolve_charset(b"\xfe\xff\x00h", None) == "utf-16-be"
    # header param, alias-normalized like a browser
    assert resolve_charset(b"hi", "text/html; charset=ISO-8859-1") == "windows-1252"
    assert resolve_charset(b"hi", 'text/html; charset="Shift-JIS"') == "shift_jis"
    assert resolve_charset(b"hi", "text/html; charset=gb2312") == "gbk"
    # header beats meta
    assert (
        resolve_charset(b'<meta charset="shift_jis">', "text/html; charset=utf-8")
        == "utf-8"
    )
    # meta sniff when the header has no param
    assert resolve_charset(b'<meta charset="windows-1252">x', "text/html") == "windows-1252"
    assert (
        resolve_charset(
            b'<meta http-equiv="Content-Type" content="text/html; charset=shift_jis">',
            None,
        )
        == "shift_jis"
    )
    # unknown declared label falls through to the probe
    assert resolve_charset(b"plain ascii", "text/html; charset=klingon-8") == "utf-8"
    # valid UTF-8 bytes probe as UTF-8; invalid fall back to cp1252
    assert resolve_charset("héllo".encode("utf-8"), None) == "utf-8"
    assert resolve_charset("héllo".encode("cp1252"), None) == "windows-1252"
    # utf-16 BOM consumed, not emitted
    text, cs = decode_http_body("hi".encode("utf-16"), None)  # utf-16 writes a BOM
    assert (text, cs) in {("hi", "utf-16-le"), ("hi", "utf-16-be")}
    # utf-32 BOM detected BEFORE utf-16 (its LE BOM starts with \xff\xfe)
    text32, cs32 = decode_http_body("hi".encode("utf-32"), None)
    assert (text32, cs32) in {("hi", "utf-32-le"), ("hi", "utf-32-be")}


def test_warc_response_docs_no_mojibake(spark, tmp_path):
    """A windows-1252 page with £/é/¥ must decode to the exact chars
    through the full Spark stage — not replacement-char mojibake
    (the pre-charset-aware behavior: a plain UTF-8 cast)."""
    page = "Price: £9 — café ¥100"
    block = http_response_block(
        page.encode("cp1252"), content_type="text/html; charset=iso-8859-1"
    )
    rec = build_warc_record("response", block, uri="https://ex.com/legacy")
    (tmp_path / "a.warc.gz").write_bytes(gzip_member(rec))
    from data_ingestion_spark.sources.catalog import read_binary_dir

    recs = warc_records(read_binary_dir(spark, str(tmp_path), "*.warc.gz"))
    rows = warc_response_docs(recs, with_charset=True).collect()
    assert rows[0].html == page and "�" not in rows[0].html
    assert rows[0].charset == "windows-1252"


def test_negative_chunk_size_degrades():
    # int('-3', 16) parses — negative framing must flag, not mangle offsets
    block = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n-3\r\nABCDEF\r\n0\r\n\r\n"
    _, _, body, trunc = parse_http_response(block)
    assert trunc and body == b""


def test_negative_content_length_keeps_body():
    block = b"HTTP/1.1 200 OK\r\nContent-Length: -5\r\n\r\nabcdefgh"
    _, _, body, trunc = parse_http_response(block)
    assert body == b"abcdefgh" and trunc  # NOT body[:-5]


def test_truncated_gzip_body_flags():
    payload = gzip_member(b"y" * 500)[:-10]  # cut the trailer + tail
    block = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + payload
    )
    _, _, body, trunc = parse_http_response(block)
    assert trunc  # partial decode must not masquerade as complete


# ---------------------------------------------------------------------
# property tests
# ---------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(
    body=st.binary(max_size=2000),
    chunked=st.booleans(),
    gzip_body=st.booleans(),
    chunk_size=st.integers(min_value=1, max_value=97),
)
def test_http_response_roundtrip_property(body, chunked, gzip_body, chunk_size):
    """Arbitrary bytes through the writer's encoding matrix decode
    back bit-exact — chunk-size boundaries included."""
    block = http_response_block(
        body, chunked=chunked, gzip_body=gzip_body, chunk_size=chunk_size
    )
    status, ctype, got, trunc = parse_http_response(block)
    assert (status, got, trunc) == (200, body, False)


@settings(max_examples=100, deadline=None)
@given(
    texts=st.lists(
        st.text(max_size=300), min_size=1, max_size=5
    ),
    per_member=st.booleans(),
)
def test_warc_record_roundtrip_property(texts, per_member):
    """Arbitrary unicode corpora through build→(maybe gzip)→parse:
    every record comes back, in order, body-exact."""
    recs = [
        build_warc_record(
            "response", http_response_block(t.encode("utf-8")), uri=f"u{i}"
        )
        for i, t in enumerate(texts)
    ]
    if per_member:
        blob = b"".join(gzip_member(r) for r in recs)
    else:
        blob = gzip_member(b"".join(recs))
    out = list(iter_warc_records(blob))
    assert len(out) == len(texts)
    for i, (headers, block, trunc) in enumerate(out):
        assert not trunc and headers["warc-target-uri"] == f"u{i}"
        assert parse_http_response(block)[2] == texts[i].encode("utf-8")
