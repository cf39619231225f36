"""Remote embedding service transport (functions/embedding.py r09) —
real-socket matrix over a stdlib HTTP server, mirroring the sink
transport tests (test_sinks.py): success, out-of-order responses,
5xx-then-success retry, exhaustion, 4xx fail-fast, count-mismatch
detection, and Spark end-to-end through the Arrow UDF."""

from __future__ import annotations

import http.server
import json
import threading

import numpy as np
import pandas as pd
import pytest

from data_ingestion_spark.functions.embedding import (
    StdlibEmbeddingTransport,
    _fallback_embed,
    make_remote_embed_udf,
)

DIM = 8


def server_vectors(texts: list[str]) -> np.ndarray:
    """The fake service's model: the deterministic fallback embedding,
    computed SERVER-side — so client-side results are checkable
    against an independent local computation."""
    return _fallback_embed(pd.Series(texts), DIM)


class _EmbeddingHTTPServer:
    """OpenAI-style /v1/embeddings endpoint with a scripted behavior
    list consumed one entry per request: 'ok', 'shuffled' (data out of
    index order), '503', '400', 'short' (drops the last vector)."""

    def __init__(self, script: list[str]):
        self.script = list(script)
        self.requests: list[dict] = []
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                assert self.path == "/v1/embeddings"
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"]))
                )
                outer.requests.append(body)
                mode = outer.script.pop(0) if outer.script else "ok"
                if mode in ("503", "400"):
                    self.send_response(int(mode))
                    self.end_headers()
                    return
                if mode == "error_envelope":  # 200 with an error body
                    payload = json.dumps({"error": {"message": "boom"}}).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
                if mode == "truncated":  # drop mid-body (IncompleteRead)
                    payload = b'{"data": ['
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(payload) + 50))
                    self.end_headers()
                    self.wfile.write(payload)
                    self.wfile.flush()
                    self.connection.close()
                    return
                texts = body["input"]
                mat = server_vectors(texts)
                data = [
                    {"index": i, "embedding": [float(x) for x in mat[i]]}
                    for i in range(len(texts))
                ]
                if mode == "shuffled":
                    data = data[::-1]
                elif mode == "short":
                    data = data[:-1]
                payload = json.dumps({"data": data}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a):
                pass

        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}"
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def _transport(url, **kw):
    kw.setdefault("batch_size", 4)
    kw.setdefault("backoff_s", 0.01)
    return StdlibEmbeddingTransport(url, **kw)


def test_values_and_batching():
    srv = _EmbeddingHTTPServer(script=[])
    try:
        texts = [f"doc {i}" for i in range(10)]
        got = _transport(srv.url).embed(texts)
        want = server_vectors(texts)
        assert np.allclose(np.array(got, dtype=np.float32), want)
        # batch_size=4 → 3 requests of sizes 4,4,2
        assert [len(r["input"]) for r in srv.requests] == [4, 4, 2]
    finally:
        srv.stop()


def test_out_of_order_response_is_resorted():
    srv = _EmbeddingHTTPServer(script=["shuffled"])
    try:
        texts = ["a", "b", "c"]
        got = np.array(_transport(srv.url).embed(texts), dtype=np.float32)
        assert np.allclose(got, server_vectors(texts))  # input order restored
    finally:
        srv.stop()


def test_503_then_success_retries():
    srv = _EmbeddingHTTPServer(script=["503", "503", "ok"])
    try:
        got = _transport(srv.url, max_retries=3).embed(["x"])
        assert np.allclose(
            np.array(got, dtype=np.float32), server_vectors(["x"])
        )
        assert len(srv.requests) == 3
    finally:
        srv.stop()


def test_exhaustion_raises():
    srv = _EmbeddingHTTPServer(script=["503", "503", "503"])
    try:
        with pytest.raises(RuntimeError, match="failed after 3 attempts"):
            _transport(srv.url, max_retries=3).embed(["x"])
    finally:
        srv.stop()


def test_4xx_fails_fast():
    import urllib.error

    srv = _EmbeddingHTTPServer(script=["400"])
    try:
        with pytest.raises(urllib.error.HTTPError):
            _transport(srv.url).embed(["x"])
        assert len(srv.requests) == 1  # no retry on 4xx
    finally:
        srv.stop()


def test_count_mismatch_detected():
    srv = _EmbeddingHTTPServer(script=["short", "short", "short"])
    try:
        with pytest.raises(RuntimeError, match="failed after|vectors"):
            _transport(srv.url, max_retries=1).embed(["a", "b", "c"])
    finally:
        srv.stop()


def test_spark_end_to_end(spark):
    """The Arrow UDF path against the real socket: per-worker
    transport, NULL-safe, values equal to the server model."""
    from pyspark.sql import functions as F

    srv = _EmbeddingHTTPServer(script=[])
    try:
        df = spark.createDataFrame(
            [(i, f"chunk {i}") for i in range(20)] + [(99, None)],
            "doc_id long, text string",
        ).repartition(2)
        out = df.withColumn(
            "embedding", make_remote_embed_udf(srv.url, DIM, batch_size=8)("text")
        ).collect()
        got = {r["doc_id"]: np.array(r["embedding"], dtype=np.float32) for r in out}
        for i in range(20):
            assert np.allclose(got[i], server_vectors([f"chunk {i}"])[0])
        assert np.allclose(got[99], server_vectors([""])[0])  # NULL → ""
    finally:
        srv.stop()


# --------------------------------------------- LLM completions transport


class _CompletionsHTTPServer:
    """OpenAI-style /v1/completions endpoint; scripted like the
    embedding server. 'ok' echoes a deterministic function of the
    prompt so answers are value-checkable."""

    def __init__(self, script: list[str]):
        self.script = list(script)
        self.requests: list[dict] = []
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                assert self.path == "/v1/completions"
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"]))
                )
                outer.requests.append(body)
                mode = outer.script.pop(0) if outer.script else "ok"
                if mode in ("503", "400"):
                    self.send_response(int(mode))
                    self.end_headers()
                    return
                text = f"ANSWER[{len(body['prompt'])}:{body['model']}]"
                payload = json.dumps({"choices": [{"text": text}]}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a):
                pass

        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}"
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_llm_transport_matrix():
    from data_ingestion_spark.query_api import StdlibLLMTransport

    srv = _CompletionsHTTPServer(script=["503", "ok"])
    try:
        llm = StdlibLLMTransport(srv.url, model="m-test", backoff_s=0.01)
        out = llm("hello world")
        assert out == "ANSWER[11:m-test]"
        assert len(srv.requests) == 2  # one 503 retry
        assert srv.requests[-1]["temperature"] == 0.0
    finally:
        srv.stop()
    srv = _CompletionsHTTPServer(script=["503"] * 3)
    try:
        with pytest.raises(RuntimeError, match="failed after 3 attempts"):
            StdlibLLMTransport(srv.url, backoff_s=0.01)("x")
    finally:
        srv.stop()
    import urllib.error

    srv = _CompletionsHTTPServer(script=["400"])
    try:
        with pytest.raises(urllib.error.HTTPError):
            StdlibLLMTransport(srv.url, backoff_s=0.01)("x")
        assert len(srv.requests) == 1
    finally:
        srv.stop()


def test_rag_query_over_the_wire(spark, tmp_path):
    """The full reference Q flow with the LLM behind a REAL socket:
    ingest a tiny store, retrieve top-k, assemble the prompt, generate
    via the completions endpoint."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.embedding import embed_deterministic
    from data_ingestion_spark.query_api import EngineQuery, StdlibLLMTransport
    from data_ingestion_spark.sources.sinks import ParquetVectorStore

    store = ParquetVectorStore(spark, str(tmp_path / "store"))
    store.create_collection("kb")
    docs = spark.createDataFrame(
        [(i, f"fact number {i} about spark") for i in range(8)],
        "chunk_id long, chunk_text string",
    ).withColumn("index_name", F.lit("kb")).withColumn(
        "embedding", embed_deterministic(F.col("chunk_text"), 8)
    )
    store.upsert(docs)

    srv = _CompletionsHTTPServer(script=[])
    try:
        eq = EngineQuery(spark, store, embed_dim=8)
        answer = eq.rag_query(
            "kb", "what about spark?", llm=StdlibLLMTransport(srv.url), k=3
        )
        assert answer.startswith("ANSWER[")
        sent_prompt = srv.requests[0]["prompt"]
        assert "Context:" in sent_prompt and "what about spark?" in sent_prompt
        assert sent_prompt.count("fact number") == 3  # k=3 retrieved chunks
    finally:
        srv.stop()


def test_error_envelope_raises_with_context():
    srv = _EmbeddingHTTPServer(script=["error_envelope"])
    try:
        with pytest.raises(RuntimeError, match="malformed embedding response"):
            _transport(srv.url).embed(["x"])
    finally:
        srv.stop()


def test_mid_body_drop_is_retried():
    """r09 third self-review: a connection dropped after the 200
    headers (IncompleteRead / truncated-body JSON) is a TRANSIENT
    failure and must retry like a 503, not raise through."""
    srv = _EmbeddingHTTPServer(script=["truncated", "ok"])
    try:
        got = _transport(srv.url, max_retries=3).embed(["x"])
        assert np.allclose(np.array(got, dtype=np.float32), server_vectors(["x"]))
        assert len(srv.requests) == 2
    finally:
        srv.stop()


def test_wrong_dim_from_service_fails_loudly(spark):
    """r09 third self-review: the UDF's dim is enforced — a serving
    endpoint hosting the wrong-width model must fail the stage, not
    silently write wrong-width arrays into the index."""
    from pyspark.sql import functions as F

    srv = _EmbeddingHTTPServer(script=[])  # serves DIM=8
    try:
        df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PythonException

        with pytest.raises((Py4JJavaError, PythonException), match="wrong|dim"):
            df.withColumn(
                "embedding", make_remote_embed_udf(srv.url, dim=16)("text")
            ).collect()
    finally:
        srv.stop()
