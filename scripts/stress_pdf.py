"""PDF text-extraction throughput stress (SCALE.md evidence for the
extract_pdf_text_stage document loader, r09).

The pdf tests certify extraction CORRECTNESS; this script measures
the stage's THROUGHPUT on corpus-shaped documents — tens of thousands
of multi-page PDFs — so the doc-loading slot carries a 100 TB cost
model like the image codecs do (SCALE.md §11).

Content modes stress the filter envelope:

- ``flate``: FlateDecode streams (the dominant real-world filter —
  measures the zlib + text-operator walk).
- ``lzw``: LZWDecode streams (pure-Python MSB-first LZW — the r09
  envelope extension's cost ceiling).
- ``a85flate``: ``[/ASCII85Decode /FlateDecode]`` chains (filter
  chaining overhead on top of flate).

Per mode: encode+materialize (synthesis cost, excluded), then the
Spark stage end-to-end (binary payload → per-stream text rows via
Arrow-batched mapInPandas). A driver-side spot check on a sample
keeps the bulk run honest. Prints one JSON line per mode and a
summary with docs/s and extracted MB/s.

Usage: python scripts/stress_pdf.py [--n 20000] [--pages 3]
       [--modes flate,lzw,a85flate]
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import re
import sys
import time
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

_PAGE_TEXT = (
    "The quick brown fox jumps over the lazy dog %d. "
    "Ingestion pipelines chunk, embed and index documents at scale. "
    "Section %d covers partitioning, shuffles and Arrow batching.\n"
)


# single source of truth for the synthesis-side encoder: the
# independent test-side implementation (keeping a second copy here
# would silently diverge the stress harness from the tested codec).
# Deliberate dev-environment dependency: stress scripts run where the
# test stack runs (tests/test_pdf.py imports pytest) — this is a
# measurement harness, not shipped runtime code.
from tests.test_pdf import _lzw_encode_pdf  # noqa: E402


def _build_pdf(doc_id: int, pages: int, mode: str) -> bytes:
    """A multi-stream PDF in the requested filter mode. Content varies
    per doc (doc_id folded into the text) so nothing is cacheable."""
    parts = [b"%PDF-1.4\n"]
    for p in range(pages):
        text = (_PAGE_TEXT % (doc_id, p)) * 6
        content = bytearray(b"BT ")
        for line in text.split("\n"):
            esc = line.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
            content += b"(" + esc.encode("latin-1") + b") Tj T* "
        content += b"ET"
        if mode == "flate":
            body, filt = zlib.compress(bytes(content)), b"/FlateDecode"
        elif mode == "lzw":
            body, filt = _lzw_encode_pdf(bytes(content)), b"/LZWDecode"
        elif mode == "a85flate":
            body = base64.a85encode(zlib.compress(bytes(content))) + b"~>"
            filt = b"[/ASCII85Decode /FlateDecode]"
        else:
            raise ValueError(mode)
        parts.append(
            b"<< /Length " + str(len(body)).encode() + b" /Filter " + filt
            + b" >>\nstream\n" + body + b"\nendstream\n"
        )
    parts.append(b"%%EOF")
    return b"".join(parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--pages", type=int, default=3)
    ap.add_argument("--modes", default="flate,lzw,a85flate")
    args = ap.parse_args()

    from data_ingestion_spark.functions.pdf import (
        extract_pdf_text_stage,
        pdf_extract_text,
    )
    from data_ingestion_spark.session import get_spark

    spark = get_spark("stress-pdf")
    summary = {}
    for mode in args.modes.split(","):
        base = spark.range(args.n).select(F.col("id").alias("doc_id"))

        @F.pandas_udf(BinaryType())
        def _synth(doc_id: pd.Series) -> pd.Series:
            return doc_id.map(lambda d: _build_pdf(int(d), args.pages, mode))

        t0 = time.time()
        docs = base.select("doc_id", _synth("doc_id").alias("payload")).persist()
        docs.count()  # materialize: extraction timing must not re-synthesize
        t_synth = time.time() - t0

        # honesty spot check on the driver: stage text == direct call
        sample = docs.limit(3).collect()
        for r in sample:
            texts = pdf_extract_text(bytes(r["payload"]))
            assert texts and str(r["doc_id"]) in texts[0], (mode, r["doc_id"])

        t0 = time.time()
        out = extract_pdf_text_stage(docs)
        agg = out.agg(
            F.count(F.lit(1)).alias("streams"),
            F.sum(F.length("text")).alias("chars"),
        ).collect()[0]
        t_extract = time.time() - t0
        expected = args.n * args.pages
        assert agg["streams"] == expected, (agg["streams"], expected)
        docs.unpersist()
        row = {
            "mode": mode,
            "n_docs": args.n,
            "streams": agg["streams"],
            "synth_sec": round(t_synth, 2),
            "extract_sec": round(t_extract, 2),
            "docs_per_sec": round(args.n / t_extract, 1),
            "extracted_mb_per_sec": round(agg["chars"] / 1e6 / t_extract, 1),
        }
        print(json.dumps(row))
        summary[mode] = row
    print(json.dumps({"summary": {m: r["docs_per_sec"] for m, r in summary.items()}}))


if __name__ == "__main__":
    main()
