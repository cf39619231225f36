"""WARC source throughput stress (SCALE.md evidence for the
read-the-crawl path, r09).

tests/test_warc.py certifies parse CORRECTNESS; this measures the
Spark stage's THROUGHPUT on crawl-shaped shards — many .warc.gz files
on disk, each holding hundreds of request/response pairs with the
encoding mix real crawls carry (plain, chunked, gzip'd, both) — so
the WARC slot carries a 100 TB cost model like the image/PDF stages.

Per run: synthesize+write shards (excluded from timing), then the
full production path end-to-end — binaryFile scan → warc_records
(member walk + record grammar + HTTP decode) → warc_response_docs —
aggregated so nothing collects. A driver-side spot check keeps the
bulk run honest. Prints one JSON line.

Usage: python scripts/stress_warc.py [--shards 64] [--docs-per-shard 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

_BODY = (
    "<html><head><title>doc %d</title></head><body>"
    "<p>The quick brown crawl shard %d fetches, cleans and chunks "
    "documents at corpus scale. Section %d covers partitioning, "
    "member walks and Arrow batching.</p></body></html>"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--docs-per-shard", type=int, default=400)
    ap.add_argument("--body-repeat", type=int, default=4,
                    help="page-size dial: 4 ≈ 1 KB bodies, 250 ≈ 60 KB (crawl-typical)")
    args = ap.parse_args()

    from data_ingestion_spark.session import get_spark
    from data_ingestion_spark.sources.catalog import read_binary_dir
    from data_ingestion_spark.sources.warc import (
        iter_warc_records,
        synthetic_warc_gz,
        warc_records,
        warc_response_docs,
    )

    spark = get_spark("stress-warc")
    n_docs = args.shards * args.docs_per_shard

    tmp = tempfile.mkdtemp(prefix="stress_warc_")
    t0 = time.time()
    total_bytes = 0
    for s in range(args.shards):
        base = s * args.docs_per_shard
        shard = b"".join(
            synthetic_warc_gz(i, _BODY % (i, s, i % 7) * args.body_repeat)
            for i in range(base, base + args.docs_per_shard)
        )
        total_bytes += len(shard)
        with open(os.path.join(tmp, f"shard-{s:05d}.warc.gz"), "wb") as f:
            f.write(shard)
    t_synth = time.time() - t0

    # honesty spot check: direct parse of one shard agrees with expectations
    with open(os.path.join(tmp, "shard-00000.warc.gz"), "rb") as f:
        recs = list(iter_warc_records(f.read()))
    assert len(recs) == 3 * args.docs_per_shard and not any(t for _, _, t in recs)

    t0 = time.time()
    out = warc_response_docs(
        warc_records(read_binary_dir(spark, tmp, "*.warc.gz"))
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("pages"),
        F.sum(F.length("html")).alias("chars"),
    ).collect()[0]
    t_parse = time.time() - t0
    assert agg["pages"] == n_docs, (agg["pages"], n_docs)

    for f in os.listdir(tmp):
        os.remove(os.path.join(tmp, f))
    os.rmdir(tmp)

    print(
        json.dumps(
            {
                "metric": "warc_stress",
                "shards": args.shards,
                "docs": n_docs,
                "records": 3 * n_docs,
                "shard_mb": round(total_bytes / 1e6, 1),
                "synth_sec": round(t_synth, 2),
                "parse_sec": round(t_parse, 2),
                "docs_per_sec": round(n_docs / t_parse, 1),
                "decoded_mb_per_sec": round(agg["chars"] / 1e6 / t_parse, 1),
                "archive_mb_per_sec": round(total_bytes / 1e6 / t_parse, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
