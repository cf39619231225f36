"""Pixel-decode throughput stress (SCALE.md evidence for the r08
decode_pixels stage).

The registry DQ certifies decode CORRECTNESS on sf-scale images
(median ~7x6 px); this script measures the stage's THROUGHPUT on
corpus-shaped media — tens of thousands of real PNG/BMP/GIF payloads
at thumbnail-to-icon dims — so the "narrow Arrow-batched map, scales
with cores" claim carries a number.

Two content modes stress opposite codec regimes:

- ``gradient``: smooth ramps — zlib/LZW best case (long matches,
  code-table hits); measures the per-image fixed cost.
- ``noise``: hash-derived bytes — compression worst case (PNG inflate
  of near-stored deflate, GIF LZW emitting fresh table entries and
  hitting 12-bit resets); measures the per-byte cost ceiling.

Per mode it times: encode+materialize (the synthesis cost, excluded
from the decode number), decode (count + total decoded bytes), and
decode+resize to 32x32. A closed-form/numpy spot check on a driver
sample keeps the bulk run honest. Prints one JSON line per stage and
a final summary line with images/s and decoded MB/s.

Usage: python scripts/stress_pixels.py [--n 60000] [--w 64] [--h 64]
       [--content gradient|noise|both]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType


def synth_images(df, w: int, h: int, content: str):
    """payload column of REAL encoded images, format rotating on
    doc_id%4 (PNG gray / BMP 24-bit / GIF palette / baseline JPEG
    gray) — same rotation as the registry DQ, at parameterized dims.
    Deterministic per doc."""
    from data_ingestion_spark.functions.jpeg import jpeg_encode
    from data_ingestion_spark.functions.pixels import (
        bmp_encode,
        gif_encode,
        png_encode,
    )

    @F.pandas_udf(BinaryType())
    def _synth(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            d = int(d)
            if content == "gradient":
                gray = (
                    (d % 200) + np.add.outer(np.arange(h), np.arange(w))
                ).astype(np.uint8)
            else:  # noise: deterministic per-doc PCG stream
                gray = np.random.default_rng(d).integers(
                    0, 256, size=(h, w), dtype=np.uint8
                )
            m = d % 4
            if m == 0:
                out.append(png_encode(w, h, gray.tobytes(), color_type=0))
            elif m == 1:
                out.append(bmp_encode(w, h, np.repeat(gray, 3).tobytes()))
            elif m == 2:
                out.append(gif_encode(w, h, gray.tobytes()))
            else:
                out.append(jpeg_encode(w, h, gray.tobytes()))
        return pd.Series(out)

    return df.withColumn("payload", _synth(F.col("doc_id")))


def spot_check(decoded_sample, w: int, h: int, content: str) -> None:
    """Driver-side honesty check on a handful of decoded rows: rebuild
    the expected pixels in numpy and compare — byte-for-byte for the
    exact codecs, |err| <= 1 for the lossy-but-flat-quant JPEG leg."""
    for r in decoded_sample:
        d = int(r["doc_id"])
        if content == "gradient":
            gray = (
                (d % 200) + np.add.outer(np.arange(h), np.arange(w))
            ).astype(np.uint8)
        else:
            gray = np.random.default_rng(d).integers(
                0, 256, size=(h, w), dtype=np.uint8
            )
        m = d % 4
        if m == 3:  # jpeg: DCT rounding, flat quant -> within 1
            dec = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8)
            err = np.abs(dec.astype(int) - gray.flatten().astype(int)).max()
            assert err <= 1, f"jpeg decode err {err} doc {d}"
            continue
        exp = gray.tobytes() if m == 0 else np.repeat(gray, 3).tobytes()
        assert bytes(r["pixels"]) == exp, f"decode mismatch doc {d}"


def timed(label, fn):
    t0 = time.monotonic()
    out = fn()
    wall = round(time.monotonic() - t0, 2)
    print(json.dumps({"stage": label, "wall_sec": wall, **out}), flush=True)
    return wall, out


def run_mode(spark, n: int, w: int, h: int, content: str, cpus: int):
    from data_ingestion_spark.functions.multimodal import (
        decode_pixels,
        resize_pixels,
    )

    ids = spark.range(n).withColumnRenamed("id", "doc_id").repartition(cpus * 2)
    ckpt: dict[str, object] = {}
    t_enc, enc_out = timed(
        f"{content}:encode+materialize",
        lambda: {
            "images": ckpt.setdefault(
                "media", synth_images(ids, w, h, content).localCheckpoint()
            ).count(),
            "encoded_mb": round(
                ckpt["media"].agg(F.sum(F.octet_length("payload"))).collect()[0][0]
                / 1e6,
                1,
            ),
        },
    )
    media = ckpt["media"]

    decoded = decode_pixels(media)

    def measure_decode():
        r = decoded.agg(F.count("*"), F.sum(F.octet_length("pixels"))).collect()[0]
        return {"images": r[0], "decoded_mb": round((r[1] or 0) / 1e6, 1)}

    t_dec, dec_out = timed(f"{content}:decode", measure_decode)
    spot_check(decode_pixels(media.limit(12)).collect(), w, h, content)

    t_rz, _ = timed(
        f"{content}:decode+resize32",
        lambda: {
            "images": resize_pixels(decode_pixels(media), 32, 32).agg(
                F.count("pixels")
            ).collect()[0][0]
        },
    )
    return {
        "content": content,
        "encode_sec": t_enc,
        "decode_sec": t_dec,
        "decode_resize_sec": t_rz,
        "encoded_mb": enc_out["encoded_mb"],
        "decoded_mb": dec_out["decoded_mb"],
        "images_per_sec": round(n / t_dec),
        "decoded_mb_per_sec": round(dec_out["decoded_mb"] / t_dec, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=60_000)
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument(
        "--content", choices=["gradient", "noise", "both"], default="both"
    )
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    modes = ["gradient", "noise"] if args.content == "both" else [args.content]
    results = [run_mode(spark, args.n, args.w, args.h, m, cpus) for m in modes]
    print(
        json.dumps(
            {
                "summary": "pixel_decode_stress",
                "n_images": args.n,
                "dims": f"{args.w}x{args.h}",
                "modes": results,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
