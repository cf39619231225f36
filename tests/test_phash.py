"""Image perceptual-hash dedup (r13 verdict #3).

Pins: recode invariance (PNG == BMP == GIF of identical pixels),
nearest-neighbor resize invariance (2x upscale hashes identically by
construction of the grid downsample), undecodable-payload NULL
propagation, and pigeonhole banding completeness for hamming64_pairs
against a naive all-pairs reference on adversarial bit-flip hashes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_spark.functions.dedup import hamming64_pairs
from data_ingestion_spark.functions.multimodal import (
    attach_pattern_image,
    image_ahash64,
    image_dhash64,
    luma_grid,
)


def _payload_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, payload binary")


def test_recode_and_resize_invariance(spark):
    """The same pixel content hashes identically across PNG / BMP /
    GIF containers and across a 2x nearest-neighbor upscale — for
    BOTH dhash and ahash (integer luma makes gray == r=g=b)."""
    import numpy as np

    from data_ingestion_spark.functions.pixels import (
        bmp_encode,
        gif_encode,
        png_encode,
    )

    rng = np.random.RandomState(7)
    pat = rng.randint(0, 256, size=(8, 9), dtype=np.uint8)
    up = np.repeat(np.repeat(pat, 2, axis=0), 2, axis=1)
    rows = [
        (0, png_encode(9, 8, pat.tobytes(), color_type=0)),
        (1, bmp_encode(9, 8, np.repeat(pat, 3).tobytes())),
        (2, gif_encode(9, 8, pat.tobytes())),
        (3, gif_encode(18, 16, up.tobytes())),  # 2x NN upscale
        (4, png_encode(27, 24, np.repeat(np.repeat(pat, 3, axis=0), 3, axis=1).tobytes(), color_type=0)),  # 3x
    ]
    d = _payload_df(spark, rows)
    dh = {r.doc_id: r.dhash for r in image_dhash64(d).collect()}
    assert len(set(dh.values())) == 1, f"dhash not invariant: {dh}"
    ah = {r.doc_id: r.ahash for r in image_ahash64(d).collect()}
    assert len(set(ah.values())) == 1, f"ahash not invariant: {ah}"


def test_luma_grid_null_for_undecodable_and_rgb_luma(spark):
    import numpy as np

    from data_ingestion_spark.functions.pixels import bmp_encode

    # an RGB image with distinct channels: luma = (299r+587g+114b)//1000
    rgb = np.zeros((8, 9, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 100, 50, 200
    d = _payload_df(
        spark,
        [(0, bmp_encode(9, 8, rgb.tobytes())), (1, b"not an image")],
    )
    out = {r.doc_id: r.luma for r in luma_grid(d).collect()}
    want = (299 * 100 + 587 * 50 + 114 * 200) // 1000
    assert set(out[0]) == {want}
    assert out[1] is None
    # NULL propagates through the hash, and pairs drop the row
    dh = {r.doc_id: r.dhash for r in image_dhash64(d).collect()}
    assert dh[1] is None and dh[0] is not None
    assert hamming64_pairs(image_dhash64(d), "dhash").count() == 0


def test_hamming64_banding_completeness_vs_naive(spark):
    """Pigeonhole completeness on adversarial data: every hash gets
    siblings at exact hamming 1, 2 (in-budget) and 3 (out), with the
    flipped bit positions swept across ALL band boundaries. The
    banded join must equal the naive all-pairs filter exactly."""
    base = [(7919 * i * i + 104729 * i) & ((1 << 64) - 1) for i in range(40)]

    def s64(v):  # two's-complement into BIGINT range
        return v - (1 << 64) if v >= (1 << 63) else v

    rows, rid = [], 0
    for i, h in enumerate(base):
        for flips in ([], [i % 64], [i % 64, (i * 7 + 21) % 64], [0, 21, 43]):
            v = h
            for b in set(flips):
                v ^= 1 << b
            rows.append((rid, s64(v)))
            rid += 1
    df = spark.createDataFrame(rows, "doc_id bigint, h bigint")
    got = sorted(map(tuple, hamming64_pairs(df, "h", max_hamming=2).collect()))
    naive = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            x = (rows[i][1] ^ rows[j][1]) & ((1 << 64) - 1)
            ham = bin(x).count("1")
            if ham <= 2:
                naive.append((rows[i][0], rows[j][0], ham))
    assert got == sorted(naive)


def test_pattern_fixture_groups(spark):
    """The DQ fixture's within-group contract: PNG == BMP exactly;
    the perturbed upscaled GIF sits at hamming <= 1 of them."""
    d = spark.range(12).select(F.col("id").alias("doc_id"))
    hs = {r.doc_id: r.dhash for r in image_dhash64(attach_pattern_image(d)).collect()}
    for g in range(4):
        a, b, c = hs[3 * g], hs[3 * g + 1], hs[3 * g + 2]
        assert a == b
        assert bin(((a ^ c) & ((1 << 64) - 1))).count("1") <= 1
