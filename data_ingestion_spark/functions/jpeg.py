"""Baseline JPEG codec — pure stdlib ``struct`` + numpy, no media libs.

Closes the FINAL container-limited gap in T11 (SURVEY §2.10): with
this module every image container the engine recognizes decodes to
raw pixels from its public specification (ITU-T T.81 / ISO 10918-1).

Envelope (decode): baseline/extended sequential DCT (SOF0/1) AND
progressive (SOF2 — full spectral selection + successive
approximation), 8-bit precision, Huffman entropy coding, 1 or 3
components, per-component sampling factors 1 or 2 (covers 4:4:4,
4:2:2, 4:2:0 — chroma upsampled by pixel replication), interleaved
and non-interleaved scans, restart intervals (DRI/RSTn — the
camera/web error-resilience layout). Outside the envelope —
arithmetic coding, 12-bit, lossless, hierarchical — ``jpeg_decode``
returns None (corrupt/exotic media is data, not an exception; same
policy as pixels.py). Progressive correctness is pinned by a
cross-codec identity: progressive transmission reorders the SAME
quantized coefficients baseline sends, so decoding a progressive
encoding must equal decoding the baseline encoding BIT-EXACTLY.

The encoder (4:4:4, single scan) is the synthesis half of the
round-trip tests and the registry DQ. Design choices that keep the
pair honest rather than wrong-but-self-consistent:

- the zigzag order is DERIVED algorithmically (anti-diagonal walk
  with alternating direction) instead of transcribed — a table typo
  cannot exist;
- Huffman tables travel IN the file (DHT segments): the decoder
  builds codes only from what it parses, never from shared module
  constants. The encoder's tables are deliberately non-standard
  (flat 4-bit DC / 8-bit AC codes) so a decoder that secretly assumed
  Annex-K tables would fail loudly;
- a CONSTANT-gray image round-trips BIT-EXACTLY through the lossy
  pipeline (its blocks carry only a DC coefficient: the DCT, flat
  quantization and IDCT of a constant are exact), which is what lets
  the registry DQ predict JPEG pixel sums in closed form;
- the non-flat-quantization round-trip test would surface any
  consistent-but-wrong coefficient ordering: with quant != 1 the
  dequantizer must hit exactly the coefficients the quantizer did,
  which only happens when both orderings are actually zigzag.

Reference parity anchor: the reference pipeline treats media as
opaque artifacts; this module is the north-star extension making the
decode slot real (see functions/pixels.py for PNG/GIF/BMP).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------- constants

#: zigzag[i] = natural (row-major) index of the i-th coefficient in
#: zigzag order — derived, not transcribed (see module docstring).
def _zigzag_order() -> list[int]:
    order: list[tuple[int, int]] = []
    for s in range(15):  # anti-diagonal r+c = s
        diag = [(s - j, j) for j in range(s + 1) if 0 <= s - j < 8 and j < 8]
        order.extend(reversed(diag) if s % 2 else diag)
    return [r * 8 + c for r, c in order]


_ZIGZAG = _zigzag_order()

#: orthonormal 8-point DCT-II basis — JPEG's FDCT/IDCT in matrix form
#: (F = C f C^T, f = C^T F C).
_C = np.array(
    [
        [
            np.sqrt((1.0 if u == 0 else 2.0) / 8.0)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

#: encoder Huffman tables — deliberately NOT Annex K (see docstring):
#: 12 DC categories as flat 4-bit codes, 162 AC symbols as flat 8-bit
#: codes. Both canonical, prefix-free, all-ones code unused (T.81
#: requires the all-ones code of the longest length be absent).
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0xFF, 8 - self.nbits)  # 1-fill to byte boundary


def jpeg_encode(
    width: int,
    height: int,
    pixels: bytes,
    n_channels: int = 1,
    quant: list[int] | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Real baseline JPEG writer: 8-bit, single interleaved scan,
    4:4:4 by default or 4:2:0 with ``subsample=True`` (2x2
    box-averaged chroma, luma sampling 2x2 — the dominant real-world
    layout, and the synthesis half of the decoder's subsampled-path
    tests). ``pixels`` is row-major gray (n_channels=1) or
    interleaved RGB (n_channels=3, converted to BT.601 YCbCr).
    ``quant`` is a 64-entry natural-order table applied to every
    component; default all-ones (near-lossless: constant images
    round-trip bit-exactly, see module docstring).
    ``restart_interval`` > 0 writes a DRI segment and an RSTn marker
    every that-many MCUs (byte-aligned, DC predictors reset) — the
    error-resilience layout camera/web encoders emit."""
    if n_channels not in (1, 3):
        raise ValueError("n_channels must be 1 or 3")
    if subsample and n_channels != 3:
        raise ValueError("subsample requires 3 channels")
    if len(pixels) != width * height * n_channels:
        raise ValueError(f"need {width * height * n_channels} pixel bytes")
    q = np.ones((8, 8)) if quant is None else np.asarray(
        quant, dtype=np.float64
    ).reshape(8, 8)
    if q.size != 64 or (q < 1).any() or (q > 255).any():
        raise ValueError("quant must be 64 values in 1..255")

    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, n_channels)
    if n_channels == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [img[:, :, 0].astype(np.float64)]

    samp = (
        [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * n_channels
    )
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcux = -(-width // (8 * max_h))
    mcuy = -(-height // (8 * max_v))
    # pad every full-res plane to whole MCUs by edge replication, then
    # box-average subsampled components down to their block grid
    fh, fw = mcuy * 8 * max_v, mcux * 8 * max_h
    planes = [
        np.pad(p, ((0, fh - p.shape[0]), (0, fw - p.shape[1])), mode="edge")
        for p in planes
    ]
    for ci, (hs, vs) in enumerate(samp):
        fy, fx = max_v // vs, max_h // hs
        if fy > 1 or fx > 1:
            p = planes[ci]
            planes[ci] = p.reshape(
                p.shape[0] // fy, fy, p.shape[1] // fx, fx
            ).mean(axis=(1, 3))

    dc_codes = _build_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _build_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    w = _BitWriter()
    prev_dc = [0] * n_channels
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                w.flush()  # byte-align, then the raw (unstuffed) marker
                w.out += bytes([0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8])
                prev_dc = [0] * n_channels
            mcu_count += 1
            for ci, (plane, (hs, vs)) in enumerate(zip(planes, samp)):
                for vy in range(vs):
                    for vx in range(hs):
                        by, bx = my * vs + vy, mx * hs + vx
                        block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                        coef = _C @ block @ _C.T
                        zz = np.rint(coef / q).astype(np.int64).flatten()[_ZIGZAG]
                        diff = int(zz[0]) - prev_dc[ci]
                        prev_dc[ci] = int(zz[0])
                        s = _category(diff)
                        w.write(*dc_codes[s])
                        if s:
                            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                        run = 0
                        nz = np.nonzero(zz[1:])[0]
                        last = nz[-1] + 1 if len(nz) else 0
                        for i in range(1, last + 1):
                            v = int(zz[i])
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                w.write(*ac_codes[0xF0])
                                run -= 16
                            s = _category(v)
                            w.write(*ac_codes[(run << 4) | s])
                            w.write(v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
                        if last < 63:
                            w.write(*ac_codes[0x00])  # EOB
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qz = bytes(int(q.flatten()[_ZIGZAG[i]]) for i in range(64))  # stored zigzag
    dqt = seg(0xFFDB, b"\x00" + qz)
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, n_channels)
        + b"".join(
            struct.pack(">BBB", i + 1, (samp[i][0] << 4) | samp[i][1], 0)
            for i in range(n_channels)
        ),
    )
    dht = seg(
        0xFFC4,
        b"\x00" + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        + b"\x10" + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS),
    )
    sos = seg(
        0xFFDA,
        bytes([n_channels])
        + b"".join(struct.pack(">BB", i + 1, 0x00) for i in range(n_channels))
        + b"\x00\x3f\x00",
    )
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(w.out) + b"\xff\xd9"


# ------------------------------------------------------------ decoder


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int | None:
        while self.nbits < n:
            if self.pos >= len(self.data):
                return None
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def peek16(self) -> int:
        """Next 16 bits without consuming; past end-of-stream pads with
        1s (the encoder's flush fill, so a partially-padded window can
        only match a code whose REAL bits are all present — `skip`
        rejects anything longer than what remains)."""
        while self.nbits < 16 and self.pos < len(self.data):
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        if self.nbits >= 16:
            return (self.acc >> (self.nbits - 16)) & 0xFFFF
        pad = 16 - self.nbits
        return ((self.acc << pad) | ((1 << pad) - 1)) & 0xFFFF

    def skip(self, n: int) -> bool:
        if n > self.nbits:
            return False
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return True


def _huffman_lut(codes: dict[int, tuple[int, int]]) -> np.ndarray:
    """(symbol, length) packed as (sym<<8)|len for every 16-bit window
    starting with that code; 0 = no valid code (len >= 1 for all real
    entries, so 0 is unambiguous). One array lookup replaces the
    bit-by-bit tree walk — the decode hot path."""
    lut = np.zeros(1 << 16, dtype=np.uint32)
    for sym, (code, ln) in codes.items():
        base = code << (16 - ln)
        lut[base : base + (1 << (16 - ln))] = (sym << 8) | ln
    return lut


def _decode_huffman(br: _BitReader, lut: np.ndarray) -> int | None:
    e = int(lut[br.peek16()])
    if e == 0 or not br.skip(e & 0xFF):
        return None
    return e >> 8


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _entropy_segments(b: bytes, j: int) -> tuple[list[bytes], int]:
    """Collect one scan's entropy-coded bytes starting at ``j``:
    unstuff FF00; RST markers (FFD0-FFD7) split the stream into
    restart segments (fresh bit alignment per segment); any other
    marker ends the scan. Returns (segments, index of terminator)."""
    segments: list[bytes] = []
    ent = bytearray()
    while j < len(b):
        byte = b[j]
        if byte == 0xFF:
            nxt = b[j + 1] if j + 1 < len(b) else 0xD9
            if nxt == 0x00:
                ent.append(0xFF)
                j += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(ent))
                ent = bytearray()
                j += 2
                continue
            break
        ent.append(byte)
        j += 1
    segments.append(bytes(ent))
    return segments, j


class _Corrupt(Exception):
    """Internal: any malformed-stream condition inside scan decode —
    caught at the jpeg_decode boundary and turned into None."""


def _read(br: _BitReader, n: int) -> int:
    v = br.read(n)
    if v is None:
        raise _Corrupt
    return v


def _huff(br: _BitReader, lut: np.ndarray) -> int:
    sym = _decode_huffman(br, lut)
    if sym is None:
        raise _Corrupt
    return sym


def _block_seq(br, zz, dc_lut, ac_lut, pred, ci) -> None:
    """One full-spectrum sequential block (baseline): DC diff + AC
    run-lengths into ``zz`` (zigzag-space int64 view)."""
    s = _huff(br, dc_lut)
    if s > 11:
        raise _Corrupt
    if s:
        pred[ci] += _extend(_read(br, s), s)
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        sym = _huff(br, ac_lut)
        if sym == 0x00:
            break
        if sym == 0xF0:
            k += 16
            continue
        run, s = sym >> 4, sym & 0x0F
        k += run
        if k > 63 or s == 0:
            raise _Corrupt
        zz[k] = _extend(_read(br, s), s)
        k += 1


def _block_dc_first(br, zz, dc_lut, pred, ci, al) -> None:
    """Progressive DC, first pass (Ah=0): predictors accumulate in the
    point-transformed domain; the coefficient is pred << Al."""
    s = _huff(br, dc_lut)
    if s > 11:
        raise _Corrupt
    if s:
        pred[ci] += _extend(_read(br, s), s)
    zz[0] = pred[ci] << al


def _block_dc_refine(br, zz, al) -> None:
    """Progressive DC refinement (Ah>0): one bit per block."""
    if _read(br, 1):
        zz[0] = int(zz[0]) | (1 << al)


def _block_ac_first(br, zz, ac_lut, ss, se, al, state) -> None:
    """Progressive AC, first pass over band Ss..Se (T.81 G.1.2.2):
    run/size symbols in the point-transformed domain, EOB-run codes
    (s=0, r<15) skipping 2^r-1+extra whole blocks via state['eobrun']."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        sym = _huff(br, ac_lut)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += _read(br, r)
            break
        k += r
        if k > se:
            raise _Corrupt
        zz[k] = _extend(_read(br, s), s) << al
        k += 1


def _block_ac_refine(br, zz, ac_lut, ss, se, al, state) -> None:
    """Progressive AC refinement (T.81 G.1.2.3): newly-significant
    coefficients arrive as s=1 symbols with a sign bit; every nonzero-
    history coefficient passed over (and, once the EOB run begins, all
    remaining ones in the band) consumes one correction bit."""
    p1, m1 = 1 << al, -1 << al

    def correct(k: int) -> None:
        v = int(zz[k])
        if _read(br, 1) and not (abs(v) & p1):
            zz[k] = v + (p1 if v > 0 else m1)

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            sym = _huff(br, ac_lut)
            r, s = sym >> 4, sym & 0x0F
            if s == 0 and r < 15:
                state["eobrun"] = 1 << r
                if r:
                    state["eobrun"] += _read(br, r)
                break
            if s == 0:  # ZRL in refinement: 16 zero-history positions
                val = 0
            elif s == 1:
                val = p1 if _read(br, 1) else m1
            else:
                raise _Corrupt
            # advance past r zero-history positions, correcting the
            # nonzero-history coefficients passed over
            while k <= se:
                if int(zz[k]) != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:  # EOB region: corrections only
            if int(zz[k]) != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


def jpeg_decode(
    payload: bytes,
    max_pixel_bytes: int = 1 << 28,
    max_decode_bytes: int = 1 << 30,
) -> tuple[int, int, int, bytes] | None:
    """JPEG → ``(width, height, n_channels, pixels)`` (gray for 1
    component, interleaved RGB for 3). Baseline/extended sequential
    (SOF0/1) AND progressive (SOF2: spectral selection + successive
    approximation), interleaved and non-interleaved scans, restart
    intervals. None outside the envelope (module docstring), on
    corrupt streams, above ``max_pixel_bytes`` of OUTPUT, or above
    ``max_decode_bytes`` of decode WORKING SET (~24 B per MCU-padded
    sample: int64 zigzag coefficient state + float64 dequant/IDCT
    planes — the default 1 GB admits ordinary photos to ~14M 3-comp
    padded samples, e.g. 12 MP 4:2:0, while rejecting a ~700 KB file
    whose claimed dims would drive ~5 GB of intermediates) — never an
    exception: at corpus scale corrupt media is data, and an uncaught
    decode error kills the whole Spark stage."""
    b = bytes(payload or b"")
    if b[:2] != b"\xff\xd8":
        return None
    try:
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], np.ndarray] = {}  # (class,id) -> 16-bit LUT
        frame = None
        progressive = False
        dri = 0
        scans = []  # (scomps, Ss, Se, Ah, Al, segments, dri-at-scan)
        i = 2
        while i + 2 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:
                break
            if i + 4 > len(b):
                return None
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            body = b[i + 4 : i + 2 + seglen]
            if len(body) != seglen - 2:
                return None
            if marker == 0xDB:  # DQT (possibly several tables per seg)
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 0x0F
                    n = 64 * (2 if pq else 1)
                    raw = body[j + 1 : j + 1 + n]
                    if len(raw) < n:
                        return None
                    vals = (
                        np.frombuffer(raw, dtype=">u2").astype(np.float64)
                        if pq
                        else np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                    )
                    nat = np.empty(64)
                    nat[_ZIGZAG] = vals  # stored zigzag -> natural
                    qt[tq] = nat.reshape(8, 8)
                    j += 1 + n
            elif marker == 0xC4:  # DHT (possibly several tables per seg)
                j = 0
                while j + 17 <= len(body):
                    tc, th = body[j] >> 4, body[j] & 0x0F
                    bits = list(body[j + 1 : j + 17])
                    nv = sum(bits)
                    vals = list(body[j + 17 : j + 17 + nv])
                    if len(vals) < nv:
                        return None
                    huff[(tc, th)] = _huffman_lut(_build_codes(bits, vals))
                    j += 17 + nv
            elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
                prec, h, w_, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8 or nc not in (1, 3):
                    return None
                comps = []
                for k in range(nc):
                    cid, samp, tq = body[6 + 3 * k : 9 + 3 * k]
                    hs, vs = samp >> 4, samp & 0x0F
                    if hs not in (1, 2) or vs not in (1, 2):
                        return None
                    comps.append((cid, hs, vs, tq))
                frame = (w_, h, comps)
                progressive = marker == 0xC2
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # lossless / arithmetic / hierarchical
            elif marker == 0xDD:  # DRI: restart every `dri` MCUs
                (dri,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:  # SOS: snapshot tables, slurp entropy
                if frame is None:
                    return None
                ns = body[0]
                scomps = []
                for k in range(ns):
                    cid, tbl = body[1 + 2 * k : 3 + 2 * k]
                    scomps.append(
                        (cid, huff.get((0, tbl >> 4)), huff.get((1, tbl & 0x0F)))
                    )
                ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
                segments, i = _entropy_segments(b, i + 2 + seglen)
                scans.append((scomps, ss, se, ahal >> 4, ahal & 0x0F, segments, dri))
                continue
            i += 2 + seglen
        if frame is None or not scans:
            return None
        w_, h, comps = frame
        out_ch = 1 if len(comps) == 1 else 3
        if w_ < 1 or h < 1 or w_ * h * out_ch > max_pixel_bytes:
            return None

        max_h = max(c[1] for c in comps)
        max_v = max(c[2] for c in comps)
        mcux = -(-w_ // (8 * max_h))
        mcuy = -(-h // (8 * max_v))
        geom = {}  # cid -> (hs, vs, tq, non-interleaved block grid)
        for cid, hs, vs, tq in comps:
            nbw = -(-(-(-w_ * hs // max_h)) // 8)
            nbh = -(-(-(-h * vs // max_v)) // 8)
            geom[cid] = (hs, vs, tq, nbw, nbh)
        # Budget the DECODE footprint separately from the output cap:
        # the zigzag coefficient state is int64 (8 B/sample,
        # MCU-padded, per component) and dequant/IDCT work in float64
        # planes (~2 more 8 B copies). Without this, a ~700 KB
        # progressive file claiming max-cap dims drives ~20x
        # max_pixel_bytes of allocations per task (ADVICE r08); with
        # its own cap (not a reuse of the output one) legitimate
        # images well under max_pixel_bytes keep decoding (r09
        # self-review).
        padded_samples = sum(
            (mcux * hs * 8) * (mcuy * vs * 8) for _cid, hs, vs, _tq in comps
        )
        if padded_samples * 24 > max_decode_bytes:
            return None
        # coefficient state in ZIGZAG space, shared across all scans
        coef = {
            c[0]: np.zeros((mcuy * c[2], mcux * c[1], 64), dtype=np.int64)
            for c in comps
        }

        for scomps, ss, se, ah, al, segments, sdri in scans:
            for cid, dc_lut, ac_lut in scomps:
                if cid not in geom:
                    return None
            interleaved = len(scomps) > 1
            is_dc = ss == 0
            if progressive and is_dc and se != 0:
                return None
            if progressive and not is_dc and interleaved:
                return None  # AC scans are single-component by spec
            br = _BitReader(segments[0])
            seg_idx = 0
            unit = 0
            pred = [0] * len(scomps)
            state = {"eobrun": 0}
            if interleaved or (not progressive and len(comps) == 1):
                n_units, unit_shape = mcux * mcuy, "mcu"
                if not interleaved:
                    # single-comp frame: MCU grid == block grid
                    cid = scomps[0][0]
                    n_units = geom[cid][3] * geom[cid][4]
                    unit_shape = "block"
            else:
                cid = scomps[0][0]
                n_units, unit_shape = geom[cid][3] * geom[cid][4], "block"
            for u in range(n_units):
                if sdri and u and u % sdri == 0:
                    seg_idx += 1  # restart: realign, reset predictors
                    if seg_idx >= len(segments):
                        return None
                    br = _BitReader(segments[seg_idx])
                    pred = [0] * len(scomps)
                    state = {"eobrun": 0}
                if unit_shape == "mcu":
                    my, mx = divmod(u, mcux)
                    for ci, (cid, dc_lut, ac_lut) in enumerate(scomps):
                        hs, vs, tq, _, _ = geom[cid]
                        for vy in range(vs):
                            for vx in range(hs):
                                zz = coef[cid][my * vs + vy, mx * hs + vx]
                                if not progressive:
                                    if dc_lut is None or ac_lut is None:
                                        return None
                                    _block_seq(br, zz, dc_lut, ac_lut, pred, ci)
                                elif ah == 0:
                                    if dc_lut is None:
                                        return None
                                    _block_dc_first(br, zz, dc_lut, pred, ci, al)
                                else:
                                    _block_dc_refine(br, zz, al)
                else:
                    cid, dc_lut, ac_lut = scomps[0]
                    nbw = geom[cid][3]
                    by, bx = divmod(u, nbw)
                    zz = coef[cid][by, bx]
                    if not progressive:
                        if dc_lut is None or ac_lut is None:
                            return None
                        _block_seq(br, zz, dc_lut, ac_lut, pred, 0)
                    elif is_dc:
                        if ah == 0:
                            if dc_lut is None:
                                return None
                            _block_dc_first(br, zz, dc_lut, pred, 0, al)
                        else:
                            _block_dc_refine(br, zz, al)
                    else:
                        if ac_lut is None:
                            return None
                        if ah == 0:
                            _block_ac_first(br, zz, ac_lut, ss, se, al, state)
                        else:
                            _block_ac_refine(br, zz, ac_lut, ss, se, al, state)

        # zigzag -> natural, dequantize, IDCT all blocks per component
        planes = []
        for cid, hs, vs, tq in comps:
            if tq not in qt:
                return None
            zz = coef[cid]  # (by, bx, 64) zigzag order
            nat = np.zeros_like(zz)
            nat[:, :, _ZIGZAG] = zz
            blocks = nat.reshape(zz.shape[0], zz.shape[1], 8, 8) * qt[tq]
            pix = np.einsum("xu,ijuv,vy->ijxy", _C.T, blocks, _C) + 128.0
            by, bx = pix.shape[0], pix.shape[1]
            plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
            plane = np.repeat(np.repeat(plane, max_v // vs, 0), max_h // hs, 1)
            planes.append(plane[:h, :w_])
        if out_ch == 1:
            out = planes[0]
            return (w_, h, 1, np.clip(np.rint(out), 0, 255).astype(np.uint8).tobytes())
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.rint(np.stack([r, g, bl], axis=-1)), 0, 255).astype(np.uint8)
        return (w_, h, 3, rgb.tobytes())
    except (_Corrupt, struct.error, IndexError, ValueError):
        return None


# ------------------------------------------------- progressive encoder


def _plane_coefficients(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Quantized DCT coefficients of a padded plane as an
    (nbh, nbw, 64) int64 array in ZIGZAG order."""
    h8, w8 = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(h8, 8, w8, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,ijxy,yv->ijuv", _C, blocks, _C.T)
    return np.rint(coef / q).astype(np.int64).reshape(h8, w8, 64)[:, :, _ZIGZAG]


def jpeg_encode_progressive(
    width: int,
    height: int,
    pixels: bytes,
    n_channels: int = 1,
    quant: list[int] | None = None,
) -> bytes:
    """Progressive JPEG writer (SOF2), 4:4:4: a representative scan
    script exercising BOTH progressive mechanisms — spectral selection
    (DC scan, then AC bands 1-5 and 6-63 per component) and successive
    approximation (every first pass at Al=1, then refinement scans at
    Ah=1/Al=0 carrying the low bit). Progressive reorders TRANSMISSION
    of the same quantized coefficients baseline sends, so
    ``jpeg_decode(jpeg_encode_progressive(img)) ==
    jpeg_decode(jpeg_encode(img))`` bit-exactly — the cross-codec
    honesty check the tests pin."""
    if n_channels not in (1, 3):
        raise ValueError("n_channels must be 1 or 3")
    if len(pixels) != width * height * n_channels:
        raise ValueError(f"need {width * height * n_channels} pixel bytes")
    q = np.ones((8, 8)) if quant is None else np.asarray(
        quant, dtype=np.float64
    ).reshape(8, 8)
    if q.size != 64 or (q < 1).any() or (q > 255).any():
        raise ValueError("quant must be 64 values in 1..255")

    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, n_channels)
    if n_channels == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [img[:, :, 0].astype(np.float64)]
    ph, pw = -height % 8, -width % 8
    coefs = [
        _plane_coefficients(np.pad(p, ((0, ph), (0, pw)), mode="edge"), q)
        for p in planes
    ]
    nbh, nbw = coefs[0].shape[0], coefs[0].shape[1]

    dc_codes = _build_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _build_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    def tz(v: int, al: int) -> int:
        """Point transform: truncation toward zero (AC semantics)."""
        return v >> al if v >= 0 else -((-v) >> al)

    def scan_dc_first(w: _BitWriter, al: int) -> None:
        pred = [0] * n_channels
        for by in range(nbh):
            for bx in range(nbw):
                for ci in range(n_channels):
                    v = int(coefs[ci][by, bx, 0]) >> al  # DC: arithmetic shift
                    diff = v - pred[ci]
                    pred[ci] = v
                    s = _category(diff)
                    w.write(*dc_codes[s])
                    if s:
                        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)

    def scan_dc_refine(w: _BitWriter, al: int) -> None:
        for by in range(nbh):
            for bx in range(nbw):
                for ci in range(n_channels):
                    w.write((int(coefs[ci][by, bx, 0]) >> al) & 1, 1)

    def scan_ac_first(w: _BitWriter, ci: int, ss: int, se: int, al: int) -> None:
        for by in range(nbh):
            for bx in range(nbw):
                zz = coefs[ci][by, bx]
                run = 0
                last_k = ss - 1
                for k in range(ss, se + 1):
                    v = tz(int(zz[k]), al)
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        w.write(*ac_codes[0xF0])
                        run -= 16
                    s = _category(v)
                    w.write(*ac_codes[(run << 4) | s])
                    w.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                    last_k = k
                if last_k < se:
                    w.write(*ac_codes[0x00])  # EOB run of exactly 1

    def scan_ac_refine(w: _BitWriter, ci: int, ss: int, se: int, al: int) -> None:
        for by in range(nbh):
            for bx in range(nbw):
                zz = coefs[ci][by, bx]
                run = 0
                pending: list[int] = []
                ended_at_se = False
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    hist = tz(v, al + 1)  # value known after the prior pass (Ah = al+1)
                    if hist != 0:
                        pending.append(abs(v) & 1)
                    elif v != 0:  # newly significant: |v>>al| == 1
                        while run >= 16:
                            w.write(*ac_codes[0xF0])
                            for bit in pending:
                                w.write(bit, 1)
                            pending = []
                            run -= 16
                        w.write(*ac_codes[(run << 4) | 1])
                        w.write(1 if v > 0 else 0, 1)
                        for bit in pending:
                            w.write(bit, 1)
                        pending = []
                        run = 0
                        ended_at_se = k == se
                    else:
                        run += 1
                        ended_at_se = False
                if not ended_at_se:
                    w.write(*ac_codes[0x00])  # EOB (run 1) + corrections
                    for bit in pending:
                        w.write(bit, 1)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qz = bytes(int(q.flatten()[_ZIGZAG[i]]) for i in range(64))
    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, b"\x00" + qz)
    out += seg(
        0xFFC2,  # SOF2: progressive
        struct.pack(">BHHB", 8, height, width, n_channels)
        + b"".join(struct.pack(">BBB", i + 1, 0x11, 0) for i in range(n_channels)),
    )
    out += seg(
        0xFFC4,
        b"\x00" + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        + b"\x10" + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS),
    )

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        return seg(
            0xFFDA,
            bytes([len(comp_ids)])
            + b"".join(struct.pack(">BB", c + 1, 0x00) for c in comp_ids)
            + bytes([ss, se, (ah << 4) | al]),
        )

    # the scan script: spectral selection x successive approximation
    w = _BitWriter()
    scan_dc_first(w, 1)
    w.flush()
    out += sos(list(range(n_channels)), 0, 0, 0, 1) + w.out
    w = _BitWriter()
    scan_dc_refine(w, 0)
    w.flush()
    out += sos(list(range(n_channels)), 0, 0, 1, 0) + w.out
    for ci in range(n_channels):
        for ss, se in ((1, 5), (6, 63)):
            w = _BitWriter()
            scan_ac_first(w, ci, ss, se, 1)
            w.flush()
            out += sos([ci], ss, se, 0, 1) + w.out
    for ci in range(n_channels):
        for ss, se in ((1, 5), (6, 63)):
            w = _BitWriter()
            scan_ac_refine(w, ci, ss, se, 0)
            w.flush()
            out += sos([ci], ss, se, 1, 0) + w.out
    return bytes(out) + b"\xff\xd9"
