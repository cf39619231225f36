"""Property-based tests (hypothesis) for the pure-Python kernels.

These run without the JVM: the HTML→Markdown converter and the
recursive splitter are plain functions, so hypothesis can hammer them
with adversarial inputs cheaply. Invariants from SURVEY.md §5.2.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from data_ingestion_spark.functions.html import html_to_markdown
from data_ingestion_spark.functions.textops import recursive_character_split

# text that exercises separators, unicode, and degenerate whitespace
texts = st.text(
    alphabet=st.sampled_from(list("abc XYZ\n.!?#`-*0937éß中")), min_size=0, max_size=600
)


@settings(max_examples=200, deadline=None)
@given(texts, st.integers(20, 200), st.integers(0, 19))
def test_recursive_split_invariants(text, size, overlap):
    chunks = recursive_character_split(text, chunk_size=size, chunk_overlap=overlap)
    # 1. every chunk fits
    assert all(len(c) <= size for c in chunks)
    # 2. no empty/whitespace-only chunks
    assert all(c.strip() for c in chunks)
    # 3. nothing is invented: every chunk's content appears in the text
    #    (modulo the strip applied at merge boundaries)
    for c in chunks:
        assert c.strip() in text or all(piece in text for piece in c.split())
    # 4. coverage: every non-space character class present in input
    #    survives somewhere (content is never silently dropped)
    if text.strip():
        assert chunks, "non-empty text must produce at least one chunk"


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=500))
def test_html_to_markdown_never_crashes(raw):
    """Arbitrary (including malformed) input must never raise — the
    parser is the first stage after the network fetch, and scraped
    HTML is hostile (unclosed tags, stray <, entities)."""
    title, md = html_to_markdown(raw)
    assert isinstance(title, str) and isinstance(md, str)
    assert "\xa0" not in md  # nbsp always normalized


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 4), st.text(st.sampled_from("abc d"), min_size=1, max_size=30)),
        min_size=1,
        max_size=10,
    )
)
def test_html_headings_roundtrip(sections):
    """Well-formed heading structures convert to the matching ATX
    markdown levels, in order."""
    html = "".join(f"<h{lv}>{t}</h{lv}>" for lv, t in sections if t.strip())
    _, md = html_to_markdown(html)
    got = [ln for ln in md.splitlines() if ln.startswith("#")]
    expect = [
        "#" * lv + " " + " ".join(t.split()) for lv, t in sections if t.strip()
    ]
    assert [g.split(" ", 1)[0] for g in got] == [e.split(" ", 1)[0] for e in expect]


# --------------------------------------------- media header roundtrips

from data_ingestion_spark.functions.multimodal import (  # noqa: E402
    jpeg_bytes,
    parse_audio_header,
    parse_image_header,
    png_bytes,
    wav_bytes,
)


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 2**31 - 1), st.integers(1, 2**31 - 1),
       st.sampled_from([1, 2, 4, 8, 16]))
def test_png_header_roundtrip(w, h, depth):
    assert parse_image_header(png_bytes(w, h, depth)) == ("png", w, h, depth)


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 65535), st.integers(1, 65535), st.sampled_from([8, 12]))
def test_jpeg_header_roundtrip(w, h, depth):
    assert parse_image_header(jpeg_bytes(w, h, depth)) == ("jpeg", w, h, depth)


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 8), st.sampled_from([8000, 16000, 44100, 48000]),
       st.sampled_from([8, 16, 24, 32]), st.integers(0, 10000))
def test_wav_header_roundtrip(ch, rate, bits, n):
    assert parse_audio_header(wav_bytes(ch, rate, bits, n)) == (
        "wav", ch, rate, bits, n
    )


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_header_parsers_never_raise_on_garbage(blob):
    """Corrupt files are data, not exceptions: any byte blob either
    parses to a tuple or returns None — never raises."""
    for fn in (parse_image_header, parse_audio_header):
        out = fn(blob)
        assert out is None or isinstance(out, tuple)


#: valid seeds for the pixel-decoder mutation property — one per
#: codec envelope, built once at import (the encoders are pure)
def _pixel_seed_payloads():
    from data_ingestion_spark.functions.jpeg import jpeg_encode
    from data_ingestion_spark.functions.pixels import (
        bmp_encode,
        gif_encode,
        png_encode,
    )

    from data_ingestion_spark.functions.jpeg import jpeg_encode_progressive

    return [
        png_encode(5, 4, bytes(range(20))),
        png_encode(3, 3, bytes(range(27)), color_type=2, filter_type=4),
        png_encode(4, 2, bytes(8), color_type=3, palette=bytes(768)),
        png_encode(6, 5, bytes(range(30)), filter_type=4, interlace=True),
        gif_encode(5, 4, bytes(range(20))),
        gif_encode(4, 4, bytes(16), interlace=True),
        bmp_encode(5, 4, bytes(range(60))),
        jpeg_encode(5, 4, bytes(range(20))),
        jpeg_encode_progressive(8, 8, bytes(range(64))),
    ]


_PIXEL_SEEDS = _pixel_seed_payloads()


@settings(max_examples=400, deadline=None)
@given(
    st.integers(0, len(_PIXEL_SEEDS) - 1),
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 255)),
        min_size=0, max_size=8,
    ),
    st.integers(1, 10**6),
)
def test_pixel_decoders_never_raise_on_mutations(seed_idx, flips, cut):
    """Mutations of VALID images reach decode paths random blobs never
    touch (inflate, unfilter, LZW, palette expansion): any byte-flip +
    truncation either decodes to a contract-true tuple
    (len(pixels) == w*h*ch) or returns None — never raises, because
    one uncaught decode exception kills a whole Spark stage and
    corrupt media is guaranteed data at corpus scale."""
    from data_ingestion_spark.functions.pixels import decode_pixel_payload

    b = bytearray(_PIXEL_SEEDS[seed_idx])
    for pos, val in flips:
        b[pos % len(b)] = val
    blob = bytes(b[: max(1, cut % (len(b) + 1))])
    out = decode_pixel_payload(blob)
    if out is not None:
        fmt, w, h, ch, px = out
        assert w >= 1 and h >= 1 and len(px) == w * h * ch


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 65535), st.integers(1, 65535))
def test_truncated_headers_return_none(w, h):
    """Every strict prefix of a valid header either parses to the SAME
    dims (headers are prefix-decodable past the size fields) or
    returns None — never garbage dims."""
    for blob, fmt in ((png_bytes(w, h), "png"), (jpeg_bytes(w, h), "jpeg")):
        full = parse_image_header(blob)
        for cut in range(0, len(blob), 7):
            got = parse_image_header(blob[:cut])
            assert got is None or got == full


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(-1e6, 1e6, allow_nan=False),
            st.just(float("nan")),  # nulls interleaved: not events
        ),
        min_size=1,
        max_size=60,
    ),
    st.lists(st.integers(1, 60), min_size=1, max_size=6),
    st.floats(0.01, 0.99),
)
def test_ewma_vectorized_matches_naive_over_any_batching(values, cuts, alpha):
    """The vectorized state update (pandas ewm + seeded carry-in) must
    equal the naive per-row recursion no matter how the rows split
    into micro-batches — including splits where an entire leading
    batch is all-NaN (state must then record 'no prior', not seed the
    recursion with the 0.0 placeholder)."""
    import math

    import pandas as pd

    from data_ingestion_spark.streaming.stateful import _ewma_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self.get = None

        def update(self, v):
            self.exists, self.get = True, v

    # split values into batches at the (cyclic) cut sizes
    batches, i = [], 0
    for c in cuts:
        if i >= len(values):
            break
        batches.append(values[i : i + c])
        i += c
    if i < len(values):
        batches.append(values[i:])

    update = _ewma_fn(alpha)
    state = FakeState()
    ts = 0
    out = None
    for b in batches:
        pdf = pd.DataFrame({"ts": range(ts, ts + len(b)), "value": b})
        ts += len(b)
        out = list(update((7,), iter([pdf]), state))[-1]

    real = [v for v in values if not math.isnan(v)]
    ewma = None
    for v in real:
        ewma = v if ewma is None else alpha * v + (1 - alpha) * ewma
    n, st_ewma = state.get
    assert n == len(real)
    if ewma is None:
        assert st_ewma == 0.0  # placeholder, flagged by n == 0
    else:
        rel = max(1.0, abs(ewma))
        assert abs(st_ewma - ewma) / rel < 1e-9
    assert out["n_events"][0] == len(real)


def test_ewma_kernel_ignores_null_values():
    """Null/NaN values are not events: excluded from both the counter
    and the recursion (explicitly, rather than relying on pandas ewm's
    silent NaN skip disagreeing with the counter)."""
    import math

    import pandas as pd

    from data_ingestion_spark.streaming.stateful import _ewma_fn

    class FakeState:
        exists = False
        get = None

        def update(self, v):
            self.exists, self.get = True, v

    update = _ewma_fn(0.5)
    state = FakeState()
    pdf = pd.DataFrame({"ts": [1, 2, 3, 4], "value": [1.0, None, 3.0, float("nan")]})
    out = list(update((1,), iter([pdf]), state))[-1]
    n, ewma = state.get
    assert n == 2  # only the two real values counted
    assert math.isclose(ewma, 0.5 * 3.0 + 0.5 * 1.0)
    assert out["n_events"][0] == 2


def test_ewma_all_null_first_batch_does_not_seed_zero():
    """Regression: an all-null first micro-batch writes state (0, 0.0);
    the next batch must treat that as NO prior — first real value v
    yields ewma == v, not alpha*v."""
    import math

    import pandas as pd

    from data_ingestion_spark.streaming.stateful import _ewma_fn

    class FakeState:
        exists = False
        get = None

        def update(self, v):
            self.exists, self.get = True, v

    update = _ewma_fn(0.3)
    state = FakeState()
    b1 = pd.DataFrame({"ts": [1, 2], "value": [None, float("nan")]})
    list(update((1,), iter([b1]), state))
    assert state.get == (0, 0.0)
    b2 = pd.DataFrame({"ts": [3], "value": [10.0]})
    out = list(update((1,), iter([b2]), state))[-1]
    n, ewma = state.get
    assert n == 1
    assert math.isclose(ewma, 10.0), "first real value must seed, not mix with 0.0"
    assert out["ewma_value"][0] == 10.0


# ------------------------------------------------------ r09: PDF LZW


@given(st.binary(min_size=0, max_size=4000))
@settings(max_examples=300, deadline=None)
def test_pdf_lzw_roundtrip_any_bytes(data):
    """functions/pdf.py::_lzw_decode_pdf inverts the independent
    MSB-first EarlyChange encoder for ARBITRARY byte strings — width
    growth, table refill and EOD all land on the spec schedule, not
    just on the handful of fixed vectors in test_pdf.py."""
    from data_ingestion_spark.functions.pdf import _lzw_decode_pdf
    from tests.test_pdf import _lzw_encode_pdf

    assert _lzw_decode_pdf(_lzw_encode_pdf(data), 1 << 20) == data


@given(st.binary(min_size=1, max_size=300), st.integers(0, 2**32 - 1))
@settings(max_examples=300, deadline=None)
def test_pdf_lzw_decode_never_raises(data, seed):
    """Arbitrary (non-encoded) bytes through the decoder: None or
    bytes, never an exception, output never past the cap."""
    from data_ingestion_spark.functions.pdf import _lzw_decode_pdf

    out = _lzw_decode_pdf(data, 4096)
    assert out is None or (isinstance(out, bytes) and len(out) <= 4096)
