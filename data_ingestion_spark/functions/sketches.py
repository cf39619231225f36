"""Mergeable frequency sketches: count-min over token streams.

Reference anchor: the reference has no corpus-statistics layer at
all (its pipelines move documents; frequency questions go to the
search backend). A training-data pipeline needs cheap answers to
"how often does this token/URL/fingerprint occur across 100 TB"
without a full-cardinality groupBy: boilerplate detection, stopword
discovery, skew-key identification for salting decisions. The
count-min sketch (Cormode & Muthukrishnan 2005) is the standard
answer: a depth x width counter table whose size is CONSTANT in the
corpus (width*depth rows), overestimates only (never under), and
merges across shards by cell-wise addition.

Determinism: bucket hashes are md5-derived (``conv(substr(md5(
depth|value),1,15),16,10) % width``) — bit-identical in any engine
(the embed-oracle pattern), no seed, no JVM-specific xxhash. The
build is explode(depth) → groupBy (depth, bucket): partial
aggregation means the exchange moves at most partitions x depth x
width partial counts — the sketch costs one bounded shuffle no
matter the corpus size, which is precisely why you build a sketch
instead of a full groupBy at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_WIDTH = 256
DEFAULT_DEPTH = 4


def _bucket(value: Column, depth_idx: Column, width: int) -> Column:
    """md5-derived bucket in [0, width): engine-portable, seedless."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(depth_idx.cast("string"), F.lit("|"), value.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (h % width).cast("int")


def cms_build(
    df: DataFrame,
    col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """Count-min sketch of the values in ``col`` (NULLs ignored;
    values hash via their string cast, so use string/integer columns
    — float formatting is engine-specific and would fragment keys):
    one row per (depth_idx, bucket) with the summed count. Cells no
    value hashed into are absent (semantically zero). Sketches over
    different data slices MERGE by unioning and re-summing per
    (depth_idx, bucket) — the property that lets each crawl shard
    sketch locally and a reducer add the tables."""
    j = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("depth_idx")
    return (
        df.select(F.col(col).alias("__v"))
        .filter(F.col("__v").isNotNull())
        .select("__v", j)
        .select("depth_idx", _bucket(F.col("__v"), F.col("depth_idx"), width).alias("bucket"))
        .groupBy("depth_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise addition of sketches built with the same
    (width, depth) — the cross-shard reduce."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("depth_idx", "bucket").agg(F.sum("cnt").alias("cnt"))


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Exact heavy hitters via the classic two-pass sketch pipeline:
    pass 1 builds the count-min sketch; pass 2 re-scans, estimates
    each row's value via ``depth`` broadcast joins against the
    constant-size sketch, keeps rows whose estimate clears the
    threshold, and exact-counts ONLY those. CMS never
    underestimates, so every true heavy hitter survives the filter
    (no false negatives); the final exact count drops the false
    positives — the result EQUALS ``GROUP BY col HAVING count >=
    min_count``, but the aggregation hash state is bounded by the
    candidate set instead of the full vocabulary. That bound is the
    point at 100 TB: a naive groupBy carries vocabulary-sized state
    per executor; this carries |heavy values| (tiny by definition —
    few values can exceed a meaningful threshold).

    Returns (``col``, n) with exact counts, heavy values only.
    """
    from pyspark import StorageLevel

    # the sketch feeds `depth` broadcast subtrees — persist it (it is
    # depth x width rows) so the corpus is scanned once for pass 1,
    # not once per depth row
    # cached blocks are not GC-reclaimed: cache_handles receives the
    # persisted sketch for caller-side unpersist in long-lived drivers
    sketch = cms_build(df, col, width, depth).persist(StorageLevel.MEMORY_AND_DISK)
    if cache_handles is not None:
        cache_handles.append(sketch)
    vals = df.select(F.col(col).alias("__v")).filter(F.col("__v").isNotNull())
    est: Column | None = None
    cur = vals
    for j in range(depth):
        s_j = sketch.filter(F.col("depth_idx") == j).select(
            F.col("bucket").alias(f"__b{j}"), F.col("cnt").alias(f"__c{j}")
        )
        cur = cur.withColumn(f"__b{j}", _bucket(F.col("__v"), F.lit(j), width)).join(
            F.broadcast(s_j), f"__b{j}", "left_outer"
        )
        cj = F.coalesce(F.col(f"__c{j}"), F.lit(0))
        est = cj if est is None else F.least(est, cj)
    return (
        cur.filter(est >= min_count)
        .groupBy(F.col("__v").alias(col))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def heavy_hitters_grouped(
    df: DataFrame,
    group_col: str,
    col: str,
    min_count: int,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    cache_handles: list[DataFrame] | None = None,
    broadcast_max_cells: int = 2_000_000,
) -> DataFrame:
    """Exact heavy hitters PER GROUP — "the tokens appearing ≥ N
    times within each language/host/source", the boilerplate-
    detection report — via the two-pass sketch discipline applied
    group-wise: pass 1 builds a PER-GROUP count-min sketch
    ((group, depth, bucket) cells — at most |groups| × depth × width
    rows), pass 2 re-scans, estimates each (group, value) via
    ``depth`` joins keyed on (group, bucket), keeps rows whose
    estimate clears the threshold (CMS never underestimates — no
    false negatives), and exact-counts only the survivors. The
    result EQUALS ``GROUP BY group, col HAVING count >= min_count``
    (the driver oracle), but the final aggregation's hash state is
    bounded by the per-group candidate sets instead of
    |groups| × vocabulary. For ONE group use ``heavy_hitters``.

    The per-depth sketch slices are BROADCAST while the materialized
    sketch holds ≤ ``broadcast_max_cells`` rows (the language/source
    report shape: dozens of groups); past that — the per-HOST report
    over millions of hosts (r12 verdict #4) — the estimate joins
    switch to shuffle joins keyed (group, bucket), one extra exchange
    per depth, IDENTICAL result (both branches pytest-pinned equal).
    The branch decision costs one count of the already-persisted
    sketch, which pass 2 was going to materialize anyway.

    Returns (group, ``col``, n) with exact counts."""
    from pyspark import StorageLevel

    vals = df.select(
        F.col(group_col).alias("__g"), F.col(col).alias("__v")
    ).filter(F.col("__v").isNotNull() & F.col("__g").isNotNull())
    j = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("depth_idx")
    sketch = (
        vals.select("__g", "__v", j)
        .select(
            "__g",
            "depth_idx",
            _bucket(F.col("__v"), F.col("depth_idx"), width).alias("bucket"),
        )
        .groupBy("__g", "depth_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if cache_handles is not None:
        cache_handles.append(sketch)
    # one count of the persisted sketch picks the join strategy; at
    # |groups| × depth × width cells past the driver's broadcast
    # comfort, a broadcast here is the OOM (the per-host report over
    # millions of hosts), so large sketches estimate via shuffle
    # joins instead — same cells, same min, one exchange per depth
    can_broadcast = sketch.count() <= int(broadcast_max_cells)
    est: Column | None = None
    cur = vals
    for d in range(depth):
        s_d = sketch.filter(F.col("depth_idx") == d).select(
            F.col("__g").alias(f"__sg{d}"),
            F.col("bucket").alias(f"__sb{d}"),
            F.col("cnt").alias(f"__c{d}"),
        )
        cur = cur.withColumn(f"__b{d}", _bucket(F.col("__v"), F.lit(d), width)).join(
            F.broadcast(s_d) if can_broadcast else s_d,
            (F.col("__g") == F.col(f"__sg{d}"))
            & (F.col(f"__b{d}") == F.col(f"__sb{d}")),
            "left_outer",
        )
        cd = F.coalesce(F.col(f"__c{d}"), F.lit(0))
        est = cd if est is None else F.least(est, cd)
    return (
        cur.filter(est >= min_count)
        .groupBy(F.col("__g").alias(group_col), F.col("__v").alias(col))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str = "item",
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """Point-frequency estimates: for each item, min over the depth
    rows of its bucket counts (absent cell = 0). Count-min guarantee:
    estimate >= true count always; overestimate bounded by
    collisions (~2N/width with probability 1 - 2^-depth). The items
    table is tiny (probes), so the probe is a broadcast join against
    the constant-size sketch."""
    probes = items.select(F.col(item_col).alias("__item")).distinct()
    expanded = probes.select(
        "__item",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("depth_idx"),
    ).select(
        "__item",
        "depth_idx",
        _bucket(F.col("__item"), F.col("depth_idx"), width).alias("bucket"),
    )
    joined = expanded.join(F.broadcast(sketch), ["depth_idx", "bucket"], "left_outer")
    return (
        joined.groupBy("__item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate"))
        .select(F.col("__item").alias(item_col), F.col("estimate").cast("bigint").alias("estimate"))
    )


# ------------------------------------------------------- hyperloglog

#: register-index bits: m = 2^p registers (p=11 -> 2048 registers,
#: ~1.04/sqrt(m) ≈ 2.3% standard error, 2048 rows of state forever)
DEFAULT_HLL_P = 11

#: the md5-derived hash is 60 bits (15 hex chars); after p index
#: bits, the remaining word has 60-p bits, so rho ∈ [1, 61-p]
_HLL_HASH_BITS = 60


def _check_hll_p(p: int) -> None:
    """The hardcoded alpha approximation 0.7213/(1+1.079/m) is valid
    only for m >= 128 registers (p >= 7, Flajolet et al. §4); above
    p = 24 the 60-bit hash leaves < 37 rho bits and 16M register rows
    stop being "constant-size" in any useful sense. Guard both ends
    loudly instead of returning a silently biased estimate (r11
    ADVICE)."""
    if not 7 <= p <= 24:
        raise ValueError(f"hll p must be in [7, 24] (alpha approximation needs m>=128), got {p}")


def hll_build(df: DataFrame, col: str, p: int = DEFAULT_HLL_P) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007) for the distinct
    count of ``col``: (bucket, rho) with one row per NONZERO
    register — constant-size (≤ 2^p rows) no matter the input, the
    cardinality mirror of the count-min sketch above ("how many
    distinct URLs/users/fingerprints in 100 TB" without a
    full-cardinality groupBy's per-executor hash state).

    Determinism, the CMS pattern: the hash is md5-derived (60 bits,
    engine-portable, seedless); bucket = low p bits, and rho is the
    1-based position of the least-significant set bit of the
    remaining word (the trailing-zero geometric, statistically
    identical to the leading-zero form) computed EXACTLY in integer
    arithmetic — ``1 + bit_count((w & -w) - 1)`` — never through
    float log2, whose last-ULP could mis-bin a register. An empty
    word (probability 2^-(60-p)) saturates at rho = 61-p. Registers
    from different shards MERGE by per-bucket max (``hll_merge``) —
    the property that lets every shard sketch locally.

    Build cost: one bounded shuffle (partial max per bucket)."""
    _check_hll_p(p)
    m = 1 << p
    h = F.conv(
        F.substring(F.md5(F.col("__v").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    sat = _HLL_HASH_BITS - p + 1
    return (
        df.select(F.col(col).alias("__v"))
        .filter(F.col("__v").isNotNull())
        .select(h.alias("__h"))
        .select(
            (F.col("__h") % m).cast("int").alias("bucket"),
            F.expr(f"__h div {m}").alias("__w"),
        )
        .select(
            "bucket",
            F.when(F.col("__w") == 0, F.lit(sat))
            .otherwise(
                1 + F.bit_count((F.col("__w").bitwiseAND(-F.col("__w"))) - 1)
            )
            .cast("int")
            .alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Per-bucket max of registers built with the same ``p`` — the
    cross-shard reduce (max is idempotent/commutative/associative,
    so replays and re-merges are harmless)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, p: int = DEFAULT_HLL_P) -> DataFrame:
    """ONE row (m, nonzero, inv_sum_scaled, est) from a register
    table. The harmonic-mean denominator is computed as an EXACT
    integer: S = Σ_registers 2^(K − rho) (empty registers contribute
    2^K), K = 61 − p — a BIGINT sum is associative, so partitioning
    and aggregation order cannot flap the result (the integer-micros
    discipline). The only floats are the final scalar estimate
    (alpha·m²·2^K / S, one fixed-order expression) and the
    small-range linear-counting branch m·ln(m/V) when the raw
    estimate ≤ 2.5m with V empty registers — the standard HLL
    correction."""
    _check_hll_p(p)
    m = 1 << p
    k = _HLL_HASH_BITS - p + 1  # max rho; 2^(k-rho) ∈ [1, 2^k]
    agg = sketch.agg(
        F.count(F.lit(1)).alias("nonzero"),
        F.sum(F.expr(f"cast(shiftleft(cast(1 as bigint), {k} - rho) as bigint)"))
        .alias("__s_nonzero"),
    )
    s_total = (
        F.coalesce(F.col("__s_nonzero"), F.lit(0))
        + (F.lit(m) - F.col("nonzero")) * F.lit(1 << k)
    ).cast("bigint")
    raw = (
        F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
        * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(1 << k))
        / F.col("inv_sum_scaled")
    )
    v = F.lit(m) - F.col("nonzero")
    return (
        agg.select(
            F.lit(m).alias("m"),
            F.col("nonzero").cast("bigint").alias("nonzero"),
            s_total.alias("inv_sum_scaled"),
        )
        .select(
            "m",
            "nonzero",
            "inv_sum_scaled",
            F.when(
                (raw <= 2.5 * m) & (v > 0),
                F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))),
            )
            .otherwise(F.round(raw))
            .cast("bigint")
            .alias("est"),
        )
    )


def hll_build_grouped(
    df: DataFrame, group_col: str, col: str, p: int = DEFAULT_HLL_P
) -> DataFrame:
    """Per-group HLL registers — (group, bucket, rho), at most 2^p
    rows PER GROUP no matter how many values the group saw: the
    curation-report cardinality shape ("distinct users per event
    type / URLs per host / fingerprints per day") where a
    countDistinct per group carries per-group hash state that grows
    with the answer. Same integer-exact register arithmetic as
    ``hll_build`` (md5 hash, trailing-zero rho via bit_count);
    sketches from different shards merge by per-(group, bucket) max
    (``hll_merge_grouped``). One bounded shuffle: |groups| × 2^p
    partial-max cells."""
    _check_hll_p(p)
    m = 1 << p
    sat = _HLL_HASH_BITS - p + 1
    h = F.conv(
        F.substring(F.md5(F.col("__v").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    return (
        df.select(F.col(group_col).alias("__g"), F.col(col).alias("__v"))
        .filter(F.col("__v").isNotNull() & F.col("__g").isNotNull())
        .select("__g", h.alias("__h"))
        .select(
            "__g",
            (F.col("__h") % m).cast("int").alias("bucket"),
            F.expr(f"__h div {m}").alias("__w"),
        )
        .select(
            "__g",
            "bucket",
            F.when(F.col("__w") == 0, F.lit(sat))
            .otherwise(1 + F.bit_count((F.col("__w").bitwiseAND(-F.col("__w"))) - 1))
            .cast("int")
            .alias("rho"),
        )
        .groupBy("__g", "bucket")
        .agg(F.max("rho").alias("rho"))
        .select(F.col("__g").alias(group_col), "bucket", "rho")
    )


def hll_merge_grouped(group_col: str, *sketches: DataFrame) -> DataFrame:
    """Per-(group, bucket) max of grouped registers built with the
    same ``p`` — the cross-shard reduce (idempotent)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (
        out.groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_grouped(
    sketch: DataFrame, group_col: str, p: int = DEFAULT_HLL_P
) -> DataFrame:
    """One row PER GROUP (group, m, nonzero, inv_sum_scaled, est) —
    the ``hll_estimate`` arithmetic applied group-wise: BIGINT
    harmonic denominator per group (associative — partitioning
    cannot flap it), raw estimate + the linear-counting small-range
    branch. Groups absent from the sketch (no non-NULL values) are
    absent here — no values means no estimate, not a zero."""
    _check_hll_p(p)
    m = 1 << p
    k = _HLL_HASH_BITS - p + 1
    agg = sketch.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("nonzero"),
        F.sum(F.expr(f"cast(shiftleft(cast(1 as bigint), {k} - rho) as bigint)"))
        .alias("__s_nonzero"),
    )
    s_total = (
        F.coalesce(F.col("__s_nonzero"), F.lit(0))
        + (F.lit(m) - F.col("nonzero")) * F.lit(1 << k)
    ).cast("bigint")
    raw = (
        F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
        * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(1 << k))
        / F.col("inv_sum_scaled")
    )
    v = F.lit(m) - F.col("nonzero")
    return (
        agg.select(
            group_col,
            F.lit(m).alias("m"),
            F.col("nonzero").cast("bigint").alias("nonzero"),
            s_total.alias("inv_sum_scaled"),
        )
        .select(
            group_col,
            "m",
            "nonzero",
            "inv_sum_scaled",
            F.when(
                (raw <= 2.5 * m) & (v > 0),
                F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))),
            )
            .otherwise(F.round(raw))
            .cast("bigint")
            .alias("est"),
        )
    )


# ------------------------------------------------------- bloom filter

#: default filter geometry: 2^17 bits = 2048 BIGINT words;
#: k=4 probes -> ~1% false positives at ~13k inserted keys
DEFAULT_BLOOM_BITS = 1 << 17
DEFAULT_BLOOM_K = 4


def _bloom_pos(value: Column, j: Column, m_bits: int) -> Column:
    """md5-derived bit position in [0, m_bits) for probe j — the
    CMS bucket pattern, engine-portable and seedless."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(j.cast("string"), F.lit("|"), value.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (h % m_bits).cast("bigint")


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = DEFAULT_BLOOM_BITS,
    k: int = DEFAULT_BLOOM_K,
) -> DataFrame:
    """Bloom filter over ``col`` as a REAL bitmap in relational
    form: (word_idx, word) rows, word = BIGINT holding 63 filter
    bits (shift ≤ 62 keeps the word positive — ANSI engines reject
    1<<63 on a signed 64-bit integer, and the oracle must replicate
    the bitmap bit for bit), at most ceil(m_bits/63) rows no matter
    the input — small enough to
    BROADCAST, which is the whole point: "have we crawled this URL /
    seen this fingerprint" over a 100 TB candidate stream becomes a
    broadcast probe instead of shuffling the candidates against the
    seen-set (the classic crawler frontier dedup, Broder &
    Mitzenmacher's survey). Guarantee: NO false negatives ever;
    false positives at the standard (1 - e^(-kn/m))^k rate — the
    safe direction for a frontier (a false positive skips a
    re-fetch, never fetches a forbidden duplicate... the candidate
    survives exact dedup downstream anyway).

    Deterministic end-to-end: md5-derived positions, bit_or word
    aggregation (commutative/associative/idempotent — partitioning,
    duplicates, and replays cannot change a bit). Filters from
    different shards MERGE by per-word bit_or (``bloom_merge``).
    Build cost: one bounded shuffle (≤ m_bits/64 groups)."""
    j = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("j")
    pos = _bloom_pos(F.col("__v"), F.col("j"), m_bits)
    return (
        df.select(F.col(col).alias("__v"))
        .filter(F.col("__v").isNotNull())
        .select("__v", j)
        .select(pos.alias("__pos"))
        .select(
            F.expr("__pos div 63").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(__pos % 63 as int))").alias("__m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__m").alias("word"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Per-word bitwise OR of filters built with the same
    (m_bits, k) — the cross-shard reduce; idempotent, so replays
    and re-merges are harmless."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    col: str,
    m_bits: int = DEFAULT_BLOOM_BITS,
    k: int = DEFAULT_BLOOM_K,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """candidates + ``maybe_seen`` boolean: true iff ALL k probe
    bits are set (the no-false-negative test). SHUFFLE-FREE on the
    candidate side (the ``cms_estimate``/``heavy_hitters`` pattern,
    r11 verdict): k sequential broadcast left-joins against the
    constant-size filter table (≤ ceil(m_bits/63) rows), one per
    probe position, folded with AND — the candidate stream never
    enters an exchange, which is the whole point of probing a
    broadcastable seen-set over 100 TB of candidates. Duplicate
    candidate rows are trivially preserved (each row is mapped
    independently; no rowid regroup needed). A NULL candidate key
    was never inserted (the build filters NULLs), so ``maybe_seen``
    is FALSE for NULL keys — coalesced explicitly, never NULL
    (r11 ADVICE: a NULL verdict silently drops the row from both
    ``maybe_seen`` and ``~maybe_seen`` filters).

    The filter feeds k broadcast subtrees; persistence ownership is
    ALWAYS the caller's (r12 ADVICE — this function never silently
    persists the caller's frame, which would leak executor cache in
    long-lived drivers and mutate caller cache state): either persist
    the filter before calling, or pass ``cache_handles`` to receive
    the persist this function performs on your behalf (unpersist the
    handles when done). With neither, the probe is still correct but
    the filter BUILD (a scan of the whole seen-set) runs once per
    probe position — persist in anything hot."""
    from pyspark import StorageLevel

    if bloom.storageLevel == StorageLevel.NONE and cache_handles is not None:
        bloom = bloom.persist(StorageLevel.MEMORY_AND_DISK)
        cache_handles.append(bloom)
    elif bloom.storageLevel == StorageLevel.NONE and k > 1:
        # r13 ADVICE: make the k× rebuild visible — the probe is
        # correct either way, but an unpersisted filter re-runs the
        # whole seen-set scan once per probe position
        import warnings

        warnings.warn(
            f"bloom_probe: the filter DataFrame is unpersisted, so its "
            f"build (a full seen-set scan) will run {k}x — once per probe "
            "position. Persist it first, or pass cache_handles to receive "
            "a persist handle.",
            RuntimeWarning,
            stacklevel=2,
        )
    cur = candidates
    cond: Column | None = None
    probe_cols: list[str] = []
    for j in range(k):
        wi, wd, mk = f"__wi{j}", f"__w{j}", f"__m{j}"
        probe_cols += [wi, wd, mk]
        cur = (
            cur.withColumn("__pos", _bloom_pos(F.col(col), F.lit(j), m_bits))
            .withColumn(wi, F.expr("__pos div 63"))
            .withColumn(mk, F.expr("shiftleft(cast(1 as bigint), cast(__pos % 63 as int))"))
            .drop("__pos")
            .join(
                F.broadcast(
                    bloom.select(F.col("word_idx").alias(wi), F.col("word").alias(wd))
                ),
                wi,
                "left_outer",
            )
        )
        hit_j = F.coalesce(
            F.coalesce(F.col(wd), F.lit(0)).bitwiseAND(F.col(mk)) != 0, F.lit(False)
        )
        cond = hit_j if cond is None else cond & hit_j
    return cur.withColumn("maybe_seen", cond).drop(*probe_cols)
