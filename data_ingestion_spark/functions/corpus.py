"""Corpus assembly operators for training-data pipelines.

The reference stops at chunk→embed→index (ingestion-pipeline.py); a
training-data pipeline additionally needs the corpus-level export
steps: deterministic sampling, train/val/test splitting, per-source
balancing, sequence packing, eval-set decontamination, and mixture
weighting. Every operator here is a pure JVM-side expression/window/
join plan (no UDFs, no collect), keyed so the one shuffle it needs is
the one it would need at 100 TB.

Determinism contract: all randomness is md5-keyed (bit-identical in
every engine), never ``rand()`` — a re-run on the same corpus yields
the same sample/split/order, which is what makes ablations and
incremental re-exports reproducible.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window, functions as F

from .textops import token_count


def hash_key(col: Column, seed: str) -> Column:
    """Deterministic per-row sampling key: md5(seed|value), uniform on
    hex strings. Lexicographic thresholds select reproducible subsets
    (``'1a' ≈ 10.2%``) with no shuffle at all — the filter rides the
    scan."""
    return F.md5(F.concat(F.lit(seed + "|"), col.cast("string")))


def hash_sample(id_col: str, threshold_hex: str, seed: str = "smp") -> Column:
    """Boolean sampling predicate: keep rows whose hash key sorts below
    ``threshold_hex``. Map-side only; composes with any downstream
    plan. (Takes the column NAME, not a DataFrame — the predicate is
    unbound and applies to whatever plan it is filtered into.)"""
    return hash_key(F.col(id_col), seed) < F.lit(threshold_hex)


#: split boundaries over the first hex digit of the split key:
#: 0-b → train (12/16 = 75%), c-d → val (12.5%), e-f → test (12.5%).
SPLIT_BOUNDS = (("train", "c"), ("val", "e"))


def split_assign(id_col: Column, seed: str = "split") -> Column:
    """Deterministic train/val/test assignment from one hex digit of
    the row's hash key — stable under corpus growth (a doc's split
    never changes when other docs are added, unlike modulo-on-count
    schemes)."""
    digit = F.substring(hash_key(id_col, seed), 1, 1)
    expr = F.when(digit < SPLIT_BOUNDS[0][1], F.lit("train")).when(
        digit < SPLIT_BOUNDS[1][1], F.lit("val")
    )
    return expr.otherwise(F.lit("test"))


def per_source_quota(
    df: DataFrame,
    part_col: str,
    id_col: str,
    quota: int,
    seed: str = "quota",
    skew_guard: bool = False,
    guard_factor: int = 4,
    verify_guard: bool = False,
) -> DataFrame:
    """Balance a corpus by capping each source at ``quota`` docs,
    chosen by deterministic hash order (an unbiased, reproducible
    per-source sample — NOT "first N by id", which biases toward old
    docs). One shuffle on ``part_col``; the window never sees more
    than one source per partition.

    Skew: a hot source shuffles its whole group to one task. With
    ``skew_guard=True`` a map-side hash pre-filter thins each source
    to ~``guard_factor``×quota expected survivors BEFORE the window:
    per-source counts (one tiny aggregate, broadcast back) set a
    per-source keep fraction, and only rows whose hash prefix falls
    under it reach the shuffle. The gate keeps exactly the
    smallest-hash rows — a superset of the window's winners whenever
    ≥ quota rows survive, which at guard_factor=4 holds with
    overwhelming probability (Chernoff bound: P[<quota of 4·quota
    expected] < e^{-quota}); sources smaller than
    guard_factor×quota pass through unfiltered, so the guard can
    only act where the law of large numbers already protects it.

    Precondition (guarded and unguarded alike): ``id_col`` should be
    unique and non-null. NULL ids hash to NULL, tie in the window
    order (run-dependent survivors — same as the plain window), and
    pass the gate unthinned to preserve exactness — so a hot source
    that is mostly NULL ids gets no thinning from the guard. Mint an
    id first (e.g. md5 of content) for such corpora.

    The guard is probabilistic: if, against the Chernoff odds, fewer
    than ``quota`` rows of a ≥-quota source survive the gate, the
    guarded result under-returns. ``verify_guard=True`` adds an eager
    safety net — one tiny aggregate over the thinned frame (≈
    guard_factor×quota rows per source) compares survivors against
    quota; on any shortfall it warns and falls back to the exact
    unguarded window for the whole frame. Off by default to keep the
    function lazy.

    Raises ValueError if ``df`` already carries one of the helper
    columns (``__psq_part_key``, ``__psq_n_src``) or the output rank
    column ``rk`` — they would be silently clobbered or corrupt the
    guard join.
    """
    pk, ns = "__psq_part_key", "__psq_n_src"
    clash = [c for c in (pk, ns, "rk") if c in df.columns]
    if clash:
        raise ValueError(
            f"per_source_quota: input columns {clash} collide with helper/"
            "output columns — rename them first"
        )
    key = hash_key(F.col(id_col), seed)
    original = df
    if skew_guard:
        counts = df.groupBy(
            F.col(part_col).alias(pk)
        ).agg(F.count(F.lit(1)).alias(ns))
        # keep fraction of the source, mapped onto the first 8 hex
        # chars of the key (uniform on [0, 2^32))
        frac = F.least(
            F.lit(1.0), F.lit(float(guard_factor * quota)) / F.col(ns)
        )
        bound = F.ceil(frac * F.lit(float(1 << 32))).cast("bigint")
        # null-safe join + null-key passthrough: the unguarded window
        # groups NULL sources and sorts NULL hash keys first, so the
        # gate must neither drop a NULL part_col row (equi-join would)
        # nor a NULL id_col row (whose hash, hence conv(), is NULL)
        gate = (
            F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") < bound
        ) | key.isNull()
        df = (
            df.join(
                F.broadcast(counts),
                F.col(part_col).eqNullSafe(F.col(pk)),
            )
            .filter(gate)
            .drop(pk, ns)
        )
        if verify_guard:
            # anchor the check on COUNTS, not survivors: a source whose
            # rows were ALL gated out has no survivor group at all, and
            # an inner join would drop exactly the total-loss case the
            # net exists to catch. Left join + coalesce(0) keeps it;
            # eqNullSafe keeps a NULL-part_col source comparable.
            surv = df.groupBy(F.col(part_col).alias("__psq_sk")).agg(
                F.count(F.lit(1)).alias("__psq_surv")
            )
            shorted = (
                counts.join(surv, F.col(pk).eqNullSafe(F.col("__psq_sk")), "left")
                .filter(
                    (F.col(ns) >= quota)
                    & (F.coalesce(F.col("__psq_surv"), F.lit(0)) < quota)
                )
                .count()
            )
            if shorted:
                warnings.warn(
                    f"per_source_quota skew_guard under-returned for {shorted} "
                    "source(s); falling back to the exact unguarded window",
                    RuntimeWarning,
                    stacklevel=2,
                )
                df = original
    w = Window.partitionBy(part_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= quota)
    )


def pack_sequences(
    df: DataFrame,
    part_col: str | list[str],
    order_col: str,
    text_col: str,
    budget: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Sequence packing for LLM pretraining: documents are concatenated
    in deterministic order and chopped into ``budget``-token context
    windows; ``bin_id`` = the window each document STARTS in (standard
    concat-then-chop packing — documents may straddle window
    boundaries). Pure window cumsum partitioned by ``part_col`` — the
    pack is per-shard, which is exactly how a 1000-executor export
    runs it (a global pack order would serialize the corpus through
    one partition).

    Determinism requires a total order within each shard:
    ``order_col`` must be unique per ``part_col`` group (current
    callers order by doc_id, which is). If it is not, pass a unique
    ``tiebreak_col`` — otherwise ties make cum_tokens/bin_id
    run-dependent.

    Output adds: n_tokens (BPE-ish token count), cum_tokens (running
    total within the shard), bin_id.
    """
    parts = [part_col] if isinstance(part_col, str) else list(part_col)
    order = [F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    w = (
        Window.partitionBy(*parts)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = token_count(F.col(text_col))
    return (
        df.withColumn("n_tokens", n_tok.cast("int"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .withColumn(
            "bin_id",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(budget)).cast("bigint"),
        )
    )


def word_ngrams(col: Column, n: int) -> Column:
    """Distinct word n-grams (the dedup shingle helper, parameterized
    here for the decontamination overlap join)."""
    words = F.split(col, " ")
    n_sh = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )


def decontaminate_overlap(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    min_overlap: int = 3,
    broadcast: bool | None = None,
    max_broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """Train/eval contamination check: count distinct word ``n``-grams
    each corpus doc shares with each eval doc; pairs at or above
    ``min_overlap`` are contamination hits to drop before export.

    Plan: invert both sides on the n-gram and equi-join — pairs only
    materialize where an n-gram is shared. The eval side is usually
    tiny (benchmarks are small; the corpus is the big side), so its
    inverted index is broadcast and the corpus-side explode never
    shuffles — but "small by construction" is measured, not assumed:
    with ``broadcast=None`` (auto) the eval side's total WORD count
    is aggregated first (one cheap scan of the small side, no
    explode; distinct n-grams per doc ≤ words per doc, so this is a
    true upper bound on the (eval_id, ngram) index rows — long-doc
    eval sets are bounded correctly, not just doc counts). Above
    ``max_broadcast_rows`` (~2M index rows ≈ low hundreds of MB,
    comfortably under Spark's broadcast limit) the hint is dropped
    and the join degrades to a shuffle join instead of failing
    mid-broadcast. Pass ``broadcast=True`` / ``False`` to skip the
    measurement and force either plan (False also keeps the function
    fully lazy). Output: (doc_id, eval_id, n_overlap), one row per
    contaminated (corpus, eval) pair.
    """
    corpus_inv = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("g"),
    )
    eval_inv = eval_df.select(
        F.col(id_col).alias("eval_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("g"),
    )
    if broadcast is None:
        upper = eval_df.agg(
            F.sum(F.size(F.split(F.col(text_col), " "))).alias("w")
        ).collect()[0]["w"]
        broadcast = (upper or 0) <= max_broadcast_rows
    right = F.broadcast(eval_inv) if broadcast else eval_inv
    return (
        corpus_inv.join(right, "g")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def decontaminate_fuzzy(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    min_jaccard_micros: int = 500_000,
    cache_handles: list[DataFrame] | None = None,
    max_eval_rows: int = 1_000_000,
) -> DataFrame:
    """FUZZY train/eval contamination: corpus docs that are NEAR
    duplicates of an eval doc (n-gram Jaccard ≥ threshold), found by
    cross-corpus banded MinHash — the leakage `decontaminate_overlap`
    misses when a benchmark item was lightly paraphrased or
    whitespace-mangled before landing in the crawl.

    Plan (the 100 TB shape): both sides get the SAME banded signature
    table (``dedup.band_table`` — shared definition, cannot fork);
    the eval side is tiny so its band table BROADCASTS and the
    corpus-side pipeline never shuffles for candidate generation —
    cost is linear in corpus shingles, never corpus × eval.
    Candidates (any shared band) are then EXACTLY verified: shingle
    intersections are counted only for candidate corpus docs
    (semi-join pushdown), unions come from per-doc distinct-shingle
    counts, and the threshold test is integer cross-multiplication
    (``n_inter · 1e6 ≥ micros · n_union``) — no float division to
    flap a boundary pair. Output: (doc_id, eval_id, n_inter,
    n_union), one row per contaminated pair that shares ≥ 1 band AND
    clears the Jaccard bar (banding is the probabilistic recall dial
    — raise num_hashes/lower band_size for more; the DQ oracle
    replicates bands + verify exactly, so the contract is
    deterministic even where recall is tunable).

    The candidate table feeds three subtrees (its own output gate,
    the corpus-shingle pushdown, the pair semi-join), so it is
    persisted here — otherwise the corpus band pipeline (the one
    corpus-wide shuffle) would run three times. ``cache_handles``
    receives the persisted frame for caller-side unpersist
    (the heavy_hitters/bloom_probe contract). Candidate-bounded
    tables are broadcast into the shingle stream — contamination
    hits are rare by construction (an eval set is tiny), so the
    candidate set is broadcast-sized; a degenerate corpus where
    everything bands against the eval set should go through exact
    dedup first (the DEFAULT_MAX_BUCKET argument).

    The eval side must actually BE tiny: its band table, shingle
    stream, and size table all broadcast, so a mis-call with a
    corpus-sized "eval" frame would OOM the driver three joins deep
    with an opaque broadcast error. ``max_eval_rows`` guards it up
    front (the DEFAULT_MAX_BUCKET loud-refusal discipline): one
    bounded count of ``eval_df``, and past the cap the call refuses
    with the fix in the message — swap the sides or run banded
    dedup (``minhash_lsh_candidates``) across the union instead."""
    from pyspark import StorageLevel

    from .dedup import band_table, word_shingles

    n_eval = eval_df.limit(int(max_eval_rows) + 1).count()
    if n_eval > int(max_eval_rows):
        raise ValueError(
            f"decontaminate_fuzzy broadcasts the EVAL side (bands, "
            f"shingles, sizes); eval_df has > {max_eval_rows} rows — "
            "this would OOM the driver. Pass the small benchmark set "
            "as eval_df (swap the arguments), raise max_eval_rows "
            "only if the driver can hold the eval shingle stream, or "
            "use minhash_lsh_candidates over the union for "
            "corpus-x-corpus near-dup detection"
        )
    c_bands = band_table(corpus, text_col, id_col, shingle_n, num_hashes, band_size)
    e_bands = band_table(eval_df, text_col, id_col, shingle_n, num_hashes, band_size)
    cand = (
        c_bands.join(F.broadcast(e_bands.withColumnRenamed("id", "eval_id")),
                     ["band", "band_hash"])
        .select(F.col("id").alias("doc_id"), "eval_id")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if cache_handles is not None:
        cache_handles.append(cand)
    c_sh = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("s"),
    )
    e_sh = eval_df.select(
        F.col(id_col).alias("eval_id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("s"),
    )
    # verify only candidate docs: the broadcast semi-join prunes the
    # corpus shingle stream to docs that banded against some eval doc
    c_sh_cand = c_sh.join(
        F.broadcast(cand.select("doc_id").distinct()), "doc_id", "leftsemi"
    )
    inter = (
        c_sh_cand.join(F.broadcast(e_sh), "s")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .join(F.broadcast(cand), ["doc_id", "eval_id"], "leftsemi")
    )
    c_sizes = c_sh_cand.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__na"))
    e_sizes = e_sh.groupBy("eval_id").agg(F.count(F.lit(1)).alias("__nb"))
    return (
        inter.join(c_sizes, "doc_id")
        .join(F.broadcast(e_sizes), "eval_id")
        .withColumn("n_union", (F.col("__na") + F.col("__nb") - F.col("n_inter")).cast("bigint"))
        .filter(F.col("n_inter") * 1_000_000 >= F.lit(min_jaccard_micros) * F.col("n_union"))
        .select("doc_id", "eval_id", F.col("n_inter").cast("bigint").alias("n_inter"), "n_union")
    )


def mix_weights(df: DataFrame, part_col: str, text_col: str) -> DataFrame:
    """Mixture weighting: per-source doc/token counts, corpus share,
    and the up/down-sampling weight that equalizes the mixture
    (weight = target_share / actual_share with a uniform target).
    Shape: one partial+final hash aggregate to ~|sources| rows, then
    window totals over that tiny result — nothing corpus-sized moves
    twice."""
    per = df.groupBy(part_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy()
    share = (F.col("n_docs") / F.sum("n_docs").over(w)).cast("double")
    k = F.count(F.lit(1)).over(w)
    return per.select(
        part_col,
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("share"),
        F.round((F.lit(1.0) / k) / share, 6).alias("weight"),
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "shuf",
) -> DataFrame:
    """Deterministic global training-order shuffle WITHOUT a global
    sort — the export step that turns a curated corpus into the
    (shard, position) layout data loaders consume (epoch order =
    read shards in id order, rows in position order). Every training
    run wants its corpus shuffled; at 100 TB a total-order sort is a
    full-cluster range exchange, and rand() breaks retry/AQE
    determinism. Instead:

    - ``shard_id``  = first 8 md5(id|seed) hex chars mod n_shards —
      a uniform, engine-portable hash bucket (ONE hash exchange);
    - ``shard_pos`` = row_number within the shard ordered by the
      FULL md5 key (a within-partition sort after the same
      exchange — no second shuffle).

    The concatenated (shard_id, shard_pos) order is a fixed
    pseudo-random permutation of the corpus: reproducible across
    reruns, retries, engines, and partitionings (the hash_sample /
    weighted_sample md5 discipline), and writable as
    ``partitionBy(shard_id)`` without any further movement. A new
    ``seed`` is a fresh permutation (per-epoch reshuffles).

    Returns the input columns plus (shard_id int, shard_pos int).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    for c in ("shard_id", "shard_pos", "__sk"):
        if c in df.columns:
            raise ValueError(
                f"shuffle_shards: input column {c!r} collides — rename it"
            )
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"|{seed}")))
    keyed = df.withColumn("__sk", key).withColumn(
        "shard_id",
        F.pmod(
            F.conv(F.substring(F.col("__sk"), 1, 8), 16, 10).cast("bigint"),
            F.lit(int(n_shards)),
        ).cast("int"),
    )
    w = Window.partitionBy("shard_id").orderBy(F.col("__sk"), F.col(id_col))
    return keyed.withColumn(
        "shard_pos", F.row_number().over(w)
    ).drop("__sk")


def mixture_temperature_weights(
    df: DataFrame, part_col: str, alpha: float = 0.5
) -> DataFrame:
    """Temperature-smoothed mixture weights — the exponent-α domain/
    language reweighting every multi-source LLM corpus uses (the
    multilingual sampling exponent of XLM-R/mBERT, the per-dataset
    mixture dials of GPT-3/Pile): a source with corpus share p_s
    gets target share

        q_s = p_s^α / Σ_t p_t^α       (α=1: natural; α=0: uniform)

    and each of its ROWS a resampling weight q_s / p_s, so feeding
    the weight to ``weighted_sample`` draws the temperature mixture
    directly (rare sources up, dominant sources down, smoothly).
    ``mix_weights`` is the α=0 special case with a different
    normalization.

    Output: (part_col, n_docs, share, temp_share, weight), shares and
    weight rounded 6dp (the BM25 float discipline: fixed expression
    shape over exact integer counts). Plan: one partial+final agg to
    |sources| rows; window totals touch only that tiny result.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    per = df.groupBy(part_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy()
    # two window stages (a window cannot nest inside another window's
    # argument) — both run over the |sources|-row aggregate, not data
    staged = per.withColumn(
        "__p", F.col("n_docs") / F.sum("n_docs").over(w)
    ).withColumn("__pa", F.pow(F.col("__p"), F.lit(float(alpha))))
    q = F.col("__pa") / F.sum("__pa").over(w)
    return staged.select(
        part_col,
        "n_docs",
        F.round(F.col("__p"), 6).alias("share"),
        F.round(q, 6).alias("temp_share"),
        F.round(q / F.col("__p"), 6).alias("weight"),
    )


def mixture_epoch_plan(
    df: DataFrame,
    part_col: str,
    tokens_col,
    token_budget: int,
    alpha: float = 0.5,
    max_epochs: int | None = None,
) -> DataFrame:
    """Token-budgeted mixture plan — the data-constrained scaling
    arithmetic (Muennighoff et al. 2023: when the token budget
    exceeds a source's supply you REPEAT it, and repeating past ~4
    epochs stops helping; the per-dataset epoch tables of
    GPT-3/Pile): given per-source token supply and a temperature-α
    target mixture, how many tokens does each source contribute to a
    ``token_budget`` run, and how many EPOCHS of that source is
    that?

        p_s      = T_s / ΣT                 (token share, not doc share)
        q_s      ∝ p_s^α                    (the mixture_temperature_weights dial)
        target_s = round(q_s · B)
        alloc_s  = min(target_s, max_epochs · T_s)   (the repeat cap)
        epochs_s = alloc_s / T_s            (micros — >1e6 ⇒ source repeats)

    ``capped`` marks sources whose ask exceeded the repeat cap — the
    signal to either raise α (flatten less) or accept a smaller run;
    the capped surplus is NOT redistributed (the iterative
    refill is a planning loop, not an operator — run the plan, read
    the report, re-dial). Epochs are INTEGER MICROS (positive
    numerator div), so the plan is bit-deterministic cross-engine.
    Sources with zero tokens are excluded — they have nothing to
    sample and would divide the epoch count by zero. Plan: one
    partial-agg shuffle to |sources| rows; the two window totals run
    over that tiny aggregate (the mixture_temperature_weights
    shape)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    if token_budget < 1:
        raise ValueError(f"token_budget must be >= 1, got {token_budget}")
    if max_epochs is not None and max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    tok = tokens_col if not isinstance(tokens_col, str) else F.col(tokens_col)
    per = df.groupBy(part_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok).cast("bigint").alias("tokens"),
    ).filter(F.col("tokens") > 0)
    w = Window.partitionBy()
    staged = per.withColumn(
        "__p", F.col("tokens") / F.sum("tokens").over(w)
    ).withColumn("__pa", F.pow(F.col("__p"), F.lit(float(alpha))))
    q6 = F.round(F.col("__pa") / F.sum("__pa").over(w), 6)
    planned = staged.withColumn(
        "target_tokens",
        F.round(q6 * F.lit(int(token_budget))).cast("bigint"),
    )
    if max_epochs is not None:
        alloc = F.least(
            F.col("target_tokens"), F.lit(int(max_epochs)) * F.col("tokens")
        )
    else:
        alloc = F.col("target_tokens")
    return (
        planned.withColumn("__alloc", alloc.cast("bigint"))
        .select(
            part_col,
            "n_docs",
            "tokens",
            F.round(F.col("__p"), 6).alias("share"),
            q6.alias("temp_share"),
            "target_tokens",
            # DECIMAL(38,0) for the ×1e6 blow-up (r16 ADVICE): a
            # trillion-token alloc (>~9.2e12) would overflow 2^63 in
            # the bigint multiply; 38 digits hold 9.2e18·1e6 with room
            # (the markov_transitions precedent)
            F.expr(
                "(cast(__alloc as decimal(38,0)) * 1000000) div tokens"
            )
            .cast("bigint")
            .alias("epochs_micros"),
            (F.col("__alloc") < F.col("target_tokens")).alias("capped"),
        )
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    by: str | None = None,
    seed: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement —
    Efraimidis & Spirakis 2006 (A-Res): each row draws a key
    ``-ln(u) / w`` from a hash-derived uniform ``u`` and its weight
    ``w``; the ``n`` SMALLEST keys are a exact weighted sample
    without replacement. This is how a training-data pipeline
    samples by QUALITY score (or upweights rare languages) instead
    of uniformly — ``hash_sample`` keeps a fixed fraction uniformly,
    ``per_source_quota`` caps counts; this picks n rows with
    inclusion probability proportional to weight, deterministically.

    ``u`` comes from md5(id|seed) (the cross-engine uniform: first 8
    hex chars → (0,1], the ``hash_sample`` discipline), so reruns —
    and the DuckDB oracle — draw identical keys; no RNG state, no
    ``rand()`` non-reproducibility across retries/partitions.
    Rows with NULL or non-positive weight are excluded (they have no
    defined inclusion probability).

    ``by=None``: global top-n — plans as TakeOrderedAndProject (a
    map-side heap of n per partition; no global sort). ``by=col``:
    top-n PER GROUP via one window over (group, key) — one exchange.
    Returns the sampled rows with a ``sample_rank`` column (1 = the
    strongest draw).

    Float note: ``ln`` follows the BM25/PMI float discipline — both
    engines evaluate the same expression tree in float64; selection
    boundaries are decided by key gaps astronomically wider than one
    ulp at any real corpus size.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if "__key" in df.columns or "sample_rank" in df.columns:
        raise ValueError(
            "weighted_sample: input column __key/sample_rank collides — "
            "rename it first"
        )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"|{seed}"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)
    w = F.col(weight_col).cast("double")
    keyed = df.filter(w.isNotNull() & (w > 0)).withColumn(
        "__key", -F.log(u) / w
    )
    if by is None:
        ranked = (
            keyed.orderBy(F.col("__key").asc(), F.col(id_col).asc())
            .limit(n)
            .withColumn(
                "sample_rank",
                F.row_number().over(
                    Window.orderBy(F.col("__key").asc(), F.col(id_col).asc())
                ),
            )
        )
    else:
        ranked = keyed.withColumn(
            "sample_rank",
            F.row_number().over(
                Window.partitionBy(by).orderBy(
                    F.col("__key").asc(), F.col(id_col).asc()
                )
            ),
        ).filter(F.col("sample_rank") <= n)
    return ranked.drop("__key")
