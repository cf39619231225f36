"""Training-data export query registrations.

Corpus-assembly operators a training-data pipeline runs after
clean/dedup (functions/corpus.py): deterministic sampling,
train/val/test splitting, per-source balancing, sequence packing,
eval decontamination, mixture weighting. All md5-keyed (bit-identical
in Spark and DuckDB) so every operator is oracle-checkable; none uses
``rand()`` — re-runs are reproducible by construction.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .functions import corpus as C
from .functions.textops import TOKEN_PATTERN
from .queries import _d, q

_MD5_ID = "md5('{seed}|' || CAST(doc_id AS VARCHAR))"
_NTOK = f"len(regexp_extract_all(text, '{TOKEN_PATTERN}'))"


@q(
    "sample_hash_deterministic",
    "SELECT doc_id, lang, source FROM documents "
    "WHERE " + _MD5_ID.format(seed="smp") + " < '1a'",
)
def sample_hash_deterministic(spark, sf_dir):
    """Deterministic ~10% corpus sample via md5-lex threshold — a pure
    map-side filter (rides the scan, no shuffle, reproducible across
    runs and engines; ``TABLESAMPLE``/``rand()`` are neither)."""
    d = _d(spark, sf_dir)
    return d.filter(C.hash_sample("doc_id", "1a")).select("doc_id", "lang", "source")


@q(
    "train_val_test_split",
    "SELECT doc_id, CASE "
    "WHEN substr(" + _MD5_ID.format(seed="split") + ", 1, 1) < 'c' THEN 'train' "
    "WHEN substr(" + _MD5_ID.format(seed="split") + ", 1, 1) < 'e' THEN 'val' "
    "ELSE 'test' END AS split FROM documents",
)
def train_val_test_split(spark, sf_dir):
    """Hash-keyed train/val/test assignment (75/12.5/12.5): a doc's
    split never changes as the corpus grows (modulo-on-row-count
    schemes reshuffle everything on every append)."""
    return _d(spark, sf_dir).select(
        "doc_id", C.split_assign(F.col("doc_id")).alias("split")
    )


@q(
    "per_source_quota",
    "SELECT doc_id, source, CAST(rk AS INTEGER) AS rk FROM ("
    "SELECT doc_id, source, row_number() OVER ("
    "PARTITION BY source ORDER BY " + _MD5_ID.format(seed="quota") + ", doc_id"
    ") AS rk FROM documents) WHERE rk <= 15",
)
def per_source_quota(spark, sf_dir):
    """Corpus balancing: cap every source at 15 docs chosen by hash
    order (an unbiased reproducible per-source sample). One shuffle on
    source; see functions.corpus.per_source_quota for the hot-source
    skew note."""
    return C.per_source_quota(_d(spark, sf_dir), "source", "doc_id", 15).select(
        "doc_id", "source", "rk"
    )


@q(
    "pack_sequences",
    "SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens, "
    "CAST(cum_tokens AS BIGINT) AS cum_tokens, "
    "CAST(floor((cum_tokens - n_tokens) / 2048) AS BIGINT) AS bin_id FROM ("
    f"SELECT doc_id, lang, {_NTOK} AS n_tokens, "
    f"sum({_NTOK}) OVER (PARTITION BY lang ORDER BY doc_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens "
    "FROM documents)",
)
def pack_sequences(spark, sf_dir):
    """Sequence packing (concat-then-chop): deterministic doc order
    per shard, running token total, bin_id = the 2048-token context
    window each doc starts in. Per-shard window cumsum — the pack
    parallelizes across shards instead of serializing the corpus
    through one global ordering."""
    return C.pack_sequences(_d(spark, sf_dir), "lang", "doc_id", "text", 2048).select(
        "doc_id", "lang", "n_tokens", "cum_tokens", "bin_id"
    )


_DUCK_3GRAMS = (
    "unnest(list_distinct(list_transform("
    "generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)), "
    "i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))))"
)


@q(
    "decontaminate_eval_overlap",
    f"WITH cg AS (SELECT doc_id, {_DUCK_3GRAMS} AS g FROM documents WHERE doc_id % 97 <> 0), "
    f"eg AS (SELECT doc_id AS eval_id, {_DUCK_3GRAMS} AS g FROM documents WHERE doc_id % 97 = 0) "
    "SELECT c.doc_id, e.eval_id, count(*) AS n_overlap "
    "FROM cg c JOIN eg e ON c.g = e.g "
    "GROUP BY c.doc_id, e.eval_id HAVING count(*) >= 3",
)
def decontaminate_eval_overlap(spark, sf_dir):
    """Train/eval contamination scan: corpus docs sharing >= 3 distinct
    word 3-grams with any eval doc (stand-in eval set: doc_id % 97;
    production uses longer n-grams — 3 here so the tiny synthetic
    vocabulary still produces hits to verify). Inverted n-gram
    equi-join with the tiny eval side BROADCAST — the corpus-side
    explode never shuffles, so cost is linear in corpus n-grams at
    100 TB."""
    d = _d(spark, sf_dir)
    ev = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    return C.decontaminate_overlap(corpus, ev, "text", "doc_id", n=3, min_overlap=3)


def _fuzzy_decon_oracle() -> str:
    """DuckDB twin of the full fuzzy-decontamination pipeline:
    constructed eval set (perturbed corpus docs + unrelated docs),
    banded MinHash on BOTH sides (the _minhash_oracle machinery),
    band-equi candidates, exact shingle intersect/union verify with
    the integer cross-multiplied threshold."""
    from .queries_vector import _duck_shingles

    mh = ", ".join(
        "list_aggregate(list_transform(shingles, s -> md5('mh|" + str(i) + "|' || s)), 'min')"
        f" AS mh_{i}"
        for i in range(8)
    )

    def bands(src: str) -> str:
        return " UNION ALL ".join(
            f"SELECT id, {b} AS band, md5(mh_{2*b} || '|' || mh_{2*b+1}) AS band_hash "
            f"FROM {src}"
            for b in range(4)
        )

    return (
        "WITH ev AS ("
        "SELECT doc_id + 1000000 AS id, text || ' eval suffix tail' AS text "
        "FROM documents WHERE doc_id % 50 = 0 "
        "UNION ALL SELECT doc_id + 2000000 AS id, "
        "'totally unrelated benchmark item number ' || CAST(doc_id AS VARCHAR) AS text "
        "FROM documents WHERE doc_id % 97 = 0), "
        f"csh AS (SELECT doc_id AS id, {_duck_shingles()} AS shingles FROM documents), "
        f"esh AS (SELECT id, {_duck_shingles()} AS shingles FROM ev), "
        f"csigs AS (SELECT id, shingles, {mh} FROM csh), "
        f"esigs AS (SELECT id, shingles, {mh} FROM esh), "
        f"cb AS ({bands('csigs')}), eb AS ({bands('esigs')}), "
        "cand AS (SELECT DISTINCT cb.id AS doc_id, eb.id AS eval_id FROM cb "
        "JOIN eb ON cb.band = eb.band AND cb.band_hash = eb.band_hash), "
        "v AS (SELECT c.doc_id, c.eval_id, "
        "CAST(len(list_intersect(cs.shingles, es.shingles)) AS BIGINT) AS n_inter, "
        "CAST(len(cs.shingles) + len(es.shingles) "
        "- len(list_intersect(cs.shingles, es.shingles)) AS BIGINT) AS n_union "
        "FROM cand c JOIN csh cs ON cs.id = c.doc_id "
        "JOIN esh es ON es.id = c.eval_id) "
        "SELECT doc_id, eval_id, n_inter, n_union FROM v "
        "WHERE n_inter * 1000000 >= 500000 * n_union"
    )


@q("decontaminate_fuzzy", _fuzzy_decon_oracle())
def decontaminate_fuzzy(spark, sf_dir):
    """FUZZY decontamination (r12) — the leakage exact n-gram overlap
    misses: benchmark items lightly paraphrased before landing in the
    crawl. Constructed eval set = perturbed copies of every 50th
    corpus doc (suffix appended — high-Jaccard near-dups that MUST be
    caught) + unrelated synthetic items (negatives that must not).
    Cross-corpus banded MinHash: the eval band table BROADCASTS
    against the corpus band table (candidate generation linear in
    corpus shingles, never corpus × eval), then exact shingle
    intersect/union verify with the integer cross-multiplied Jaccard
    threshold. Oracle replicates bands AND verify, so the
    probabilistic recall dial has a deterministic contract."""
    d = _d(spark, sf_dir).select("doc_id", "text")
    ev = (
        d.filter(F.col("doc_id") % 50 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" eval suffix tail")).alias("text"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 97 == 0).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(
                    F.lit("totally unrelated benchmark item number "),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
            )
        )
    )
    return C.decontaminate_fuzzy(d, ev, "text", "doc_id")




@q(
    "training_export_pipeline",
    "WITH surv AS (SELECT doc_id, lang, text FROM ("
    "SELECT doc_id, lang, text, min(doc_id) OVER (PARTITION BY md5(text)) AS canon "
    "FROM documents WHERE len(string_split(text, ' ')) >= 30) WHERE doc_id = canon), "
    "s AS (SELECT doc_id, lang, text, CASE "
    "WHEN substr(" + _MD5_ID.format(seed="split") + ", 1, 1) < 'c' THEN 'train' "
    "WHEN substr(" + _MD5_ID.format(seed="split") + ", 1, 1) < 'e' THEN 'val' "
    "ELSE 'test' END AS split FROM surv), "
    f"tok AS (SELECT doc_id, lang, split, {_NTOK} AS n_tokens FROM s), "
    "c AS (SELECT doc_id, lang, split, n_tokens, "
    "sum(n_tokens) OVER (PARTITION BY split, lang ORDER BY doc_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens FROM tok) "
    "SELECT doc_id, lang, split, CAST(n_tokens AS INTEGER) AS n_tokens, "
    "CAST(cum_tokens AS BIGINT) AS cum_tokens, "
    "CAST(floor((cum_tokens - n_tokens) / 2048) AS BIGINT) AS bin_id FROM c",
)
def training_export_pipeline(spark, sf_dir):
    """Capstone: the full corpus→training-set export as ONE lazy plan —
    length gate → exact-dedup survivor selection (min doc_id per md5
    fingerprint, via window: no second scan and no join back) →
    hash-keyed split assignment (map-side) → per-(split, shard)
    sequence packing. Catalyst sees the whole composition: the length
    filter pushes below both windows' shuffles, and the split CASE
    costs nothing extra. Shuffle count end-to-end: fingerprint window
    + pack window = 2, at any corpus size."""
    from pyspark.sql import Window

    d = _d(spark, sf_dir)
    surv = (
        d.filter(F.size(F.split(F.col("text"), " ")) >= 30)
        .withColumn(
            "canon", F.min("doc_id").over(Window.partitionBy(F.md5(F.col("text"))))
        )
        .filter(F.col("doc_id") == F.col("canon"))
        .withColumn("split", C.split_assign(F.col("doc_id")))
    )
    return C.pack_sequences(surv, ["split", "lang"], "doc_id", "text", 2048).select(
        "doc_id", "lang", "split", "n_tokens", "cum_tokens", "bin_id"
    )


@q(
    "token_budget_sample",
    "SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens, "
    "CAST(cum_tokens AS BIGINT) AS cum_tokens FROM ("
    f"SELECT doc_id, lang, {_NTOK} AS n_tokens, "
    f"sum({_NTOK}) OVER (PARTITION BY lang ORDER BY "
    + _MD5_ID.format(seed="tb")
    + ", doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens "
    "FROM documents) WHERE cum_tokens <= 2000",
)
def token_budget_sample(spark, sf_dir):
    """Token-budget curation: per language, take documents in
    deterministic hash order until a 2k-token budget fills — the
    'give me X tokens per language, reproducibly' primitive behind
    mixture construction. One shuffle on the language key; hash order
    makes the selection an unbiased sample rather than an
    oldest-docs-first bias."""
    from .functions.textops import token_count

    d = _d(spark, sf_dir)
    w = (
        Window.partitionBy("lang")
        .orderBy(C.hash_key(F.col("doc_id"), "tb"), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("n_tokens", token_count(F.col("text")).cast("int"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .filter(F.col("cum_tokens") <= 2000)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


@q(
    "mix_weights_by_source",
    "WITH per AS (SELECT source, count(*) AS n_docs, "
    f"CAST(sum({_NTOK}) AS BIGINT) AS n_tokens FROM documents GROUP BY source) "
    "SELECT source, n_docs, n_tokens, "
    "round(n_docs / (SELECT sum(n_docs) FROM per), 6) AS share, "
    "round((1.0 / (SELECT count(*) FROM per)) / "
    "(n_docs / (SELECT sum(n_docs) FROM per)), 6) AS weight FROM per",
)
def mix_weights_by_source(spark, sf_dir):
    """Mixture weighting: per-source doc/token counts, corpus share,
    and the up/down-sampling weight that flattens the mixture to a
    uniform target. One aggregate to |sources| rows, window totals on
    the tiny result only."""
    return C.mix_weights(_d(spark, sf_dir), "source", "text")


_WS_KEY = (
    "-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|ws'), 1, 8)) "
    "AS BIGINT) + 1.0) / 4294967297.0) / CAST(n_chars AS DOUBLE)"
)


@q(
    "weighted_sample_quality",
    "WITH keyed AS (SELECT doc_id, lang, "
    f"{_WS_KEY} AS k "
    "FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0), "
    "r AS (SELECT doc_id, lang, "
    "CAST(row_number() OVER (PARTITION BY lang ORDER BY k, doc_id) AS INTEGER) "
    "AS sample_rank FROM keyed) "
    "SELECT doc_id, lang, sample_rank FROM r WHERE sample_rank <= 20",
)
def weighted_sample_quality(spark, sf_dir):
    """Deterministic weighted sampling without replacement (r14
    Y-series, Efraimidis-Spirakis A-Res): 20 documents PER LANGUAGE
    with inclusion probability proportional to n_chars — the
    quality-weighted curation draw (uniform hash_sample keeps a
    fraction; this PICKS n by weight). Keys are -ln(u)/w with u from
    md5(id|seed), so the oracle draws bit-identical keys and the
    hash certifies the key arithmetic, the weight/NULL exclusions,
    and the per-group rank window together."""
    d = _d(spark, sf_dir).select("doc_id", "lang", "n_chars")
    return C.weighted_sample(
        d, "n_chars", 20, id_col="doc_id", by="lang"
    ).select("doc_id", "lang", "sample_rank")


@q(
    "mixture_temperature_weights",
    "WITH per AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs "
    "FROM documents GROUP BY lang), "
    "s AS (SELECT lang, n_docs, "
    "n_docs * 1.0 / (SELECT sum(n_docs) FROM per) AS p FROM per), "
    "t AS (SELECT lang, n_docs, p, pow(p, 0.5) AS pa FROM s) "
    "SELECT lang, n_docs, round(p, 6) AS share, "
    "round(pa / (SELECT sum(pa) FROM t), 6) AS temp_share, "
    "round((pa / (SELECT sum(pa) FROM t)) / p, 6) AS weight FROM t",
)
def mixture_temperature_weights(spark, sf_dir):
    """Temperature-smoothed mixture weights (r15 — the exponent-α
    sampling of XLM-R/mBERT, the per-dataset mixture dials of
    GPT-3/Pile; corpus.py::mixture_temperature_weights): q_s ∝
    p_s^0.5 lifts rare languages and damps the dominant one; the
    weight column q_s/p_s is the per-row resampling factor
    weighted_sample consumes. One agg to |langs| rows; the two
    window totals run over that tiny result."""
    return C.mixture_temperature_weights(_d(spark, sf_dir), "lang", 0.5)


@q(
    "mixture_temperature_sample",
    "WITH per AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs "
    "FROM documents GROUP BY lang), "
    "s AS (SELECT lang, n_docs * 1.0 / (SELECT sum(n_docs) FROM per) AS p "
    "FROM per), "
    "t AS (SELECT lang, p, pow(p, 0.5) AS pa FROM s), "
    "w AS (SELECT lang, "
    "round((pa / (SELECT sum(pa) FROM t)) / p, 6) AS weight FROM t), "
    "keyed AS (SELECT d.doc_id, d.lang, "
    "-ln((CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|ws'), 1, 8)) "
    "AS BIGINT) + 1.0) / 4294967297.0) / w.weight AS k "
    "FROM documents d JOIN w ON d.lang = w.lang), "
    "r AS (SELECT doc_id, lang, "
    "CAST(row_number() OVER (ORDER BY k, doc_id) AS INTEGER) AS sample_rank "
    "FROM keyed) "
    "SELECT doc_id, lang, sample_rank FROM r WHERE sample_rank <= 100",
)
def mixture_temperature_sample(spark, sf_dir):
    """The temperature mixture DRAWN (r15): per-language α=0.5
    weights joined onto documents (broadcast — |langs| rows), then
    Efraimidis-Spirakis A-Res picks 100 docs globally with inclusion
    probability ∝ weight. Rare languages surface at ~√-scaled rates
    instead of their raw shares — the actual resampling step of a
    mixture-balanced training corpus, deterministic under retries
    (md5-derived uniforms; the oracle draws bit-identical keys, so
    the hash certifies weights → keys → global rank in one go)."""
    d = _d(spark, sf_dir).select("doc_id", "lang")
    w = C.mixture_temperature_weights(d, "lang", 0.5).select("lang", "weight")
    return C.weighted_sample(
        d.join(F.broadcast(w), "lang"), "weight", 100, id_col="doc_id"
    ).select("doc_id", "lang", "sample_rank")


@q(
    "export_shuffle_shards",
    "WITH keyed AS (SELECT doc_id, "
    "md5(CAST(doc_id AS VARCHAR) || '|shuf') AS sk FROM documents), "
    "sh AS (SELECT doc_id, sk, CAST("
    "CAST(('0x' || substr(sk, 1, 8)) AS BIGINT) % 8 AS INTEGER) AS shard_id "
    "FROM keyed) "
    "SELECT doc_id, shard_id, CAST(row_number() OVER "
    "(PARTITION BY shard_id ORDER BY sk, doc_id) AS INTEGER) AS shard_pos "
    "FROM sh",
)
def export_shuffle_shards(spark, sf_dir):
    """Deterministic training-order shuffle into loader shards (r15;
    corpus.py::shuffle_shards): md5-keyed shard assignment (one hash
    exchange) + within-shard position (same exchange, no global
    sort) — the export step between curation and the data loader.
    (shard_id, shard_pos) is a fixed pseudo-random permutation,
    reproducible across retries/engines; the oracle rebuilds the
    identical keys, buckets, and positions, so the hash certifies
    the whole permutation."""
    return C.shuffle_shards(
        _d(spark, sf_dir).select("doc_id"), 8, id_col="doc_id"
    ).select("doc_id", "shard_id", "shard_pos")


_CE_LM_TOK = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
    "x -> len(x) > 0)"
)


@q(
    "curation_export_pipeline",
    # stage 1 — CCNet LM scoring (the quality_lm_logprob arithmetic)
    f"WITH tok AS (SELECT doc_id, {_CE_LM_TOK} AS ws FROM documents), "
    "bi AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM tok, "
    "unnest(generate_series(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 2), "
    f"rtok AS (SELECT {_CE_LM_TOK} AS ws FROM documents WHERE lang = 'en'), "
    "rbi AS (SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM rtok, "
    "unnest(generate_series(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 2), "
    "model AS (SELECT w1, w2, count(*) AS cp FROM rbi GROUP BY 1, 2), "
    "ctx AS (SELECT w1, sum(cp) AS cc FROM model GROUP BY 1), "
    "v AS (SELECT count(DISTINCT t) AS v FROM "
    "(SELECT unnest(ws) AS t FROM rtok)), "
    "scored AS (SELECT b.doc_id, CAST(round(ln("
    "(COALESCE(c.cc, 0) + 1.0 * (SELECT v FROM v)) * 1.0 / "
    "(COALESCE(m.cp, 0) + 1)) * 1000000) AS BIGINT) AS nlp "
    "FROM bi b LEFT JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2 "
    "LEFT JOIN ctx c ON b.w1 = c.w1), "
    "doc AS (SELECT doc_id, CAST(sum(nlp) // count(*) AS BIGINT) AS "
    "nll_micros FROM scored GROUP BY doc_id), "
    # stage 2 — perplexity terciles, drop the tail
    "b2 AS (SELECT doc_id, CASE ntile(3) OVER (ORDER BY nll_micros, doc_id) "
    "WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket "
    "FROM doc), "
    "kept AS (SELECT b2.doc_id, b2.bucket, d.lang FROM b2 "
    "JOIN documents d ON b2.doc_id = d.doc_id WHERE b2.bucket != 'tail'), "
    # stage 3 — temperature mixture weights over the KEPT slice
    "per AS (SELECT lang, count(*) AS n_docs FROM kept GROUP BY lang), "
    "s AS (SELECT lang, n_docs * 1.0 / (SELECT sum(n_docs) FROM per) AS p "
    "FROM per), "
    "t2 AS (SELECT lang, p, pow(p, 0.5) AS pa FROM s), "
    "w AS (SELECT lang, round((pa / (SELECT sum(pa) FROM t2)) / p, 6) "
    "AS weight FROM t2), "
    # stage 4 — A-Res weighted draw of 200
    "keyed AS (SELECT k.doc_id, k.lang, k.bucket, "
    "-ln((CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR) || '|ws'), 1, 8)) "
    "AS BIGINT) + 1.0) / 4294967297.0) / w.weight AS ak "
    "FROM kept k JOIN w ON k.lang = w.lang), "
    "r AS (SELECT doc_id, lang, bucket, CAST(row_number() OVER "
    "(ORDER BY ak, doc_id) AS INTEGER) AS sample_rank FROM keyed), "
    "pick AS (SELECT * FROM r WHERE sample_rank <= 200), "
    # stage 5 — deterministic loader-shard shuffle
    "sk AS (SELECT doc_id, lang, bucket, sample_rank, "
    "md5(CAST(doc_id AS VARCHAR) || '|shuf') AS skey FROM pick) "
    "SELECT doc_id, lang, bucket, sample_rank, "
    "CAST(CAST(('0x' || substr(skey, 1, 8)) AS BIGINT) % 4 AS INTEGER) "
    "AS shard_id, CAST(row_number() OVER (PARTITION BY "
    "CAST(('0x' || substr(skey, 1, 8)) AS BIGINT) % 4 "
    "ORDER BY skey, doc_id) AS INTEGER) AS shard_pos FROM sk",
)
def curation_export_pipeline(spark, sf_dir):
    """The end-to-end curation-export capstone (r15 verdict #4) —
    the five r15 pieces composed the way a training-data pipeline
    actually runs them, one flow, every stage oracle-replayed:

      1. score   — ``bigram_lm_score`` against the English reference
                   (CCNet perplexity filtering, integer micros);
      2. bucket  — scale-safe terciles (``ntile_buckets``: two-pass
                   boundary elements + broadcast CASE, NO global-sort
                   window), DROP the tail bucket;
      3. weight  — ``mixture_temperature_weights`` (α=0.5) over the
                   kept slice, |langs|-row broadcast;
      4. draw    — ``weighted_sample`` A-Res top-200 (TakeOrdered,
                   md5 uniforms — deterministic under retries);
      5. shard   — ``shuffle_shards`` into 4 loader shards (ONE hash
                   exchange carries both shard id and position).

    The score table persists across the bucket passes and releases
    via the localCheckpoint fixture pattern; downstream of it the
    whole flow is ONE lazy plan whose exchanges the shuffle budget
    pins — the proof the pieces compose without a barrier explosion.
    Output: (doc_id, lang, bucket, sample_rank, shard_id, shard_pos).
    """
    from .functions.textops import bigram_lm_score
    from .operators.quantiles import ntile_buckets
    from .queries_extra import _materialized

    d = _d(spark, sf_dir)
    nll = bigram_lm_score(
        d.select("doc_id", "text"),
        d.filter(F.col("lang") == "en").select("text"),
    ).select("doc_id", "nll_micros").persist()
    bucketed = ntile_buckets(
        nll, "nll_micros", "doc_id", 3, labels=["head", "middle", "tail"]
    )
    kept = (
        bucketed.filter(F.col("bucket") != "tail")
        .join(d.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "bucket")
    )
    w = C.mixture_temperature_weights(kept, "lang", 0.5).select("lang", "weight")
    sampled = C.weighted_sample(
        kept.join(F.broadcast(w), "lang"), "weight", 200, id_col="doc_id"
    )
    out = C.shuffle_shards(
        sampled.select("doc_id", "lang", "bucket", "sample_rank"),
        4,
        id_col="doc_id",
    ).select("doc_id", "lang", "bucket", "sample_rank", "shard_id", "shard_pos")
    return _materialized(out, [nll])


def _capstone_v2_oracle() -> str:
    """DuckDB twin of the six-stage curation capstone: the v1 stages
    with FUZZY DECONTAMINATION inserted between bucket-keep and
    mixture weighting — banded MinHash candidates of the kept slice
    against the constructed eval set, exact shingle verify, anti-join
    (the _fuzzy_decon_oracle machinery, corpus side restricted to the
    kept docs)."""
    from .queries_vector import _duck_shingles

    mh = ", ".join(
        "list_aggregate(list_transform(shingles, s -> md5('mh|" + str(i) + "|' || s)), 'min')"
        f" AS mh_{i}"
        for i in range(8)
    )

    def bands(src: str) -> str:
        return " UNION ALL ".join(
            f"SELECT id, {b} AS band, md5(mh_{2*b} || '|' || mh_{2*b+1}) AS band_hash "
            f"FROM {src}"
            for b in range(4)
        )

    return (
        # stage 1 — CCNet LM scoring
        f"WITH tok AS (SELECT doc_id, {_CE_LM_TOK} AS ws FROM documents), "
        "bi AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM tok, "
        "unnest(generate_series(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 2), "
        f"rtok AS (SELECT {_CE_LM_TOK} AS ws FROM documents WHERE lang = 'en'), "
        "rbi AS (SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM rtok, "
        "unnest(generate_series(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 2), "
        "model AS (SELECT w1, w2, count(*) AS cp FROM rbi GROUP BY 1, 2), "
        "ctx AS (SELECT w1, sum(cp) AS cc FROM model GROUP BY 1), "
        "v AS (SELECT count(DISTINCT t) AS v FROM "
        "(SELECT unnest(ws) AS t FROM rtok)), "
        "scored AS (SELECT b.doc_id, CAST(round(ln("
        "(COALESCE(c.cc, 0) + 1.0 * (SELECT v FROM v)) * 1.0 / "
        "(COALESCE(m.cp, 0) + 1)) * 1000000) AS BIGINT) AS nlp "
        "FROM bi b LEFT JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2 "
        "LEFT JOIN ctx c ON b.w1 = c.w1), "
        "doc AS (SELECT doc_id, CAST(sum(nlp) // count(*) AS BIGINT) AS "
        "nll_micros FROM scored GROUP BY doc_id), "
        # stage 2 — perplexity terciles, drop the tail
        "b2 AS (SELECT doc_id, CASE ntile(3) OVER (ORDER BY nll_micros, doc_id) "
        "WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket "
        "FROM doc), "
        "kept AS (SELECT b2.doc_id, b2.bucket, d.lang FROM b2 "
        "JOIN documents d ON b2.doc_id = d.doc_id WHERE b2.bucket != 'tail'), "
        # stage 3 — fuzzy decontamination of the kept slice
        "ev AS (SELECT doc_id + 1000000 AS id, text || ' eval suffix tail' "
        "AS text FROM documents WHERE doc_id % 50 = 0 "
        "UNION ALL SELECT doc_id + 2000000 AS id, "
        "'totally unrelated benchmark item number ' || CAST(doc_id AS VARCHAR) "
        "AS text FROM documents WHERE doc_id % 97 = 0), "
        f"csh AS (SELECT d.doc_id AS id, {_duck_shingles('d.text')} AS shingles "
        "FROM documents d JOIN kept k ON d.doc_id = k.doc_id), "
        f"esh AS (SELECT id, {_duck_shingles()} AS shingles FROM ev), "
        f"csigs AS (SELECT id, shingles, {mh} FROM csh), "
        f"esigs AS (SELECT id, shingles, {mh} FROM esh), "
        f"cb AS ({bands('csigs')}), eb AS ({bands('esigs')}), "
        "cand AS (SELECT DISTINCT cb.id AS doc_id, eb.id AS eval_id FROM cb "
        "JOIN eb ON cb.band = eb.band AND cb.band_hash = eb.band_hash), "
        "vv AS (SELECT c.doc_id, "
        "len(list_intersect(cs.shingles, es.shingles)) AS n_inter, "
        "len(cs.shingles) + len(es.shingles) "
        "- len(list_intersect(cs.shingles, es.shingles)) AS n_union "
        "FROM cand c JOIN csh cs ON cs.id = c.doc_id "
        "JOIN esh es ON es.id = c.eval_id), "
        "contam AS (SELECT DISTINCT doc_id FROM vv "
        "WHERE n_inter * 1000000 >= 500000 * n_union), "
        "kept2 AS (SELECT * FROM kept WHERE NOT EXISTS "
        "(SELECT 1 FROM contam c WHERE c.doc_id = kept.doc_id)), "
        # stage 4 — temperature mixture weights over the CLEAN slice
        "per AS (SELECT lang, count(*) AS n_docs FROM kept2 GROUP BY lang), "
        "s AS (SELECT lang, n_docs * 1.0 / (SELECT sum(n_docs) FROM per) AS p "
        "FROM per), "
        "t2 AS (SELECT lang, p, pow(p, 0.5) AS pa FROM s), "
        "w AS (SELECT lang, round((pa / (SELECT sum(pa) FROM t2)) / p, 6) "
        "AS weight FROM t2), "
        # stage 5 — A-Res weighted draw of 200
        "keyed AS (SELECT k.doc_id, k.lang, k.bucket, "
        "-ln((CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR) || '|ws'), 1, 8)) "
        "AS BIGINT) + 1.0) / 4294967297.0) / w.weight AS ak "
        "FROM kept2 k JOIN w ON k.lang = w.lang), "
        "r AS (SELECT doc_id, lang, bucket, CAST(row_number() OVER "
        "(ORDER BY ak, doc_id) AS INTEGER) AS sample_rank FROM keyed), "
        "pick AS (SELECT * FROM r WHERE sample_rank <= 200), "
        # stage 6 — deterministic loader-shard shuffle
        "sk AS (SELECT doc_id, lang, bucket, sample_rank, "
        "md5(CAST(doc_id AS VARCHAR) || '|shuf') AS skey FROM pick) "
        "SELECT doc_id, lang, bucket, sample_rank, "
        "CAST(CAST(('0x' || substr(skey, 1, 8)) AS BIGINT) % 4 AS INTEGER) "
        "AS shard_id, CAST(row_number() OVER (PARTITION BY "
        "CAST(('0x' || substr(skey, 1, 8)) AS BIGINT) % 4 "
        "ORDER BY skey, doc_id) AS INTEGER) AS shard_pos FROM sk"
    )


@q("curation_export_pipeline_v2", _capstone_v2_oracle())
def curation_export_pipeline_v2(spark, sf_dir):
    """The curation-export capstone with the DECONTAMINATION stage
    wired in (r16 verdict #5) — six stages, every one replayed in ONE
    DuckDB oracle:

      1. score   — ``bigram_lm_score`` vs the English reference;
      2. bucket  — scale-safe terciles (``ntile_buckets``), DROP tail;
      3. decon   — ``decontaminate_fuzzy`` (V10) anti-joins the kept
                   slice against a constructed eval set (the
                   decontaminate_fuzzy DQ fixture: perturbed copies of
                   every 50th doc + unrelated negatives) — banded
                   MinHash candidates, exact shingle verify, corpus
                   side RESTRICTED to the kept docs (semi-join
                   pushdown: the tail bucket is never shingled);
      4. weight  — ``mixture_temperature_weights`` (α=0.5) over the
                   CLEAN slice;
      5. draw    — ``weighted_sample`` A-Res top-200;
      6. shard   — ``shuffle_shards`` into 4 loader shards.

    The band_table definition is SHARED between the decon stage and
    the novelty gate (dedup.band_table), so what 'contaminated'
    means here is exactly what 'duplicate' means at the crawl gate.
    Output: (doc_id, lang, bucket, sample_rank, shard_id, shard_pos).
    """
    from .functions.textops import bigram_lm_score
    from .operators.quantiles import ntile_buckets
    from .queries_extra import _materialized

    d = _d(spark, sf_dir)
    nll = bigram_lm_score(
        d.select("doc_id", "text"),
        d.filter(F.col("lang") == "en").select("text"),
    ).select("doc_id", "nll_micros").persist()
    bucketed = ntile_buckets(
        nll, "nll_micros", "doc_id", 3, labels=["head", "middle", "tail"]
    )
    kept = (
        bucketed.filter(F.col("bucket") != "tail")
        .join(d.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "bucket")
    )
    ev = (
        d.filter(F.col("doc_id") % 50 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" eval suffix tail")).alias("text"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 97 == 0).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(
                    F.lit("totally unrelated benchmark item number "),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
            )
        )
    )
    handles: list = []
    contam = (
        C.decontaminate_fuzzy(
            d.select("doc_id", "text").join(
                kept.select("doc_id"), "doc_id", "left_semi"
            ),
            ev,
            "text",
            "doc_id",
            cache_handles=handles,
        )
        .select("doc_id")
        .dropDuplicates()
    )
    clean = kept.join(contam, "doc_id", "left_anti")
    w = C.mixture_temperature_weights(clean, "lang", 0.5).select("lang", "weight")
    sampled = C.weighted_sample(
        clean.join(F.broadcast(w), "lang"), "weight", 200, id_col="doc_id"
    )
    out = C.shuffle_shards(
        sampled.select("doc_id", "lang", "bucket", "sample_rank"),
        4,
        id_col="doc_id",
    ).select("doc_id", "lang", "bucket", "sample_rank", "shard_id", "shard_pos")
    return _materialized(out, [nll, *handles])


@q(
    "mixture_epoch_plan",
    f"WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
    f"CAST(sum({_NTOK}) AS BIGINT) AS tokens FROM documents "
    "GROUP BY source), "
    "nz AS (SELECT * FROM per WHERE tokens > 0), "
    "s AS (SELECT source, n_docs, tokens, "
    "tokens * 1.0 / (SELECT sum(tokens) FROM nz) AS p FROM nz), "
    "t AS (SELECT source, n_docs, tokens, p, pow(p, 0.5) AS pa FROM s), "
    "qq AS (SELECT source, n_docs, tokens, round(p, 6) AS share, "
    "round(pa / (SELECT sum(pa) FROM t), 6) AS temp_share FROM t), "
    "pl AS (SELECT *, CAST(round(temp_share * 10000000) AS BIGINT) "
    "AS target_tokens FROM qq), "
    "al AS (SELECT *, LEAST(target_tokens, 4 * tokens) AS alloc FROM pl) "
    "SELECT source, n_docs, tokens, share, temp_share, target_tokens, "
    "CAST((alloc * 1000000) // tokens AS BIGINT) AS epochs_micros, "
    "alloc < target_tokens AS capped FROM al",
)
def mixture_epoch_plan(spark, sf_dir):
    """Token-budgeted mixture plan (r16; corpus.py::
    mixture_epoch_plan — the data-constrained scaling arithmetic of
    Muennighoff et al. 2023): per-source token supply → α=0.5
    temperature target shares → each source's token allocation for a
    10M-token run, capped at 4 epochs of its supply (the 'repeating
    data stops helping' dial), with the per-source EPOCH count in
    integer micros (>1e6 ⇒ the source repeats). The answer to 'if I
    train X tokens with this mixture, how many times do I see each
    source, and which asks are unsatisfiable?' — the planning
    report that pairs with mixture_temperature_weights (shares) and
    weighted_sample (the draw). Token shares (not doc shares) drive
    the mixture; epochs are positive-numerator integer division, so
    the plan hashes identically cross-engine."""
    from .functions.textops import token_count

    d = _d(spark, sf_dir)
    return C.mixture_epoch_plan(
        d.select("source", token_count(F.col("text")).alias("__tok")),
        "source",
        "__tok",
        10_000_000,
        alpha=0.5,
        max_epochs=4,
    )
