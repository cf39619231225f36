"""Text operators: chunking, markdown splitting, analysis, fingerprints.

Re-expresses the reference's text pipeline (SURVEY.md §2.9) in native
Spark SQL expressions — no Python UDFs anywhere on these paths, so the
whole stage stays inside whole-stage codegen and scales linearly:

- T4 fixed-stride chunking (the reference uses
  ``RecursiveCharacterTextSplitter(chunk_size=2048, chunk_overlap=256)``,
  ingestion-pipeline.py:226-231): ``explode(sequence) + substring``.
  The recursive separator-aware variant is semantically fuzzier; the
  fixed-stride contract (every chunk ≤ size; consecutive chunks share
  exactly ``overlap`` chars except at the tail) is declared and tested.
- T3 markdown header split (``MarkdownHeaderTextSplitter``,
  ingestion-pipeline.py:204-216): regex split on line-anchored
  ``#{1,3}`` headings.
- X1 content header prepend ("Section: … / …\\n\\nContent:\\n…",
  ingestion-pipeline.py:234-240).
- Text analysis extensions (language-ID, quality score, token count,
  rolling fingerprint) mandated by the north star.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# Reference constants (ingestion-pipeline.py:226-227)
CHUNK_SIZE = 2048
CHUNK_OVERLAP = 256


def chunk_fixed_overlap(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """T4: fixed-stride chunking with overlap, pure SQL.

    stride = size - overlap; chunk i covers [i*stride, i*stride+size).
    n_chunks = max(1, ceil((len - overlap) / stride)) so the final
    chunk is the only one shorter than ``size`` and no chunk starts
    past the text. Explode of a tiny int sequence → substring: stays
    in codegen, ~zero cost vs. the scan itself.
    """
    stride = size - overlap
    n = F.greatest(
        F.lit(1),
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(stride)),
    ).cast("int")
    return (
        df.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n - F.lit(1))))
        .withColumn("chunk_start", F.col("chunk_idx") * stride)
        .withColumn(
            "chunk_text",
            F.substring(F.col(text_col), F.col("chunk_start") + F.lit(1), F.lit(size)),
        )
        .select(*id_cols, "chunk_idx", "chunk_start", "chunk_text")
    )


DEFAULT_SEPARATORS = ("\n\n", "\n", " ", "")


def recursive_character_split(
    text: str,
    chunk_size: int = CHUNK_SIZE,
    chunk_overlap: int = CHUNK_OVERLAP,
    separators: tuple[str, ...] = DEFAULT_SEPARATORS,
) -> list[str]:
    """T4 compat kernel: separator-aware recursive splitting.

    Semantics of the reference's RecursiveCharacterTextSplitter
    (ingestion-pipeline.py:226-231): try the coarsest separator whose
    pieces fit ``chunk_size``; recurse into oversized pieces with the
    next separator; greedily merge adjacent pieces up to ``chunk_size``
    keeping ~``chunk_overlap`` trailing characters between chunks.
    Unlike ``chunk_fixed_overlap`` (exact fixed stride, SQL-native,
    oracle-checked) this variant respects natural boundaries — chunks
    are ≤ chunk_size but of varying length. Documented differences:
    whitespace-only pieces are dropped; separators are kept attached
    to the preceding piece.
    """
    def base_split(t: str, s: str) -> list[str]:
        if not s:
            return [t[i : i + chunk_size] for i in range(0, len(t), chunk_size)]
        parts = t.split(s)
        return [p + s for p in parts[:-1]] + [parts[-1]]

    def gather_pieces(t: str, seps: tuple[str, ...]) -> list[str]:
        """Recursively split to pieces ≤ chunk_size, separators kept
        attached. No merging here — merging inside the recursion used
        to strip trailing separators, fabricating glued-together
        chunks ('0 ' + '3' → '03'); hypothesis caught it."""
        sep = next((s for s in seps if s and s in t), "")
        out: list[str] = []
        for p in base_split(t, sep):
            if not p.strip():
                continue
            if len(p) <= chunk_size:
                out.append(p)
            else:
                nxt = seps[seps.index(sep) + 1 :] if sep else ("",)
                out.extend(gather_pieces(p, nxt or ("",)))
        return out

    pieces = gather_pieces(text, separators)

    # greedy merge with trailing overlap (strip only at emit)
    chunks: list[str] = []
    window: list[str] = []
    total = 0
    for p in pieces:
        if window and total + len(p) > chunk_size:
            chunks.append("".join(window).strip())
            while window and (total > chunk_overlap or total + len(p) > chunk_size):
                total -= len(window.pop(0))
        window.append(p)
        total += len(p)
    if window:
        chunks.append("".join(window).strip())
    return [c for c in chunks if c]


def chunk_recursive(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """T4 compat mode: the recursive splitter as an Arrow-batched
    stage (kernel above; one row in → many chunks out). Prefer
    ``chunk_fixed_overlap`` when exact-stride semantics suffice — it
    stays in codegen; this path exists for reference parity."""
    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [f for f in df.schema.fields if f.name in id_cols]
        + [StructField("chunk_idx", IntegerType()), StructField("chunk_text", StringType())]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            id_vals = [pdf[k] for k in id_cols]
            for *ids, text in zip(*id_vals, pdf[text_col]):
                for i, c in enumerate(recursive_character_split(text, size, overlap)):
                    rows.append((*ids, i, c))
            yield pd.DataFrame(rows, columns=[*id_cols, "chunk_idx", "chunk_text"])

    return df.select(*id_cols, text_col).mapInPandas(run, schema)


def split_markdown_headers(df: DataFrame, md_col: str, max_level: int = 3) -> DataFrame:
    """T3: split markdown into header-delimited sections.

    Regex split on line-anchored ATX headings up to ``max_level``
    (the reference splits on #/##/### — ingestion-pipeline.py:205-209;
    the website variant adds ####, website-ingestion-pipeline.py:147-152).
    Returns ``sections ARRAY<STRING>`` + ``n_sections``; callers
    explode and enrich as needed.
    """
    pat = rf"(?m)^#{{1,{max_level}}} "
    sections = F.split(F.col(md_col), pat)
    # a leading heading yields an empty first element — drop empties
    sections = F.filter(sections, lambda s: F.length(F.trim(s)) > 0)
    return df.withColumn("sections", sections).withColumn("n_sections", F.size("sections"))


def content_header(title: Column, h1: Column, h2: Column, body: Column) -> Column:
    """X1: the reference's chunk content header
    (ingestion-pipeline.py:234-240): 'Section: {title} / {h1} / {h2}'
    + blank line + 'Content:' + body."""
    return F.concat(
        F.lit("Section: "), title, F.lit(" / "), h1, F.lit(" / "), h2,
        F.lit("\n\nContent:\n"), body,
    )


def normalize_index_name(col: Column) -> Column:
    """X2/X3: index-name derivation — ``{product}_{language}_{version}``
    with '-'/'.' → '_' (ingestion-pipeline.py:271) then lowercased for
    the Elasticsearch sink (ingestion-pipeline-elastic.py:349)."""
    return F.lower(F.translate(col, "-.", "__"))


# ---------------------------------------------------------------- text analysis

#: tiny per-language marker vocabularies for the n-gram/stopword
#: heuristic language-ID (extension mandated by the north star; the
#: reference pins language per product instead, ingestion-pipeline.py:18-38).
LANG_MARKERS = {
    "en": ["the", "a", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "das"],
    # r10 widening: fr/pt/it marker sets, ASCII-only by design — \b
    # is an ASCII word boundary in BOTH Java regex (default flags)
    # and RE2, so an accented marker like 'você' would silently never
    # match in either engine. Real deployments would swap these tiny
    # sets for proper stopword tables; the shape (sum of marker
    # regexp_counts, argmax, margin) is what scales.
    "fr": ["les", "une", "dans"],
    "pt": ["uma", "isso", "muito"],
    "it": ["che", "gli", "sono"],
}


def _marker_score(text: Column, words: list[str]) -> Column:
    score = F.lit(0)
    for w in words:
        score = score + F.regexp_count(text, F.lit(rf"\b{w}\b"))
    return score


def lang_id_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID: stopword-marker votes per language, argmax wins.

    Deterministic, pure-SQL (regexp_count is codegen'd JVM-side).
    Ties break by ``LANG_MARKERS`` insertion order (en > es > de >
    fr > pt > it — the first language whose score equals the max
    wins, preserving the pre-widening en/es/de behavior exactly).
    ``margin`` = best score − runner-up score: the confidence dial a
    per-language curation step (e.g. token_budget_sample budgeting
    on DETECTED language) thresholds on — margin 0 means a tie the
    priority order decided, not a real detection.
    """
    t = F.col(text_col)
    scored = df
    for lang, words in LANG_MARKERS.items():
        scored = scored.withColumn(f"score_{lang}", _marker_score(t, words))
    scores = [F.col(f"score_{lang}") for lang in LANG_MARKERS]
    gmax = F.greatest(*scores)
    best = F.lit(None).cast("string")
    chain = None
    for lang in LANG_MARKERS:
        cond = F.col(f"score_{lang}") == gmax
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    best = chain
    n = len(LANG_MARKERS)
    asc = F.array_sort(F.array(*scores))
    margin = F.element_at(asc, n) - F.element_at(asc, n - 1)
    return scored.withColumn("predicted_lang", best).withColumn("margin", margin)


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length / punctuation / stopword ratios.

    Score = clipped blend of word count, mean word length sanity and
    stopword presence — the standard cheap pre-filter for LLM corpus
    construction. Rounded to 6dp for engine-stable comparison.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.size(F.split(t, " "))
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    n_stop = F.regexp_count(t, F.lit(r"\b(the|a|of|and|to|in)\b"))
    stop_ratio = F.round(n_stop / F.greatest(n_words, F.lit(1)), 6)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    score = F.round(
        F.least(F.lit(1.0), n_words / F.lit(100.0)) * F.lit(0.5)
        + F.least(F.lit(1.0), stop_ratio * F.lit(5.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * F.lit(10.0))) * F.lit(0.1),
        6,
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("quality_score", score)
    )


#: BPE-ish pre-tokenization pattern: letter runs, digit runs, or a
#: single non-space symbol — the standard GPT-2-style split classes
#: minus unicode categories (kept regex-portable across engines).
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(col: Column) -> Column:
    """Token counting: whitespace words are ``size(split(...))``;
    this is the BPE-ish regex count (JVM regexp_count, vectorized)."""
    return F.regexp_count(col, F.lit(TOKEN_PATTERN))


def fingerprint_rolling(col: Column, k: int = 8, step: int = 4) -> Column:
    """Document fingerprint: min-of-k-gram-hashes (winnowing-style).

    Hashes every ``step``-th ``k``-char gram with md5 and keeps the
    lexicographic minimum — a deterministic content fingerprint robust
    to small shifts, expressible identically in any SQL engine (md5 is
    bit-exact everywhere, unlike xxhash64 whose seeds differ).
    """
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(col) - F.lit(k - 1), F.lit(1)), F.lit(step)
    )
    grams = F.transform(starts, lambda i: F.md5(F.substring(col, i, F.lit(k))))
    return F.array_min(grams)


def with_fingerprint(df: DataFrame, text_col: str, k: int = 8, step: int = 4) -> DataFrame:
    return df.withColumn("fingerprint", fingerprint_rolling(F.col(text_col), k, step))


def split_markdown_sections(df: DataFrame, md_col: str, id_col: str = "doc_id") -> DataFrame:
    """T3 full form: header-aware section split with Header1..Header4
    metadata, all native SQL (no UDF).

    The reference's MarkdownHeaderTextSplitter attaches the active
    #/##/### header path to each section's metadata and resets deeper
    headers when a shallower one appears (ingestion-pipeline.py:204-216);
    the website pipeline splits one level deeper, on #### too
    (website-ingestion-pipeline.py:147-152) — this covers both.
    Plan: explode lines → classify heading level → running section id
    → scoped `last()` windows for h1..h4 (h2 scoped within the
    current h1's span, h3 within h2's, h4 within h3's) → re-assemble
    section text with an ordered aggregate. Shuffles: one per window
    partition spec on (id), then the final group — all keyed by
    document, so partitions stay document-sized at any corpus scale.
    """
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(md_col), "\n")).alias("ln", "line")
    )
    level = (
        F.when(F.col("line").startswith("#### "), 4)
        .when(F.col("line").startswith("### "), 3)
        .when(F.col("line").startswith("## "), 2)
        .when(F.col("line").startswith("# "), 1)
        .otherwise(0)
    )
    lines = lines.withColumn("lvl", level)
    w = Window.partitionBy(id_col).orderBy("ln").rowsBetween(Window.unboundedPreceding, 0)
    lines = (
        lines.withColumn("section_id", F.sum((F.col("lvl") > 0).cast("int")).over(w))
        .withColumn("h1_id", F.sum((F.col("lvl") == 1).cast("int")).over(w))
        .withColumn("h2_id", F.sum((F.col("lvl") == 2).cast("int")).over(w))
        .withColumn("h3_id", F.sum((F.col("lvl") == 3).cast("int")).over(w))
    )
    strip = lambda n: F.substring(F.col("line"), n, 100000)  # noqa: E731
    lines = lines.withColumn(
        "h1",
        F.last(F.when(F.col("lvl") == 1, strip(3)), ignorenulls=True).over(w),
    )
    w_h1 = (
        Window.partitionBy(id_col, "h1_id").orderBy("ln")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lines = lines.withColumn(
        "h2",
        F.last(F.when(F.col("lvl") == 2, strip(4)), ignorenulls=True).over(w_h1),
    )
    w_h2 = (
        Window.partitionBy(id_col, "h1_id", "h2_id").orderBy("ln")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lines = lines.withColumn(
        "h3",
        F.last(F.when(F.col("lvl") == 3, strip(5)), ignorenulls=True).over(w_h2),
    )
    w_h3 = (
        Window.partitionBy(id_col, "h1_id", "h2_id", "h3_id").orderBy("ln")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lines = lines.withColumn(
        "h4",
        F.last(F.when(F.col("lvl") == 4, strip(6)), ignorenulls=True).over(w_h3),
    )
    body = lines.filter((F.col("lvl") == 0) & (F.length(F.trim("line")) > 0))
    # ordered re-assembly: sort (ln, line) structs then join — engine-
    # portable deterministic alternative to an ordered string_agg
    sec = body.groupBy(id_col, "section_id", "h1", "h2", "h3", "h4").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ln", "line"))), lambda s: s.line
            ),
            "\n",
        ).alias("section_text")
    )
    return sec


def repetition_signals(df: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """Gopher/Dolma-style repetition quality signals per document:

    - ``n_words``, ``mean_word_len``, ``frac_alpha_words`` — basic
      composition (array expressions, zero shuffles);
    - ``top_2gram_frac`` — fraction of word-2-grams taken by the most
      frequent one (repetition marker; 'the most common 2-gram
      character fraction' family from the Gopher filters);
    - ``dup_3gram_frac`` — fraction of word-3-grams that are repeats
      of an earlier one in the same doc.

    Plan: ZERO shuffles. Both gram signals are per-document facts
    over arrays that already sit in the row, so they are computed
    row-locally with higher-order functions — the mode count via
    ``array_distinct`` + nested filter (O(words·distinct) per row,
    codegen'd), the duplicate fraction via ``array_distinct`` alone.
    The earlier shape (explode → count per (doc, gram) → re-aggregate
    → join back, twice) spent 8 extra exchanges re-keying data that
    never needed to leave its row; measured 1.03 s → 0.22 s at sf0.1
    (bench protocol, like-for-like; plan: 9 exchanges → 1 — the
    loader's spread round-robin), and at 100 TB the
    difference is four whole shuffle stages of the gram stream vs
    none. Row-local cost stays bounded by document length (~400 words
    for 2048-char chunks → ≤160k comparisons), far under shuffle cost
    at any realistic document size.
    """

    def grams(n: int) -> Column:
        make = F.transform(
            F.sequence(F.lit(0), F.size("ws") - n),
            lambda i: F.concat_ws(
                " ", *[F.get(F.col("ws"), i + F.lit(j)) for j in range(n)]
            ),
        )
        # sequence(0, negative) would generate a DESCENDING range —
        # short docs must yield no grams, as DuckDB's generate_series does
        return F.when(F.size("ws") >= n, make).otherwise(
            F.array().cast("array<string>")
        )

    base = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("ws")
    ).select(
        id_col,
        "ws",
        F.size("ws").cast("bigint").alias("n_words"),
        F.round(
            F.aggregate(
                F.transform("ws", lambda x: F.length(x).cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.size("ws"),
            6,
        ).alias("mean_word_len"),
        F.round(
            F.size(F.filter("ws", lambda x: x.rlike("^[A-Za-z]+$")))
            / F.size("ws").cast("double"),
            6,
        ).alias("frac_alpha_words"),
        grams(2).alias("g2"),
        grams(3).alias("g3"),
    )
    # row-local gram stats (no explode, no shuffle, no join). A doc
    # with <2 (resp. <3) words has an empty gram array — no grams
    # means no repetition, so both signals default to 0.0 (matching
    # the oracle's coalesce over its missing groups).
    def mode_frac(col: str) -> Column:
        # max occurrence count of any gram / total grams: count each
        # DISTINCT gram's occurrences with a nested filter (outer
        # lambda var is visible inside the inner lambda in Spark HOFs)
        n = F.size(col)
        top = F.array_max(
            F.transform(
                F.array_distinct(F.col(col)),
                lambda x: F.size(F.filter(F.col(col), lambda y: y == x)),
            )
        )
        return F.when(
            n > 0, F.round(top / n.cast("double"), 6)
        ).otherwise(F.lit(0.0))

    def dup_frac(col: str) -> Column:
        # (total - distinct) / total: repeats of an earlier gram
        n = F.size(col)
        return F.when(
            n > 0,
            F.round((n - F.size(F.array_distinct(F.col(col)))) / n.cast("double"), 6),
        ).otherwise(F.lit(0.0))

    return base.select(
        id_col,
        "n_words",
        "mean_word_len",
        "frac_alpha_words",
        mode_frac("g2").alias("top_2gram_frac"),
        dup_frac("g3").alias("dup_3gram_frac"),
    )


# --------------------------------------------------- mojibake repair

def repair_mojibake_text(s: str, max_passes: int = 2) -> str:
    """ftfy-style core repair for the classic crawl corruption:
    UTF-8 bytes decoded as cp1252 ('café' → 'cafÃ©'). A string is
    repaired only when its cp1252 re-encoding decodes CLEANLY as
    UTF-8 — legitimate accented text ('À bientôt', 'café') fails
    that round trip (0xC0/0xE9 are invalid UTF-8 leads) and passes
    through untouched, which is the precision guarantee. Up to
    ``max_passes`` rounds unwind doubly-encoded text. Pure ASCII
    returns immediately; never raises."""
    for _ in range(max_passes):
        if not s or all(ord(c) < 0x80 for c in s):
            return s
        try:
            fixed = s.encode("cp1252").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return s
        if fixed == s:
            return s
        s = fixed
    return s


def repair_mojibake(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch mojibake repair, split-path for scale (the
    idn_host_normalize pattern): pure-ASCII rows — the overwhelming
    majority of any cleaned corpus — never cross the Python
    boundary; only the non-ASCII slice runs the Arrow stage, then
    the slices union back. Null-safe: NULL/empty rows ride the
    passthrough slice. Run this after charset decode
    (warc.resolve_charset) — it catches the upstream corruption a
    correct decode of ALREADY-corrupted bytes cannot undo."""
    from pyspark.sql.types import StringType

    non_ascii = F.col(text_col).rlike(r"[^\x00-\x7F]")
    cond = F.coalesce(non_ascii, F.lit(False))

    @F.pandas_udf(StringType())
    def _fix(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: repair_mojibake_text(t) if isinstance(t, str) else t
        )

    keep = df.filter(~cond)
    fix = df.filter(cond).withColumn(text_col, _fix(F.col(text_col)))
    return keep.unionByName(fix)


# ------------------------------------------- content-defined chunking

def chunk_content_defined(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    mask_bits: int = 6,
) -> DataFrame:
    """Content-defined chunking (the FastCDC/rsync family): cut
    AFTER position i whenever the hash of the trailing ``window``
    chars satisfies ``H % 2^mask_bits == 0`` — expected chunk length
    2^mask_bits chars. The property fixed-stride chunking lacks and
    dedup needs: an EDIT EARLY IN A DOCUMENT does not shift later
    boundaries (they depend only on local content), so every chunk
    after the edit keeps its fingerprint and dedups against the
    previous generation — with ``chunk_fixed_overlap`` one inserted
    byte re-fingerprints the whole tail.

    Pure JVM higher-order functions end to end (sequence → filter →
    transform; the hash is the portable md5-conv pattern): no
    Python, no shuffle — a narrow scan-side map. Returns (id,
    chunk_idx, chunk_text, chunk_md5). Docs shorter than ``window``
    yield one whole-doc chunk; NULL text yields no rows."""
    text = F.col(text_col)
    ln = F.length(text)
    win_hash = lambda i: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.substr(text, i - F.lit(window - 1), F.lit(window))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    mask = 1 << mask_bits
    cuts = F.filter(
        F.when(ln > window, F.sequence(F.lit(window), ln - 1)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.pmod(win_hash(i), F.lit(mask)) == 0,
    )
    bounds = F.concat(
        F.array(F.lit(0).cast("int")), cuts.cast("array<int>"), F.array(ln.cast("int"))
    )
    # the chunks lambda references ``bounds`` (which contains the full
    # ~len(text)-element boundary-hash filter) — as an interpreted HOF
    # capture it would re-run that md5 pass once per chunk element
    # plus once for size() (the winnow_fingerprints trap, ~7x the
    # necessary hashing; r17 triage sweep). Materialize bounds as a
    # column so the boundary pass runs once per row.
    with_bounds = df.filter(text.isNotNull()).select(
        F.col(id_col), text.alias("__cdc_text"), bounds.alias("__bounds")
    )
    barr = F.col("__bounds")
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(barr) - 1),
        lambda j: F.substr(
            F.col("__cdc_text"),
            F.element_at(barr, j) + 1,
            F.element_at(barr, j + 1) - F.element_at(barr, j),
        ),
    )
    return (
        with_bounds.select(F.col(id_col), chunks.alias("__chunks"))
        .select(
            id_col, F.posexplode("__chunks").alias("chunk_idx", "chunk_text")
        )
        .withColumn("chunk_md5", F.md5(F.col("chunk_text")))
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 8,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every ``k``-char gram, slide a window of ``w``
    consecutive gram hashes, keep each window's MINIMUM, dedupe —
    the selected set is (a) position-shift robust and (b) carries
    the GUARANTEE that any shared substring of length ≥ w + k - 1
    between two documents yields ≥1 shared fingerprint (every such
    match spans a full window on both sides, and both windows pick
    the same minimum). Density ~2/(w+1) of all grams — a tunable
    sketch of the document, unlike ``fingerprint_rolling``'s single
    global min (one fingerprint) or full shingling (all of them).

    Pure JVM higher-order functions (sequence → transform md5 →
    sliding slice/array_min → array_distinct → explode), md5-based
    so any engine replicates it bit for bit. Returns (id, fp) rows.
    Docs shorter than ``k`` fingerprint their whole text; NULL text
    yields no rows."""
    text = F.col(text_col)
    n_grams = F.greatest(F.length(text) - F.lit(k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.md5(F.substring(text, i, F.lit(k))),
    )
    # HOF lambdas run INTERPRETED with no common-subexpression
    # elimination: a lambda that captures the ``grams`` expression
    # re-evaluates ALL ~n gram md5s per window element, making the
    # selection accidentally O(n²) in md5 calls (r17 triage sweep:
    # 848 s single-task at sf0.1 — 170 ms/doc over ~290-char texts).
    # Materializing grams as a real column first binds the lambda to
    # an attribute, so the md5 pass runs once per row: same rows,
    # same hashes, linear work.
    with_grams = df.filter(text.isNotNull()).select(
        F.col(id_col), grams.alias("__grams")
    )
    garr = F.col("__grams")
    n_windows = F.greatest(F.size(garr) - F.lit(w - 1), F.lit(1))
    selected = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda j: F.array_min(F.slice(garr, j, w)),
        )
    )
    return with_grams.select(F.col(id_col), F.explode(selected).alias("fp"))


def pmi_bigrams(
    df: DataFrame, text_col: str = "text", min_count: int = 5
) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs — the
    classic corpus-collocation report (Church & Hanks; "which word
    pairs co-occur far above chance") that drives phrase mining,
    tokenizer-merge audits, and boilerplate detection over a training
    corpus.

        PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ),
        p(a,b) = c(ab)/N_bi,  p(a) = c(a)/N_uni

    Plan: one tokenize pass; bigrams are a JVM zip_with over the
    token array (no positional self-join); unigram and bigram counts
    are two partial-agg shuffles; the two corpus totals reduce to
    1-row broadcasts. Output (w1, w2, n_pair, pmi_micros) for pairs
    with ``n_pair >= min_count`` — the count floor is standard PMI
    practice (rare-pair PMI is noise) and what bounds the result to
    the frequent-collocation set at any corpus size. pmi_micros =
    round(ln(ratio)·1e6) computed from exact integer counts with a
    fixed double expression shape, the BM25-micros cross-engine
    discipline (oracle: same counts, same association order)."""
    toks = df.select(
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: F.length(x) > 0,
        ).alias("__ws")
    )
    uni = (
        toks.select(F.explode("__ws").alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    n_uni = uni.agg(F.sum("__c").alias("__nu"))
    pairs = toks.filter(F.size("__ws") >= 2).select(
        F.explode(
            F.zip_with(
                F.slice(F.col("__ws"), 1, F.size("__ws") - 1),
                F.slice(F.col("__ws"), 2, F.size("__ws") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("__p")
    )
    bi = (
        pairs.select(F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= int(min_count))
    )
    n_bi = pairs.agg(F.count(F.lit(1)).alias("__nb"))
    ua = uni.select(F.col("__t").alias("w1"), F.col("__c").alias("__ca"))
    ub = uni.select(F.col("__t").alias("w2"), F.col("__c").alias("__cb"))
    ratio = (F.col("__c").cast("double") * F.col("__nu") * F.col("__nu")) / (
        F.col("__nb").cast("double") * F.col("__ca") * F.col("__cb")
    )
    return (
        bi.join(ua, "w1")
        .join(ub, "w2")
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bi))
        .select(
            "w1",
            "w2",
            F.col("__c").cast("bigint").alias("n_pair"),
            F.round(F.log(ratio) * 1_000_000.0).cast("bigint").alias("pmi_micros"),
        )
    )


def _lm_bigrams(df: DataFrame, text_col: str, *keep_cols: str) -> DataFrame:
    """(..keep_cols.., w1, w2) adjacent-token pairs under the corpus
    tokenizer (lower + non-alphanumeric split) — a JVM zip_with over
    the token array, no positional self-join; shared by LM training
    and scoring so the two cannot tokenize differently."""
    toks = df.select(
        *keep_cols,
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: F.length(x) > 0,
        ).alias("__ws"),
    )
    return toks.filter(F.size("__ws") >= 2).select(
        *keep_cols,
        F.explode(
            F.zip_with(
                F.slice(F.col("__ws"), 1, F.size("__ws") - 1),
                F.slice(F.col("__ws"), 2, F.size("__ws") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("__p"),
    ).select(*keep_cols, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))


def bigram_lm_score(
    docs: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_smooth: int = 1,
) -> DataFrame:
    """CCNet-style statistical-LM quality scoring: train an add-k
    bigram model on a REFERENCE corpus (the curated/high-quality
    slice), score every candidate document by its mean bigram
    log-probability — documents whose token transitions look nothing
    like the reference (boilerplate, lorem ipsum, gibberish, wrong
    language) score low. This is the quality-filter stage of the
    CCNet/CC-Net pipeline (Wenzek et al. 2020 train KenLM on
    Wikipedia and bucket Common Crawl by perplexity); a bigram model
    with add-k smoothing is the exact-arithmetic, engine-native
    version of the same signal:

        lp(w1, w2) = ln( (c(w1,w2) + k) / (c(w1) + k·V) )

    with c(·) reference counts, V the reference unigram vocabulary,
    k = ``k_smooth`` (unseen contexts degrade to ln(1/V), never a
    NULL or -inf). Per-bigram NEGATIVE log prob rounds to BIGINT
    micros BEFORE the per-document mean (integer sum div count —
    the numerator is kept POSITIVE deliberately: Spark's ``div``
    truncates toward zero while DuckDB's ``//`` floors, so negative
    integer division would hash-diverge), making the score
    bit-deterministic under any partitioning — the PageRank/PMI
    cross-engine discipline, not a float-sum race.

    Output: (id_col, n_bigrams, nll_micros) — mean negative bigram
    log-likelihood in micros; LOWER is more reference-like
    (perplexity = exp(nll_micros / 1e6)); threshold or bucket
    downstream (CCNet keeps the head/middle perplexity buckets).
    Plan: ONE tokenize pass per side; model = two partial-agg
    shuffles over the reference (bigram + context counts); scoring =
    two equi-joins on token keys (left: unseen pairs/contexts
    coalesce to 0) + one per-doc agg. V and the join sides follow
    AQE: a Wikipedia-sized model broadcast-joins, a corpus-sized one
    shuffles — both correct.

    A degenerate reference (zero tokens ⇒ V = 0) is a LOUD error —
    otherwise every score would be ln(0) = NULL in Spark while the
    DuckDB oracle's ln(0) raises, silently diverging the engines
    (r15 ADVICE). Candidate documents with fewer than 2 tokens have
    no bigrams and are absent from the output BY DESIGN (they carry
    no transition evidence either way) — left-join the result back
    onto the corpus and treat NULL nll_micros as 'unscored' if the
    pipeline must keep them."""
    if k_smooth < 1:
        raise ValueError(f"k_smooth must be >= 1, got {k_smooth}")
    ref_bi = _lm_bigrams(reference, text_col)
    model = ref_bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__cp"))
    ctx = model.groupBy("w1").agg(F.sum("__cp").alias("__cc"))
    vocab = (
        reference.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda x: F.length(x) > 0,
                )
            ).alias("__t")
        )
        .agg(F.count_distinct("__t").alias("__v"))
    )
    # loud guard, not NULL scores: one 1-row job over the reference
    # (mirrors the 'needs at least 2 vectors' training refusals)
    if int(vocab.first()["__v"]) == 0:
        raise ValueError(
            "bigram_lm_score: reference corpus has an empty vocabulary "
            "(no tokens) — every score would be ln(0); pass a non-empty "
            "reference slice"
        )
    doc_bi = _lm_bigrams(docs, text_col, id_col)
    k = F.lit(int(k_smooth))
    # -ln(p) micros: the ratio is < 1 by construction (cp <= cc and
    # k < k·V), so negating inside keeps every term positive
    nlp = F.round(
        F.log(
            (F.coalesce(F.col("__cc"), F.lit(0)) + k * F.col("__v")).cast(
                "double"
            )
            / (F.coalesce(F.col("__cp"), F.lit(0)) + k).cast("double")
        )
        * 1_000_000.0
    ).cast("bigint")
    return (
        doc_bi.join(model, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(F.broadcast(vocab))
        .select(id_col, nlp.alias("__nlp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("sum(__nlp) div count(1)").cast("bigint").alias("nll_micros"),
        )
    )


def _lm_trigrams(df: DataFrame, text_col: str, *keep_cols: str) -> DataFrame:
    """(..keep_cols.., w1, w2, w3) adjacent-token triples under the
    shared corpus tokenizer — element_at over an index sequence (the
    two-array zip_with shape doesn't extend to three), still one JVM
    expression per row, no positional self-join."""
    toks = df.select(
        *keep_cols,
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: F.length(x) > 0,
        ).alias("__ws"),
    )
    return (
        toks.filter(F.size("__ws") >= 3)
        .select(
            *keep_cols,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__ws") - 2),
                    lambda i: F.struct(
                        F.element_at(F.col("__ws"), i).alias("w1"),
                        F.element_at(F.col("__ws"), i + 1).alias("w2"),
                        F.element_at(F.col("__ws"), i + 2).alias("w3"),
                    ),
                )
            ).alias("__p"),
        )
        .select(
            *keep_cols,
            F.col("__p.w1").alias("w1"),
            F.col("__p.w2").alias("w2"),
            F.col("__p.w3").alias("w3"),
        )
    )


def trigram_lm_score(
    docs: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Trigram stupid-backoff LM quality scoring (r15 verdict #3 —
    the sharper CCNet signal: Wenzek et al. use a 5-gram KenLM;
    add-k bigrams saturate on short-range structure, a trigram with
    backoff separates reference-like word ORDER from merely
    reference-like word CHOICE). Stupid backoff (Brants et al. 2007,
    'Large Language Models in Machine Translation'):

        S(w3|w1,w2) = c(w1w2w3)/c(w1w2)          if c(w1w2w3) > 0
                    = 0.4 · c(w2w3)/c(w2)        elif c(w2w3) > 0
                    = 0.16 · (c(w3)+1)/(N+V)     else (add-1 floor)

    — no normalization (it's a score, not a probability), which is
    exactly what makes it expressible as pure count-table joins: one
    more count table + one more left join per order, the same
    integer-micros discipline as ``bigram_lm_score``. Every tier's
    ratio is ≤ 1 by construction (contexts sum their continuations;
    the unigram floor is add-1 over the token total), so the NEGATIVE
    log stays positive and rounds to BIGINT micros BEFORE the
    per-document mean — positive-numerator integer division,
    truncation ≡ floor, Spark ``div`` ≡ DuckDB ``//``. The 0.4/0.16
    constants are double LITERALS on both engines (0.4·0.4 ≠ 0.16 in
    IEEE — spelling them identically is what keeps the hash equal).

    Output: (id_col, n_trigrams, nll_micros); lower = more
    reference-like. Documents with fewer than 3 tokens are absent by
    design (no trigram evidence — the ``bigram_lm_score`` contract).
    Plan: model = three partial-agg count shuffles over the reference
    (trigram, bigram, unigram) + one 1-row (N, V) stats broadcast;
    scoring = five equi-joins that AQE broadcasts when the reference
    is Wikipedia-sized; one per-doc agg. A degenerate reference
    (V = 0) refuses loudly, mirroring ``bigram_lm_score``."""
    ref_tok = reference.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("__t")
    )
    st = ref_tok.agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct("__t").alias("v")
    ).first()
    n_tok, v_tok = int(st["n"]), int(st["v"])
    if v_tok == 0:
        raise ValueError(
            "trigram_lm_score: reference corpus has an empty vocabulary "
            "(no tokens) — every backoff tier would divide by zero; pass "
            "a non-empty reference slice"
        )
    tri = _lm_trigrams(reference, text_col).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("__tcp")
    )
    tctx = tri.groupBy("w1", "w2").agg(F.sum("__tcp").alias("__tcc"))
    big = _lm_bigrams(reference, text_col).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("__bcp")
    )
    bctx = big.groupBy("w1").agg(F.sum("__bcp").alias("__bcc"))
    uni = ref_tok.groupBy("__t").agg(F.count(F.lit(1)).alias("__ucp"))

    doc_tri = _lm_trigrams(docs, text_col, id_col)
    nlp = F.round(
        F.when(
            F.col("__tcp").isNotNull(),
            F.log(F.col("__tcc").cast("double") / F.col("__tcp")),
        )
        .when(
            F.col("__bcp").isNotNull(),
            F.log(
                F.col("__bcc").cast("double") / (F.lit(0.4) * F.col("__bcp"))
            ),
        )
        .otherwise(
            F.log(
                F.lit(float(n_tok + v_tok))
                / (F.lit(0.16) * (F.coalesce(F.col("__ucp"), F.lit(0)) + 1))
            )
        )
        * 1_000_000.0
    ).cast("bigint")
    return (
        doc_tri.join(tri, ["w1", "w2", "w3"], "left")
        .join(tctx, ["w1", "w2"], "left")
        .join(
            big.select(
                F.col("w1").alias("__b1"),
                F.col("w2").alias("__b2"),
                "__bcp",
            ),
            (F.col("w2") == F.col("__b1")) & (F.col("w3") == F.col("__b2")),
            "left",
        )
        .join(
            bctx.select(F.col("w1").alias("__c1"), "__bcc"),
            F.col("w2") == F.col("__c1"),
            "left",
        )
        .join(
            uni.select(F.col("__t").alias("__u3"), "__ucp"),
            F.col("w3") == F.col("__u3"),
            "left",
        )
        .select(id_col, nlp.alias("__nlp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.expr("sum(__nlp) div count(1)").cast("bigint").alias("nll_micros"),
        )
    )


def unicode_normalize(col: Column, form: str = "NFC") -> Column:
    """Unicode normalization of a string column — the canonical-form
    pass a crawl corpus needs BEFORE any hash-keyed dedup: 'é' and
    'e'+COMBINING ACUTE are the same text to a reader but different
    md5 keys to ``exact_dedup_groups``/``remove_repeated_lines``, so
    un-normalized corpora silently under-deduplicate (and BM25/
    phrase tokenizers split tokens differently). Forms: NFC (default
    — canonical composition, what web text should be), NFD, NFKC
    (compatibility folding — also maps ligatures/fullwidth; the
    aggressive choice for dedup keys), NFKD.

    Arrow-batched pandas UDF — normalization tables are exactly the
    'Python library is the point' case (Spark exposes no normalizer
    SQL function); NULLs pass through. Oracle twin: DuckDB's
    utf8proc-backed ``nfc_normalize`` (NFC only) — both sides
    implement UAX #15, pinned equal on the DQ fixture.
    """
    from pyspark.sql.types import StringType

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @F.pandas_udf(StringType())
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _norm(col)
