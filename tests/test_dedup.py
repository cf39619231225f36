

def test_jaccard_hot_shingle_cap_default_on(spark):
    """Production entry point caps hot shingles BY DEFAULT: a shingle
    shared by every doc (a 'stopword shingle') must not create pairs
    on its own, while genuinely similar pairs survive capping."""
    from pyspark.sql import Row

    from data_ingestion_spark.functions.dedup import (
        DEFAULT_MAX_DOC_FREQ,
        ngram_jaccard_pairs,
    )

    hot = "the quick brown"  # one 3-gram every doc shares
    rows = [Row(doc_id=i, text=f"{hot} tail{i} unique{i} words{i} here{i}") for i in range(12)]
    # docs 100/101: real near-duplicates (share many shingles)
    rows += [
        Row(doc_id=100, text=f"{hot} alpha beta gamma delta epsilon zeta"),
        Row(doc_id=101, text=f"{hot} alpha beta gamma delta epsilon eta"),
    ]
    df = spark.createDataFrame(rows)

    # cap of 4 < 14 docs: the ubiquitous shingle is dropped
    capped = ngram_jaccard_pairs(
        df, "text", "doc_id", shingle_n=3, threshold=0.1, max_doc_freq=4
    ).collect()
    capped_pairs = {(r.id_a, r.id_b) for r in capped}
    assert (100, 101) in capped_pairs  # real near-dups survive
    assert all({a, b} == {100, 101} for a, b in capped_pairs)  # hot-only pairs gone

    # uncapped: the shared shingle alone creates pairs between unrelated docs
    uncapped = ngram_jaccard_pairs(
        df, "text", "doc_id", shingle_n=3, threshold=0.1, max_doc_freq=None
    ).collect()
    assert len(uncapped) > len(capped)

    # and the default IS capped (not None)
    assert DEFAULT_MAX_DOC_FREQ is not None
    import inspect

    sig = inspect.signature(ngram_jaccard_pairs)
    assert sig.parameters["max_doc_freq"].default == DEFAULT_MAX_DOC_FREQ


def test_minhash_bucket_cap_default_on(spark):
    """LSH bucket guard: a flooded band bucket (many identical docs)
    must not expand to b²/2 pairs in the production fast path; small
    near-dup groups still pair up. Uncapped form recovers everything."""
    from pyspark.sql import Row

    from data_ingestion_spark.functions.dedup import (
        DEFAULT_MAX_BUCKET,
        minhash_lsh_candidates_fast,
    )

    hot = "all these documents share exactly the same words forever"
    rows = [Row(doc_id=i, text=hot) for i in range(30)]
    rows += [
        Row(doc_id=100, text="alpha beta gamma delta epsilon zeta eta theta"),
        Row(doc_id=101, text="alpha beta gamma delta epsilon zeta eta iota"),
    ]
    df = spark.createDataFrame(rows)

    capped = minhash_lsh_candidates_fast(df, "text", "doc_id", max_bucket=8).collect()
    capped_pairs = {(r.id_a, r.id_b) for r in capped}
    assert (100, 101) in capped_pairs
    assert all({a, b} == {100, 101} for a, b in capped_pairs)  # hot bucket dropped

    uncapped = minhash_lsh_candidates_fast(df, "text", "doc_id", max_bucket=None).collect()
    assert len({(r.id_a, r.id_b) for r in uncapped}) >= 30 * 29 // 2  # b²/2 blowup is real

    import inspect

    sig = inspect.signature(minhash_lsh_candidates_fast)
    assert sig.parameters["max_bucket"].default == DEFAULT_MAX_BUCKET


def test_repeated_passage_spans_semantics(spark):
    """Planted boilerplate is found on every carrier doc; a corpus of
    all-distinct texts reports nothing; stride=1 finds a superset of
    stride=16's carriers."""
    from data_ingestion_spark.functions.dedup import repeated_passage_spans

    rows = [
        (0, "COMMON LICENSE HEADER " * 4 + "unique tail zero " * 6),
        (1, "COMMON LICENSE HEADER " * 4 + "completely different body one " * 5),
        (2, "no shared passages here at all, " * 8),
        (3, "another entirely distinct document body text, " * 6),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n_shared_spans for r in repeated_passage_spans(df).collect()}
    assert set(got) == {0, 1} and all(v >= 1 for v in got.values())

    distinct_only = spark.createDataFrame(rows[2:], "doc_id long, text string")
    assert repeated_passage_spans(distinct_only).count() == 0

    wide = {r.doc_id for r in repeated_passage_spans(df, stride=1).collect()}
    assert wide >= set(got)


def test_repeated_passage_spans_column_clash_raises(spark):
    import pytest

    from data_ingestion_spark.functions.dedup import repeated_passage_spans

    df = spark.createDataFrame([(1, "x" * 80, "y")], "doc_id long, text string, __text string")
    with pytest.raises(ValueError, match="__text"):
        repeated_passage_spans(df)
