"""Recursive splitter compat mode (T4): kernel + Spark stage."""

from __future__ import annotations

from pyspark.sql import Row

from data_ingestion_spark.functions.textops import (
    chunk_recursive,
    recursive_character_split,
)


def test_kernel_respects_size_and_boundaries():
    text = "para one is short.\n\npara two is a bit longer than one.\n\n" + (
        "word " * 100
    ).strip()
    chunks = recursive_character_split(text, chunk_size=60, chunk_overlap=15)
    assert all(len(c) <= 60 for c in chunks)
    assert chunks[0].startswith("para one")
    # paragraph boundary respected: chunk 1 doesn't split a word
    for c in chunks:
        assert not c.startswith(" ")


def test_kernel_overlap_continuity():
    text = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 20).strip()
    chunks = recursive_character_split(text, chunk_size=80, chunk_overlap=30)
    assert len(chunks) > 3
    joined = " ".join(chunks)
    for w in ["alpha", "juliet"]:
        assert w in joined
    # consecutive chunks share trailing/leading content (overlap)
    for a, b in zip(chunks, chunks[1:]):
        tail_words = a.split()[-2:]
        assert any(w in b for w in tail_words)


def test_kernel_tiny_and_oversized_tokens():
    assert recursive_character_split("tiny", 100, 20) == ["tiny"]
    # a single 'word' longer than chunk_size falls back to hard cuts
    big = "x" * 250
    chunks = recursive_character_split(big, chunk_size=100, chunk_overlap=0)
    assert all(len(c) <= 100 for c in chunks)
    assert "".join(chunks) == big


def test_spark_stage(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}. " + ("lorem ipsum dolor sit amet. " * 30))
         for i in range(6)]
    )
    out = chunk_recursive(df, size=100, overlap=20)
    rows = out.collect()
    assert {r.doc_id for r in rows} == set(range(6))
    assert all(len(r.chunk_text) <= 100 for r in rows)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.chunk_idx)
    for idxs in per_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense ordinals


def test_kernel_no_fabricated_content_regression():
    """Regression (hypothesis find): an oversized token followed by a
    short one must not glue into content absent from the input — the
    in-recursion merge used to strip the separator ('0 '+'3' → '03')."""
    text = "000000000000000000000 3"
    chunks = recursive_character_split(text, chunk_size=20, chunk_overlap=0)
    for c in chunks:
        assert c.strip() in text or all(p in text for p in c.split()), c


def test_content_defined_chunking_shift_resistance(spark):
    """The CDC property that justifies the operator: a front edit
    re-fingerprints ONE chunk; fixed-stride chunking re-fingerprints
    the tail. Also: exact equality with a pure-Python replica of the
    boundary rule, whole-doc chunk for short docs, NULL drop,
    lossless reassembly, Python-free plan."""
    import hashlib
    import random

    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.textops import chunk_content_defined

    random.seed(7)
    base = " ".join(f"w{random.randint(0, 99999)}" for _ in range(400))
    edited = "XYZ inserted at the very front. " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, "short"), (4, None)], "doc_id long, text string"
    )
    rows = chunk_content_defined(df).collect()
    by: dict = {}
    for r in rows:
        by.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.chunk_md5))
    for k in by:
        by[k].sort()
    # python replica of the boundary rule
    def chunks_of(t, w=16, mask=64):
        cuts = [
            i for i in range(w, len(t))
            if int(hashlib.md5(t[i - w:i].encode()).hexdigest()[:15], 16) % mask == 0
        ]
        b = [0] + cuts + [len(t)]
        return [t[b[j]:b[j + 1]] for j in range(len(b) - 1)]

    assert [c for _, c, _ in by[1]] == chunks_of(base)
    assert "".join(c for _, c, _ in by[1]) == base          # lossless
    assert len(by[1]) > 20                                  # ~64-char chunks
    h1 = {h for _, _, h in by[1]}
    h2 = {h for _, _, h in by[2]}
    assert len(h1 & h2) >= len(h1) - 2                      # only the edited head differs
    assert by[3] == [(0, "short", hashlib.md5(b"short").hexdigest())]
    assert 4 not in by                                      # NULL text -> no rows
    plan = chunk_content_defined(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_winnow_guarantee_and_density(spark):
    """The winnowing theorem, tested: any shared substring of length
    >= w + k - 1 (= 15 here) yields >= 1 shared fingerprint; selected
    density sits near 2/(w+1); disjoint random docs share nothing
    (md5 collisions aside); short docs fingerprint whole-text."""
    import random

    from data_ingestion_spark.functions.textops import winnow_fingerprints

    random.seed(13)

    def rand_text(n):
        return "".join(random.choice("abcdefghij") for _ in range(n))

    shared = rand_text(15)  # exactly w + k - 1
    a = rand_text(300) + shared + rand_text(300)
    b = rand_text(280) + shared + rand_text(310)
    c = rand_text(600)  # unrelated
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, "tiny"), (5, None)], "doc_id long, text string"
    )
    rows = winnow_fingerprints(df, k=8, w=8).collect()
    by: dict = {}
    for r in rows:
        by.setdefault(r.doc_id, set()).add(r.fp)
    assert by[1] & by[2], "guaranteed shared fingerprint missing"
    assert not (by[1] & by[3])  # disjoint content
    # density: ~2/(w+1) of the ~600 grams, generous band
    assert 60 <= len(by[1]) <= 220
    assert len(by[4]) == 1  # whole-text fingerprint for short doc
    assert 5 not in by      # NULL text -> no rows
    # plan stays JVM-side
    plan = winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
