"""Managed index versioning + compaction + boolean retrieval (r12).

compact_index is OPTIMIZE+VACUUM over plain parquet: queries before
and after must be hash-identical, dead versions must be gone, and
file sizes must respect the target. bool_search_indexed is the ES
`bool` shape as posting-list semi/anti-joins.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_spark.functions.similarity import (
    bm25_rank_batch_indexed,
    bool_search_indexed,
    build_postings_index,
    build_postings_index_versioned,
    compact_index,
    index_current_path,
    upsert_postings_index_versioned,
)


def _docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )


def _ranked(spark, idx, topk=10):
    qdf = spark.createDataFrame(
        [(1, "spark vector"), (2, "customer merge order")],
        "query_id int, query_text string",
    )
    return sorted(
        (r.query_id, r.doc_id, round(r.score, 6), r.rank)
        for r in bm25_rank_batch_indexed(spark, qdf, idx, topk=topk).collect()
    )


@pytest.mark.slow
def test_compact_preserves_queries_and_vacuums(spark, tmp_path):
    """After build + 2 upserts the root holds 3 versions; compact
    rewrites the live one, commits the pointer, and drops every dead
    version (retain=1). Queries served through the pointer are
    hash-identical before/after — compaction moves bytes, not
    rows."""
    d = _docs(spark)
    root = str(tmp_path / "root")
    build_postings_index_versioned(d.filter(F.col("doc_id") % 3 == 1), root)
    upsert_postings_index_versioned(d.filter(F.col("doc_id") % 3 == 2), root)
    upsert_postings_index_versioned(d.filter(F.col("doc_id") % 3 == 0), root)
    assert len([n for n in os.listdir(root) if n.startswith("v_")]) == 3
    before = _ranked(spark, index_current_path(root))
    compact_index(spark, root, retain=1)
    assert [n for n in os.listdir(root) if n.startswith("v_")] == ["v_000003"]
    assert index_current_path(root).endswith("v_000003")
    assert _ranked(spark, index_current_path(root)) == before


@pytest.mark.slow
def test_compact_retain_two_and_size_target(spark, tmp_path):
    """retain=2 keeps the pre-compact version for in-flight readers;
    a tiny max_records_per_file provably splits files (every written
    parquet file holds <= the target rows)."""
    from data_ingestion_spark.functions.similarity import IndexReader

    d = _docs(spark)
    root = str(tmp_path / "root")
    build_postings_index_versioned(d, root)
    pre = index_current_path(root)
    dst = compact_index(spark, root, retain=2, max_records_per_file=50)
    left = sorted(n for n in os.listdir(root) if n.startswith("v_"))
    assert left == [os.path.basename(pre), os.path.basename(dst)]
    # the compacted version is a manifest over ONE segment; the size
    # target applies to that segment's data files
    seg_paths = IndexReader(spark, dst).seg_paths
    assert len(seg_paths) == 1
    files = glob.glob(
        os.path.join(seg_paths[0], "postings", "**", "*.parquet"), recursive=True
    )
    assert files  # non-vacuous: the fold actually wrote postings
    for fp in files:
        assert spark.read.parquet(fp).count() <= 50, fp
    with pytest.raises(ValueError, match="retain"):
        compact_index(spark, root, retain=0)


def test_versioned_helpers_contracts(spark, tmp_path):
    """Pointer resolution is None before any commit; upsert and
    compact refuse a root with no live version."""
    root = str(tmp_path / "empty")
    os.makedirs(root)
    assert index_current_path(root) is None
    with pytest.raises(FileNotFoundError, match="CURRENT"):
        upsert_postings_index_versioned(_docs(spark).limit(1), root)
    with pytest.raises(FileNotFoundError, match="CURRENT"):
        compact_index(spark, root)


@pytest.fixture(scope="module")
def bool_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("bool") / "idx")
    build_postings_index(_docs(spark), idx)
    return idx


def _bool(spark, idx, rows, topk=10):
    qdf = spark.createDataFrame(
        rows,
        "query_id int, must array<string>, should array<string>, "
        "must_not array<string>",
    )
    return bool_search_indexed(spark, qdf, idx, topk=topk)


def test_bool_must_is_conjunction_and_must_not_excludes(spark, bool_idx):
    """Every returned doc contains ALL must terms and NO must_not
    term — verified against the tokenized corpus directly."""
    out = _bool(spark, bool_idx, [(1, ["spark", "vector"], [], ["customer"])])
    docs = {r.doc_id for r in out.collect()}
    assert docs  # fixture guarantees some spark+vector docs
    toks = (
        _docs(spark)
        .select(
            "doc_id",
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: F.length(x) > 0
            ).alias("ws"),
        )
        .filter(F.col("doc_id").isin(list(docs)))
        .collect()
    )
    for r in toks:
        ws = set(r.ws)
        assert {"spark", "vector"} <= ws and "customer" not in ws, r.doc_id


def test_bool_pure_should_needs_one_match(spark, bool_idx):
    """With no must clause, eligibility is >= 1 should term
    (ES minimum_should_match default for pure-should) — a doc with
    neither term never appears, a doc with either does (up to k)."""
    out = _bool(spark, bool_idx, [(1, [], ["spark", "vector"], [])], topk=1000)
    got = {r.doc_id for r in out.collect()}
    ws = _docs(spark).select(
        "doc_id",
        F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: F.length(x) > 0).alias("ws"),
    )
    expected = {
        r.doc_id
        for r in ws.collect()
        if {"spark", "vector"} & set(r.ws)
    }
    assert got == expected


def test_bool_clause_tokenization_and_empty_clauses(spark, bool_idx):
    """Clause elements run through the index tokenizer: a phrase
    element 'Spark VECTOR!' becomes the two terms; NULL/empty
    clause arrays are no-ops; a query matching nothing returns no
    rows (not an error)."""
    a = _bool(spark, bool_idx, [(1, ["Spark VECTOR!"], [], [])], topk=1000)
    b = _bool(spark, bool_idx, [(1, ["spark", "vector"], [], [])], topk=1000)
    ra = sorted((r.doc_id, round(r.score, 6)) for r in a.collect())
    rb = sorted((r.doc_id, round(r.score, 6)) for r in b.collect())
    assert ra == rb and ra
    none = _bool(spark, bool_idx, [(1, ["zzqqxxnotaterm"], None, [])])
    assert none.count() == 0


def test_bool_scan_is_partition_pruned(spark, bool_idx):
    """The postings scan reads only the buckets the union of clause
    terms hashes into — plan-time pruning, the at-rest contract."""
    out = _bool(spark, bool_idx, [(1, ["spark"], ["vector"], ["customer"])])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    from data_ingestion_spark.functions.similarity import _index_bucket

    total = (
        spark.read.parquet(bool_idx + "/postings")
        .select(F.input_file_name()).distinct().count()
    )
    hit_buckets = [
        r.b
        for r in spark.createDataFrame(
            [("spark",), ("vector",), ("customer",)], "t string"
        ).select(_index_bucket(F.col("t"), 64).alias("b")).distinct().collect()
    ]
    pruned_files = (
        spark.read.parquet(bool_idx + "/postings")
        .filter(F.col("bucket").isin(hit_buckets))
        .select(F.input_file_name()).distinct().count()
    )
    assert 0 < pruned_files < total


def test_bool_clause_rows_refusal(spark, tmp_path):
    """r13 verdict #6: the driver-side clause-table collect refuses
    loudly past max_clause_rows (and caps the collect itself at the
    bound, so the refusing call never materializes the batch); the
    same batch passes with the bound raised."""
    import pytest

    from data_ingestion_spark.functions.similarity import (
        bool_search_indexed,
        build_postings_index,
    )

    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    idx = str(tmp_path / "idx")
    build_postings_index(d, idx, buckets=8)
    bq = spark.createDataFrame(
        [(1, ["spark"], ["vector", "customer"], []), (2, ["merge"], [], ["order"])],
        "query_id int, must array<string>, should array<string>, "
        "must_not array<string>",
    )
    with pytest.raises(ValueError, match="max_clause_rows"):
        bool_search_indexed(spark, bq, idx, max_clause_rows=2)
    assert bool_search_indexed(spark, bq, idx).count() >= 0
