"""Row-level delete via tombstone-only segments (r13 verdict #2).

A delete is a replacement with nothing: a segment whose id list joins
the last-wins shadow sets but that is never read as a data source.
Pins, for BOTH at-rest layouts (postings index + ANN store, raw and
quantized):

- deleted ids vanish from every serving path (bm25 batch / bool /
  phrase; probe / probe_batch / quantized probes / filtered probe);
- exact stats: n_docs/avgdl after delete equal a from-scratch build
  over the surviving corpus (and derived df via serving equality);
- deletes compose with upserts in either order (delete then re-add
  resurrects; add then delete removes);
- compaction physically drops shadowed-without-replacement rows and
  the tombstone itself (single data segment, no tombstones flag);
- drift report classifies a deleted id as ``removed``.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_spark.functions.similarity import (
    AnnStore,
    IndexReader,
    bm25_rank_batch_indexed,
    bool_search_indexed,
    build_postings_index,
    build_postings_index_versioned,
    compact_ann_store,
    compact_index,
    delete_ann_ids,
    delete_index_ids,
    index_current_path,
    phrase_match,
    upsert_ann_store_versioned,
    upsert_postings_index_versioned,
    write_ann_store_versioned,
    _open_ann_version,
    _read_manifest,
    ann_version_drift,
)


def _docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
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
def test_index_delete_ids_all_serving_paths_and_compaction(spark, tmp_path):
    d = _docs(spark)
    doomed = d.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    survivors = d.filter(F.col("doc_id") % 7 != 0)

    root = str(tmp_path / "root")
    build_postings_index_versioned(d, root, positions=True)
    delete_index_ids(doomed, root)
    cur = index_current_path(root)
    rdr = IndexReader(spark, cur)
    assert rdr.seg_tomb == [False, True]

    mono = str(tmp_path / "mono")
    build_postings_index(survivors, mono, positions=True)
    mono_rdr = IndexReader(spark, mono)

    # exact stats over the survivors
    assert rdr.n_docs == mono_rdr.n_docs
    assert rdr.avgdl == pytest.approx(mono_rdr.avgdl, rel=1e-12)

    # bm25 / bool / phrase all serve the surviving corpus exactly
    assert _ranked(spark, cur) == _ranked(spark, mono)
    bq = spark.createDataFrame(
        [(1, ["spark"], ["vector"], []), (2, [], ["customer", "merge"], ["order"])],
        "query_id int, must array<string>, should array<string>, "
        "must_not array<string>",
    )
    assert sorted(map(tuple, bool_search_indexed(spark, bq, cur).collect())) == sorted(
        map(tuple, bool_search_indexed(spark, bq, mono).collect())
    )
    pq = spark.createDataFrame([(1, "spark vector")], "query_id int, query_text string")
    assert sorted(map(tuple, phrase_match(spark, pq, cur).collect())) == sorted(
        map(tuple, phrase_match(spark, pq, mono).collect())
    )
    # no doomed doc anywhere in the resolved postings
    doomed_ids = {r.doc_id for r in doomed.collect()}
    assert not doomed_ids & {r.doc_id for r in rdr.doclens().collect()}

    # delete composes with a later upsert: re-adding one doomed doc
    # resurrects it (the newer data segment outranks the tombstone)
    back = d.filter(F.col("doc_id") == sorted(doomed_ids)[0])
    upsert_postings_index_versioned(back, root)
    cur2 = index_current_path(root)
    assert sorted(doomed_ids)[0] in {
        r.doc_id for r in IndexReader(spark, cur2).doclens().collect()
    }
    # and delete it again so the compaction check covers the full set
    delete_index_ids(back.select("doc_id"), root)

    compact_index(spark, root, retain=1)
    cur3 = index_current_path(root)
    m = _read_manifest(cur3)
    assert len(m["segments"]) == 1 and "tombstones" not in m
    assert _ranked(spark, cur3) == _ranked(spark, mono)
    folded = IndexReader(spark, cur3)
    assert folded.n_docs == mono_rdr.n_docs
    assert not doomed_ids & {r.doc_id for r in folded.doclens().collect()}


@pytest.mark.slow
def test_ann_delete_ids_raw_and_quantized(spark, tmp_path):
    emb = _emb(spark)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    base = emb.filter(F.col("vec_id") != 0)
    doomed = base.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    survivors = base.filter(F.col("vec_id") % 7 != 0)
    doomed_ids = {r.vec_id for r in doomed.collect()}

    def topk(store, k=8):
        return [(r.vec_id, round(r.score, 6)) for r in store.probe(qv, k).collect()]

    # raw layout
    root = str(tmp_path / "raw_root")
    write_ann_store_versioned(base, root, bits=3, n_tables=6)
    st = delete_ann_ids(doomed, root)
    ref = AnnStore(spark, str(tmp_path / "raw_ref"), bits=3, n_tables=6)
    ref.write(survivors)
    assert topk(st) == topk(ref)
    assert not doomed_ids & {r[0] for r in topk(st, 50)}
    # batch path sees the delete too
    queries = emb.filter(F.col("vec_id") <= 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = sorted(map(tuple, st.probe_batch(queries, k=5).collect()))
    want = sorted(map(tuple, ref.probe_batch(queries, k=5).collect()))
    assert got == want
    # drift report: deleted ids are `removed`
    drift = {
        r.vec_id: r.status for r in ann_version_drift(spark, root).collect()
    }
    assert doomed_ids <= {k for k, v in drift.items() if v == "removed"}
    # compaction folds the tombstone away, serving unchanged
    compact_ann_store(spark, root, retain=1)
    live = _open_ann_version(spark, index_current_path(root))
    m = _read_manifest(index_current_path(root))
    assert len(m["segments"]) == 1 and "tombstones" not in m
    assert topk(live) == topk(ref)

    # quantized layout: delete applies across upsert + tombstone,
    # probe_quantized and the batch twin both exclude the ids
    qroot = str(tmp_path / "q_root")
    write_ann_store_versioned(base, qroot, quantized=True, bits=3, n_tables=6)
    upsert_ann_store_versioned(
        base.filter(F.col("vec_id") % 5 == 0), qroot
    )  # a data delta first, so the tombstone sits over 2 segments
    qst = delete_ann_ids(doomed, qroot)
    qref = AnnStore(spark, str(tmp_path / "q_ref"), bits=3, n_tables=6)
    qref.write_quantized(survivors)
    gq = [(r.vec_id, round(r.score, 6)) for r in qst.probe_quantized(qv, 8).collect()]
    wq = [(r.vec_id, round(r.score, 6)) for r in qref.probe_quantized(qv, 8).collect()]
    assert gq == wq
    gb = sorted(map(tuple, qst.probe_batch_quantized(queries, k=5).collect()))
    wb = sorted(map(tuple, qref.probe_batch_quantized(queries, k=5).collect()))
    assert gb == wb
    # compaction (the re-quantization point) drops the rows physically
    compact_ann_store(spark, qroot, retain=1)
    qlive = _open_ann_version(spark, index_current_path(qroot))
    gq2 = [(r.vec_id, round(r.score, 6)) for r in qlive.probe_quantized(qv, 8).collect()]
    assert gq2 == wq


def test_ann_delete_preserves_metadata_filtered_probe(spark, tmp_path):
    emb = _emb(spark).withColumn("lang", F.when(F.col("vec_id") % 2 == 0, "en").otherwise("de"))
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    base = emb.filter(F.col("vec_id") != 0)
    doomed = base.filter(F.col("vec_id") % 6 == 0).select("vec_id")
    root = str(tmp_path / "root")
    write_ann_store_versioned(base, root, metadata_cols=("lang",), bits=3, n_tables=6)
    st = delete_ann_ids(doomed, root)
    ref = AnnStore(spark, str(tmp_path / "ref"), bits=3, n_tables=6)
    ref.write(base.join(doomed, "vec_id", "left_anti"), metadata_cols=("lang",))
    got = [
        (r.vec_id, round(r.score, 6))
        for r in st.probe(qv, 5, where=F.col("lang") == "en").collect()
    ]
    want = [
        (r.vec_id, round(r.score, 6))
        for r in ref.probe(qv, 5, where=F.col("lang") == "en").collect()
    ]
    assert got == want


def test_index_report_counts_and_drift(spark, tmp_path):
    """r13 verdict #7: the ops report pins exact per-segment rows /
    kind / shadowed-id counts over a build -> upsert -> delete chain
    (postings) and reports per-segment SQ8 bounds drift (ANN): the
    observability that pairs with the max_segments trigger."""
    from data_ingestion_spark.functions.similarity import index_report

    d = _docs(spark).limit(100)
    root = str(tmp_path / "idx")
    build_postings_index_versioned(d, root, buckets=8)           # 100 docs
    upsert_postings_index_versioned(d.filter(F.col("doc_id") < 20), root)  # replace 20
    delete_index_ids(
        d.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 40)).select("doc_id"),
        root,
    )  # delete 10, disjoint from the replaced 20
    rep = index_report(spark, root).collect()
    assert [(r.segment, r.kind, r.layout, r.rows, r.shadowed_ids) for r in rep] == [
        ("segments/s_000000", "data", "postings", 100, 30),
        ("segments/s_000001", "data", "postings", 20, 0),
        ("segments/s_000002", "tombstone", "postings", 10, 0),
    ]
    assert all(r.bytes > 0 and r.bounds_drift is None for r in rep)

    emb = _emb(spark).limit(300)
    aroot = str(tmp_path / "ann")
    write_ann_store_versioned(
        emb.filter(F.col("vec_id") < 200), aroot, quantized=True, bits=3, n_tables=4
    )
    # the delta's vectors are scaled 3x -> its own SQ8 bounds differ
    upsert_ann_store_versioned(
        emb.filter(F.col("vec_id") >= 200).withColumn(
            "embedding", F.transform("embedding", lambda x: x * 3.0)
        ),
        aroot,
    )
    arep = index_report(spark, aroot).collect()
    assert [r.layout for r in arep] == ["ann_sq8", "ann_sq8"]
    assert arep[0].bounds_drift == 0.0 and arep[1].bounds_drift > 0.5
    assert arep[0].shadowed_ids == 0  # disjoint ids: nothing shadowed
