"""LSM delta-segment index maintenance (r13, r12 verdict #1).

The managed postings root is an LSM manifest: an upsert writes the
delta as a NEW segment plus a tiny manifest — O(delta), the old
postings are never rewritten or read — and serving resolves the union
of segments with last-wins id shadowing. These tests pin:

- the O(delta) write contract (base segment files untouched by upsert);
- logical equivalence: segmented serve ≡ monolithic rebuild for BM25
  batch, boolean retrieval, phrase search, and the raw postings rows;
- exact stats and derived df across replacements;
- the shuffle-join fallback when the shadow set exceeds broadcast size;
- compaction folding segments to one with manifest-aware vacuum that
  never deletes a directory a retained manifest still references
  (including a legacy monolithic version serving as the base segment).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_spark.functions import similarity as SIM
from data_ingestion_spark.functions.similarity import (
    IndexReader,
    bm25_rank_batch_indexed,
    bool_search_indexed,
    build_postings_index,
    build_postings_index_versioned,
    compact_index,
    index_current_path,
    phrase_match,
    upsert_postings_index_versioned,
)


def _docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )


def _stale(d):
    # every 5th doc carries noise terms that must vanish after upsert
    return d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" stale vector spark noise")),
        ).otherwise(F.col("text")),
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


def _postings_rows(spark, idx):
    return sorted(
        (r.term, r.doc_id, r.tf, r.dl, r.bucket)
        for r in IndexReader(spark, idx).postings().collect()
    )


def _file_stats(seg_dir):
    out = {}
    for base, _, files in os.walk(seg_dir):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(base, f)
                out[p] = os.path.getsize(p)
    return out


def test_upsert_is_o_delta_and_equals_rebuild(spark, tmp_path):
    """The core LSM contract: after a versioned build + upsert, (a)
    the BASE segment's data files are byte-for-byte untouched — the
    upsert wrote only the delta; (b) the logical index equals a
    monolithic rebuild over the true merged corpus, for raw postings
    rows, BM25 serving, and exact stats."""
    d = _docs(spark)
    root = str(tmp_path / "root")
    build_postings_index_versioned(_stale(d), root)
    base_seg = IndexReader(spark, index_current_path(root)).seg_paths[0]
    before = _file_stats(base_seg)
    upsert_postings_index_versioned(d.filter(F.col("doc_id") % 5 == 0), root)
    assert _file_stats(base_seg) == before  # O(delta): base never rewritten
    cur = index_current_path(root)
    rdr = IndexReader(spark, cur)
    assert len(rdr.seg_paths) == 2

    mono = str(tmp_path / "mono")
    build_postings_index(d, mono)
    assert _postings_rows(spark, cur) == _postings_rows(spark, mono)
    assert _ranked(spark, cur) == _ranked(spark, mono)
    mono_rdr = IndexReader(spark, mono)
    assert rdr.n_docs == mono_rdr.n_docs
    assert rdr.avgdl == pytest.approx(mono_rdr.avgdl, rel=1e-12)


@pytest.mark.slow
def test_multi_segment_bool_phrase_and_new_docs(spark, tmp_path):
    """Two stacked deltas (one replacement wave, one brand-new docs):
    boolean retrieval and positional phrase search over the segmented
    index equal the monolithic rebuild — the derived-df path and the
    positional postings both resolve last-wins correctly."""
    d = _docs(spark)
    root = str(tmp_path / "root")
    build_postings_index_versioned(_stale(d), root, positions=True)
    upsert_postings_index_versioned(d.filter(F.col("doc_id") % 5 == 0), root)
    fresh = spark.createDataFrame(
        [(100000 + i, f"fresh spark vector document {i}") for i in range(7)],
        "doc_id bigint, text string",
    )
    upsert_postings_index_versioned(fresh, root)
    cur = index_current_path(root)
    assert len(IndexReader(spark, cur).seg_paths) == 3

    mono = str(tmp_path / "mono")
    build_postings_index(d.unionByName(fresh), mono, positions=True)

    bq = spark.createDataFrame(
        [
            (1, ["spark"], ["vector"], ["noise"]),
            (2, [], ["customer", "merge"], []),
        ],
        "query_id int, must array<string>, should array<string>, "
        "must_not array<string>",
    )
    got = sorted(
        map(tuple, bool_search_indexed(spark, bq, cur, topk=10).collect())
    )
    ref = sorted(
        map(tuple, bool_search_indexed(spark, bq, mono, topk=10).collect())
    )
    assert got == ref

    pq = spark.createDataFrame(
        [(1, "spark vector"), (2, "fresh spark vector")],
        "query_id int, query_text string",
    )
    gp = sorted(map(tuple, phrase_match(spark, pq, cur).collect()))
    rp = sorted(map(tuple, phrase_match(spark, pq, mono).collect()))
    assert gp == rp
    # the stale marker phrase is fully shadowed: zero hits
    nq = spark.createDataFrame([(9, "stale vector spark noise")],
                               "query_id int, query_text string")
    assert phrase_match(spark, nq, cur).count() == 0


def test_shadow_shuffle_fallback_equals_broadcast(spark, tmp_path, monkeypatch):
    """When the newer-segment id set exceeds BROADCAST_MAX_IDS the
    anti-joins switch to shuffle joins — same logical result, one
    extra exchange. Pin equality by forcing the threshold to 0."""
    d = _docs(spark).limit(120)
    root = str(tmp_path / "root")
    build_postings_index_versioned(_stale(d), root)
    upsert_postings_index_versioned(d.filter(F.col("doc_id") % 5 == 0), root)
    cur = index_current_path(root)
    broadcast_rows = _postings_rows(spark, cur)
    monkeypatch.setattr(SIM, "BROADCAST_MAX_IDS", 0)
    assert _postings_rows(spark, cur) == broadcast_rows
    # and the stats/upsert path also survives the fallback branch
    upsert_postings_index_versioned(d.limit(5), root)
    assert IndexReader(spark, index_current_path(root)).n_docs == 120


def test_compact_folds_segments_and_manifest_aware_vacuum(spark, tmp_path):
    """Compaction folds the segment list to ONE full segment (derived
    global terms, exact stats) with identical serving, and vacuum is
    manifest-aware: with retain=2 the pre-compact manifest's segments
    survive; a second compact with retain=1 leaves exactly the live
    manifest + its single segment."""
    d = _docs(spark)
    root = str(tmp_path / "root")
    build_postings_index_versioned(_stale(d), root)
    upsert_postings_index_versioned(d.filter(F.col("doc_id") % 5 == 0), root)
    before = _ranked(spark, index_current_path(root))
    compact_index(spark, root, retain=2)
    cur = index_current_path(root)
    assert len(IndexReader(spark, cur).seg_paths) == 1
    assert _ranked(spark, cur) == before
    # retain=2 kept the pre-compact version AND the segments it needs
    pre_rdr = IndexReader(spark, sorted(
        os.path.join(root, n) for n in os.listdir(root) if n.startswith("v_")
    )[-2])
    for p in pre_rdr.seg_paths:
        assert os.path.isdir(p), p
    assert _ranked(spark, pre_rdr.root) == before  # still fully servable
    compact_index(spark, root, retain=1)
    vs = [n for n in os.listdir(root) if n.startswith("v_")]
    assert len(vs) == 1
    segs = os.listdir(os.path.join(root, "segments"))
    assert len(segs) == 1
    assert _ranked(spark, index_current_path(root)) == before


@pytest.mark.slow
def test_legacy_monolithic_version_becomes_base_segment(spark, tmp_path):
    """Backward compatibility: a root whose CURRENT is a pre-LSM
    monolithic version directory upserts into a manifest that
    references that directory as the base segment — and vacuum never
    deletes it while a retained manifest points at it."""
    d = _docs(spark)
    root = str(tmp_path / "root")
    legacy = os.path.join(root, "v_000000")
    build_postings_index(_stale(d), legacy)  # the old on-disk layout
    SIM._commit_index_version(root, "v_000000")
    upsert_postings_index_versioned(d.filter(F.col("doc_id") % 5 == 0), root)
    cur = index_current_path(root)
    rdr = IndexReader(spark, cur)
    assert rdr.seg_paths[0] == legacy
    mono = str(tmp_path / "mono")
    build_postings_index(d, mono)
    assert _ranked(spark, cur) == _ranked(spark, mono)
    # retain=2 keeps the manifest version referencing the legacy dir →
    # the legacy dir must survive even though it is 3rd-newest
    compact_index(spark, root, retain=2)
    assert os.path.isdir(legacy)
    assert _ranked(spark, index_current_path(root)) == _ranked(spark, mono)
    compact_index(spark, root, retain=1)
    assert not os.path.isdir(legacy)  # nothing references it anymore


@pytest.mark.slow
def test_empty_corpus_versioned_index_serves(spark, tmp_path):
    """The empty-input contract holds through the manifest layout:
    build over an empty corpus commits a servable version (0 rows, no
    crash), and an upsert over it serves exactly the delta."""
    d = _docs(spark)
    root = str(tmp_path / "root")
    build_postings_index_versioned(d.limit(0), root)
    assert _ranked(spark, index_current_path(root)) == []
    upsert_postings_index_versioned(d.limit(20), root)
    mono = str(tmp_path / "mono")
    build_postings_index(d.limit(20), mono)
    assert _ranked(spark, index_current_path(root)) == _ranked(spark, mono)

# ---------------------------------------------------------------- ANN side


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _neg(c):
    return F.transform(c, lambda x: -x)


@pytest.mark.slow
def test_ann_upsert_is_o_delta_and_equals_rebuild(spark, tmp_path):
    """Vector mirror of the core LSM contract: after a versioned
    write + upsert, the base segment's files are untouched (the
    upsert wrote only the delta segment + manifest), and the probe
    over the segment union equals a monolithic rebuild over the true
    merged corpus — replacement shadowing across all n_tables pointer
    copies included."""
    from data_ingestion_spark.functions.similarity import (
        AnnStore,
        SegmentedAnnStore,
        index_current_path,
        upsert_ann_store_versioned,
        write_ann_store_versioned,
    )

    e = _emb(spark)
    base = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding", "label")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).head().embedding]
    stale = base.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 5 == 0, _neg("embedding")).otherwise(
            F.col("embedding")
        ),
    )
    delta = base.filter(F.col("vec_id") % 5 == 0).unionByName(
        base.filter(F.col("vec_id").between(1, 3)).select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            _neg("embedding").alias("embedding"),
            "label",
        )
    )
    root = str(tmp_path / "root")
    write_ann_store_versioned(
        stale, root, metadata_cols=("label",), bits=3, n_tables=6
    )
    base_seg = os.path.join(root, "segments", "s_000000")
    before = _file_stats(base_seg)
    st = upsert_ann_store_versioned(delta, root)
    assert _file_stats(base_seg) == before  # O(delta)
    assert isinstance(st, SegmentedAnnStore) and len(st.seg_paths) == 2

    truth = base.unionByName(
        base.filter(F.col("vec_id").between(1, 3)).select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            _neg("embedding").alias("embedding"),
            "label",
        )
    )
    mono = AnnStore(spark, str(tmp_path / "mono"), bits=3, n_tables=6)
    mono.write(truth, metadata_cols=("label",))

    def p5(s, **kw):
        return [(r.vec_id, round(r.score, 6)) for r in s.probe(qv, 5, **kw).collect()]

    assert p5(st) == p5(mono)
    # metadata rides the delta segments too: filtered probe matches
    ql = truth.filter(F.col("vec_id") == 5).head().label
    assert p5(st, where=F.col("label") == ql) == p5(mono, where=F.col("label") == ql)
    # the open() round-trip serves the same thing
    from data_ingestion_spark.functions.similarity import AnnStore as A
    assert p5(A.open(spark, index_current_path(root))) == p5(mono)


@pytest.mark.slow
def test_ann_compact_folds_and_vacuums(spark, tmp_path):
    """compact_ann_store folds the segment chain into ONE segment
    without re-hashing (probe identical), resets anti-join depth, and
    manifest-aware vacuum leaves exactly the live version + its
    segment at retain=1."""
    from data_ingestion_spark.functions.similarity import (
        SegmentedAnnStore,
        compact_ann_store,
        index_current_path,
        upsert_ann_store_versioned,
        write_ann_store_versioned,
    )

    e = _emb(spark)
    base = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).head().embedding]
    root = str(tmp_path / "root")
    write_ann_store_versioned(
        base.withColumn("embedding", _neg("embedding")), root, bits=3, n_tables=6
    )
    upsert_ann_store_versioned(base.filter(F.col("vec_id") % 2 == 0), root)
    st = upsert_ann_store_versioned(base.filter(F.col("vec_id") % 2 == 1), root)
    before = [(r.vec_id, round(r.score, 6)) for r in st.probe(qv, 5).collect()]
    folded = compact_ann_store(spark, root, retain=1)
    assert isinstance(folded, SegmentedAnnStore) and len(folded.seg_paths) == 1
    assert [
        (r.vec_id, round(r.score, 6)) for r in folded.probe(qv, 5).collect()
    ] == before
    assert [n for n in os.listdir(root) if n.startswith("v_")] == ["v_000003"]
    assert os.listdir(os.path.join(root, "segments")) == ["s_000003"]
    assert index_current_path(root).endswith("v_000003")


@pytest.mark.slow
def test_ann_legacy_monolithic_base_and_read_view_guards(spark, tmp_path):
    """A pre-LSM monolithic ANN version upserts into a manifest that
    references it as the base segment (geometry/metadata restored
    from its sidecar, never handle state); the read view refuses
    writes; vacuum keeps the legacy dir while referenced."""
    import pytest as _pytest

    from data_ingestion_spark.functions.similarity import (
        AnnStore,
        SegmentedAnnStore,
        _commit_index_version,
        index_current_path,
        upsert_ann_store_versioned,
        vacuum_ann_store,
    )

    e = _emb(spark)
    base = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).head().embedding]
    root = str(tmp_path / "root")
    legacy = os.path.join(root, "v_000000")
    mono = AnnStore(spark, legacy, bits=3, n_tables=6)
    mono.write(base.withColumn("embedding", _neg("embedding")))
    _commit_index_version(root, "v_000000")
    st = upsert_ann_store_versioned(base, root)  # full replacement wave
    assert st.seg_paths[0] == legacy
    ref = AnnStore(spark, str(tmp_path / "ref"), bits=3, n_tables=6)
    ref.write(base)
    assert [(r.vec_id, round(r.score, 6)) for r in st.probe(qv, 5).collect()] == [
        (r.vec_id, round(r.score, 6)) for r in ref.probe(qv, 5).collect()
    ]
    with _pytest.raises(ValueError, match="read view"):
        st.write(base)
    with _pytest.raises(ValueError, match="read view"):
        st.upsert(base)
    # retain=2 keeps {v0, v1}; v1's manifest references v0 → survives
    vacuum_ann_store(root, retain=2)
    assert os.path.isdir(legacy)
    assert index_current_path(root).endswith("v_000001")


@pytest.mark.slow
def test_ann_version_drift_defaults_and_quantized(spark, tmp_path):
    """r13: drift report defaults to previous-vs-CURRENT, refuses a
    single-version root loudly, and serves quantized roots from the
    raw sidecars (bit-exact old/new vectors, not decoded codes)."""
    import pytest
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.similarity import (
        ann_version_drift,
        upsert_ann_store_versioned,
        write_ann_store_versioned,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    root = str(tmp_path / "root")
    write_ann_store_versioned(emb, root, quantized=True, bits=3, n_tables=6)
    with pytest.raises(ValueError, match="no committed version older"):
        ann_version_drift(spark, root)
    delta = emb.filter(F.col("vec_id") % 10 == 0).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    upsert_ann_store_versioned(delta, root)
    rows = {r.vec_id: (r.status, r.drift_micros)
            for r in ann_version_drift(spark, root).collect()}
    n_delta = delta.count()
    assert len(rows) == n_delta
    assert all(s == "replaced" and d == 2_000_000 for s, d in rows.values())


@pytest.mark.slow
def test_vacuum_protects_current_and_inflight(spark, tmp_path):
    """r13 review finding: (a) a crashed upsert that wrote a NEWER
    version dir but never committed the pointer must not let
    vacuum(retain=1) delete the version CURRENT still names; (b) a
    segment newer than anything any manifest references (an in-flight
    fold between its segment write and its manifest write) must
    survive vacuum."""
    import json
    import os

    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.similarity import (
        _open_ann_version,
        index_current_path,
        upsert_ann_store_versioned,
        vacuum_ann_store,
        write_ann_store_versioned,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    root = str(tmp_path / "root")
    write_ann_store_versioned(emb, root, bits=3, n_tables=6)
    upsert_ann_store_versioned(emb.filter(F.col("vec_id") % 10 == 0), root)
    cur_before = index_current_path(root)

    # (a) simulate a crash: a newer version dir with a manifest but NO
    # pointer commit; its manifest references only an in-flight segment
    crashed = os.path.join(root, "v_000099")
    os.makedirs(crashed)
    with open(os.path.join(crashed, "MANIFEST.json"), "w") as f:
        json.dump(
            {
                "segments": ["segments/s_000099"],
                "seg_n": [0],
                "bits": 3,
                "n_tables": 6,
                "id_col": "vec_id",
                "vec_col": "embedding",
                "metadata_cols": [],
            },
            f,
        )
    # (b) an in-flight segment beyond every manifest's horizon
    inflight = os.path.join(root, "segments", "s_000123")
    os.makedirs(inflight)

    deleted = vacuum_ann_store(root, retain=1)
    assert index_current_path(root) == cur_before
    assert os.path.isdir(cur_before), "vacuum deleted the CURRENT version"
    assert os.path.isdir(inflight), "vacuum GC'd an in-flight segment"
    # the store still serves
    qv = [float(x) for x in emb.limit(1).collect()[0].embedding]
    assert len(_open_ann_version(spark, index_current_path(root)).probe(qv, 3).collect()) == 3
    # and genuine dead weight (the superseded v_000000) did go
    assert "v_000000" in deleted


def test_committed_only_vacuum_window_and_drift_default(spark, tmp_path):
    """r13 ADVICE: (a) vacuum's retain window counts COMMITTED
    versions (the _COMMITS log) — crashed-upsert debris below a later
    commit must not eat a slot and push the reader-held pre-upsert
    version out; (b) ann_version_drift's default from_dir skips
    uncommitted dirs (the debris manifest here names a nonexistent
    segment, so picking it would fail loudly)."""
    import json
    import os

    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.similarity import (
        ann_version_drift,
        upsert_ann_store_versioned,
        vacuum_ann_store,
        write_ann_store_versioned,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    root = str(tmp_path / "root")
    write_ann_store_versioned(emb, root, bits=3, n_tables=6)  # commits v_000000
    # crash debris: manifest written, pointer never swapped
    crashed = os.path.join(root, "v_000001")
    os.makedirs(crashed)
    with open(os.path.join(crashed, "MANIFEST.json"), "w") as f:
        json.dump(
            {
                "segments": ["segments/s_000777"],  # never written
                "seg_n": [0],
                "bits": 3,
                "n_tables": 6,
                "id_col": "vec_id",
                "vec_col": "embedding",
                "metadata_cols": [],
            },
            f,
        )
    delta = emb.filter(F.col("vec_id") % 10 == 0).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    upsert_ann_store_versioned(delta, root)  # commits v_000002

    # (b) default diff base is the previous COMMITTED version (v0),
    # not the lexically-latest older dir (the debris v1, whose
    # missing segment would make this raise)
    rows = {r.vec_id: r.status for r in ann_version_drift(spark, root).collect()}
    assert len(rows) == delta.count()
    assert set(rows.values()) == {"replaced"}

    # (a) retain=2 keeps both committed versions; the debris — inside
    # the old newest-2 window — is the one deleted
    deleted = vacuum_ann_store(root, retain=2)
    assert os.path.isdir(os.path.join(root, "v_000000")), (
        "crash debris ate a retain slot: the reader-held pre-upsert "
        "version was vacuumed"
    )
    assert "v_000001" in deleted and not os.path.isdir(crashed)


def test_index_reader_time_travel_and_refusals(spark, tmp_path):
    """r14 verdict #6: ``IndexReader(root, version=)`` serves a prior
    COMMITTED version byte-identically (the read-side complement of
    the drift report); vacuumed versions refuse with the retain hint;
    never-committed names refuse as crash debris."""
    d = _docs(spark)
    root = str(tmp_path / "idx_tt")
    build_postings_index_versioned(_stale(d), root)
    v0 = os.path.basename(index_current_path(root).rstrip("/"))
    before = _ranked(spark, index_current_path(root))
    upsert_postings_index_versioned(d.filter(F.col("doc_id") % 5 == 0), root)

    old = IndexReader(spark, root, version=v0)
    assert _ranked(spark, old.root) == before
    # current differs (the stale noise terms are gone)
    assert _ranked(spark, index_current_path(root)) != before

    # drop v0 out of the retain window -> loud, named refusal
    compact_index(spark, root, retain=1)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        IndexReader(spark, root, version=v0)
    with pytest.raises(FileNotFoundError, match="not a committed version"):
        IndexReader(spark, root, version="v_424242")


def test_index_version_drift_statuses_and_default_base(spark, tmp_path):
    """added/changed/removed classify against the resolved postings
    signatures; unchanged docs drop; the default base is the previous
    COMMITTED version; no-older-version refuses."""
    from data_ingestion_spark.functions.similarity import (
        delete_index_ids,
        index_version_drift,
    )

    d = _docs(spark).filter(F.col("doc_id") < 40)
    root = str(tmp_path / "idx_drift")
    build_postings_index_versioned(_stale(d), root)
    with pytest.raises(ValueError, match="no committed version older"):
        index_version_drift(spark, root)
    upsert_postings_index_versioned(
        d.filter(F.col("doc_id") % 5 == 0).unionByName(
            d.filter(F.col("doc_id") == 1).select(
                (F.col("doc_id") + 900).alias("doc_id"), "text"
            )
        ),
        root,
    )
    got = {r.doc_id: r.status for r in index_version_drift(spark, root).collect()}
    assert got[901] == "added"
    assert all(got[i] == "changed" for i in range(0, 40, 5) if i in got)
    assert set(got) == {901} | {i for i in range(0, 40, 5)}
    delete_index_ids(spark.createDataFrame([(3,)], "doc_id bigint"), root)
    # default base moved: upsert-version vs delete-version
    got2 = {r.doc_id: r.status for r in index_version_drift(spark, root).collect()}
    assert got2 == {3: "removed"}
