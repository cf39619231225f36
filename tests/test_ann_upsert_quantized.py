"""AnnStore incremental upsert + SQ8 quantized store (r12).

Upsert ≡ rebuild is the load-bearing claim (the lexical D4 proof
shape applied to vectors); the quantized store must keep bucket
recall identical (buckets from RAW floats) and re-score exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_spark.functions.similarity import AnnStore


def _emb(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
    )


def _neg(col):
    return F.transform(col, lambda x: -x)


@pytest.fixture()
def stores(spark, tmp_path):
    """(stale store, delta, merged corpus, qv) — every 5th vector
    negated in the stale generation (negation flips every sign
    bucket), delta = corrections + 3 brand-new ids."""
    base = _emb(spark).filter(F.col("vec_id") != 0)
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
        )
    )
    merged = base.join(delta.select("vec_id"), "vec_id", "left_anti").unionByName(delta)
    qv = [float(x) for x in _emb(spark).filter(F.col("vec_id") == 0).head().embedding]
    s0 = AnnStore(spark, str(tmp_path / "src"), bits=3, n_tables=6)
    s0.write(stale)
    return s0, delta, merged, qv


@pytest.mark.slow
def test_upsert_equals_rebuild_rowset_and_probe(spark, stores, tmp_path):
    """The D4 proof shape: the upserted store's (id, table, bucket,
    vec) rowset EQUALS a from-scratch write over (old − replaced ids
    + delta) — replacement removes every one of the n_tables pointer
    copies — and probes from both stores agree."""
    s0, delta, merged, qv = stores
    s1 = s0.upsert(delta, str(tmp_path / "dst"))
    s2 = AnnStore(spark, str(tmp_path / "rebuild"), bits=3, n_tables=6)
    s2.write(merged)

    def rowset(path):
        return sorted(
            (r.vec_id, r.table, r.bucket, tuple(r.embedding))
            for r in spark.read.parquet(path).collect()
        )

    assert rowset(s1.path) == rowset(s2.path)
    pa = [(r.vec_id, round(r.score, 6)) for r in s1.probe(qv, k=5).collect()]
    pb = [(r.vec_id, round(r.score, 6)) for r in s2.probe(qv, k=5).collect()]
    assert pa == pb
    # stale copies are GONE: every surviving original id carries its
    # TRUE embedding (a leftover negated vector would mismatch here)
    true_base = _emb(spark).filter(F.col("vec_id") != 0).withColumnRenamed(
        "embedding", "true_emb"
    )
    mism = (
        spark.read.parquet(s1.path)
        .filter(F.col("vec_id") < 10000)
        .join(true_base, "vec_id")
        .filter(F.col("embedding") != F.col("true_emb"))
        .count()
    )
    assert mism == 0


def test_upsert_store_stays_partition_pruned(spark, stores, tmp_path):
    """Post-upsert pruning (r11 verdict #2 done-criterion): a probe
    of the upserted store still resolves PartitionFilters at plan
    time and reads a strict subset of the store's files."""
    s0, delta, _, qv = stores
    s1 = s0.upsert(delta, str(tmp_path / "dst"))
    cand = s1.probe_candidates(qv)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    total = spark.read.parquet(s1.path).select(F.input_file_name()).distinct().count()
    probed = cand.select(F.input_file_name()).distinct().count()
    assert 0 < probed < total / 4


def test_open_restores_geometry_and_upsert_is_versioned(spark, stores, tmp_path):
    """The metadata sidecar round-trips geometry; the source store
    is untouched by the upsert (functional versioning)."""
    s0, delta, _, qv = stores
    before = spark.read.parquet(s0.path).count()
    s1 = s0.upsert(delta, str(tmp_path / "dst"))
    assert spark.read.parquet(s0.path).count() == before  # src untouched
    reopened = AnnStore.open(spark, s1.path)
    assert (reopened.bits, reopened.n_tables) == (3, 6)
    assert [
        (r.vec_id, round(r.score, 6)) for r in reopened.probe(qv, k=5).collect()
    ] == [(r.vec_id, round(r.score, 6)) for r in s1.probe(qv, k=5).collect()]
    with pytest.raises(FileNotFoundError, match="_ann_meta"):
        AnnStore.open(spark, str(tmp_path / "nowhere"))


@pytest.mark.slow
def test_quantized_probe_exact_at_rescore_and_schema(spark, tmp_path):
    """SQ8: (a) default probe (re-score all) EQUALS the raw store's
    probe — bucket assignment happens on raw floats, re-score reads
    raw floats; (b) codes are genuinely int8 at rest (array<tinyint>
    in the parquet schema — the 4× footprint claim); (c) the probe's
    code scan is partition-pruned AND the raw sidecar read is pruned
    to the candidate id-hash partitions; (d) open() restores bounds;
    (e) upsert refuses a quantized store (bounds are frozen)."""
    base = _emb(spark).filter(F.col("vec_id") != 0)
    qv = [float(x) for x in _emb(spark).filter(F.col("vec_id") == 0).head().embedding]
    raw_store = AnnStore(spark, str(tmp_path / "raw"), bits=3, n_tables=6)
    raw_store.write(base)
    qstore = AnnStore(spark, str(tmp_path / "sq8"), bits=3, n_tables=6)
    qstore.write_quantized(base)

    expect = [(r.vec_id, round(r.score, 6)) for r in raw_store.probe(qv, k=5).collect()]
    got = [(r.vec_id, round(r.score, 6)) for r in qstore.probe_quantized(qv, k=5).collect()]
    assert got == expect

    codes = spark.read.parquet(str(tmp_path / "sq8" / "codes"))
    assert codes.schema["code"].dataType.simpleString() == "array<tinyint>"

    # pruning: the code scan resolves PartitionFilters; the sidecar
    # read filters id_bucket partitions before the broadcast join
    out = qstore.probe_quantized(qv, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PartitionFilters: [") >= 2  # codes scan + raw scan
    assert "BroadcastHashJoin" in plan  # candidate ids broadcast into raw

    reopened = AnnStore.open(spark, str(tmp_path / "sq8"))
    got2 = [
        (r.vec_id, round(r.score, 6))
        for r in reopened.probe_quantized(qv, k=5).collect()
    ]
    assert got2 == expect

    with pytest.raises(NotImplementedError, match="quantized"):
        reopened.upsert(base.limit(1), str(tmp_path / "nope"))


def test_quantized_prefilter_recall_and_exact_when_wide(spark, tmp_path):
    """The prefilter dial: with m >= |candidates| the result is
    byte-equal to the exact path (nothing cut); with a tight m the
    approx (decoded-code) ranking still keeps top-5 recall >= 0.8 on
    the fixture — SQ8's ~1/254-per-dim error is far below the
    fixture's score gaps."""
    base = _emb(spark).filter(F.col("vec_id") != 0)
    qv = [float(x) for x in _emb(spark).filter(F.col("vec_id") == 0).head().embedding]
    qstore = AnnStore(spark, str(tmp_path / "sq8"), bits=3, n_tables=6)
    qstore.write_quantized(base)
    exact = [(r.vec_id, round(r.score, 6)) for r in qstore.probe_quantized(qv, 5).collect()]
    wide = [
        (r.vec_id, round(r.score, 6))
        for r in qstore.probe_quantized(qv, 5, prefilter_m=10_000).collect()
    ]
    assert wide == exact
    tight = {r.vec_id for r in qstore.probe_quantized(qv, 5, prefilter_m=8).collect()}
    assert len(tight & {v for v, _ in exact}) >= 4  # recall@5 >= 0.8


def test_quantized_constant_dimension_and_bounds(spark, tmp_path):
    """Degenerate dimensions (max == min) encode to 0 and decode to
    the constant — no NaN/división drift; every code is in
    [-127, 127]."""
    rows = [(i, [float(i % 7) - 3.0] * 18 + [2.5] * 2) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    st = AnnStore(spark, str(tmp_path / "cq"), bits=3, n_tables=6)
    st.write_quantized(df)
    codes = spark.read.parquet(str(tmp_path / "cq" / "codes"))
    mm = codes.select(
        F.min(F.array_min("code")).alias("lo"), F.max(F.array_max("code")).alias("hi")
    ).head()
    assert -127 <= mm.lo and mm.hi <= 127
    # constant dims (the trailing 2.5s) are code 0 everywhere
    const_codes = codes.select(F.element_at("code", 19).alias("c")).distinct().collect()
    assert {r.c for r in const_codes} == {0}
    qv = [0.5] * 20
    got = st.probe_quantized(qv, k=3).collect()
    assert len(got) <= 3 and all(r.score is not None for r in got)


def test_filtered_probe_post_filter_semantics(spark, tmp_path):
    """r12 filtered vector search: metadata rides every pointer copy;
    probe(where=...) filters INSIDE the pruned candidate set before
    the re-rank — result = top-k of (bucket-near ∩ predicate), i.e.
    filtering the unfiltered probe's CANDIDATES, never its top-k
    output; metadata + filter survive an upsert."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") != 0).select("vec_id", "embedding", "label")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding", "label").head()
    qv, ql = [float(x) for x in qrow.embedding], qrow.label
    st = AnnStore(spark, str(tmp_path / "fstore"), bits=3, n_tables=6)
    st.write(base, metadata_cols=("label",))

    got = [(r.vec_id, round(r.score, 6)) for r in st.probe(qv, 5, where=F.col("label") == ql).collect()]
    # reference: filter the candidate set by label, exact top-5
    from data_ingestion_spark.functions.similarity import brute_force_topk

    cand = (
        st.probe_candidates(qv)
        .filter(F.col("label") == ql)
        .select("vec_id", "embedding")
        .distinct()
    )
    qcol = F.array(*[F.lit(float(x)) for x in qv])
    exp = [(r.vec_id, round(r.score, 6)) for r in brute_force_topk(cand, qcol, 5).collect()]
    assert got == exp and got

    # differs from post-top-k filtering whenever top-5 unfiltered
    # contains other labels (almost surely on the fixture)
    unfiltered = [(r.vec_id, round(r.score, 6)) for r in st.probe(qv, 5).collect()]
    assert got != unfiltered or all(
        r.label == ql
        for r in base.filter(F.col("vec_id").isin([v for v, _ in unfiltered])).collect()
    )

    # metadata survives upsert: replace some vectors, filter still works
    delta = base.filter(F.col("vec_id") % 7 == 0)
    st2 = st.upsert(delta, str(tmp_path / "fstore2"))
    got2 = [
        (r.vec_id, round(r.score, 6))
        for r in st2.probe(qv, 5, where=F.col("label") == ql).collect()
    ]
    assert got2 == got  # delta carried identical rows -> same store
    reopened = AnnStore.open(spark, str(tmp_path / "fstore2"))
    assert reopened._metadata_cols == ("label",)


def test_ann_managed_root_versioning_and_vacuum(spark, tmp_path):
    """r12: the managed-root lifecycle for vector stores — versioned
    write/upsert behind the atomic CURRENT pointer, probe from the
    pointer equals a from-scratch rebuild, vacuum drops dead
    versions (retention-controlled) and never the live one."""
    import os

    from data_ingestion_spark.functions.similarity import (
        index_current_path,
        upsert_ann_store_versioned,
        vacuum_ann_store,
        write_ann_store_versioned,
    )

    base = _emb(spark).filter(F.col("vec_id") != 0)
    qv = [float(x) for x in _emb(spark).filter(F.col("vec_id") == 0).head().embedding]
    root = str(tmp_path / "ann_root")
    with pytest.raises(FileNotFoundError, match="CURRENT"):
        upsert_ann_store_versioned(base.limit(1), str(tmp_path / "nowhere"))

    write_ann_store_versioned(
        base.withColumn("embedding", _neg("embedding")), root, bits=3, n_tables=6
    )
    upsert_ann_store_versioned(base.filter(F.col("vec_id") % 2 == 0), root)
    live_store = upsert_ann_store_versioned(base.filter(F.col("vec_id") % 2 == 1), root)
    assert index_current_path(root) == live_store.path
    assert len([n for n in os.listdir(root) if n.startswith("v_")]) == 3

    rebuild = AnnStore(spark, str(tmp_path / "rebuild"), bits=3, n_tables=6)
    rebuild.write(base)  # both halves replaced -> fully corrected store
    got = [(r.vec_id, round(r.score, 6)) for r in live_store.probe(qv, 5).collect()]
    exp = [(r.vec_id, round(r.score, 6)) for r in rebuild.probe(qv, 5).collect()]
    assert got == exp

    dead = vacuum_ann_store(root, retain=2)
    assert dead == ["v_000000"]
    assert sorted(n for n in os.listdir(root) if n.startswith("v_")) == [
        "v_000001", "v_000002",
    ]
    dead2 = vacuum_ann_store(root, retain=1)
    assert dead2 == ["v_000001"]
    assert index_current_path(root) == live_store.path  # live survives
    assert [
        (r.vec_id, round(r.score, 6))
        for r in AnnStore.open(spark, index_current_path(root)).probe(qv, 5).collect()
    ] == exp
    with pytest.raises(ValueError, match="retain"):
        vacuum_ann_store(root, retain=0)


@pytest.mark.slow
def test_quantized_versioned_upsert_per_segment_bounds(spark, tmp_path):
    """r13 (r12 verdict #6): a quantized store is maintainable via the
    LSM layout — the delta segment carries its OWN SQ8 bounds (base
    codes untouched), the probe decodes each segment with the bounds
    it was written under, and exact re-score makes the answer equal an
    unquantized rebuild even when delta bounds drift 15x; the approx
    prefilter dial also ranks with per-segment bounds."""
    import json
    import os

    from data_ingestion_spark.functions.similarity import (
        AnnStore,
        compact_ann_store,
        upsert_ann_store_versioned,
        write_ann_store_versioned,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") >= 3)
    # same directions (cosine-identical), 15x the magnitude: per-dim
    # ranges of the delta segment are disjoint from the base's
    delta = base.filter(F.col("vec_id") % 5 == 0).withColumn(
        "embedding", F.transform("embedding", lambda x: x * F.lit(15.0))
    )
    root = str(tmp_path / "root")
    write_ann_store_versioned(base, root, quantized=True, bits=3, n_tables=6)
    live = upsert_ann_store_versioned(delta, root)

    segs = sorted(os.listdir(os.path.join(root, "segments")))
    assert len(segs) == 2
    bounds = [
        json.load(
            open(os.path.join(root, "segments", s, "data", "_ann_meta.json"))
        )["quant"]
        for s in segs
    ]
    # the delta's bounds reflect the delta's range, not the base's
    assert max(bounds[1]["maxs"]) > 5 * max(bounds[0]["maxs"])

    ref = AnnStore(spark, str(tmp_path / "ref"), bits=3, n_tables=6)
    ref.write(base.filter(F.col("vec_id") % 5 != 0).unionByName(delta))
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding]
    exp = [(r.vec_id, round(r.score, 6)) for r in ref.probe(qv, k=5).collect()]

    got = [(r.vec_id, round(r.score, 6)) for r in live.probe_quantized(qv, k=5).collect()]
    assert got == exp and got
    pref = [
        (r.vec_id, round(r.score, 6))
        for r in live.probe_quantized(qv, k=5, prefilter_m=10_000).collect()
    ]
    assert pref == exp

    # compaction is the one global re-quantization point: folds to a
    # single segment with fresh global bounds, same answers
    folded = compact_ann_store(spark, root, retain=1)
    assert len(folded.seg_paths) == 1 and folded._quant
    got2 = [
        (r.vec_id, round(r.score, 6)) for r in folded.probe_quantized(qv, k=5).collect()
    ]
    assert got2 == exp

    # the raw-float probe paths still refuse loudly on quantized versions
    with pytest.raises(NotImplementedError, match="probe_quantized"):
        folded.probe(qv, k=5)


def test_monolithic_quantized_upsert_redirects_to_versioned(spark, tmp_path):
    """The in-place monolithic upsert cannot carry two bounds sets —
    it must refuse with the versioned-layout redirect."""
    from data_ingestion_spark.functions.similarity import AnnStore

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    st = AnnStore(spark, str(tmp_path / "q"), bits=3, n_tables=6)
    st.write_quantized(emb)
    with pytest.raises(NotImplementedError, match="write_ann_store_versioned"):
        st.upsert(emb.limit(3), str(tmp_path / "q2"))


def test_ann_time_travel_version_read(spark, tmp_path):
    """r14 verdict #6 on the vector layout: ``AnnStore.open(root,
    version=)`` serves the pre-upsert committed version identically;
    vacuum past it refuses with the retain hint."""
    import os

    from data_ingestion_spark.functions.similarity import (
        index_current_path,
        upsert_ann_store_versioned,
        vacuum_ann_store,
        write_ann_store_versioned,
    )

    base = _emb(spark).filter(F.col("vec_id") != 0)
    qv = [float(x) for x in _emb(spark).filter(F.col("vec_id") == 0).head().embedding]
    root = str(tmp_path / "ann_tt")
    s0 = write_ann_store_versioned(
        base.withColumn("embedding", _neg("embedding")), root, bits=3, n_tables=6
    )
    v0 = os.path.basename(index_current_path(root).rstrip("/"))
    before = [(r.vec_id, round(r.score, 6)) for r in s0.probe(qv, 5).collect()]
    upsert_ann_store_versioned(base, root)

    old = AnnStore.open(spark, root, version=v0)
    got = [(r.vec_id, round(r.score, 6)) for r in old.probe(qv, 5).collect()]
    assert got == before
    cur = AnnStore.open(spark, index_current_path(root))
    assert [(r.vec_id, round(r.score, 6)) for r in cur.probe(qv, 5).collect()] != before

    vacuum_ann_store(root, retain=1)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        AnnStore.open(spark, root, version=v0)
    with pytest.raises(FileNotFoundError, match="not a committed version"):
        AnnStore.open(spark, root, version="v_424242")


@pytest.mark.slow
def test_ann_vacuum_protects_inflight_commit_window(spark, tmp_path):
    """r15 ADVICE (medium), ANN-layout twin of the PQ test: an upsert
    that has landed its MANIFEST.json but not yet swapped CURRENT
    must not have its new segment GC'd by a racing vacuum — the
    uncommitted manifest must not raise the in-flight segment horizon
    over its own files. Simulated by really upserting, then rewinding
    the pointer+log one commit."""
    import json
    import os

    from data_ingestion_spark.functions.similarity import (
        AnnStore,
        index_current_path,
        upsert_ann_store_versioned,
        vacuum_ann_store,
        write_ann_store_versioned,
    )

    base = _emb(spark).filter(F.col("vec_id") != 0)
    qv = [
        float(x)
        for x in _emb(spark).filter(F.col("vec_id") == 0).head().embedding
    ]
    root = str(tmp_path / "ann_win")
    write_ann_store_versioned(
        base.withColumn("embedding", _neg("embedding")), root, bits=3, n_tables=6
    )
    upsert_ann_store_versioned(base.filter(F.col("vec_id") % 2 == 0), root)
    upsert_ann_store_versioned(base.filter(F.col("vec_id") % 2 == 1), root)

    # rewind the LAST commit to the manifest-landed/pointer-unswapped state
    with open(os.path.join(root, "_COMMITS"), encoding="utf-8") as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    inflight, prev = lines[-1], lines[-2]
    with open(os.path.join(root, "_COMMITS"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines[:-1]) + "\n")
    with open(os.path.join(root, "CURRENT"), "w", encoding="utf-8") as f:
        f.write(prev)
    with open(
        os.path.join(root, inflight, "MANIFEST.json"), encoding="utf-8"
    ) as f:
        m = json.load(f)
    new_segs = [
        rel for rel in m["segments"] if os.path.basename(rel).startswith("s_")
    ]
    assert new_segs  # the upsert added at least one delta segment

    vacuum_ann_store(root, retain=1)

    assert os.path.isdir(os.path.join(root, inflight))
    for rel in new_segs:
        assert os.path.isdir(os.path.join(root, rel)), (
            f"in-flight {rel} was GC'd inside the commit window"
        )

    # writer completes; the finished store equals a from-scratch rebuild
    with open(os.path.join(root, "CURRENT"), "w", encoding="utf-8") as f:
        f.write(inflight)
    with open(os.path.join(root, "_COMMITS"), "a", encoding="utf-8") as f:
        f.write(inflight + "\n")
    rebuild = AnnStore(spark, str(tmp_path / "ann_win_rebuild"), bits=3, n_tables=6)
    rebuild.write(base)
    got = [
        (r.vec_id, round(r.score, 6))
        for r in AnnStore.open(spark, index_current_path(root)).probe(qv, 5).collect()
    ]
    exp = [(r.vec_id, round(r.score, 6)) for r in rebuild.probe(qv, 5).collect()]
    assert got == exp
