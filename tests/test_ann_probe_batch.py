"""Batch vector serving (r12 verdict #2): probe_batch — N query
vectors against the at-rest AnnStore in ONE plan — must equal the
per-query probe() loop exactly, stay partition-pruned, and serve both
store layouts (monolithic and LSM-segmented)."""

import pytest
from pyspark.sql import functions as F

from data_ingestion_spark.functions.similarity import (
    AnnStore,
    SegmentedAnnStore,
    upsert_ann_store_versioned,
    write_ann_store_versioned,
)
from data_ingestion_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r[0], r[1], round(r[2], 6), r[3]) for r in df.collect()
    )


def _queries(spark, emb, n=3):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


@pytest.mark.slow
def test_probe_batch_equals_per_query_probe(spark, tmp_path):
    """The contract: one plan, N answers — each identical to the
    single-query driver-side path, home buckets and multi-probe."""
    emb = load_table(spark, SF, "embeddings")
    store = AnnStore(spark, str(tmp_path / "ann"), bits=3, n_tables=6)
    store.write(emb.filter(F.col("vec_id") >= 3).select("vec_id", "embedding"))
    queries = _queries(spark, emb).collect()
    qdf = _queries(spark, emb)

    for flips in (0, 1):
        got = _rows(store.probe_batch(qdf, k=5, extra_flips=flips))
        # per-query probe has no rank column; derive it the same way
        by_q = {}
        for qr in queries:
            qv = [float(x) for x in qr.qvec]
            ranked = store.probe(qv, k=5, extra_flips=flips).collect()
            by_q[qr.query_id] = [
                (qr.query_id, r.vec_id, round(r.score, 6), i + 1)
                for i, r in enumerate(ranked)
            ]
        exp = sorted(t for rows in by_q.values() for t in rows)
        assert got == exp and got


@pytest.mark.slow
def test_probe_batch_engine_buckets_match_driver_pairs(spark, tmp_path):
    """_batch_assignments (engine-side sign tests + lowest-margin
    flips) must reproduce _probe_pairs (driver-side) per query —
    same partitions read, single-query and batch."""
    emb = load_table(spark, SF, "embeddings")
    store = AnnStore(spark, str(tmp_path / "ann"), bits=4, n_tables=4)
    store.write(emb.select("vec_id", "embedding"))
    qdf = _queries(spark, emb, n=4)
    for flips in (0, 1, 2):
        asg = store._batch_assignments(qdf, "query_id", "qvec", flips)
        got = {}
        for r in asg.collect():
            got.setdefault(r.query_id, set()).add((r.table, r.bucket))
        for qr in qdf.collect():
            qv = [float(x) for x in qr.qvec]
            assert got[qr.query_id] == set(store._probe_pairs(qv, flips))


@pytest.mark.slow
def test_probe_batch_stays_partition_pruned(spark, tmp_path):
    """The union-of-buckets filter is literal at plan time: the scan
    carries PartitionFilters and reads a strict subset of files,
    bounded by the union of the queries' pairs — not the batch size."""
    emb = load_table(spark, SF, "embeddings")
    store = AnnStore(spark, str(tmp_path / "ann"), bits=3, n_tables=6)
    store.write(emb.filter(F.col("vec_id") >= 3).select("vec_id", "embedding"))
    qdf = _queries(spark, emb)

    out = store.probe_batch(qdf, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan

    pairs = {
        (r["table"], r["bucket"])
        for r in store._batch_assignments(qdf, "query_id", "qvec", 0)
        .select("table", "bucket")
        .distinct()
        .collect()
    }
    cand = store._cond_scan(store._pairs_cond(sorted(pairs)))
    probed = cand.select(F.input_file_name()).distinct().count()
    total = (
        spark.read.parquet(str(tmp_path / "ann"))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert 0 < probed < total


@pytest.mark.slow
def test_probe_batch_serves_segmented_store(spark, tmp_path):
    """The LSM layout serves batches too: versioned base + delta
    segment (20% of ids re-embedded NEGATED + 2 new ids) must answer
    exactly like a monolithic rebuild over the merged corpus."""
    emb = load_table(spark, SF, "embeddings")
    base = emb.filter(F.col("vec_id") >= 3).select("vec_id", "embedding")
    stale = base.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 5 == 0, F.transform("embedding", lambda x: -x)
        ).otherwise(F.col("embedding")),
    )
    delta = base.filter(F.col("vec_id") % 5 == 0).unionByName(
        base.filter(F.col("vec_id").between(3, 4)).select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    )
    root = str(tmp_path / "root")
    write_ann_store_versioned(stale, root, bits=3, n_tables=6)
    live = upsert_ann_store_versioned(delta, root)
    assert isinstance(live, SegmentedAnnStore) and len(live.seg_paths) == 2

    mono = AnnStore(spark, str(tmp_path / "mono"), bits=3, n_tables=6)
    mono.write(
        base.filter(F.col("vec_id") % 5 != 0)
        .unionByName(delta)
    )
    qdf = _queries(spark, emb)
    assert _rows(live.probe_batch(qdf, k=5)) == _rows(mono.probe_batch(qdf, k=5))


@pytest.mark.slow
def test_probe_batch_filtered_matches_single_query_where(spark, tmp_path):
    """where= applies INSIDE the pruned candidates per query — the
    batch mirror of probe(where=...)'s post-filter semantics."""
    emb = load_table(spark, SF, "embeddings")
    store = AnnStore(spark, str(tmp_path / "ann"), bits=3, n_tables=6)
    store.write(
        emb.filter(F.col("vec_id") >= 3).select("vec_id", "embedding", "label"),
        metadata_cols=("label",),
    )
    qdf = _queries(spark, emb)
    cond = F.col("label") == 1
    got = _rows(store.probe_batch(qdf, k=5, where=cond))
    exp = []
    for qr in qdf.collect():
        qv = [float(x) for x in qr.qvec]
        ranked = store.probe(qv, k=5, where=cond).collect()
        exp.extend(
            (qr.query_id, r.vec_id, round(r.score, 6), i + 1)
            for i, r in enumerate(ranked)
        )
    assert got == sorted(exp) and got


def test_probe_batch_contracts(spark, tmp_path):
    """Loud failures and graceful empties: short query vectors raise
    the dimension message; an empty batch returns an empty frame with
    the output schema; quantized stores redirect."""
    emb = load_table(spark, SF, "embeddings")
    store = AnnStore(spark, str(tmp_path / "ann"), bits=3, n_tables=6)
    store.write(emb.select("vec_id", "embedding"))

    short = spark.createDataFrame(
        [(1, [0.5, -0.5])], "query_id int, qvec array<float>"
    )
    with pytest.raises(Exception, match="probe_batch requires query vectors"):
        store.probe_batch(short, k=3).collect()

    empty = spark.createDataFrame([], "query_id bigint, qvec array<float>")
    out = store.probe_batch(empty, k=3)
    assert out.columns == ["query_id", "vec_id", "score", "rank"]
    assert out.count() == 0

    qstore = AnnStore(spark, str(tmp_path / "q"), bits=3, n_tables=6)
    qstore.write_quantized(emb.select("vec_id", "embedding"))
    qdf = _queries(spark, emb)
    with pytest.raises(ValueError, match="probe_quantized"):
        qstore.probe_batch(qdf, k=3)


@pytest.mark.slow
def test_probe_batch_quantized_matrix(spark, tmp_path):
    """The quantized batch path on BOTH layouts: monolithic
    write_quantized store batch-probes equal to per-query
    probe_quantized; an LSM store with a 15x-bounds-drift delta
    segment batch-probes equal to probe_batch on an unquantized
    rebuild; per-segment prefilter stays exact at large m."""
    from data_ingestion_spark.functions.similarity import (
        upsert_ann_store_versioned,
        write_ann_store_versioned,
    )

    emb = load_table(spark, SF, "embeddings")
    qdf = _queries(spark, emb)

    # monolithic: batch == per-query loop
    mono = AnnStore(spark, str(tmp_path / "q"), bits=3, n_tables=6)
    mono.write_quantized(
        emb.filter(F.col("vec_id") >= 3).select("vec_id", "embedding")
    )
    got = _rows(mono.probe_batch_quantized(qdf, k=5))
    exp = []
    for qr in qdf.collect():
        qv = [float(x) for x in qr.qvec]
        ranked = mono.probe_quantized(qv, k=5).collect()
        exp.extend(
            (qr.query_id, r.vec_id, round(r.score, 6), i + 1)
            for i, r in enumerate(ranked)
        )
    assert got == sorted(exp) and got

    # segmented with bounds drift: batch quantized == raw rebuild batch
    base = emb.filter(F.col("vec_id") >= 3).select("vec_id", "embedding")
    delta = base.filter(F.col("vec_id") % 5 == 0).withColumn(
        "embedding", F.transform("embedding", lambda x: x * F.lit(15.0))
    )
    root = str(tmp_path / "root")
    write_ann_store_versioned(base, root, quantized=True, bits=3, n_tables=6)
    live = upsert_ann_store_versioned(delta, root)
    ref = AnnStore(spark, str(tmp_path / "ref"), bits=3, n_tables=6)
    ref.write(base.filter(F.col("vec_id") % 5 != 0).unionByName(delta))
    got_seg = _rows(live.probe_batch_quantized(qdf, k=5))
    assert got_seg == _rows(ref.probe_batch(qdf, k=5)) and got_seg
    assert _rows(live.probe_batch_quantized(qdf, k=5, prefilter_m=10_000)) == got_seg

    # raw-float stores refuse the quantized batch entry points loudly
    with pytest.raises(ValueError, match="probe_batch_quantized|write_quantized"):
        ref.probe_batch_quantized(qdf, k=5)
