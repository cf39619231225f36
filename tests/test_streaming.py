"""Structured Streaming tests: batch-equivalence + incremental-drain.

Strategy (SURVEY.md §2.10): every streaming transform has a batch twin
that IS oracle-checked (test_parity). Here we run the streaming
version over the same events (fed as files, in two incremental batches) and
assert it converges to the batch answer — the strongest check
available without a second streaming engine as oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from data_ingestion_spark.sources.catalog import load_table
from data_ingestion_spark.streaming import pipeline as SP


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events split into two file-drops (simulates incremental arrival)."""
    d = tmp_path_factory.mktemp("events_stream")
    ev = load_table(spark, SF_SMALL, "events")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(d / "drop1"))
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(d / "drop2"))
    # flatten: move part files up so the dir is one flat file source
    import shutil

    flat = tmp_path_factory.mktemp("events_flat")
    i = 0
    for sub in ["drop1", "drop2"]:
        for f in (d / sub).glob("*.parquet"):
            shutil.copy(f, flat / f"{sub}_{i}.parquet")
            i += 1
    return str(flat)


def _drain(df, checkpoint, name):
    q = SP.run_query_availablenow(df, checkpoint, name)
    q.awaitTermination(120)
    return df.sparkSession.table(name)


def test_tumbling_matches_batch(spark, events_dir, tmp_path):
    stream = SP.stream_events_from_dir(spark, events_dir)
    out = _drain(
        SP.tumbling_counts(stream), str(tmp_path / "ckpt_tumble"), "tumble_sink"
    ).toPandas()

    import __spark_entry__ as E

    batch = E.queries()["window_tumbling_batch"](spark, SF_SMALL).toPandas()
    key = ["hour_ts", "event_type"]
    out_s = out.sort_values(key).reset_index(drop=True)
    batch_s = batch.sort_values(key).reset_index(drop=True)
    assert len(out_s) == len(batch_s)
    assert (out_s["n"].values == batch_s["n"].values).all()
    assert (abs(out_s["sum_value"].values - batch_s["sum_value"].values) < 1e-9).all()


def test_session_window_total_events(spark, events_dir, tmp_path):
    stream = SP.stream_events_from_dir(spark, events_dir)
    out = _drain(
        SP.session_counts(stream), str(tmp_path / "ckpt_sess"), "sess_sink"
    ).toPandas()
    ev_count = load_table(spark, SF_SMALL, "events").count()
    assert out["n_events"].sum() == ev_count  # every event in exactly one session
    assert (out["session_end"] > out["session_start"]).all()
    # batch twin agreement on per-user session counts
    import __spark_entry__ as E

    batch = E.queries()["sessionize_batch"](spark, SF_SMALL).toPandas()
    stream_sessions = out.groupby("user_id").size().sort_index()
    batch_sessions = batch.set_index("user_id")["n_sessions"].sort_index()
    assert (stream_sessions.values == batch_sessions.values).all()


def test_dedup_within_watermark(spark, events_dir, tmp_path):
    stream = SP.stream_events_from_dir(spark, events_dir)
    deduped = SP.dedup_within_watermark(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("dedup_sink").toPandas()
    assert out["event_id"].is_unique
    assert len(out) == load_table(spark, SF_SMALL, "events").count()  # input had no dups


def test_foreachbatch_sink_partitions(spark, events_dir, tmp_path):
    import os

    stream = SP.stream_events_from_dir(spark, events_dir)
    out_path = str(tmp_path / "vstore")
    q = SP.run_to_vector_store(stream, out_path, str(tmp_path / "ckpt_sink"))
    q.awaitTermination(120)
    parts = [p for p in os.listdir(out_path) if p.startswith("event_type=")]
    assert sorted(parts) == sorted(
        f"event_type={t}"
        for t in ["click", "error", "purchase", "signup", "view"]
    )
    back = spark.read.parquet(out_path)
    assert back.count() == load_table(spark, SF_SMALL, "events").count()


def test_incremental_second_run_drains_nothing_new(spark, events_dir, tmp_path):
    """ST1 exactly-once bookkeeping: a second AvailableNow run over the
    same checkpoint must not re-ingest already-seen files."""
    out_path = str(tmp_path / "vstore2")
    ckpt = str(tmp_path / "ckpt_inc")
    for _ in range(2):
        q = SP.run_to_vector_store(
            SP.stream_events_from_dir(spark, events_dir), out_path, ckpt
        )
        q.awaitTermination(120)
    back = spark.read.parquet(out_path)
    assert back.count() == load_table(spark, SF_SMALL, "events").count()


def test_sliding_matches_batch(spark, events_dir, tmp_path):
    stream = SP.stream_events_from_dir(spark, events_dir)
    out = _drain(
        SP.sliding_counts(stream), str(tmp_path / "ckpt_slide"), "slide_sink"
    ).toPandas()
    import __spark_entry__ as E

    batch = E.queries()["window_sliding_batch"](spark, SF_SMALL).toPandas()
    out_s = out.sort_values("win_start").reset_index(drop=True)
    batch_s = batch.sort_values("win_start").reset_index(drop=True)
    assert len(out_s) == len(batch_s)
    assert (out_s["n"].values == batch_s["n"].values).all()


def test_stateful_ewma_across_batches(spark, tmp_path):
    """applyInPandasWithState: state persists across micro-batches —
    events arrive in two TIME-ORDERED file drops, one file per
    trigger, so the second batch must continue the first batch's
    state. Final counters equal the batch ground truth; EWMA matches
    a pandas replay of the same time order."""
    from data_ingestion_spark.streaming.stateful import ewma_per_user

    ev = load_table(spark, SF_SMALL, "events")
    d = tmp_path / "ewma_in"
    import shutil

    for name, part in [
        ("drop1", ev.filter(F.col("ts") < "2024-01-15")),
        ("drop2", ev.filter(F.col("ts") >= "2024-01-15")),
    ]:
        tmp_out = tmp_path / f"__{name}"
        part.coalesce(1).write.parquet(str(tmp_out))
        d.mkdir(exist_ok=True)
        for f in tmp_out.glob("*.parquet"):
            shutil.copy(f, d / f"{name}.parquet")

    q = (
        ewma_per_user(SP.stream_events_from_dir(spark, str(d), max_files_per_trigger=1))
        .writeStream.format("memory")
        .queryName("ewma_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_ewma"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("ewma_sink").toPandas()
    # two batches -> up to two emits per user; multi-emit proves the
    # query really ran more than one micro-batch
    assert out.groupby("user_id").size().max() == 2
    final = out.groupby("user_id").last()

    pdf = ev.select("user_id", "ts", "value").toPandas()
    for user, grp in pdf.sort_values("ts").groupby("user_id"):
        ewma = None
        for v in grp["value"]:
            ewma = v if ewma is None else 0.3 * v + 0.7 * ewma
        assert final.loc[user, "n_events"] == len(grp)
        assert abs(final.loc[user, "ewma_value"] - round(ewma, 6)) < 1e-4, user


def test_stream_stream_join_matches_batch(spark, events_dir, tmp_path):
    """Stream-stream range join converges to the batch join_range
    result (pairs with >=1 click; counts per purchase match)."""
    s1 = SP.stream_events_from_dir(spark, events_dir)
    joined = SP.stream_stream_attribution(s1)
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("ss_sink")
    import __spark_entry__ as E

    # exact row-set equality against the oracle-checked batch twin
    # (the DQ runs the SAME operator batch-mode) — stronger than the
    # per-purchase count check it replaces (r14)
    batch = E.queries()["join_stream_interval_batch"](spark, SF_SMALL)
    got = sorted(
        map(tuple, out.select("p_event_id", "c_event_id", "p_user").collect())
    )
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0


def test_stream_static_enrich_matches_batch(spark, events_dir, tmp_path):
    """Stream-static broadcast enrich drains to the same rows as the
    batch join (no state store involved — each micro-batch joins the
    static side directly)."""
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("purchase", 10.0)],
        ["event_type", "weight"],
    )
    stream = SP.stream_events_from_dir(spark, events_dir)
    enriched = SP.stream_static_enrich(stream, dim).select(
        "event_id", "event_type", "weight"
    )
    q = SP.run_query_availablenow(
        enriched, str(tmp_path / "ckpt_ss_enrich"), "ss_enrich_sink", "append"
    )
    q.awaitTermination(120)
    out = spark.table("ss_enrich_sink").toPandas()

    batch = (
        load_table(spark, SF_SMALL, "events")
        .join(F.broadcast(dim), "event_type", "left")
        .select("event_id", "event_type", "weight")
        .toPandas()
    )
    out_s = out.sort_values("event_id").reset_index(drop=True)
    batch_s = batch.sort_values("event_id").reset_index(drop=True)
    assert len(out_s) == len(batch_s)
    assert (out_s["event_type"].values == batch_s["event_type"].values).all()
    w_out = out_s["weight"].fillna(-1).values
    w_bat = batch_s["weight"].fillna(-1).values
    assert (w_out == w_bat).all()


def test_stateful_first_seen_exactly_once_across_batches(spark, events_dir, tmp_path):
    """applyInPandasWithState first-seen gate: with one file per
    trigger (2 staged files -> 2 micro-batches), every user_id that
    appears in BOTH drops must still be emitted exactly once — the
    cross-batch state is what dedups; and the union of emissions is
    exactly the distinct key set."""
    stream = SP.stream_events_from_dir(spark, events_dir, max_files_per_trigger=1)
    q = SP.run_query_availablenow(
        SP.stateful_first_seen(stream),
        str(tmp_path / "ckpt_state"),
        "first_seen_sink",
        output_mode="append",
    )
    q.awaitTermination(120)
    out = spark.table("first_seen_sink").toPandas()

    ev = load_table(spark, SF_SMALL, "events")
    expected = {r.user_id for r in ev.select("user_id").distinct().collect()}
    # both drops share users (event_id parity split), so a stateless
    # per-batch distinct would double-emit; state must prevent that
    both = (
        ev.groupBy("user_id")
        .agg(F.countDistinct((F.col("event_id") % 2)).alias("k"))
        .filter("k = 2")
        .count()
    )
    assert both > 0
    assert len(out) == len(expected)
    assert set(out["user_id"]) == expected


def test_stateful_first_seen_string_key(spark, tmp_path):
    """The output key type follows the input key column (not a
    hardcoded bigint): a string key must come back as a string,
    emitted once per distinct value."""
    d = tmp_path / "strkey_in"
    ev = load_table(spark, SF_SMALL, "events")
    ev.selectExpr("concat('u', user_id) AS doc_key", "ts").coalesce(
        2
    ).write.parquet(str(d))
    schema = spark.read.parquet(str(d)).schema
    stream = spark.readStream.schema(schema).parquet(str(d))
    q = SP.run_query_availablenow(
        SP.stateful_first_seen(stream, key_col="doc_key"),
        str(tmp_path / "ckpt_strkey"),
        "strkey_sink",
        output_mode="append",
    )
    q.awaitTermination(120)
    out = spark.table("strkey_sink")
    assert out.schema["doc_key"].dataType.simpleString() == "string"
    expected = {f"u{r.user_id}" for r in ev.select("user_id").distinct().collect()}
    assert {r.doc_key for r in out.collect()} == expected


def test_session_boundary_semantics_align(spark):
    """Load-bearing for the r09 streaming_session_availablenow DQ:
    at a gap of EXACTLY `gap` seconds, Spark's session_window MERGES
    (window end is treated as inclusive for the merge test) and the
    lag+cumsum batch twin also merges (`diff > gap` starts a new
    session) — the two definitions agree on the knife edge, so the
    DQ's exceptAll diff can't flap on boundary data. One second past
    the gap, both split."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.operators.relational import sessionize

    for delta, want_sessions in ((1800, 1), (1801, 2)):
        df = spark.createDataFrame(
            [(1, "2026-01-01 00:00:00")],
            "user_id int, ts string",
        ).select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
        ).unionAll(
            spark.createDataFrame(
                [(1, delta)], "user_id int, d int"
            ).select(
                "user_id",
                (F.lit("2026-01-01 00:00:00").cast("timestamp")
                 + F.make_dt_interval(secs=F.col("d").cast("double"))).alias("ts"),
            )
        )
        native = (
            df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .count().count()
        )
        twin = (
            sessionize(df, key="user_id", ts="ts", gap_minutes=30)
            .agg(F.max("session_id")).collect()[0][0]
        )
        assert native == want_sessions == twin, (delta, native, twin)


@pytest.mark.slow
def test_sketch_stream_equals_batch_and_replay_safe(spark, events_dir, tmp_path):
    """Streaming CMS: the accumulated sketch after draining equals
    the batch-built sketch CELL FOR CELL (mergeability is exact, not
    approximate), stays constant-size, and a replayed batch_id is
    skipped (at-least-once safety)."""
    import os

    from data_ingestion_spark.functions.sketches import cms_build

    out_dir = str(tmp_path / "sketch")
    os.makedirs(out_dir, exist_ok=True)
    stream = SP.stream_events_from_dir(spark, events_dir, max_files_per_trigger=1)
    q = SP.run_sketch_stream(
        stream.select("event_type"), "event_type", out_dir,
        str(tmp_path / "ckpt_sketch"), width=64, depth=4,
    )
    q.awaitTermination(120)
    state = SP.sketch_state_path(out_dir)
    assert state is not None  # CURRENT manifest committed
    got = spark.read.parquet(state)
    n_batches = got.agg(F.max("last_batch_id")).collect()[0][0]
    assert n_batches is not None and n_batches >= 1  # multiple micro-batches ran
    batch = cms_build(
        spark.read.parquet(events_dir).select("event_type"), "event_type", 64, 4
    )
    a = {(r.depth_idx, r.bucket): r.cnt for r in got.drop("last_batch_id").collect()}
    b = {(r.depth_idx, r.bucket): r.cnt for r in batch.collect()}
    assert a == b
    assert len(a) <= 64 * 4
    # replay safety: re-running with the SAME checkpoint finds nothing
    # new (AvailableNow), and the batch_id guard keeps state unchanged
    q2 = SP.run_sketch_stream(
        SP.stream_events_from_dir(spark, events_dir, max_files_per_trigger=1)
        .select("event_type"),
        "event_type", out_dir, str(tmp_path / "ckpt_sketch"), width=64, depth=4,
    )
    q2.awaitTermination(120)
    again = {
        (r.depth_idx, r.bucket): r.cnt
        for r in spark.read.parquet(SP.sketch_state_path(out_dir))
        .drop("last_batch_id").collect()
    }
    assert again == a
    # GC retention (r12, r11 ADVICE): the live dir AND its immediate
    # predecessor survive (retain_versions=2 default) so a reader
    # that resolved the pointer just before the swap is never pulled
    # out from under; older versions are gone
    state_dirs = sorted(
        int(n.removeprefix("state_"))
        for n in os.listdir(out_dir)
        if n.startswith("state_")
    )
    assert 1 <= len(state_dirs) <= 2
    live = os.path.basename(SP.sketch_state_path(out_dir))
    assert live == f"state_{state_dirs[-1]}"  # pointer on the newest


@pytest.mark.slow
def test_hll_and_bloom_streams_equal_batch(spark, events_dir, tmp_path):
    """The generalized sketch harness (r11): streaming HLL registers
    and bloom words after draining equal the batch-built sketches
    row for row — max/bit_or merges are idempotent AND associative,
    so micro-batching can't change a single register/word."""
    import os

    from data_ingestion_spark.functions.sketches import bloom_build, hll_build

    # explicit non-default geometry (r12, r11 ADVICE): p / m_bits / k
    # are threaded through to the builds, not silently ignored — the
    # batch twin uses the SAME geometry and must match register/word
    # exact (a geometry mismatch would disagree on every row)
    for kind, batch_build, key in [
        ("hll", lambda df: hll_build(df, "user_id", p=8), ("bucket", "rho")),
        (
            "bloom",
            lambda df: bloom_build(df, "user_id", m_bits=63 * 32, k=3),
            ("word_idx", "word"),
        ),
    ]:
        out_dir = str(tmp_path / f"sk_{kind}")
        os.makedirs(out_dir, exist_ok=True)
        stream = SP.stream_events_from_dir(spark, events_dir, max_files_per_trigger=1)
        q = SP.run_sketch_stream(
            stream.select("user_id"), "user_id", out_dir,
            str(tmp_path / f"ckpt_{kind}"), kind=kind,
            p=8, m_bits=63 * 32, k=3,
        )
        q.awaitTermination(120)
        got = {
            tuple(getattr(r, c) for c in key)
            for r in spark.read.parquet(SP.sketch_state_path(out_dir))
            .drop("last_batch_id").collect()
        }
        batch = {
            tuple(getattr(r, c) for c in key)
            for r in batch_build(
                spark.read.parquet(events_dir).select("user_id")
            ).collect()
        }
        assert got == batch, kind


@pytest.mark.slow
def test_index_maintenance_stream_last_wins_and_replay_safe(spark, tmp_path):
    """r12: a document stream folds into the managed postings root —
    first batch builds, later batches upsert with REPLACE semantics
    (a doc_id reappearing in a later micro-batch wins), every commit
    is an atomic pointer swap. After draining, the served index
    equals a from-scratch build over the last-wins corpus ROW FOR
    ROW, and a checkpoint replay folds nothing new."""
    import os
    import time

    from data_ingestion_spark.functions.similarity import (
        IndexReader,
        bm25_rank_batch_indexed,
        build_postings_index,
        index_current_path,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    src_dir = str(tmp_path / "docs_stream")
    os.makedirs(src_dir)
    slices = [
        docs.filter(F.col("doc_id") % 3 == 0).withColumn(
            "text", F.concat(F.col("text"), F.lit(" stale marker token"))
        ),
        docs.filter(F.col("doc_id") % 3 == 1),
        docs.filter(F.col("doc_id") % 3 == 0),  # true text replaces slice 0
    ]
    now = time.time()
    for i, sl in enumerate(slices):
        p = os.path.join(src_dir, f"slice_{i}.parquet")
        sl.toPandas().to_parquet(p, index=False)
        os.utime(p, (now + i, now + i))  # deterministic arrival order

    root = str(tmp_path / "idx_root")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = SP.run_index_maintenance_stream(
        stream, root, str(tmp_path / "ckpt_idx"), buckets=16
    )
    q.awaitTermination(180)

    live = index_current_path(root)
    assert live is not None
    expected_corpus = docs.filter(F.col("doc_id") % 3 != 2)  # last-wins = true text
    ref_idx = str(tmp_path / "ref_idx")
    build_postings_index(expected_corpus, ref_idx, buckets=16)

    def rowset(idx):
        # IndexReader resolves both layouts: the stream's live version
        # is an LSM manifest (union of delta segments, last-wins), the
        # reference build is monolithic — the LOGICAL postings must be
        # row-for-row equal
        return sorted(
            (r.term, r.doc_id, r.tf, r.dl, r.bucket)
            for r in IndexReader(spark, idx).postings().collect()
        )

    assert rowset(live) == rowset(ref_idx)  # no stale-marker postings survive
    qdf = spark.createDataFrame(
        [(1, "spark vector"), (2, "customer merge")],
        "query_id int, query_text string",
    )
    got = sorted(
        (r.query_id, r.doc_id, round(r.score, 6), r.rank)
        for r in bm25_rank_batch_indexed(spark, qdf, live).collect()
    )
    ref = sorted(
        (r.query_id, r.doc_id, round(r.score, 6), r.rank)
        for r in bm25_rank_batch_indexed(spark, qdf, ref_idx).collect()
    )
    assert got == ref

    # replay: same checkpoint drains nothing new — version chain and
    # pointer unchanged
    versions_before = sorted(n for n in os.listdir(root) if n.startswith("v_"))
    q2 = SP.run_index_maintenance_stream(
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir),
        root,
        str(tmp_path / "ckpt_idx"),
        buckets=16,
    )
    q2.awaitTermination(180)
    assert sorted(n for n in os.listdir(root) if n.startswith("v_")) == versions_before
    assert index_current_path(root) == live


@pytest.mark.slow
def test_ann_maintenance_stream_last_wins_and_replay_safe(spark, tmp_path):
    """r13 (r12 verdict #3): an embedding stream folds into the
    managed ANN root — first batch builds the base segment, later
    batches are O(delta) LSM upserts behind atomic pointer swaps.
    After draining, a probe of the live version equals a from-scratch
    monolithic store over the LAST-WINS corpus; a checkpoint replay
    folds nothing new; compaction carries the replay marker."""
    import os
    import time

    from data_ingestion_spark.functions.similarity import (
        AnnStore,
        SegmentedAnnStore,
        compact_ann_store,
        index_current_path,
        _open_ann_version,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    src_dir = str(tmp_path / "emb_stream")
    os.makedirs(src_dir)
    # slice 0 ships STALE vectors for vec_id%3==0 (negated: flips every
    # sign bucket AND every score); slice 2 re-embeds them correctly
    slices = [
        emb.filter(F.col("vec_id") % 3 == 0).withColumn(
            "embedding", F.transform("embedding", lambda x: -x)
        ),
        emb.filter(F.col("vec_id") % 3 == 1),
        emb.filter(F.col("vec_id") % 3 == 0),
    ]
    now = time.time()
    for i, sl in enumerate(slices):
        p = os.path.join(src_dir, f"slice_{i}.parquet")
        sl.toPandas().to_parquet(p, index=False)
        os.utime(p, (now + i, now + i))

    root = str(tmp_path / "ann_root")
    schema = "vec_id bigint, embedding array<float>"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = SP.run_ann_maintenance_stream(
        stream, root, str(tmp_path / "ckpt_ann"), bits=3, n_tables=6
    )
    q.awaitTermination(180)

    live_path = index_current_path(root)
    assert live_path is not None
    live = _open_ann_version(spark, live_path)
    assert isinstance(live, SegmentedAnnStore) and len(live.seg_paths) == 3

    ref = AnnStore(spark, str(tmp_path / "ref"), bits=3, n_tables=6)
    ref.write(emb.filter(F.col("vec_id") % 3 != 2))  # last-wins = true vectors

    def top(store, qv):
        return [(r.vec_id, round(r.score, 6)) for r in store.probe(qv, k=5).collect()]

    qvs = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    for qv in qvs:
        assert top(live, qv) == top(ref, qv)

    # replay: same checkpoint mints no new version
    versions_before = sorted(n for n in os.listdir(root) if n.startswith("v_"))
    q2 = SP.run_ann_maintenance_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir),
        root,
        str(tmp_path / "ckpt_ann"),
        bits=3,
        n_tables=6,
    )
    q2.awaitTermination(180)
    assert sorted(n for n in os.listdir(root) if n.startswith("v_")) == versions_before
    assert index_current_path(root) == live_path

    # compaction folds segments, keeps answers, CARRIES the marker —
    # so a post-compaction restart still replays nothing
    folded = compact_ann_store(spark, root, retain=1)
    assert len(folded.seg_paths) == 1
    for qv in qvs:
        assert top(folded, qv) == top(ref, qv)
    assert os.path.exists(
        os.path.join(index_current_path(root), "_last_batch_id")
    )
    versions_before = sorted(n for n in os.listdir(root) if n.startswith("v_"))
    q3 = SP.run_ann_maintenance_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir),
        root,
        str(tmp_path / "ckpt_ann"),
        bits=3,
        n_tables=6,
    )
    q3.awaitTermination(180)
    assert sorted(n for n in os.listdir(root) if n.startswith("v_")) == versions_before


@pytest.mark.slow
def test_ann_maintenance_stream_quantized(spark, tmp_path):
    """quantized=True streams SQ8 segments: base + per-batch delta
    segments each carrying their OWN bounds; the drained store's
    probe_quantized equals a raw monolithic rebuild (exact re-score),
    through batch serving too."""
    import os
    import time

    from data_ingestion_spark.functions.similarity import (
        AnnStore,
        index_current_path,
        _open_ann_version,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    src_dir = str(tmp_path / "emb_stream_q")
    os.makedirs(src_dir)
    slices = [
        emb.filter(F.col("vec_id") % 2 == 0),
        # second batch drifts magnitudes 15x (cosine-identical
        # directions): its delta segment must quantize its own range
        emb.filter(F.col("vec_id") % 2 == 1).withColumn(
            "embedding",
            F.transform("embedding", lambda x: x * F.lit(15.0)).cast("array<float>"),
        ),
    ]
    now = time.time()
    for i, sl in enumerate(slices):
        p = os.path.join(src_dir, f"slice_{i}.parquet")
        sl.toPandas().to_parquet(p, index=False)
        os.utime(p, (now + i, now + i))

    root = str(tmp_path / "ann_root_q")
    q = SP.run_ann_maintenance_stream(
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir),
        root,
        str(tmp_path / "ckpt_ann_q"),
        bits=3,
        n_tables=6,
        quantized=True,
    )
    q.awaitTermination(180)

    live = _open_ann_version(spark, index_current_path(root))
    assert live._quant and len(live.seg_paths) == 2
    ref = AnnStore(spark, str(tmp_path / "refq"), bits=3, n_tables=6)
    ref.write(slices[0].unionByName(slices[1]))
    qv = [float(x) for x in emb.limit(1).collect()[0].embedding]
    got = [(r.vec_id, round(r.score, 6)) for r in live.probe_quantized(qv, 5).collect()]
    exp = [(r.vec_id, round(r.score, 6)) for r in ref.probe(qv, 5).collect()]
    assert got == exp and got
    qdf = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    gb = sorted(
        (r.query_id, r.vec_id, round(r.score, 6), r.rank)
        for r in live.probe_batch_quantized(qdf, k=5).collect()
    )
    eb = sorted(
        (r.query_id, r.vec_id, round(r.score, 6), r.rank)
        for r in ref.probe_batch(qdf, k=5).collect()
    )
    assert gb == eb and gb


@pytest.mark.slow
def test_index_maintenance_auto_compaction(spark, tmp_path):
    """r13 verdict #1: max_segments bounds the live manifest — a
    12-batch stream with max_segments=4 compacts inside the fold
    whenever an upsert pushes past the bound, the drained index still
    equals a from-scratch build ROW FOR ROW, and a checkpoint replay
    folds nothing new (the marker survives the auto-fold)."""
    import os
    import time

    from data_ingestion_spark.functions.similarity import (
        IndexReader,
        _live_segment_count,
        build_postings_index,
        index_current_path,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    src_dir = str(tmp_path / "docs_stream")
    os.makedirs(src_dir)
    now = time.time()
    for i in range(12):
        p = os.path.join(src_dir, f"slice_{i}.parquet")
        docs.filter(F.col("doc_id") % 12 == i).toPandas().to_parquet(p, index=False)
        os.utime(p, (now + i, now + i))

    root = str(tmp_path / "idx_root")

    def _stream():
        return (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

    q = SP.run_index_maintenance_stream(
        _stream(), root, str(tmp_path / "ckpt"), buckets=16, max_segments=4
    )
    q.awaitTermination(240)

    # counts cycle 1,2,3,4,(5→fold→)1,...: 12 batches land on exactly 4
    assert _live_segment_count(root) == 4
    # no committed version ever held more than the transient max+1
    with open(os.path.join(root, "_COMMITS"), encoding="utf-8") as f:
        committed = [n.strip() for n in f if n.strip()]
    from data_ingestion_spark.functions.similarity import _read_manifest

    for n in committed:
        vdir = os.path.join(root, n)
        if not os.path.isdir(vdir):
            continue  # vacuumed by a later fold — fine
        m = _read_manifest(vdir)
        assert m is None or len(m["segments"]) <= 5

    live = index_current_path(root)
    ref_idx = str(tmp_path / "ref_idx")
    build_postings_index(docs, ref_idx, buckets=16)

    def rowset(idx):
        return sorted(
            (r.term, r.doc_id, r.tf, r.dl, r.bucket)
            for r in IndexReader(spark, idx).postings().collect()
        )

    assert rowset(live) == rowset(ref_idx)

    versions_before = sorted(n for n in os.listdir(root) if n.startswith("v_"))
    q2 = SP.run_index_maintenance_stream(
        _stream(), root, str(tmp_path / "ckpt"), buckets=16, max_segments=4
    )
    q2.awaitTermination(240)
    assert sorted(n for n in os.listdir(root) if n.startswith("v_")) == versions_before
    assert index_current_path(root) == live


@pytest.mark.slow
def test_ann_maintenance_auto_compaction_quantized(spark, tmp_path):
    """ANN twin: a 6-batch quantized embedding stream with
    max_segments=2 keeps the live manifest at <=2 segments (each fold
    is also the global re-quantization point) and the drained store
    probes identically to a from-scratch quantized build."""
    import os
    import time

    from data_ingestion_spark.functions.similarity import (
        AnnStore,
        _live_segment_count,
        _open_ann_version,
        index_current_path,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    src_dir = str(tmp_path / "emb_stream")
    os.makedirs(src_dir)
    now = time.time()
    for i in range(6):
        p = os.path.join(src_dir, f"slice_{i}.parquet")
        emb.filter(F.col("vec_id") % 6 == i).toPandas().to_parquet(p, index=False)
        os.utime(p, (now + i, now + i))

    root = str(tmp_path / "ann_root")
    q = SP.run_ann_maintenance_stream(
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir),
        root,
        str(tmp_path / "ckpt_ann"),
        bits=3,
        n_tables=6,
        quantized=True,
        max_segments=2,
    )
    q.awaitTermination(240)
    assert _live_segment_count(root) <= 2

    ref = AnnStore(spark, str(tmp_path / "ref"), bits=3, n_tables=6)
    ref.write_quantized(emb)
    live = _open_ann_version(spark, index_current_path(root))
    qv = [float(x) for x in emb.limit(1).collect()[0].embedding]
    got = [(r.vec_id, round(r.score, 6)) for r in live.probe_quantized(qv, 5).collect()]
    want = [(r.vec_id, round(r.score, 6)) for r in ref.probe_quantized(qv, 5).collect()]
    assert got == want


@pytest.mark.slow
def test_maybe_compact_batch_helpers(spark, tmp_path):
    """Batch-side trigger: maybe_compact_* is a no-op within bounds
    (returns None) and folds to one segment past them."""
    from data_ingestion_spark.functions.similarity import (
        _live_segment_count,
        build_postings_index_versioned,
        maybe_compact_ann_store,
        maybe_compact_index,
        upsert_postings_index_versioned,
        upsert_ann_store_versioned,
        write_ann_store_versioned,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
    )
    root = str(tmp_path / "idx")
    build_postings_index_versioned(docs, root, buckets=8)
    upsert_postings_index_versioned(docs.filter(F.col("doc_id") % 3 == 0), root)
    assert maybe_compact_index(spark, root, max_segments=2) is None
    assert _live_segment_count(root) == 2
    upsert_postings_index_versioned(docs.filter(F.col("doc_id") % 3 == 1), root)
    assert maybe_compact_index(spark, root, max_segments=2) is not None
    assert _live_segment_count(root) == 1

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    ).limit(200)
    aroot = str(tmp_path / "ann")
    write_ann_store_versioned(emb, aroot, bits=3, n_tables=4)
    upsert_ann_store_versioned(emb.filter(F.col("vec_id") % 2 == 0), aroot)
    assert maybe_compact_ann_store(spark, aroot, max_segments=2) is None
    upsert_ann_store_versioned(emb.filter(F.col("vec_id") % 2 == 1), aroot)
    handle = maybe_compact_ann_store(spark, aroot, max_segments=2)
    assert handle is not None and _live_segment_count(aroot) == 1


@pytest.mark.slow
def test_index_maintenance_stream_cdc_deletes(spark, tmp_path):
    """r14 CDC fold: a stream carrying op='upsert'/'delete' rows
    folds content AND takedowns into the managed postings root —
    drained index == from-scratch build over the surviving last-wins
    corpus, same-id conflict within a batch resolves to DELETED,
    replay folds nothing."""
    import os
    import time

    from data_ingestion_spark.functions.similarity import (
        IndexReader,
        build_postings_index,
        index_current_path,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(90)
    )
    src_dir = str(tmp_path / "cdc_stream")
    os.makedirs(src_dir)
    up = F.lit("upsert")
    slices = [
        docs.withColumn("op", up),                                   # build all 90
        # batch 2: re-upsert 0..9 with new text AND delete 20..29;
        # doc 5 gets BOTH an upsert and a delete -> delete wins
        docs.filter(F.col("doc_id") < 10)
        .withColumn("text", F.concat(F.col("text"), F.lit(" fresh cdc token")))
        .withColumn("op", up)
        .unionByName(
            docs.filter(
                ((F.col("doc_id") >= 20) & (F.col("doc_id") < 30))
                | (F.col("doc_id") == 5)
            ).select("doc_id", F.lit(None).cast("string").alias("text"))
            .withColumn("op", F.lit("delete"))
        ),
        # batch 3: delete-only
        docs.filter(F.col("doc_id") == 40)
        .select("doc_id", F.lit(None).cast("string").alias("text"))
        .withColumn("op", F.lit("delete")),
    ]
    now = time.time()
    for i, sl in enumerate(slices):
        # write via Spark (pandas infers INT32 for an all-NULL column)
        tmp_out = str(tmp_path / f"__cdc_slice_{i}")
        sl.coalesce(1).write.parquet(tmp_out)
        import glob as _glob
        import shutil as _shutil

        p = os.path.join(src_dir, f"slice_{i}.parquet")
        _shutil.copy(_glob.glob(tmp_out + "/*.parquet")[0], p)
        os.utime(p, (now + i, now + i))

    root = str(tmp_path / "root")

    def _stream():
        return (
            spark.readStream.schema("doc_id bigint, text string, op string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

    q = SP.run_index_maintenance_stream(
        _stream(), root, str(tmp_path / "ckpt"), buckets=16, op_col="op"
    )
    q.awaitTermination(240)

    survivors = (
        docs.filter(F.col("doc_id") < 10)
        .withColumn("text", F.concat(F.col("text"), F.lit(" fresh cdc token")))
        .unionByName(docs.filter(F.col("doc_id") >= 10))
        .filter(
            ~(
                ((F.col("doc_id") >= 20) & (F.col("doc_id") < 30))
                | F.col("doc_id").isin(5, 40)
            )
        )
    )
    ref = str(tmp_path / "ref")
    build_postings_index(survivors, ref, buckets=16)
    live = index_current_path(root)

    def rowset(idx):
        return sorted(
            (r.term, r.doc_id, r.tf, r.dl, r.bucket)
            for r in IndexReader(spark, idx).postings().collect()
        )

    assert rowset(live) == rowset(ref)
    assert IndexReader(spark, live).n_docs == survivors.count()

    versions_before = sorted(n for n in os.listdir(root) if n.startswith("v_"))
    q2 = SP.run_index_maintenance_stream(
        _stream(), root, str(tmp_path / "ckpt"), buckets=16, op_col="op"
    )
    q2.awaitTermination(240)
    assert sorted(n for n in os.listdir(root) if n.startswith("v_")) == versions_before


def test_ann_maintenance_stream_cdc_deletes(spark, tmp_path):
    """ANN CDC twin: delete events carry only the id (NULL embedding);
    drained store probes identically to a rebuild over the survivors."""
    import os
    import time

    from data_ingestion_spark.functions.similarity import (
        AnnStore,
        _open_ann_version,
        index_current_path,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    src_dir = str(tmp_path / "cdc_ann")
    os.makedirs(src_dir)
    slices = [
        emb.withColumn("op", F.lit("upsert")),
        emb.filter(F.col("vec_id") % 9 == 0)
        .select("vec_id", F.lit(None).cast("array<float>").alias("embedding"))
        .withColumn("op", F.lit("delete")),
    ]
    now = time.time()
    for i, sl in enumerate(slices):
        tmp_out = str(tmp_path / f"__cdc_slice_{i}")
        sl.coalesce(1).write.parquet(tmp_out)
        import glob as _glob
        import shutil as _shutil

        p = os.path.join(src_dir, f"slice_{i}.parquet")
        _shutil.copy(_glob.glob(tmp_out + "/*.parquet")[0], p)
        os.utime(p, (now + i, now + i))

    root = str(tmp_path / "root")
    q = SP.run_ann_maintenance_stream(
        spark.readStream.schema("vec_id bigint, embedding array<float>, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir),
        root,
        str(tmp_path / "ckpt"),
        bits=3,
        n_tables=6,
        op_col="op",
    )
    q.awaitTermination(240)

    survivors = emb.filter(F.col("vec_id") % 9 != 0)
    ref = AnnStore(spark, str(tmp_path / "ref"), bits=3, n_tables=6)
    ref.write(survivors)
    live = _open_ann_version(spark, index_current_path(root))
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 1).head().embedding]
    got = [(r.vec_id, round(r.score, 6)) for r in live.probe(qv, 8).collect()]
    want = [(r.vec_id, round(r.score, 6)) for r in ref.probe(qv, 8).collect()]
    assert got == want


@pytest.mark.slow
def test_pq_maintenance_stream_last_wins_replay_and_autocompact(spark, tmp_path):
    """r14 Y-series: an embedding stream folds into the IVF-PQ root —
    batch 0 trains + builds the base, later batches are frozen-
    codebook O(delta) segments, a CDC delete tombstones, and
    max_segments triggers the IN-PLACE versioned retraining fold
    inside the same foreachBatch (r15: atomic CURRENT commit, no
    rename swap). Drained serve equals brute force over the LAST-WINS
    surviving corpus; a checkpoint replay folds nothing."""
    import os
    import time

    from data_ingestion_spark.functions.pq import IvfPqStore
    from data_ingestion_spark.functions.similarity import brute_force_topk

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < 120)
    )
    src_dir = str(tmp_path / "pq_stream")
    os.makedirs(src_dir)
    op = F.lit("upsert").alias("op")
    slices = [
        # batch 0: STALE vectors for %3==0 (negated), the build batch
        emb.filter(F.col("vec_id") % 3 == 0)
        .withColumn("embedding", F.transform("embedding", lambda x: -x))
        .select("vec_id", "embedding", op),
        emb.filter(F.col("vec_id") % 3 == 1).select("vec_id", "embedding", op),
        # batch 2: correct re-embeds (replace) + a CDC delete of id 9
        emb.filter(F.col("vec_id") % 3 == 0)
        .select("vec_id", "embedding", op)
        .unionByName(
            spark.createDataFrame(
                [(9, None, "delete")],
                "vec_id bigint, embedding array<float>, op string",
            )
        ),
    ]
    now = time.time()
    for i, sl in enumerate(slices):
        p = os.path.join(src_dir, f"slice_{i}.parquet")
        sl.toPandas().to_parquet(p, index=False)
        os.utime(p, (now + i, now + i))

    root = str(tmp_path / "pq_root")
    schema = "vec_id bigint, embedding array<float>, op string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = SP.run_pq_maintenance_stream(
        stream, root, str(tmp_path / "ckpt_pq"),
        n_cells=4, m=4, max_segments=2, op_col="op",
    )
    q.awaitTermination(240)

    store = IvfPqStore(spark, root)
    # max_segments=2: batch 2 lands segments 2 (upsert) + 3 (tombstone)
    # -> over the bound -> the same fold compacts back to ONE segment
    assert len(store.meta["segments"]) == 1 and store.meta["tombstones"] == []
    # root-level marker untouched by the in-place fold
    assert os.path.exists(os.path.join(root, "_last_batch_id"))

    truth = emb.filter((F.col("vec_id") % 3 != 2) & (F.col("vec_id") != 9))
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).head().embedding]
    got = store.probe(qv, k=5, n_probe=4, keep=120).collect()
    qcol = F.array(*[F.lit(float(x)) for x in qv])
    want = brute_force_topk(truth, qcol, 5).collect()
    assert [(r.vec_id, r.score) for r in got] == [
        (r.vec_id, r.score) for r in want
    ]
    assert all(r.vec_id != 9 for r in got)

    # replay: same source, fresh checkpoint -> markers skip every batch
    current_before = open(os.path.join(root, "CURRENT")).read()
    q2 = SP.run_pq_maintenance_stream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_dir),
        root, str(tmp_path / "ckpt_pq2"),
        n_cells=4, m=4, max_segments=2, op_col="op",
    )
    q2.awaitTermination(240)
    current_after = open(os.path.join(root, "CURRENT")).read()
    assert current_before == current_after  # no new commits on replay


def test_pq_maintenance_stream_refuses_legacy_root(spark, tmp_path):
    """r15 ADVICE (medium): a pre-versioned IVF-PQ root (_pq_meta.json
    on disk, no CURRENT) must fail the maintenance stream LOUDLY with
    the migration error — not read as 'never built' and silently
    base-build a fresh store over the legacy corpus."""
    import json
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    legacy = str(tmp_path / "legacy_root")
    os.makedirs(legacy)
    with open(os.path.join(legacy, "_pq_meta.json"), "w", encoding="utf-8") as f:
        json.dump({"dim": 8, "m": 4}, f)

    src_dir = str(tmp_path / "legacy_src")
    os.makedirs(src_dir)
    spark.range(1, 30).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda j: F.sin(F.col("id") * (j + F.lit(1.3))).cast("float"),
        ).alias("embedding"),
    ).toPandas().to_parquet(os.path.join(src_dir, "b0.parquet"), index=False)

    stream = spark.readStream.schema(
        "vec_id bigint, embedding array<float>"
    ).parquet(src_dir)
    q = SP.run_pq_maintenance_stream(
        stream, legacy, str(tmp_path / "ckpt_legacy"), n_cells=2, m=4
    )
    with pytest.raises(StreamingQueryException, match="legacy"):
        q.awaitTermination(240)
    # nothing was built over the legacy root
    assert not os.path.exists(os.path.join(legacy, "CURRENT"))


def test_novelty_stream_cross_batch_and_replay(spark, tmp_path):
    """r16 band-store streaming fold: batch 0 bootstraps the store,
    later batches gate against everything ADMITTED so far (copies and
    near-dups of batch-0 docs AND of batch-1 admits both drop), the
    admitted output equals the sequential batch gate-loop, and a full
    replay admits nothing (self-healing: the batch's own fingerprints
    are at rest from the first run)."""
    import os
    import time

    from data_ingestion_spark.functions.similarity import index_current_path

    t_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t_b = "one two three four five six seven eight nine ten eleven"
    t_c = "red orange yellow green blue indigo violet cyan magenta white"
    t_d = "monday tuesday wednesday thursday friday saturday sunday always never maybe"
    slices = [
        [(1, t_a), (2, t_b)],                       # batch 0: bootstrap
        [(10, t_a), (11, t_b + " tail"), (3, t_c)],  # copy A, near B, novel C
        [(12, t_c), (4, t_d)],                       # copy of batch-1 ADMIT, novel D
    ]
    src_dir = str(tmp_path / "nov_src")
    os.makedirs(src_dir)
    now = time.time()
    for i, rows in enumerate(slices):
        p = os.path.join(src_dir, f"slice_{i}.parquet")
        spark.createDataFrame(rows, "doc_id long, text string").toPandas().to_parquet(
            p, index=False
        )
        os.utime(p, (now + i, now + i))

    root = str(tmp_path / "nov_root")
    out_dir = str(tmp_path / "nov_out")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = SP.run_novelty_stream(stream, root, out_dir, str(tmp_path / "nov_ck"))
    q.awaitTermination(240)

    admitted = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
    assert admitted == [1, 2, 3, 4]  # copies/near-dups dropped cross-batch

    # sequential batch-loop twin produces the identical admit set
    from data_ingestion_spark.functions.dedup import novelty_gate

    at_rest = spark.createDataFrame([], "doc_id long, text string")
    loop_admitted: list[int] = []
    for rows in slices:
        batch = spark.createDataFrame(rows, "doc_id long, text string")
        adm = batch if at_rest.isEmpty() else novelty_gate(
            batch, at_rest, "text", "doc_id"
        )
        loop_admitted += [r.doc_id for r in adm.collect()]
        at_rest = at_rest.unionByName(adm)
    assert sorted(loop_admitted) == admitted

    # replay (fresh checkpoint, same source): nothing new admitted,
    # no new store version committed
    current_before = open(os.path.join(root, "CURRENT")).read()
    n_before = spark.read.parquet(out_dir).count()
    q2 = SP.run_novelty_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir),
        root,
        out_dir,
        str(tmp_path / "nov_ck2"),
    )
    q2.awaitTermination(240)
    assert spark.read.parquet(out_dir).count() == n_before
    assert open(os.path.join(root, "CURRENT")).read() == current_before
    assert index_current_path(root) is not None


@pytest.mark.slow
def test_novelty_stream_max_segments_and_idempotent_output(spark, tmp_path):
    """r17: (1) max_segments= keeps the band store's segment list
    bounded across a 12-batch stream while the admitted set stays ≡
    the sequential gate loop, and replay across the fold is a no-op;
    (2) the output sink is idempotent per batch (r16 ADVICE) — a
    crash between the output write and the store fold re-admits the
    batch into the SAME batch_id partition with overwrite, so no
    duplicate rows survive."""
    import os
    import shutil
    import time

    from data_ingestion_spark.functions.dedup import novelty_gate
    from data_ingestion_spark.functions.similarity import (
        _read_manifest,
        index_current_path,
    )

    import random

    rng = random.Random(11)
    vocab = "zq xv yw uu ab cd ef gh ij kl mn op qr st".split()

    def fresh_text():
        return " ".join(
            rng.choice(vocab) + str(rng.randint(0, 99999)) for _ in range(12)
        )

    # 12 batches: each has one novel doc; odd batches also replay a
    # copy of an earlier admit (must drop cross-batch, even after the
    # store has been folded in between)
    texts = {i: fresh_text() for i in range(12)}
    slices = []
    for i in range(12):
        rows = [(100 + i, texts[i])]
        if i % 2 == 1:
            rows.append((200 + i, texts[i - 1]))  # copy of last admit
        slices.append(rows)

    src_dir = str(tmp_path / "novms_src")
    os.makedirs(src_dir)
    now = time.time()
    for i, rows in enumerate(slices):
        p = os.path.join(src_dir, f"slice_{i}.parquet")
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).toPandas().to_parquet(p, index=False)
        os.utime(p, (now + i, now + i))

    root = str(tmp_path / "novms_root")
    out_dir = str(tmp_path / "novms_out")

    def start(ck):
        return SP.run_novelty_stream(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir),
            root,
            out_dir,
            str(tmp_path / ck),
            max_segments=4,
        )

    q = start("novms_ck")
    q.awaitTermination(240)

    admitted = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
    assert admitted == sorted(100 + i for i in range(12))

    # segment list bounded by the auto-compaction trigger
    m = _read_manifest(index_current_path(root))
    assert len(m["segments"]) <= 4

    # ≡ the sequential gate loop over the same batches
    at_rest = spark.createDataFrame([], "doc_id long, text string")
    loop_admitted = []
    for rows in slices:
        batch = spark.createDataFrame(rows, "doc_id long, text string")
        adm = batch if at_rest.isEmpty() else novelty_gate(
            batch, at_rest, "text", "doc_id"
        )
        loop_admitted += [r.doc_id for r in adm.collect()]
        at_rest = at_rest.unionByName(adm)
    assert sorted(loop_admitted) == admitted

    # replay across the fold: no new rows, no new version
    current_before = open(os.path.join(root, "CURRENT")).read()
    q2 = start("novms_ck2")
    q2.awaitTermination(240)
    assert sorted(
        r.doc_id for r in spark.read.parquet(out_dir).collect()
    ) == admitted
    assert open(os.path.join(root, "CURRENT")).read() == current_before

    # crash window between output write and store fold (r16 ADVICE):
    # simulate output-written-but-store-never-folded by wiping the
    # store and marker, keeping out_dir. The rerun re-admits every
    # batch and OVERWRITES its own batch_id partition — row counts
    # must not double.
    n_rows = spark.read.parquet(out_dir).count()
    parts_before = sorted(
        d for d in os.listdir(out_dir) if d.startswith("batch_id=")
    )
    shutil.rmtree(root)
    q3 = start("novms_ck3")
    q3.awaitTermination(240)
    assert spark.read.parquet(out_dir).count() == n_rows
    assert sorted(
        r.doc_id for r in spark.read.parquet(out_dir).collect()
    ) == admitted
    assert sorted(
        d for d in os.listdir(out_dir) if d.startswith("batch_id=")
    ) == parts_before
