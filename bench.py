#!/usr/bin/env python
"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop write (full computation,
no driver-side collect cost for large results). JVM/session startup is
excluded; per-query wall time includes Catalyst planning. Targets per
BASELINE.md: relational suite well under 2x oracle wall; similarity
and dedup headline ops < 10 s at sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline set: one per operator family (scan+agg, join zoo, window,
#: sessionization, chunk explode, text analysis, dedup x2, similarity,
#: as-of). Names are queries() keys.
HEADLINE = [
    "agg_numeric_stats",
    "join_inner_equi",
    "join_left_outer",
    "join_range",
    "join_asof",
    "window_lag_frame",
    "sessionize_batch",
    "window_tumbling_batch",
    "chunk_fixed_overlap",
    "text_stats",
    "text_quality_score",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "similarity_topk",
    "similarity_topk_lsh",
    "agg_rollup",
    "sort_global",
    # round-2 additions: subquery decorrelation, repetition quality
    # signals, cascading time rollup, salted skew join
    "tpch_q2_min_cost_supplier",
    "tpch_q17_small_quantity",
    "quality_repetition_signals",
    "rollup_time_cascade",
    "join_salted_skew",
    # round-3 additions: connected-components clustering (one fewer
    # shuffle per round after the convergence-flag fix) and the real
    # pure-struct media header decode
    "dedup_clusters",
    "multimodal_header_decode",
    # round-5 additions: diameter-safe star-contraction CC and the
    # training-data export ops (packing window, broadcast
    # decontamination join, per-source quota window)
    "dedup_clusters_star",
    "pack_sequences",
    "decontaminate_eval_overlap",
    "per_source_quota",
    "training_export_pipeline",
]

#: queries whose computation executes EAGERLY at DataFrame-construction
#: time (iterative operators: localCheckpoint per CC round). For these
#: the timer must wrap construction too — timing only the final write
#: reports 0.015 s for a ~4 s computation. Lazy queries keep write-only
#: timing: their construction is a constant ~0.1-0.3 s of driver-side
#: py4j API chatter, data-independent and irrelevant to cluster
#: throughput, and excluding it keeps numbers comparable round-over-
#: round (r01/r02 timed writes only).
EAGER_CONSTRUCTION = {"dedup_clusters", "dedup_clusters_star"}

#: headline_v2 (r14 verdict #5): one representative registry query per
#: post-r11 serving family the frozen v1 membership never exercises —
#: a plan regression in the managed-store serving layer, the graph
#: analytics, or corpus line dedup would otherwise be invisible to the
#: round-over-round headline number. Reported as a SEPARATE block
#: (v1 membership untouched, round-over-round comparability intact).
#: Every entry builds its fixture store/graph inside the callable, so
#: construction is timed too (the EAGER_CONSTRUCTION treatment) —
#: these numbers are build+serve, the full lifecycle cost.
HEADLINE_V2 = [
    "ann_probe_batch",          # LSH batch probe via managed root
    "ann_ivfpq_search",         # IVF-PQ ADC probe + exact re-rank
    "rank_bm25_index_compacted",  # indexed BM25 batch post-fold
    "graph_triangle_count",     # degree-ordered triangle counting
    "dedup_corpus_lines",       # exact line dedup (C4 rule)
    "dedup_novelty_indexed",    # r16: band-store build+upsert / gated serve
]


def _md5_block(_i: int) -> None:
    """Fixed single-core md5 workload for the parallel host probe —
    module level so multiprocessing can pickle it by reference."""
    import hashlib

    h = hashlib.md5()
    for _ in range(1_000_000):
        h.update(b"x")


def _host_probe() -> dict[str, float]:
    """Two fixed SINGLE-CORE workloads (numpy sort, pure-Python md5)
    whose times fingerprint THIS host's speed. Recorded in the JSON so
    cross-round suite numbers can be read as (suite / probe): the r08
    '+17% regression' was adjudicated in r09 as a uniformly ~25%
    slower VM (BENCH_NOTES), a question these two numbers now answer
    without an 11-sample re-measurement ceremony. np.sort, unlike a
    BLAS matmul, runs on exactly one thread regardless of the
    OpenBLAS/MKL pool size, so the fingerprint doesn't vary with core
    count or ambient load sharing the pool (r09 self-review).

    Each workload is a MEDIAN OF 7 short repetitions after a warm
    pass: this VM class shows bursty single-shot variance (a lone
    5M-element sort measured 0.25-3.2 s across runs — steal/boost
    jitter), while the warm median holds ±10%.

    r17 adds a PARALLEL probe: 16 forked workers running the same
    fixed md5 loop, reported as scaling efficiency (single wall /
    parallel wall x 100; 100 = sixteen workers cost one worker's
    wall). The single-core probes CANNOT see the dominant noise mode
    on this VM class — hypervisor-level multi-core throttling: r17
    measured np_sort in the clean band (0.0266) while 32-way scaling
    efficiency was 27% (the '32-core' box delivering ~9 cores), which
    made every 32-way stage ~3-4x slower on identical plans. Suite
    numbers from runs whose parallel efficiency differs are not
    comparable, exactly like runs whose np_sort differs."""
    import hashlib
    from statistics import median

    import numpy as np

    a = np.random.RandomState(0).rand(2_000_000)
    np.sort(a)  # warm: page-in + allocator
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.sort(a)
        ts.append(time.perf_counter() - t0)
    h = hashlib.md5()  # warm: hashlib init + str-encode path
    for i in range(10_000):
        h.update(str(i).encode())
    ms = []
    for _ in range(7):
        t0 = time.perf_counter()
        h = hashlib.md5()
        for i in range(100_000):
            h.update(str(i).encode())
        ms.append(time.perf_counter() - t0)
    from multiprocessing import Pool

    # r18 (r17 ADVICE): median-of-3 for BOTH the single reference wall
    # and the 16-way parallel wall — the single-shot reference was
    # exposed to exactly the bursty variance the median-of-7 above
    # exists for. The pool stays at 16 workers so the metric keys mean
    # the same thing across rounds; the host's core count is recorded
    # alongside so a reading from a different machine class is
    # interpretable (16-way scaling on an 8-core host tops out at 50%).
    _md5_block(0)  # warm: page-in
    singles = []
    for _ in range(3):
        t0 = time.perf_counter()
        _md5_block(0)
        singles.append(time.perf_counter() - t0)
    with Pool(16) as pool:
        pool.map(_md5_block, range(16))  # warm the workers
        pars = []
        for _ in range(3):
            t0 = time.perf_counter()
            pool.map(_md5_block, range(16))
            pars.append(time.perf_counter() - t0)
    return {
        "np_sort_2m_median7_sec": round(median(ts), 4),
        "py_md5_100k_median7_sec": round(median(ms), 4),
        "md5_par16_scaling_pct": round(median(singles) / median(pars) * 100.0, 1),
        "host_cpus": float(os.cpu_count() or 0),
    }


def main() -> None:
    from data_ingestion_spark.session import get_spark

    import __spark_entry__ as entrymod

    # load-average guard (r10 verdict #8): the r09 33.4 s discard and
    # the r10 27.98 s driver artifact were both ambient contention; a
    # 1-min load already > ~1.0 at start means another workload owns
    # cores, so the reading self-annotates as contended instead of
    # being adjudicated after the fact (probes catch sustained drift,
    # not a busy neighbor — BENCH_NOTES).
    load_avg_start = round(os.getloadavg()[0], 2)
    contended = load_avg_start > 1.0

    # r18 (r17 verdict #6): the r17 32-core driver artifact ran at 40%
    # 16-way scaling efficiency (hypervisor multi-core throttling) and
    # could not anchor the next round's comparison. Retry the probe a
    # few times so a TRANSIENT throttle window doesn't stamp the whole
    # artifact; if the box stays below the clean band, self-annotate
    # (`multicore_throttled`) and fold into `contended` — the same
    # honest-annotation treatment the load-average guard gives busy
    # neighbors. 60% is the floor below which r17 adjudicated suite
    # numbers as incomparable (27-40% readings vs 79% clean).
    host_probe = _host_probe()
    probe_attempts = 1
    while host_probe["md5_par16_scaling_pct"] < 60.0 and probe_attempts < 3:
        time.sleep(15.0)
        retry = _host_probe()
        probe_attempts += 1
        if retry["md5_par16_scaling_pct"] > host_probe["md5_par16_scaling_pct"]:
            host_probe = retry
    host_probe["probe_attempts"] = float(probe_attempts)
    multicore_throttled = host_probe["md5_par16_scaling_pct"] < 60.0
    contended = contended or multicore_throttled
    spark = get_spark("engine-bench")
    qs = entrymod.queries()

    # warm the JVM + parquet footers once (not timed per-query)
    qs["agg_global_count"](spark, SF_DIR).collect()

    # one untimed pass first: codegen JIT and python-worker spawn land
    # once, so the timed passes measure steady-state plans (the number
    # that predicts cluster throughput), not first-compile latency
    for name in HEADLINE:
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # median of 3 INTERLEAVED passes: all queries share one JVM, so a
    # single-pass timing couples each query to whatever GC/compilation
    # pressure the suite built up before it — that coupling is what
    # made round-over-round times drift on unchanged plans (r1→r2:
    # +27..90% on identical code). Interleaving spreads suite-position
    # effects across passes; the median drops one-off stalls.
    from statistics import median

    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(3):
        for name in HEADLINE:
            if name in EAGER_CONSTRUCTION:
                t0 = time.perf_counter()
                df = qs[name](spark, SF_DIR)
            else:
                df = qs[name](spark, SF_DIR)
                t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
    timings: dict[str, float] = {
        name: round(median(ts), 3) for name, ts in samples.items()
    }

    # -- headline_v2: post-r11 serving families, build and serve
    # timed SEPARATELY (r15 verdict #5: 11.7 s of ann_ivfpq_search's
    # 13 s was k-means build — a 2x serve regression would vanish in
    # build variance under a single lifecycle number). These callables
    # construct their fixture store/graph EAGERLY inside the call and
    # return the serving plan lazily, so the call is the BUILD phase
    # and the noop write is the SERVE phase; `headline_v2` stays the
    # per-name build+serve sum (round-over-round comparable with the
    # pre-split lifecycle numbers, same samples).
    for name in HEADLINE_V2:  # untimed warm pass (JIT, python workers)
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    samples_v2b: dict[str, list[float]] = {name: [] for name in HEADLINE_V2}
    samples_v2s: dict[str, list[float]] = {name: [] for name in HEADLINE_V2}
    for _ in range(3):
        for name in HEADLINE_V2:
            t0 = time.perf_counter()
            df_v2 = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df_v2.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            samples_v2b[name].append(t1 - t0)
            samples_v2s[name].append(t2 - t1)
    timings_v2b: dict[str, float] = {
        name: round(median(ts), 3) for name, ts in samples_v2b.items()
    }
    timings_v2s: dict[str, float] = {
        name: round(median(ts), 3) for name, ts in samples_v2s.items()
    }
    timings_v2: dict[str, float] = {
        name: round(
            median(b + s for b, s in zip(samples_v2b[name], samples_v2s[name])),
            3,
        )
        for name in HEADLINE_V2
    }

    # BASELINE.md proxy targets: end-to-end ingestion plan, and the
    # embedding stand-in stage in isolation (chunks/s)
    from data_ingestion_spark.plans.ingestion import ingestion_pipeline

    # one untimed warm pass, matching the headline treatment: the e2e
    # plan codegens a wide md5 expression tree (embed_deterministic)
    # seen nowhere else in the suite — a cold pass measured 5.6 s vs
    # 0.9 s warm, enough to skew the median when JIT lands late.
    ingestion_pipeline(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    e2e: list[float] = []
    for _ in range(3):
        t0 = time.perf_counter()
        ingestion_pipeline(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        e2e.append(time.perf_counter() - t0)
    timings["pipeline_ingest_e2e"] = round(median(e2e), 3)

    # embedding stand-in via the Arrow pandas-UDF path, isolated
    # (BASELINE.md target: >=10k chunks/s through the Arrow boundary)
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.embedding import make_embed_udf
    from data_ingestion_spark.functions.textops import chunk_fixed_overlap
    from data_ingestion_spark.sources.catalog import load_table, spread

    chunks = chunk_fixed_overlap(
        spread(load_table(spark, SF_DIR, "documents")), "text", ("doc_id",), 128, 32
    )
    n_chunks = chunks.count()
    embedded = chunks.withColumn("embedding", make_embed_udf(64)(F.col("chunk_text")))
    # first run spawns the executor python workers (untimed); then
    # median-of-5 warm passes. r06 flagged a 0.361 -> 0.433 s move on
    # best-of-2 — sub-second points need the tighter estimator to
    # separate drift from python-worker scheduling noise, and the
    # cost (~2 s) is trivial.
    embedded.write.format("noop").mode("overwrite").save()
    walls: list[float] = []
    for _ in range(5):
        t0 = time.perf_counter()
        embedded.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    dt = median(walls)
    timings["embed_udf_stage"] = round(dt, 3)
    throughput = {"embed_chunks_per_sec": round(n_chunks / dt, 1)}
    # BASELINE.md floor: >=10k chunks/s through the Arrow boundary.
    # Enforced (not eyeballed) whenever the corpus is big enough for
    # throughput to be chunk-bound rather than overhead-bound.
    # Recorded, not raised here: like the 10 s ceiling, gate failures
    # are reported AFTER the JSON emit so a transient miss never
    # discards the run's measurements (and survive `python -O`).
    gate_failures: list[str] = []
    if n_chunks >= 10_000 and throughput["embed_chunks_per_sec"] < 10_000:
        gate_failures.append(
            "embed stand-in throughput below the 10k chunks/s floor: "
            f"{throughput['embed_chunks_per_sec']}"
        )

    # ANN quality: recall@5 of the sign-bucket LSH and IVF probes vs
    # exact brute force, averaged over 20 query vectors
    from data_ingestion_spark.functions.similarity import (
        brute_force_topk,
        ivf_search,
        lsh_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings").cache()
    n_emb = emb.count()
    qrows = emb.filter(F.col("vec_id") < 20).collect()
    # the LSH table count is the recall/cost dial (measured r05 at
    # sf0.1: 1 table 0.36, 6 (default) 0.84, 8 → 0.90, 10 → 0.97);
    # at 3 bits/table each extra table adds ~1/8 of the corpus to the
    # candidate union, so at scale you widen BITS per table first and
    # add tables second — the default stays 6×3 (judge-accepted 0.84).
    hits_lsh1 = hits_default = hits_lsh8 = hits_ivf = 0
    # exact ground truth depends only on the query: computed once
    # here, reused by the bits/tables sweep and the AnnStore probe
    exact_by_qid = {}
    for qr in qrows:
        qv = F.array(*[F.lit(float(x)) for x in qr.embedding])
        exact = {r.vec_id for r in brute_force_topk(emb, qv, k=5).collect()}
        exact_by_qid[qr.vec_id] = exact
        lsh1 = {r.vec_id for r in lsh_topk(emb, qv, k=5, n_tables=1).collect()}
        # DEFAULT ANN path (multi-table): the number a naive caller gets
        dflt = {r.vec_id for r in lsh_topk(emb, qv, k=5).collect()}
        lsh8 = {r.vec_id for r in lsh_topk(emb, qv, k=5, n_tables=8).collect()}
        ivf = {
            r.vec_id
            for r in ivf_search(emb, qv, F.lit(qr.label), cell_col="label", k=5).collect()
        }
        hits_lsh1 += len(exact & lsh1)
        hits_default += len(exact & dflt)
        hits_lsh8 += len(exact & lsh8)
        hits_ivf += len(exact & ivf)
    throughput["ann_lsh1_recall_at_5"] = round(hits_lsh1 / (5 * len(qrows)), 3)
    throughput["ann_lsh_default_recall_at_5"] = round(hits_default / (5 * len(qrows)), 3)
    throughput["ann_lsh8_recall_at_5"] = round(hits_lsh8 / (5 * len(qrows)), 3)
    throughput["ann_ivf_recall_at_5"] = round(hits_ivf / (5 * len(qrows)), 3)
    # contract: the default ANN entry point must stay high-recall
    # (recorded into gate_failures; raised after the JSON emit)
    if throughput["ann_lsh_default_recall_at_5"] < 0.8:
        gate_failures.append(
            "default ANN recall regressed below 0.8: "
            f"{throughput['ann_lsh_default_recall_at_5']}"
        )

    # bits-per-table dial (the scale lever BENCH_NOTES documents:
    # widening bits halves every bucket — candidate cost drops ~2x
    # per bit — while adding tables only unions more 1/2^bits
    # slices). Measured alongside recall: cand_frac = fraction of
    # the corpus passing the multi-table bucket condition, i.e. what
    # the probe actually scans before the exact re-rank.
    from data_ingestion_spark.functions.similarity import multi_table_sign_condition

    sweep_q = qrows[:10]
    for bits, n_t in [(4, 4), (4, 6), (4, 8), (5, 4), (5, 6)]:
        hits_bt = 0
        cand_rows = 0
        for qr in sweep_q:
            qv = F.array(*[F.lit(float(x)) for x in qr.embedding])
            got = {
                r.vec_id
                for r in lsh_topk(emb, qv, k=5, bits=bits, n_tables=n_t).collect()
            }
            hits_bt += len(exact_by_qid[qr.vec_id] & got)
            cand_rows += emb.filter(
                multi_table_sign_condition(F.col("embedding"), qv, bits, n_t)
            ).count()
        throughput[f"ann_lsh_b{bits}t{n_t}_recall_at_5"] = round(
            hits_bt / (5 * len(sweep_q)), 3
        )
        throughput[f"ann_lsh_b{bits}t{n_t}_cand_frac"] = round(
            cand_rows / (n_emb * len(sweep_q)), 3
        )

    # AnnStore at-rest point at the widened bits: t x 2^bits partitions,
    # a probe reads t of them (partition-pruned scan, asserted in
    # tests/test_plans.py), so probe cost ~ t/2^bits of the store.
    import shutil
    import tempfile
    import time as _time

    from data_ingestion_spark.functions.similarity import AnnStore

    ann_dir = tempfile.mkdtemp(prefix="bench_ann_b4_")
    try:
        store = AnnStore(spark, ann_dir, bits=4, n_tables=4)
        store.write(emb)
        # one loop over the flip dial: f=0 is the home-bucket probe
        # (timed), f=1 is multi-probe — the no-extra-storage recall
        # dial, reading 8 of 64 partitions instead of 4
        probe_walls = []
        for flips, key in ((0, "ann_store_b4t4"), (1, "ann_store_b4t4f1")):
            hits_store = 0
            for qr in sweep_q:
                qlist = [float(x) for x in qr.embedding]
                t0 = _time.monotonic()
                got = {
                    r.vec_id
                    for r in store.probe(qlist, k=5, extra_flips=flips).collect()
                }
                if flips == 0:
                    probe_walls.append(_time.monotonic() - t0)
                hits_store += len(exact_by_qid[qr.vec_id] & got)
            throughput[f"{key}_recall_at_5"] = round(
                hits_store / (5 * len(sweep_q)), 3
            )
        throughput["ann_store_b4t4_partitions"] = 4 * (1 << 4)
        throughput["ann_store_b4t4_probe_frac"] = round(4 / (1 << 4), 4)
        throughput["ann_store_b4t4_probe_sec"] = round(
            sorted(probe_walls)[len(probe_walls) // 2], 3
        )
        throughput["ann_store_b4t4f1_partitions_read"] = 4 * 2
    finally:
        shutil.rmtree(ann_dir, ignore_errors=True)

    # the real IVF path: k-means cells with multi-probe (the label
    # column and 3-bit sign bucket above are weak on near-random
    # vectors; a fitted coarse quantizer with multi-probe is the
    # honest scale design — see SCALE.md). Both probe widths are the
    # recall/cost dial: 4/16 cells = 25% of the corpus scanned,
    # 6/16 = 37.5% for +0.14 recall (measured r05: 0.68 → 0.82;
    # spherical (pre-normalized) k-means measured identical on this
    # corpus — the synthetic vectors are near-unit-norm already).
    from data_ingestion_spark.functions.similarity import (
        kmeans_ivf_build,
        kmeans_ivf_search,
    )

    model, assigned = kmeans_ivf_build(emb, n_cells=16)
    assigned = assigned.cache()
    hits_km = {4: 0, 6: 0}
    for qr in qrows:
        qv = F.array(*[F.lit(float(x)) for x in qr.embedding])
        exact = {r.vec_id for r in brute_force_topk(emb, qv, k=5).collect()}
        for n_probe in hits_km:
            km = {
                r.vec_id
                for r in kmeans_ivf_search(
                    assigned, model, list(qr.embedding), k=5, n_probe=n_probe
                ).collect()
            }
            hits_km[n_probe] += len(exact & km)
    for n_probe, hits in hits_km.items():
        throughput[f"ann_kmeans_ivf{n_probe}_recall_at_5"] = round(
            hits / (5 * len(qrows)), 3
        )
    assigned.unpersist()

    # IVF-PQ (r14, the third at-rest layout): tracked quality for the
    # compressed-codes path — same recall/cost dial as the kmeans IVF
    # rows above, but candidates come from ADC over m smallint codes
    # in partition-pruned cells with an exact raw re-rank
    import tempfile as _tf

    from data_ingestion_spark.functions.pq import write_ivfpq_store

    pq_dir = _tf.mkdtemp(prefix="bench_ivfpq_")
    shutil.rmtree(pq_dir, ignore_errors=True)
    try:
        t0 = time.perf_counter()
        pq_store = write_ivfpq_store(
            emb.select("vec_id", "embedding"), pq_dir, n_cells=16, m=8
        )
        throughput["ann_ivfpq_build_sec"] = round(time.perf_counter() - t0, 3)
        hits_pq = {4: 0, 8: 0}
        for qr in qrows:
            qv = F.array(*[F.lit(float(x)) for x in qr.embedding])
            exact = {r.vec_id for r in brute_force_topk(emb, qv, k=5).collect()}
            for n_probe in hits_pq:
                got = {
                    r.vec_id
                    for r in pq_store.probe(
                        list(qr.embedding), k=5, n_probe=n_probe, keep=64
                    ).collect()
                }
                hits_pq[n_probe] += len(exact & got)
        for n_probe, hits in hits_pq.items():
            throughput[f"ann_ivfpq{n_probe}_recall_at_5"] = round(
                hits / (5 * len(qrows)), 3
            )
    finally:
        shutil.rmtree(pq_dir, ignore_errors=True)
    emb.unpersist()

    # at-rest lexical index (r11): build once UNTIMED, then measure
    # the per-batch serving cost against the inline from-corpus path —
    # the bench evidence that a query batch over the materialized
    # index is query-side-only work (no corpus tokenize/shuffle)
    import tempfile

    from data_ingestion_spark.functions.similarity import (
        bm25_rank_batch,
        bm25_rank_batch_indexed,
        build_postings_index,
    )

    docs_bm = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    q_rows = [(1, "spark vector"), (2, "customer merge order"), (3, "table join group")]
    qdf = spark.createDataFrame(q_rows, "query_id int, query_text string")
    idx_dir = tempfile.mkdtemp(prefix="bench_bm25_idx_")
    try:
        t0 = time.perf_counter()
        build_postings_index(docs_bm, idx_dir)
        throughput["bm25_index_build_sec"] = round(time.perf_counter() - t0, 3)
        walls = {"indexed": [], "inline": []}
        for _ in range(3):
            t0 = time.perf_counter()
            bm25_rank_batch_indexed(spark, qdf, idx_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            walls["indexed"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            bm25_rank_batch(qdf, docs_bm).write.format("noop").mode(
                "overwrite"
            ).save()
            walls["inline"].append(time.perf_counter() - t0)
        throughput["bm25_batch_indexed_sec"] = round(sorted(walls["indexed"])[1], 3)
        throughput["bm25_batch_inline_sec"] = round(sorted(walls["inline"])[1], 3)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # BASELINE.md ceiling, enforced not eyeballed: every headline
    # query (incl. the iterative CC ops and the e2e plan) must stay
    # under 10 s at the bench SF. Worst observed at sf0.1 is ~3.7 s
    # (dedup_clusters_star), so this trips only on a real regression.
    # Checked AFTER the JSON emit (a transient spike — bench noise is
    # ±15%, and pipeline_ingest_e2e once spiked 5.7× from contention —
    # must not discard the whole run's measurements) and raised as a
    # RuntimeError, not assert, so `python -O` still enforces it.
    gate_failures.extend(
        f"headline query over the 10 s BASELINE ceiling: {n} = {t} s"
        for n, t in timings.items()
        if t >= 10.0
    )

    # END-of-run probe (r18): the start probe cannot see a hypervisor
    # window closing MID-run (r18 measured identical code swinging 3×
    # between bench sections minutes apart). One reading, no retries —
    # it annotates, it does not gate; times nothing in the suite.
    host_probe_end = _host_probe()

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "timing": "median_of_3_interleaved",
                "queries": timings,
                "headline_v2": timings_v2,
                "headline_v2_total": round(sum(timings_v2.values()), 3),
                "headline_v2_build": timings_v2b,
                "headline_v2_serve": timings_v2s,
                "throughput": throughput,
                "sf": sf_val,
                "gates_ok": not gate_failures,
                "host_probe": host_probe,
                "host_probe_end": host_probe_end,
                "load_avg_start": load_avg_start,
                "contended": contended,
                "multicore_throttled": multicore_throttled,
            }
        )
    )
    spark.stop()
    if gate_failures:
        raise RuntimeError("bench gate failures: " + "; ".join(gate_failures))


if __name__ == "__main__":
    main()
