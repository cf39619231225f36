"""Vector / dedup / text-analysis query registrations.

Continues the registry in ``queries.py`` with the similarity-search,
deduplication, text-analysis and multimodal operators — the reference's
query side (ingestion-pipeline-website-local.py) plus the north-star
LLM-pipeline extensions. Oracle parity notes:

- md5 is the cross-engine hash everywhere (bit-identical in Spark and
  DuckDB; xxhash64 seeds differ between engines).
- cosine scores: both sides accumulate in float64 (Spark: explicit
  double cast in the higher-order aggregate; DuckDB: vectors cast to
  DOUBLE[] before list_cosine_similarity), rounded to 6dp pre-compare.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .functions import dedup as DD
from .functions import multimodal as MM
from .functions import similarity as SIM
from .functions import textops as T
from .queries import _d, _t, q

# =====================================================================
# similarity search (T8 / O2; reference query side Q:143-176)
# =====================================================================

_COS = (
    "round(list_cosine_similarity("
    "list_transform(e.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(q.qv, x -> CAST(x AS DOUBLE))), 6)"
)


@q(
    "similarity_topk",
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
    f"SELECT e.vec_id, {_COS} AS score FROM embeddings e, q WHERE e.vec_id <> 0 "
    "ORDER BY score DESC, e.vec_id LIMIT 5",
)
def similarity_topk(spark, sf_dir):
    """T8: brute-force cosine top-k (k=5, the reference's
    ``with_near_vector(...).with_limit(5)``,
    ingestion-pipeline-website-local.py:167-176). Plans as
    TakeOrderedAndProject — no global sort, no collect."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cand = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qv))
    return SIM.brute_force_topk(cand, F.col("qv"), k=5)


def _sign_bucket_sql(col: str, table: int, bits: int = 3) -> str:
    """DuckDB twin of SIM.table_sign_bucket — same components, same
    weights, so the SQL predicate and the Spark predicate are the same
    function of the data by construction."""
    return " + ".join(
        f"(CASE WHEN {col}[{table * bits + i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )


def _multi_table_sql(e_col: str, q_col: str, bits: int = 3, n_tables: int = 6) -> str:
    return " OR ".join(
        f"(({_sign_bucket_sql(e_col, t, bits)}) = ({_sign_bucket_sql(q_col, t, bits)}))"
        for t in range(n_tables)
    )


@q(
    "similarity_topk_lsh",
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
    "SELECT e.vec_id, "
    "round(list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(q.qv, x -> CAST(x AS DOUBLE))), 6) AS score "
    "FROM embeddings e, q WHERE e.vec_id <> 0 AND ("
    + _multi_table_sql("e.embedding", "q.qv", bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    + ") ORDER BY score DESC, e.vec_id LIMIT 5",
)
def similarity_topk_lsh(spark, sf_dir):
    """T8 scale path, DEFAULT configuration: multi-table sign-LSH
    (6 tables x 3 bits, measured recall@5 = 0.84 — the single-table
    probe's 0.36 is not an acceptable default) + exact re-rank. At
    100 TB each table's bucket is a partition-prunable storage key;
    candidates are the union of 6 bucket scans."""
    e = _t(spark, sf_dir, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cand = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qrow))
    cand = cand.filter(
        SIM.multi_table_sign_condition(F.col("embedding"), F.col("qv"), bits=3)
    )
    return SIM.brute_force_topk(cand, F.col("qv"), k=5)


@q(
    "ann_store_probe",
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
    "SELECT e.vec_id, "
    "round(list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(q.qv, x -> CAST(x AS DOUBLE))), 6) AS score "
    "FROM embeddings e, q WHERE e.vec_id <> 0 AND ("
    + _multi_table_sql("e.embedding", "q.qv", bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    + ") ORDER BY score DESC, e.vec_id LIMIT 5",
)
def ann_store_probe(spark, sf_dir):
    """T8 at rest: the AnnStore index — vectors exploded into
    (table, bucket) partition keys at write, probe = partition-pruned
    scan of one bucket per table + exact re-rank (pruning asserted in
    tests/test_plans.py). Same candidate set as the in-flight
    multi-table predicate, so similarity_topk_lsh's oracle applies
    verbatim. The store is (re)written at setup under the Spark
    warehouse dir — in production it's written once and probed many
    times; the write is the indexing cost, the probe is the query."""
    import tempfile

    e = _t(spark, sf_dir, "embeddings")
    qhead = e.filter(F.col("vec_id") == 0).select("embedding").head()
    if qhead is None:
        # Empty corpus (or missing query row): no query vector exists,
        # so the probe degrades to an empty result with the probe's
        # schema instead of an opaque NoneType crash — the contract
        # every registry query honors on an empty input partition
        # (tests/test_operators.py::test_registry_empty_input_contract).
        return spark.createDataFrame([], "vec_id bigint, score double")
    qv = [float(x) for x in qhead[0]]
    # NOT cleaned up here: the returned DataFrame lazily scans the
    # store when the caller collects it (tmp dirs are per-process and
    # tiny at DQ scale)
    path = tempfile.mkdtemp(prefix="dq_ann_store_")
    store = SIM.AnnStore(spark, path, bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    store.write(e.filter(F.col("vec_id") != 0).select("vec_id", "embedding"))
    return store.probe(qv, k=5)


@q(
    "ann_store_filtered_probe",
    "WITH q AS (SELECT embedding AS qv, label AS ql FROM embeddings WHERE vec_id = 0) "
    "SELECT e.vec_id, "
    "round(list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(q.qv, x -> CAST(x AS DOUBLE))), 6) AS score "
    "FROM embeddings e, q WHERE e.vec_id <> 0 AND e.label = q.ql AND ("
    + _multi_table_sql("e.embedding", "q.qv", bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    + ") ORDER BY score DESC, e.vec_id LIMIT 5",
)
def ann_store_filtered_probe(spark, sf_dir):
    """FILTERED vector search from the at-rest store (r12; the
    Weaviate `where`-filter + ES knn-filter shape the reference's
    query side exposes): metadata columns ride every pointer copy
    (`write(metadata_cols=('label',))`), so a probe filters
    candidates INSIDE the pruned partitions — post-filter semantics,
    top-k among bucket-near candidates passing the predicate, no
    extra scan. The oracle is the multi-table LSH candidate set ∩
    the label predicate + exact cosine top-5 — certifying that
    filtering happens on the candidate set, not after the top-k
    cut (a post-top-k filter would return fewer/different rows)."""
    import hashlib
    import os
    import tempfile

    e = _t(spark, sf_dir, "embeddings")
    qhead = e.filter(F.col("vec_id") == 0).select("embedding", "label").head()
    if qhead is None:
        return spark.createDataFrame([], "vec_id bigint, score double")
    qv = [float(x) for x in qhead[0]]
    ql = qhead[1]
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"ann_filtered_{tag}")
    store = SIM.AnnStore(spark, path, bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    store.write(
        e.filter(F.col("vec_id") != 0).select("vec_id", "embedding", "label"),
        metadata_cols=("label",),
    )
    return store.probe(qv, k=5, where=F.col("label") == ql)


@q(
    "ann_probe_batch",
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings "
    "WHERE vec_id IN (0, 1, 2)), "
    "c AS (SELECT q.query_id, e.vec_id, "
    "round(list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(q.qv, x -> CAST(x AS DOUBLE))), 6) AS score "
    "FROM embeddings e, q WHERE e.vec_id > 2 AND ("
    + _multi_table_sql("e.embedding", "q.qv", bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    + ")) SELECT query_id, vec_id, score, rank FROM ("
    "SELECT query_id, vec_id, score, CAST(row_number() OVER ("
    "PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rank "
    "FROM c) WHERE rank <= 5",
)
def ann_probe_batch(spark, sf_dir):
    """BATCH vector serving from the at-rest store (r12 verdict #2,
    the ANN mirror of rank_bm25_indexed): a (query_id, qvec) TABLE —
    three query vectors here — probes the AnnStore in ONE plan.
    Buckets are derived per query ENGINE-side, the union of probed
    (table, bucket) pairs becomes one literal partition filter
    (bounded by n_tables × 2^bits regardless of batch size), a
    broadcast join fans pruned candidates out to their queries, and
    one window ranks exact cosine per query. The oracle is the
    per-query multi-table LSH candidate set + exact top-5 with rank —
    i.e. N independent ``ann_store_probe`` answers — so the driver
    verifies the single-plan batch equals the per-query loop the
    reference's query utility runs (Q:167–176)."""
    import hashlib
    import os
    import tempfile

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") <= 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    if queries.head() is None:
        return spark.createDataFrame(
            [], "query_id bigint, vec_id bigint, score double, rank int"
        )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"ann_batch_{tag}")
    store = SIM.AnnStore(spark, path, bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    store.write(e.filter(F.col("vec_id") > 2).select("vec_id", "embedding"))
    return store.probe_batch(queries, k=5)


@q(
    "ann_probe_batch_quantized",
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings "
    "WHERE vec_id IN (0, 1, 2)), "
    "corpus AS ("
    "SELECT vec_id, embedding FROM embeddings WHERE vec_id > 2 "
    "UNION ALL "
    "SELECT vec_id + 10000 AS vec_id, "
    "list_transform(embedding, x -> -x) AS embedding "
    "FROM embeddings WHERE vec_id BETWEEN 3 AND 5), "
    "c AS (SELECT q.query_id, e.vec_id, "
    "round(list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(q.qv, x -> CAST(x AS DOUBLE))), 6) AS score "
    "FROM corpus e, q WHERE ("
    + _multi_table_sql("e.embedding", "q.qv", bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    + ")) SELECT query_id, vec_id, score, rank FROM ("
    "SELECT query_id, vec_id, score, CAST(row_number() OVER ("
    "PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rank "
    "FROM c) WHERE rank <= 5",
)
def ann_probe_batch_quantized(spark, sf_dir):
    """The last cell of the vector-serving matrix ({single, batch} ×
    {raw, SQ8} × {monolithic, LSM}): a (query_id, qvec) TABLE probes
    the QUANTIZED versioned store — stale base segment (every 5th
    vector negated) + corrected quantized delta segment carrying its
    own SQ8 bounds plus three new ids — in ONE plan: engine-side
    bucket derivation, pruned code-partition scans per segment,
    last-wins id shadowing, exact re-score from each candidate's own
    segment's raw sidecar, one global window per query. Exact
    re-score makes the batch answer EQUAL per-query LSH candidates +
    exact top-5 over the TRUE merged corpus — one oracle certifies
    upsert, quantization, shadowing, and batch serving together."""
    import hashlib
    import os
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") <= 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    if queries.head() is None:
        return spark.createDataFrame(
            [], "query_id bigint, vec_id bigint, score double, rank int"
        )
    base = e.filter(F.col("vec_id") > 2).select("vec_id", "embedding")
    stale = base.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 5 == 0, F.transform("embedding", lambda x: -x)
        ).otherwise(F.col("embedding")),
    )
    delta = base.filter(F.col("vec_id") % 5 == 0).unionByName(
        base.filter(F.col("vec_id").between(3, 5)).select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"ann_bq_root_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    SIM.write_ann_store_versioned(
        stale, root, quantized=True, bits=3, n_tables=SIM.DEFAULT_LSH_TABLES
    )
    return SIM.upsert_ann_store_versioned(delta, root).probe_batch_quantized(
        queries, k=5
    )


@q(
    "ann_store_upsert",
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
    "corpus AS ("
    "SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0 "
    "UNION ALL "
    "SELECT vec_id + 10000 AS vec_id, "
    "list_transform(embedding, x -> -x) AS embedding "
    "FROM embeddings WHERE vec_id BETWEEN 1 AND 3) "
    "SELECT e.vec_id, "
    "round(list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(q.qv, x -> CAST(x AS DOUBLE))), 6) AS score "
    "FROM corpus e, q WHERE ("
    + _multi_table_sql("e.embedding", "q.qv", bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    + ") ORDER BY score DESC, e.vec_id LIMIT 5",
)
def ann_store_upsert(spark, sf_dir):
    """Incremental vector-index upsert, O(delta) LSM path (r12
    verdict #1): build the versioned at-rest LSH store over a STALE
    vector generation (every 5th embedding NEGATED — negation flips
    every sign bucket, so a failed replacement provably leaves
    candidates in wrong partitions AND wrong scores), then
    ``upsert_ann_store_versioned`` folds the corrected 20% PLUS
    three brand-new vectors (ids +10000, negated copies of vec_id
    1–3) in as a DELTA SEGMENT — the old pointer copies are never
    rewritten or read; the probe serves the union of segments with
    last-wins id shadowing. The oracle is the from-scratch
    multi-table LSH probe over the TRUE merged corpus, so the driver
    verifies segment-upsert ≡ rebuild (replacement across all
    n_tables pointer copies, insertion, bucket assignment) end to
    end."""
    import hashlib
    import os
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")
    qhead = e.filter(F.col("vec_id") == 0).select("embedding").head()
    if qhead is None:
        return spark.createDataFrame([], "vec_id bigint, score double")
    qv = [float(x) for x in qhead[0]]
    base = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    stale = base.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 5 == 0, F.transform("embedding", lambda x: -x)
        ).otherwise(F.col("embedding")),
    )
    delta = base.filter(F.col("vec_id") % 5 == 0).unionByName(
        base.filter(F.col("vec_id").between(1, 3)).select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"ann_upsert_root_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    SIM.write_ann_store_versioned(
        stale, root, bits=3, n_tables=SIM.DEFAULT_LSH_TABLES
    )
    return SIM.upsert_ann_store_versioned(delta, root).probe(qv, k=5)


@q(
    "ann_store_quantized",
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
    "corpus AS ("
    "SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0 "
    "UNION ALL "
    "SELECT vec_id + 10000 AS vec_id, "
    "list_transform(embedding, x -> -x) AS embedding "
    "FROM embeddings WHERE vec_id BETWEEN 1 AND 3) "
    "SELECT e.vec_id, "
    "round(list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(q.qv, x -> CAST(x AS DOUBLE))), 6) AS score "
    "FROM corpus e, q WHERE ("
    + _multi_table_sql("e.embedding", "q.qv", bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    + ") ORDER BY score DESC, e.vec_id LIMIT 5",
)
def ann_store_quantized(spark, sf_dir):
    """SQ8-quantized at-rest vectors WITH O(delta) upsert (r11
    verdict #4 + r12 verdict #6): the n_tables-duplicated store holds
    int8 codes (4× fewer vector bytes per probed partition), raw
    floats live ONCE in an id-hash-partitioned sidecar for exact
    re-scoring — and since r13 the QUANTIZED store is maintainable:
    the versioned base segment is built over a STALE generation
    (every 5th vector negated), then ``upsert_ann_store_versioned``
    folds the corrected 20% plus three new ids in as a quantized
    DELTA SEGMENT carrying its OWN SQ8 bounds (the stale negated
    base and the delta quantize against different ranges — per-
    segment sidecar bounds, no global re-quantization, base codes
    untouched). Buckets are assigned from the RAW floats before
    encoding and the re-score is exact from each segment's raw
    sidecar, so the probe EQUALS an unquantized probe over the TRUE
    merged corpus — the oracle (LSH candidates + exact top-5, the
    ``ann_store_upsert`` shape) verifies encode→segment→shadow→
    decode-per-segment→re-rank end to end. The approx
    ``prefilter_m`` dial under bounds drift is pinned in pytest."""
    import hashlib
    import os
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")
    qhead = e.filter(F.col("vec_id") == 0).select("embedding").head()
    if qhead is None:
        return spark.createDataFrame([], "vec_id bigint, score double")
    qv = [float(x) for x in qhead[0]]
    base = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    stale = base.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 5 == 0, F.transform("embedding", lambda x: -x)
        ).otherwise(F.col("embedding")),
    )
    delta = base.filter(F.col("vec_id") % 5 == 0).unionByName(
        base.filter(F.col("vec_id").between(1, 3)).select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"ann_sq8_root_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    SIM.write_ann_store_versioned(
        stale, root, quantized=True, bits=3, n_tables=SIM.DEFAULT_LSH_TABLES
    )
    return SIM.upsert_ann_store_versioned(delta, root).probe_quantized(qv, k=5)


_DRIFT_COS = (
    "round((1 - list_cosine_similarity("
    "list_transform(old_v, x -> CAST(x AS DOUBLE)), "
    "list_transform(new_v, x -> CAST(x AS DOUBLE)))) * 1000000.0)"
)


#: the drift fixture's expected report — shared verbatim by the LSH
#: and IVF-PQ drift DQs (same cohorts, same (1-cos)*1e6 rounding)
_DRIFT_ORACLE_SQL = (
    "WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0), "
    "rep5 AS (SELECT vec_id, list_transform(embedding, x -> -x) AS old_v, "
    "embedding AS new_v FROM base WHERE vec_id % 5 = 0), "
    "rep7 AS (SELECT vec_id, embedding AS old_v, "
    "[-embedding[1]] || list_slice(embedding, 2, len(embedding)) AS new_v "
    "FROM base WHERE vec_id % 7 = 0 AND vec_id % 5 <> 0), "
    "rep AS (SELECT * FROM rep5 UNION ALL SELECT * FROM rep7) "
    "SELECT vec_id, 'replaced' AS status, "
    f"CAST({_DRIFT_COS} AS BIGINT) AS drift_micros FROM rep "
    "UNION ALL "
    "SELECT vec_id + 10000 AS vec_id, 'added' AS status, "
    "CAST(NULL AS BIGINT) AS drift_micros FROM base WHERE vec_id BETWEEN 1 AND 3"
)


@q(
    "ann_version_drift",
    _DRIFT_ORACLE_SQL,
)
def ann_version_drift(spark, sf_dir):
    """Embedding-drift report between ANN store versions (r13
    W-series; functions/similarity.py::ann_version_drift) — the
    maintenance-observability query a continuously re-embedded store
    pages on: WHAT did the last upsert change and by how much. The
    fixture folds a delta with all four change classes into a stale
    versioned store: 20% true re-embeds over a negated stale
    generation (sign flip ⇒ drift exactly 2e6 micros), a
    first-component sign-flip perturbation for the %7 cohort (real
    intermediate cosine drift), BYTE-IDENTICAL re-upserts for the
    %11 cohort (must classify unchanged and be DROPPED — the report
    is delta-bounded, not store-bounded), and three brand-new ids
    (status added, NULL drift). Versions diff via one full-outer
    join of their logical vector sets (one table slice per segment —
    no pointer-copy duplication); the oracle reconstructs old/new
    per cohort and the same (1−cos)·1e6 rounding."""
    import hashlib
    import os
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")
    if e.head() is None:
        return spark.createDataFrame(
            [], "vec_id bigint, status string, drift_micros bigint"
        )
    base = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    stale = base.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 5 == 0, F.transform("embedding", lambda x: -x)
        ).otherwise(F.col("embedding")),
    )
    flip_first = F.transform(
        "embedding", lambda x, i: F.when(i == F.lit(0), -x).otherwise(x)
    )
    delta = (
        base.filter(F.col("vec_id") % 5 == 0)
        .unionByName(
            base.filter((F.col("vec_id") % 7 == 0) & (F.col("vec_id") % 5 != 0))
            .withColumn("embedding", flip_first)
        )
        .unionByName(
            base.filter(
                (F.col("vec_id") % 11 == 0)
                & (F.col("vec_id") % 5 != 0)
                & (F.col("vec_id") % 7 != 0)
            )
        )
        .unionByName(
            base.filter(F.col("vec_id").between(1, 3)).select(
                (F.col("vec_id") + 10000).alias("vec_id"),
                F.transform("embedding", lambda x: -x).alias("embedding"),
            )
        )
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"ann_drift_root_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    SIM.write_ann_store_versioned(
        stale, root, bits=3, n_tables=SIM.DEFAULT_LSH_TABLES
    )
    SIM.upsert_ann_store_versioned(delta, root)
    return SIM.ann_version_drift(spark, root)


@q(
    "ann_ivf_search",
    "WITH q AS (SELECT embedding AS qv, label AS ql FROM embeddings WHERE vec_id = 0) "
    f"SELECT e.vec_id, {_COS} AS score FROM embeddings e, q "
    "WHERE e.vec_id <> 0 AND e.label = q.ql ORDER BY score DESC, e.vec_id LIMIT 5",
)
def ann_ivf_search(spark, sf_dir):
    """T8 scale path: IVF probe — coarse cell assignment (the synthetic
    ``label`` stands in for a k-means centroid id), search only the
    query's cell, exact re-rank."""
    e = _t(spark, sf_dir, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("label").alias("ql")
    )
    cand = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qrow))
    return SIM.ivf_search(cand, F.col("qv"), F.col("ql"), cell_col="label", k=5)


@q(
    "embed_near_dup",
    "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
    "round(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS score "
    "FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id "
    "WHERE round(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) >= 0.3",
)
def embed_near_dup(spark, sf_dir):
    """T10: embedding-cosine near-duplicate pairs, blocked by the
    coarse cell (label) so the join is equi-keyed, never quadratic.
    Threshold 0.3: the synthetic embeddings are near-random, so a
    production-style 0.8 cut returns ZERO pairs at driver scale — a
    hash match on an empty result verifies nothing. 0.3 yields ~100
    pairs at sf0.01, so the check exercises the score arithmetic and
    the blocked join for real."""
    e = _t(spark, sf_dir, "embeddings")
    return SIM.pairwise_near_dup(e, block_col="label", threshold=0.3)


@q(
    "rag_context_assemble",
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
    f"topk AS (SELECT e.vec_id, {_COS} AS score FROM embeddings e, q "
    "WHERE e.vec_id <> 0 ORDER BY score DESC, e.vec_id LIMIT 5) "
    "SELECT 'Context:' || chr(10) || string_agg(CAST(vec_id AS VARCHAR), chr(10) "
    "ORDER BY score DESC, vec_id) AS context FROM topk",
)
def rag_context_assemble(spark, sf_dir):
    """T9: RAG context assembly — top-5 retrieve then ordered concat
    (ingestion-pipeline-website-local.py:192-198); the LLM call itself
    is an external service, out of correctness scope."""
    topk = similarity_topk(spark, sf_dir)
    ordered = topk.select(
        F.struct((-F.col("score")).alias("neg"), F.col("vec_id").alias("vec_id")).alias("s")
    )
    return ordered.agg(
        F.concat(
            F.lit("Context:\n"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s.vec_id.cast("string")
                ),
                "\n",
            ),
        ).alias("context")
    )


# =====================================================================
# deduplication (T10; north-star mandate)
# =====================================================================

@q(
    "dedup_exact",
    "SELECT md5(text) AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id, "
    "CAST(count(*) AS BIGINT) AS n_copies FROM documents GROUP BY fp",
)
def dedup_exact(spark, sf_dir):
    """T10 exact: md5 fingerprint → groupBy; one shuffle on the hash
    (X11; ``dropDuplicates`` is sugar over the same plan)."""
    return DD.exact_dedup_groups(_d(spark, sf_dir), "text", "doc_id")


def _duck_shingles(text: str = "text") -> str:
    """DuckDB expression for distinct word 3-shingles of ``text``."""
    w = f"string_split({text}, ' ')"
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len({w}) - 2, 1)), "
        f"i -> array_to_string(list_slice({w}, i, i + 2), ' ')))"
    )


def _minhash_oracle() -> str:
    mh = ", ".join(
        "list_aggregate(list_transform(shingles, s -> md5('mh|" + str(i) + "|' || s)), 'min')"
        f" AS mh_{i}"
        for i in range(8)
    )
    bands = " UNION ALL ".join(
        f"SELECT id, {b} AS band, md5(mh_{2*b} || '|' || mh_{2*b+1}) AS band_hash FROM sigs"
        for b in range(4)
    )
    return (
        f"WITH sh AS (SELECT doc_id AS id, {_duck_shingles()} AS shingles FROM documents), "
        f"sigs AS (SELECT id, {mh} FROM sh), bands AS ({bands}) "
        "SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.band AS band FROM bands a "
        "JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id"
    )


@q("dedup_minhash", _minhash_oracle())
def dedup_minhash(spark, sf_dir):
    """T10 near-dup: MinHash (8 hashes, md5-seeded) + banded LSH
    (4 bands × 2) candidate pairs — candidate join is equi on the band
    hash, cost Σ bucket², never n²."""
    return DD.minhash_lsh_candidates(
        _d(spark, sf_dir), "text", "doc_id", shingle_n=3, num_hashes=8,
        band_size=2,
    )


def _simhash_oracle() -> str:
    hexhi = "('8','9','a','b','c','d','e','f')"
    votes = ", ".join(
        f"sum(CASE WHEN substr(md5('sh' || word), {j + 1}, 1) IN {hexhi} "
        f"THEN 1 ELSE -1 END) AS v{j}"
        for j in range(16)
    )
    bits = ", ".join(f"CASE WHEN v{j} > 0 THEN '1' ELSE '0' END" for j in range(16))
    return (
        "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents), "
        f"v AS (SELECT doc_id, {votes} FROM w GROUP BY doc_id) "
        f"SELECT doc_id, concat({bits}) AS simhash FROM v"
    )


@q("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark, sf_dir):
    """T10 near-dup: 16-bit SimHash signatures (hamming-comparable;
    near-dups differ in ≤ a few bits). Token votes via md5 top-bit —
    portable across engines."""
    d = _d(spark, sf_dir)
    return d.select("doc_id", DD.simhash16(F.col("text")).alias("simhash"))


@q(
    "dedup_ngram_jaccard",
    f"WITH sh AS (SELECT doc_id AS id, {_duck_shingles()} AS sh FROM documents), "
    "sizes AS (SELECT id, len(sh) AS sz FROM sh), "
    "inv AS (SELECT id, unnest(sh) AS s FROM sh), "
    "inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter FROM inv a "
    "JOIN inv b ON a.s = b.s AND a.id < b.id GROUP BY a.id, b.id) "
    "SELECT id_a, id_b, round(n_inter / (sa.sz + sb.sz - n_inter), 6) AS jaccard "
    "FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b "
    "WHERE round(n_inter / (sa.sz + sb.sz - n_inter), 6) >= 0.15",
)
def dedup_ngram_jaccard(spark, sf_dir):
    """T10 near-dup: word-3-gram Jaccard via inverted-index self-join
    (pairs only exist where ≥1 shingle is shared). The oracle twin runs
    uncapped (``max_doc_freq=None``) because the DuckDB SQL counts
    exact intersections; production callers keep the default hot-
    shingle cap (DEFAULT_MAX_DOC_FREQ)."""
    return DD.ngram_jaccard_pairs(
        _d(spark, sf_dir), "text", "doc_id", shingle_n=3, threshold=0.15,
        max_doc_freq=None,
    )


@q(
    "dedup_ngram_jaccard_capped",
    f"WITH sh AS (SELECT doc_id AS id, {_duck_shingles()} AS sh FROM documents), "
    "sizes AS (SELECT id, len(sh) AS sz FROM sh), "
    "inv AS (SELECT id, unnest(sh) AS s FROM sh), "
    "kept AS (SELECT inv.id, inv.s FROM inv WHERE inv.s IN "
    "(SELECT s FROM inv GROUP BY s HAVING count(*) <= 5)), "
    "inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter FROM kept a "
    "JOIN kept b ON a.s = b.s AND a.id < b.id GROUP BY a.id, b.id) "
    "SELECT id_a, id_b, round(n_inter / (sa.sz + sb.sz - n_inter), 6) AS jaccard "
    "FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b "
    "WHERE round(n_inter / (sa.sz + sb.sz - n_inter), 6) >= 0.15",
)
def dedup_ngram_jaccard_capped(spark, sf_dir):
    """T10 near-dup, the SCALE-SAFE plan: same inverted-index Jaccard
    as ``dedup_ngram_jaccard`` but with the hot-shingle doc-frequency
    cap active — the production default (a shingle in b docs expands to
    b²/2 pairs, so uncapped stopword shingles are quadratic in corpus
    size). The oracle applies the identical doc-frequency filter on the
    DuckDB inverted index (``HAVING count(*) <= cap``); union sizes
    stay uncapped on both sides, exactly like the Spark plan. The cap
    here is 5 (not DEFAULT_MAX_DOC_FREQ=256) so the guard path
    actually *bites* at driver scale — sf0.01's max shingle doc-freq
    is 7; a 256 cap would verify nothing about the drop path."""
    return DD.ngram_jaccard_pairs(
        _d(spark, sf_dir), "text", "doc_id", shingle_n=3, threshold=0.15,
        max_doc_freq=5,
    )


@q(
    "doc_fingerprint",
    "SELECT doc_id, list_aggregate(list_transform("
    "generate_series(1, greatest(length(text) - 7, 1), 4), "
    "i -> md5(substr(text, CAST(i AS INTEGER), 8))), 'min') AS fingerprint FROM documents",
)
def doc_fingerprint(spark, sf_dir):
    """Text-analysis mandate: winnowing-style rolling fingerprint —
    min over md5 of every 4th 8-char gram."""
    return T.with_fingerprint(
        _d(spark, sf_dir), "text", k=8, step=4
    ).select("doc_id", "fingerprint")


# =====================================================================
# text analysis (north-star mandate)
# =====================================================================

def _lang_score(lang: str) -> str:
    return " + ".join(
        f"len(regexp_extract_all(text, '\\b{w}\\b'))" for w in T.LANG_MARKERS[lang]
    )


def _lang_id_oracle() -> str:
    langs = list(T.LANG_MARKERS)
    score_cols = ", ".join(
        f"CAST({_lang_score(lg)} AS INTEGER) AS score_{lg}" for lg in langs
    )
    gmax = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lg} = {gmax} THEN '{lg}'" for lg in langs
    ) + " END"
    arr = "list_sort([" + ", ".join(f"score_{lg}" for lg in langs) + "])"
    n = len(langs)
    sel = ", ".join(f"score_{lg}" for lg in langs)
    return (
        f"WITH s AS (SELECT doc_id, {score_cols} FROM documents) "
        f"SELECT doc_id, {sel}, {case} AS predicted_lang, "
        f"CAST({arr}[{n}] - {arr}[{n - 1}] AS INTEGER) AS margin FROM s"
    )


@q("lang_id_ngram", _lang_id_oracle())
def lang_id_ngram(spark, sf_dir):
    """Language-ID: stopword-marker voting over six languages
    (deterministic n-gram heuristic; ties break by LANG_MARKERS
    order en > es > de > fr > pt > it) plus the confidence margin
    (best − runner-up) per-language curation thresholds on."""
    out = T.lang_id_scores(_d(spark, sf_dir), "text")
    return out.select(
        "doc_id",
        *[F.col(f"score_{lg}").cast("int").alias(f"score_{lg}") for lg in T.LANG_MARKERS],
        "predicted_lang",
        F.col("margin").cast("int").alias("margin"),
    )


def _tb_detected_oracle() -> str:
    from .functions.textops import TOKEN_PATTERN

    langs = list(T.LANG_MARKERS)
    score_cols = ", ".join(
        f"CAST({_lang_score(lg)} AS INTEGER) AS score_{lg}" for lg in langs
    )
    gmax = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lg} = {gmax} THEN '{lg}'" for lg in langs
    ) + " END"
    arr = "list_sort([" + ", ".join(f"score_{lg}" for lg in langs) + "])"
    n = len(langs)
    ntok = f"len(regexp_extract_all(text, '{TOKEN_PATTERN}'))"
    return (
        f"WITH s AS (SELECT doc_id, text, {score_cols} FROM documents), "
        f"det AS (SELECT doc_id, text, {case} AS detected_lang, "
        f"{arr}[{n}] - {arr}[{n - 1}] AS margin FROM s), "
        "conf AS (SELECT doc_id, text, detected_lang FROM det WHERE margin >= 1), "
        f"b AS (SELECT doc_id, detected_lang, {ntok} AS n_tokens, "
        f"sum({ntok}) OVER (PARTITION BY detected_lang ORDER BY "
        "md5('tbl|' || CAST(doc_id AS VARCHAR)), doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens "
        "FROM conf) "
        "SELECT doc_id, detected_lang, CAST(n_tokens AS INTEGER) AS n_tokens, "
        "CAST(cum_tokens AS BIGINT) AS cum_tokens FROM b WHERE cum_tokens <= 2000"
    )


@q("token_budget_detected_lang", _tb_detected_oracle())
def token_budget_detected_lang(spark, sf_dir):
    """The composition the lang-ID margin exists for: token-budget
    curation per DETECTED language (not the fixture label) — detect
    via stopword-marker argmax, keep only confident rows (margin ≥ 1
    — priority-decided ties are not detections), then fill a 2k-token
    budget per detected language in deterministic hash order. This
    is the crawl-scale shape: real corpora carry no language column,
    so the budgeting key must come from the detector. One shuffle
    (the per-language window); detection itself is scan-side JVM
    regexp arithmetic."""
    from pyspark.sql import Window

    from .functions import corpus as C
    from .functions.textops import token_count

    d = _d(spark, sf_dir).select("doc_id", "text")
    det = T.lang_id_scores(d, "text").filter(F.col("margin") >= 1).select(
        "doc_id", "text", F.col("predicted_lang").alias("detected_lang")
    )
    w = (
        Window.partitionBy("detected_lang")
        .orderBy(C.hash_key(F.col("doc_id"), "tbl"), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        det.withColumn("n_tokens", token_count(F.col("text")).cast("int"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .filter(F.col("cum_tokens") <= 2000)
        .select("doc_id", "detected_lang", "n_tokens", "cum_tokens")
    )


@q(
    "text_quality_score",
    "WITH b AS (SELECT doc_id, length(text) AS n_chars0, "
    "len(string_split(text, ' ')) AS n_words, "
    "len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct, "
    "len(regexp_extract_all(text, '\\b(the|a|of|and|to|in)\\b')) AS n_stop FROM documents), "
    "r AS (SELECT doc_id, CAST(n_words AS INTEGER) AS n_words, "
    "round(n_stop / greatest(n_words, 1), 6) AS stop_ratio, "
    "round(n_punct / greatest(n_chars0, 1), 6) AS punct_ratio FROM b) "
    "SELECT doc_id, n_words, stop_ratio, punct_ratio, "
    "round(least(1.0, n_words / 100.0) * 0.5 + least(1.0, stop_ratio * 5.0) * 0.4 + "
    "(1.0 - least(1.0, punct_ratio * 10.0)) * 0.1, 6) AS quality_score FROM r",
)
def text_quality_score(spark, sf_dir):
    """Quality scoring: length/punctuation/stopword blend, rounded 6dp."""
    out = T.text_quality(_d(spark, sf_dir), "text")
    return out.select(
        "doc_id",
        F.col("n_words").cast("int").alias("n_words"),
        "stop_ratio",
        "punct_ratio",
        "quality_score",
    )


# =====================================================================
# multimodal (T11; north-star mandate)
# =====================================================================

@q(
    "multimodal_binary_meta",
    "SELECT doc_id, 'text/plain' AS mime, "
    "CAST(octet_length(encode(text)) AS INTEGER) AS byte_len, "
    "sha256(text) AS payload_sha FROM documents",
)
def multimodal_binary_meta(spark, sf_dir):
    """T11: opaque binary payload column + typed metadata — the
    schema/plumbing layer for image/audio/video columns (decode UDFs
    are stubbed per functions/multimodal.py; pypdf is installed-but-
    unused in the reference, ingestion-pipeline.py:50)."""
    d = MM.attach_binary(_d(spark, sf_dir), "text")
    return d.select(
        "doc_id",
        "mime",
        F.octet_length("payload").alias("byte_len"),
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
    )


@q(
    "multimodal_header_decode",
    "SELECT doc_id, "
    "CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format, "
    "CAST(1 + n_chars % 512 AS INTEGER) AS width, "
    "CAST(1 + doc_id % 512 AS INTEGER) AS height, "
    "CAST(8 AS INTEGER) AS bit_depth FROM documents",
)
def multimodal_header_decode(spark, sf_dir):
    """T11, un-stubbed: REAL image decode without media libraries.
    Each doc is encoded as actual PNG (IHDR, real CRCs) or JPEG
    (SOI/APP0/SOF0) header bytes with dims derived from doc columns,
    then parsed back by the pure-struct header parser
    (multimodal.parse_image_header) in an Arrow-batched stage. The
    oracle recomputes the expected dims arithmetically — so the DQ
    verifies the full binary encode→decode roundtrip, not the
    arithmetic."""
    d = _d(spark, sf_dir).select("doc_id", "n_chars")
    media = MM.attach_synthetic_image(d)
    return MM.decode_image_headers(media)


@q(
    "multimodal_pixel_decode",
    "SELECT doc_id, "
    "CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' "
    "WHEN 2 THEN 'gif' ELSE 'jpeg' END AS format, "
    "CAST(1 + n_chars % 13 AS INTEGER) AS width, "
    "CAST(1 + doc_id % 11 AS INTEGER) AS height, "
    "CAST(CASE WHEN doc_id % 4 IN (0, 3) THEN 1 ELSE 3 END AS INTEGER) AS n_channels, "
    "CAST((1 + n_chars % 13) * (1 + doc_id % 11) * "
    "(CASE WHEN doc_id % 4 IN (0, 3) THEN 1 ELSE 3 END) AS INTEGER) AS pixel_bytes, "
    "CAST(CASE WHEN doc_id % 4 = 3 THEN "
    "(1 + n_chars % 13) * (1 + doc_id % 11) * (doc_id % 200 + n_chars % 50) "
    "ELSE (CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END) * ("
    "(1 + n_chars % 13) * (1 + doc_id % 11) * (doc_id % 200) "
    "+ (1 + doc_id % 11) * (((n_chars % 13) * (1 + n_chars % 13)) // 2) "
    "+ (1 + n_chars % 13) * (((doc_id % 11) * (1 + doc_id % 11)) // 2)"
    ") END AS BIGINT) AS pixel_sum FROM documents",
)
def multimodal_pixel_decode(spark, sf_dir):
    """T11, pixel-level and fully un-stubbed (r08 — no
    container-limited gap remains): each doc is encoded as a REAL
    compressed image — PNG (zlib IDAT, Paeth-filtered), BMP (BI_RGB
    rows), GIF (LZW + palette), or baseline JPEG (Huffman + DCT),
    rotating on doc_id%4. PNG/BMP/GIF carry the known gradient
    v(x,y) = doc_id%200 + x + y (< 256 by construction); JPEG carries
    a CONSTANT gray v = doc_id%200 + n_chars%50 — constant blocks are
    DC-only, so the lossy DCT pipeline round-trips bit-exactly and
    stays oracle-predictable. The stdlib+numpy codecs in
    functions/pixels.py + functions/jpeg.py decode the payloads back
    to raw pixels in an Arrow-batched stage (multimodal.decode_pixels)
    and the query emits each image's decoded byte count and pixel SUM.
    The oracle predicts both in closed form (gradient: sum = ch *
    (w*h*base + h*w(w-1)/2 + w*h(h-1)/2); jpeg: w*h*v) — arithmetic
    an encoder/decoder pair that was wrong-but-consistent could not
    satisfy, so the DQ certifies true inflate/unfilter/LZW/Huffman/
    IDCT decode, not a round-trip tautology."""
    d = _d(spark, sf_dir).select("doc_id", "n_chars")
    decoded = MM.decode_pixels(MM.attach_gradient_image(d))
    return decoded.select(
        "doc_id",
        "format",
        "width",
        "height",
        "n_channels",
        F.octet_length("pixels").alias("pixel_bytes"),
        MM.pixel_sum(F.col("pixels")).alias("pixel_sum"),
    )


@q(
    "dedup_image_phash",
    "WITH docs AS (SELECT doc_id, doc_id // 3 AS g, doc_id % 3 AS v "
    "FROM documents WHERE doc_id < 300), "
    "cells AS (SELECT x.range AS x, y.range AS y FROM range(8) x, range(8) y), "
    "bits AS (SELECT d.doc_id, c.x, c.y, "
    "CASE WHEN ((d.g*37 + (c.x+1)*17 + c.y*53) % 256) > "
    "(CASE WHEN d.v = 2 AND c.x = 0 AND c.y = 0 "
    "THEN (d.g*37 + 128) % 256 "
    "ELSE (d.g*37 + c.x*17 + c.y*53) % 256 END) "
    "THEN 1 ELSE 0 END AS bit "
    "FROM docs d, cells c), "
    "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
    "CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS INTEGER) AS hamming "
    "FROM bits a JOIN bits b ON a.x = b.x AND a.y = b.y AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id) "
    "SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 2",
)
def dedup_image_phash(spark, sf_dir):
    """Image near-dup dedup — the multimodal leg of the dedup mandate
    (r13 verdict #3). Docs come in groups of three REAL images sharing
    one 9×8 luma pattern: a grayscale PNG, a 24-bit BMP re-encode
    (identical pixels, different container), and an 18×16 GIF 2×
    nearest-neighbor UPSCALE with one grid cell perturbed (a resized
    near-dup at hamming ≤ 1, not an exact dup). The engine runs the
    full pipeline: stdlib decode (zlib/Paeth, BI_RGB, LZW) →
    grid-luma downsample (one fused Arrow stage — full-res pixels
    never leave the decoding task) → 64-bit dHash packed JVM-side →
    PIGEONHOLE-banded candidate join on (band_idx, band_bits) →
    exact bit_count(XOR) verify at max_hamming=2.

    The oracle recomputes the dHash BITS arithmetically from the
    pattern generator and takes the NAIVE all-pairs hamming filter —
    so a hash match certifies (a) decode+luma+hash against
    independently-derived content (a wrong-but-consistent codec pair
    cannot satisfy it), and (b) banding completeness: every pair
    within budget survives, including the accidental cross-group
    near-collisions the linear pattern family produces. Engine cost
    is Σ band-bucket², never n² — the moved_content_pairs discipline
    on 64-bit BIGINT fingerprints."""
    d = _d(spark, sf_dir).select("doc_id").filter(F.col("doc_id") < 300)
    # checkpoint the (bounded: 300 x 16-byte) hash table before the
    # banded self-join: hamming64_pairs references its input on BOTH
    # join sides, and the rename-project above each side defeats
    # exchange reuse — without this the full stdlib PNG/BMP/GIF
    # decode + luma + dHash pipeline runs TWICE (r17 guide §2.4;
    # the production analogue is fingerprints served at rest, the
    # band-store discipline).
    hashes = MM.image_dhash64(MM.attach_pattern_image(d)).localCheckpoint()
    return DD.hamming64_pairs(hashes, "dhash", max_hamming=2)


_SIGN_BUCKET_SQL = (
    "(CASE WHEN {e}.embedding[1] >= 0 THEN 1 ELSE 0 END) + "
    "(CASE WHEN {e}.embedding[2] >= 0 THEN 2 ELSE 0 END) + "
    "(CASE WHEN {e}.embedding[3] >= 0 THEN 4 ELSE 0 END)"
)


@q(
    "embed_near_dup_lsh",
    "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
    "round(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS score "
    "FROM embeddings a JOIN embeddings b ON "
    + _SIGN_BUCKET_SQL.format(e="a")
    + " = "
    + _SIGN_BUCKET_SQL.format(e="b")
    + " AND a.vec_id < b.vec_id "
    "WHERE round(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) >= 0.5",
)
def embed_near_dup_lsh(spark, sf_dir):
    """T10 label-free variant: near-dup pairs blocked by the sign-
    bucket LSH key instead of a precomputed cell — the shape you use
    when no clustering exists yet. Same equi-join guarantee (cost
    Σ bucket², never n²); recall rises with multiple rotated bucket
    seeds at scale."""
    e = _t(spark, sf_dir, "embeddings")
    blocked = e.withColumn("bucket", SIM.sign_bucket(F.col("embedding"), 3))
    return SIM.pairwise_near_dup(blocked, block_col="bucket", threshold=0.5)


def _dup_clusters_oracle() -> str:
    # reuse the minhash-candidate CTEs, then transitive closure via
    # recursive CTE: cluster_id = min reachable id (incl. self)
    mh = _minhash_oracle()
    body = mh[len("WITH ") :]
    return (
        "WITH RECURSIVE "
        + body.replace(
            "SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.band AS band FROM bands a "
            "JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id",
            "",
        ).rstrip()
        + ", cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM bands a "
        "JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id), "
        "edges AS (SELECT id_a AS a, id_b AS b FROM cand "
        "UNION SELECT id_b, id_a FROM cand), "
        "reach(a, b) AS (SELECT a, b FROM edges "
        "UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a) "
        "SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS cluster_id "
        "FROM reach GROUP BY a"
    )


@q("dedup_clusters", _dup_clusters_oracle())
def dedup_clusters(spark, sf_dir):
    """T10 capstone: candidate pairs → connected components → cluster
    labels (keep min-id per cluster, drop the rest). Spark side:
    iterative min-label propagation (functions.dedup.dup_clusters);
    oracle: transitive closure via recursive CTE. This is the step
    that turns pairwise similarity into an actionable dedup decision
    at corpus scale."""
    cands = DD.minhash_lsh_candidates(
        _d(spark, sf_dir), "text", "doc_id", shingle_n=3, num_hashes=8, band_size=2
    )
    return DD.dup_clusters(cands)


@q("dedup_clusters_star", _dup_clusters_oracle())
def dedup_clusters_star(spark, sf_dir):
    """T10, diameter-safe variant: same candidate pairs, clustered by
    alternating large-star/small-star contraction
    (functions.dedup.dup_clusters_star) — O(log² n) rounds regardless
    of component diameter, vs min-label propagation's O(diameter).
    Identical output contract (cluster_id = component min), so the
    recursive-CTE oracle is shared with ``dedup_clusters`` verbatim;
    a green row on both proves the two CC implementations agree with
    the transitive closure AND each other."""
    cands = DD.minhash_lsh_candidates(
        _d(spark, sf_dir), "text", "doc_id", shingle_n=3, num_hashes=8, band_size=2
    )
    return DD.dup_clusters_star(cands)


@q(
    "dedup_decision",
    _dup_clusters_oracle().replace(
        "SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS cluster_id "
        "FROM reach GROUP BY a",
        ", comp AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id "
        "FROM reach GROUP BY a) "
        "SELECT d.doc_id, CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id, "
        "CAST(CASE WHEN c.cluster_id IS NULL OR c.cluster_id = d.doc_id "
        "THEN 1 ELSE 0 END AS INTEGER) AS keep "
        "FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id",
    ),
)
def dedup_decision(spark, sf_dir):
    """T10 end state: the actionable verdict for EVERY document —
    cluster label + keep/drop flag (keep = canonical min-id member, or
    untouched by any candidate pair). This is the row-level filter an
    LLM-data pipeline applies before training-set export."""
    docs = _d(spark, sf_dir).select("doc_id")
    clusters = dedup_clusters(spark, sf_dir)
    return docs.join(clusters, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).cast("bigint").alias("cluster_id"),
        F.when(
            F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("keep"),
    )

@q(
    "dedup_decision_quality",
    _dup_clusters_oracle().replace(
        "SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS cluster_id "
        "FROM reach GROUP BY a",
        ", comp AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id "
        "FROM reach GROUP BY a), "
        "j AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, "
        "d.n_chars FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id), "
        "r AS (SELECT doc_id, cluster_id, row_number() OVER ("
        "PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rk FROM j) "
        "SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id, "
        "CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS INTEGER) AS keep FROM r",
    ),
)
def dedup_decision_quality(spark, sf_dir):
    """T10 survivor policy upgrade: keep the HIGHEST-QUALITY member of
    each duplicate cluster (here: longest text, doc_id tie-break)
    instead of ``dedup_decision``'s min-id convention — the policy
    real pipelines want, since near-dup clusters often mix a full
    document with truncated or boilerplate-wrapped copies. Same
    cluster labels (shared oracle CTEs); the keep rule becomes a
    row_number over (cluster, quality desc). One extra window over
    the already-clustered rows — no new corpus-sized shuffle beyond
    the cluster key."""
    docs = _d(spark, sf_dir).select("doc_id", "n_chars")
    clusters = dedup_clusters(spark, sf_dir)
    j = docs.join(clusters, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id")).cast("bigint")
    )
    w = Window.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        j.withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            (F.col("rk") == 1).cast("int").alias("keep"),
        )
    )


@q(
    "dedup_repeated_passages",
    "WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN "
    "'Subscribe to our newsletter for updates. All rights reserved worldwide. ' "
    "|| text ELSE text END AS text FROM documents), "
    "pos AS (SELECT doc_id, text, "
    "unnest(generate_series(0, length(text) - 64, 16)) AS p "
    "FROM aug WHERE length(text) >= 64), "
    "sh AS (SELECT doc_id, md5(substr(text, p + 1, 64)) AS h FROM pos), "
    "dup AS (SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) > 1) "
    "SELECT doc_id, CAST(count(*) AS INTEGER) AS n_shared_spans "
    "FROM sh JOIN dup USING (h) GROUP BY doc_id",
)
def dedup_repeated_passages(spark, sf_dir):
    """T10 family, sub-document granularity: exact-substring repeat
    detection (Lee et al. 2022's dedup mandate — doc-level dedup
    misses recurring boilerplate INSIDE distinct docs). A shared
    73-char boilerplate prefix is planted on doc_id%4==0 rows (fixture
    construction mirrored in the oracle, same pattern as
    crawl_frontier), then DD.repeated_passage_spans finds every
    64-char strided shingle appearing in >1 distinct doc and counts
    shared spans per doc. Organic cross-doc repeats in the synthetic
    corpus surface alongside the planted ones (docs report 1 or 2
    spans), so the hash certifies the real grouping, not just the
    fixture. All JVM expressions: explode → md5 → hash groupBy →
    join-back → id count."""
    d = _d(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(
                    "Subscribe to our newsletter for updates. "
                    "All rights reserved worldwide. "
                ),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return DD.repeated_passage_spans(d, "text", "doc_id", k=64, stride=16)


_BM25_TERMS = ["spark", "vector", "customer", "merge"]


def _bm25_oracle() -> str:
    tfs = " ".join(
        f"CAST(len(list_filter(ws, x -> x = '{t}')) AS DOUBLE) AS tf{i},"
        for i, t in enumerate(_BM25_TERMS)
    ).rstrip(",")
    dfs = " ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1.0 ELSE 0.0 END) AS df{i},"
        for i in range(len(_BM25_TERMS))
    ).rstrip(",")
    comps = " ".join(
        f"+ ln((n - df{i} + 0.5)/(df{i} + 0.5) + 1.0) * (tf{i} * 2.2) "
        f"/ (tf{i} + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) "
        for i in range(len(_BM25_TERMS))
    )
    return (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS ws FROM documents), "
        f"d AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, {tfs} FROM w), "
        f"s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl, {dfs} FROM d) "
        f"SELECT doc_id, round(0.0 {comps}, 6) AS score "
        "FROM d, s ORDER BY score DESC, doc_id LIMIT 10"
    )


@q("rank_bm25", _bm25_oracle())
def rank_bm25(spark, sf_dir):
    """Lexical retrieval (BM25) — the full-text half of hybrid RAG
    search (the reference's Weaviate backend ships hybrid search;
    similarity_topk is the vector half, this is the term half,
    engine-side). Four query terms scored Robertson-style with the
    +1 idf form; per-doc tf/dl are array expressions over the scan
    (no inverted-index shuffle for a literal query), corpus stats
    (N, avgdl, df per term) reduce to ONE broadcast row, and the
    top-10 plans as TakeOrderedAndProject. Scores round to 6dp
    BEFORE ordering (id tiebreak) so the ranking is bit-identical
    across engines."""
    from .functions.similarity import bm25_rank

    d = _d(spark, sf_dir).select("doc_id", "text")
    return bm25_rank(d, _BM25_TERMS, topk=10)


#: batch-BM25 fixture queries: raw text with case/punctuation mess so
#: the query-side tokenizer (lowercase, split, dedupe) is exercised;
#: the oracle VALUES list below carries the EXPECTED normalized terms
_BM25_BATCH_QUERIES = [
    (1, "Spark VECTOR!"),
    (2, "customer, merge & order"),
    (3, "Table JOIN group"),
]
_BM25_BATCH_QTERMS = [
    (1, "spark"), (1, "vector"),
    (2, "customer"), (2, "merge"), (2, "order"),
    (3, "table"), (3, "join"), (3, "group"),
]


def _bm25_batch_ctes(final_name: str = "lexr", corpus_where: str = "") -> str:
    """The batch-BM25 ranking pipeline as reusable CTE fragments (no
    leading WITH, no final SELECT): ``final_name`` exposes
    (query_id, doc_id, score, rank) unbounded — callers cut rank.
    ``corpus_where`` restricts the corpus (e.g. the row-delete DQ's
    surviving set) — stats/df are computed over the restriction, the
    from-scratch-build semantics."""
    values = ", ".join(f"({i}, '{t}')" for i, t in _BM25_BATCH_QTERMS)
    where = f" WHERE {corpus_where}" if corpus_where else ""
    return (
        f"q(query_id, term) AS (VALUES {values}), "
        "w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        f"lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS ws FROM documents{where}), "
        "base AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, ws FROM w), "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM base), "
        "post AS (SELECT doc_id, dl, unnest(ws) AS term FROM base), "
        "tfs AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf, "
        "min(dl) AS dl FROM post GROUP BY doc_id, term), "
        "matched AS (SELECT t.*, CAST(count(*) OVER (PARTITION BY term) AS DOUBLE) AS df "
        "FROM tfs t WHERE term IN (SELECT DISTINCT term FROM q)), "
        "contrib AS (SELECT q.query_id, m.doc_id, "
        "CAST(round(ln((s.n - m.df + 0.5) / (m.df + 0.5) + 1.0) "
        "* (m.tf * 2.2) / (m.tf + 1.2 * (1.0 - 0.75 + 0.75 * m.dl / s.avgdl)) "
        "* 1000000.0) AS BIGINT) AS micro "
        "FROM matched m JOIN q ON q.term = m.term, stats s), "
        "sc AS (SELECT query_id, doc_id, sum(micro) AS micros "
        "FROM contrib GROUP BY query_id, doc_id), "
        f"{final_name} AS (SELECT query_id, doc_id, micros / 1000000.0 AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY micros DESC, doc_id) AS INTEGER) AS rank FROM sc)"
    )


def _bm25_batch_oracle() -> str:
    return (
        "WITH " + _bm25_batch_ctes()
        + " SELECT query_id, doc_id, score, rank FROM lexr WHERE rank <= 10"
    )


@q("rank_bm25_batch", _bm25_batch_oracle())
def rank_bm25_batch(spark, sf_dir):
    """BM25 for a query TABLE — the inverted-index form and the
    production eval/serving shape (one plan scores all queries;
    rank_bm25's literal form runs one job per query). Three fixture
    queries with case/punctuation mess go through the real query
    tokenizer; docs explode into (term, doc) postings, postings
    semi-join the broadcast term set, document frequency is a
    windowed count over the term partition, and per-(query, doc)
    scores sum EXACT integer micros (per-term contributions rounded
    to 1e-6 before the sum) so aggregation order cannot flap the
    hash. Oracle replicates the whole pipeline in DuckDB from the
    expected normalized terms. Top-10 per query, micros-desc with
    doc_id tiebreak."""
    from .functions.similarity import bm25_rank_batch

    d = _d(spark, sf_dir).select("doc_id", "text")
    qdf = spark.createDataFrame(_BM25_BATCH_QUERIES, "query_id int, query_text string")
    return bm25_rank_batch(qdf, d, topk=10)


@q("rank_bm25_indexed", _bm25_batch_oracle())
def rank_bm25_indexed(spark, sf_dir):
    """Batch BM25 against the AT-REST inverted index — index once,
    serve many batches (r10 verdict #2; the lexical mirror of
    AnnStore's at-rest vector layout). ``build_postings_index``
    writes term-bucketed postings + per-term df + corpus stats as
    parquet; the query path reads ONLY the bucket partitions the
    query terms hash into (partition pruning asserted in
    tests/test_plans.py) and funnels into the same integer-micro
    scoring tail as rank_bm25_batch, so the DuckDB twin — the full
    from-corpus pipeline — verifies the at-rest scores equal the
    inline ones. Same fixture queries/tokenizer mess as
    rank_bm25_batch; top-10 per query, micros-desc, doc_id tiebreak."""
    import hashlib
    import os
    import tempfile

    from .functions.similarity import bm25_rank_batch_indexed, build_postings_index

    d = _d(spark, sf_dir).select("doc_id", "text")
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    idx = os.path.join(tempfile.gettempdir(), f"bm25_index_{tag}")
    # rebuild each call (overwrite): the DQ certifies build + serve
    # end-to-end; a production caller builds once and serves many
    build_postings_index(d, idx)
    qdf = spark.createDataFrame(_BM25_BATCH_QUERIES, "query_id int, query_text string")
    return bm25_rank_batch_indexed(spark, qdf, idx, topk=10)


#: boolean fixture clauses: (query_id, must, should, must_not) —
#: q1 mixes all three, q2 is pure-should (minimum_should_match=1),
#: q3 is a 2-term conjunction with no scoring extras
_BOOL_QUERIES = [
    (1, ["spark"], ["vector", "merge"], ["customer"]),
    (2, [], ["table", "join"], ["spark"]),
    (3, ["customer", "order"], [], []),
]


def _bool_oracle() -> str:
    """Independent set-algebra oracle for bool_search_indexed: the
    eligibility algebra (ALL must via count-distinct, ANY should for
    pure-should queries, NOT EXISTS for must_not) is expressed
    directly over the tokenized corpus — the Spark side computes it
    from posting-list semi/anti-joins against the at-rest index, so
    a hash match proves the index-side algebra equals the
    from-corpus definition."""
    vm = ", ".join(f"({i}, '{t}')" for i, m, _, _ in _BOOL_QUERIES for t in m)
    vs = ", ".join(f"({i}, '{t}')" for i, _, s, _ in _BOOL_QUERIES for t in s)
    vn = ", ".join(f"({i}, '{t}')" for i, _, _, x in _BOOL_QUERIES for t in x)
    vq = ", ".join(f"({i}, {len(m)})" for i, m, _, _ in _BOOL_QUERIES)
    return (
        f"WITH qm(query_id, term) AS (VALUES {vm}), "
        f"qs(query_id, term) AS (VALUES {vs}), "
        f"qn(query_id, term) AS (VALUES {vn}), "
        f"qi(query_id, n_must) AS (VALUES {vq}), "
        "w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS ws FROM documents), "
        "base AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, ws FROM w), "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM base), "
        "post AS (SELECT doc_id, dl, unnest(ws) AS term FROM base), "
        "tfs AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf, "
        "min(dl) AS dl FROM post GROUP BY doc_id, term), "
        "mh AS (SELECT q.query_id, t.doc_id, count(DISTINCT t.term) AS mc "
        "FROM tfs t JOIN qm q ON q.term = t.term GROUP BY q.query_id, t.doc_id), "
        "sh AS (SELECT DISTINCT q.query_id, t.doc_id FROM tfs t "
        "JOIN qs q ON q.term = t.term), "
        "nh AS (SELECT DISTINCT q.query_id, t.doc_id FROM tfs t "
        "JOIN qn q ON q.term = t.term), "
        "elig0 AS (SELECT m.query_id, m.doc_id FROM mh m JOIN qi i "
        "ON i.query_id = m.query_id WHERE i.n_must > 0 AND m.mc = i.n_must "
        "UNION SELECT s.query_id, s.doc_id FROM sh s JOIN qi i "
        "ON i.query_id = s.query_id WHERE i.n_must = 0), "
        "elig AS (SELECT * FROM elig0 e WHERE NOT EXISTS (SELECT 1 FROM nh n "
        "WHERE n.query_id = e.query_id AND n.doc_id = e.doc_id)), "
        "qsc AS (SELECT query_id, term FROM qm UNION "
        "SELECT query_id, term FROM qs), "
        "matched AS (SELECT t.*, CAST(count(*) OVER (PARTITION BY term) AS DOUBLE) "
        "AS df FROM tfs t WHERE term IN (SELECT DISTINCT term FROM qsc)), "
        "contrib AS (SELECT q.query_id, m.doc_id, "
        "CAST(round(ln((s.n - m.df + 0.5) / (m.df + 0.5) + 1.0) "
        "* (m.tf * 2.2) / (m.tf + 1.2 * (1.0 - 0.75 + 0.75 * m.dl / s.avgdl)) "
        "* 1000000.0) AS BIGINT) AS micro "
        "FROM matched m JOIN qsc q ON q.term = m.term, stats s), "
        "sc AS (SELECT c.query_id, c.doc_id, sum(micro) AS micros FROM contrib c "
        "JOIN elig e ON e.query_id = c.query_id AND e.doc_id = c.doc_id "
        "GROUP BY c.query_id, c.doc_id) "
        "SELECT query_id, doc_id, micros / 1000000.0 AS score, rank FROM ("
        "SELECT query_id, doc_id, micros, CAST(row_number() OVER ("
        "PARTITION BY query_id ORDER BY micros DESC, doc_id) AS INTEGER) AS rank "
        "FROM sc) WHERE rank <= 10"
    )


@q("bool_search_indexed", _bool_oracle())
def bool_search_indexed(spark, sf_dir):
    """ES-style boolean retrieval from the at-rest index (r11
    verdict #6, the reference backend's ``bool`` shape W:121–129):
    must/should/must_not clause arrays per query — ALL must terms
    via a count-distinct semi-join of posting lists, must_not via an
    anti-join, pure-should queries need >= 1 should match — feeding
    the shared integer-micro BM25 tail over (must ∪ should).
    Partition pruning covers the union of every clause's term
    buckets. The oracle computes the same algebra INDEPENDENTLY over
    the tokenized corpus (EXISTS/NOT-EXISTS set algebra), so a hash
    match proves posting-list semi/anti-joins ≡ the from-corpus
    boolean definition."""
    import hashlib
    import os
    import tempfile

    from .functions.similarity import bool_search_indexed as _bool
    from .functions.similarity import build_postings_index

    d = _d(spark, sf_dir).select("doc_id", "text")
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    idx = os.path.join(tempfile.gettempdir(), f"bool_index_{tag}")
    build_postings_index(d, idx)
    qdf = spark.createDataFrame(
        _BOOL_QUERIES,
        "query_id int, must array<string>, should array<string>, "
        "must_not array<string>",
    )
    return _bool(spark, qdf, idx, topk=10)


@q("rank_bm25_index_compacted", _bm25_batch_oracle())
def rank_bm25_index_compacted(spark, sf_dir):
    """Compaction + vacuum of the managed index root (r11 verdict
    #5): versioned build over a stale 80% → versioned upsert of the
    remaining 20% (leaving a dead version behind) → ``compact_index``
    (size-targeted rewrite, pointer commit, dead-version GC) → serve
    the standard query batch from the pointer. The oracle is the
    from-scratch full-corpus pipeline, so the driver verifies that
    OPTIMIZE+VACUUM moved bytes, never rows — and that the pointer
    resolution serves the compacted version."""
    import hashlib
    import os
    import shutil
    import tempfile

    from .functions.similarity import (
        bm25_rank_batch_indexed,
        build_postings_index_versioned,
        compact_index,
        index_current_path,
        upsert_postings_index_versioned,
    )

    d = _d(spark, sf_dir).select("doc_id", "text")
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"bm25_compact_root_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    build_postings_index_versioned(d.filter(F.col("doc_id") % 5 != 0), root)
    upsert_postings_index_versioned(d.filter(F.col("doc_id") % 5 == 0), root)
    compact_index(spark, root, retain=1)
    qdf = spark.createDataFrame(_BM25_BATCH_QUERIES, "query_id int, query_text string")
    return bm25_rank_batch_indexed(spark, qdf, index_current_path(root), topk=10)


@q("rank_bm25_index_upsert", _bm25_batch_oracle())
def rank_bm25_index_upsert(spark, sf_dir):
    """Incremental index maintenance, O(delta) LSM path (r12 verdict
    #1): build the versioned index over a STALE corpus generation
    (every 5th doc carries appended noise terms — including the
    fixture query terms, so a failed replacement provably corrupts
    df/tf/stats), then ``upsert_postings_index_versioned`` folds the
    corrected 20% in as a DELTA SEGMENT — the old postings are never
    rewritten or read; serving resolves last-wins across segments —
    and the query batch serves from the committed pointer. The
    oracle is the from-scratch full-corpus pipeline on the TRUE
    text — the driver therefore verifies segment-upsert ≡ rebuild
    (replacement shadowing, derived df, exact stats) end to end."""
    import hashlib
    import os
    import shutil
    import tempfile

    from .functions.similarity import (
        bm25_rank_batch_indexed,
        build_postings_index_versioned,
        index_current_path,
        upsert_postings_index_versioned,
    )

    d = _d(spark, sf_dir).select("doc_id", "text")
    stale = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" stale vector spark noise")),
        ).otherwise(F.col("text")),
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"bm25_upsert_root_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    build_postings_index_versioned(stale, root)
    upsert_postings_index_versioned(d.filter(F.col("doc_id") % 5 == 0), root)
    qdf = spark.createDataFrame(_BM25_BATCH_QUERIES, "query_id int, query_text string")
    return bm25_rank_batch_indexed(spark, qdf, index_current_path(root), topk=10)


@q(
    "index_delete_ids",
    "WITH "
    + _bm25_batch_ctes(corpus_where="doc_id % 7 <> 0")
    + " SELECT query_id, doc_id, score, rank FROM lexr WHERE rank <= 10",
)
def index_delete_ids(spark, sf_dir):
    """Row-level delete from the managed index (r13 verdict #2 —
    takedown/GDPR/robots-revocation; S10's collection-level delete,
    reference Q:119–136, can only hide a single doc by rewriting the
    collection): versioned build over a STALE generation → O(delta)
    upsert of the corrected 20% → ``delete_index_ids`` writes a
    TOMBSTONE-ONLY segment for every 7th doc (an id list with no data
    payload; last-wins shadowing hides every older copy, the reader
    never treats it as a data source) → the query batch serves from
    the pointer. The oracle is the from-scratch pipeline over the
    SURVIVING corpus — stats (n_docs/avgdl), derived df, and ranking
    must all reflect the deletion exactly, so a hash match certifies
    delete ≡ rebuild-without-the-rows across build+upsert+delete."""
    import hashlib
    import os
    import shutil
    import tempfile

    from .functions.similarity import (
        bm25_rank_batch_indexed,
        build_postings_index_versioned,
        delete_index_ids as _del,
        index_current_path,
        upsert_postings_index_versioned,
    )

    d = _d(spark, sf_dir).select("doc_id", "text")
    stale = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" stale vector spark noise")),
        ).otherwise(F.col("text")),
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"bm25_delete_root_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    build_postings_index_versioned(stale, root)
    upsert_postings_index_versioned(d.filter(F.col("doc_id") % 5 == 0), root)
    _del(d.filter(F.col("doc_id") % 7 == 0).select("doc_id"), root)
    qdf = spark.createDataFrame(_BM25_BATCH_QUERIES, "query_id int, query_text string")
    return bm25_rank_batch_indexed(spark, qdf, index_current_path(root), topk=10)


@q(
    "ann_delete_ids",
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
    "corpus AS ("
    "SELECT vec_id, embedding FROM embeddings "
    "WHERE vec_id <> 0 AND vec_id % 7 <> 0) "
    "SELECT e.vec_id, "
    "round(list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(q.qv, x -> CAST(x AS DOUBLE))), 6) AS score "
    "FROM corpus e, q WHERE ("
    + _multi_table_sql("e.embedding", "q.qv", bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    + ") ORDER BY score DESC, e.vec_id LIMIT 5",
)
def ann_delete_ids(spark, sf_dir):
    """Row-level delete from the managed ANN store (r13 verdict #2,
    vector half): versioned build over a STALE generation (every 5th
    embedding negated) → O(delta) upsert of the corrected 20% →
    ``delete_ann_ids`` tombstones every 7th vector (an ids/ sidecar
    with NO data dir; the shadow anti-joins hide its pointer copies
    in every table) → probe from the pointer. The oracle is the
    from-scratch LSH probe over the TRUE corpus minus the deleted
    ids, so the hash certifies delete ≡ rebuild-without-the-rows
    composed with the upsert's replacement shadowing — including
    that a tombstone over an id the delta ALSO replaced deletes the
    newest copy, not just the stale one."""
    import hashlib
    import os
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")
    qhead = e.filter(F.col("vec_id") == 0).select("embedding").head()
    if qhead is None:
        return spark.createDataFrame([], "vec_id bigint, score double")
    qv = [float(x) for x in qhead[0]]
    base = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    stale = base.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 5 == 0, F.transform("embedding", lambda x: -x)
        ).otherwise(F.col("embedding")),
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"ann_delete_root_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    SIM.write_ann_store_versioned(stale, root, bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    SIM.upsert_ann_store_versioned(base.filter(F.col("vec_id") % 5 == 0), root)
    return SIM.delete_ann_ids(
        base.filter(F.col("vec_id") % 7 == 0).select("vec_id"), root
    ).probe(qv, k=5)


_HYBRID_QTEXT = "spark vector customer merge"


def _hybrid_oracle() -> str:
    """DuckDB twin of hybrid vector+BM25 RRF. The embedding twin
    replicates embed_deterministic exactly (CAST('0x'||hex AS BIGINT)
    = Spark's conv(,16,10); same /max*2-1 order; REAL truncation) and
    every dot product is written as an explicit left-associated sum of
    double-cast products — the same fold order as Spark's
    F.aggregate, so the doubles are bit-identical by construction."""
    denom = "1152921504606846975.0"

    def comp(text_expr: str, i: int) -> str:
        return (
            f"CAST(CAST(CAST('0x' || substr(md5('emb|{i}|' || {text_expr}), 1, 15) "
            f"AS BIGINT) AS DOUBLE) / {denom} * 2.0 - 1.0 AS REAL)"
        )

    a_cols = " ".join(f"{comp('text', i)} AS a{i}," for i in range(8)).rstrip(",")
    q_cols = " ".join(
        f"{comp(repr(_HYBRID_QTEXT), i)} AS q{i}," for i in range(8)
    ).rstrip(",")
    dot_aq = "0.0 " + " ".join(
        f"+ CAST(a{i} AS DOUBLE) * CAST(q{i} AS DOUBLE)" for i in range(8)
    )
    dot_aa = "0.0 " + " ".join(
        f"+ CAST(a{i} AS DOUBLE) * CAST(a{i} AS DOUBLE)" for i in range(8)
    )
    dot_qq = "0.0 " + " ".join(
        f"+ CAST(q{i} AS DOUBLE) * CAST(q{i} AS DOUBLE)" for i in range(8)
    )
    # BM25 half (same fragments as _bm25_oracle, ranked to 20)
    tfs = " ".join(
        f"CAST(len(list_filter(ws, x -> x = '{t}')) AS DOUBLE) AS tf{i},"
        for i, t in enumerate(_BM25_TERMS)
    ).rstrip(",")
    dfs = " ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1.0 ELSE 0.0 END) AS df{i},"
        for i in range(len(_BM25_TERMS))
    ).rstrip(",")
    comps = " ".join(
        f"+ ln((n - df{i} + 0.5)/(df{i} + 0.5) + 1.0) * (tf{i} * 2.2) "
        f"/ (tf{i} + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) "
        for i in range(len(_BM25_TERMS))
    )
    return (
        f"WITH emb AS (SELECT doc_id, {a_cols} FROM documents), "
        f"qv AS (SELECT {q_cols}), "
        f"vs AS (SELECT doc_id, round(({dot_aq}) / "
        f"(sqrt({dot_aa}) * sqrt({dot_qq})), 6) AS score FROM emb, qv), "
        "fa AS (SELECT doc_id, rank FROM (SELECT doc_id, "
        "row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM vs) "
        "WHERE rank <= 20), "
        "w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), "
        "'[^a-z0-9]+'), x -> len(x) > 0) AS ws FROM documents), "
        f"d AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, {tfs} FROM w), "
        f"s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl, {dfs} FROM d), "
        f"ls AS (SELECT doc_id, round(0.0 {comps}, 6) AS score FROM d, s), "
        "fb AS (SELECT doc_id, rank FROM (SELECT doc_id, "
        "row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM ls) "
        "WHERE rank <= 20) "
        "SELECT coalesce(fa.doc_id, fb.doc_id) AS doc_id, "
        "round(coalesce(1.0/(60.0 + CAST(fa.rank AS DOUBLE)), 0.0) "
        "+ coalesce(1.0/(60.0 + CAST(fb.rank AS DOUBLE)), 0.0), 6) AS rrf_score "
        "FROM fa FULL OUTER JOIN fb ON fa.doc_id = fb.doc_id "
        "ORDER BY rrf_score DESC, doc_id LIMIT 10"
    )


@q("hybrid_rank_rrf", _hybrid_oracle())
def hybrid_rank_rrf(spark, sf_dir):
    """Hybrid retrieval capstone: vector top-20 (deterministic
    hash-projection embeddings, cosine to the embedded query text)
    and lexical top-20 (BM25 over the same query's terms), fused by
    reciprocal-rank fusion — the exact operation Weaviate/ES 'hybrid'
    mode runs, engine-side. Ranks come from 6dp-rounded scores with
    id tiebreaks on both retrievers, so the fusion input — and hence
    the fused list — is bit-identical across engines; the oracle
    replicates the embedding arithmetic (conv↔'0x' cast, REAL
    truncation) and the cosine fold order term by term. At scale
    each retriever does the heavy lifting it already does alone
    (TakeOrdered / broadcast-stats scan); the fusion is a full-outer
    join of two 20-row lists."""
    from pyspark.sql import Window

    from .functions.embedding import embed_deterministic
    from .functions.similarity import bm25_rank, cosine, rrf_fuse

    d = _d(spark, sf_dir).select("doc_id", "text")
    qv = embed_deterministic(F.lit(_HYBRID_QTEXT), 8)
    vec_top = (
        d.select(
            "doc_id",
            F.round(cosine(embed_deterministic(F.col("text"), 8), qv), 6).alias(
                "score"
            ),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )
    rank_w = Window.orderBy(F.col("score").desc(), "doc_id")
    vec_ranked = vec_top.withColumn("rank", F.row_number().over(rank_w))
    lex_ranked = bm25_rank(d, _BM25_TERMS, topk=20).withColumn(
        "rank", F.row_number().over(rank_w)
    )
    return rrf_fuse(vec_ranked, lex_ranked, "doc_id", topk=10)


def _hybrid_batch_ctes() -> str:
    """DuckDB twin of the BATCH hybrid as CTE fragments (no leading
    WITH, no final SELECT): the vector half replicates
    embed_deterministic + left-associated cosine per fixture query
    (the _hybrid_oracle machinery, one q-vector row per query); the
    lexical half is the batch-BM25 CTE pipeline; fusion is a
    two-key full outer. The final CTE ``hybr`` exposes
    (query_id, doc_id, rrf_score, rn) UNBOUNDED — callers cut rn."""
    denom = "1152921504606846975.0"

    def comp(text_expr: str, i: int) -> str:
        return (
            f"CAST(CAST(CAST('0x' || substr(md5('emb|{i}|' || {text_expr}), 1, 15) "
            f"AS BIGINT) AS DOUBLE) / {denom} * 2.0 - 1.0 AS REAL)"
        )

    a_cols = " ".join(f"{comp('text', i)} AS a{i}," for i in range(8)).rstrip(",")
    q_rows = " UNION ALL ".join(
        f"SELECT {qid} AS query_id, "
        + ", ".join(f"{comp(repr(qtext), i)} AS q{i}" for i in range(8))
        for qid, qtext in _BM25_BATCH_QUERIES
    )
    dot_aq = "0.0 " + " ".join(
        f"+ CAST(a{i} AS DOUBLE) * CAST(q{i} AS DOUBLE)" for i in range(8)
    )
    dot_aa = "0.0 " + " ".join(
        f"+ CAST(a{i} AS DOUBLE) * CAST(a{i} AS DOUBLE)" for i in range(8)
    )
    dot_qq = "0.0 " + " ".join(
        f"+ CAST(q{i} AS DOUBLE) * CAST(q{i} AS DOUBLE)" for i in range(8)
    )
    return (
        f"emb AS (SELECT doc_id, {a_cols} FROM documents), "
        f"qv AS ({q_rows}), "
        f"vs AS (SELECT qv.query_id, emb.doc_id, round(({dot_aq}) / "
        f"(sqrt({dot_aa}) * sqrt({dot_qq})), 6) AS score FROM emb, qv), "
        "fa AS (SELECT query_id, doc_id, rank FROM (SELECT query_id, doc_id, "
        "row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) "
        "AS rank FROM vs) WHERE rank <= 20), "
        + _bm25_batch_ctes()
        + ", fb AS (SELECT query_id, doc_id, rank FROM lexr WHERE rank <= 20), "
        "fused AS (SELECT coalesce(fa.query_id, fb.query_id) AS query_id, "
        "coalesce(fa.doc_id, fb.doc_id) AS doc_id, "
        "round(coalesce(1.0/(60.0 + CAST(fa.rank AS DOUBLE)), 0.0) "
        "+ coalesce(1.0/(60.0 + CAST(fb.rank AS DOUBLE)), 0.0), 6) AS rrf_score "
        "FROM fa FULL OUTER JOIN fb "
        "ON fa.query_id = fb.query_id AND fa.doc_id = fb.doc_id), "
        "hybr AS (SELECT query_id, doc_id, rrf_score, row_number() OVER ("
        "PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rn FROM fused)"
    )


def _hybrid_batch_oracle() -> str:
    return (
        "WITH " + _hybrid_batch_ctes()
        + " SELECT query_id, doc_id, rrf_score FROM hybr WHERE rn <= 10"
    )


@q("hybrid_rank_rrf_batch", _hybrid_batch_oracle())
def hybrid_rank_rrf_batch(spark, sf_dir):
    """The BATCH hybrid-retrieval capstone: N queries at once through
    BOTH retrievers in one plan — per-query vector top-20 (hash-
    projection embeddings, cosine to each embedded query text; the
    3-row query-vector table broadcasts into one scored pass over
    the corpus) and per-query lexical top-20 (the batch-BM25
    inverted-index pipeline), fused per query by grouped RRF. This
    is the production eval/serving shape: hybrid_rank_rrf answers
    one question, this answers the whole eval set. Ranks on both
    sides come from deterministically-ordered scores (6dp-rounded
    cosine, integer-micro BM25), so the fused rankings hash-match
    the DuckDB twin bit-exactly at both scales."""
    from pyspark.sql import Window

    from .functions.embedding import embed_deterministic
    from .functions.similarity import bm25_rank_batch, cosine, rrf_fuse

    d = _d(spark, sf_dir).select("doc_id", "text")
    qdf = spark.createDataFrame(_BM25_BATCH_QUERIES, "query_id int, query_text string")
    q_emb = qdf.select(
        "query_id", embed_deterministic(F.col("query_text"), 8).alias("qv")
    )
    docs_emb = d.select("doc_id", embed_deterministic(F.col("text"), 8).alias("dv"))
    scored = docs_emb.join(F.broadcast(q_emb)).select(
        "query_id",
        "doc_id",
        F.round(cosine(F.col("dv"), F.col("qv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    vec_ranked = (
        scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 20)
    )
    lex_ranked = bm25_rank_batch(qdf, d, topk=20)
    return rrf_fuse(
        vec_ranked, lex_ranked, "doc_id", topk=10, group_cols=("query_id",)
    )


#: the arithmetic relevance table shared by every eval DQ:
#: rel(q, d) ⇔ d % (7 + 3q) = 0, queries 1..3
_EVAL_QRELS_SQL = (
    "qr AS (SELECT q.qid AS query_id, d.doc_id FROM documents d, "
    "(VALUES (1), (2), (3)) q(qid) WHERE d.doc_id % (7 + q.qid * 3) = 0)"
)


def _eval_tail_sql() -> str:
    """The metric arithmetic as a SQL fragment over CTEs ``qr``
    (query_id, doc_id relevance pairs) and ``top`` (query_id,
    doc_id, rank) — shared by the BM25-eval and hybrid-eval oracles
    so the measurement definition cannot fork between them. Every
    per-hit term micros-rounded pre-sum; IDCG constants shared
    verbatim with the engine (functions/ranking_eval.py)."""
    from .functions.ranking_eval import _idcg_prefix_micros

    idcg_vals = ", ".join(
        f"({i + 1}, {v})" for i, v in enumerate(_idcg_prefix_micros(10))
    )
    return (
        "nrel AS (SELECT query_id, count(*) AS n_rel FROM qr GROUP BY query_id), "
        "h AS (SELECT t.query_id, CAST(round(1000000.0 / t.rank) AS BIGINT) AS rr, "
        "CAST(round(1000000.0 / log2(t.rank + 1.0)) AS BIGINT) AS gain "
        "FROM top t JOIN qr ON qr.query_id = t.query_id AND qr.doc_id = t.doc_id), "
        "pq AS (SELECT query_id, count(*) AS hits, max(rr) AS rr_micros, "
        "sum(gain) AS dcg FROM h GROUP BY query_id), "
        f"idcg(i, v) AS (VALUES {idcg_vals}) "
        "SELECT n.query_id, n.n_rel, CAST(coalesce(p.hits, 0) AS BIGINT) AS hits, "
        "CAST(coalesce(p.rr_micros, 0) AS BIGINT) AS rr_micros, "
        "CAST(round(coalesce(p.hits, 0) * 1000000.0 / n.n_rel) AS BIGINT) "
        "AS recall_k_micros, "
        "CAST(round(coalesce(p.dcg, 0) * 1000000.0 / i.v) AS BIGINT) "
        "AS ndcg_k_micros "
        "FROM nrel n LEFT JOIN pq p ON p.query_id = n.query_id "
        "JOIN idcg i ON i.i = least(n.n_rel, 10)"
    )


def _retrieval_eval_oracle() -> str:
    return (
        "WITH " + _bm25_batch_ctes("lexr") + ", "
        + _EVAL_QRELS_SQL + ", "
        "top AS (SELECT query_id, doc_id, rank FROM lexr WHERE rank <= 10), "
        + _eval_tail_sql()
    )


@q("retrieval_eval_metrics", _retrieval_eval_oracle())
def retrieval_eval_metrics(spark, sf_dir):
    """Retrieval eval layer (r11 D-series) — MRR / recall@10 /
    nDCG@10 of the batch-BM25 ranking against an arithmetic
    relevance table (rel(q, d) ⇔ d % (7+3q) = 0), computed
    IN-ENGINE by functions/ranking_eval.py: every per-hit float term
    micros-rounded BEFORE the per-query sum (aggregation order
    cannot flap a value), ideal-DCG denominators are precomputed
    integer constants shared verbatim with the oracle, and the final
    nDCG is one integer division. The oracle rebuilds the ranking
    from the full DuckDB BM25 twin and replicates the metric
    arithmetic — so this DQ certifies ranking AND measurement."""
    from .functions.ranking_eval import retrieval_metrics
    from .functions.similarity import bm25_rank_batch

    d = _d(spark, sf_dir).select("doc_id", "text")
    qdf = spark.createDataFrame(_BM25_BATCH_QUERIES, "query_id int, query_text string")
    ranked = bm25_rank_batch(qdf, d, topk=10)
    qids = spark.createDataFrame([(1,), (2,), (3,)], "query_id int")
    qrels = (
        d.select("doc_id")
        .join(F.broadcast(qids))
        .filter(F.col("doc_id") % (7 + F.col("query_id") * 3) == 0)
        .select("query_id", "doc_id")
    )
    return retrieval_metrics(ranked, qrels, k=10)


@q("hybrid_rank_indexed", _hybrid_batch_oracle())
def hybrid_rank_indexed(spark, sf_dir):
    """The full serving stack from AT-REST artifacts (r11 D-series
    closure): hybrid batch retrieval where the lexical half reads
    the materialized postings index (build → partition-pruned bucket
    scan → shared integer-micro scoring tail) instead of
    re-tokenizing the corpus, fused with the per-query vector top-20
    by grouped RRF exactly as hybrid_rank_rrf_batch. Because the
    at-rest lexical path provably equals the inline one, this DQ
    reuses the SAME DuckDB twin as the inline hybrid — the driver
    thereby certifies index build + pruned serve + fusion end to
    end in one hash."""
    import hashlib
    import os
    import tempfile

    from pyspark.sql import Window

    from .functions.embedding import embed_deterministic
    from .functions.similarity import (
        bm25_rank_batch_indexed,
        build_postings_index,
        cosine,
        rrf_fuse,
    )

    d = _d(spark, sf_dir).select("doc_id", "text")
    qdf = spark.createDataFrame(_BM25_BATCH_QUERIES, "query_id int, query_text string")
    q_emb = qdf.select(
        "query_id", embed_deterministic(F.col("query_text"), 8).alias("qv")
    )
    docs_emb = d.select("doc_id", embed_deterministic(F.col("text"), 8).alias("dv"))
    scored = docs_emb.join(F.broadcast(q_emb)).select(
        "query_id",
        "doc_id",
        F.round(cosine(F.col("dv"), F.col("qv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    vec_ranked = (
        scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 20)
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    idx = os.path.join(tempfile.gettempdir(), f"bm25_hybrid_idx_{tag}")
    build_postings_index(d, idx)
    lex_ranked = bm25_rank_batch_indexed(spark, qdf, idx, topk=20)
    return rrf_fuse(
        vec_ranked, lex_ranked, "doc_id", topk=10, group_cols=("query_id",)
    )


def _hybrid_eval_oracle() -> str:
    return (
        "WITH " + _hybrid_batch_ctes() + ", "
        + _EVAL_QRELS_SQL + ", "
        "top AS (SELECT query_id, doc_id, rn AS rank FROM hybr WHERE rn <= 10), "
        + _eval_tail_sql()
    )


@q("hybrid_eval_metrics", _hybrid_eval_oracle())
def hybrid_eval_metrics(spark, sf_dir):
    """Eval-of-hybrid composition (r11 verdict #7): the at-rest
    hybrid ranking (``hybrid_rank_indexed`` — index build → pruned
    lexical serve → RRF fusion with the vector top-20) flows into
    ``retrieval_metrics``, so index changes are regression-gated by
    MRR/recall@10/nDCG@10 — a measured quality number, not just hash
    equality of the ranking. Fused rank = row_number over
    (rrf_score desc, doc_id) — deterministic because rrf scores are
    6dp-rounded with id tiebreaks. Same arithmetic qrels as
    ``retrieval_eval_metrics`` (rel(q,d) ⇔ d % (7+3q) = 0); the
    oracle composes the full hybrid DuckDB twin with the shared
    metric-arithmetic fragment, certifying ranking AND measurement
    of the ENTIRE serving stack in one hash."""
    from pyspark.sql import Window

    from .functions.ranking_eval import retrieval_metrics

    fused = hybrid_rank_indexed(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_score").desc(), "doc_id")
    ranked = fused.withColumn("rank", F.row_number().over(w))
    qids = spark.createDataFrame([(1,), (2,), (3,)], "query_id int")
    qrels = (
        _d(spark, sf_dir)
        .select("doc_id")
        .join(F.broadcast(qids))
        .filter(F.col("doc_id") % (7 + F.col("query_id") * 3) == 0)
        .select("query_id", "doc_id")
    )
    return retrieval_metrics(ranked, qrels, k=10)


_PHRASE_QUERIES = [
    (1, "table table"),
    (2, "value fast"),
    (3, "a a the"),
    (4, "spark shuffles data"),  # expected absent — no row either side
]


def _phrase_oracle() -> str:
    """INDEPENDENT oracle: no postings machinery — per query phrase,
    scan each doc's token array with a sliding window and count the
    positions where all phrase tokens line up."""
    def one(qid: int, phrase: str) -> str:
        toks = phrase.split()
        n = len(toks)
        cond = " AND ".join(
            f"ws[CAST(i + {j} AS INTEGER)] = '{t}'" for j, t in enumerate(toks)
        )
        return (
            f"SELECT {qid} AS query_id, doc_id, CAST(len(list_filter("
            f"range(1, len(ws) - {n} + 2), i -> {cond})) AS BIGINT) AS n_hits "
            "FROM w"
        )

    parts = " UNION ALL ".join(one(q, p) for q, p in _PHRASE_QUERIES)
    return (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS ws FROM documents) "
        f"SELECT * FROM ({parts}) WHERE n_hits > 0"
    )


@q("phrase_search_indexed", _phrase_oracle())
def phrase_search_indexed(spark, sf_dir):
    """Exact phrase search from the POSITIONAL at-rest index (r11
    D-series — the reference's ES backend ships match_phrase; this
    is that capability engine-side): build_postings_index(
    positions=True) stores sorted token positions per posting;
    phrase_match fetches only the phrase terms' bucket partitions
    and intersects offset-shifted position lists per (query, doc) —
    occurrence counts included, duplicate-term phrases ('table
    table') handled by per-offset shifting. The oracle is
    INDEPENDENT: a sliding token-window scan per doc, no postings
    machinery — so the hash certifies the whole positional pipeline
    (position capture, shift, intersection, counting)."""
    import hashlib
    import os
    import tempfile

    from .functions.similarity import build_postings_index, phrase_match

    d = _d(spark, sf_dir).select("doc_id", "text")
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    idx = os.path.join(tempfile.gettempdir(), f"phrase_index_{tag}")
    build_postings_index(d, idx, positions=True)
    qdf = spark.createDataFrame(_PHRASE_QUERIES, "query_id int, query_text string")
    return phrase_match(spark, qdf, idx)


_SLOP_QUERIES = [(1, "table value"), (2, "key hash"), (3, "customer order")]
_SLOP = 1


def _phrase_slop_oracle() -> str:
    """Chain-fold twin in DuckDB list lambdas: per query, term-1
    positions seed the chain; each later term keeps positions that
    extend a surviving chain by 1..1+slop tokens; hits = |final
    viable set| — the same documented contract the engine computes
    from the positional index."""
    gap = 1 + _SLOP

    def one(qid: int, phrase: str) -> str:
        toks = phrase.split()
        pos = lambda t: (  # noqa: E731
            "list_filter(range(1, len(ws) + 1), "
            f"i -> ws[CAST(i AS INTEGER)] = '{t}')"
        )
        chain = pos(toks[0])
        for t in toks[1:]:
            chain = (
                f"list_filter({pos(t)}, q -> len(list_filter({chain}, "
                f"v -> q > v AND q - v <= {gap})) > 0)"
            )
        return (
            f"SELECT {qid} AS query_id, doc_id, "
            f"CAST(len({chain}) AS BIGINT) AS n_hits FROM w"
        )

    parts = " UNION ALL ".join(one(q, p) for q, p in _SLOP_QUERIES)
    return (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS ws FROM documents) "
        f"SELECT * FROM ({parts}) WHERE n_hits > 0"
    )


@q("phrase_search_slop", _phrase_slop_oracle())
def phrase_search_slop(spark, sf_dir):
    """Proximity phrase search (slop=1, the ES match_phrase dial):
    consecutive phrase terms may be separated by one extra token, in
    order — served from the same positional index via the
    chain-reachability fold (term i keeps positions extending a
    surviving term-(i-1) chain within the gap; n_hits = distinct
    chain end positions, = the exact phrase count at slop 0). The
    oracle unrolls the identical fold in DuckDB list lambdas over
    the raw token arrays — no postings machinery."""
    import hashlib
    import os
    import tempfile

    from .functions.similarity import build_postings_index, phrase_match

    d = _d(spark, sf_dir).select("doc_id", "text")
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    idx = os.path.join(tempfile.gettempdir(), f"phrase_index_{tag}")
    build_postings_index(d, idx, positions=True)
    qdf = spark.createDataFrame(_SLOP_QUERIES, "query_id int, query_text string")
    return phrase_match(spark, qdf, idx, slop=_SLOP)


def _snippet_oracle() -> str:
    """Independent oracle: per query, the sliding token-window gives
    hit START positions directly; the snippet is the clamped token
    slice around the first hit, re-joined — no postings machinery,
    no chain fold."""
    def one(qid: int, phrase: str) -> str:
        toks = phrase.split()
        n = len(toks)
        cond = " AND ".join(
            f"ws[CAST(i + {j} AS INTEGER)] = '{t}'" for j, t in enumerate(toks)
        )
        return (
            f"SELECT {qid} AS query_id, doc_id, "
            f"CAST(len(hits) AS BIGINT) AS n_hits, "
            "CAST(hits[1] AS INTEGER) AS first_pos, "
            "array_to_string(ws[CAST(greatest(1, hits[1] - 3) AS INTEGER):"
            f"CAST(hits[1] + {n} + 2 AS INTEGER)], ' ') AS snippet "
            f"FROM (SELECT doc_id, ws, list_filter(range(1, len(ws) - {n} + 2), "
            f"i -> {cond}) AS hits FROM w) WHERE len(hits) > 0"
        )

    parts = " UNION ALL ".join(one(q, p) for q, p in _PHRASE_QUERIES)
    return (
        "WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS ws FROM documents) "
        + parts
    )


@q("phrase_snippets_indexed", _snippet_oracle())
def phrase_snippets_indexed(spark, sf_dir):
    """Snippet/highlight extraction (r11 D-series closure of the
    serving stack — the reference's ES backend highlights hits):
    phrase_match(with_positions=True) anchors the earliest match
    per (query, doc) from the POSITIONAL index, the tiny hit table
    broadcasts back onto the corpus, and the snippet is the token
    slice ±3 around the match. The oracle is INDEPENDENT (sliding
    token-window start positions + clamped slice) — the hash
    certifies hit counting, position arithmetic, clamping, and
    snippet assembly together."""
    import hashlib
    import os
    import tempfile

    from .functions.similarity import build_postings_index, phrase_snippets

    d = _d(spark, sf_dir).select("doc_id", "text")
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    idx = os.path.join(tempfile.gettempdir(), f"phrase_index_{tag}")
    build_postings_index(d, idx, positions=True)
    qdf = spark.createDataFrame(_PHRASE_QUERIES, "query_id int, query_text string")
    return phrase_snippets(spark, qdf, idx, d)


# =====================================================================
# corpus-level exact line dedup (T10 family, round 14 Y-series)
# =====================================================================

_LINE_DEDUP_ORACLE = (
    "WITH pool AS ("
    "SELECT doc_id AS src, "
    "'passage-' || doc_id || ': ' || substr(text, 1, 60) AS line "
    "FROM documents WHERE doc_id < 50), "
    "lines AS ("
    "SELECT d.doc_id, t.j AS pos, p.line "
    "FROM documents d CROSS JOIN range(5) t(j) "
    "JOIN pool p ON (d.doc_id + t.j) % 50 = p.src "
    "UNION ALL "
    "SELECT doc_id, 5 AS pos, 'doc-' || doc_id || '-tail-unique-line' "
    "FROM documents "
    "UNION ALL SELECT doc_id, 6 AS pos, '-- --' FROM documents), "
    "ranked AS ("
    "SELECT doc_id, pos, line, "
    "row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, pos) AS rn "
    "FROM lines), "
    "kept AS (SELECT doc_id, pos, line FROM ranked "
    "WHERE length(trim(line)) < 10 OR rn = 1) "
    "SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text "
    "FROM kept GROUP BY doc_id"
)


@q("dedup_corpus_lines", _LINE_DEDUP_ORACLE)
def dedup_corpus_lines(spark, sf_dir):
    """T10 family, corpus-level EXACT LINE dedup with keep-first
    semantics (the C4 discipline — Raffel et al. 2020 kept one
    occurrence of every repeated span; ``dedup_repeated_passages``
    DETECTS boilerplate, this REMOVES it). Fixture (mirrored in the
    oracle): every document is rebuilt as 7 lines — five 'passage-N'
    lines drawn from a 50-line shared pool (each pool line lands in
    ~10% of documents, so the dedup is heavy and the keep-first
    winner is a different document per line), one globally-unique
    tail line (never removed — proves survivors reassemble in
    order), and one 5-char separator line repeated in EVERY document
    (below min_line_len=10, so the split path must keep all 500
    copies out of the dedup window). The hash certifies the
    first-occurrence window, the short-line split path, and ordered
    reassembly together. Engine: one posexplode, ONE hash-keyed
    window exchange over dedup-eligible lines only, one id-keyed
    rebuild — no joins."""
    d = _d(spark, sf_dir)
    pool = d.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("src"),
        F.concat(
            F.lit("passage-"),
            F.col("doc_id").cast("string"),
            F.lit(": "),
            F.substring("text", 1, 60),
        ).alias("line"),
    )
    # ONE documents pass for all seven fixture lines (r17 guide §2.3/
    # §2.4): the previous three-branch union re-scanned + re-spread the
    # corpus once per line kind (3 RoundRobin exchanges feeding the
    # same groupBy). One spine explode over pos 0..6 + one broadcast
    # left join builds the identical row set: pos<=4 keeps only pool
    # matches (src IS NOT NULL replicates the old INNER join exactly,
    # including a matched pool row whose line is NULL), pos 5/6 are
    # projections. Row-for-row the old fixture — parity-pinned.
    spine = d.select("doc_id").withColumn(
        "pos", F.explode(F.sequence(F.lit(0), F.lit(6)))
    )
    joined = spine.join(
        F.broadcast(pool),
        (spine.pos <= 4) & ((spine.doc_id + spine.pos) % 50 == pool.src),
        "left",
    )
    fixture = (
        joined.filter((F.col("pos") >= 5) | F.col("src").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.when(F.col("pos") <= 4, F.col("line"))
            .when(
                F.col("pos") == 5,
                F.concat(
                    F.lit("doc-"),
                    F.col("doc_id").cast("string"),
                    F.lit("-tail-unique-line"),
                ),
            )
            .otherwise(F.lit("-- --"))
            .alias("line"),
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s.line,
                ),
                "\n",
            ).alias("text")
        )
    )
    return DD.remove_repeated_lines(fixture, "text", "doc_id", min_line_len=10)


# =====================================================================
# audio near-dup dedup (T10/T11 audio leg, round 14 Y-series)
# =====================================================================

_AUDIO_P = "((d.g*37 + {j}*53) % 97)"


@q(
    "dedup_audio_fp",
    "WITH docs AS (SELECT doc_id, doc_id // 3 AS g, doc_id % 3 AS v "
    "FROM documents WHERE doc_id < 300), "
    "bits AS (SELECT d.doc_id, j.range AS j, "
    "CASE WHEN d.v = 2 AND j.range = 0 THEN "
    "(CASE WHEN " + _AUDIO_P.format(j="1") + " > "
    "(CASE WHEN " + _AUDIO_P.format(j="1") + " > " + _AUDIO_P.format(j="0")
    + " THEN 97 ELSE 0 END) THEN 1 ELSE 0 END) "
    "ELSE (CASE WHEN " + _AUDIO_P.format(j="(j.range+1)") + " > "
    + _AUDIO_P.format(j="j.range") + " THEN 1 ELSE 0 END) END AS bit "
    "FROM docs d, range(64) j), "
    "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
    "CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS INTEGER) AS hamming "
    "FROM bits a JOIN bits b ON a.j = b.j AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id) "
    "SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 2",
)
def dedup_audio_fp(spark, sf_dir):
    """Audio near-dup dedup — the AUDIO leg of the multimodal dedup
    mandate (image leg landed as dedup_image_phash). Docs come in
    groups of three REAL WAV clips sharing one 65-frame energy
    envelope: a 16-bit PCM original, an 8-bit PCM re-encode
    (identical envelope through quantization — container invariance),
    and a HALF-GAIN variant with frame 0's amplitude forced across
    frame 1's (gain invariance + exactly one flipped bit → a near-dup
    at hamming ≤ 1, not an exact dup). Engine: real RIFF decode →
    per-frame RMS in one fused Arrow stage (full-res samples never
    leave the decoding task) → 64-bit energy-delta hash packed
    JVM-side → the SAME content-agnostic pigeonhole banding as
    images (hamming64_pairs) → exact bit_count(XOR) verify. The
    oracle recomputes the fingerprint BITS arithmetically from the
    amplitude generator and takes the NAIVE all-pairs hamming filter,
    so the hash certifies decode→RMS→hash against independent
    content AND banding completeness, cross-group near-collisions
    included."""
    d = _d(spark, sf_dir).select("doc_id").filter(F.col("doc_id") < 300)
    # bounded-hash checkpoint before the banded self-join — the
    # dedup_image_phash rationale: one WAV decode pass, not two.
    hashes = MM.audio_fingerprint64(MM.attach_pattern_audio(d)).localCheckpoint()
    return DD.hamming64_pairs(hashes, "afp", max_hamming=2)


# =====================================================================
# IVF-PQ serving (T8 scale path, round 14 Y-series)
# =====================================================================


@q(
    "ann_ivfpq_search",
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
    f"SELECT e.vec_id, {_COS} AS score FROM embeddings e, q WHERE e.vec_id <> 0 "
    "ORDER BY score DESC, e.vec_id LIMIT 5",
)
def ann_ivfpq_search(spark, sf_dir):
    """IVF-PQ end-to-end (r14 Y-series — the third at-rest ANN
    layout after multi-table LSH and SQ8): deterministic driver-side
    Lloyd training of the coarse quantizer + per-subspace residual
    codebooks, Arrow-batched full-corpus encode to one cell id + m
    smallint codes per vector, parquet partitioned by ivf_cell, probe
    via driver-computed ADC lookup tables broadcast onto the pruned
    code scan (scoring = m JVM array lookups inside codegen), exact
    cosine re-rank of the ADC top-128 from the raw sidecar. The DQ
    probes ALL cells so candidate coverage is principled and the
    result must EQUAL brute-force top-5 — the oracle is the
    similarity_topk brute-force SQL, certifying train→encode→ADC→
    re-score end to end (a wrong codebook, a wrong LUT, or a wrong
    residual would push a true neighbor out of the ADC top-128 and
    break the hash). Partition pruning at n_probe < n_cells is
    plan-asserted in pytest (the DQ's all-cell probe exercises
    correctness; pruning is a plan property)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from .functions.pq import write_ivfpq_store

    e = _t(spark, sf_dir, "embeddings")
    qhead = e.filter(F.col("vec_id") == 0).select("embedding").head()
    if qhead is None:
        return spark.createDataFrame([], "vec_id bigint, score double")
    qv = [float(x) for x in qhead[0]]
    corpus = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"ivfpq_root_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh build per run
    store = write_ivfpq_store(corpus, root, n_cells=8, m=8)
    return store.probe(qv, k=5, n_probe=8, keep=128)


_IVFPQ_BATCH_COS = (
    "round(list_cosine_similarity("
    "list_transform(e.embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(q.qv, x -> CAST(x AS DOUBLE))), 6)"
)


@q(
    "ann_ivfpq_batch",
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings "
    "WHERE vec_id IN (0, 1, 2)), "
    "c AS (SELECT q.query_id, e.vec_id, "
    f"{_IVFPQ_BATCH_COS} AS score "
    "FROM embeddings e, q WHERE e.vec_id > 2) "
    "SELECT query_id, vec_id, score, rank FROM ("
    "SELECT query_id, vec_id, score, CAST(row_number() OVER ("
    "PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rank "
    "FROM c) WHERE rank <= 5",
)
def ann_ivfpq_batch(spark, sf_dir):
    """BATCH IVF-PQ serving: a (query_id, qvec) TABLE probes the PQ
    store in ONE plan — per-(query, cell) ADC tables computed driver-
    side and broadcast, ONE partition-pruned code scan over the union
    of probed cells, m-lookup JVM scoring, per-query ADC top-128 via
    one window, then the exact re-rank from the raw sidecar (bucket
    filter derived engine-side, bounded by the raw_id_buckets store
    constant — never by batch size). All cells probed + brute-force
    oracle with rank: the hash certifies the batch plan end to end
    against N independent exact answers (the same coverage argument
    as ann_ivfpq_search)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from .functions.pq import IvfPqStore, write_ivfpq_store

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") <= 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    if queries.head() is None:
        return spark.createDataFrame(
            [], "query_id bigint, vec_id bigint, score double, rank int"
        )
    corpus = e.filter(F.col("vec_id") > 2).select("vec_id", "embedding")
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"ivfpq_batch_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh build per run
    store = write_ivfpq_store(corpus, root, n_cells=8, m=8)
    return store.probe_batch(queries, k=5, n_probe=8, keep=128)


@q(
    "dedup_image_clusters",
    "WITH RECURSIVE docs AS (SELECT doc_id, doc_id // 3 AS g, doc_id % 3 AS v "
    "FROM documents WHERE doc_id < 300), "
    "cells AS (SELECT x.range AS x, y.range AS y FROM range(8) x, range(8) y), "
    "bits AS (SELECT d.doc_id, c.x, c.y, "
    "CASE WHEN ((d.g*37 + (c.x+1)*17 + c.y*53) % 256) > "
    "(CASE WHEN d.v = 2 AND c.x = 0 AND c.y = 0 "
    "THEN (d.g*37 + 128) % 256 "
    "ELSE (d.g*37 + c.x*17 + c.y*53) % 256 END) "
    "THEN 1 ELSE 0 END AS bit "
    "FROM docs d, cells c), "
    "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
    "SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming "
    "FROM bits a JOIN bits b ON a.x = b.x AND a.y = b.y AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id HAVING hamming <= 2), "
    "edges AS (SELECT id_a AS a, id_b AS b FROM pairs "
    "UNION SELECT id_b, id_a FROM pairs), "
    "reach(a, b) AS (SELECT a, b FROM edges "
    "UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a) "
    "SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS cluster_id "
    "FROM reach GROUP BY a",
)
def dedup_image_clusters(spark, sf_dir):
    """Multimodal dedup CAPSTONE: the image near-dup pipeline carried
    through to the DECISION — real decode → luma-grid dHash →
    pigeonhole-banded hamming pairs (dedup_image_phash's stage) →
    star-contraction connected components → (doc_id, cluster_id =
    min id), i.e. which re-encoded/resized images are THE SAME asset
    and which copy survives. The fixture's linear pattern family
    produces cross-group near-collisions, so components MERGE across
    planted groups (300 docs → 14 clusters at sf0.001) — the oracle
    (arithmetic bits → naive all-pairs → recursive-CTE transitive
    closure) certifies banding completeness AND the O(log² n) CC
    against a diameter-unbounded ground truth, end to end from
    pixels."""
    d = _d(spark, sf_dir).select("doc_id").filter(F.col("doc_id") < 300)
    # bounded-hash checkpoint — one decode pass feeds both self-join
    # sides (the dedup_image_phash rationale); dup_clusters_star then
    # checkpoints the pair set itself before iterating.
    hashes = MM.image_dhash64(MM.attach_pattern_image(d)).localCheckpoint()
    pairs = DD.hamming64_pairs(hashes, "dhash", max_hamming=2)
    return DD.dup_clusters_star(pairs)


@q(
    "ann_ivfpq_upsert",
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
    "corpus AS ("
    "SELECT vec_id, embedding FROM embeddings "
    "WHERE vec_id <> 0 AND vec_id NOT IN (7, 14) "
    "UNION ALL "
    "SELECT vec_id + 10000 AS vec_id, "
    "list_transform(embedding, x -> -x) AS embedding "
    "FROM embeddings WHERE vec_id BETWEEN 1 AND 3) "
    f"SELECT e.vec_id, {_COS} AS score FROM corpus e, q "
    "ORDER BY score DESC, e.vec_id LIMIT 5",
)
def ann_ivfpq_upsert(spark, sf_dir):
    """IVF-PQ O(delta) maintenance end to end: the base is built over
    a STALE generation (every 5th vector negated), then ONE upsert
    folds the corrected 20% plus three new ids in as a frozen-
    codebook delta segment (base codes untouched), then a TOMBSTONE
    segment deletes two ids outright. All-cell probe + generous ADC
    keep ⇒ the serve must EQUAL brute-force top-5 over the TRUE
    surviving corpus — the oracle certifies delta encode → last-wins
    shadowing (stale copies AND their stale raw rows dead) →
    tombstone exclusion → exact re-rank in one hash (the
    ann_store_upsert discipline on the third layout)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from .functions.pq import (
        delete_ivfpq_ids,
        upsert_ivfpq_store,
        write_ivfpq_store,
    )

    e = _t(spark, sf_dir, "embeddings")
    qhead = e.filter(F.col("vec_id") == 0).select("embedding").head()
    if qhead is None:
        return spark.createDataFrame([], "vec_id bigint, score double")
    qv = [float(x) for x in qhead[0]]
    base = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    stale = base.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 5 == 0, F.transform("embedding", lambda x: -x)
        ).otherwise(F.col("embedding")),
    )
    delta = base.filter(F.col("vec_id") % 5 == 0).unionByName(
        base.filter(F.col("vec_id").between(1, 3)).select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"ivfpq_ups_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh build per run
    write_ivfpq_store(stale, root, n_cells=8, m=8)
    upsert_ivfpq_store(delta, root)
    store = delete_ivfpq_ids(
        spark, root, spark.createDataFrame([(7,), (14,)], "vec_id bigint")
    )
    return store.probe(qv, k=5, n_probe=8, keep=192)


@q(
    "ann_time_travel",
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
    "corpus AS (SELECT vec_id, CASE WHEN vec_id % 3 = 0 "
    "THEN list_transform(embedding, x -> -x) ELSE embedding END AS embedding "
    "FROM embeddings WHERE vec_id <> 0) "
    f"SELECT e.vec_id, {_COS} AS score FROM corpus e, q WHERE ("
    + _multi_table_sql("e.embedding", "q.qv", bits=3, n_tables=SIM.DEFAULT_LSH_TABLES)
    + ") ORDER BY score DESC, e.vec_id LIMIT 5",
)
def ann_time_travel(spark, sf_dir):
    """Version time-travel read on the managed ANN root (r14 verdict
    #6; similarity.py::resolve_version_dir): the store is built over
    a STALE generation (every 3rd vector negated), an upsert then
    CORRECTS those vectors — and the query serves the PRE-UPSERT
    version explicitly (``AnnStore.open(root, version=v0)``). The
    oracle is the multi-table LSH probe over the STALE corpus, so the
    hash certifies the pinned version ignores every newer segment:
    the audit read that re-runs yesterday's probe against yesterday's
    store byte-for-byte. Retention (vacuum default retain=2) is what
    keeps v0 on disk — the read-side complement of
    ``ann_version_drift``."""
    import hashlib
    import os
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")
    qhead = e.filter(F.col("vec_id") == 0).select("embedding").head()
    if qhead is None:
        return spark.createDataFrame([], "vec_id bigint, score double")
    qv = [float(x) for x in qhead[0]]
    base = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    stale = base.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 3 == 0, F.transform("embedding", lambda x: -x)
        ).otherwise(F.col("embedding")),
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"ann_tt_root_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    SIM.write_ann_store_versioned(
        stale, root, bits=3, n_tables=SIM.DEFAULT_LSH_TABLES
    )
    v0 = os.path.basename(SIM.index_current_path(root).rstrip("/"))
    # the correction upsert moves CURRENT past v0
    SIM.upsert_ann_store_versioned(base.filter(F.col("vec_id") % 3 == 0), root)
    return SIM.AnnStore.open(spark, root, version=v0).probe(qv, k=5)


@q(
    "ann_ivfpq_lifecycle",
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
    "corpus AS ("
    "SELECT vec_id, embedding FROM embeddings "
    "WHERE vec_id <> 0 AND vec_id NOT IN (9, 18) "
    "UNION ALL "
    "SELECT vec_id + 10000 AS vec_id, "
    "list_transform(embedding, x -> -x) AS embedding "
    "FROM embeddings WHERE vec_id BETWEEN 1 AND 3) "
    f"SELECT e.vec_id, {_COS} AS score FROM corpus e, q "
    "ORDER BY score DESC, e.vec_id LIMIT 5",
)
def ann_ivfpq_lifecycle(spark, sf_dir):
    """The FULL IVF-PQ managed-root lifecycle in one query (r14
    verdict #1 capstone): stale base build (every 5th vector
    negated) -> frozen-codebook correction upsert plus three new
    ids -> tombstone delete of two ids -> IN-PLACE COMPACTION
    (pq.py::compact_ivfpq_store — re-trains quantizers into a new
    generation, folds survivors to one segment, commits a new
    version behind the atomic CURRENT pointer, retention-vacuums) ->
    all-cell probe. The oracle is brute-force cosine top-5 over the
    TRUE surviving corpus, so the hash certifies that the fold
    dropped exactly the tombstoned rows and the shadowed stale
    copies, kept the newest metadata-free survivors, and that codes
    RE-ENCODED against the new quantizer generation still rank the
    exact re-ranked top-5 identically — upsert ≡ delete ≡ compact ≡
    rebuild end to end."""
    import hashlib
    import os
    import shutil
    import tempfile

    from .functions.pq import (
        compact_ivfpq_store,
        delete_ivfpq_ids,
        upsert_ivfpq_store,
        write_ivfpq_store,
    )

    e = _t(spark, sf_dir, "embeddings")
    qhead = e.filter(F.col("vec_id") == 0).select("embedding").head()
    if qhead is None:
        return spark.createDataFrame([], "vec_id bigint, score double")
    qv = [float(x) for x in qhead[0]]
    base = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    stale = base.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 5 == 0, F.transform("embedding", lambda x: -x)
        ).otherwise(F.col("embedding")),
    )
    delta = base.filter(F.col("vec_id") % 5 == 0).unionByName(
        base.filter(F.col("vec_id").between(1, 3)).select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"ivfpq_life_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh build per run
    write_ivfpq_store(stale, root, n_cells=8, m=8)
    upsert_ivfpq_store(delta, root)
    delete_ivfpq_ids(
        spark, root, spark.createDataFrame([(9,), (18,)], "vec_id bigint")
    )
    store = compact_ivfpq_store(spark, root)  # in place: new version
    return store.probe(qv, k=5, n_probe=8, keep=192)


@q(
    "ann_pq_version_drift",
    _DRIFT_ORACLE_SQL,
)
def ann_pq_version_drift(spark, sf_dir):
    """``ann_version_drift`` on the THIRD layout (r14 verdict #1
    tail): the identical four-cohort fixture — 20% sign-flip
    re-embeds (drift exactly 2e6 micros), a first-component flip for
    the %7 cohort (real intermediate drift), byte-identical %11
    re-upserts (classified unchanged, DROPPED from the report), three
    new ids (added, NULL drift) — folded as a frozen-codebook delta
    into a managed IVF-PQ root, then diffed between the two committed
    versions. The drift report resolves each version's LOGICAL
    vectors from the raw sidecar pool with last-wins shadowing
    (similarity.py::_resolved_vectors, ivfpq branch), so the hash
    certifies the PQ manifest chain exposes the same
    version-over-version semantics as the LSH layouts — one
    observability surface across all three stores."""
    import hashlib
    import os
    import shutil
    import tempfile

    from .functions.pq import upsert_ivfpq_store, write_ivfpq_store

    e = _t(spark, sf_dir, "embeddings")
    if e.head() is None:
        return spark.createDataFrame(
            [], "vec_id bigint, status string, drift_micros bigint"
        )
    base = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    stale = base.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 5 == 0, F.transform("embedding", lambda x: -x)
        ).otherwise(F.col("embedding")),
    )
    flip_first = F.transform(
        "embedding", lambda x, i: F.when(i == F.lit(0), -x).otherwise(x)
    )
    delta = (
        base.filter(F.col("vec_id") % 5 == 0)
        .unionByName(
            base.filter((F.col("vec_id") % 7 == 0) & (F.col("vec_id") % 5 != 0))
            .withColumn("embedding", flip_first)
        )
        .unionByName(
            base.filter(
                (F.col("vec_id") % 11 == 0)
                & (F.col("vec_id") % 5 != 0)
                & (F.col("vec_id") % 7 != 0)
            )
        )
        .unionByName(
            base.filter(F.col("vec_id").between(1, 3)).select(
                (F.col("vec_id") + 10000).alias("vec_id"),
                F.transform("embedding", lambda x: -x).alias("embedding"),
            )
        )
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"pq_drift_root_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    write_ivfpq_store(stale, root, n_cells=8, m=8)
    upsert_ivfpq_store(delta, root)
    return SIM.ann_version_drift(spark, root)


@q(
    "index_version_drift",
    "SELECT doc_id, 'changed' AS status FROM documents WHERE doc_id % 5 = 0 "
    "UNION ALL "
    "SELECT doc_id + 10000 AS doc_id, 'added' AS status FROM documents "
    "WHERE doc_id BETWEEN 1 AND 3 "
    "UNION ALL "
    "SELECT doc_id, 'removed' AS status FROM documents WHERE doc_id IN (1, 2)",
)
def index_version_drift(spark, sf_dir):
    """Content drift between committed POSTINGS versions (r15 —
    similarity.py::index_version_drift, the lexical twin of the two
    vector drift DQs; all three at-rest layouts now answer 'what did
    the last maintenance op change?'): the fixture builds the
    versioned index over a STALE generation (every 5th doc carries
    noise terms), then one correction upsert + three new docs, then a
    row-level tombstone delete of two ids — and the report diffs v0
    against CURRENT. Per-doc signatures are md5 over the sorted
    term:tf list of the RESOLVED postings view (last-wins shadowing +
    tombstones applied), so the hash certifies that replaced docs
    classify changed (any tf move flips the signature — doclens
    alone could not see a dl-preserving edit), new docs added,
    tombstoned docs removed, and untouched docs drop from the
    report."""
    import hashlib
    import os
    import shutil
    import tempfile

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    if d.head() is None:
        return spark.createDataFrame([], "doc_id bigint, status string")
    stale = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" stale vector spark noise")),
        ).otherwise(F.col("text")),
    )
    delta = d.filter(F.col("doc_id") % 5 == 0).unionByName(
        d.filter(F.col("doc_id").between(1, 3)).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"idx_drift_root_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    SIM.build_postings_index_versioned(stale, root)
    SIM.upsert_postings_index_versioned(delta, root)
    SIM.delete_index_ids(
        spark.createDataFrame([(1,), (2,)], "doc_id bigint"), root
    )
    return SIM.index_version_drift(
        spark, root, from_dir=os.path.join(root, "v_000000")
    )


@q(
    "index_time_travel",
    "WITH staledocs AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 "
    "THEN text || ' stale vector spark noise' ELSE text END AS text "
    "FROM documents), "
    + _bm25_batch_ctes().replace("FROM documents", "FROM staledocs")
    + " SELECT query_id, doc_id, score, rank FROM lexr WHERE rank <= 10",
)
def index_time_travel(spark, sf_dir):
    """Version time-travel read on the managed POSTINGS root (r15
    verdict #6 — ``ann_time_travel`` covered the LSH layout; this
    closes the read-side audit story on the lexical layout, THROUGH a
    compaction): the index is built over a STALE generation (every
    5th doc carries appended noise terms — including the fixture
    query terms, so serving the wrong version provably flips
    rankings), an upsert folds the corrections in as a delta segment,
    ``compact_index`` then rewrites the live version into one folded
    segment — and the query batch serves the PRE-UPSERT version
    explicitly (``resolve_version_dir(root, v0)``). The oracle is the
    from-scratch BM25 pipeline over the STALE corpus, so the hash
    certifies the pinned version ignores both the delta segment and
    the fold: yesterday's ranking against yesterday's index,
    byte-for-byte. Compaction vacuums with ``retain=3`` here because
    the chain is build→upsert→fold and the audit read pins the
    OLDEST of the three — the retention dial priced explicitly
    (default retain=2 keeps one version of history; deeper audits pay
    for deeper retention)."""
    import hashlib
    import os
    import shutil
    import tempfile

    d = _d(spark, sf_dir).select("doc_id", "text")
    stale = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" stale vector spark noise")),
        ).otherwise(F.col("text")),
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"idx_tt_root_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    SIM.build_postings_index_versioned(stale, root)
    v0 = os.path.basename(SIM.index_current_path(root).rstrip("/"))
    SIM.upsert_postings_index_versioned(d.filter(F.col("doc_id") % 5 == 0), root)
    SIM.compact_index(spark, root, retain=3)
    qdf = spark.createDataFrame(
        _BM25_BATCH_QUERIES, "query_id int, query_text string"
    )
    return SIM.bm25_rank_batch_indexed(
        spark, qdf, SIM.resolve_version_dir(root, v0), topk=10
    )


def _duck_bands_ctes(suffix: str, src: str, num_hashes: int = 8, band_size: int = 2) -> str:
    """``sh_<s>/sigs_<s>/bands_<s>`` CTE fragments (no leading WITH)
    building the banded-MinHash table over ``src`` — a CTE exposing
    (id, text) — with the exact ``band_table`` arithmetic, so the
    cross-corpus oracles share one band definition with the
    self-join one (``_minhash_oracle``)."""
    mh = ", ".join(
        "list_aggregate(list_transform(shingles, s -> md5('mh|"
        + str(i)
        + "|' || s)), 'min')"
        f" AS mh_{i}"
        for i in range(num_hashes)
    )
    n_bands = num_hashes // band_size
    bands = " UNION ALL ".join(
        f"SELECT id, {b} AS band, md5("
        + " || '|' || ".join(
            f"mh_{b * band_size + j}" for j in range(band_size)
        )
        + f") AS band_hash FROM sigs_{suffix}"
        for b in range(n_bands)
    )
    return (
        f"sh_{suffix} AS (SELECT id, {_duck_shingles()} AS shingles "
        f"FROM {src}), "
        f"sigs_{suffix} AS (SELECT id, {mh} FROM sh_{suffix}), "
        f"bands_{suffix} AS ({bands})"
    )


@q(
    "dedup_incremental_novelty",
    "WITH newd AS ("
    "SELECT doc_id + 20000 AS id, text FROM documents WHERE doc_id % 7 = 1 "
    "UNION ALL SELECT doc_id + 30000 AS id, text || ' qq' AS text "
    "FROM documents WHERE doc_id % 7 = 2 "
    "UNION ALL SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 = 0), "
    "rest AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 <> 0), "
    + _duck_bands_ctes("n", "newd")
    + ", "
    + _duck_bands_ctes("r", "rest")
    + ", coll AS (SELECT DISTINCT bn.id FROM bands_n bn JOIN bands_r br "
    "ON bn.band = br.band AND bn.band_hash = br.band_hash) "
    "SELECT id AS doc_id FROM newd WHERE NOT EXISTS "
    "(SELECT 1 FROM coll c WHERE c.id = newd.id)",
)
def dedup_incremental_novelty(spark, sf_dir):
    """Incremental-crawl novelty gate (r16; dedup.py::novelty_gate):
    dedup a NEW crawl batch against the AT-REST corpus generation
    WITHOUT re-pairing the corpus with itself — exact tier is one
    band_table(delta) ⋉ band_table(rest) (the decontaminate_fuzzy
    cross-corpus shape) plus one delta-bounded anti-join; exact
    copies need no separate tier (identical text ⇒ identical
    signature ⇒ every band collides). Everything is priced by the
    delta. The fixture plants both drop cohorts: every
    7th doc re-enters as an EXACT copy (new id, same text) and every
    7th+1 as a NEAR-dup (same text + a trailing token — most
    shingles shared, so its bands collide with the at-rest
    original), alongside the genuinely new slice; the oracle replays
    fingerprints, signatures, bands, and both anti-joins, so the
    hash certifies exactly which documents a recrawl admits."""
    d = _d(spark, sf_dir).select("doc_id", "text")
    new = (
        d.filter(F.col("doc_id") % 7 == 1)
        .select((F.col("doc_id") + 20000).alias("doc_id"), "text")
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 2).select(
                (F.col("doc_id") + 30000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq")).alias("text"),
            )
        )
        .unionByName(d.filter(F.col("doc_id") % 3 == 0))
    )
    rest = d.filter(F.col("doc_id") % 3 != 0)
    return DD.novelty_gate(new, rest, "text", "doc_id").select("doc_id")


@q(
    "dedup_novelty_indexed",
    "WITH newd AS ("
    "SELECT doc_id + 20000 AS id, text FROM documents WHERE doc_id % 7 = 1 "
    "UNION ALL SELECT doc_id + 30000 AS id, text || ' qq' AS text "
    "FROM documents WHERE doc_id % 7 = 2 "
    "UNION ALL SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 = 0), "
    "rest AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 <> 0), "
    + _duck_bands_ctes("n", "newd")
    + ", "
    + _duck_bands_ctes("r", "rest")
    + ", coll AS (SELECT DISTINCT bn.id FROM bands_n bn JOIN bands_r br "
    "ON bn.band = br.band AND bn.band_hash = br.band_hash) "
    "SELECT id AS doc_id FROM newd WHERE NOT EXISTS "
    "(SELECT 1 FROM coll c WHERE c.id = newd.id)",
)
def dedup_novelty_indexed(spark, sf_dir):
    """The novelty gate served from the AT-REST band store (r16;
    dedup.py::write_band_store/upsert_band_store/
    novelty_gate_indexed — the managed-root treatment for crawl
    fingerprints): generation 1 of the at-rest corpus is built into
    the store, generation 2 appends via an O(delta) upsert (new
    segment + manifest behind the atomic CURRENT swap — the
    postings/ANN/PQ substrate), and the crawl delta gates against
    the pre-computed bands — the at-rest TEXT is never re-shingled
    at crawl time, which is the whole point at 100 TB (signatures
    build once per generation, serve every crawl). The oracle is
    the INLINE gate over the union corpus, so the hash certifies
    store-build + upsert + serve ≡ the from-scratch gate — the
    upsert ≡ rebuild discipline on the fingerprint layout."""
    import hashlib
    import os
    import shutil
    import tempfile

    d = _d(spark, sf_dir).select("doc_id", "text")
    new = (
        d.filter(F.col("doc_id") % 7 == 1)
        .select((F.col("doc_id") + 20000).alias("doc_id"), "text")
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 2).select(
                (F.col("doc_id") + 30000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq")).alias("text"),
            )
        )
        .unionByName(d.filter(F.col("doc_id") % 3 == 0))
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"band_store_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    DD.write_band_store(d.filter(F.col("doc_id") % 3 == 1), root)
    DD.upsert_band_store(d.filter(F.col("doc_id") % 3 == 2), root)
    return DD.novelty_gate_indexed(new, root).select("doc_id")


@q(
    "dedup_novelty_time_travel",
    "WITH newd AS ("
    "SELECT doc_id + 20000 AS id, text FROM documents WHERE doc_id % 7 = 1 "
    "UNION ALL SELECT doc_id + 30000 AS id, text || ' qq' AS text "
    "FROM documents WHERE doc_id % 7 = 2 "
    "UNION ALL SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 = 0), "
    "rest AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 = 1), "
    + _duck_bands_ctes("n", "newd")
    + ", "
    + _duck_bands_ctes("r", "rest")
    + ", coll AS (SELECT DISTINCT bn.id FROM bands_n bn JOIN bands_r br "
    "ON bn.band = br.band AND bn.band_hash = br.band_hash) "
    "SELECT id AS doc_id FROM newd WHERE NOT EXISTS "
    "(SELECT 1 FROM coll c WHERE c.id = newd.id)",
)
def dedup_novelty_time_travel(spark, sf_dir):
    """Version time-travel on the BAND STORE (r16 — the fourth
    layout's pinned read, completing the audit story
    ann_time_travel/index_time_travel opened on the other three):
    the store is built over generation 1 (doc_id % 3 = 1), an upsert
    folds generation 2 in (% 3 = 2) — and the gate serves the
    PINNED pre-upsert version, answering 'which documents would
    LAST generation's corpus have admitted?'. The oracle gates
    against generation 1 ONLY, so the hash certifies the pinned
    read ignores the upserted segment entirely: same fixture as
    dedup_novelty_indexed, different expected admit set (generation
    2's near-collisions are invisible at v0). Retention (vacuum
    retain >= 2) is what keeps v0 on disk."""
    import hashlib
    import os
    import shutil
    import tempfile

    d = _d(spark, sf_dir).select("doc_id", "text")
    new = (
        d.filter(F.col("doc_id") % 7 == 1)
        .select((F.col("doc_id") + 20000).alias("doc_id"), "text")
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 2).select(
                (F.col("doc_id") + 30000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq")).alias("text"),
            )
        )
        .unionByName(d.filter(F.col("doc_id") % 3 == 0))
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"band_tt_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    DD.write_band_store(d.filter(F.col("doc_id") % 3 == 1), root)
    v0 = os.path.basename(SIM.index_current_path(root).rstrip("/"))
    DD.upsert_band_store(d.filter(F.col("doc_id") % 3 == 2), root)
    return DD.novelty_gate_indexed(new, root, version=v0).select("doc_id")


@q(
    "dedup_novelty_delete",
    "WITH newd AS ("
    "SELECT doc_id + 20000 AS id, text FROM documents WHERE doc_id % 7 = 1 "
    "UNION ALL SELECT doc_id + 30000 AS id, text || ' qq' AS text "
    "FROM documents WHERE doc_id % 7 = 2 "
    "UNION ALL SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 = 0), "
    "rest AS (SELECT doc_id AS id, text FROM documents "
    "WHERE doc_id % 3 <> 0 AND doc_id % 5 <> 0), "
    + _duck_bands_ctes("n", "newd")
    + ", "
    + _duck_bands_ctes("r", "rest")
    + ", coll AS (SELECT DISTINCT bn.id FROM bands_n bn JOIN bands_r br "
    "ON bn.band = br.band AND bn.band_hash = br.band_hash) "
    "SELECT id AS doc_id FROM newd WHERE NOT EXISTS "
    "(SELECT 1 FROM coll c WHERE c.id = newd.id)",
)
def dedup_novelty_delete(spark, sf_dir):
    """Tombstone deletes on the band store (r17; dedup.py::
    delete_band_ids — the §2.18 X2 row-level-delete treatment on the
    fourth managed layout): a takedown at the corpus layer retires
    its FINGERPRINTS too, so re-cleared content is no longer refused
    forever by the novelty gate. Store = generation 1 (% 3 = 1) +
    generation 2 upsert (% 3 = 2), then every at-rest doc with
    doc_id % 5 = 0 is tombstoned (an O(delete-set) id segment — no
    live segment rewritten) and the crawl delta gates against the
    shadow-RESOLVED live bands. The oracle gates against the at-rest
    corpus MINUS the deleted docs, so the hash certifies the
    tombstones hide exactly those fingerprints: resubmitted copies
    of deleted docs ADMIT, everything else gates as before."""
    import hashlib
    import os
    import shutil
    import tempfile

    d = _d(spark, sf_dir).select("doc_id", "text")
    new = (
        d.filter(F.col("doc_id") % 7 == 1)
        .select((F.col("doc_id") + 20000).alias("doc_id"), "text")
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 2).select(
                (F.col("doc_id") + 30000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq")).alias("text"),
            )
        )
        .unionByName(d.filter(F.col("doc_id") % 3 == 0))
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"band_del_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    DD.write_band_store(d.filter(F.col("doc_id") % 3 == 1), root)
    DD.upsert_band_store(d.filter(F.col("doc_id") % 3 == 2), root)
    DD.delete_band_ids(
        d.filter((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 5 == 0))
        .select("doc_id"),
        root,
    )
    return DD.novelty_gate_indexed(new, root).select("doc_id")


@q(
    "dedup_novelty_compacted",
    "WITH newd AS ("
    "SELECT doc_id + 20000 AS id, text FROM documents WHERE doc_id % 7 = 1 "
    "UNION ALL SELECT doc_id + 30000 AS id, text || ' qq' AS text "
    "FROM documents WHERE doc_id % 7 = 2 "
    "UNION ALL SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 = 0), "
    "rest AS (SELECT doc_id AS id, text FROM documents "
    "WHERE doc_id % 3 <> 0 AND doc_id % 5 <> 0), "
    + _duck_bands_ctes("n", "newd")
    + ", "
    + _duck_bands_ctes("r", "rest")
    + ", coll AS (SELECT DISTINCT bn.id FROM bands_n bn JOIN bands_r br "
    "ON bn.band = br.band AND bn.band_hash = br.band_hash) "
    "SELECT id AS doc_id FROM newd WHERE NOT EXISTS "
    "(SELECT 1 FROM coll c WHERE c.id = newd.id)",
)
def dedup_novelty_compacted(spark, sf_dir):
    """The band store's full lifecycle served POST-FOLD (r17;
    dedup.py::compact_band_store — the rank_bm25_index_compacted
    treatment on the fourth layout): build → upsert → tombstone
    delete → COMPACT (shadow-resolved live rows rewritten as ONE
    (band, band_hash)-clustered segment; tombstoned fingerprints
    physically dropped; old versions retention-vacuumed) → gate.
    Same fixture and oracle as dedup_novelty_delete, so the hash
    certifies the fold moved bytes, never rows: serve-time segment
    reads and shadow anti-joins reset to one and zero while the
    admit set is bit-identical."""
    import hashlib
    import os
    import shutil
    import tempfile

    d = _d(spark, sf_dir).select("doc_id", "text")
    new = (
        d.filter(F.col("doc_id") % 7 == 1)
        .select((F.col("doc_id") + 20000).alias("doc_id"), "text")
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 2).select(
                (F.col("doc_id") + 30000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq")).alias("text"),
            )
        )
        .unionByName(d.filter(F.col("doc_id") % 3 == 0))
    )
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"band_cmp_{tag}")
    shutil.rmtree(root, ignore_errors=True)  # fresh version chain per run
    DD.write_band_store(d.filter(F.col("doc_id") % 3 == 1), root)
    DD.upsert_band_store(d.filter(F.col("doc_id") % 3 == 2), root)
    DD.delete_band_ids(
        d.filter((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 5 == 0))
        .select("doc_id"),
        root,
    )
    DD.compact_band_store(spark, root, retain=2)
    return DD.novelty_gate_indexed(new, root).select("doc_id")
