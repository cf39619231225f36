"""Local replica of the driver's correctness gate.

For every registered query: run the Spark program and the DuckDB
oracle on the same parquet tables, then compare row count, column
names/types, and (order-insensitively) every value. This is stricter
than strictly necessary — if it passes here at sf0.001 and sf0.01,
the driver's value-hash comparison passes too, because both engines
are deterministic on this data.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_ORACLE, SF_SMALL

import __spark_entry__ as entrymod
from data_ingestion_spark.sources.catalog import TABLES


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df):
    """pandas frame → sorted list of row tuples with canonical values."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        canon = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon.append(None)
            elif isinstance(v, float):
                canon.append(round(v, 9))
            else:
                canon.append(v)
        out.append(tuple(canon))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, out


def _compare(name: str, spark_pdf, duck_pdf):
    scols, srows = _normalize(spark_pdf)
    dcols, drows = _normalize(duck_pdf)
    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}"
    )
    for i, (a, b) in enumerate(zip(srows, drows)):
        assert a == b, f"{name}: row {i} differs:\n  spark={a}\n  duck ={b}"


QUERIES = sorted(entrymod.queries().keys())
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck_small():
    con = _duck(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_parity_sf0001(spark, duck_small, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_SMALL)
    spdf = sdf.toPandas()
    if name not in ORACLES:
        assert len(spdf) >= 0  # rows-only contract: must execute
        return
    # timestamps: duckdb returns ns-precision; both are exact micros here
    dpdf = duck_small.execute(ORACLES[name]).df()
    _compare(name, spdf, dpdf)


def _parity_sf001(spark, name):
    fn = entrymod.queries()[name]
    spdf = fn(spark, SF_ORACLE).toPandas()
    if name not in ORACLES:
        assert len(spdf) >= 0
        return
    con = _duck(SF_ORACLE)
    try:
        dpdf = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    _compare(name, spdf, dpdf)


@pytest.mark.slow
@pytest.mark.parametrize("name", QUERIES)
def test_parity_sf001(spark, name):
    """The actual driver scale (sf0.01) — FULL registry sweep.

    Marked slow: the dual-scale sweep outgrew the external driver's
    verify budget in r17; the default run covers sf0.001 for all
    queries plus sf0.01 for this round's changed queries below.
    Builders run the full sweep at end of round with `pytest -m ""`.
    """
    _parity_sf001(spark, name)


#: Queries whose implementation changed in the CURRENT optimization
#: round: these keep driver-scale (sf0.01) parity in the DEFAULT
#: test run so every behavior-touching change is oracle-checked at
#: the driver's scale on every pytest invocation, not just in the
#: end-of-round full sweep.
CHANGED_THIS_ROUND = [
    # CC loop: one-window half-rounds + observed convergence (818992e)
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_decision",
    "dedup_decision_quality",
    # r18: single-split respread + early projection
    "agg_numeric_stats",
    # r18: shingle-set size rides the posting struct (one corpus pass)
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    # r18: lexical index tf/dl/df int-narrowed; eligible-path agg
    # keyed on (query_id, id) again; store metadata via pyarrow.dataset
    "bool_search_indexed",
    "rank_bm25",
    "rank_bm25_batch",
    "rank_bm25_indexed",
    "rank_bm25_index_upsert",
    "rank_bm25_index_compacted",
    "index_time_travel",
    "index_version_drift",
    "index_delete_ids",
    "phrase_search_indexed",
    "phrase_search_slop",
    "phrase_snippets_indexed",
    "hybrid_rank_indexed",
    "hybrid_rank_rrf_batch",
    "hybrid_eval_metrics",
    # r18: IVF-PQ quantizer generation write/read (atomic rename +
    # pyarrow.dataset) and ANN/band-store commit row counts
    "ann_ivfpq_search",
    "ann_ivfpq_lifecycle",
    "ann_pq_version_drift",
    "ann_time_travel",
    # r18: SQ8 codes/raw writes + segment data/ids writes overlapped
    "ann_store_quantized",
    "ann_probe_batch_quantized",
    "ann_store_upsert",
    "dedup_novelty_indexed",
    "dedup_novelty_delete",
    "dedup_novelty_compacted",
]


@pytest.mark.parametrize("name", sorted(set(CHANGED_THIS_ROUND)))
def test_parity_sf001_changed(spark, name):
    """sf0.01 parity for this round's changed queries (always runs)."""
    _parity_sf001(spark, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "n_chunks" in df.columns
