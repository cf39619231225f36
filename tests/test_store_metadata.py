"""Driver-side parquet metadata helpers (r18, guide §5 + r17 ADVICE):

- ``_parquet_rows`` / ``_stats_local`` / ``_load_quantizers`` now go
  through ``pyarrow.dataset``, which must skip ``_``/``.``-prefixed
  paths exactly like Spark's file index (a crashed Hadoop-committer
  write leaves ``_temporary`` trees that must not be double-counted)
  and must fail FAST on non-POSIX roots instead of deep inside a walk.
- ``_write_quantizer_gen`` writes via temp-dir + rename so a retried
  generation can never leave stale sibling files for the recursive
  reader to pick up as duplicate rows.

No Spark session needed — these are pure driver-side reads.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as paq
import pytest

from data_ingestion_spark.functions.similarity import (
    _parquet_rows,
    _require_local_path,
    _stats_local,
)


def _write(path: str, n: int, start: int = 0) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    paq.write_table(
        pa.table({"x": pa.array(range(start, start + n), pa.int64())}), path
    )


def test_parquet_rows_exact_and_recursive(tmp_path):
    root = str(tmp_path / "seg")
    _write(os.path.join(root, "part-0.parquet"), 7)
    _write(os.path.join(root, "sub", "part-1.parquet"), 5)
    assert _parquet_rows(root) == 12


def test_parquet_rows_skips_committer_temp_and_hidden(tmp_path):
    root = str(tmp_path / "seg")
    _write(os.path.join(root, "part-0.parquet"), 3)
    # a crashed Hadoop-committer attempt and editor junk must not count
    _write(os.path.join(root, "_temporary", "0", "part-9.parquet"), 100)
    _write(os.path.join(root, ".hidden.parquet"), 50)
    _write(os.path.join(root, "_started_123.parquet"), 20)
    assert _parquet_rows(root) == 3


def test_parquet_rows_missing_path_is_zero(tmp_path):
    assert _parquet_rows(str(tmp_path / "nope")) == 0


def test_stats_local_reads_one_row_and_skips_markers(tmp_path):
    stats = str(tmp_path / "stats")
    os.makedirs(stats)
    paq.write_table(
        pa.table({"n_docs": pa.array([42.0]), "buckets": pa.array([8])}),
        os.path.join(stats, "part-0.parquet"),
    )
    open(os.path.join(stats, "_SUCCESS"), "w").close()
    got = _stats_local(stats)
    assert got["n_docs"] == 42.0 and got["buckets"] == 8


def test_require_local_path_rejects_remote_schemes(tmp_path):
    for bad in ("hdfs://nn/x", "s3://bucket/x", "s3a://bucket/x"):
        with pytest.raises(ValueError, match="POSIX-local"):
            _require_local_path(bad)
    # bare paths and explicit file: URIs are the supported roots
    _require_local_path(str(tmp_path))
    _require_local_path("file:///tmp/x")


def test_quantizer_gen_atomic_and_clean(tmp_path):
    from data_ingestion_spark.functions.pq import _write_quantizer_gen

    root = str(tmp_path / "pqroot")
    os.makedirs(root)
    C = np.arange(8.0).reshape(2, 4)
    CB = np.arange(2 * 3 * 2, dtype=float).reshape(2, 3, 2)
    rel = _write_quantizer_gen(None, root, C, CB)
    gen = os.path.join(root, rel)
    # exactly the two sub-tables, no temp leftovers anywhere
    assert sorted(os.listdir(gen)) == ["codebooks", "quantizer"]
    assert [n for n in os.listdir(os.path.dirname(gen)) if "inprogress" in n] == []
    # a second generation lands beside, numbered +1
    rel2 = _write_quantizer_gen(None, root, C, CB)
    assert rel2 != rel and os.path.isdir(os.path.join(root, rel2))
    # retry semantics: a stale half-written temp from a crashed prior
    # attempt at the SAME generation name is replaced wholesale, so the
    # committed dir can never merge with leftovers (mode-overwrite)
    stale_tmp = os.path.join(root, "quantizers", "q_000002.inprogress")
    _write(os.path.join(stale_tmp, "quantizer", "stale-sibling.parquet"), 99)
    rel3 = _write_quantizer_gen(None, root, C, CB)
    assert rel3.endswith("q_000002")
    files = os.listdir(os.path.join(root, rel3, "quantizer"))
    assert files == ["part-00000.parquet"]
    assert not os.path.exists(stale_tmp)


def test_shadow_counts_one_pass_semantics(spark):
    """_shadow_counts (r18): the single-aggregation replacement for
    index_report's per-segment join+count loops must reproduce the
    loop semantics exactly — per-position DISTINCT ids (band stores
    repeat an id once per band), 'shadowed' means any strictly newer
    position holds the id (tombstones included as shadowers), the
    newest position and tombstone positions report 0."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.similarity import _shadow_counts

    rows = [
        # pos 0: ids 1,2,3 (id 1 repeated band-style -> counted once)
        (0, 1), (0, 1), (0, 2), (0, 3),
        # pos 1: ids 2,4 -> id 2 shadows pos 0's copy
        (1, 2), (1, 4),
        # pos 2 (tombstone): ids 1,4 -> shadows pos 0's 1 and pos 1's 4
        (2, 1), (2, 4),
        # pos 3 (newest): id 5 only
        (3, 5),
    ]
    pairs = spark.createDataFrame(rows, "__pos long, __id long")
    got = _shadow_counts(pairs, [0, 1, 2, 3], {2})
    # pos 0: ids 1 (by tomb at 2) + 2 (by pos 1) = 2; pos 1: id 4 (by
    # tomb at 2) = 1; pos 2 tombstone -> 0 by definition; pos 3 newest -> 0
    assert got == [2, 1, 0, 0]
    # no non-tombstone older segment -> no Spark job, all zeros
    assert _shadow_counts(pairs, [7], set()) == [0]
    assert _shadow_counts(pairs, [0, 1], {0}) == [0, 0]


def test_band_report_legacy_rows_fallback_uses_footers(spark, tmp_path):
    """index_report on a pre-r17 band-store manifest (no seg_rows):
    the -1 fallback must report exact per-segment rows — now read
    from parquet footer metadata instead of a count job (r18)."""
    import json

    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.dedup import write_band_store
    from data_ingestion_spark.functions.similarity import (
        index_current_path,
        index_report,
    )

    docs = spark.range(0, 30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("band text payload "), F.col("id")).alias("text"),
    )
    root = str(tmp_path / "bands")
    write_band_store(docs, root)
    cur = index_current_path(root)
    mpath = os.path.join(cur, "MANIFEST.json")
    with open(mpath) as f:
        m = json.load(f)
    recorded = m.pop("seg_rows")  # age the manifest to the r16 shape
    with open(mpath, "w") as f:
        json.dump(m, f)
    rep = index_report(spark, root).collect()
    assert [r.rows for r in rep] == [int(n) for n in recorded]
