"""Round-17 stress: the band store's full lifecycle at corpus scale —
build a 1M-doc at-rest generation into the store, upsert a 100k
admitted delta, tombstone a 50k takedown set, serve the gate against
the shadow-resolved live bands, then COMPACT and serve again.

Validates the L1/L2 posture (SURVEY §2.23):

- delete is O(delete-set): an id-list segment, no live rewrite;
- the tombstoned gate pays k shadow anti-joins (k = segment count,
  bounded by maybe_compact) on top of the r16 multi-path scan;
- compaction folds to ONE clustered segment and the post-fold gate
  is both row-identical and back on the no-shadow fast path.

The delta plants cohorts at known rates over a per-doc-UNIQUE token
space (see _utext): the gate after delete must admit the novel half
PLUS the exact re-entries of tombstoned docs, drop the near-dups of
live docs, and the post-compaction admit count must match exactly.

Usage: python scripts/stress_band_lifecycle.py [--n-rest 1000000
    --n-delta 100000 --n-del 50000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from data_ingestion_spark.functions.dedup import (
    compact_band_store,
    delete_band_ids,
    novelty_gate_indexed,
    upsert_band_store,
    write_band_store,
)
from data_ingestion_spark.session import get_spark


def _utext(prefix: str, tokens_per_doc: int = 30):
    """Per-doc-UNIQUE token space: token_j = prefix + doc_id*64 + j —
    no two docs share a single shingle, so the only band collisions
    in this stress are the planted exact/near pairs. (stress_novelty's
    shared-dialect generator is the banding-recall stress; this one
    isolates the LIFECYCLE mechanics: an exact re-entry of a
    tombstoned doc must collide with nothing else.)"""
    tok = F.transform(
        F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
        lambda j: F.concat(
            F.lit(prefix), (F.col("doc_id") * 64 + j).cast("string")
        ),
    )
    return F.concat_ws(" ", tok)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-rest", type=int, default=1_000_000)
    ap.add_argument("--n-delta", type=int, default=100_000)
    ap.add_argument("--n-del", type=int, default=50_000)
    args = ap.parse_args()
    spark = get_spark("stress-band-lifecycle", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    rest = spark.range(args.n_rest).select(
        F.col("id").alias("doc_id")
    ).select("doc_id", _utext("w").alias("text"))
    q = args.n_delta // 4
    # exact re-entries target the TOMBSTONED prefix (doc_id < n_del),
    # so after the delete they must be admitted
    exact = rest.filter(F.col("doc_id") < q).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    # near-dups target LIVE docs (>= n_del), so they must still drop
    near = rest.filter(
        F.col("doc_id").between(args.n_del, args.n_del + q - 1)
    ).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" edited tail")).alias("text"),
    )
    novel = spark.range(args.n_delta - 2 * q).select(
        (F.col("id") + 30_000_000).alias("doc_id")
    ).select("doc_id", _utext("z").alias("text"))
    delta = exact.unionByName(near).unionByName(novel)

    root = os.path.join(tempfile.gettempdir(), "stress_band_root")
    shutil.rmtree(root, ignore_errors=True)
    rec: dict = {
        "case": "band_lifecycle_1m_rest",
        "n_rest": args.n_rest,
        "n_delta": args.n_delta,
        "n_del": args.n_del,
    }

    t0 = time.time()
    write_band_store(rest.filter(F.col("doc_id") >= args.n_delta), root)
    rec["build_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    upsert_band_store(rest.filter(F.col("doc_id") < args.n_delta), root)
    rec["upsert_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    delete_band_ids(
        spark.range(args.n_del).select(F.col("id").alias("doc_id")), root
    )
    rec["delete_sec"] = round(time.time() - t0, 1)

    # exact re-entries of tombstoned docs (planted prefix < q <= n_del)
    # admit; exact copies are signature-identical so those cohorts are
    # EXACT; near-dups of live docs drop at the LSH recall rate
    # (~99.9% here: j~0.9 tail edit, miss = (1-j^2)^4), reported as a
    # rate, not asserted exact
    t0 = time.time()
    admitted = novelty_gate_indexed(delta, root).select("doc_id")
    n_admit_shadowed = admitted.count()
    rec["gate_shadowed_sec"] = round(time.time() - t0, 1)
    adm_exact_deleted = admitted.filter(
        F.col("doc_id").between(10_000_000, 10_000_000 + q - 1)
    ).count()
    adm_near = admitted.filter(
        F.col("doc_id").between(20_000_000, 29_999_999)
    ).count()
    adm_novel = admitted.filter(F.col("doc_id") >= 30_000_000).count()
    rec["admitted_shadowed"] = n_admit_shadowed
    rec["novel_admitted"] = f"{adm_novel}/{args.n_delta - 2 * q}"
    rec["deleted_reentries_admitted"] = f"{adm_exact_deleted}/{q}"
    rec["near_dup_misses"] = adm_near
    rec["near_recall"] = round(1.0 - adm_near / q, 4)

    t0 = time.time()
    compact_band_store(spark, root, retain=2)
    rec["compact_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    n_admit_folded = novelty_gate_indexed(delta, root).count()
    rec["gate_folded_sec"] = round(time.time() - t0, 1)
    rec["admitted_folded"] = n_admit_folded
    rec["all_exact"] = (
        adm_novel == args.n_delta - 2 * q
        and adm_exact_deleted == q
        and n_admit_shadowed == n_admit_folded
    )
    print(json.dumps(rec), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
