"""IVF-PQ at-rest vector serving — the billion-vector scale path.

The store family so far trades recall for pruning with multi-table
sign-LSH (``AnnStore``: t pointer copies per vector) and cuts probed
bytes 4x with SQ8 (``write_quantized``). IVF-PQ is the third classic
point in that design space (Jegou et al. 2011, "Product Quantization
for Nearest Neighbor Search" — the FAISS ``IVFxx,PQyy`` layout):

- **IVF**: a coarse k-means quantizer assigns every vector to ONE
  cell; the cell is a parquet partition key, so a probe reads
  ``n_probe / n_cells`` of the corpus — no pointer copies at rest
  (LSH pays t×; IVF pays 1×).
- **PQ**: inside each cell a vector is stored as ``m`` one-byte-ish
  codes (each subspace quantized against its own 256-centroid
  codebook, trained on RESIDUALS vector − cell-centroid): a 64-dim
  float32 embedding (256 B) becomes ``m=8`` smallints — 16-32x fewer
  scanned bytes than raw, 4-8x fewer than SQ8.
- **ADC** (asymmetric distance computation): at probe time the query
  is never encoded — per probed cell a tiny ``m × k_pq`` table of
  exact squared distances from the query's residual to every codeword
  is computed DRIVER-side (numpy over a few thousand floats) and
  broadcast; each stored code then scores with ``m`` array lookups —
  a pure JVM higher-order expression inside whole-stage codegen, no
  Python anywhere in the scan.
- **Exact re-score**: the ADC top-``keep`` candidates fetch their raw
  floats from an id-hash-partitioned sidecar (the ``write_quantized``
  raw/ discipline) and re-rank by EXACT cosine — PQ decides what to
  read, never what to answer.

Vectors are L2-NORMALIZED before coarse assignment and encoding
(raw floats in the sidecar stay original): on unit vectors
``L2² = 2 − 2·cos``, so the ADC ordering is monotone in cosine and
the L2-trained quantizers serve the engine's cosine contract.

Training is a deterministic driver-side Lloyd's k-means over a
BOUNDED sample (``max_fit_rows``, TakeOrdered by a hash of the id —
no full sort): codebook quality needs a representative sample, not
the corpus, and determinism (fixed spread init, fixed iteration
count, no RNG) is what lets the correctness driver re-run a build
and get the same store. Encoding the FULL corpus is executor-side
vectorized numpy over Arrow batches (a 256-way argmin per subspace
is the textbook case where a pandas UDF is the right tool).

100 TB arithmetic: 10^9 × 768-dim float32 = 3 TB raw. IVF-PQ at
m=48: 48 GB of codes + the raw sidecar only candidates ever read.
A probe at n_cells=32768 (auto ≈ sqrt(n)), n_probe=32 scans
~0.1 % of 48 GB ≈ 50 MB of codes, scores them with 48 JVM lookups
each, and fetches ``keep`` raw rows. Reference anchor: the sinks the
reference writes to run HNSW/IVF inside the service (Weaviate
P:341-349); this is the engine-side equivalent for corpus-scale
batch retrieval.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

from .similarity import brute_force_topk

DEFAULT_M = 8
DEFAULT_PQ_K = 256
DEFAULT_MAX_FIT_ROWS = 50_000
DEFAULT_RAW_ID_BUCKETS = 64
#: probe-time driver collect is bounded by ``keep`` candidate rows;
#: refuse keeps past this so a mis-dialed caller cannot OOM the driver
#: (the max_eval_rows message discipline).
MAX_KEEP = 100_000
#: probe_batch broadcasts one m×k_pq ADC table per (query, probed
#: cell): 512 × 4 × 8 × 256 doubles ≈ 33 MB at default geometry —
#: the cap keeps the broadcast bounded; split bigger batches.
MAX_BATCH_QUERIES = 512


def _lloyd(X: np.ndarray, k: int, iters: int = 12) -> np.ndarray:
    """Deterministic Lloyd's k-means: spread init (every n/k-th row of
    the hash-ordered sample — no RNG), fixed iteration count, empty
    clusters keep their previous centroid. Distances via the
    ``|x|² − 2xCᵀ + |C|²`` matmul form, never an n×k×d broadcast."""
    n = len(X)
    if k > n:
        raise ValueError(f"k-means k={k} exceeds {n} fit rows")
    C = X[np.linspace(0, n - 1, k).round().astype(int)].copy()
    xsq = (X * X).sum(axis=1)
    for _ in range(iters):
        d = xsq[:, None] - 2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                C[j] = X[mask].mean(axis=0)
    return C


def _normalize(X: np.ndarray) -> np.ndarray:
    nrm = np.sqrt((X * X).sum(axis=1, keepdims=True))
    nrm[nrm == 0.0] = 1.0  # zero vectors pass through unscaled
    return X / nrm


_CODES_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("ivf_cell", IntegerType()),
        StructField("codes", ArrayType(ShortType())),
    ]
)


class IvfPqStore:
    """Read/serve handle over a written IVF-PQ root (see module
    docstring for the layout rationale). Directory layout (SEGMENTED
    since the O(delta) maintenance landed — seg is an integer
    partition directory, so generation order is plain ``>``)::

        root/_pq_meta.json   geometry + segment/tombstone registry
        root/quantizer/      parquet (cell, centroid) — n_cells rows
        root/codebooks/      parquet (subspace, code, centroid)
        root/codes/seg=N/    parquet PARTITIONED BY ivf_cell (id, codes)
        root/raw/seg=N/      parquet partitioned by __rb (id, vec)
        root/ids/seg=N/      id-only shadow sidecar (delta-sized);
                             a TOMBSTONE segment is ids/ alone

    Quantizers are FROZEN at build time (upserts encode deltas against
    them; ``compact_ivfpq_store`` is the re-train point). Quantizer/
    codebook loads are driver-side and BOUNDED (n_cells + m·k_pq
    rows), cached on the handle.
    """

    def __init__(self, spark, root: str):
        self.spark, self.root = spark, root.rstrip("/")
        meta_path = os.path.join(self.root, "_pq_meta.json")
        try:
            with open(meta_path, encoding="utf-8") as f:
                self.meta = json.load(f)
        except OSError as e:
            raise FileNotFoundError(
                f"no _pq_meta.json under {root!r} — not an IvfPqStore "
                "written by write_ivfpq_store"
            ) from e
        self._centroids: np.ndarray | None = None
        self._codebooks: np.ndarray | None = None

    # -- driver-side geometry (bounded collects) ----------------------
    def _load_quantizers(self) -> tuple[np.ndarray, np.ndarray]:
        if self._centroids is None:
            q = self.spark.read.parquet(os.path.join(self.root, "quantizer"))
            rows = q.orderBy("cell").collect()  # n_cells rows
            self._centroids = np.array([r.centroid for r in rows])
            cb = self.spark.read.parquet(os.path.join(self.root, "codebooks"))
            m, k_pq = self.meta["m"], self.meta["k_pq"]
            ds = self.meta["dim"] // m
            arr = np.zeros((m, k_pq, ds))
            for r in cb.collect():  # m * k_pq rows
                arr[r.subspace, r.code] = r.centroid
            self._codebooks = arr
        return self._centroids, self._codebooks

    # -- serving -------------------------------------------------------
    def _shadow_filter(self, scored: DataFrame) -> DataFrame:
        """Last-wins shadowing over segmented candidates: a candidate
        (id, seg) is dead iff ANY newer segment's ids/ sidecar lists
        the id — replacement (newer data segment) and deletion
        (tombstone segment: ids only, no codes, so no scan ever reads
        it as data) fall out of the same rule, and a post-tombstone
        re-add resurrects because its segment is newer still. The
        shadow side is the union of NON-BASE sidecars — delta-sized
        under the upsert contract — and broadcasts; applied BEFORE
        the top-keep so dead rows never crowd out live candidates.
        Single-segment stores skip the join entirely (plan identical
        to the unsegmented layout)."""
        segs = self.meta["segments"]
        if len(segs) <= 1:
            return scored
        shadow = (
            self.spark.read.parquet(os.path.join(self.root, "ids"))
            # committed-only: a crashed upsert's orphan seg dir (data
            # written, meta never swapped) must not shadow anything
            .filter(F.col("seg").isin(segs))
            .filter(F.col("seg") > min(segs))
            .select(F.col("id").alias("__sid"), F.col("seg").alias("__sseg"))
        )
        return scored.join(
            F.broadcast(shadow),
            (scored["id"] == F.col("__sid")) & (F.col("__sseg") > scored["seg"]),
            "left_anti",
        )

    def _scored_codes(self, lut_df: DataFrame, probed: list[int], *extra_cols: str) -> DataFrame:
        """Shadow-filtered ADC scores over the pruned code scan:
        (..extra_cols.., id, seg, adc). The scan prunes on ivf_cell
        (a partition column — PartitionFilters, pytest-asserted);
        scoring is m JVM array lookups inside codegen."""
        codes = self.spark.read.parquet(os.path.join(self.root, "codes"))
        scored = (
            # seg IN committed: crash-debris segment dirs are invisible
            # (both are partition filters — the scan prunes on each)
            codes.filter(F.col("seg").isin(self.meta["segments"]))
            .filter(F.col("ivf_cell").isin(probed))
            .join(F.broadcast(lut_df), "ivf_cell")
            .select(
                *extra_cols,
                *self.meta.get("metadata_cols", []),
                "id",
                "seg",
                F.aggregate(
                    F.zip_with(
                        "codes",
                        "lut",
                        lambda c, l: F.element_at(l, c.cast("int") + 1),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("adc"),
            )
        )
        return self._shadow_filter(scored)

    def _query_luts(self, qn: np.ndarray, n_probe: int):
        """(probed cells, per-cell m×k_pq ADC tables) for one
        normalized query — numpy over a few KB, driver-side."""
        C, CB = self._load_quantizers()
        m = self.meta["m"]
        ds = self.meta["dim"] // m
        order = (((C - qn) ** 2).sum(axis=1)).argsort(kind="stable")
        probed = [int(c) for c in order[:n_probe]]
        luts = []
        for c in probed:
            qr = (qn - C[c]).reshape(m, ds)
            # lut[s][j] = || qr_s - codebook[s][j] ||²  (m × k_pq floats)
            lut = ((qr[:, None, :] - CB) ** 2).sum(axis=2)
            luts.append((c, [[float(v) for v in row] for row in lut]))
        return luts

    def adc_candidates(
        self, qv: list[float], n_probe: int = 4, keep: int = 128,
        where=None,
    ) -> DataFrame:
        """(id, adc) — the ``keep`` best LIVE stored codes by
        asymmetric distance among the ``n_probe`` cells nearest the
        query (shadowed/deleted copies already excluded). Exposed
        separately so plans (pruning) and recall are testable without
        the raw-fetch stage."""
        if keep > MAX_KEEP:
            raise ValueError(
                f"keep={keep} exceeds MAX_KEEP={MAX_KEEP} — the probe "
                "collects keep candidate ids driver-side to price the raw "
                "sidecar's partition filter; lower keep (or raise MAX_KEEP "
                "deliberately)"
            )
        dim = self.meta["dim"]
        if len(qv) != dim:
            raise ValueError(f"query has {len(qv)} dims, store has {dim}")
        n_probe = min(n_probe, self.meta["n_cells"])
        q = np.asarray(qv, dtype=np.float64)
        nrm = np.sqrt((q * q).sum())
        qn = q / nrm if nrm > 0 else q
        luts = self._query_luts(qn, n_probe)
        lut_df = self.spark.createDataFrame(
            luts, "ivf_cell int, lut array<array<double>>"
        )
        scored = self._scored_codes(lut_df, [c for c, _ in luts])
        if where is not None:
            # metadata filter INSIDE the pruned scan, before the
            # top-keep — post-filter semantics on recall (same caveat
            # as AnnStore.probe(where=): widen n_probe to buy it back)
            scored = scored.filter(where)
        return (
            scored.orderBy(F.col("adc").asc(), F.col("id").asc())
            .limit(keep)
            .select("id", "seg", "adc")
        )

    def probe(
        self, qv: list[float], k: int = 5, n_probe: int = 4, keep: int = 128,
        where=None,
    ) -> DataFrame:
        """ADC candidates → exact cosine re-rank from the raw sidecar.
        Returns (id_col, score) — the ``AnnStore.probe`` contract
        (6dp-rounded score, id tiebreak). The candidate (id, seg) set
        (≤ keep rows) is collected driver-side to build the raw
        sidecar's partition filter — same bounded-collect discipline
        as ``AnnStore._raw_fetch``; the raw join keys on (id, seg) so
        a replaced id's STALE raw row (older segment) can never serve
        the re-rank."""
        if keep < k:
            raise ValueError(f"keep={keep} must be >= k={k}")
        cand = self.adc_candidates(qv, n_probe, keep, where=where)
        pairs = [(r.id, r.seg) for r in cand.select("id", "seg").collect()]
        if not pairs:
            return self.spark.createDataFrame(
                [], f"{self.meta['id_col']} bigint, score double"
            )
        rb = self.meta["raw_id_buckets"]
        buckets = sorted({_id_bucket(i, rb) for i, _ in pairs})
        from .similarity import dot_product

        cand_df = self.spark.createDataFrame(
            pairs, "id bigint, seg int"
        )
        raw = (
            self.spark.read.parquet(os.path.join(self.root, "raw"))
            .filter(F.col("__rb").isin(buckets))
            .join(F.broadcast(cand_df), ["id", "seg"])
            # zero-norm vectors have no cosine to any query — drop them
            # here rather than trip ANSI divide-by-zero in the re-rank
            .filter(dot_product(F.col("vec"), F.col("vec")) > 0)
        )
        qcol = F.array(*[F.lit(float(x)) for x in qv])
        out = brute_force_topk(raw, qcol, k, "id", "vec")
        return out.select(
            F.col("id").alias(self.meta["id_col"]), "score"
        )


    def probe_batch(
        self,
        queries_df: DataFrame,
        k: int = 5,
        n_probe: int = 4,
        keep: int = 128,
        query_id_col: str = "query_id",
        query_vec_col: str = "qvec",
        where=None,
    ) -> DataFrame:
        """Batch IVF-PQ serving — N queries in ONE plan (the
        ``AnnStore.probe_batch`` contract for the PQ layout; returns
        (query_id, id_col, score, rank), rank 1..k per query, 6dp
        score, id tiebreak; per query equals ``probe`` exactly —
        pytest-pinned).

        Plan shape: the query batch is collected driver-side (a
        serving batch, bounded by ``MAX_BATCH_QUERIES`` — the per-
        query ADC tables are what get broadcast: N·n_probe·m·k_pq
        doubles, 33 MB at the 512-query cap with default geometry,
        which is the reason for the cap), per-(query, cell) LUTs
        computed in numpy, ONE partition-pruned code scan over the
        UNION of probed cells (≤ n_cells literals regardless of batch
        size), a broadcast fan-out join on ivf_cell, ADC scoring as m
        JVM lookups, one window for per-query top-``keep``, then the
        exact re-rank: the candidate frame's raw-sidecar buckets are
        derived ENGINE-side (distinct ≤ raw_id_buckets rows — the
        collect is bounded by a store constant, never by batch size),
        the pruned raw scan broadcast-joins the candidates, and one
        window ranks exact cosine per query. The candidate subtree
        executes twice (bucket collect + join) — the measured
        lazy-recompute trade from the batch-quantized ledger
        (BENCH_NOTES r13/r14): it is a pruned scan + broadcast join,
        cheaper re-run than materialized."""
        if keep < k:
            raise ValueError(f"keep={keep} must be >= k={k}")
        if keep > MAX_KEEP:
            raise ValueError(
                f"keep={keep} exceeds MAX_KEEP={MAX_KEEP} — see probe()"
            )
        qid_type = queries_df.schema[query_id_col].dataType.simpleString()
        qrows = queries_df.select(query_id_col, query_vec_col).collect()
        if len(qrows) > MAX_BATCH_QUERIES:
            raise ValueError(
                f"probe_batch got {len(qrows)} queries; the per-query ADC "
                f"tables broadcast to every task, so batches are capped at "
                f"MAX_BATCH_QUERIES={MAX_BATCH_QUERIES} — split the batch "
                "(or raise the cap deliberately)"
            )
        if not qrows:
            return self.spark.createDataFrame(
                [], f"{query_id_col} {qid_type}, {self.meta['id_col']} bigint, "
                "score double, rank int"
            )
        dim = self.meta["dim"]
        n_probe = min(n_probe, self.meta["n_cells"])
        lut_rows, probed_union = [], set()
        for r in qrows:
            qv = [float(x) for x in r[query_vec_col]]
            if len(qv) != dim:
                raise ValueError(
                    f"query {r[query_id_col]!r} has {len(qv)} dims, "
                    f"store has {dim}"
                )
            q = np.asarray(qv, dtype=np.float64)
            nrm = np.sqrt((q * q).sum())
            qn = q / nrm if nrm > 0 else q
            for c, lut in self._query_luts(qn, n_probe):
                probed_union.add(c)
                lut_rows.append((r[query_id_col], c, lut))
        lut_df = self.spark.createDataFrame(
            lut_rows, f"{query_id_col} {qid_type}, ivf_cell int, lut array<array<double>>"
        )
        scored = self._scored_codes(lut_df, sorted(probed_union), query_id_col)
        if where is not None:
            # same post-filter semantics as probe(where=), per query
            scored = scored.filter(where)
        from pyspark.sql import Window

        w_adc = Window.partitionBy(query_id_col).orderBy(
            F.col("adc").asc(), F.col("id").asc()
        )
        cand = (
            scored.withColumn("__rn", F.row_number().over(w_adc))
            .filter(F.col("__rn") <= keep)
            .select(query_id_col, "id", "seg")
        )
        rb = self.meta["raw_id_buckets"]
        # bounded by the store constant raw_id_buckets, not batch size
        buckets = [
            r.b
            for r in cand.select(
                F.pmod(F.col("id"), F.lit(rb)).cast("int").alias("b")
            )
            .distinct()
            .collect()
        ]
        if not buckets:
            return self.spark.createDataFrame(
                [], f"{query_id_col} {qid_type}, {self.meta['id_col']} bigint, "
                "score double, rank int"
            )
        from .similarity import cosine, dot_product

        raw = (
            self.spark.read.parquet(os.path.join(self.root, "raw"))
            .filter(F.col("__rb").isin(sorted(buckets)))
            .filter(dot_product(F.col("vec"), F.col("vec")) > 0)
        )
        qvec_df = self.spark.createDataFrame(
            [(r[query_id_col], [float(x) for x in r[query_vec_col]]) for r in qrows],
            f"{query_id_col} {qid_type}, __qvec array<double>",
        )
        exact = (
            # (id, seg) keying: a replaced id's stale raw row (older
            # segment) can never serve the re-rank
            raw.join(F.broadcast(cand), ["id", "seg"])
            .join(F.broadcast(qvec_df), query_id_col)
            .select(
                query_id_col,
                "id",
                F.round(cosine(F.col("vec"), F.col("__qvec")), 6).alias("score"),
            )
        )
        w_final = Window.partitionBy(query_id_col).orderBy(
            F.col("score").desc(), F.col("id").asc()
        )
        return (
            exact.withColumn("rank", F.row_number().over(w_final))
            .filter(F.col("rank") <= k)
            .select(
                query_id_col,
                F.col("id").alias(self.meta["id_col"]),
                "score",
                "rank",
            )
        )


def _id_bucket(i: int, buckets: int) -> int:
    # mirror of the engine-side pmod(id, buckets) below — plain modulo
    # on the id keeps driver and executor bucket math trivially equal
    return int(i) % buckets


def _make_encoder(C_list: list, CB_list: list, ds: int, metadata_cols=()):
    """Arrow-batch encoder closure over FROZEN quantizers — shared by
    the base build and every delta upsert, so the two paths cannot
    disagree on what a code means. ``metadata_cols`` pass through
    untouched (the filtered-search substrate — they ride with the
    codes so a ``where=`` filter applies INSIDE the pruned scan,
    before the ADC top-keep)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Ce = np.asarray(C_list)
        CBe = np.asarray(CB_list)
        csq = (Ce * Ce).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            Xb = _normalize(np.array(list(pdf["vec"]), dtype=np.float64))
            cell = (
                (Xb * Xb).sum(axis=1)[:, None] - 2.0 * (Xb @ Ce.T) + csq[None, :]
            ).argmin(axis=1)
            Rb = Xb - Ce[cell]
            codes = np.empty((len(Xb), len(CBe)), dtype=np.int16)
            for s in range(len(CBe)):
                sub = Rb[:, s * ds : (s + 1) * ds]
                cb = CBe[s]
                codes[:, s] = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * (sub @ cb.T)
                    + (cb * cb).sum(axis=1)[None, :]
                ).argmin(axis=1)
            out = {
                "id": pdf["id"].astype("int64"),
                "ivf_cell": cell.astype("int32"),
                "codes": list(codes),
            }
            for c in metadata_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return encode


def _write_segment(
    src: DataFrame,
    root: str,
    seg: int,
    C_list: list,
    CB_list: list,
    ds: int,
    raw_id_buckets: int,
    metadata_cols=(),
) -> None:
    """Write one data segment: codes/seg=N (partitioned by ivf_cell),
    raw/seg=N (partitioned by id-hash bucket), ids/seg=N (the shadow
    sidecar — id list only, delta-sized). ``seg`` is an integer so
    partition discovery types it and generation order is plain ``>``."""
    schema = StructType(
        list(_CODES_SCHEMA.fields)
        + [src.schema[c] for c in metadata_cols]
    )
    encoded = src.mapInPandas(
        _make_encoder(C_list, CB_list, ds, metadata_cols), schema
    )
    encoded.write.mode("overwrite").partitionBy("ivf_cell").parquet(
        os.path.join(root, "codes", f"seg={seg}")
    )
    # raw stays lean (id, vec): metadata lives with the codes, where
    # the where= filter runs — and compaction recovers it from there
    src.select("id", "vec").withColumn(
        "__rb", F.pmod(F.col("id"), F.lit(raw_id_buckets)).cast("int")
    ).write.mode("overwrite").partitionBy("__rb").parquet(
        os.path.join(root, "raw", f"seg={seg}")
    )
    src.select("id").write.mode("overwrite").parquet(
        os.path.join(root, "ids", f"seg={seg}")
    )


def _write_meta(root: str, meta: dict) -> None:
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, "_pq_meta.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(root, "_pq_meta.json"))


def upsert_ivfpq_store(vectors: DataFrame, root: str) -> IvfPqStore:
    """O(delta) IVF-PQ maintenance: encode ONLY the delta with the
    store's FROZEN quantizers (the classic FAISS ``add`` contract —
    coarse centroids and codebooks are fixed at build time; quality
    for drifted deltas degrades gracefully because serving re-scores
    exactly from raw, and ``compact_ivfpq_store`` is the designated
    re-train point), land it as a new segment, and register it in the
    meta. REPLACE semantics per id: the new segment's ``ids/`` sidecar
    shadows every older copy at serve time (last-wins, the LSM
    discipline) — no base rewrite, no global re-encode. Returns a
    fresh handle over the grown store."""
    spark = vectors.sparkSession
    store = IvfPqStore(spark, root)
    meta = store.meta
    C, CB = store._load_quantizers()
    ds = meta["dim"] // meta["m"]
    seg = max(meta["segments"]) + 1
    mcols = tuple(meta.get("metadata_cols", ()))
    src = vectors.select(
        F.col(meta["id_col"]).cast("bigint").alias("id"),
        F.col(meta["vec_col"]).alias("vec"),
        *mcols,
    ).dropDuplicates(["id"])  # two same-seg copies would BOTH be live
    # (same generation — neither shadows the other); arbitrary winner,
    # pre-dedup upstream with an ordering column when it matters

    _write_segment(
        src, root, seg, C.tolist(), CB.tolist(), ds, meta["raw_id_buckets"],
        metadata_cols=mcols,
    )
    meta["segments"] = meta["segments"] + [seg]
    _write_meta(root, meta)
    return IvfPqStore(spark, root)


def delete_ivfpq_ids(spark, root: str, ids_df: DataFrame) -> IvfPqStore:
    """Row-level delete on the PQ store — a TOMBSTONE segment: an
    ``ids/`` sidecar with NO codes and NO raw payload. Last-wins
    shadowing then hides every older copy of the id from
    probe/probe_batch (the tombstone itself is never a data source —
    no codes dir exists for it, so no scan ever reads it); a later
    upsert of the same id RESURRECTS it (its segment is newer than
    the tombstone). O(delete set); the physical rows drop at
    ``compact_ivfpq_store``. The takedown/GDPR path the at-rest
    layouts all share (mirrors similarity.delete_ann_ids)."""
    store = IvfPqStore(spark, root)
    meta = store.meta
    seg = max(meta["segments"]) + 1
    ids_df.select(
        F.col(meta["id_col"]).cast("bigint").alias("id")
    ).write.mode("overwrite").parquet(os.path.join(root, "ids", f"seg={seg}"))
    meta["segments"] = meta["segments"] + [seg]
    meta["tombstones"] = meta.get("tombstones", []) + [seg]
    _write_meta(root, meta)
    return IvfPqStore(spark, root)


def compact_ivfpq_store(spark, root: str, out_root: str, **train_kwargs) -> IvfPqStore:
    """Fold a segmented PQ store into a fresh single-segment store at
    ``out_root`` — resolve last-wins survivors (tombstoned ids drop:
    their latest segment has no raw row; replaced ids keep only the
    newest copy) and RE-TRAIN quantizers on the surviving corpus (the
    designated drift-refresh point, the analogue of the SQ8 store's
    re-quantizing compaction). ``out_root`` must differ from ``root``:
    the fold is a rebuild, not an in-place mutation — swap the two
    directories (or a symlink) atomically outside if readers are
    live; the managed CURRENT-pointer discipline lives in the
    versioned ANN roots, and this layout deliberately stays simpler."""
    if os.path.abspath(out_root) == os.path.abspath(root):
        raise ValueError(
            "compact_ivfpq_store: out_root must differ from root — the fold "
            "rebuilds into a fresh directory (swap atomically outside)"
        )
    store = IvfPqStore(spark, root)
    meta = store.meta
    mcols = list(meta.get("metadata_cols", ()))
    latest = (
        spark.read.parquet(os.path.join(root, "ids"))
        .filter(F.col("seg").isin(meta["segments"]))  # committed only
        .groupBy("id")
        .agg(F.max("seg").alias("seg"))
    )
    live = spark.read.parquet(os.path.join(root, "raw")).join(
        latest, ["id", "seg"]
    )
    if mcols:
        # metadata rides the CODES segments (not the raw sidecar) —
        # recover each survivor's metadata from its own segment so a
        # filtered store stays filterable across the fold
        md = spark.read.parquet(os.path.join(root, "codes")).select(
            "id", "seg", *mcols
        )
        live = live.join(md, ["id", "seg"])
    kwargs = dict(
        n_cells=meta["n_cells"],
        m=meta["m"],
        k_pq=meta["k_pq"],
        raw_id_buckets=meta["raw_id_buckets"],
        metadata_cols=tuple(mcols),
    )
    kwargs.update(train_kwargs)
    return write_ivfpq_store(
        live.select(
            F.col("id").alias(meta["id_col"]),
            F.col("vec").alias(meta["vec_col"]),
            *mcols,
        ),
        out_root,
        id_col=meta["id_col"],
        vec_col=meta["vec_col"],
        **kwargs,
    )


def write_ivfpq_store(
    vectors: DataFrame,
    root: str,
    n_cells: int | str = 16,
    m: int = DEFAULT_M,
    k_pq: int = DEFAULT_PQ_K,
    max_fit_rows: int = DEFAULT_MAX_FIT_ROWS,
    iters: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    raw_id_buckets: int = DEFAULT_RAW_ID_BUCKETS,
    metadata_cols: tuple = (),
) -> IvfPqStore:
    """Train (driver-side, bounded, deterministic) + encode
    (executor-side, Arrow-batched) + write the IVF-PQ layout.

    The fit sample is the ``max_fit_rows`` smallest ``md5(id)`` rows —
    a TakeOrdered (map-side heap, no full sort) that is deterministic
    across runs and engines. ``n_cells`` and ``k_pq`` are capped by
    the fit-row count with a loud error / silent-min respectively
    (a codebook can't hold more centroids than training points).
    """
    spark = vectors.sparkSession
    sample = (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .orderBy(F.md5(F.col("id").cast("string")).asc(), F.col("id").asc())
        .limit(max_fit_rows)
        .collect()
    )
    if len(sample) < 2:
        raise ValueError(
            f"write_ivfpq_store: corpus has {len(sample)} row(s); "
            "IVF-PQ needs at least 2 vectors to train"
        )
    X = np.array([r.vec for r in sample], dtype=np.float64)
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(
            f"dim={dim} is not divisible by m={m} subspaces — pick m "
            "dividing the embedding width"
        )
    n_fit = len(X)
    if n_cells == "auto":
        # the IVF sqrt rule (kmeans_ivf_build's dial): n_probe cells
        # of ~sqrt(n) rows each make probe cost grow with sqrt(corpus)
        # — eager (one count() job) like the IVF builder, and capped
        # by the fit rows with the same loud warning
        n = vectors.count()
        auto_k = max(2, int(round(n ** 0.5)))
        n_cells = max(1, min(auto_k, n_fit))
        if n_cells < auto_k:
            import warnings

            warnings.warn(
                f"write_ivfpq_store: auto n_cells {auto_k} capped to "
                f"{n_cells} by the fit-sample size — raise max_fit_rows",
                RuntimeWarning,
                stacklevel=2,
            )
    if not isinstance(n_cells, int):
        raise ValueError(f"n_cells must be an int or 'auto', got {n_cells!r}")
    if n_cells > n_fit:
        raise ValueError(
            f"n_cells={n_cells} exceeds the {n_fit} rows available to fit "
            "on — lower n_cells or raise max_fit_rows"
        )
    k_pq = min(k_pq, n_fit)
    Xn = _normalize(X)
    C = _lloyd(Xn, n_cells, iters)
    # residuals against each row's own cell
    d = ((Xn[:, None, :] - C[None, :, :]) ** 2).sum(axis=2) if n_cells * n_fit * dim <= 5e7 else None
    if d is not None:
        assign = d.argmin(axis=1)
    else:
        xsq = (Xn * Xn).sum(axis=1)
        assign = (xsq[:, None] - 2.0 * (Xn @ C.T) + (C * C).sum(axis=1)[None, :]).argmin(axis=1)
    R = Xn - C[assign]
    ds = dim // m
    CB = np.stack(
        [_lloyd(R[:, s * ds : (s + 1) * ds], k_pq, iters) for s in range(m)]
    )

    # ---- executor-side full-corpus encode (Arrow batches) ----------
    src = vectors.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(vec_col).alias("vec"),
        *metadata_cols,
    )
    _write_segment(
        src, root, 0, C.tolist(), CB.tolist(), ds, raw_id_buckets,
        metadata_cols=metadata_cols,
    )
    spark.createDataFrame(
        [(int(c), [float(v) for v in C[c]]) for c in range(n_cells)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(root, "quantizer"))
    spark.createDataFrame(
        [
            (s, j, [float(v) for v in CB[s, j]])
            for s in range(m)
            for j in range(k_pq)
        ],
        "subspace int, code int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(root, "codebooks"))
    meta = {
        "dim": int(dim),
        "m": int(m),
        "k_pq": int(k_pq),
        "n_cells": int(n_cells),
        "id_col": id_col,
        "vec_col": vec_col,
        "raw_id_buckets": int(raw_id_buckets),
        "n_fit": int(n_fit),
        "segments": [0],
        "tombstones": [],
        "metadata_cols": list(metadata_cols),
    }
    _write_meta(root, meta)
    return IvfPqStore(spark, root)


def maybe_compact_ivfpq_store(
    spark, root: str, max_segments: int, **train_kwargs
) -> bool:
    """Auto-compaction trigger for upsert loops (the X1 dial on the
    PQ layout): when the live segment list exceeds ``max_segments``,
    fold into ``root + '__compact'`` and SWAP it in (rename-based —
    the caller must be the root's only writer, which the streaming
    fold is by contract; the versioned ANN roots own the concurrent-
    reader story, this layout deliberately stays single-version).
    The ``_last_batch_id`` replay marker is carried across the swap.
    Returns True when a fold happened."""
    import shutil

    recover_ivfpq_root(root)
    store = IvfPqStore(spark, root)
    if len(store.meta["segments"]) <= max_segments:
        return False
    tmp = root.rstrip("/") + "__compact"
    shutil.rmtree(tmp, ignore_errors=True)
    compact_ivfpq_store(spark, root, tmp, **train_kwargs)
    marker = os.path.join(root, "_last_batch_id")
    if os.path.exists(marker):
        shutil.copy(marker, os.path.join(tmp, "_last_batch_id"))
    old = root.rstrip("/") + "__old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(root, old)
    os.rename(tmp, root)
    shutil.rmtree(old, ignore_errors=True)
    return True


def recover_ivfpq_root(root: str) -> bool:
    """Crash recovery for the rename swap: a crash BETWEEN the two
    renames leaves no live root but a COMPLETE store at
    ``root__compact`` (newest, preferred) or ``root__old`` (the
    pre-fold store, if the crash hit before the second rename could
    start). Called by ``maybe_compact_ivfpq_store`` and the streaming
    fold before any decision that keys off the root's existence — a
    missing root must mean 'never built', not 'mid-swap crash', or
    the fold would rebuild a fresh base over recoverable data.
    Returns True when a recovery happened."""
    import shutil

    if os.path.exists(os.path.join(root, "_pq_meta.json")):
        return False
    for cand in (root.rstrip("/") + "__compact", root.rstrip("/") + "__old"):
        if os.path.exists(os.path.join(cand, "_pq_meta.json")):
            shutil.rmtree(root, ignore_errors=True)
            os.rename(cand, root)
            for leftover in (
                root.rstrip("/") + "__compact",
                root.rstrip("/") + "__old",
            ):
                shutil.rmtree(leftover, ignore_errors=True)
            return True
    return False


def pq_report(spark, root: str) -> DataFrame:
    """Operational report over a segmented IVF-PQ root — the
    ``index_report`` observability on the third layout (pairs with
    the ``max_segments`` auto-compaction dial): one row per segment,
    oldest → newest, with

    - ``segment``      — the integer generation;
    - ``kind``         — 'data' or 'tombstone';
    - ``rows``         — ids in the segment's sidecar;
    - ``bytes``        — on-disk bytes (codes + raw + ids);
    - ``shadowed_ids`` — how many of THIS segment's ids a newer
      segment replaces/deletes: the dead weight a compaction would
      reclaim (serve-time read amplification is the segment count;
      this is the wasted fraction of it).

    Driver-side shaping is bounded by the segment count; id counts
    are Spark jobs over the tiny sidecars, never the codes."""
    store = IvfPqStore(spark, root)
    meta = store.meta
    segs = sorted(meta["segments"])
    tombs = set(meta.get("tombstones", []))

    def _du(seg: int) -> int:
        total = 0
        for sub in ("codes", "raw", "ids"):
            d = os.path.join(root, sub, f"seg={seg}")
            for base, _, files in os.walk(d):
                for f in files:
                    total += os.path.getsize(os.path.join(base, f))
        return total

    all_ids = spark.read.parquet(os.path.join(root, "ids")).filter(
        F.col("seg").isin(segs)  # crash debris never counts
    )
    rows = []
    for seg in segs:
        mine = all_ids.filter(F.col("seg") == seg).select("id")
        n = mine.count()
        newer = all_ids.filter(F.col("seg") > seg).select("id").distinct()
        shadowed = mine.join(newer, "id", "left_semi").count()
        rows.append(
            (
                int(seg),
                "tombstone" if seg in tombs else "data",
                int(n),
                int(_du(seg)),
                int(shadowed),
            )
        )
    return spark.createDataFrame(
        rows,
        "segment int, kind string, rows bigint, bytes bigint, shadowed_ids bigint",
    )
