"""Training-export stress at 1M documents (SCALE.md §10 evidence).

Runs the corpus-export layer (functions/corpus.py) on a synthetic
1M-doc corpus (the stress_dedup generator: pure SQL expressions, no
driver-side data) and times each stage end-to-end with a noop write:

1. the export capstone plan shape at 1M: length gate → exact-dedup
   window → split assign → per-(split, shard) pack — 2 shuffles;
2. per-source quota over a synthetic 32-source corpus (window on a
   hot key distribution);
3. decontamination of the 1M corpus against a 1,000-doc eval set
   (broadcast inverted index).

Usage: python scripts/stress_export.py [--n 1000000]
Prints one JSON line per stage and a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_spark.functions import corpus as C
from scripts.stress_dedup import synth_corpus


def timed(label, fn):
    t0 = time.monotonic()
    out = fn()
    wall = round(time.monotonic() - t0, 1)
    print(json.dumps({"stage": label, "wall_sec": wall, **out}), flush=True)
    return wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .appName("stress-export")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 1M docs: 90% unique, ~10% exact-dup copies (to exercise the
    # dedup window), 32 synthetic sources, repartitioned as a real
    # scan would arrive
    n_unique = int(args.n * 0.9)
    corpus = (
        synth_corpus(
            spark, n_unique=n_unique, n_groups=0, group_size=1,
            n_hot=args.n // 100_000, hot_size=(args.n - n_unique) // max(args.n // 100_000, 1),
        )
        .withColumn("source", F.concat(F.lit("src"), (F.col("doc_id") % 32)))
        .withColumn("lang", F.element_at(F.array(*[F.lit(x) for x in ["en", "de", "es", "fr", "zh"]]), (F.col("doc_id") % 5 + 1).cast("int")))
        .repartition(32)
        .localCheckpoint()
    )
    n_rows = corpus.count()
    walls = {}

    surv_holder = {}

    def capstone():
        surv = (
            corpus.filter(F.size(F.split(F.col("text"), " ")) >= 30)
            .withColumn(
                "canon", F.min("doc_id").over(Window.partitionBy(F.md5(F.col("text"))))
            )
            .filter(F.col("doc_id") == F.col("canon"))
            .withColumn("split", C.split_assign(F.col("doc_id")))
        )
        out = C.pack_sequences(surv, ["split", "lang"], "doc_id", "text", 2048)
        out.write.format("noop").mode("overwrite").save()
        n_surv = out.count()
        surv_holder["surv"] = surv.select("doc_id", "text").localCheckpoint()
        return {"n_in": n_rows, "n_exported": n_surv}

    walls["export_capstone"] = timed("export_capstone", capstone)

    def quota():
        out = C.per_source_quota(corpus, "source", "doc_id", 10_000)
        out.write.format("noop").mode("overwrite").save()
        return {"quota": 10_000, "n_sources": 32}

    walls["per_source_quota"] = timed("per_source_quota", quota)

    def quota_skewed():
        # one source holds ~90% of the corpus: the exact window funnels
        # it through a single task, the skew_guard pre-thins it map-side
        # to ~4x quota survivors before the shuffle. Result must match
        # the unguarded window exactly.
        skewed = corpus.withColumn(
            "source",
            F.when(F.col("doc_id") % 10 != 0, F.lit("hot")).otherwise(
                F.concat(F.lit("src"), (F.col("doc_id") % 32))
            ),
        )
        exact = C.per_source_quota(skewed, "source", "doc_id", 10_000)
        t0 = time.monotonic()
        exact.write.format("noop").mode("overwrite").save()
        exact_wall = round(time.monotonic() - t0, 1)
        guarded = C.per_source_quota(
            skewed, "source", "doc_id", 10_000, skew_guard=True
        )
        t0 = time.monotonic()
        guarded.write.format("noop").mode("overwrite").save()
        guarded_wall = round(time.monotonic() - t0, 1)
        mismatch = (
            exact.select("doc_id").exceptAll(guarded.select("doc_id")).count()
            + guarded.select("doc_id").exceptAll(exact.select("doc_id")).count()
        )
        return {
            "hot_share": 0.9,
            "exact_wall_sec": exact_wall,
            "skew_guard_wall_sec": guarded_wall,
            "result_mismatch_rows": mismatch,
        }

    walls["per_source_quota_90pct_hot"] = timed(
        "per_source_quota_90pct_hot", quota_skewed
    )

    def decontaminate():
        # pipeline order matters: decontaminate the DEDUPED survivors
        # against the (external, never-deduped) eval set. Running it
        # pre-dedup multiplies every contaminated group into
        # group_size × eval_twins pairs — measured 999,000 pairs on
        # this corpus vs the ~100 true canonical hits below.
        ev = corpus.filter(F.col("doc_id") % 1000 == 7)  # 1k-doc eval set
        surv = surv_holder["surv"].filter(F.col("doc_id") % 1000 != 7)
        hits = C.decontaminate_overlap(surv, ev, "text", "doc_id", n=5, min_overlap=3)
        n_hits = hits.count()
        return {"eval_docs": 1000, "contaminated_pairs": n_hits}

    walls["decontaminate_1k_eval_post_dedup"] = timed(
        "decontaminate_1k_eval_post_dedup", decontaminate
    )

    print(json.dumps({"summary": walls, "n_docs": n_rows}), flush=True)


if __name__ == "__main__":
    main()
