"""Job-count A/B for the index_report / delete_index_ids change.

Builds the same build->upsert->delete postings fixture the delete-ids
test uses, plus a 3-segment band store, then counts Spark jobs (via
statusTracker job-group ids) for index_report over postings, bands,
and ann_sq8 layouts and for delete_index_ids.
Run once on the working tree (new) and once under `git stash` (old).
"""
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from data_ingestion_spark.session import get_spark

spark = get_spark("jobcount-ab", cpus=8)
sc = spark.sparkContext

tag = sys.argv[1] if len(sys.argv) > 1 else "run"


def count_jobs(name, fn):
    group = f"jc-{name}-{time.time()}"
    sc.setJobGroup(group, name)
    t0 = time.time()
    fn()
    wall = time.time() - t0
    sc.setJobGroup(None, None)
    ids = sc.statusTracker().getJobIdsForGroup(group)
    print(f"{tag} {name}: jobs={len(ids)} wall={wall:.2f}s")
    return len(ids)


from data_ingestion_spark.functions.similarity import (
    build_postings_index_versioned,
    upsert_postings_index_versioned,
    delete_index_ids,
    index_report,
    write_ann_store_versioned,
    upsert_ann_store_versioned,
)
from data_ingestion_spark.functions.dedup import (
    write_band_store,
    upsert_band_store,
)

tmp = tempfile.mkdtemp(prefix="jcab_")

docs = spark.range(0, 400).select(
    F.col("id").alias("doc_id"),
    F.concat(
        F.lit("alpha beta gamma delta epsilon zeta token"),
        F.col("id").cast("string"),
        F.lit(" shared corpus words here"),
    ).alias("text"),
)

root = tmp + "/idx"
build_postings_index_versioned(docs, root, buckets=8)
upsert_postings_index_versioned(docs.filter(F.col("doc_id") < 50), root)
upsert_postings_index_versioned(docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 90)), root)

count_jobs("delete_index_ids", lambda: delete_index_ids(
    docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 140)).select("doc_id"), root
))
count_jobs("index_report_postings", lambda: index_report(spark, root).collect())

# ann_sq8 store, 2 segments
import random
random.seed(7)
emb = spark.range(0, 300).select(
    F.col("id").alias("vec_id"),
    F.array(*[(F.rand(seed=i) * 2 - 1) for i in range(16)]).alias("embedding"),
)
aroot = tmp + "/ann"
write_ann_store_versioned(emb.filter(F.col("vec_id") < 200), aroot, quantized=True, bits=3, n_tables=4)
upsert_ann_store_versioned(emb.filter(F.col("vec_id") >= 150), aroot)
count_jobs("index_report_ann", lambda: index_report(spark, aroot).collect())

# band store, 3 segments
broot = tmp + "/bands"
write_band_store(docs.filter(F.col("doc_id") < 150), broot)
upsert_band_store(docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 220)), broot)
upsert_band_store(docs.filter(F.col("doc_id") >= 200), broot)
count_jobs("index_report_bands", lambda: index_report(spark, broot).collect())

spark.stop()
