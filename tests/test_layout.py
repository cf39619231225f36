"""Z-order layout: key bit-exactness vs a Python reference and the
data-skipping claim measured the way a reader actually prunes — by
per-partition min/max STATS intersection with the query box."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_spark.operators.layout import (
    cluster_by_zorder,
    zorder_key,
    zorder_key_sql,
)


def _z_ref(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference(spark):
    rows = [(a, b) for a in [0, 1, 5, 255, 4095] for b in [0, 2, 7, 1024, 4095]]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b", zorder_key(F.col("a"), F.col("b"), 12).alias("z")).collect()
    for r in got:
        assert r.z == _z_ref(r.a, r.b, 12), (r.a, r.b)
    # the SQL twin computes the identical key (via Spark SQL exec)
    df.createOrReplaceTempView("zt")
    twin = spark.sql(
        f"SELECT a, b, {zorder_key_sql('a', 'b', 12)} AS z FROM zt"
    ).collect()
    assert {(r.a, r.b): r.z for r in twin} == {(r.a, r.b): r.z for r in got}


def _stats_pruned_partitions(clustered, x_lo, x_hi, y_lo, y_hi):
    """How many partitions a min/max-stats reader would SCAN for the
    box — the parquet row-group pruning model."""
    stats = (
        clustered.withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .agg(
            F.min("x").alias("xmin"), F.max("x").alias("xmax"),
            F.min("y").alias("ymin"), F.max("y").alias("ymax"),
        )
    )
    return stats.filter(
        (F.col("xmax") >= x_lo) & (F.col("xmin") <= x_hi)
        & (F.col("ymax") >= y_lo) & (F.col("ymin") <= y_hi)
    ).count()


def test_zorder_serves_both_dimensions(spark):
    """The single-sort failure mode: a layout sorted by x serves
    x-queries but scans EVERY partition for a y-only query (each
    partition's y-span is the full domain). Z-order bounds both
    spans, so both query shapes prune. This is the reason the
    operator exists; asserting it keeps the claim honest."""
    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % n).alias("x"),  # decorrelated dims
        F.col("id").alias("y"),
    )
    z = cluster_by_zorder(df, "x", "y", bits=14, partitions=64)
    x_sorted = df.repartitionByRange(64, "x").sortWithinPartitions("x")

    # y-only stripe query (256 of 16384 values, all x)
    z_scan = _stats_pruned_partitions(z, 0, n, 8200, 8455)
    x_scan = _stats_pruned_partitions(x_sorted, 0, n, 8200, 8455)
    assert x_scan == 64, f"x-sorted layout should scan all partitions, got {x_scan}"
    assert z_scan <= 16, f"z-order scanned {z_scan}/64 for the y-stripe"

    # x-only stripe query still prunes on the z layout too
    z_scan_x = _stats_pruned_partitions(z, 8200, 8455, 0, n)
    assert z_scan_x <= 16, f"z-order scanned {z_scan_x}/64 for the x-stripe"
