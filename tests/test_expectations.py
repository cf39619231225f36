"""r14 Y-series: single-pass data-quality expectation report."""

import pytest

from pyspark.sql import functions as F

from data_ingestion_spark.functions.expectations import expect_report


def test_expect_report_counts_and_verdicts(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 5.0),
            (2, "b", 50.0),
            (2, None, -1.0),
            (4, "zz", None),
        ],
        "k bigint, s string, x double",
    )
    out = {
        r.rule: (r.violations, r.total, r.ok)
        for r in expect_report(
            df,
            [
                {"rule": "not_null", "col": "s"},
                {"rule": "unique", "col": "k"},
                {"rule": "range", "col": "x", "lo": 0, "hi": 10},
                {"rule": "regex", "col": "s", "pattern": "^[a-b]$"},
                {"rule": "accepted_values", "col": "s", "values": ["a", "b"]},
                {"rule": "min_rows", "n": 3},
                {"rule": "min_rows", "n": 5},
            ],
        ).collect()
    }
    assert out["not_null(s)"] == (1, 4, False)
    # k = [1,2,2,4]: one excess duplicate row
    assert out["unique(k)"] == (1, 4, False)
    # x = [5, 50, -1, NULL]: 50 and -1 violate; NULL does not
    assert out["range(x,0,10)"] == (2, 4, False)
    # s = [a, b, NULL, zz]: only zz fails the regex; NULL exempt
    assert out["regex(s,^[a-b]$)"] == (1, 4, False)
    assert out["accepted_values(s,[a,b])"] == (1, 4, False)
    assert out["min_rows(3)"] == (0, 4, True)
    assert out["min_rows(5)"] == (1, 4, False)


def test_expect_report_single_pass_plan(spark):
    """All non-unique rules fold into one aggregate over one scan —
    the plan has exactly one scan of the input."""
    df = spark.range(100).withColumn("s", F.col("id").cast("string"))
    rep = expect_report(
        df,
        [
            {"rule": "not_null", "col": "s"},
            {"rule": "range", "col": "id", "lo": 0, "hi": 50},
            {"rule": "min_rows", "n": 10},
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1
    assert rep.count() == 3


def test_expect_report_refusals(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="at least one rule"):
        expect_report(df, [])
    with pytest.raises(ValueError, match="unknown rule kind"):
        expect_report(df, [{"rule": "positive", "col": "id"}])


def test_expectations_stream_equals_batch_twin(spark, tmp_path):
    """r14: the streaming gate's audit log equals running
    expect_report on each slice batch-side (the stream ≡ batch
    discipline), one stamped row-set per micro-batch."""
    import os
    import time

    from data_ingestion_spark.streaming import pipeline as SP

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    src = str(tmp_path / "exp_stream")
    os.makedirs(src)
    slices = [
        orders.filter(F.col("o_orderkey") % 2 == 0),
        orders.filter(F.col("o_orderkey") % 2 == 1),
    ]
    now = time.time()
    for i, sl in enumerate(slices):
        p = os.path.join(src, f"s{i}.parquet")
        sl.toPandas().to_parquet(p, index=False)
        os.utime(p, (now + i, now + i))
    rules = [
        {"rule": "not_null", "col": "o_custkey"},
        {"rule": "unique", "col": "o_orderkey"},
        {"rule": "range", "col": "o_totalprice", "lo": 0, "hi": 100000},
        {"rule": "min_rows", "n": 10},
    ]
    out = str(tmp_path / "audit")
    q = SP.run_expectations_stream(
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        rules,
        out,
        str(tmp_path / "ckpt_exp"),
    )
    q.awaitTermination(180)

    audit = spark.read.parquet(out)
    assert audit.select("batch_id").distinct().count() == 2
    from data_ingestion_spark.functions.expectations import expect_report

    got = {
        (r.batch_id, r.rule): (r.violations, r.total, r.ok)
        for r in audit.collect()
    }
    # order of file pickup follows mtime: batch i == slice i
    for i, sl in enumerate(slices):
        for r in expect_report(sl, rules).collect():
            assert got[(i, r.rule)] == (r.violations, r.total, r.ok)
