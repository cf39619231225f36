"""Time every registered query at a scale factor (single pass, warm
JVM) to hunt pathological outliers. Not a benchmark — a triage sweep:
anything >5s at sf0.1 gets a plan audit.

Usage: python scripts/time_all.py [--sf /root/testdata/sf0.1]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    # Warm the JVM/Python workers on one representative query first.
    try:
        qs["groupby_count"](spark, args.sf).collect()
    except Exception:
        pass
    times = {}
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            n = fn(spark, args.sf).count()
            dt = time.monotonic() - t0
            times[name] = round(dt, 3)
            print(f"{name}: {dt:.3f}s rows={n}", flush=True)
        except Exception as exc:
            times[name] = None
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", flush=True)
    slow = {k: v for k, v in times.items() if v is not None and v > 5.0}
    print(json.dumps({"n": len(times), "slow_over_5s": slow}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
