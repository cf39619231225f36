#!/usr/bin/env python
"""Dump .explain("formatted") for named queries into plans/r18/.

    python scripts/dump_plans_r18.py before q1 q2 ...
    python scripts/dump_plans_r18.py after  q1 q2 ...

Store-building callables execute their build phase during construction;
the dumped plan is the SERVE plan the bench's noop write times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from data_ingestion_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("plans-r18")
    qs = entrymod.queries()
    os.makedirs("plans/r18", exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out = f"plans/r18/{name}_{suffix}.txt"
        with open(out, "w", encoding="utf-8") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
