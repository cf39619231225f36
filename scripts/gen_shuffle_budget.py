#!/usr/bin/env python
"""Regenerate tests/shuffle_budget_generated.json: the per-query
shuffle-exchange ceiling for EVERY registered query (the full-registry
extension of the hand-annotated headline SHUFFLE_BUDGET in
tests/test_plans.py — which stays authoritative for the names it
lists; this file covers the rest).

For each registry query the script plans it at sf0.001 under the
standard test session conf (get_spark, cpus=8 — same as
tests/conftest.py) and records the count of non-broadcast shuffle
exchanges in the executed-plan string, using the identical regex the
test applies. Budgets are ceilings (== current counts): a future edit
that sneaks an extra exchange into ANY registered query's plan fails
tests/test_plans.py::test_shuffle_count_budget instead of silently
shipping a slower shape.

Run from the repo root after any intentional plan change:

    python scripts/gen_shuffle_budget.py

and commit the JSON diff together with the plan change — a lowered
count is a win to record, a raised one needs the justification in the
same commit message.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "shuffle_budget_generated.json",
)

#: live streaming jobs execute on call — no static plan to budget
SKIP = {"streaming_tumbling_availablenow", "streaming_session_availablenow"}

_SHUFFLE_EXCHANGE = re.compile(
    r"(?<!Broadcast)Exchange (hashpartitioning|rangepartitioning|"
    r"SinglePartition|RoundRobinPartitioning)"
)


def main() -> None:
    from data_ingestion_spark.session import get_spark

    import __spark_entry__ as entrymod
    from tests.test_plans import SHUFFLE_BUDGET as HAND_BUDGET

    spark = get_spark("shuffle-budget-gen", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    counts: dict[str, int] = {}
    for name, fn in qs.items():
        if name in SKIP or name in HAND_BUDGET:
            continue
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        counts[name] = len(_SHUFFLE_EXCHANGE.findall(plan))
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(dict(sorted(counts.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(counts)} generated budgets "
          f"(+{len(HAND_BUDGET)} hand-annotated in test_plans.py, "
          f"{len(SKIP)} live-streaming skips)")
    dist: dict[int, int] = {}
    for n in counts.values():
        dist[n] = dist.get(n, 0) + 1
    print("distribution:", dict(sorted(dist.items())))
    spark.stop()


if __name__ == "__main__":
    main()
