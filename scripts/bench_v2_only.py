#!/usr/bin/env python
"""headline_v2-only bench (same methodology as bench.py: untimed warm
pass, then median of 3 interleaved build/serve samples). For fast
optimization iterations — the full bench.py remains the artifact of
record."""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NAMES = [
    "ann_probe_batch",
    "ann_ivfpq_search",
    "rank_bm25_index_compacted",
    "graph_triangle_count",
    "dedup_corpus_lines",
    "dedup_novelty_indexed",
]


def main() -> None:
    from data_ingestion_spark.session import get_spark

    import __spark_entry__ as entrymod

    names = sys.argv[1:] or NAMES
    spark = get_spark("bench-v2-only")
    qs = entrymod.queries()
    qs["agg_global_count"](spark, SF_DIR).collect()
    for name in names:  # untimed warm
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    b: dict[str, list[float]] = {n: [] for n in names}
    s: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(3):
        for name in names:
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            b[name].append(t1 - t0)
            s[name].append(t2 - t1)
    out = {
        n: {
            "build": round(median(b[n]), 3),
            "serve": round(median(s[n]), 3),
            "total": round(median(x + y for x, y in zip(b[n], s[n])), 3),
        }
        for n in names
    }
    print(json.dumps(out, indent=1))
    print("v2_total:", round(sum(v["total"] for v in out.values()), 3))
    spark.stop()


if __name__ == "__main__":
    main()
