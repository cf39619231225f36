"""Drive queries exactly like the correctness driver: vanilla
SparkSession, run queries()[name] at a scale factor, run
oracle_sql()[name] in DuckDB on the same parquet, compare row count +
schema (column names) + order-insensitive value hash (columns sorted
by name, rows sorted, values stringified with float rounding).

Usage: python scripts/drive_check.py [--sf SF_DIR] name [name ...]
       python scripts/drive_check.py --window-head N   # first N of DRIVER_WINDOW
       python scripts/drive_check.py                   # FULL registry sweep
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--window-head", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs, os_ = E.queries(), E.oracle_sql()
    # precedence: explicit names > --window-head N > FULL registry.
    # (A bare invocation used to resolve to list(qs)[:0] == nothing
    # and print a vacuous "all ok" — the r08 near-miss.)
    if args.names:
        names = args.names
    elif args.window_head:
        names = list(qs)[: args.window_head]
    else:
        names = list(qs)
    print(f"driving {len(names)} queries at {args.sf}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    failed = []
    for name in names:
        try:
            sp = qs[name](spark, args.sf).toPandas()
            if name not in os_:
                print(f"{name}: rows-only, spark={len(sp)} OK")
                continue
            du = con.execute(os_[name]).df()
            rows = len(sp) == len(du)
            schema = sorted(sp.columns) == sorted(du.columns)
            hmatch = schema and _canon(sp) == _canon(du)
            ok = rows and schema and hmatch
            print(
                f"{name}: rows={rows}({len(sp)}/{len(du)}) "
                f"schema={schema} hash={hmatch} -> {'OK' if ok else 'FAIL'}"
            )
            if not ok:
                if not schema:
                    print(f"  spark cols: {sorted(sp.columns)}")
                    print(f"  duck  cols: {sorted(du.columns)}")
                failed.append(name)
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            failed.append(name)
    spark.stop()
    if failed:
        print("FAILED:", failed)
        return 1
    print("all ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
