"""CLI: the reference's runnable local scripts as one entry point.

The reference ships per-script mains (`ingestion-pipeline-local.py`,
the commented invocation menu in
ingestion-pipeline-website-local.py:417-454, and
validationscript.sh driving a local run). Equivalent here:

    python -m data_ingestion_spark ingest --sf-dir ... --store ...
    python -m data_ingestion_spark query --store ... --index X --text "..."
    python -m data_ingestion_spark collections --store ...
    python -m data_ingestion_spark count --store ... --index X
    python -m data_ingestion_spark delete --store ... --index X
    python -m data_ingestion_spark bench

All parameters also resolve from the reference's env names
(WEBSITE_URL, VECTORDB_INDEX — plans/config.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="data_ingestion_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_ing = sub.add_parser("ingest", help="run the flagship ingestion into a store")
    p_ing.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_ing.add_argument("--store", required=True)

    p_q = sub.add_parser("query", help="similarity search a collection")
    p_q.add_argument("--store", required=True)
    p_q.add_argument("--index", required=True)
    p_q.add_argument("--text", required=True)
    p_q.add_argument("-k", type=int, default=5)

    p_c = sub.add_parser("collections", help="list collections")
    p_c.add_argument("--store", required=True)

    p_n = sub.add_parser("count", help="record count for a collection")
    p_n.add_argument("--store", required=True)
    p_n.add_argument("--index", required=True)

    p_d = sub.add_parser("delete", help="drop a collection")
    p_d.add_argument("--store", required=True)
    p_d.add_argument("--index", required=True)

    sub.add_parser("bench", help="run the headline benchmark")

    args = ap.parse_args(argv)

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    from .query_api import EngineQuery
    from .session import get_spark
    from .sources.sinks import ParquetVectorStore

    spark = get_spark("engine-cli")
    store = ParquetVectorStore(spark, args.store)
    eq = EngineQuery(spark, store)

    if args.cmd == "ingest":
        from .plans.ingestion import ingestion_pipeline

        store.upsert(ingestion_pipeline(spark, args.sf_dir))
        print(json.dumps({"collections": len(store.list_collections())}))
    elif args.cmd == "collections":
        print(json.dumps(store.list_collections()))
    elif args.cmd == "count":
        print(json.dumps({"index": args.index, "count": eq.get_record_count(args.index)}))
    elif args.cmd == "delete":
        eq.delete_index(args.index)
        print(json.dumps({"deleted": args.index}))
    elif args.cmd == "query":
        rows = eq.similarity_search(args.index, args.text, k=args.k).collect()
        print(
            json.dumps(
                [{"score": r.score, "chunk_text": r.chunk_text[:120]} for r in rows]
            )
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
