"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``data_ingestion_spark``; this module is the
thin registry adapter. See data_ingestion_spark/queries.py for the
parity rules (aliasing, casts, rounding) every entry follows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_spark import queries as _q
from data_ingestion_spark import queries_extra as _qe  # noqa: F401  (registers on import)
from data_ingestion_spark import queries_tpch as _qt  # noqa: F401  (registers on import)
from data_ingestion_spark import queries_vector as _qv  # noqa: F401  (registers on import)
from data_ingestion_spark.plans.ingestion import flagship_query


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_q.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (rows-only entries —
    sketches/streaming — intentionally omitted)."""
    return dict(_q.ORACLE_SQL)
