"""Pandas UDAF definitions (§2.11 UDAF surface).

Deliberately NO ``from __future__ import annotations`` here: the
grouped-agg pandas UDF is typed via its real ``pd.Series -> float``
hints, which is what lets ``pandas_udf`` infer GROUPED_AGG without
the ``PandasUDFType`` functionType flag (deprecated since Spark 3.0).
Modules with postponed annotations stringify the hints and defeat
that inference — so UDAFs live here instead of inline in the query
registries.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def iqr(v: pd.Series) -> float:
    """Inter-quartile range — pandas' linear-interpolation quantile,
    matching DuckDB's quantile_cont so the Python aggregation path is
    oracle-checkable."""
    return float(v.quantile(0.75) - v.quantile(0.25))
