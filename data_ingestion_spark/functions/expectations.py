"""Data-quality expectation report — the schema/constraint gate a
100 TB ingestion pipeline runs BEFORE letting a new drop near training
export (the Deequ/Great-Expectations idea re-expressed as one Spark
aggregation).

The reference validates nothing at ingest time (a malformed page goes
straight into the vector store, website-ingestion-pipeline.py:100-118);
at crawl scale, silent nulls / duplicate keys / out-of-range values in
one upstream drop poison every downstream operator, so the pipeline
needs a cheap, declarative gate whose output is itself a tiny
DataFrame (loggable, joinable, assertable).

Design: every rule compiles to a conditional aggregate over ONE full
scan — `expect_report` issues a single `agg()` (plus Spark's Expand
when exact `unique` rules are present), then explodes the 1-row result
into one row per rule. No per-rule passes, no driver-side row
iteration; the report costs one job regardless of rule count.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

RULE_KINDS = (
    "not_null",
    "unique",
    "range",
    "regex",
    "accepted_values",
    "min_rows",
)


def _violation_cond(rule: Mapping[str, Any]) -> Column:
    """Boolean column: this row violates the rule. NULL handling is
    per-rule: only ``not_null`` counts nulls — range/regex/accepted
    judge present values only, so one missing value never trips two
    rules."""
    kind = rule["rule"]
    col = F.col(rule["col"])
    if kind == "not_null":
        return col.isNull()
    if kind == "range":
        lo, hi = rule["lo"], rule["hi"]
        return col.isNotNull() & ((col < F.lit(lo)) | (col > F.lit(hi)))
    if kind == "regex":
        return col.isNotNull() & ~col.rlike(rule["pattern"])
    if kind == "accepted_values":
        return col.isNotNull() & ~col.isin(list(rule["values"]))
    raise AssertionError(kind)


def _label(rule: Mapping[str, Any]) -> str:
    kind = rule["rule"]
    if kind == "min_rows":
        return f"min_rows({rule['n']})"
    if kind == "range":
        return f"range({rule['col']},{rule['lo']},{rule['hi']})"
    if kind == "accepted_values":
        vals = ",".join(str(v) for v in rule["values"])
        return f"accepted_values({rule['col']},[{vals}])"
    if kind == "regex":
        return f"regex({rule['col']},{rule['pattern']})"
    return f"{kind}({rule['col']})"


def expect_report(df: DataFrame, rules: Sequence[Mapping[str, Any]]) -> DataFrame:
    """Evaluate declarative data-quality rules in ONE aggregation pass
    and return a report DataFrame: (rule string, violations bigint,
    total bigint, ok boolean) — one row per rule.

    Rules (dicts):

    - ``{"rule": "not_null", "col": c}`` — violations = null rows.
    - ``{"rule": "unique", "col": c}`` — violations = excess duplicate
      rows among non-null values (``count(c) - count(distinct c)``).
      EXACT, which means each unique rule adds a distinct aggregate:
      Spark plans mixed distinct/plain aggregates via Expand (scan
      rows duplicated once per distinct column). Fine for key columns
      at any scale — Expand is map-side and the partial aggs combine
      before the shuffle — but don't put twenty unique rules in one
      report; split them or sample first.
    - ``{"rule": "range", "col": c, "lo": x, "hi": y}`` — non-null
      values outside [lo, hi].
    - ``{"rule": "regex", "col": c, "pattern": p}`` — non-null values
      NOT matching p (``rlike`` — substring-anchored like DuckDB's
      regexp_matches; anchor with ^...$ for full-match semantics).
    - ``{"rule": "accepted_values", "col": c, "values": [...]}``.
    - ``{"rule": "min_rows", "n": N}`` — violations = 1 when the scan
      produced fewer than N rows (the truncated-upstream-drop guard),
      else 0.

    ``ok`` is ``violations == 0`` for every rule kind. The report is
    lazy — compose it, then ``collect()`` (bounded: one row per rule)
    or write it next to the data as an audit artifact.

    100 TB shape: one full scan, partial aggregation map-side, a
    1-row exchange, then a constant-size explode. Rule count changes
    the aggregate width, never the pass count.
    """
    if not rules:
        raise ValueError("expect_report: at least one rule is required")
    aggs: list[Column] = [F.count(F.lit(1)).cast("bigint").alias("__total")]
    for i, rule in enumerate(rules):
        kind = rule.get("rule")
        if kind not in RULE_KINDS:
            raise ValueError(
                f"expect_report: unknown rule kind {kind!r} "
                f"(expected one of {RULE_KINDS})"
            )
        if kind == "min_rows":
            continue  # derived from __total below
        if kind == "unique":
            col = F.col(rule["col"])
            aggs.append(
                (F.count(col) - F.count_distinct(col))
                .cast("bigint")
                .alias(f"__v{i}")
            )
        else:
            aggs.append(
                F.sum(F.when(_violation_cond(rule), 1).otherwise(0))
                .cast("bigint")
                .alias(f"__v{i}")
            )
    row = df.agg(*aggs)
    entries = []
    for i, rule in enumerate(rules):
        if rule["rule"] == "min_rows":
            viol = (
                F.when(F.col("__total") < int(rule["n"]), F.lit(1))
                .otherwise(F.lit(0))
                .cast("bigint")
            )
        else:
            viol = F.col(f"__v{i}")
        entries.append(
            F.struct(
                F.lit(_label(rule)).alias("rule"),
                viol.alias("violations"),
                F.col("__total").alias("total"),
                (viol == 0).alias("ok"),
            )
        )
    return row.select(F.explode(F.array(*entries)).alias("__e")).select("__e.*")
