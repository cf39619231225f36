"""TPC-H shapes Q8/Q9/Q12/Q16/Q19/Q20/Q21 — the rows that complete
the suite's TPC-H coverage (Q1/Q2/Q3/Q4/Q5/Q6/Q7/Q10/Q11/Q13/Q14/Q15/
Q17/Q18/Q22 live in queries.py / queries_extra.py).

The synthetic schema (TESTDATA.md) has no partsupp table and lacks
l_commitdate/l_receiptdate/l_shipmode/p_container, so queries that
need them are SHAPE-ADAPTED: the join graph, subquery structure, and
aggregate pattern of the original are preserved while the missing
predicate columns get documented stand-ins (late shipping derived
from l_shipdate - o_orderdate; l_returnflag standing in for
l_shipmode; lineitem standing in for partsupp, as Q2/Q11 already do).

Every query follows the registry parity rules (queries.py module
docstring): money sums are DECIMAL(18,6)-exact before rounding to
double, years/counts are cast to the same width on both engines, and
every ORDER BY ... LIMIT is total.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .queries import q, _t


def _dec_sum(col):
    """Engine-stable money sum: decimal(18,6) partial sums make the
    result independent of float addition order (SURVEY.md §7.3)."""
    return F.sum(col.cast("decimal(18,6)"))


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@q(
    "tpch_q8_market_share",
    "SELECT o_year, round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume "
    "ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) "
    "/ CAST(sum(volume) AS DOUBLE), 6) AS mkt_share FROM ("
    "  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year, "
    "         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume, "
    "         n2.n_name AS nation "
    "  FROM part JOIN lineitem ON p_partkey = l_partkey "
    "  JOIN supplier ON s_suppkey = l_suppkey "
    "  JOIN orders ON l_orderkey = o_orderkey "
    "  JOIN customer ON o_custkey = c_custkey "
    "  JOIN nation n1 ON c_nationkey = n1.n_nationkey "
    "  JOIN region ON n1.n_regionkey = r_regionkey "
    "  JOIN nation n2 ON s_nationkey = n2.n_nationkey "
    "  WHERE r_name = 'AMERICA' AND p_type = 'SMALL' "
    "    AND o_orderdate >= DATE '1996-01-01' "
    "    AND o_orderdate <= DATE '1997-12-31') all_nations "
    "GROUP BY o_year ORDER BY o_year",
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8: national market share — the 8-table star join.
    Catalyst broadcast-joins every dim (part/supplier/customer/
    nation×2/region are all tiny next to lineitem), so the only
    shuffles are lineitem⋈orders on orderkey and the final 2-group
    aggregate; the date + region + type filters push into the scans.
    The share is a conditional decimal sum over the same rows as the
    denominator — one aggregation, not two passes."""
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    p, s, c = (_t(spark, sf_dir, t) for t in ("part", "supplier", "customer"))
    n, r = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    n1 = n.alias("n1")
    n2 = n.select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("nation")
    )
    j = (
        li.join(F.broadcast(p.filter(F.col("p_type") == "SMALL")), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp_ntz"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "AMERICA")), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == n2.n2_nationkey)
    )
    vol = _rev().cast("decimal(18,6)")
    return (
        j.select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                    F.lit(0).cast("decimal(18,6)")
                )).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@q(
    "tpch_q9_product_profit",
    "SELECT nation, o_year, CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) "
    "AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit FROM ("
    "  SELECT n_name AS nation, "
    "         CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year, "
    "         l_extendedprice, l_discount "
    "  FROM lineitem JOIN part ON p_partkey = l_partkey "
    "  JOIN supplier ON s_suppkey = l_suppkey "
    "  JOIN orders ON l_orderkey = o_orderkey "
    "  JOIN nation ON s_nationkey = n_nationkey "
    "  WHERE p_name LIKE '%widget%') profit "
    "GROUP BY nation, o_year ORDER BY nation, o_year DESC",
)
def tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation × order year for
    parts matching a name pattern. The synthetic schema has no
    partsupp, so profit omits the ps_supplycost*l_quantity term
    (documented adaptation; the join graph and grouping are Q9's).
    The LIKE filter prunes part before its broadcast; lineitem⋈orders
    is the one big shuffle."""
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    p, s, n = (_t(spark, sf_dir, t) for t in ("part", "supplier", "nation"))
    j = (
        li.join(F.broadcast(p.filter(F.col("p_name").contains("widget"))), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            _rev().cast("decimal(18,6)").alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@q(
    "tpch_q12_late_lines_by_class",
    "SELECT l_returnflag AS ship_class, "
    "count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) "
    "AS high_line_count, "
    "count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) "
    "AS low_line_count "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY "
    "  AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01' "
    "GROUP BY l_returnflag ORDER BY ship_class",
)
def tpch_q12_late_lines_by_class(spark, sf_dir):
    """TPC-H Q12 shape: late shipments split by order priority class.
    The schema lacks l_shipmode/l_commitdate/l_receiptdate, so
    'late' = shipped >90 days after the order date and l_returnflag
    stands in for the ship-mode grouping (the conditional-count-over-
    join pattern is Q12's). The priority split is two count-FILTERs in
    ONE aggregation pass; the year filter pushes to the lineitem scan
    while the lateness predicate (cross-table) evaluates post-join."""
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@q(
    "tpch_q16_supplier_cnt",
    "SELECT p_brand, p_type, p_size, "
    "count(DISTINCT l_suppkey) AS supplier_cnt "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' "
    "  AND p_size IN (1, 3, 5, 7, 9) "
    "  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
    "GROUP BY p_brand, p_type, p_size "
    "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size",
)
def tpch_q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) with a supplier blacklist. lineitem stands in for partsupp
    (as in Q2/Q11) and negative account balance for the 'customer
    complaints' LIKE predicate. The NOT IN becomes a broadcast
    left-anti join (the blacklist is tiny and provably non-null);
    count(DISTINCT) expands to the standard two-phase distinct
    aggregate keyed by the group — no row explosion beyond the
    distinct pairs themselves."""
    li, p, s = (_t(spark, sf_dir, t) for t in ("lineitem", "part", "supplier"))
    pf = p.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 5, 7, 9)
    )
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(pf), li.l_partkey == pf.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@q(
    "tpch_q19_discounted_revenue",
    "SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) "
    "AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 "
    "       AND l_quantity BETWEEN 1 AND 11) "
    "   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 "
    "       AND l_quantity BETWEEN 10 AND 20) "
    "   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 "
    "       AND l_quantity BETWEEN 20 AND 30)",
)
def tpch_q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19: disjunctive (OR-of-AND-groups) predicate spanning
    both join sides — the classic pushdown stress test. Catalyst
    derives the single-side implications (p_brand IN (...) AND
    p_size <= 15 onto part; l_quantity BETWEEN 1 AND 30 onto
    lineitem) and pushes them below the join, so the OR evaluates
    over pre-filtered inputs. p_container/l_shipmode don't exist in
    the synthetic schema; brand/size/quantity carry the disjunction."""
    li, p = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    grp = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = grp("Brand#1", 5, 1, 11) | grp("Brand#2", 10, 10, 20) | grp("Brand#3", 15, 20, 30)
    return j.filter(cond).agg(
        F.round(_dec_sum(_rev()), 2).cast("double").alias("revenue")
    )


@q(
    "tpch_q20_part_promotion",
    "SELECT s_name, n_name, "
    "CAST(round(CAST(s_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) "
    "AS s_acctbal FROM supplier "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE s_suppkey IN ("
    "  SELECT l_suppkey FROM ("
    "    SELECT l_suppkey, l_partkey, sum(l_quantity) AS sup_qty, "
    "           sum(sum(l_quantity)) OVER (PARTITION BY l_partkey) AS part_qty "
    "    FROM lineitem JOIN part ON p_partkey = l_partkey "
    "    WHERE p_name LIKE 'red%' "
    "    GROUP BY l_suppkey, l_partkey) t "
    "  WHERE sup_qty > 0.12 * part_qty) "
    "ORDER BY s_name",
)
def tpch_q20_part_promotion(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who dominate the shipped volume of
    some 'red' part. The original's partsupp availability check
    becomes a shipped-quantity dominance check on lineitem (same
    nested-aggregate-feeding-semi-join structure). The inner block is
    ONE shuffle on (suppkey, partkey) — the per-part total rides on a
    window over the already-grouped rows instead of a second self-join
    pass. The 0.12 cut is sized to the synthetic data's ~25-supplier
    parts (the literal 0.5 is unreachable there and would make the
    query structurally empty); l_quantity is integral, so the double
    sums are exact and the cut is engine-stable."""
    li, p = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    s, n = _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation")
    grouped = (
        li.join(F.broadcast(p.filter(F.col("p_name").startswith("red"))), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sup_qty"))
        .withColumn("part_qty", F.sum("sup_qty").over(Window.partitionBy("l_partkey")))
    )
    dominant = grouped.filter(F.col("sup_qty") > 0.12 * F.col("part_qty")).select("l_suppkey")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select(
            "s_name",
            "n_name",
            F.round(F.col("s_acctbal").cast("decimal(18,6)"), 2).cast("double").alias("s_acctbal"),
        )
        .orderBy("s_name")
    )


@q(
    "tpch_q21_waiting_supplier",
    "SELECT s_name, count(*) AS numwait FROM ("
    "  SELECT l_orderkey, max(CASE WHEN late THEN l_suppkey END) AS late_supp "
    "  FROM (SELECT l_orderkey, l_suppkey, "
    "               l_shipdate > o_orderdate + INTERVAL 60 DAY AS late "
    "        FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "        WHERE o_orderstatus = 'F') flagged "
    "  GROUP BY l_orderkey "
    "  HAVING count(DISTINCT CASE WHEN late THEN l_suppkey END) = 1 "
    "     AND count(DISTINCT l_suppkey) > 1) solo "
    "JOIN supplier ON s_suppkey = late_supp "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE n_name = 'NATION_5' "
    "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100",
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper in a
    multi-supplier finished order. The original's EXISTS/NOT-EXISTS
    pair over l_receiptdate/l_commitdate becomes one grouped pass over
    the order's lines ('exactly one distinct late supplier AND more
    than one supplier overall'), with lateness derived from
    l_shipdate - o_orderdate > 60 days. This formulation replaces two
    correlated self-joins of the fact with a single aggregate keyed
    by orderkey — strictly fewer shuffles than the literal Q21 plan
    at any scale. Ties in numwait are broken by s_name, so LIMIT is
    deterministic."""
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    s, n = _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation")
    flagged = li.join(
        o.filter(F.col("o_orderstatus") == "F"), li.l_orderkey == o.o_orderkey
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    late_supp = F.when(F.col("late"), F.col("l_suppkey"))
    solo = (
        flagged.groupBy("l_orderkey")
        .agg(
            F.max(late_supp).alias("late_supp"),
            F.count_distinct(late_supp).alias("n_late"),
            F.count_distinct("l_suppkey").alias("n_supp"),
        )
        .filter((F.col("n_late") == 1) & (F.col("n_supp") > 1))
    )
    return (
        solo.join(F.broadcast(s), solo.late_supp == s.s_suppkey)
        .join(F.broadcast(n.filter(F.col("n_name") == "NATION_5")), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
