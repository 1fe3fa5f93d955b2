"""TPC-H-style composite queries adapted to the fixture schemas
(FIXTURES.md — columns are a subset of real TPC-H; e.g. no
o_shippriority / l_commitdate, so the classics are adapted).

These exercise multi-join + filter + agg + ordered-limit pipelines the
way real reports do.  Scale posture: dimension chains
(region->nation) broadcast; customer/orders/lineitem join on their keys
with AQE-managed shuffles; ordered LIMIT is TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.functions.exact import exact_sum
from kafka_hadoop_loader_spark.registry import register

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "tpch_q3_shipping",
    oracle=f"""
        SELECT l_orderkey,
               CAST(SUM(CAST(ROUND({_REV} * 10000) AS BIGINT)) AS DOUBLE)
                   / 10000.0 AS revenue,
               CAST(o_orderdate AS DATE) AS order_date
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc="""TPC-H Q3 (shipping priority) adapted: 3-way join, filter on all
    three tables, agg, ordered top-10.  Catalyst pushes each filter below
    its join; revenue ties broken by orderkey for a total order.""",
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(exact_sum(rev, 10000).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier",
    oracle=f"""
        SELECT n_name,
               CAST(SUM(CAST(ROUND({_REV} * 10000) AS BIGINT)) AS DOUBLE)
                   / 10000.0 AS revenue
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    doc="""TPC-H Q5 (local supplier volume): 6-way join with the
    customer-nation == supplier-nation locality predicate.  region and
    nation are bounded dims the planner broadcasts on its own; supplier
    is SF-proportional, so its join strategy is AQE's by measured size;
    orders/lineitem shuffle on their keys.""",
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        r.where(F.col("r_name") == "ASIA")
        .join(F.broadcast(n), n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            ),
            o.o_custkey == c.c_custkey,
        )
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            # supplier is SF-proportional (1B rows at 100 TB): the join
            # strategy is AQE's by measured size, never a forced hint.
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(exact_sum(rev, 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "tpch_q10_returns",
    oracle=f"""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM(CAST(ROUND({_REV} * 10000) AS BIGINT)) AS DOUBLE)
                   / 10000.0 AS revenue,
               c_acctbal
        FROM customer
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-07-01'
        GROUP BY c_custkey, c_name, n_name, c_acctbal
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="""TPC-H Q10 (returned-item reporting): who returned the most
    value in a quarter-ish window.  4-way join + agg + top-20.""",
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
            ),
            o.o_custkey == c.c_custkey,
        )
        .join(li.where(F.col("l_returnflag") == "R"), li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(exact_sum(rev, 10000).alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q4_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="""TPC-H Q4 (order priority checking) adapted: correlated EXISTS
    subquery (any lineitem shipped after its order date).  Catalyst
    decorrelates it to a LEFT SEMI join on the order key with the date
    comparison in the join condition — one shuffle, no subquery loop;
    the date filter on orders is pushed to the scan.""",
)
def tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    bounded = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    shipped_late = bounded.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        shipped_late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q6_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000)
                             AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24.0
    """,
    doc="""TPC-H Q6 (forecasting revenue change): single-table scan-agg
    whose entire WHERE clause must reach the parquet scan as
    PushedFilters (verified in tests/test_plans.py patterns) — the
    canonical predicate-pushdown benchmark.  Revenue summed on scaled
    BIGINTs (functions/exact.py) for cross-engine exactness.""",
)
def tpch_q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * F.col("l_discount")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24.0)
    ).agg(
        exact_sum(rev, 10000).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "tpch_q16_supplier_cnt",
    oracle="""
        SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type
        ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
    doc="""TPC-H Q16 (parts/supplier relationship) adapted — lineitem
    stands in for partsupp (the fixtures carry no partsupp table).
    NOT IN subquery over a key with no NULLs == LEFT ANTI join (Catalyst
    plans NOT IN as null-aware anti join; the blacklist side is
    supplier-proportional, so its strategy is AQE's by measured size —
    at small SF the planner still broadcasts it).  COUNT(DISTINCT)
    expands to a two-phase aggregate.""",
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    bad = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p.where(F.col("p_brand") != "Brand#1"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
    )


@register(
    "tpch_q17_small_quantity",
    oracle="""
        WITH part_avg AS (
            SELECT l_partkey AS pk,
                   0.5 * (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE)) AS half_avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 / 7.0 AS avg_yearly,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part_avg ON l_partkey = pk
        WHERE l_quantity < half_avg_qty
    """,
    doc="""TPC-H Q17 (small-quantity-order revenue) adapted: correlated
    scalar subquery (per-part average quantity) decorrelated into an
    aggregate + self-join — the standard rewrite; Catalyst reuses the
    lineitem scan.  Quantities are integral doubles, so the average is
    an exact BIGINT-sum / count on both engines; the 0.5 multiplier and
    the comparison are then bit-deterministic.""",
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            0.5
            * (
                F.sum(F.col("l_quantity").cast("bigint")).cast("double")
                / F.count("*").cast("double")
            )
        ).alias("half_avg_qty")
    )
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (exact_sum(F.col("l_extendedprice"), 100) / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q22_idle_rich",
    oracle="""
        SELECT c_nationkey,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS totacctbal
        FROM customer
        WHERE c_acctbal > (
                SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                            AS DOUBLE)
                       / (CAST(COUNT(c_acctbal) AS DOUBLE) * 100.0)
                FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    doc="""TPC-H Q22 (global sales opportunity) adapted: uncorrelated
    scalar subquery (global positive-balance average, exact scaled sum)
    broadcast into the filter, plus NOT EXISTS (customers with no
    urgent orders — every fixture customer has *some* order) as a LEFT
    ANTI join.  Grouped by nation since the fixtures carry no phone
    country codes.""",
)
def tpch_q22_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.functions.exact import exact_avg

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    thresh = c.where(F.col("c_acctbal") > 0.0).agg(
        exact_avg(F.col("c_acctbal"), 100).alias("avg_bal")
    )
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.join(F.broadcast(thresh))  # 1-row scalar: broadcast cross join
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            exact_sum(F.col("c_acctbal"), 100).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
