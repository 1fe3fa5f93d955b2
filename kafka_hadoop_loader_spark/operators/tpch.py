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
    customer-nation == supplier-nation locality predicate.  region/nation/
    supplier broadcast; orders/lineitem shuffle on their keys.""",
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
            F.broadcast(s),
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
