"""Set operations (SURVEY.md §2.B Set operations).

UNION ALL is shuffle-free concatenation; UNION/INTERSECT/EXCEPT (+ALL)
add a hash aggregate / hash join on the full row — at 100 TB prefer
pre-projecting to the minimal key columns first (done here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.registry import register


@register(
    "set_union_distinct",
    oracle="""
        SELECT c_custkey AS custkey FROM customer
        WHERE c_mktsegment = 'AUTOMOBILE'
        UNION
        SELECT o_custkey AS custkey FROM orders
        WHERE o_totalprice > 400000
        ORDER BY custkey
    """,
    doc="UNION (distinct): dedup across two projections.",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.where(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct().orderBy("custkey")


@register(
    "set_union_all",
    oracle="""
        SELECT custkey, CAST(COUNT(*) AS BIGINT) AS n_sources
        FROM (
            SELECT c_custkey AS custkey FROM customer
            WHERE c_mktsegment = 'AUTOMOBILE'
            UNION ALL
            SELECT o_custkey AS custkey FROM orders
            WHERE o_totalprice > 400000
        )
        GROUP BY custkey
        ORDER BY custkey
    """,
    doc="UNION ALL (bag semantics preserved, verified via multiplicity).",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.where(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        a.unionAll(b).groupBy("custkey").agg(F.count("*").alias("n_sources"))
        .orderBy("custkey")
    )


@register(
    "set_intersect",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        ORDER BY custkey
    """,
    doc="INTERSECT (distinct): customers with both P and F orders.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("custkey"))
    b = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b).orderBy("custkey")


@register(
    "set_except",
    oracle="""
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
        ORDER BY custkey
    """,
    doc="EXCEPT (distinct): customers without any open order.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    a = c.select(F.col("c_custkey").alias("custkey"))
    b = o.where(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b.distinct()).distinct().orderBy("custkey")


@register(
    "set_except_all",
    oracle="""
        SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'N'
        EXCEPT ALL
        SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'R'
        ORDER BY partkey
    """,
    doc="""EXCEPT ALL (bag difference): multiplicity-aware subtraction of
    returned parts from non-returned parts.""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "N").select(F.col("l_partkey").alias("partkey"))
    b = li.where(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("partkey"))
    return a.exceptAll(b).orderBy("partkey")


@register(
    "set_intersect_all",
    oracle="""
        SELECT l_partkey AS partkey FROM lineitem WHERE l_linestatus = 'F'
        INTERSECT ALL
        SELECT l_partkey AS partkey FROM lineitem WHERE l_linestatus = 'O'
        ORDER BY partkey
    """,
    doc="INTERSECT ALL: multiplicity-aware intersection.",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_linestatus") == "F").select(F.col("l_partkey").alias("partkey"))
    b = li.where(F.col("l_linestatus") == "O").select(F.col("l_partkey").alias("partkey"))
    return a.intersectAll(b).orderBy("partkey")
