"""Projections, filters, and scalar-expression evaluation (SURVEY.md §2.B).

The reference's mapper is an identity projection over bytes (R4); here the
same stage is a declarative select/filter so Catalyst pushes predicates
and prunes columns all the way into the parquet scan (verified by
tests/test_plans.py: ``PushedFilters`` on the scan node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.registry import register


@register(
    "filter_pushdown",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2000-01-01'
          AND l_returnflag = 'R'
          AND l_quantity BETWEEN 10 AND 30
          AND l_linestatus IS NOT NULL
        ORDER BY l_orderkey, l_linenumber
    """,
    doc="""Conjunctive filter + projection; every predicate is
    parquet-pushdown-able (comparison, equality, BETWEEN, IS NOT NULL) and
    the scan reads only 6 of 11 columns (column pruning).""",
)
def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
            & (F.col("l_returnflag") == "R")
            & F.col("l_quantity").between(10, 30)
            & F.col("l_linestatus").isNotNull()
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            F.col("l_shipdate").cast("date").alias("ship_date"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "filter_in_like",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        FROM customer
        WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
          AND (c_name LIKE '%1%' OR c_acctbal < 0)
        ORDER BY c_custkey
    """,
    doc="IN-list + LIKE + boolean OR; all pushdown-able predicates.",
)
def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.where(
            F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")
            & (F.col("c_name").like("%1%") | (F.col("c_acctbal") < 0))
        )
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .orderBy("c_custkey")
    )


@register(
    "project_expr",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
               CASE WHEN l_returnflag = 'R' THEN 'returned'
                    WHEN l_returnflag = 'A' THEN 'acked'
                    ELSE 'none' END AS flag_desc,
               CAST(l_quantity AS BIGINT) AS qty_int,
               COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or_neg
        FROM lineitem
        WHERE l_orderkey < 1000
        ORDER BY l_orderkey, l_linenumber
    """,
    doc="""Scalar expression eval: arithmetic, CASE WHEN, CAST,
    COALESCE/NULLIF — all whole-stage-codegen'd JVM expressions, no UDFs.""",
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_orderkey") < 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            # raw IEEE products: bit-identical to the oracle, no rounding
            rev.alias("revenue"),
            (rev * (1 + F.col("l_tax"))).alias("charged"),
            F.when(F.col("l_returnflag") == "R", "returned")
            .when(F.col("l_returnflag") == "A", "acked")
            .otherwise("none")
            .alias("flag_desc"),
            F.col("l_quantity").cast("bigint").alias("qty_int"),
            F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias(
                "disc_or_neg"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
