"""Global sorts and limits (SURVEY.md §2.B Sorts / limits).

Ordered LIMIT k compiles to TakeOrderedAndProject: per-partition top-k
heaps + a k-row merge on the driver — no global sort materialization, so
it scales to any input size.  Every LIMIT rides a total order (unique
tie-break keys) for cross-engine determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.registry import register


@register(
    "sort_multi_limit",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 100
    """,
    doc="Multi-key ordered top-k (TakeOrderedAndProject, no full sort).",
)
def sort_multi_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(100)
    )


@register(
    "sort_nulls_order",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               NULLIF(l_tax, 0.0) AS tax_or_null
        FROM lineitem
        WHERE l_orderkey < 500
        ORDER BY tax_or_null ASC NULLS FIRST, l_orderkey, l_linenumber
    """,
    doc="""NULLS FIRST/LAST ordering over a synthesized nullable column;
    the driver's hash is order-insensitive but the null placement decides
    nothing here — it documents the capability (and pytest asserts the
    collected order).""",
)
def sort_nulls_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_orderkey") < 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.nullif(F.col("l_tax"), F.lit(0.0)).alias("tax_or_null"),
        )
        .orderBy(
            F.col("tax_or_null").asc_nulls_first(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
    )
