"""TPC-H-style composites, part 2 (Q7, Q8, Q9, Q12, Q13, Q14, Q15, Q18,
Q19 adapted to the fixture schemas — FIXTURES.md; no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate columns, so the classics that need
them are re-targeted at columns that exist while keeping their plan
shape: multi-way joins, OR-of-ANDs predicates, CASE pivot aggregates,
HAVING-driven semi joins, scalar-max subqueries).

Scale posture mirrors tpch.py: dimension chains broadcast, fact joins
shuffle on their keys under AQE, every double aggregate is an exact
scaled-BIGINT sum (functions/exact.py) so map-side combines are integer
adds and the DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.functions.exact import exact_sum, o_sum, scaled_long
from kafka_hadoop_loader_spark.registry import register

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               {o_sum(_REV, 10000)} AS revenue
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
               (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="""TPC-H Q7 (volume shipping): trade volume between two nations
    by year.  The symmetric OR join predicate on two copies of the
    nation dim cannot be a plain equi-key, so both nation sides
    broadcast and the OR is evaluated post-join; lineitem/orders/
    customer still join on their keys.  Year extraction stays in
    codegen.""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp_ntz"))
        )
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(exact_sum(rev, 10000).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN nation = 'NATION_2' THEN vol_s ELSE 0 END)
                    AS DOUBLE)
                   / CAST(SUM(vol_s) AS DOUBLE) AS mkt_share
        FROM (
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                   n1.n_name AS nation,
                   CAST(ROUND(({_REV}) * 10000) AS BIGINT) AS vol_s
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region   ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        )
        GROUP BY o_year
        ORDER BY o_year
    """,
    doc="""TPC-H Q8 (national market share): NATION_2's share of
    STANDARD-part volume sold into ASIA, by order year.  The share is a
    ratio of two scaled-BIGINT sums over the same rows (CASE pivot in
    the numerator), so one aggregate pass computes both and the final
    double division is bit-deterministic.  The bounded dims (nation x2,
    region) broadcast; part and supplier are SF-proportional, so their
    join strategies are AQE's by measured size; the three fact joins
    shuffle.""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    vol_s = scaled_long(rev, 10000)
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.col("nation"),
            vol_s.alias("vol_s"),
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_2", F.col("vol_s")).otherwise(F.lit(0))).cast("double")
                / F.sum("vol_s").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_profit",
    oracle=f"""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               {o_sum(_REV, 10000)} AS sum_profit
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, o_year
        ORDER BY nation, o_year DESC
    """,
    doc="""TPC-H Q9 (product-type profit) adapted: the fixtures carry no
    partsupp, so profit = revenue (no supplycost term); the plan shape
    is intact — substring LIKE filter on part pushed below a 5-way join,
    profit rolled up by supplier nation and order year.""",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(exact_sum(rev, 10000).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q12_ship_delay",
    oracle="""
        SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE)) <= 30 THEN '00-30'
                    WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE)) <= 90 THEN '31-90'
                    ELSE '91+' END AS delay_bucket,
               COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS high_line_count,
               COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= o_orderdate
        GROUP BY delay_bucket
        ORDER BY delay_bucket
    """,
    doc="""TPC-H Q12 (shipping modes & order priority) adapted: the
    fixtures carry no l_shipmode/l_commitdate, so lines are bucketed by
    order-to-ship delay instead, keeping Q12's signature CASE pivot that
    splits counts into high- vs low-priority in one aggregate pass
    (conditional COUNT == COUNT over a CASE with no ELSE).""",
)
def tpch_q12_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "00-30").when(delay <= 90, "31-90").otherwise("91+")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


@register(
    "tpch_q13_cust_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="""TPC-H Q13 (customer order-count distribution): LEFT OUTER join
    with an extra non-key predicate in the join condition (NOT a WHERE —
    it must not drop order-less customers), COUNT over the nullable side,
    then a second aggregate over the first's result.  Two shuffles by
    construction: custkey, then c_count.""",
)
def tpch_q13_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q14_promo_share",
    oracle=f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                     THEN CAST(ROUND(({_REV}) * 10000) AS BIGINT)
                                     ELSE 0 END) AS DOUBLE)
                     / CAST(SUM(CAST(ROUND(({_REV}) * 10000) AS BIGINT))
                            AS DOUBLE) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-02-01'
    """,
    doc="""TPC-H Q14 (promotion effect): percentage of one month's revenue
    from PROMO-type parts — the fixtures' p_type domain has a literal
    'PROMO' value, so this is the real Q14 predicate.  CASE-pivot
    numerator and denominator in a single aggregate over scaled BIGINTs;
    part joins the one-month lineitem slice under AQE's strategy (part
    is SF-proportional, so no forced broadcast).""",
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev_s = scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp_ntz"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev_s).otherwise(F.lit(0))
                ).cast("double")
                / F.sum(rev_s).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {o_sum(_REV, 10000)} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    doc="""TPC-H Q15 (top supplier): quarter revenue per supplier, keep
    the max via an uncorrelated scalar subquery over the same derived
    table.  The revenue aggregate is computed once and reused for both
    the max and the filter (self-reference under one plan); equality on
    exact scaled sums is safe cross-engine where raw double sums would
    not be.""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(exact_sum(rev, 10000).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS order_date,
               o_totalprice,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(l_quantity) > 200)
        GROUP BY c_name, c_custkey, o_orderkey, order_date, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    doc="""TPC-H Q18 (large-volume customers): IN over a HAVING-filtered
    aggregate == LEFT SEMI join against the pre-aggregated qualifying
    keys; lineitem is scanned once for the filter and once for the final
    sum (Catalyst reuses the exchange).  Quantities are integral doubles,
    summed as BIGINTs on both engines.""",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
        .where(F.col("q") > 200)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "bk"), F.col("o_orderkey") == F.col("bk"), "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle=f"""
        SELECT {o_sum(_REV, 10000)} AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 35)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 50)
    """,
    doc="""TPC-H Q19 (discounted revenue) adapted to columns that exist:
    three OR'd conjunct groups mixing part attributes (brand, size) with
    lineitem attributes (quantity).  Catalyst extracts the common
    sub-predicates it can push to each scan (brand IN (...) to part)
    while the cross-table OR evaluates post-join — the classic
    OR-of-ANDs join pattern.""",
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & sz.between(10, 30) & q.between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & sz.between(20, 50) & q.between(20, 50))
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            exact_sum(rev, 10000).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )
