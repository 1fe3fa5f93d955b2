"""TPC-H-style composites, part 3 (Q2, Q11, Q20, Q21 adapted) — completes
the 22-query set in adapted form.

The fixtures have no ``partsupp`` table (FIXTURES.md), so the three
classics that need it derive a partsupp-analogue from lineitem itself:
``(l_partkey, l_suppkey) → MIN(l_extendedprice / l_quantity)`` as the
supply cost (Q2), revenue per part-from-nation as the stock value (Q11),
and per-(supplier, part) shipped-quantity ratios as the availability
predicate (Q20).  Q21's "kept orders waiting" late predicate (needs
l_receiptdate/l_commitdate) adapts to ``l_shipdate > o_orderdate + 90
days``.  Plan shapes survive the adaptation: correlated per-group MIN
(window, not a re-join), global scalar-fraction HAVING (broadcast 1-row
join), nested-IN semi join, and EXISTS/NOT-EXISTS self-correlation
(semi + anti join on the same fact).

Cross-engine notes: MIN over doubles is exact and order-independent, so
the Q2 float-equality match against the per-part minimum is bit-stable
across Spark and DuckDB; every SUM is a scaled-BIGINT sum
(functions/exact.py).  Scale posture: dims broadcast; the derived
partsupp aggregates shuffle once on (l_partkey, l_suppkey) and reuse
that partitioning; the Q21 semi/anti joins co-locate on l_orderkey so
AQE plans them as one shuffle of lineitem reused twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.registry import register

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS supplycost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        eu AS (
            SELECT ps.l_partkey, ps.supplycost, s_name, s_acctbal, n_name
            FROM ps
            JOIN supplier ON s_suppkey = ps.l_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey
        FROM part JOIN eu ON p_partkey = eu.l_partkey
        WHERE p_size <= 15 AND p_type = 'STANDARD'
          AND supplycost = (SELECT MIN(e2.supplycost) FROM eu e2
                            WHERE e2.l_partkey = eu.l_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    doc="""TPC-H Q2 (minimum-cost supplier), partsupp derived from
    lineitem: per (part, supplier) the min observed unit price stands in
    for ps_supplycost.  The correlated "cost = per-part minimum"
    subquery is a window MIN over the Europe-filtered derived table —
    one shuffle on l_partkey, no self-join.  Ref parity: the reference
    has no relational surface (SURVEY.md §2.A); this is north-star
    capability [pub: README.md].""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    p = table(spark, sf_dir, "part")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    eu = (
        ps.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.where(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "supplycost", "s_name", "s_acctbal", "n_name")
    )
    min_cost = F.min("supplycost").over(Window.partitionBy("l_partkey"))
    cheapest = eu.withColumn("min_cost", min_cost).where(
        F.col("supplycost") == F.col("min_cost")
    )
    return (
        p.where((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .join(cheapest, F.col("p_partkey") == F.col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q11_important_stock",
    oracle=f"""
        WITH base AS (
            SELECT l_partkey,
                   CAST(ROUND(({_REV}) * 100) AS BIGINT) AS v
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        )
        SELECT l_partkey,
               CAST(SUM(v) AS DOUBLE) / 100.0 AS part_value
        FROM base
        GROUP BY l_partkey
        HAVING CAST(SUM(v) AS DOUBLE)
             > 0.001 * (SELECT CAST(SUM(v) AS DOUBLE) FROM base)
        ORDER BY part_value DESC, l_partkey
    """,
    doc="""TPC-H Q11 (important stock): per-part revenue from three
    nations' suppliers, keeping parts above a fraction of the global
    total.  The uncorrelated scalar subquery becomes a 1-row aggregate
    broadcast-cross-joined against the per-part aggregate — both sides
    reuse one scan of the filtered fact via integer partial sums, and
    the threshold compare is exact (scaled BIGINT on both engines).""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    nat = n.where(F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11"))
    v = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    base = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", v.alias("v"))
    )
    per_part = base.groupBy("l_partkey").agg(F.sum("v").alias("v_s"))
    total = base.agg(F.sum("v").alias("total_s"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("v_s").cast("double") > 0.001 * F.col("total_s").cast("double"))
        .select(
            "l_partkey",
            (F.col("v_s").cast("double") / F.lit(100.0)).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "tpch_q20_promo_suppliers",
    oracle="""
        SELECT s_name, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1' AND s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_type = 'PROMO')
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(CASE WHEN l_shipdate >= TIMESTAMP '1999-01-01'
                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                 > 0.5 * SUM(CAST(l_quantity AS BIGINT))
        )
        ORDER BY s_name
    """,
    doc="""TPC-H Q20 (promotion-part suppliers), availability adapted:
    keep NATION_1 suppliers for whom some PROMO part ships more than
    half its all-time quantity after 1999 (recent-heavy supply).  The
    nested IN subqueries become: semi-join lineitem against PROMO part
    keys (part-proportional, so the strategy is AQE's by measured
    size), aggregate on (supplier, part) with a conditional integer
    sum, then LEFT SEMI into the supplier dim — no distinct needed,
    the semi join dedups.""",
)
def tpch_q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    p = table(spark, sf_dir, "part")
    promo_keys = p.where(F.col("p_type") == "PROMO").select("p_partkey")
    qty = F.col("l_quantity").cast("long")
    recent = F.when(
        F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp_ntz"), qty
    ).otherwise(F.lit(0).cast("long"))
    heavy = (
        li.join(promo_keys,
                F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(recent).alias("recent_qty"), F.sum(qty).alias("total_qty"))
        .where(F.col("recent_qty").cast("double") > 0.5 * F.col("total_qty").cast("double"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n.where(F.col("n_name") == "NATION_1")),
               F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM lineitem l1
        JOIN orders   ON o_orderkey = l1.l_orderkey
        JOIN supplier ON s_suppkey = l1.l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
    """,
    doc="""TPC-H Q21 (suppliers who kept orders waiting), lateness
    adapted to ``l_shipdate > o_orderdate + 90 days`` (fixtures lack
    l_receiptdate/l_commitdate).  EXISTS → LEFT SEMI join against other
    suppliers' lines on the same order; NOT EXISTS → LEFT ANTI against
    other suppliers' *late* lines.  The late-lines subplan is built once
    and drives both the outer block and the anti side; all three
    order-keyed joins share the l_orderkey shuffle partitioning.""",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    late = (
        li.join(o.where(F.col("o_orderstatus") == "F"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    # One nation's suppliers is still supplier/|nations| — SF-
    # proportional, so the join strategy is AQE's by measured size.
    l1 = late.join(
        s.join(
            F.broadcast(n.where(F.col("n_name") == "NATION_2")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name"),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    others = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
