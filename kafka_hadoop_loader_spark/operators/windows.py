"""Window functions (SURVEY.md §2.B Window functions).

Every window here rides one shuffle on its partition key + one sort;
multiple functions over the same (partitionBy, orderBy) share a single
Window exec.  Order-by keys always include a unique tie-break column so
ranking is total and engine-independent.

Scale note: window partitions must fit per-task memory; partition keys
here (mktsegment+..., user_id, custkey) are low-skew.  For heavy keys at
100 TB, pre-aggregate or bucket the partition column first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.registry import register


@register(
    "window_rank",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey)
        ORDER BY c_mktsegment, rn
    """,
    doc="Ranking family: row_number / rank / dense_rank / ntile.",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
        )
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "window_distribution",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cum_dist,
               nth_value(c_name, 2) OVER (PARTITION BY c_mktsegment
                                          ORDER BY c_acctbal DESC, c_custkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING)
                   AS second_name
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey)
        ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
    """,
    doc="""Distribution family: percent_rank / cume_dist / nth_value.
    percent_rank and cume_dist are single exact integer divisions
    ((rank-1)/(n-1), frac<=current/n) so they compare bitwise across
    engines; nth_value rides a full frame over a total order so the
    picked row is unambiguous.""",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
        F.nth_value("c_name", 2).over(wfull).alias("second_name"),
    ).orderBy("c_mktsegment", F.col("c_acctbal").desc(), "c_custkey")


@register(
    "window_lag_lead",
    oracle="""
        SELECT event_id, user_id, value,
               lag(value) OVER w AS prev_value,
               lead(value) OVER w AS next_value,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
               first_value(value) OVER w AS first_val,
               last_value(value) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING) AS last_val
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ORDER BY event_id
    """,
    doc="Analytic family: lag / lead / first_value / last_value.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
            F.first("value").over(w).alias("first_val"),
            F.last("value").over(w_all).alias("last_val"),
        )
        .orderBy("event_id")
    )


@register(
    "window_running",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(COUNT(*) OVER w AS BIGINT) AS running_n,
               CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w
                         AS DOUBLE) / 100.0 AS DOUBLE) AS running_total
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey
    """,
    doc="""Cumulative frame (UNBOUNDED PRECEDING..CURRENT ROW): running
    count + running exact sum per customer ordered by order date.""",
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.count("*").over(w).cast("bigint").alias("running_n"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w)
                .cast("double")
                / 100.0
            ).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_moving_avg",
    oracle="""
        SELECT event_id, user_id,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS DOUBLE)
                   / (CAST(COUNT(value) OVER w AS DOUBLE) * 100.0)
                   AS moving_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    doc="""Sliding row frame (2 PRECEDING..CURRENT): 3-event moving
    average, exact scaled arithmetic so partition-start short frames
    match too.""",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).over(w).cast("double")
                / (F.count("value").over(w).cast("double") * 100.0)
            ).alias("moving_avg"),
        )
        .orderBy("event_id")
    )


@register(
    "window_topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey)
                       AS rn
            FROM orders
        )
        WHERE rn <= 3
        ORDER BY o_custkey, rn
    """,
    doc="""Top-K per group via row_number()<=K — the scalable pattern
    (no per-group collect; Spark pushes a per-partition top-K before the
    shuffle via WindowGroupLimit).""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


# --- Rolling exact median ----------------------------------------------------


@register(
    "window_rolling_median",
    oracle="""
        WITH daily AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        win AS (
            SELECT event_type, day_id, cents,
                   list_sort(list(cents) OVER (
                       PARTITION BY event_type ORDER BY day_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
            FROM daily
        )
        SELECT event_type, day_id, cents,
               CAST(len(arr) AS BIGINT) AS n_in_window,
               CAST(arr[CAST((len(arr) + 1) // 2 AS INTEGER)] AS BIGINT)
                   AS rolling_median_cents
        FROM win ORDER BY event_type, day_id
    """,
    doc="""Rolling EXACT median — the robust smoother the moving
    average can't be (window_moving_avg jumps when one outlier day
    enters the frame; the median ignores it until outliers are the
    majority): per event type, the type-1 median of the trailing
    7-day daily-revenue window, computed by collecting the frame into
    a sorted array and selecting position (n+1) DIV 2.

    Rolling rank statistics have no incremental aggregate form in
    either engine, so the frame-collect is the honest plan: the frame
    is BOUNDED (7 values), making the per-row cost O(7 log 7) and the
    state 7 BIGINTs — this is precisely the case where collect-inside-
    a-window is right, in contrast to the unbounded collect the
    anti-pattern audit hunts.  All integers; no interpolation.

    Scale: the input collapses to the (type, day) grain first (the
    shared daily-cents aggregate); windows partition by event type
    over the bounded day spine.""",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.catalog import managed_persist

    e = table(spark, sf_dir, "events")
    daily = managed_persist(
        f"forecast_backtest_mase:daily:{sf_dir}",
        e.groupBy(
            "event_type",
            (F.col("ts_us") / 86_400_000_000).cast("bigint").alias("day_id"),
        ).agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("bigint")
            .alias("cents")
        ),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_id")
        .rowsBetween(-6, Window.currentRow)
    )
    win = daily.select(
        "event_type",
        "day_id",
        "cents",
        F.sort_array(F.collect_list("cents").over(w)).alias("arr"),
    )
    return win.select(
        "event_type",
        "day_id",
        "cents",
        F.size("arr").cast("bigint").alias("n_in_window"),
        F.expr("arr[CAST((size(arr) + 1) DIV 2 AS INT) - 1]")
        .cast("bigint")
        .alias("rolling_median_cents"),
    ).orderBy("event_type", "day_id")
