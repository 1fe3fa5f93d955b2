"""Aggregation operators (SURVEY.md §2.B Aggregations).

All sums/averages over decimal-valued doubles use the exact scaled-BIGINT
convention (functions/exact.py) so results are bit-identical to the
DuckDB oracle.  Variance/stddev are computed from exact integer moment
sums (quantities are integral) rather than the engines' streaming
estimators, which differ in floating-point merge order.

Scale notes: every query here is a single-shuffle hash aggregate with
map-side partial aggregation (Spark plans HashAggregate(partial) ->
Exchange -> HashAggregate(final) automatically); integer partial sums
also make the combine exact across any number of tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.functions.exact import exact_avg, exact_sum, scaled_long
from kafka_hadoop_loader_spark.plans.ranking import bounded_window_key
from kafka_hadoop_loader_spark.registry import register


@register(
    "agg_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_base_price,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                             AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                   * (1 + l_tax) * 1000000) AS BIGINT))
                    AS DOUBLE) / 1000000.0 AS sum_charge,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                   / (CAST(COUNT(l_extendedprice) AS DOUBLE) * 100.0) AS avg_price,
               CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
                   / (CAST(COUNT(l_discount) AS DOUBLE) * 100.0) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="""TPC-H Q1 pricing summary adapted to fixture schema: the
    canonical multi-measure hash aggregate.  Six measures over one scan;
    whole-stage codegen keeps it one pass.""",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice"), 100).alias("sum_base_price"),
            exact_sum(disc_price, 10000).alias("sum_disc_price"),
            exact_sum(charge, 1000000).alias("sum_charge"),
            (
                F.sum(F.col("l_quantity").cast("bigint")).cast("double")
                / F.count("*").cast("double")
            ).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice"), 100).alias("avg_price"),
            exact_avg(F.col("l_discount"), 100).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_count_distinct",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_custs,
               COUNT(DISTINCT o_orderstatus) AS n_statuses
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="""COUNT(DISTINCT) — Spark plans expand + two-phase aggregation;
    at scale prefer approx_count_distinct (see approx_distinct, rows-only)
    when exactness isn't required.""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "approx_distinct",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs_exact,
               COUNT(*) AS n_orders,
               TRUE AS approx_within_5pct
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="""approx_count_distinct (HyperLogLog++): the scale path for
    distinct counts — no expand, mergeable sketches.  The estimate is a
    deterministic function of the input set (fixed hash), so the oracle
    contract is a tolerance envelope: the query emits the EXACT distinct
    count plus a boolean asserting the HLL estimate (rsd=0.02) landed
    within ±5% of it; the oracle computes the exact count and expects
    TRUE.  A drifting estimator flips the boolean and hash-fails.  At
    scale the exact column is dropped and only the sketch runs.""",
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # two-phase instead of countDistinct+approx in one agg (that shape
    # plans an Expand doubling the stream): pre-aggregate to the
    # distinct (priority, custkey) grain, then the exact distinct is a
    # plain COUNT(*), n_orders is SUM of the carried counts, and the
    # HLL sketch over the already-distinct keys yields the identical
    # estimate (HLL depends only on the distinct set) — one shuffle.
    per_key = o.groupBy("o_orderpriority", "o_custkey").agg(
        F.count("*").alias("cnt")
    )
    return (
        per_key.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
            F.count("*").alias("n_custs_exact"),
            F.sum("cnt").alias("n_orders"),
        )
        .select(
            "o_orderpriority",
            "n_custs_exact",
            "n_orders",
            (
                F.abs(F.col("approx") - F.col("n_custs_exact"))
                <= 0.05 * F.col("n_custs_exact")
            ).alias("approx_within_5pct"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP: hierarchical subtotals + grand total (null-keyed rows).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "agg_cube",
    oracle="""
        SELECT c_mktsegment, c_nationkey,
               COUNT(*) AS n_cust,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS total_bal
        FROM customer
        GROUP BY CUBE (c_mktsegment, c_nationkey)
        ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
    """,
    doc="CUBE: all grouping-set combinations across two dimensions.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.cube("c_mktsegment", "c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            exact_sum(F.col("c_acctbal")).alias("total_bal"),
        )
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("c_nationkey").asc_nulls_first(),
        )
    )


@register(
    "agg_having",
    oracle="""
        SELECT l_suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                             AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY l_suppkey
        HAVING SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                        AS BIGINT)) > 50000000000
        ORDER BY l_suppkey
    """,
    doc="""HAVING = post-aggregation filter; the predicate compares exact
    scaled integers so the cut is engine-independent even at the
    threshold boundary.""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    scaled = F.sum(F.round(rev * 10000).cast("long"))
    return (
        li.groupBy("l_suppkey")
        .agg(
            scaled.alias("rev_scaled"),
            F.count("*").alias("n_items"),
        )
        # HAVING on the exact scaled integer, not the derived double
        .where(F.col("rev_scaled") > 5000000 * 10000)
        .select(
            "l_suppkey",
            (F.col("rev_scaled").cast("double") / 10000.0).alias("revenue"),
            "n_items",
        )
        .orderBy("l_suppkey")
    )


@register(
    "agg_stats_exact",
    oracle="""
        WITH m AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
                   CAST(SUM(CAST(l_quantity AS BIGINT)
                            * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
                   MIN(l_quantity) AS min_qty,
                   MAX(l_quantity) AS max_qty
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n, min_qty, max_qty,
               (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                   / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var_qty,
               sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                   / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) AS stddev_qty
        FROM m
        ORDER BY l_returnflag
    """,
    doc="""Sample variance/stddev from exact integer moments (sum, sum of
    squares) — unlike the engines' built-in streaming estimators, this is
    bit-reproducible across engines AND across cluster sizes (integer
    partials merge exactly; sqrt is IEEE-correctly-rounded).  The built-in
    stddev_samp/var_samp path is exercised rows-only in pytest.""",
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )
    var = (
        m.s2.cast("double")
        - m.s1.cast("double") * m.s1.cast("double") / m.n.cast("double")
    ) / (m.n - 1).cast("double")
    return m.select(
        "l_returnflag",
        "n",
        "min_qty",
        "max_qty",
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
    ).orderBy("l_returnflag")


@register(
    "agg_median",
    oracle="""
        SELECT o_orderpriority,
               median(o_totalprice) AS median_price,
               median(CAST(o_custkey AS BIGINT)) AS median_cust
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="""Exact median (interpolating): both engines average the two
    middle elements for even counts — (a+b)/2 on identical doubles is
    bit-identical.  At 100 TB prefer percentile_approx (mergeable
    KLL/GK sketch); exercised in pytest.""",
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.median("o_totalprice").alias("median_price"),
            F.median(F.col("o_custkey").cast("bigint")).alias("median_cust"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_collect",
    oracle="""
        SELECT c_nationkey,
               string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
                   AS segments,
               COUNT(*) AS n_cust
        FROM customer
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    doc="""collect_set equivalent, made deterministic: the set is sorted
    then joined to a string (hash-stable across engines and shuffles).""",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
            F.count("*").alias("n_cust"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "agg_salted_twophase",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_qty,
               COUNT(*) AS n_lines
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="""Salted two-phase aggregation — the explicit skew pattern for
    when one group key receives a pathological share of rows (here
    l_returnflag: 3 values over 600M rows at 100 TB).  Phase 1 groups by
    (key, salt=hash(row) % 32), spreading each hot key over 32 reducers;
    phase 2 merges the 32 partials per key.  Results are identical to
    the plain GROUP BY (the oracle) because the partials are scaled
    BIGINTs — order-independent.  Spark's own map-side partial
    aggregation makes this redundant for built-in aggs (the partial
    combine already happens per task); the pattern matters for
    shuffle-heavy aggregates with no partial form (collect_list,
    exact percentile) and for skewed JOIN keys — AQE's skewJoin handles
    the join case automatically (enabled in session.py).""",
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.functions.exact import scaled_long

    li = table(spark, sf_dir, "lineitem")
    salted = li.select(
        "l_returnflag",
        scaled_long(F.col("l_quantity"), 100).alias("qty_c"),
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(32)).alias("salt"),
    )
    phase1 = salted.groupBy("l_returnflag", "salt").agg(
        F.sum("qty_c").alias("partial_qty"), F.count("*").alias("partial_n")
    )
    return (
        phase1.groupBy("l_returnflag")
        .agg(
            (F.sum("partial_qty").cast("double") / 100.0).alias("sum_qty"),
            F.sum("partial_n").alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_pivot",
    oracle="""
        SELECT strftime(ts, '%Y-%m-%d') AS d,
               COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view
        FROM events
        GROUP BY d
        ORDER BY d
    """,
    doc="""Pivot (long -> wide): daily counts per event type as columns.
    The value list is EXPLICIT — without it Spark runs an extra
    distinct-collect job to discover the columns, a driver round-trip
    you never want on a 100 TB table.  Pivot-count yields 0 for empty
    cells (matching SQL conditional counts), so no null-coalescing is
    needed.""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        e.select(F.date_format("ts", "yyyy-MM-dd").alias("d"), "event_type")
        .groupBy("d")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
        .orderBy("d")
    )


@register(
    "agg_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_qty,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus))
        ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
                 l_linestatus NULLS FIRST
    """,
    doc="""Custom GROUPING SETS (beyond rollup/cube): the three-set case
    (pair + each single dimension, no grand total).  GROUPING() columns
    disambiguate real NULLs from subtotal rows.  One pass over the fact
    table expands rows per set with map-side partials — same plan shape
    Spark uses for rollup/cube.""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_qty,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus))
        ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
                 l_linestatus NULLS FIRST
    """)


_HIST_WIDTH_C = 2000  # bucket width in value-cents: 20.00 per bucket


@register(
    "agg_histogram",
    oracle=f"""
        WITH s AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS v100 FROM events
        )
        SELECT v100 // {_HIST_WIDTH_C} AS bucket,
               CAST(v100 // {_HIST_WIDTH_C} * {_HIST_WIDTH_C} AS DOUBLE)
                   / 100.0 AS lo,
               CAST((v100 // {_HIST_WIDTH_C} + 1) * {_HIST_WIDTH_C} AS DOUBLE)
                   / 100.0 AS hi,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(v100) AS DOUBLE) / 100.0 AS sum_value
        FROM s GROUP BY bucket
        ORDER BY bucket
    """,
    doc="""Equi-width histogram with exact integer bucket edges: values
    are scaled to cents first (functions/exact.py discipline), so bucket
    membership is integer division — no float-boundary ambiguity at
    bucket edges across engines (floor(x/20.0) would disagree with
    DuckDB exactly at the boundaries binary doubles can't represent).

    Scale: one map-side-combining hash aggregate on a small integer
    key — the cheapest possible shape; this is the profiling primitive
    behind range-partition boundary estimation and skew detection
    (AQE's own stats are the same computation).""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    v100 = F.round(F.col("value") * 100).cast("long")
    bucket = F.expr(f"v100 DIV {_HIST_WIDTH_C}")
    return (
        e.select(v100.alias("v100"))
        .select("v100", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            (F.col("bucket") * _HIST_WIDTH_C).cast("double").alias("lo"),
            ((F.col("bucket") + 1) * _HIST_WIDTH_C).cast("double").alias("hi"),
            F.count("*").alias("n_events"),
            (F.sum("v100").cast("double") / F.lit(100.0)).alias("sum_value"),
        )
        .select(
            "bucket",
            (F.col("lo") / 100.0).alias("lo"),
            (F.col("hi") / 100.0).alias("hi"),
            "n_events",
            "sum_value",
        )
        .orderBy("bucket")
    )


@register(
    "agg_unpivot",
    oracle="""
        WITH wide AS (
            SELECT date_trunc('day', ts) AS d,
                   CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                        AS BIGINT) AS click,
                   CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                        AS BIGINT) AS purchase,
                   CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                        AS BIGINT) AS view
            FROM events GROUP BY d
        )
        SELECT CAST(d AS TIMESTAMP) AS d, event_type, n
        FROM wide
        UNPIVOT (n FOR event_type IN (click, purchase, view))
        ORDER BY d, event_type
    """,
    doc="""Unpivot / melt — the inverse of agg_pivot: a wide per-day
    counts table (one column per event type) back to long (day, type,
    count) form via DataFrame.unpivot (Spark >= 3.4; DuckDB UNPIVOT in
    the oracle).  The wide input is built in-query from events so the
    pair (pivot, unpivot) is a proven round-trip on the same data.

    Scale: unpivot is a zero-shuffle projection (each input row emits k
    rows map-side, a generate node — no exchange); the only shuffle is
    the upstream day aggregate it consumes.""",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    types = ["click", "purchase", "view"]
    wide = (
        # .cast(ntz): date_trunc coerces NTZ -> session-zone LTZ; the
        # cast back (the batch_windows convention) keeps the collected
        # value wall-clock-stable on a non-UTC driver session
        e.select(
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("d"),
            "event_type",
        )
        .groupBy("d")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
    )
    return wide.unpivot("d", types, "event_type", "n").orderBy("d", "event_type")


_TRAIL_US = 3_600_000_000  # 1 hour trailing RANGE frame


@register(
    "window_range_trailing",
    oracle=f"""
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_1h,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
                    AS DOUBLE) / 100.0 AS sum_trailing_1h
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN {_TRAIL_US} PRECEDING AND CURRENT ROW
        )
        ORDER BY event_id
    """,
    doc="""RANGE-frame trailing window: per user, the event count and
    exact value sum over the trailing 1 HOUR by event time — a frame
    bounded by value distance, not row count, so ties and irregular
    spacing are handled correctly (the rows-frame moving average,
    window_moving_avg, cannot express this).  The frame key is integer
    epoch-micros and the sum is scaled-BIGINT, so frame membership and
    results are engine-exact; null timestamps are filtered (a RANGE
    frame over null has no defined distance).

    Scale: one shuffle on user_id; within a partition Spark keeps a
    sliding two-pointer over the sorted run — O(n) per partition, state
    is the in-frame aggregate, same as the streaming sliding window's
    batch form.""",
)
def window_range_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_TRAIL_US, Window.currentRow)
    )
    v100 = F.round(F.col("value") * 100).cast("long")
    return e.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w).alias("n_trailing_1h"),
        (F.sum(v100).over(w).cast("double") / F.lit(100.0)).alias("sum_trailing_1h"),
    ).orderBy("event_id")


@register(
    "agg_bitmap_presence",
    oracle="""
        WITH m AS (
            SELECT event_type,
                   CAST(1 AS BIGINT) << CAST(user_id % 60 AS INTEGER) AS mask
            FROM events
        ),
        agg AS (
            SELECT event_type, bit_or(mask) AS presence_mask
            FROM m GROUP BY event_type
        )
        SELECT event_type, presence_mask,
               CAST(bit_count(presence_mask) AS BIGINT) AS n_slots
        FROM agg
        ORDER BY event_type
    """,
    doc="""Bitmap presence aggregation: each user hashes to a bit slot
    (user_id % 60 here; 60 < 63 keeps the BIGINT sign bit clear), and
    BIT_OR collapses a group's users into one 64-bit mask whose
    popcount bounds the distinct count — the fixed-width building block
    of roaring-bitmap/HLL-style distinct sketches, with the property
    approx_count_distinct lacks: masks MERGE exactly (bit_or is
    associative/commutative/idempotent), so partial masks roll up
    across partitions, days, and retries without drift, and the result
    is deterministic enough to oracle-check.

    Scale: the shuffle carries one BIGINT per (group, partition) —
    map-side bit_or combine does the heavy lifting; widen slots with an
    array of longs (bitmap chunks) exactly like dedup_simhash's chunked
    fingerprints.""",
)
def agg_bitmap_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 60 AS INT))")
    return (
        e.select("event_type", mask.alias("mask"))
        .groupBy("event_type")
        .agg(F.bit_or("mask").alias("presence_mask"))
        .select(
            "event_type",
            "presence_mask",
            F.bit_count("presence_mask").cast("bigint").alias("n_slots"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_share_reused_exchange",
    oracle="""
        WITH m AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS rev_scaled
            FROM orders GROUP BY month
        )
        SELECT month,
               CAST(rev_scaled AS DOUBLE) / 100.0 AS revenue,
               CAST(rev_scaled AS DOUBLE)
                   / CAST((SELECT MAX(rev_scaled) FROM m) AS DOUBLE)
                   AS share_of_best
        FROM m
        ORDER BY month
    """,
    doc="""Share-of-best-month: monthly revenue normalized by the max
    month, written as per-month agg + broadcast join against the global
    max OF THAT SAME AGGREGATE.  Catalyst plans the repeated subtree
    once — the second consumer reads a ReusedExchange instead of
    re-scanning and re-aggregating (plan-asserted), so the fact table
    is scanned exactly once.  This exchange-reuse is the free-win that
    makes 'metric + % of total' dashboard queries cheap at 100 TB:
    materialize nothing, still pay one scan.  Exactness: revenues stay
    scaled BIGINTs through the max; the share is one double division.""",
)
def agg_share_reused_exchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        F.sum(scaled_long(F.col("o_totalprice"), 100)).alias("rev_scaled")
    )
    best = m.agg(F.max("rev_scaled").alias("best_scaled"))
    return (
        m.crossJoin(F.broadcast(best))
        .select(
            "month",
            (F.col("rev_scaled").cast("double") / 100.0).alias("revenue"),
            (
                F.col("rev_scaled").cast("double")
                / F.col("best_scaled").cast("double")
            ).alias("share_of_best"),
        )
        .orderBy("month")
    )


@register(
    "agg_filtered_bool",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE o_totalprice > 150000)
                    AS BIGINT) AS n_big,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        FILTER (WHERE o_orderpriority = '1-URGENT')
                    AS DOUBLE) / 100.0 AS urgent_total,
               bool_or(o_totalprice > 400000) AS any_huge,
               bool_and(o_totalprice > 1000) AS all_over_1k
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    doc="""Filtered aggregates (the SQL FILTER (WHERE ...) clause) and
    boolean aggregates (any/every): conditional facets of one group-by
    computed in a single pass — the idiom that replaces N separate
    filtered sub-queries with one scan and N conditional accumulators
    (Catalyst compiles FILTER to the same conditional-sum form the
    CASE-pivot TPC-H queries use).  COALESCE-free: a filter matching
    no rows yields NULL for SUM and false-domain semantics for
    every/any, identical in both engines.  Executed through spark.sql
    to exercise the FILTER parser syntax specifically.""",
)
def agg_filtered_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("khl_fagg_orders")
    return spark.sql("""
        SELECT o_orderstatus,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        FILTER (WHERE o_orderpriority = '1-URGENT')
                    AS DOUBLE) / 100.0 AS urgent_total,
               any(o_totalprice > 400000) AS any_huge,
               every(o_totalprice > 1000) AS all_over_1k
        FROM khl_fagg_orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """)


@register(
    "agg_grouping_id",
    oracle="""
        SELECT COALESCE(l_returnflag, '(all)') AS rflag,
               COALESCE(l_linestatus, '(all)') AS lstatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rflag,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                    AS BIGINT) AS gid,
               CASE CAST(GROUPING(l_returnflag) * 2
                         + GROUPING(l_linestatus) AS INTEGER)
                    WHEN 0 THEN 'detail'
                    WHEN 1 THEN 'per_flag'
                    ELSE 'grand_total' END AS level,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY gid, rflag, lstatus
    """,
    doc="""GROUPING()/GROUPING_ID over a ROLLUP: the disambiguation
    functions that distinguish a REAL null key from a subtotal row —
    without them, rollup output is unusable on nullable dimensions
    (a null-keyed detail row and the subtotal row look identical).
    The grouping id doubles as the level label every pivoted report
    keys on.  agg_rollup shows the subtotal mechanics; this shows the
    metadata contract.  Note the bit order: Spark's grouping_id()
    numbers bits left-to-right over the grouping set, so the portable
    form used here composes GROUPING() bits explicitly — identical in
    both engines by construction.""",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    g_r = F.grouping("l_returnflag").cast("bigint")
    g_l = F.grouping("l_linestatus").cast("bigint")
    gid = g_r * 2 + g_l
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            g_r.alias("g_rflag"),
            gid.alias("gid"),
            F.when(gid == 0, "detail")
            .when(gid == 1, "per_flag")
            .otherwise("grand_total")
            .alias("level"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("lstatus"),
            "g_rflag",
            "gid",
            "level",
            "n_rows",
        )
        .orderBy("gid", "rflag", "lstatus")
    )


@register(
    "agg_argminmax",
    oracle="""
        SELECT o_orderpriority,
               arg_max(o_orderkey,
                       CAST(ROUND(o_totalprice * 100) AS BIGINT) * 1000000000
                       + o_orderkey) AS biggest_order,
               arg_min(o_orderkey,
                       CAST(ROUND(o_totalprice * 100) AS BIGINT) * 1000000000
                       + o_orderkey) AS smallest_order,
               max(o_totalprice) AS max_price,
               min(o_totalprice) AS min_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="""arg-min/arg-max (max_by/min_by): fetch the KEY of the extreme
    row in one aggregate — replacing the self-join-on-max or window+
    filter idioms with a single map-side-combinable accumulator (the
    partial state is just (best_key, best_value), which is why it
    scales like min/max).  Determinism discipline: arbitrary among
    ties, so the comparison value is a composite integer
    (scaled_price * 10^9 + orderkey) that is UNIQUE per row while
    orderkey < 10^9 (TPC-H reaches that around sf≈170; headroom:
    max scaled_price ≈ 6·10^7, so the product stays ≤ 6·10^16 ≪ 2^63) — both
    engines must select the identical row, making the operator
    oracle-checkable (naked max_by(price) would not be).""",
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    ckey = (
        F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(1000000000)
        + F.col("o_orderkey")
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", ckey).alias("biggest_order"),
            F.min_by("o_orderkey", ckey).alias("smallest_order"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_totalprice").alias("min_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "orders_basket_size_dist",
    oracle="""
        WITH sizes AS (
            SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT n_lines,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(*) AS DOUBLE)
                   / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS order_share,
               CAST(n_lines * COUNT(*) AS BIGINT) AS n_items
        FROM sizes
        GROUP BY n_lines
        ORDER BY n_lines
    """,
    doc="""Basket-size distribution — the count-of-counts idiom: first
    aggregate lineitems per order, then aggregate the sizes themselves
    (how many 1-line orders, 2-line orders, ...).  Two chained hash
    aggregates; the second input is |orders| rows, its output at most
    max-basket-size rows, so the share denominator (a window over ~7
    rows) is trivially global.  Count-of-counts is the shape behind
    degree distributions, word-frequency-of-frequencies (Good-Turing),
    and file-size histograms — all exact integers plus one share
    division.""",
)
def orders_basket_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    dist = sizes.groupBy("n_lines").agg(F.count("*").alias("n_orders"))
    # bounded input: <= max-basket-size aggregate rows, declared single
    # partition (plans/ranking.bounded_window_key)
    w = Window.partitionBy(bounded_window_key("n_lines"))
    return (
        dist.select(
            "n_lines",
            "n_orders",
            (
                F.col("n_orders").cast("double")
                / F.sum("n_orders").over(w).cast("double")
            ).alias("order_share"),
            (F.col("n_lines") * F.col("n_orders")).alias("n_items"),
        )
        .orderBy("n_lines")
    )


# --- Weighted median --------------------------------------------------------


@register(
    "agg_weighted_median",
    oracle="""
        WITH obs AS (
            SELECT l_returnflag AS returnflag,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       AS price_cents,
                   CAST(l_quantity AS BIGINT) AS w
            FROM lineitem
        ),
        g AS (
            SELECT returnflag, price_cents, CAST(SUM(w) AS BIGINT) AS w
            FROM obs GROUP BY 1, 2
        ),
        cum AS (
            SELECT returnflag, price_cents, w,
                   CAST(SUM(w) OVER (PARTITION BY returnflag
                                     ORDER BY price_cents) AS BIGINT) AS cw,
                   CAST(SUM(w) OVER (PARTITION BY returnflag) AS BIGINT)
                       AS tw
            FROM g
        )
        SELECT returnflag, tw AS total_weight,
               CAST(MIN(CASE WHEN 2 * cw >= tw THEN price_cents END)
                    AS BIGINT) AS weighted_median_cents
        FROM cum GROUP BY returnflag, tw
        ORDER BY returnflag
    """,
    doc="""Exact weighted median — quantity-weighted median unit price
    per return flag (the inventory-valuation number a plain median
    gets wrong when line sizes vary): the smallest price whose
    cumulative quantity weight reaches half the total, located by the
    cross-multiplied test 2*cum >= total on exact BIGINT weights (the
    lower weighted median; no interpolation, the quantiles_exact
    convention).

    Scale: the input collapses FIRST to the (group, distinct price)
    grain — one map-side-combining aggregate — so the cumulative
    window runs over the bounded price DOMAIN per group (~10^6 cent
    values at any corpus size), not over rows.  The selection itself
    is a conditional MIN, one more hash aggregate.""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.col("l_returnflag").alias("returnflag"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("price_cents"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("bigint").alias("w"))
    wc = (
        Window.partitionBy("returnflag")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("returnflag")
    cum = g.select(
        "returnflag",
        "price_cents",
        F.sum("w").over(wc).cast("bigint").alias("cw"),
        F.sum("w").over(wt).cast("bigint").alias("tw"),
    )
    return (
        cum.groupBy("returnflag", F.col("tw").alias("total_weight"))
        .agg(
            F.min(
                F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_cents"))
            )
            .cast("bigint")
            .alias("weighted_median_cents")
        )
        .orderBy("returnflag")
    )


# --- Fulfillment latency scorecard -------------------------------------------


@register(
    "orders_fulfillment_latency",
    oracle="""
        WITH lat AS (
            SELECT o_orderpriority AS priority,
                   CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                  CAST(l_shipdate AS DATE)) AS BIGINT)
                       AS days
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        g AS (
            SELECT priority, days, CAST(COUNT(*) AS BIGINT) AS c
            FROM lat GROUP BY 1, 2
        ),
        cum AS (
            SELECT priority, days, c,
                   CAST(SUM(c) OVER (PARTITION BY priority ORDER BY days)
                        AS BIGINT) AS cw,
                   CAST(SUM(c) OVER (PARTITION BY priority) AS BIGINT) AS n
            FROM g
        )
        SELECT priority, MAX(n) AS n_lines,
               CAST(MIN(CASE WHEN cw * 2 >= n THEN days END) AS BIGINT)
                   AS p50_days,
               CAST(MIN(CASE WHEN cw * 10 >= 9 * n THEN days END) AS BIGINT)
                   AS p90_days,
               CAST(MIN(CASE WHEN cw * 100 >= 99 * n THEN days END)
                    AS BIGINT) AS p99_days,
               CAST(MAX(days) AS BIGINT) AS max_days,
               CAST(SUM(CASE WHEN days <= 30 THEN c ELSE 0 END) AS BIGINT)
                   AS n_within_30,
               CAST(SUM(CASE WHEN days <= 30 THEN c ELSE 0 END) AS DOUBLE)
                   / CAST(MAX(n) AS DOUBLE) AS sla_30_rate,
               SUM(CASE WHEN days <= 30 THEN c ELSE 0 END) * 2 >= MAX(n)
                   AS sla_majority
        FROM cum GROUP BY priority ORDER BY priority
    """,
    doc="""Fulfillment-latency SLA scorecard — tpch_q12's bucket counts
    upgraded to the percentile form an operations dashboard actually
    tracks: per order priority, exact p50/p90/p99 order-to-ship days,
    the worst case, and the 30-day SLA attainment with a
    cross-multiplied majority verdict.  (Measured on the fixture:
    URGENT's tail is WORSE than NOT-SPECIFIED's median — the
    classic prioritization-inversion smell this table exists to
    catch.)

    Determinism: day deltas are exact integers off the date grid; each
    percentile is the type-1 rank selection MIN(v | cum*q_den >=
    q_num*n) on BIGINT cumulative counts — the cross-multiplied form
    of position ceil(q*n); the SLA rate is one division.

    Scale: collapses to the (priority, distinct-days) grain first —
    the cumulative window runs over the bounded DAY DOMAIN (a few
    thousand values at any corpus size), never over line items.""",
)
def orders_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("bigint")
        .alias("days"),
    )
    g = lat.groupBy("priority", "days").agg(
        F.count("*").cast("bigint").alias("c")
    )
    wc = (
        Window.partitionBy("priority")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("priority")
    cum = g.select(
        "priority",
        "days",
        "c",
        F.sum("c").over(wc).cast("bigint").alias("cw"),
        F.sum("c").over(wt).cast("bigint").alias("n"),
    )
    within = F.sum(F.when(F.col("days") <= 30, F.col("c")).otherwise(0))
    return (
        cum.groupBy("priority")
        .agg(
            F.max("n").alias("n_lines"),
            F.min(F.when(2 * F.col("cw") >= F.col("n"), F.col("days")))
            .cast("bigint")
            .alias("p50_days"),
            F.min(F.when(10 * F.col("cw") >= 9 * F.col("n"), F.col("days")))
            .cast("bigint")
            .alias("p90_days"),
            F.min(F.when(100 * F.col("cw") >= 99 * F.col("n"), F.col("days")))
            .cast("bigint")
            .alias("p99_days"),
            F.max("days").cast("bigint").alias("max_days"),
            within.cast("bigint").alias("n_within_30"),
            (within.cast("double") / F.max("n").cast("double")).alias(
                "sla_30_rate"
            ),
            (within * 2 >= F.max("n")).alias("sla_majority"),
        )
        .orderBy("priority")
    )
