"""Workload-diagnostics operators: key-skew profiling and a
bucket-expanded interval-overlap join.

Both address the operational side of running joins/aggs at 100 TB:
`skew_profile` is the diagnostic you run BEFORE picking a salting
factor (join_salted_skew's planning input), and
`interval_overlap_join` is the shuffle-safe formulation of the
interval/range join that BroadcastNestedLoop (join_range) cannot
sustain once both sides are large: expand intervals to covering
time buckets, equi-join on the bucket id, then re-verify the exact
overlap predicate — candidate generation becomes a hash join whose
fan-out is bounded by interval length / bucket width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.plans.ranking import bounded_window_key
from kafka_hadoop_loader_spark.registry import register

_US_PER_HOUR = 3_600_000_000


@register(
    "skew_profile",
    oracle="""
        WITH k AS (
            SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY l_suppkey
        ),
        tot AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_keys
            FROM k
        ),
        r AS (
            SELECT key, cnt,
                   CAST(SUM(cnt) OVER (ORDER BY cnt DESC, key) AS BIGINT) AS cum
            FROM k
        )
        SELECT r.key AS key, r.cnt AS cnt,
               CAST(r.cnt AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
               CAST(r.cum AS DOUBLE) / CAST(t.total AS DOUBLE) AS cum_share,
               CAST(r.cnt AS DOUBLE)
                   / (CAST(t.total AS DOUBLE) / CAST(t.n_keys AS DOUBLE))
                   AS x_over_avg
        FROM r CROSS JOIN tot t
        ORDER BY cnt DESC, key
        LIMIT 20
    """,
    doc="""Key-skew profile: the top-20 heaviest join/agg keys with
    their share of total rows, cumulative share, and heaviness relative
    to the mean key — the diagnostic that decides whether a key needs
    salting (join_salted_skew) or AQE skew-split will do.  All ratios
    are doubles from exact integer counts with identical expression
    text; the LIMIT rides on (cnt DESC, key).

    Scale: one map-side-combining count per key + a 1-row broadcast
    total; the running cumulative window is over the top slice ordered
    by exact integers.  This is the profile a shuffle-planning advisor
    computes from table statistics at 100 TB — O(|keys|), never
    O(|rows|), past the first aggregate.""",
)
def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(F.count("*").alias("cnt"))
    tot = k.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_keys")
    )
    # bounded input: O(|keys|) aggregate rows, declared single partition
    w = (
        Window.partitionBy(bounded_window_key("cnt"))
        .orderBy(F.col("cnt").desc(), "key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = k.select("key", "cnt", F.sum("cnt").over(w).alias("cum"))
    return (
        r.join(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            F.expr("CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)").alias("share"),
            F.expr("CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)").alias("cum_share"),
            F.expr(
                "CAST(cnt AS DOUBLE)"
                " / (CAST(total AS DOUBLE) / CAST(n_keys AS DOUBLE))"
            ).alias("x_over_avg"),
        )
        .orderBy(F.col("cnt").desc(), "key")
        .limit(20)
    )


@register(
    "interval_overlap_join",
    oracle=f"""
        WITH sess AS (
            SELECT user_id,
                   MIN(epoch_us(ts)) AS s_us,
                   MAX(epoch_us(ts)) AS e_us
            FROM events
            GROUP BY user_id, epoch_us(ts) // {4 * _US_PER_HOUR}
        ),
        incidents AS (
            SELECT epoch_us(ts) // {_US_PER_HOUR} AS hour_id,
                   CAST(COUNT(*) AS BIGINT) AS n_errors
            FROM events WHERE event_type = 'error'
            GROUP BY hour_id
            HAVING COUNT(*) >= 3
        )
        SELECT s.user_id AS user_id,
               make_timestamp(s.s_us) AS session_start,
               make_timestamp(i.hour_id * {_US_PER_HOUR}) AS incident_hour,
               i.n_errors AS n_errors
        FROM sess s JOIN incidents i
          ON s.s_us < (i.hour_id + 1) * {_US_PER_HOUR}
         AND s.e_us >= i.hour_id * {_US_PER_HOUR}
        ORDER BY user_id, session_start, incident_hour
    """,
    doc="""Interval-overlap join, bucket-expanded: per-user activity
    intervals (4h-grid session bounds) joined to global incident hours
    (hours with ≥3 error events) on time overlap.  The Spark side
    EXPANDS each interval to its covering hour ids (sequence+explode),
    equi-joins incidents on hour_id, and keeps the exact overlap
    predicate as a residual — candidate generation is a hash join, and
    the fan-out per interval is bounded by length/bucket (≤5 here).
    The oracle states the pure range predicate; results are identical
    because bucket expansion is a complete cover of the overlap
    condition.

    Scale: THE sustainable interval-join layout — join_range's
    BroadcastNestedLoop needs one tiny side, while this shape
    hash-partitions on bucket id and survives two large sides (the same
    expansion trick join_asof uses for its range buckets).  All bounds
    are integer epoch-µs; timestamps rebuilt only for presentation.""",
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    sess = (
        e.groupBy(
            "user_id",
            F.expr(f"ts_us DIV {4 * _US_PER_HOUR}").alias("blk"),
        )
        .agg(F.min("ts_us").alias("s_us"), F.max("ts_us").alias("e_us"))
        .drop("blk")
    )
    incidents = (
        e.where(F.col("event_type") == "error")
        .groupBy(F.expr(f"ts_us DIV {_US_PER_HOUR}").alias("hour_id"))
        .agg(F.count("*").alias("n_errors"))
        .where(F.col("n_errors") >= 3)
    )
    covered = sess.select(
        "user_id",
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                F.expr(f"s_us DIV {_US_PER_HOUR}"),
                F.expr(f"e_us DIV {_US_PER_HOUR}"),
            )
        ).alias("hour_id"),
    )
    return (
        covered.join(incidents, "hour_id")
        .where(
            (F.col("s_us") < (F.col("hour_id") + 1) * _US_PER_HOUR)
            & (F.col("e_us") >= F.col("hour_id") * _US_PER_HOUR)
        )
        .select(
            "user_id",
            F.timestamp_micros(F.col("s_us")).cast("timestamp_ntz").alias("session_start"),
            F.timestamp_micros(F.col("hour_id") * _US_PER_HOUR)
            .cast("timestamp_ntz")
            .alias("incident_hour"),
            "n_errors",
        )
        .orderBy("user_id", "session_start", "incident_hour")
    )
