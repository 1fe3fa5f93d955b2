"""Time-series operators over the events stream: regular-grid
resampling with gap fill, SCD2 interval history, incremental
hourly->daily rollup, and cohort retention.

These are the hypertable-style operations a metrics/observability
pipeline layers on top of the loader's time-bucketed output
(SURVEY.md §1.2): the reference stops at landing files per (topic,
date, hour); this module is the query surface that consumes that
layout.  All grid arithmetic is on integer epoch-hour/day ids
(``ts_us DIV 3_600_000_000``) so bucket membership is bit-identical
across engines — no timestamp truncation semantics in play, per
SURVEY.md §5.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.functions.exact import exact_sum
from kafka_hadoop_loader_spark.plans.ranking import bounded_window_key, two_phase_rank
from kafka_hadoop_loader_spark.registry import register

_US_PER_HOUR = 3_600_000_000
_US_PER_DAY = 86_400_000_000

# Session gap + per-session row cap shared by the journey-building
# queries (frequent_sequences, events_pattern_regex).  30-minute
# inactivity gap (same as window_session_batch); 1000 events per
# session is the hard in-code bound so no collect_list/string group
# ever exceeds it, whatever one actor does.
_SESSION_GAP_US = 30 * 60 * 1_000_000
_SESSION_ROW_CAP = 1000

# The DuckDB-side mirror of _capped_sessions(): identical gap rule,
# identical (ts, event_id) total order, identical row cap.  Oracle SQL
# for the journey queries interpolates this CTE prefix so both engines
# sessionize bit-identically.
_SESSION_CTE = f"""
        ordered AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
                   CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                             > {_SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ),
        sessions AS (
            SELECT user_id, event_id, event_type, ts_us,
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM ordered
        ),
        capped AS (
            SELECT user_id, sess_id, event_id, event_type, ts_us
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                           PARTITION BY user_id, sess_id
                           ORDER BY ts_us, event_id) AS rn
                FROM sessions)
            WHERE rn <= {_SESSION_ROW_CAP}
        )
"""


def _capped_sessions(e: DataFrame) -> DataFrame:
    """Sessionize events per user (30-min gap) and hard-cap each
    session at ``_SESSION_ROW_CAP`` rows.

    This is the in-code bound the journey queries build on: every
    downstream ``collect_list`` / ``concat_ws`` groups by
    ``(user_id, sess_id)`` AFTER this cap, so no single group can
    exceed 1000 rows regardless of how active one user is — the
    10^8-event bot becomes ~10^5 bounded sessions instead of one giant
    row.  Two window passes share the hash(user_id) exchange: the
    second window's (user_id, sess_id) clustering is satisfied by the
    first's user_id partitioning (subset rule), so Spark inserts only
    a local re-sort, no second shuffle.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = e.select("user_id", "event_id", "event_type", "ts_us").withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > F.lit(_SESSION_GAP_US)),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "sess_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w2 = Window.partitionBy("user_id", "sess_id").orderBy("ts_us", "event_id")
    return (
        sessions.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= _SESSION_ROW_CAP)
        .drop("is_new", "rn")
    )


@register(
    "resample_ffill",
    oracle=f"""
        WITH e AS (
            SELECT event_type, epoch_us(ts) // {_US_PER_HOUR} AS hour_id
            FROM events
        ),
        hourly AS (
            SELECT event_type, hour_id, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM e GROUP BY event_type, hour_id
        ),
        bounds AS (
            SELECT MIN(hour_id) AS h0, MAX(hour_id) AS h1 FROM e
        ),
        spine AS (
            SELECT t.event_type, u.h AS hour_id
            FROM (SELECT DISTINCT event_type FROM e) t
            CROSS JOIN bounds b,
            unnest(generate_series(b.h0, b.h1)) AS u(h)
        )
        SELECT s.event_type AS event_type,
               make_timestamp(s.hour_id * {_US_PER_HOUR}) AS hour_ts,
               h.cnt AS cnt,
               COALESCE(
                   last_value(h.cnt IGNORE NULLS) OVER (
                       PARTITION BY s.event_type ORDER BY s.hour_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), CAST(0 AS BIGINT)) AS cnt_filled,
               (h.cnt IS NULL) AS is_gap
        FROM spine s LEFT JOIN hourly h
          ON s.event_type = h.event_type AND s.hour_id = h.hour_id
        ORDER BY event_type, hour_ts
    """,
    doc="""Regular-grid resampling with forward fill (last observation
    carried forward): build the complete per-series hourly spine
    between the stream's global bounds, left-join the observed hourly
    aggregates, and LOCF the gaps — the standard gap-fill shape for
    metrics dashboards and model feature grids.

    Scale: bounds come from a 1-row global aggregate (broadcast, no
    driver collect); the spine is generated distributed via
    sequence+explode, never materialized on the driver.  The fill is a
    running window per series — state is one value per series, and at
    100 TB you partition the window by (series, coarse-time-chunk) and
    stitch chunk boundaries with a per-chunk last-value map the same
    way pack_sequences two-phases its prefix sums.  The grid id is
    integer epoch-hours, so bucket edges are engine-exact.""",
)
def resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_us DIV {_US_PER_HOUR}").alias("hour_id")
    )
    hourly = e.groupBy("event_type", "hour_id").agg(F.count("*").alias("cnt"))
    bounds = e.agg(F.min("hour_id").alias("h0"), F.max("hour_id").alias("h1"))
    spine = (
        e.select("event_type")
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hour_id"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "hour_id"], "left")
        .select(
            "event_type",
            F.timestamp_micros(F.col("hour_id") * _US_PER_HOUR)
            .cast("timestamp_ntz")
            .alias("hour_ts"),
            "cnt",
            F.coalesce(
                F.last("cnt", ignorenulls=True).over(w), F.lit(0).cast("bigint")
            ).alias("cnt_filled"),
            F.col("cnt").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "hour_ts")
    )


@register(
    "scd2_history",
    oracle="""
        WITH o AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ) AS prev_type
            FROM events
        ),
        changes AS (
            SELECT user_id, event_type, ts
            FROM o
            WHERE prev_type IS NULL OR prev_type <> event_type
        )
        SELECT user_id, event_type,
               ts AS valid_from,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts
               ) AS valid_to,
               (lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL)
                   AS is_current,
               CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY ts
               ) AS BIGINT) AS version
        FROM changes
        ORDER BY user_id, valid_from
    """,
    doc="""Slowly-changing-dimension type 2 history build: collapse an
    event stream into per-key state intervals — a row per contiguous
    run of the same state with [valid_from, valid_to) bounds, a
    current-row flag, and a version counter.  This is the standard
    warehouse pattern for turning the loader's append-only CDC feed
    into a point-in-time-queryable dimension (the as-of join,
    join_asof, is its read-side dual).

    Plan: one shuffle on user_id serves all three windows (change
    detection, interval close, versioning) — Spark reuses the
    partitioning across window steps since the partition key never
    changes.  The change filter drops runs before the interval windows
    run, so window state is rows-that-changed, not raw events.  Ties
    within a key are broken by event_id, so the history is total-order
    deterministic.""",
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        e.select(
            "user_id",
            "event_type",
            "ts",
            F.lag("event_type").over(w_seq).alias("prev_type"),
        )
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .drop("prev_type")
    )
    w_iv = Window.partitionBy("user_id").orderBy("ts")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w_iv).alias("valid_to"),
        F.lead("ts").over(w_iv).isNull().alias("is_current"),
        F.row_number().over(w_iv).cast("bigint").alias("version"),
    ).orderBy("user_id", "valid_from")


@register(
    "rollup_incremental",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type,
                   epoch_us(ts) // {_US_PER_HOUR} AS hour_id,
                   CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT)
                       AS sum_scaled
            FROM events
            GROUP BY event_type, hour_id
        )
        SELECT event_type,
               hour_id // 24 AS day_id,
               CAST(COUNT(*) AS BIGINT) AS n_hours,
               CAST(SUM(cnt) AS BIGINT) AS n_events,
               CAST(SUM(sum_scaled) AS DOUBLE) / 100.0 AS sum_value
        FROM hourly
        GROUP BY event_type, day_id
        ORDER BY event_type, day_id
    """,
    doc="""Incremental rollup (hypertable continuous-aggregate shape):
    the daily aggregate is computed FROM the hourly partial aggregates,
    not from raw events — counts re-sum and the scaled-BIGINT partial
    sums re-sum exactly (functions/exact.py), which is precisely why
    the partials are kept in integer space: double partials would drift
    when re-aggregated in a different order.

    Scale: this is the materialized-rollup maintenance path at 100 TB —
    the hourly layer is O(series x hours) regardless of raw volume, so
    the daily refresh touches partials only (~10^4x smaller than the
    stream), and late data only dirties the specific (series, hour)
    partials it lands in.""",
)
def rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            F.expr(f"ts_us DIV {_US_PER_HOUR}").alias("hour_id"),
            F.round(F.col("value") * 100).cast("long").alias("v_scaled"),
        )
        .groupBy("event_type", "hour_id")
        .agg(F.count("*").alias("cnt"), F.sum("v_scaled").alias("sum_scaled"))
    )
    return (
        hourly.groupBy("event_type", F.expr("hour_id DIV 24").alias("day_id"))
        .agg(
            F.count("*").alias("n_hours"),
            F.sum("cnt").alias("n_events"),
            (F.sum("sum_scaled").cast("double") / F.lit(100.0)).alias("sum_value"),
        )
        .orderBy("event_type", "day_id")
    )


@register(
    "events_retention",
    oracle=f"""
        WITH d AS (
            SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_id
            FROM events
        ),
        cohort AS (
            SELECT user_id, MIN(day_id) AS cohort_day FROM d GROUP BY user_id
        )
        SELECT c.cohort_day AS cohort_day,
               d.day_id - c.cohort_day AS day_offset,
               CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
        FROM d JOIN cohort c ON d.user_id = c.user_id
        GROUP BY cohort_day, day_offset
        ORDER BY cohort_day, day_offset
    """,
    doc="""Cohort retention matrix: users are cohorted by first-seen
    day; each cell counts distinct users from a cohort active at a
    given day offset — the canonical product-analytics query (the
    events_funnel sibling along the time axis).

    Plan: the cohort map is a groupBy(user_id).min — at real scale a
    fraction of the event count — and joins back on user_id; with AQE
    the cohort side broadcasts when small.  Both aggregates are
    map-side-combining hash aggs on integer day ids; COUNT(DISTINCT
    user) expands to the standard two-phase distinct expand.  Nothing
    touches the driver.""",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"ts_us DIV {_US_PER_DAY}").alias("day_id")
    )
    cohort = d.groupBy("user_id").agg(F.min("day_id").alias("cohort_day"))
    return (
        d.join(cohort, "user_id")
        .groupBy("cohort_day", (F.col("day_id") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "cumulative_distinct_users",
    oracle=f"""
        WITH d AS (
            SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_id FROM events
        ),
        first_seen AS (
            SELECT user_id, MIN(day_id) AS first_day FROM d GROUP BY user_id
        ),
        new_per_day AS (
            SELECT first_day AS day_id, CAST(COUNT(*) AS BIGINT) AS n_new
            FROM first_seen GROUP BY first_day
        ),
        days AS (SELECT DISTINCT day_id FROM d)
        SELECT make_timestamp(dy.day_id * {_US_PER_DAY}) AS day_ts,
               COALESCE(n.n_new, CAST(0 AS BIGINT)) AS n_new_users,
               CAST(SUM(COALESCE(n.n_new, 0)) OVER (
                   ORDER BY dy.day_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_cum_users
        FROM days dy LEFT JOIN new_per_day n ON n.day_id = dy.day_id
        ORDER BY day_ts
    """,
    doc="""Cumulative distinct-user growth curve: per active day, the
    number of first-seen users and the running total of users ever
    seen — the growth-accounting companion to events_retention (same
    first-seen map, integrated over time instead of cohorted).

    The naive formulation — COUNT(DISTINCT user) OVER (ORDER BY day) —
    re-scans every prior day per output row (quadratic, and Spark
    rejects DISTINCT window aggregates outright).  Decomposing into
    first-seen day + running SUM of a per-day count makes it one
    groupBy(user).min, one day-level aggregate, and a linear window
    over O(days) rows — the standard trick for cumulative-distinct at
    any scale.  All counts exact integers on the epoch-day grid.""",
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"ts_us DIV {_US_PER_DAY}").alias("day_id")
    )
    first_seen = d.groupBy("user_id").agg(F.min("day_id").alias("first_day"))
    new_per_day = first_seen.groupBy(
        F.col("first_day").alias("day_id")
    ).agg(F.count("*").alias("n_new"))
    days = d.select("day_id").distinct()
    # bounded input: O(days) rows, declared single partition
    w = (
        Window.partitionBy(bounded_window_key("day_id"))
        .orderBy("day_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        days.join(new_per_day, "day_id", "left")
        .select(
            "day_id",
            F.coalesce("n_new", F.lit(0).cast("bigint")).alias("n_new_users"),
            F.sum(F.coalesce("n_new", F.lit(0))).over(w).cast("bigint").alias("n_cum_users"),
        )
        .select(
            F.timestamp_micros(F.col("day_id") * _US_PER_DAY)
            .cast("timestamp_ntz")
            .alias("day_ts"),
            "n_new_users",
            "n_cum_users",
        )
        .orderBy("day_ts")
    )


@register(
    "ts_similarity_search",
    oracle=f"""
        WITH vecs AS (
            SELECT user_id,
                   epoch_us(ts) // {_US_PER_DAY} AS day_id,
                   CAST((epoch_us(ts) % {_US_PER_DAY}) // {_US_PER_HOUR} AS BIGINT)
                       AS hour_slot,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events
            GROUP BY user_id, day_id, hour_slot
        ),
        totals AS (
            SELECT user_id, day_id, CAST(SUM(cnt) AS BIGINT) AS n_events
            FROM vecs GROUP BY user_id, day_id
        ),
        q AS (
            SELECT user_id AS q_user, day_id AS q_day FROM totals
            ORDER BY n_events DESC, user_id, day_id LIMIT 1
        ),
        dists AS (
            SELECT t.user_id, t.day_id, t.n_events,
                   CAST(SUM(
                       (COALESCE(v.cnt, 0) - COALESCE(qv.cnt, 0))
                       * (COALESCE(v.cnt, 0) - COALESCE(qv.cnt, 0))
                   ) AS BIGINT) AS dist2
            FROM totals t
            CROSS JOIN q
            CROSS JOIN unnest(generate_series(0, 23)) AS h(slot)
            LEFT JOIN vecs v
              ON v.user_id = t.user_id AND v.day_id = t.day_id
             AND v.hour_slot = h.slot
            LEFT JOIN vecs qv
              ON qv.user_id = q.q_user AND qv.day_id = q.q_day
             AND qv.hour_slot = h.slot
            WHERE NOT (t.user_id = q.q_user AND t.day_id = q.q_day)
            GROUP BY t.user_id, t.day_id, t.n_events
        )
        SELECT user_id, day_id, n_events, dist2
        FROM dists
        ORDER BY dist2, user_id, day_id
        LIMIT 10
    """,
    doc="""Time-series similarity search (the distributed-subsequence-
    search shape of the streaming-similarity literature): each (user,
    day) becomes a 24-dim hourly activity vector; the busiest user-day
    is the query; output the 10 nearest user-days by exact integer
    squared Euclidean distance on the hour grid.

    The Spark side stays LONG-FORMAT: distances come from one equi-join
    on hour_slot against the broadcast 24-row query vector and a
    map-side-combining sum — never a 24-column pivot, never a crossJoin
    of series.  Missing hours are implicit zeros: the query vector's
    per-slot contribution for absent slots is added via the broadcast
    q-norm complement, keeping the join sparse (only observed slots
    shuffle) — the sparse-distance decomposition ‖a-b‖² =
    Σ_observed(a_h-b_h)² + Σ_unobserved(b_h²).

    Scale: |series| × 24 rows shuffle once; at 10^9 series you block on
    coarse signatures first (knn_cosine_lsh's discipline) and this
    exact pass ranks candidates only.""",
)
def ts_similarity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    vecs = (
        e.select(
            "user_id",
            F.expr(f"ts_us DIV {_US_PER_DAY}").alias("day_id"),
            F.expr(f"(ts_us % {_US_PER_DAY}) DIV {_US_PER_HOUR}").alias("hour_slot"),
        )
        .groupBy("user_id", "day_id", "hour_slot")
        .agg(F.count("*").alias("cnt"))
    )
    totals = vecs.groupBy("user_id", "day_id").agg(F.sum("cnt").alias("n_events"))
    q = (
        totals.orderBy(F.col("n_events").desc(), "user_id", "day_id")
        .limit(1)
        .select(F.col("user_id").alias("q_user"), F.col("day_id").alias("q_day"))
    )
    qvec = (
        vecs.join(
            F.broadcast(q),
            (vecs.user_id == F.col("q_user")) & (vecs.day_id == F.col("q_day")),
        )
        .select("hour_slot", F.col("cnt").alias("q_cnt"))
    )
    # sparse distance: sum over the series' observed slots of
    # (cnt - q_cnt)^2 - q_cnt^2  (the correction term), plus the full
    # query norm added back once per series.
    qnorm = qvec.agg(F.sum(F.col("q_cnt") * F.col("q_cnt")).alias("q_norm2"))
    obs = (
        vecs.join(F.broadcast(qvec), "hour_slot", "left")
        .withColumn("q_cnt", F.coalesce("q_cnt", F.lit(0)))
        .groupBy("user_id", "day_id")
        .agg(
            F.sum(
                (F.col("cnt") - F.col("q_cnt")) * (F.col("cnt") - F.col("q_cnt"))
                - F.col("q_cnt") * F.col("q_cnt")
            ).alias("partial")
        )
    )
    return (
        obs.join(F.broadcast(qnorm))
        .join(totals, ["user_id", "day_id"])
        .join(F.broadcast(q))
        .where(~((F.col("user_id") == F.col("q_user")) & (F.col("day_id") == F.col("q_day"))))
        .select(
            "user_id",
            "day_id",
            "n_events",
            (F.col("partial") + F.col("q_norm2")).alias("dist2"),
        )
        .orderBy("dist2", "user_id", "day_id")
        .limit(10)
    )


@register(
    "frequent_sequences",
    oracle=f"""
        WITH {_SESSION_CTE},
        seqs AS (
            SELECT user_id, sess_id,
                   list(event_type ORDER BY ts_us, event_id) AS seq
            FROM capped
            GROUP BY user_id, sess_id
        ),
        grams AS (
            SELECT user_id,
                   seq[i] || '>' || seq[i + 1] || '>' || seq[i + 2] AS trigram
            FROM seqs, unnest(generate_series(1, len(seq) - 2)) AS u(i)
            WHERE len(seq) >= 3
        )
        SELECT trigram,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM grams
        GROUP BY trigram
        ORDER BY n_occurrences DESC, trigram
        LIMIT 20
    """,
    doc="""Sequential-pattern mining (lite): the top-20 most frequent
    behavioral trigrams — ordered event-type triples a user performs
    consecutively WITHIN a session — with occurrence and distinct-user
    support counts; the k-gram sweep behind funnel discovery
    (events_funnel checks ONE known pattern; this surfaces candidates).

    Sequences are built per (user, 30-min-gap session) via
    ``_capped_sessions`` — the bound is IN CODE, not prose: row_number
    caps every session at 1000 rows BEFORE collect_list, so no group
    ever materializes more than 1000 structs even for a bot user with
    10^8 events.  Each session's sequence is assembled once as a
    sorted array (deterministic (ts, event_id) total order) and
    trigrams are sliced IN-ROW; shuffles are the user window exchange
    (reused by the session cap via the subset rule) and the final gram
    count — no three-chained-lag pass, no self-joins.  Gram counting
    is a map-side-combining hash aggregate.""",
)
def frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    seqs = (
        _capped_sessions(e)
        .groupBy("user_id", "sess_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts_us", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ).alias("seq")
        )
    )
    grams = (
        seqs.where(F.size("seq") >= 3)
        .select(
            "user_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("seq") - 2),
                    lambda i: F.concat_ws(
                        ">",
                        F.element_at("seq", i),
                        F.element_at("seq", i + 1),
                        F.element_at("seq", i + 2),
                    ),
                )
            ).alias("trigram"),
        )
    )
    return (
        grams.groupBy("trigram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_occurrences").desc(), "trigram")
        .limit(20)
    )


@register(
    "events_user_lifetime",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_us,
               CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us,
               CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT)
                   AS span_us,
               CAST(COUNT(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT)
                   AS n_active_days,
               CASE WHEN COUNT(*) > 1
                    THEN CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS DOUBLE)
                         / CAST(COUNT(*) - 1 AS DOUBLE)
                    ELSE NULL END AS avg_gap_us
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    doc="""Per-user lifetime/tenure profile: event count, first/last
    activity, span, distinct active days, and mean inter-event gap —
    the per-entity activity summary every engagement/churn model starts
    from.  All time arithmetic is on integer epoch-µs (ts_us), the gap
    is one exact division of integers, and active days use integer
    day ids — engine-exact throughout.  One hash aggregate with
    map-side partials; countDistinct on the day id expands to the usual
    two-phase plan, both phases keyed on user_id so nothing reshuffles
    between them.""",
)
def events_user_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    day = F.expr("ts_us DIV 86400000000")
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_us").alias("first_us"),
            F.max("ts_us").alias("last_us"),
            (F.max("ts_us") - F.min("ts_us")).alias("span_us"),
            F.countDistinct(day).alias("n_active_days"),
            F.when(
                F.count("*") > 1,
                (F.max("ts_us") - F.min("ts_us")).cast("double")
                / (F.count("*") - 1).cast("double"),
            ).alias("avg_gap_us"),
        )
        .orderBy("user_id")
    )


@register(
    "events_pipeline_report",
    oracle="""
        WITH f AS (
            SELECT event_id, user_id, value,
                   epoch_us(ts) AS ts_us,
                   row_number() OVER (PARTITION BY event_id
                                      ORDER BY epoch_us(ts), user_id)
                       AS rn,
                   (value IS NOT NULL AND value >= 0) AS valid
            FROM events
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS c0,
                   CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS c1,
                   CAST(SUM(CASE WHEN rn = 1 AND valid THEN 1 ELSE 0 END)
                        AS BIGINT) AS c2,
                   CAST(COUNT(DISTINCT CASE WHEN rn = 1 AND valid
                                            THEN user_id END) AS BIGINT)
                       AS c3,
                   CAST(COUNT(DISTINCT CASE WHEN rn = 1 AND valid
                                            THEN ts_us // 3600000000 END)
                        AS BIGINT) AS c4
            FROM f
        )
        SELECT * FROM (
            SELECT CAST(0 AS BIGINT) AS stage_idx, 'raw' AS stage, c0 AS n
            FROM m
            UNION ALL SELECT 1, 'deduped', c1 FROM m
            UNION ALL SELECT 2, 'valid', c2 FROM m
            UNION ALL SELECT 3, 'distinct_users', c3 FROM m
            UNION ALL SELECT 4, 'hours_covered', c4 FROM m
        )
        ORDER BY stage_idx
    """,
    doc="""The loader's end-to-end ingest audit (the events-side twin of
    pipeline_funnel): raw count → replay-dedup survivors (keep-first on
    event_id, the batch mirror of the streaming dropDuplicates) →
    validity gate → distinct users and distinct hours covered — the
    five numbers an ingest run reports before its output is trusted.
    One scan, one window shuffle on event_id, conditional sums +
    conditional COUNT(DISTINCT)s in a single aggregate, transposed to
    long form.  At 100 TB the same plan holds: the dedup window keys on
    event_id (uniformly distributed), and the final aggregate is one
    row.""",
)
def events_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_id").orderBy("ts_us", "user_id")
    f = e.select(
        "event_id",
        "user_id",
        "value",
        "ts_us",
        F.row_number().over(w).alias("rn"),
        (F.col("value").isNotNull() & (F.col("value") >= 0)).alias("valid"),
    )
    first = F.col("rn") == 1
    keep = first & F.col("valid")
    m = f.agg(
        F.count("*").alias("c0"),
        F.sum(first.cast("bigint")).alias("c1"),
        F.sum(keep.cast("bigint")).alias("c2"),
        F.countDistinct(F.when(keep, F.col("user_id"))).alias("c3"),
        F.countDistinct(F.when(keep, F.expr("ts_us DIV 3600000000"))).alias("c4"),
    )
    stages = ("raw", "deduped", "valid", "distinct_users", "hours_covered")
    stack_args = ", ".join(
        f"CAST({i} AS BIGINT), '{s}', c{i}" for i, s in enumerate(stages)
    )
    return m.selectExpr(
        f"stack(5, {stack_args}) AS (stage_idx, stage, n)"
    ).orderBy("stage_idx")


@register(
    "events_activity_islands",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS day_id
            FROM events
        ),
        marked AS (
            SELECT user_id, day_id,
                   day_id - row_number() OVER (PARTITION BY user_id
                                               ORDER BY day_id) AS island
            FROM days
        )
        SELECT user_id,
               CAST(MIN(day_id) AS BIGINT) AS start_day,
               CAST(MAX(day_id) AS BIGINT) AS end_day,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM marked
        GROUP BY user_id, island
        ORDER BY user_id, start_day
    """,
    doc="""Gaps-and-islands: contiguous runs of active days per user via
    the classic ``value - row_number()`` constant-per-run trick — a
    streak/tenure idiom distinct from session windows (those gap on
    event-time deltas; this runs on the integer day grid, so a single
    event at 23:59 and one at 00:01 next day still extend the streak).
    One distinct + one window + one aggregate, all partitioned on
    user_id — a single shuffle end-to-end since every operator reuses
    the same partitioning.  Day ids are exact integers (ts_us DIV
    86.4e9), so runs and their endpoints are engine-identical.""",
)
def events_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.expr("ts_us DIV 86400000000").alias("day_id")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_id")
    marked = days.withColumn(
        "island", F.col("day_id") - F.row_number().over(w)
    )
    return (
        marked.groupBy("user_id", "island")
        .agg(
            F.min("day_id").alias("start_day"),
            F.max("day_id").alias("end_day"),
            F.count("*").alias("n_days"),
        )
        .select("user_id", "start_day", "end_day", "n_days")
        .orderBy("user_id", "start_day")
    )


@register(
    "events_markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY epoch_us(ts), event_id)
                       AS next_type
            FROM events
        ),
        pairs AS (
            SELECT event_type AS cur, next_type AS nxt,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY cur, nxt
        ),
        tot AS (
            SELECT cur, CAST(SUM(n) AS BIGINT) AS n_out FROM pairs GROUP BY cur
        )
        SELECT p.cur, p.nxt, p.n, t.n_out,
               CAST(p.n AS DOUBLE) / CAST(t.n_out AS DOUBLE) AS p_next
        FROM pairs p JOIN tot t USING (cur)
        ORDER BY cur, nxt
    """,
    doc="""First-order Markov transition matrix of user behavior:
    P(next event type | current) from per-user time-ordered sequences
    — the behavioral model behind next-action prediction and anomaly
    scoring (frequent_sequences mines the top patterns; this is the
    full normalized matrix).  lead() over (user, time) builds the
    transitions in one window pass; probabilities are exact single
    divisions of integer counts.  Ties in event time are broken by
    event_id so the sequence — and therefore the matrix — is
    engine-identical.  One window shuffle on user_id + two tiny
    aggregates; the matrix is |event_types|² rows regardless of
    stream size.""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("cur"), F.col("next_type").alias("nxt")
    ).agg(F.count("*").alias("n"))
    tot = pairs.groupBy("cur").agg(F.sum("n").alias("n_out"))
    return (
        pairs.join(F.broadcast(tot), "cur")
        .select(
            "cur",
            "nxt",
            "n",
            "n_out",
            (F.col("n").cast("double") / F.col("n_out").cast("double")).alias(
                "p_next"
            ),
        )
        .orderBy("cur", "nxt")
    )


@register(
    "events_time_weighted_avg",
    oracle="""
        WITH seq AS (
            SELECT user_id, value, epoch_us(ts) AS ts_us, event_id,
                   lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                            ORDER BY epoch_us(ts), event_id)
                       AS next_us
            FROM events
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               CAST(SUM(next_us - ts_us) AS BIGINT) AS total_us,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                        * (next_us - ts_us)) AS DOUBLE)
                   / (CAST(SUM(next_us - ts_us) AS DOUBLE) * 100.0)
                   AS twap
        FROM seq
        WHERE next_us IS NOT NULL AND next_us > ts_us
        GROUP BY user_id
        ORDER BY user_id
    """,
    doc="""Time-weighted average (TWAP): each observation holds until
    the next one, so its weight is the interval it was live — the
    correct mean for irregularly-sampled state (sensor readings,
    prices, quality scores); the naive row-mean over-weights bursts.
    One lead() window per user builds the intervals; the weighted sum
    is exact (scaled-int value × integer µs duration; headroom 1e4·1e13
    per term, well inside int64 for per-user horizons), closed by one
    division.  Zero-duration intervals (ties) are excluded on both
    sides.  Window and aggregate share the user_id partitioning — one
    shuffle.""",
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = e.select(
        "user_id",
        "value",
        "ts_us",
        F.lead("ts_us").over(w).alias("next_us"),
    ).where(F.col("next_us").isNotNull() & (F.col("next_us") > F.col("ts_us")))
    dur = F.col("next_us") - F.col("ts_us")
    return (
        seq.groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum(dur).alias("total_us"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long") * dur).cast(
                    "double"
                )
                / (F.sum(dur).cast("double") * 100.0)
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


_CONC_WIN_US = 30 * 60 * 1_000_000  # presence window per event


@register(
    "events_peak_concurrency",
    oracle=f"""
        WITH bounds AS (
            SELECT epoch_us(ts) AS t, 1 AS delta, event_id
            FROM events
            UNION ALL
            SELECT epoch_us(ts) + {_CONC_WIN_US}, -1, event_id
            FROM events
        ),
        sweep AS (
            SELECT t, delta,
                   SUM(delta) OVER (ORDER BY t, delta DESC, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS concurrent,
                   t // 86400000000 AS day_id
            FROM bounds
        )
        SELECT CAST(day_id AS BIGINT) AS day_id,
               CAST(MAX(concurrent) AS BIGINT) AS peak_concurrent,
               CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_opens
        FROM sweep
        GROUP BY day_id
        ORDER BY day_id
    """,
    doc=f"""Peak concurrency by sweep-line: every event opens a
    30-minute presence interval; +1/-1 boundary points sorted by time
    with a running sum give the exact concurrent-presence curve, and
    the per-day MAX of that curve is the capacity-planning number
    (simultaneous sessions) that windowed counts only approximate.
    Determinism: boundary ties order (time, closes-after-opens wait —
    opens first via delta DESC, then event_id), identical in both
    engines, so the curve — and its peaks — match exactly.  The
    running sum is a global-order scan: at 100 TB you run the same
    sweep per shard-able key (here the day would become the partition
    after a boundary-day fixup); the demo keeps the single ordered
    pass explicit.""",
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    opens = e.select(
        F.col("ts_us").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    closes = e.select(
        (F.col("ts_us") + _CONC_WIN_US).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    bounds = opens.unionAll(closes)
    # distributed sweep line (plans/ranking.py): the running sum over
    # the global boundary order is a two-phase prefix sum — local
    # cumsum per value bucket + broadcast per-bucket offsets — instead
    # of a single-partition window over 2x|events| rows.
    sweep = two_phase_rank(
        bounds,
        "t",
        [F.col("t"), F.col("delta").desc(), F.col("event_id")],
        prefix_sum=("concurrent", F.col("delta")),
    ).select(
        "t",
        "delta",
        "concurrent",
        F.expr("t DIV 86400000000").alias("day_id"),
    )
    return (
        sweep.groupBy("day_id")
        .agg(
            F.max("concurrent").alias("peak_concurrent"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_opens"),
        )
        .orderBy("day_id")
    )


@register(
    "orders_cohort_revenue",
    oracle="""
        WITH firsts AS (
            SELECT o_custkey,
                   MIN(strftime(o_orderdate, '%Y-%m')) AS cohort
            FROM orders GROUP BY o_custkey
        ),
        tagged AS (
            SELECT f.cohort,
                   strftime(o.o_orderdate, '%Y-%m') AS ym,
                   o.o_totalprice
            FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
        ),
        monthly AS (
            SELECT cohort, ym,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
            FROM tagged GROUP BY cohort, ym
        )
        SELECT cohort, ym,
               CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
               CAST(SUM(rev_c) OVER (PARTITION BY cohort
                                     ORDER BY ym
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS DOUBLE)
                   / 100.0 AS cumulative_revenue
        FROM monthly
        ORDER BY cohort, ym
    """,
    doc="""Cohort revenue / LTV curve: customers are stamped with their
    first-order month (the cohort), every later order's revenue
    accrues to that cohort's month, and a running sum per cohort gives
    the cumulative-LTV curve finance projects from (events_retention
    is this matrix's count-form twin).  The first-order stamp is a
    MIN-aggregate joined back to the fact (no window over the raw
    orders; the per-customer aggregate is SF-proportional, so the join
    strategy is AQE's, not a forced broadcast); revenues stay scaled
    BIGINTs through the running sum, so every cell of the matrix is
    exact.  Shape: two aggregates + one key join + a cohort-partitioned
    window over the tiny monthly matrix — the fact table is scanned
    twice.""",
)
def orders_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_format("o_orderdate", "yyyy-MM")).alias("cohort")
    )
    tagged = o.join(firsts, "o_custkey").select(
        "cohort",
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        "o_totalprice",
    )
    monthly = tagged.groupBy("cohort", "ym").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("ym")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "cohort",
        "ym",
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        (F.sum("rev_c").over(w).cast("double") / 100.0).alias(
            "cumulative_revenue"
        ),
    ).orderBy("cohort", "ym")


@register(
    "events_dau_wau_mau",
    oracle="""
        WITH presence AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS day_id
            FROM events
        ),
        spine AS (SELECT DISTINCT day_id FROM presence)
        SELECT s.day_id,
               CAST(COUNT(DISTINCT CASE WHEN p.day_id = s.day_id
                                        THEN p.user_id END) AS BIGINT)
                   AS dau,
               CAST(COUNT(DISTINCT CASE WHEN p.day_id > s.day_id - 7
                                        THEN p.user_id END) AS BIGINT)
                   AS wau,
               CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS mau
        FROM spine s
        JOIN presence p
          ON p.day_id <= s.day_id AND p.day_id > s.day_id - 28
        GROUP BY s.day_id
        ORDER BY s.day_id
    """,
    doc="""DAU/WAU/MAU: rolling distinct active users over 1/7/28-day
    trailing windows — THE engagement dashboard, and the query shape
    that defeats naive windowing (COUNT DISTINCT cannot slide as a
    frame aggregate because distinctness doesn't decompose).  The
    scalable form used here: reduce the stream to the (user, day)
    presence grid first — |users|·|active days| rows instead of raw
    events — then a range join of the day spine against at most 28
    days of presence per output day, with the three horizons as
    conditional distinct counts in ONE aggregate.  At 100 TB the
    presence grid is the stored daily rollup this query reads instead
    of raw events; everything after is proportional to users×28.""",
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    presence = e.select(
        "user_id", F.expr("ts_us DIV 86400000000").alias("day_id")
    ).distinct()
    spine = presence.select("day_id").distinct().withColumnRenamed("day_id", "d")
    joined = spine.join(
        presence,
        (F.col("day_id") <= F.col("d")) & (F.col("day_id") > F.col("d") - 28),
    )
    return (
        joined.groupBy("d")
        .agg(
            F.countDistinct(
                F.when(F.col("day_id") == F.col("d"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct(
                F.when(F.col("day_id") > F.col("d") - 7, F.col("user_id"))
            ).alias("wau"),
            F.countDistinct("user_id").alias("mau"),
        )
        .select(F.col("d").alias("day_id"), "dau", "wau", "mau")
        .orderBy("day_id")
    )


@register(
    "events_seasonality_profile",
    oracle="""
        SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_value,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY dow, hod
        ORDER BY dow, hod
    """,
    doc="""Weekly seasonality profile: the (day-of-week × hour-of-day)
    activity matrix — the fingerprint that staffing, anomaly baselines,
    and traffic forecasts are all read off.  Spark's dayofweek is
    1-based and DuckDB's 0-based (the documented scalars.py
    cross-engine delta, normalized here with +1); hours come off the
    same NTZ microsecond timeline both engines share.  One hash
    aggregate with map-side combine into at most 168 cells — the
    output is constant-size no matter how many years of events flow
    in, which is what makes this a standing dashboard query at any
    scale.""",
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.dayofweek("ts").cast("bigint").alias("dow"),
            F.hour("ts").cast("bigint").alias("hod"),
        )
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / 100.0
            ).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("dow", "hod")
    )


@register(
    "events_longest_streak",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
                       AS pos
            FROM events
        ),
        hits AS (
            SELECT user_id, pos,
                   pos - row_number() OVER (PARTITION BY user_id
                                            ORDER BY pos) AS grp
            FROM seq WHERE value >= 50
        ),
        runs AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS run_len
            FROM hits GROUP BY user_id, grp
        )
        SELECT user_id,
               CAST(MAX(run_len) AS BIGINT) AS longest_streak,
               CAST(COUNT(*) AS BIGINT) AS n_runs,
               CAST(SUM(run_len) AS BIGINT) AS n_hits
        FROM runs
        GROUP BY user_id
        ORDER BY user_id
    """,
    doc="""Longest conditional streak: each user's longest run of
    consecutive high-value events (value >= 50) in event order — the
    run-length-encoding form of gaps-and-islands, keyed on sequence
    position instead of calendar day (events_activity_islands' twin
    for within-session behavior: hot hands, consecutive failures,
    consecutive conversions).  Two row_numbers whose difference is
    constant within a run, then two aggregates — every operator
    partitions on user_id, so the whole pipeline rides one shuffle.
    Event-time ties break by event_id; counts are exact.""",
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    w1 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    e = table(spark, sf_dir, "events")
    seq = e.select("user_id", "value", F.row_number().over(w1).alias("pos"))
    w2 = Window.partitionBy("user_id").orderBy("pos")
    hits = seq.where(F.col("value") >= 50).withColumn(
        "grp", F.col("pos") - F.row_number().over(w2)
    )
    runs = hits.groupBy("user_id", "grp").agg(F.count("*").alias("run_len"))
    return (
        runs.groupBy("user_id")
        .agg(
            F.max("run_len").alias("longest_streak"),
            F.count("*").alias("n_runs"),
            F.sum("run_len").alias("n_hits"),
        )
        .orderBy("user_id")
    )


@register(
    "events_type_diversity",
    oracle="""
        WITH c AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id, event_type
        )
        SELECT user_id,
               CAST(SUM(cnt) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(cnt * cnt) AS DOUBLE)
                   / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE))
                   AS simpson_index,
               (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE))
                   / CAST(SUM(cnt * cnt) AS DOUBLE) AS effective_types
        FROM c
        GROUP BY user_id
        ORDER BY user_id
    """,
    doc="""Behavioral diversity via the Simpson index: Σpᵢ² (the
    probability two random events share a type) and its inverse, the
    effective number of types — the PORTABLE concentration/diversity
    statistic (Shannon entropy needs ln(), which is not bit-identical
    across libms; Simpson is pure rational arithmetic on counts, so it
    hash-matches).  Same family as text_gini_diversity, here over the
    behavioral stream.  Two chained aggregates on user_id — one
    shuffle; integer sums of squares stay far inside int64.""",
)
def events_type_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    tot = F.sum("cnt")
    sq = F.sum(F.col("cnt") * F.col("cnt"))
    return (
        c.groupBy("user_id")
        .agg(
            tot.alias("n_events"),
            F.count("*").alias("n_types"),
            (sq.cast("double") / (tot.cast("double") * tot.cast("double"))).alias(
                "simpson_index"
            ),
            ((tot.cast("double") * tot.cast("double")) / sq.cast("double")).alias(
                "effective_types"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "events_new_vs_returning",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(epoch_us(ts) // 86400000000) AS first_day
            FROM events GROUP BY user_id
        ),
        daily AS (
            SELECT DISTINCT e.user_id,
                   epoch_us(e.ts) // 86400000000 AS day_id
            FROM events e
        )
        SELECT CAST(d.day_id AS BIGINT) AS day_id,
               CAST(SUM(CASE WHEN d.day_id = f.first_day THEN 1 ELSE 0 END)
                    AS BIGINT) AS new_users,
               CAST(SUM(CASE WHEN d.day_id > f.first_day THEN 1 ELSE 0 END)
                    AS BIGINT) AS returning_users,
               CAST(SUM(CASE WHEN d.day_id = f.first_day THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS new_share
        FROM daily d JOIN firsts f USING (user_id)
        GROUP BY d.day_id
        ORDER BY d.day_id
    """,
    doc="""New vs returning daily actives — the growth-accounting split
    (every DAU is either acquired today or retained from before).
    First-seen day per user is one MIN aggregate joined back onto the
    distinct (user, day) presence grid (per-user state is
    SF-proportional, so the join strategy is AQE's, never a forced
    broadcast); the split is conditional sums and one exact share
    division.  Composes with events_dau_wau_mau (same presence grid)
    and events_retention (the cohort view of the same fact).  Day ids
    are exact integers; one presence shuffle + one key join.""",
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    day = F.expr("ts_us DIV 86400000000")
    firsts = e.groupBy("user_id").agg(F.min(day).alias("first_day"))
    daily = e.select("user_id", day.alias("day_id")).distinct()
    is_new = F.col("day_id") == F.col("first_day")
    return (
        daily.join(firsts, "user_id")
        .groupBy("day_id")
        .agg(
            F.sum(F.when(is_new, 1).otherwise(0)).cast("bigint").alias("new_users"),
            F.sum(F.when(F.col("day_id") > F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("returning_users"),
            (
                F.sum(F.when(is_new, 1).otherwise(0)).cast("double")
                / F.count("*").cast("double")
            ).alias("new_share"),
        )
        .orderBy("day_id")
    )


@register(
    "orders_reorder_cycle",
    oracle="""
        WITH seq AS (
            SELECT o_custkey,
                   date_diff('day',
                             lag(CAST(o_orderdate AS DATE))
                                 OVER (PARTITION BY o_custkey
                                       ORDER BY CAST(o_orderdate AS DATE),
                                                o_orderkey),
                             CAST(o_orderdate AS DATE)) AS gap_days
            FROM orders
        )
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_reorders,
               CAST(MIN(gap_days) AS BIGINT) AS min_gap_days,
               CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
               CAST(SUM(gap_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS avg_gap_days
        FROM seq
        WHERE gap_days IS NOT NULL
        GROUP BY o_custkey
        HAVING COUNT(*) >= 2
        ORDER BY o_custkey
    """,
    doc="""Reorder cycle: per-customer gaps between consecutive orders
    (lag over the order sequence, date ties broken by order key) —
    the purchase-cadence metric behind replenishment forecasts and
    churn-risk clocks (a customer N× past their own average gap is
    lapsing).  Day gaps are exact date arithmetic; the mean is one
    division; customers with fewer than two gaps are excluded so every
    statistic is well-defined.  Window and aggregate share the
    customer partitioning — one shuffle.""",
)
def orders_reorder_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date"), "o_orderkey"
    )
    gap = F.datediff(
        F.col("o_orderdate").cast("date"),
        F.lag(F.col("o_orderdate").cast("date")).over(w),
    ).cast("long")
    seq = o.select("o_custkey", gap.alias("gap_days")).where(
        F.col("gap_days").isNotNull()
    )
    return (
        seq.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_reorders"),
            F.min("gap_days").alias("min_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
            (F.sum("gap_days").cast("double") / F.count("*").cast("double")).alias(
                "avg_gap_days"
            ),
        )
        .where(F.col("n_reorders") >= 2)
        .orderBy("o_custkey")
    )


_SEQ_PATTERN = "vc*p"  # view, any clicks, purchase — the conversion funnel


@register(
    "events_pattern_regex",
    oracle=f"""
        WITH {_SESSION_CTE},
        j AS (
            SELECT user_id, sess_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts_us, event_id) AS journey,
                   CAST(COUNT(*) AS BIGINT) AS n_sess_events
            FROM capped
            GROUP BY user_id, sess_id
        )
        SELECT user_id,
               CAST(SUM(n_sess_events) AS BIGINT) AS n_events,
               CAST(SUM(len(regexp_extract_all(journey, '{_SEQ_PATTERN}')))
                    AS BIGINT) AS n_funnel_matches,
               SUM(len(regexp_extract_all(journey, '{_SEQ_PATTERN}'))) > 0
                   AS has_funnel
        FROM j
        GROUP BY user_id
        ORDER BY user_id
    """,
    doc="""Sequence-pattern matching over event streams (the
    MATCH_RECOGNIZE / complex-event-processing workload, which Spark
    SQL lacks natively): each session's events collapse to an ordered
    journey string of event-type initials, the conversion funnel
    `view (click)* purchase` is counted as a regex over each session
    string — non-overlapping left-to-right matches, identical
    semantics in Java regex and RE2 for this pattern class — and
    per-session match counts roll up per user.

    Determinism: journeys are built over the total order
    (ts, event_id); initials are single fixed bytes; counts are
    BIGINT (DuckDB's SUM is CAST back to BIGINT per the decimal
    convention).

    Scale: journeys are built per (user, 30-min session) via
    ``_capped_sessions``, whose row_number cap bounds every journey
    string at 1000 chars IN CODE — a funnel spanning a >30-min idle
    gap is deliberately not a funnel.  The regex pass stays a pure
    map; the per-user rollup is a second small hash aggregate (one
    row per session).  This row-pattern-as-regex reduction is the
    standard Spark answer to Flink CEP / Oracle MATCH_RECOGNIZE.""",
)
def events_pattern_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    rows = _capped_sessions(e).select(
        "user_id",
        "sess_id",
        F.struct(F.col("ts_us"), F.col("event_id")).alias("k"),
        F.substring("event_type", 1, 1).alias("ch"),
    )
    j = rows.groupBy("user_id", "sess_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "ch"))),
                lambda s: s["ch"],
            ),
        ).alias("journey"),
        F.count("*").alias("n_sess_events"),
    )
    per_sess = j.select(
        "user_id",
        "n_sess_events",
        F.regexp_count("journey", F.lit(_SEQ_PATTERN)).cast("bigint").alias("m"),
    )
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.sum("n_sess_events").cast("bigint").alias("n_events"),
            F.sum("m").cast("bigint").alias("n_funnel_matches"),
        )
        .select(
            "user_id",
            "n_events",
            "n_funnel_matches",
            (F.col("n_funnel_matches") > 0).alias("has_funnel"),
        )
        .orderBy("user_id")
    )


@register(
    "events_attribution_touch",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
                   first_value(event_type) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ) AS first_touch,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ) AS prev_type
            FROM events
        ),
        purchases AS (
            SELECT user_id, first_touch,
                   COALESCE(prev_type, '(none)') AS last_touch
            FROM ordered WHERE event_type = 'purchase'
        ),
        ft AS (
            SELECT first_touch AS channel,
                   CAST(COUNT(*) AS BIGINT) AS n_first_touch
            FROM purchases GROUP BY first_touch
        ),
        lt AS (
            SELECT last_touch AS channel,
                   CAST(COUNT(*) AS BIGINT) AS n_last_touch
            FROM purchases GROUP BY last_touch
        )
        SELECT COALESCE(ft.channel, lt.channel) AS channel,
               CAST(COALESCE(ft.n_first_touch, 0) AS BIGINT) AS n_first_touch,
               CAST(COALESCE(lt.n_last_touch, 0) AS BIGINT) AS n_last_touch
        FROM ft FULL OUTER JOIN lt ON ft.channel = lt.channel
        ORDER BY channel
    """,
    doc="""Conversion attribution — the product-analytics workload that
    assigns each purchase to a channel under two standard models in one
    pass: FIRST-touch (the user's first-ever event type) via
    first_value over the per-user total order, and LAST-touch (the
    event type immediately preceding the purchase) via lag.  Both
    credits aggregate per channel and align in one full-outer join.

    Determinism: the per-user order is total ((ts, event_id)); both
    window functions read exact values; counts are BIGINT.

    Scale: ONE shuffle (user partition) computes both window columns —
    the two attribution models share the same sort — then two tiny
    channel-cardinality aggregates.  This is why attribution models
    should be computed together, not as separate jobs over the same
    fact scan.""",
)
def events_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ordered = e.select(
        "user_id",
        "event_type",
        F.first("event_type").over(w).alias("first_touch"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    purchases = ordered.where(F.col("event_type") == "purchase").select(
        "first_touch",
        F.coalesce("prev_type", F.lit("(none)")).alias("last_touch"),
    )
    ft = purchases.groupBy(F.col("first_touch").alias("channel")).agg(
        F.count("*").alias("n_first_touch")
    )
    lt = purchases.groupBy(F.col("last_touch").alias("channel")).agg(
        F.count("*").alias("n_last_touch")
    )
    return (
        ft.join(lt, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce("n_first_touch", F.lit(0)).cast("bigint").alias("n_first_touch"),
            F.coalesce("n_last_touch", F.lit(0)).cast("bigint").alias("n_last_touch"),
        )
        .orderBy("channel")
    )


# --- Gap fill with linear interpolation --------------------------------

_HOUR_US = 3_600_000_000


@register(
    "resample_interpolate",
    oracle=f"""
        WITH ev AS (
            SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hidx, value
            FROM events
        ),
        hourly AS (
            SELECT event_type, hidx,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                       / (CAST(COUNT(*) AS DOUBLE) * 100.0) AS m
            FROM ev GROUP BY event_type, hidx
        ),
        bounds AS (SELECT MIN(hidx) AS mn, MAX(hidx) AS mx FROM ev),
        spine AS (
            SELECT t.event_type, u.g AS hidx
            FROM (SELECT DISTINCT event_type FROM ev) t
            CROSS JOIN bounds
            CROSS JOIN unnest(generate_series(bounds.mn, bounds.mx)) AS u(g)
        ),
        grid AS (
            SELECT s.event_type, s.hidx, h.n_events, h.m,
                   COUNT(h.m) OVER (PARTITION BY s.event_type
                                    ORDER BY s.hidx
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS grp
            FROM spine s LEFT JOIN hourly h
              ON s.event_type = h.event_type AND s.hidx = h.hidx
        ),
        anchors AS (
            SELECT event_type, grp, hidx AS apos, m AS aval
            FROM grid WHERE m IS NOT NULL
        )
        SELECT g.event_type,
               make_timestamp(g.hidx * {_HOUR_US}) AS hour,
               COALESCE(g.n_events, CAST(0 AS BIGINT)) AS n_events,
               g.m AS mean_value,
               CASE
                   WHEN g.m IS NOT NULL THEN g.m
                   WHEN p.aval IS NOT NULL AND nx.aval IS NOT NULL THEN
                       p.aval + (nx.aval - p.aval)
                           * (CAST(g.hidx - p.apos AS DOUBLE)
                              / CAST(nx.apos - p.apos AS DOUBLE))
                   WHEN p.aval IS NOT NULL THEN p.aval
                   ELSE NULL
               END AS filled_value,
               CASE
                   WHEN g.m IS NOT NULL THEN 'observed'
                   WHEN p.aval IS NOT NULL AND nx.aval IS NOT NULL
                       THEN 'interpolated'
                   WHEN p.aval IS NOT NULL THEN 'extrapolated'
                   ELSE 'missing'
               END AS fill_kind
        FROM grid g
        LEFT JOIN anchors p
          ON g.event_type = p.event_type AND g.grp = p.grp
        LEFT JOIN anchors nx
          ON g.event_type = nx.event_type AND g.grp + 1 = nx.grp
        ORDER BY g.event_type, hour
    """,
    doc="""Time-series gap fill with LINEAR INTERPOLATION — the
    resample_ffill upgrade for continuous metrics (forward fill is
    right for state, wrong for rates: an empty hour between load 10
    and load 20 is better estimated at the line between them).  Per
    event type, the hourly mean value over a complete integer-hour
    spine (min..max observed hour); missing hours get
    prev + (next - prev) * elapsed/gap; trailing hours flat-extrapolate
    the last anchor; leading hours (no prior anchor) stay NULL, each
    labeled by fill_kind.

    The prev/next anchors are found WITHOUT vendor IGNORE NULLS
    syntax: a running count of non-null observations assigns every
    spine row the index of its most recent anchor (grp), so prev =
    anchor[grp] and next = anchor[grp+1] are plain equi-joins — the
    same trick both engines express identically (and the portable form
    of Pandas' interpolate(method='linear')).

    Determinism: hour indexes are integer microsecond divisions;
    anchor means are exact scaled-BIGINT sums with one division; the
    interpolation is a fixed-shape IEEE expression of two anchors and
    two integer distances.

    Scale: spine size = hours x types (calendar-bounded, not
    data-bounded); one hash aggregate + windows and joins all
    partitioned by event_type — no global window, no driver loop.
    At 100 TB the fact aggregate dominates; the fill is O(spine).""",
)
def resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("ts_us") / _HOUR_US).cast("long").alias("hidx"),
        "value",
    )
    hourly = ev.groupBy("event_type", "hidx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(100.0))
        ).alias("m"),
    )
    bounds = ev.agg(F.min("hidx").alias("mn"), F.max("hidx").alias("mx"))
    types = ev.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("hidx"),
        )
    )
    wgrp = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grid = (
        spine.join(hourly, ["event_type", "hidx"], "left")
        .withColumn("grp", F.count("m").over(wgrp))
    )
    anchors = grid.where(F.col("m").isNotNull()).select(
        F.col("event_type").alias("a_type"),
        "grp",
        F.col("hidx").alias("apos"),
        F.col("m").alias("aval"),
    )
    p = anchors.select(
        F.col("a_type").alias("p_type"),
        F.col("grp").alias("p_grp"),
        F.col("apos").alias("p_pos"),
        F.col("aval").alias("p_val"),
    )
    nx = anchors.select(
        F.col("a_type").alias("n_type"),
        F.col("grp").alias("n_grp"),
        F.col("apos").alias("n_pos"),
        F.col("aval").alias("n_val"),
    )
    g = grid.join(
        p,
        (grid.event_type == p.p_type) & (grid.grp == p.p_grp),
        "left",
    ).join(
        nx,
        (grid.event_type == nx.n_type) & (grid.grp + 1 == nx.n_grp),
        "left",
    )
    interp = F.col("p_val") + (F.col("n_val") - F.col("p_val")) * (
        (F.col("hidx") - F.col("p_pos")).cast("double")
        / (F.col("n_pos") - F.col("p_pos")).cast("double")
    )
    return g.select(
        "event_type",
        F.timestamp_micros(F.col("hidx") * _HOUR_US)
        .cast("timestamp_ntz")
        .alias("hour"),
        F.coalesce(F.col("n_events"), F.lit(0).cast("bigint")).alias(
            "n_events"
        ),
        F.col("m").alias("mean_value"),
        F.when(F.col("m").isNotNull(), F.col("m"))
        .when(
            F.col("p_val").isNotNull() & F.col("n_val").isNotNull(), interp
        )
        .when(F.col("p_val").isNotNull(), F.col("p_val"))
        .alias("filled_value"),
        F.when(F.col("m").isNotNull(), "observed")
        .when(
            F.col("p_val").isNotNull() & F.col("n_val").isNotNull(),
            "interpolated",
        )
        .when(F.col("p_val").isNotNull(), "extrapolated")
        .otherwise("missing")
        .alias("fill_kind"),
    ).orderBy("event_type", "hour")


# --- CUSUM changepoint detection ---------------------------------------


@register(
    "events_changepoint_cusum",
    oracle=f"""
        WITH ev AS (
            SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hidx
            FROM events
        ),
        hourly AS (
            SELECT event_type, hidx, CAST(COUNT(*) AS BIGINT) AS c
            FROM ev GROUP BY event_type, hidx
        ),
        bounds AS (SELECT MIN(hidx) AS mn, MAX(hidx) AS mx FROM ev),
        spine AS (
            SELECT t.event_type, u.g AS hidx
            FROM (SELECT DISTINCT event_type FROM ev) t
            CROSS JOIN bounds
            CROSS JOIN unnest(generate_series(bounds.mn, bounds.mx)) AS u(g)
        ),
        grid AS (
            SELECT s.event_type, s.hidx, COALESCE(h.c, 0) AS c
            FROM spine s LEFT JOIN hourly h
              ON s.event_type = h.event_type AND s.hidx = h.hidx
        ),
        cum AS (
            SELECT event_type, hidx, c,
                   SUM(c) OVER w AS pre,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS i,
                   SUM(c) OVER (PARTITION BY event_type) AS tot,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n
            FROM grid
            WINDOW w AS (PARTITION BY event_type ORDER BY hidx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        scored AS (
            SELECT event_type, hidx, i, n, pre, tot,
                   abs(n * pre - i * tot) AS s_abs
            FROM cum WHERE i < n
        ),
        best AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY s_abs DESC, hidx) AS rk
                FROM scored
            ) WHERE rk = 1
        )
        SELECT event_type,
               make_timestamp(hidx * {_HOUR_US}) AS changepoint_hour,
               CAST(s_abs AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
                   AS cusum_stat,
               CAST(pre AS DOUBLE) / CAST(i AS DOUBLE) AS mean_before,
               CAST(tot - pre AS DOUBLE) / CAST(n - i AS DOUBLE)
                   AS mean_after
        FROM best
        ORDER BY event_type
    """,
    doc="""CUSUM changepoint detection on the hourly event-rate series —
    the monitoring primitive that localizes WHEN a level shift happened
    (drift_category_chi2 says THAT the mix changed; this finds the
    hour the rate broke): per event type, the cumulative deviation
    from the series mean S_i = sum(x_1..x_i) - i*mean peaks at the
    most likely changepoint (Page's CUSUM / binary-segmentation first
    split).

    Determinism: the statistic is kept in INTEGER form |n*prefix -
    i*total| (multiplying S_i through by n avoids the rational mean) —
    argmax over exact BIGINTs with an hidx tie-break; the reported
    normalized statistic |S|/(n*tot) (= |prefix/tot - i/n|, in [0,1])
    and the before/after means are single IEEE divisions at the end.
    Missing hours count as ZERO via the complete spine (a rate drop to
    nothing IS a changepoint — resample_interpolate's spine trick).

    Scale: one hash aggregate at (type, hour) grain, windows
    partitioned by type over a calendar-bounded spine, a per-type
    MAX(struct) argmax aggregate (r13: was a row_number window).  Works unchanged on any keyed count series; at 100 TB the
    fact aggregate dominates.""",
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("ts_us") / _HOUR_US).cast("long").alias("hidx"),
    )
    hourly = ev.groupBy("event_type", "hidx").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    bounds = ev.agg(F.min("hidx").alias("mn"), F.max("hidx").alias("mx"))
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("hidx"),
        )
    )
    grid = spine.join(hourly, ["event_type", "hidx"], "left").select(
        "event_type", "hidx", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("hidx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = grid.select(
        "event_type",
        "hidx",
        F.sum("c").over(wrun).alias("pre"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("hidx"))
        .cast("bigint")
        .alias("i"),
        F.sum("c").over(wall).alias("tot"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
    )
    scored = cum.where(F.col("i") < F.col("n")).withColumn(
        "s_abs", F.abs(F.col("n") * F.col("pre") - F.col("i") * F.col("tot"))
    )
    # changepoint argmax by (s_abs desc, hidx asc) as
    # MAX(struct(s_abs, -hidx, <payload>)): hidx is unique per group so
    # the payload fields never tiebreak; the agg rides the event_type
    # partitioning the cum windows established — no Sort, no new
    # exchange (r13; results row-identical, interleaved 0.72s -> 0.62s).
    best = (
        scored.groupBy("event_type")
        .agg(
            F.max(
                F.struct(
                    F.col("s_abs"),
                    (-F.col("hidx")).alias("nh"),
                    F.col("pre"),
                    F.col("i"),
                    F.col("tot"),
                    F.col("n"),
                )
            ).alias("b")
        )
        .select(
            "event_type",
            (-F.col("b.nh")).alias("hidx"),
            F.col("b.s_abs").alias("s_abs"),
            F.col("b.pre").alias("pre"),
            F.col("b.i").alias("i"),
            F.col("b.tot").alias("tot"),
            F.col("b.n").alias("n"),
        )
    )
    return best.select(
        "event_type",
        F.timestamp_micros(F.col("hidx") * _HOUR_US)
        .cast("timestamp_ntz")
        .alias("changepoint_hour"),
        (
            F.col("s_abs").cast("double")
            / (F.col("n").cast("double") * F.col("tot").cast("double"))
        ).alias("cusum_stat"),
        (F.col("pre").cast("double") / F.col("i").cast("double")).alias(
            "mean_before"
        ),
        (
            (F.col("tot") - F.col("pre")).cast("double")
            / (F.col("n") - F.col("i")).cast("double")
        ).alias("mean_after"),
    ).orderBy("event_type")


# --- Holt linear-trend smoothing / forecast ----------------------------

_HOLT_A = 0.5   # level smoothing
_HOLT_B = 0.3   # trend smoothing
_HOLT_H = 24    # forecast horizon, hours


@register(
    "events_forecast_holt",
    oracle=f"""
        WITH ev AS (
            SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hidx
            FROM events
        ),
        hourly AS (
            SELECT event_type, hidx, CAST(COUNT(*) AS BIGINT) AS c
            FROM ev GROUP BY event_type, hidx
        ),
        bounds AS (SELECT MIN(hidx) AS mn, MAX(hidx) AS mx FROM ev),
        spine AS (
            SELECT t.event_type, u.g AS hidx
            FROM (SELECT DISTINCT event_type FROM ev) t
            CROSS JOIN bounds
            CROSS JOIN unnest(generate_series(bounds.mn, bounds.mx)) AS u(g)
        ),
        grid AS (
            SELECT s.event_type, s.hidx,
                   CAST(COALESCE(h.c, 0) AS DOUBLE) AS x
            FROM spine s LEFT JOIN hourly h
              ON s.event_type = h.event_type AND s.hidx = h.hidx
        ),
        series AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_hours,
                   list([x, 0.0, 0.0] ORDER BY hidx) AS triples
            FROM grid GROUP BY event_type
        ),
        folded AS (
            SELECT event_type, n_hours,
                   list_reduce(triples, (acc, e) ->
                       [{_HOLT_A} * e[1] + {1 - _HOLT_A} * (acc[1] + acc[2]),
                        {_HOLT_B} * (({_HOLT_A} * e[1]
                            + {1 - _HOLT_A} * (acc[1] + acc[2])) - acc[1])
                            + {1 - _HOLT_B} * acc[2],
                        acc[3] + (e[1] - (acc[1] + acc[2]))
                               * (e[1] - (acc[1] + acc[2]))]
                   ) AS st
            FROM series
        )
        SELECT event_type, n_hours,
               st[1] AS level, st[2] AS trend,
               st[1] + {float(_HOLT_H)} * st[2] AS forecast_{_HOLT_H}h,
               CASE WHEN n_hours > 1
                    THEN sqrt(st[3] / CAST(n_hours - 1 AS DOUBLE))
                    ELSE NULL END AS rmse_1step
        FROM folded
        ORDER BY event_type
    """,
    doc=f"""Holt linear-trend exponential smoothing over the hourly
    event-rate series — the capacity-planning forecast a pipeline team
    keeps per topic/partition: level and trend state (alpha={_HOLT_A},
    beta={_HOLT_B}), a {_HOLT_H}-hour-ahead projection level +
    {_HOLT_H}*trend, and the in-sample one-step RMSE as the model's
    own error bar.  Initial state (l, b) = (x_0, 0); missing hours
    count as zero rate via the complete spine.

    Determinism: the recurrence is inherently sequential, so it runs
    as a SEQUENTIAL FOLD over the hour-ordered series (the
    orders_survival_km convention): Spark's F.aggregate and DuckDB's
    list_reduce evaluate the identical IEEE expression chain over a
    [level, trend, sse] accumulator in the identical order —
    bit-identical state, no exp/log.

    Scale: one hash aggregate at (type, hour) grain; the fold is
    per-type over a CALENDAR-BOUNDED array (hours, not events) inside
    one row — the same bounded-collect discipline as the session and
    survival operators.  10^5 series x 10^4 points is a wide but flat
    map stage; the recurrence never shuffles.""",
)
def events_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("ts_us") / _HOUR_US).cast("long").alias("hidx"),
    )
    hourly = ev.groupBy("event_type", "hidx").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    bounds = ev.agg(F.min("hidx").alias("mn"), F.max("hidx").alias("mx"))
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("hidx"),
        )
    )
    grid = spine.join(hourly, ["event_type", "hidx"], "left").select(
        "event_type",
        "hidx",
        F.coalesce(F.col("c"), F.lit(0)).cast("double").alias("x"),
    )
    series = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("hidx", "x"))),
            lambda s: s.getField("x"),
        ).alias("xs"),
    )

    a, b1 = _HOLT_A, 1 - _HOLT_A
    g, g1 = _HOLT_B, 1 - _HOLT_B

    def merge(acc, x):
        l0 = F.element_at(acc, 1)
        b0 = F.element_at(acc, 2)
        sse = F.element_at(acc, 3)
        lp = F.lit(a) * x + F.lit(b1) * (l0 + b0)
        bp = F.lit(g) * (lp - l0) + F.lit(g1) * b0
        ssep = sse + (x - (l0 + b0)) * (x - (l0 + b0))
        return F.array(lp, bp, ssep)

    st = F.aggregate(
        F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        F.array(
            F.try_element_at("xs", F.lit(1)), F.lit(0.0), F.lit(0.0)
        ),
        merge,
    )
    folded = series.select("event_type", "n_hours", st.alias("st"))
    return folded.select(
        "event_type",
        "n_hours",
        F.element_at("st", 1).alias("level"),
        F.element_at("st", 2).alias("trend"),
        (
            F.element_at("st", 1) + F.lit(float(_HOLT_H)) * F.element_at("st", 2)
        ).alias(f"forecast_{_HOLT_H}h"),
        F.when(
            F.col("n_hours") > 1,
            F.sqrt(
                F.element_at("st", 3) / (F.col("n_hours") - 1).cast("double")
            ),
        ).alias("rmse_1step"),
    ).orderBy("event_type")


@register(
    "scd_temporal_join",
    oracle="""
        WITH src AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
                   value
            FROM events
        ),
        states AS (
            SELECT user_id, event_type, ts_us,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                   ) AS prev_type
            FROM src WHERE event_type <> 'purchase'
        ),
        changes AS (
            SELECT user_id, event_type, ts_us FROM states
            WHERE prev_type IS NULL OR prev_type <> event_type
        ),
        dim AS (
            SELECT user_id, event_type AS state,
                   ts_us AS valid_from,
                   lead(ts_us) OVER (
                       PARTITION BY user_id ORDER BY ts_us
                   ) AS valid_to
            FROM changes
        ),
        facts AS (
            SELECT user_id, ts_us, value FROM src
            WHERE event_type = 'purchase'
        )
        SELECT COALESCE(d.state, '(none)') AS state_at_purchase,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users,
               CAST(SUM(CAST(ROUND(f.value * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_value
        FROM facts f
        LEFT JOIN dim d
          ON f.user_id = d.user_id
         AND d.valid_from <= f.ts_us
         AND (d.valid_to IS NULL OR f.ts_us < d.valid_to)
        GROUP BY COALESCE(d.state, '(none)')
        ORDER BY state_at_purchase
    """,
    doc="""Point-in-time (SCD2 temporal) join — the read-side dual of
    scd2_history and THE query warehouses run against versioned
    dimensions: each purchase fact joins the dimension VERSION that
    was valid at the fact's timestamp ([valid_from, valid_to)
    containment on the user key), answering "what state was the user
    in when they bought" — here the state is the user's latest
    non-purchase activity run, so the result is purchase attribution
    by preceding behavior; purchases before any state version land in
    '(none)'.

    Plan: the dimension build is one user-partitioned window pass
    (the scd2_history plan); the temporal join is an EQUI join on
    user_id with the interval predicate as a residual filter — per-key
    version chains are short, so the matched-rows blowup is bounded
    by versions-per-user, never a range-join explosion.  Value sums
    are exact scaled BIGINTs.

    Scale: both sides shuffle once on user_id; at 100 TB you bucket
    the dimension by key (join_bucketed_colocated) and the fact scan
    dominates.  A Delta/Iceberg time-travel read replaces the window
    build; the join shape is identical.""",
)
def scd_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us", "event_id", "value"
    )
    w_seq = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    states = (
        e.where(F.col("event_type") != "purchase")
        .select(
            "user_id",
            "event_type",
            "ts_us",
            F.lag("event_type").over(w_seq).alias("prev_type"),
        )
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w_iv = Window.partitionBy("user_id").orderBy("ts_us")
    dim = states.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        F.col("ts_us").alias("valid_from"),
        F.lead("ts_us").over(w_iv).alias("valid_to"),
    )
    facts = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "value"
    )
    j = facts.join(
        dim,
        (facts.user_id == dim.d_user)
        & (dim.valid_from <= facts.ts_us)
        & (dim.valid_to.isNull() | (facts.ts_us < dim.valid_to)),
        "left",
    )
    return (
        j.groupBy(F.coalesce(F.col("state"), F.lit("(none)")).alias("state_at_purchase"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / F.lit(100.0)
            ).alias("sum_value"),
        )
        .orderBy("state_at_purchase")
    )


# --- autocorrelation profile (correlogram) -----------------------------


@register(
    "ts_acf",
    oracle=f"""
        WITH ev AS (
            SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hidx
            FROM events
        ),
        hourly AS (
            SELECT event_type, hidx, CAST(COUNT(*) AS BIGINT) AS c
            FROM ev GROUP BY event_type, hidx
        ),
        bounds AS (SELECT MIN(hidx) AS mn, MAX(hidx) AS mx FROM ev),
        spine AS (
            SELECT t.event_type, u.g AS hidx
            FROM (SELECT DISTINCT event_type FROM ev) t
            CROSS JOIN bounds
            CROSS JOIN unnest(generate_series(bounds.mn, bounds.mx)) AS u(g)
        ),
        grid AS (
            SELECT s.event_type, s.hidx, COALESCE(h.c, 0) AS c
            FROM spine s LEFT JOIN hourly h
              ON s.event_type = h.event_type AND s.hidx = h.hidx
        ),
        lags AS (SELECT u.k FROM unnest(generate_series(1, 24)) AS u(k)),
        pairs AS (
            SELECT a.event_type, l.k,
                   a.c AS x, b.c AS y
            FROM grid a
            CROSS JOIN lags l
            JOIN grid b
              ON b.event_type = a.event_type AND b.hidx = a.hidx + l.k
        ),
        s AS (
            SELECT event_type, k,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy
            FROM pairs GROUP BY event_type, k
        )
        SELECT event_type, k AS lag_hours, n_pairs,
               CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                          * CAST(n_pairs * syy - sy * sy AS DOUBLE)) AS acf,
               (CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                          * CAST(n_pairs * syy - sy * sy AS DOUBLE)))
               * (CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                          * CAST(n_pairs * syy - sy * sy AS DOUBLE)))
               * CAST(n_pairs AS DOUBLE) > 4.0 AS significant
        FROM s
        ORDER BY event_type, lag_hours
    """,
    doc="""Autocorrelation profile (correlogram) of the hourly event-rate
    series, lags 1..24h per event type — the diagnostic that reveals
    periodicity (daily cycles spike at lag 24), burstiness, and how
    much history a forecaster needs (events_forecast_holt consumes
    exactly this series; events_seasonality_profile shows the shape,
    this quantifies the memory).  r_k is the sample Pearson correlation
    over the aligned pairs (x_t, x_t+k) on the COMPLETE spine (missing
    hours count as zero — silence is signal in a rate series), with the
    white-noise significance band |r|*sqrt(n) > 2 as an exact verdict.

    Cross-engine exactness: all five sufficient statistics are BIGINT
    sums of integer counts; r is formed from exact integers with one
    sqrt (IEEE-correctly-rounded) and one division.  int64 frontier:
    n*sxx needs ~sqrt(9e18/hours) events/hour — ~1e6/hr over a decade;
    beyond that pre-aggregate to coarser buckets or shard the spine.

    Scale: state is (types x hours) + (types x 24) — calendar-bounded.
    The lag join fans the bounded grid x24, never the fact table; the
    fact aggregate dominates at 100 TB.""",
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("ts_us") / _HOUR_US).cast("long").alias("hidx"),
    )
    hourly = ev.groupBy("event_type", "hidx").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    bounds = ev.agg(F.min("hidx").alias("mn"), F.max("hidx").alias("mx"))
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("hidx"),
        )
    )
    grid = spine.join(hourly, ["event_type", "hidx"], "left").select(
        "event_type", "hidx", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    lags = spark.range(1, 25).select(F.col("id").alias("k"))
    a = grid.alias("a").crossJoin(F.broadcast(lags))
    b = grid.select(
        F.col("event_type").alias("b_type"),
        F.col("hidx").alias("b_hidx"),
        F.col("c").alias("y"),
    )
    pairs = a.join(
        b,
        (F.col("b_type") == F.col("a.event_type"))
        & (F.col("b_hidx") == F.col("a.hidx") + F.col("k")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        "k",
        F.col("a.c").alias("x"),
        "y",
    )
    s = pairs.groupBy("event_type", "k").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    acf = (
        (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        / F.sqrt(
            (
                F.col("n_pairs") * F.col("sxx")
                - F.col("sx") * F.col("sx")
            ).cast("double")
            * (
                F.col("n_pairs") * F.col("syy")
                - F.col("sy") * F.col("sy")
            ).cast("double")
        )
    )
    return s.select(
        "event_type",
        F.col("k").alias("lag_hours"),
        "n_pairs",
        acf.alias("acf"),
        (acf * acf * F.col("n_pairs").cast("double") > F.lit(4.0)).alias(
            "significant"
        ),
    ).orderBy("event_type", "lag_hours")


# --- Classical seasonal decomposition -----------------------------------


@register(
    "ts_decompose_classical",
    oracle=f"""
        WITH hourly AS (
            SELECT epoch_us(ts) // {_US_PER_HOUR} AS hr,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1
        ),
        spine AS (
            SELECT g.hr
            FROM (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM hourly) b,
                 unnest(generate_series(b.lo, b.hi)) AS g(hr)
        ),
        dense AS (
            SELECT s.hr, COALESCE(h.cents, 0) AS y
            FROM spine s LEFT JOIN hourly h ON h.hr = s.hr
        ),
        ma AS (
            SELECT hr, y,
                   SUM(y) OVER wa + SUM(y) OVER wb AS tnum,
                   COUNT(*) OVER wa + COUNT(*) OVER wb AS tcnt
            FROM dense
            WINDOW wa AS (ORDER BY hr
                          ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING),
                   wb AS (ORDER BY hr
                          ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
        ),
        det AS (
            SELECT hr, hr % 24 AS hod, y,
                   CASE WHEN tcnt = 48 THEN 48 * y - tnum END AS dnum
            FROM ma
        ),
        seas AS (
            SELECT hod, CAST(SUM(dnum) AS BIGINT) AS snum,
                   CAST(COUNT(dnum) AS BIGINT) AS scnt
            FROM det GROUP BY 1
        )
        SELECT d.hr, d.hod, d.y AS value_cents,
               d.dnum IS NOT NULL AS trend_defined,
               CAST(48 * d.y - d.dnum AS DOUBLE) / 48.0 AS trend_cents,
               CAST(s.snum AS DOUBLE) / CAST(48 * s.scnt AS DOUBLE)
                   AS seasonal_cents,
               CAST(d.dnum AS DOUBLE) / 48.0
                   - CAST(s.snum AS DOUBLE) / CAST(48 * s.scnt AS DOUBLE)
                   AS remainder_cents
        FROM det d JOIN seas s ON s.hod = d.hod
        ORDER BY d.hr
    """,
    doc="""Classical additive seasonal decomposition of the hourly
    revenue series (the moving-average method STL refines): trend =
    centered 2x24 moving average (the textbook even-period form — mean
    of the two off-center 24-term means), seasonal = hour-of-day mean
    of the detrended series, remainder = what's left.  One row per
    hour on the dense spine: observed cents, trend/seasonal/remainder
    components, and a trend_defined flag for the 12-hour edges where
    the centered window is incomplete.  Downstream: seasonality-aware
    anomaly flags read `remainder`, capacity planning reads `trend`,
    and events_seasonality_profile's raw profile becomes a calibrated
    seasonal index.

    Determinism: the series is exact integer cents on the epoch-hour
    grid; the trend is carried as the exact integer numerator
    48y - sum48 (never a float mean), the seasonal mean is one
    division of BIGINT sums, and the remainder subtracts two such
    single-division doubles with the identical expression tree in both
    engines — IEEE ops on identical inputs, no order-dependent float
    accumulation anywhere.

    Scale: the only O(|rows|) stage is the map-side-combining hourly
    aggregate; everything after runs on the bounded hour spine
    (10 years ~ 87k rows), so the spine windows are declared
    single-partition via bounded_window_key per the plan-audit
    convention.  The hod-mean join broadcasts a 24-row dim.""",
)
def ts_decompose_classical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.catalog import managed_persist

    e = table(spark, sf_dir, "events")
    # hourly feeds the bounds aggregate AND the spine join; the cut
    # keeps the O(|rows|) events scan single (the spine stages after
    # it are bounded metadata).
    hourly = managed_persist(
        f"ts_decompose_classical:hourly:{sf_dir}",
        e.groupBy(
            (F.col("ts_us") / _US_PER_HOUR).cast("bigint").alias("hr")
        ).agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("bigint")
            .alias("cents")
        ),
    )
    bounds = hourly.agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("hr")
    )
    dense = spine.join(hourly, "hr", "left").select(
        "hr", F.coalesce("cents", F.lit(0).cast("bigint")).alias("y")
    )
    wa = (
        Window.partitionBy(bounded_window_key("hr"))
        .orderBy("hr")
        .rowsBetween(-12, 11)
    )
    wb = (
        Window.partitionBy(bounded_window_key("hr"))
        .orderBy("hr")
        .rowsBetween(-11, 12)
    )
    ma = dense.select(
        "hr",
        "y",
        (F.sum("y").over(wa) + F.sum("y").over(wb)).alias("tnum"),
        (F.count("*").over(wa) + F.count("*").over(wb)).alias("tcnt"),
    )
    # det feeds the hod-mean aggregate AND the final join.
    det = managed_persist(
        f"ts_decompose_classical:det:{sf_dir}",
        ma.select(
            "hr",
            (F.col("hr") % 24).alias("hod"),
            "y",
            F.when(
                F.col("tcnt") == 48, 48 * F.col("y") - F.col("tnum")
            ).alias("dnum"),
        ),
    )
    seas = det.groupBy("hod").agg(
        F.sum("dnum").cast("bigint").alias("snum"),
        F.count("dnum").cast("bigint").alias("scnt"),
    )
    seasonal = F.col("snum").cast("double") / (48 * F.col("scnt")).cast(
        "double"
    )
    return (
        det.join(F.broadcast(seas), "hod")
        .select(
            "hr",
            "hod",
            F.col("y").alias("value_cents"),
            F.col("dnum").isNotNull().alias("trend_defined"),
            ((48 * F.col("y") - F.col("dnum")).cast("double") / 48.0).alias(
                "trend_cents"
            ),
            seasonal.alias("seasonal_cents"),
            (F.col("dnum").cast("double") / 48.0 - seasonal).alias(
                "remainder_cents"
            ),
        )
        .orderBy("hr")
    )


# --- Forecast backtest (MASE) --------------------------------------------

_MASE_HORIZON = 7  # holdout: the last week of the span


@register(
    "forecast_backtest_mase",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, epoch_us(ts) // {_US_PER_DAY} AS day_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        span AS (SELECT MIN(day_id) AS lo, MAX(day_id) AS hi FROM daily),
        types AS (SELECT DISTINCT event_type FROM daily),
        spine AS (
            SELECT t.event_type, g.day_id
            FROM types t, span s,
                 unnest(generate_series(s.lo, s.hi)) AS g(day_id)
        ),
        dense AS (
            SELECT s.event_type, s.day_id, COALESCE(d.cents, 0) AS y,
                   (SELECT hi FROM span) AS hi
            FROM spine s LEFT JOIN daily d
              ON d.event_type = s.event_type AND d.day_id = s.day_id
        ),
        lagged AS (
            SELECT event_type, day_id, y,
                   LAG(y, 1) OVER w AS y1,
                   LAG(y, {_MASE_HORIZON}) OVER w AS y7,
                   day_id > hi - {_MASE_HORIZON} AS is_test
            FROM dense
            WINDOW w AS (PARTITION BY event_type ORDER BY day_id)
        ),
        agg AS (
            SELECT event_type,
                   CAST(COUNT(CASE WHEN NOT is_test AND y1 IS NOT NULL
                                   THEN 1 END) AS BIGINT) AS n_train,
                   CAST(COUNT(CASE WHEN is_test AND y7 IS NOT NULL
                                   THEN 1 END) AS BIGINT) AS n_test,
                   CAST(SUM(CASE WHEN is_test AND y7 IS NOT NULL
                                 THEN ABS(y - y7) END) AS BIGINT)
                       AS test_abs_err,
                   CAST(SUM(CASE WHEN NOT is_test AND y1 IS NOT NULL
                                 THEN ABS(y - y1) END) AS BIGINT)
                       AS train_naive_abs_err
            FROM lagged GROUP BY 1
        )
        SELECT event_type, n_train, n_test, test_abs_err,
               train_naive_abs_err,
               CAST(test_abs_err * n_train AS DOUBLE)
                   / CAST(NULLIF(train_naive_abs_err * n_test, 0)
                          AS DOUBLE) AS mase,
               test_abs_err * n_train < train_naive_abs_err * n_test
                   AS beats_naive
        FROM agg ORDER BY event_type
    """,
    doc=f"""Forecast backtest with MASE (Hyndman & Koehler's mean
    absolute scaled error — THE scale-free forecast-accuracy metric):
    hold out the final {_MASE_HORIZON} days of each event type's daily
    revenue series, forecast them seasonal-naively (same weekday one
    season back), and scale the holdout MAE by the TRAINING-period
    one-step-naive MAE.  MASE < 1 means the seasonal forecaster beats
    the naive random walk and earns its complexity; > 1 means
    seasonality is noise for that series (both verdicts occur on the
    fixture).  This is the acceptance gate that decides whether
    events_forecast_holt's seasonal machinery should ship per series.

    Determinism: the series is exact integer cents on the dense
    epoch-day grid, absolute errors and their sums stay BIGINT, the
    mase double is ONE division of two exact integer cross-products,
    and the beats_naive verdict never touches a float.

    Scale: one map-side-combining daily aggregate is the only
    O(|rows|) stage; the dense spine is |types| x |days| (bounded
    metadata), lags partition by event_type, and the final table is
    O(|types|).  NULLIF guards the constant-series edge (zero train
    error -> NULL mase, both engines).""",
)
def forecast_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.catalog import managed_persist

    e = table(spark, sf_dir, "events")
    # daily feeds span, types, and the spine join — cut once.
    daily = managed_persist(
        f"forecast_backtest_mase:daily:{sf_dir}",
        e.groupBy(
            "event_type",
            (F.col("ts_us") / _US_PER_DAY).cast("bigint").alias("day_id"),
        ).agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("bigint")
            .alias("cents")
        ),
    )
    span = daily.agg(F.min("day_id").alias("lo"), F.max("day_id").alias("hi"))
    types = daily.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.explode(F.sequence("lo", "hi")).alias("day_id"),
        "hi",
    )
    dense = spine.join(daily, ["event_type", "day_id"], "left").select(
        "event_type",
        "day_id",
        F.coalesce("cents", F.lit(0).cast("bigint")).alias("y"),
        "hi",
    )
    w = Window.partitionBy("event_type").orderBy("day_id")
    lagged = dense.select(
        "event_type",
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", _MASE_HORIZON).over(w).alias("y7"),
        (F.col("day_id") > F.col("hi") - _MASE_HORIZON).alias("is_test"),
    )
    train = (~F.col("is_test")) & F.col("y1").isNotNull()
    test = F.col("is_test") & F.col("y7").isNotNull()
    agg = lagged.groupBy("event_type").agg(
        F.count(F.when(train, 1)).cast("bigint").alias("n_train"),
        F.count(F.when(test, 1)).cast("bigint").alias("n_test"),
        F.sum(F.when(test, F.abs(F.col("y") - F.col("y7"))))
        .cast("bigint")
        .alias("test_abs_err"),
        F.sum(F.when(train, F.abs(F.col("y") - F.col("y1"))))
        .cast("bigint")
        .alias("train_naive_abs_err"),
    )
    return agg.select(
        "event_type",
        "n_train",
        "n_test",
        "test_abs_err",
        "train_naive_abs_err",
        (
            (F.col("test_abs_err") * F.col("n_train")).cast("double")
            / F.nullif(
                F.col("train_naive_abs_err") * F.col("n_test"), F.lit(0)
            ).cast("double")
        ).alias("mase"),
        (
            F.col("test_abs_err") * F.col("n_train")
            < F.col("train_naive_abs_err") * F.col("n_test")
        ).alias("beats_naive"),
    ).orderBy("event_type")


# --- Seasonality-aware anomaly flags --------------------------------------

_TSANOM_K = "3.5"  # MAD multiplier (literal text, identical both engines)


@register(
    "ts_anomaly_seasonal",
    # {decomp} is late-bound below to ts_decompose_classical's full
    # registered oracle, so the anomaly gate re-runs the exact
    # decomposition it consumes — compose-the-oracles lockstep.
    oracle="""
        WITH decomp AS ({decomp}),
        defined AS (
            SELECT hr, hod, value_cents, remainder_cents,
                   CAST(row_number() OVER (ORDER BY remainder_cents)
                        AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM decomp WHERE trend_defined
        ),
        med AS (
            SELECT MAX(CASE WHEN rn = (n + 1) // 2
                            THEN remainder_cents END) AS med
            FROM defined
        ),
        dev AS (
            SELECT d.hr, d.hod, d.value_cents, d.remainder_cents, m.med,
                   ABS(d.remainder_cents - m.med) AS adev,
                   CAST(row_number() OVER (
                       ORDER BY ABS(d.remainder_cents - m.med))
                        AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM defined d, med m
        ),
        mad AS (
            SELECT MAX(CASE WHEN rn = (n + 1) // 2 THEN adev END) AS mad
            FROM dev
        )
        SELECT d.hr, d.hod, d.value_cents, d.remainder_cents,
               d.med AS med_remainder, m.mad AS mad_remainder,
               d.adev AS abs_deviation
        FROM dev d, mad m
        WHERE d.adev > __K__ * m.mad
        ORDER BY d.hr
    """,
    doc="""Seasonality-aware anomaly detection — the consumer
    ts_decompose_classical's doc promises: an hour is anomalous when
    its decomposition REMAINDER deviates from the remainder median by
    more than __K__x the median absolute deviation (the robust
    modified-z-score rule; a plain z-score on the raw series would
    fire on every daily peak, which is exactly what subtracting trend
    + seasonal prevents).  Emits the anomalous hours with the
    remainder, the robust center/scale used, and the deviation — the
    alert feed a monitoring sink consumes.

    Determinism: median and MAD are type-1 (lower) quantiles by RANK
    SELECTION on the bounded spine (the quantiles_exact convention —
    no interpolation arithmetic, so no engine-specific float
    averaging); the only float ops are one subtraction, one ABS, and
    the literal-__K__ multiply, identical expression trees both sides.
    The oracle nests the decomposition's own registered oracle, so
    audit and source cannot drift.

    Scale: everything below the decomposition's hourly aggregate runs
    on the bounded hour spine; the two rank windows are declared
    bounded via bounded_window_key.  The managed-persist keys are
    shared with ts_decompose_classical, so running both ops builds the
    decomposition once.""".replace("__K__", _TSANOM_K),
)
def ts_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.registry import REGISTRY

    decomp = REGISTRY["ts_decompose_classical"].fn(spark, sf_dir)
    defined = decomp.where("trend_defined").select(
        "hr", "hod", "value_cents", "remainder_cents"
    )
    wr = Window.partitionBy(bounded_window_key("hr")).orderBy(
        "remainder_cents"
    )
    wn = Window.partitionBy(bounded_window_key("hr"))
    ranked = defined.select(
        "hr",
        "hod",
        "value_cents",
        "remainder_cents",
        F.row_number().over(wr).cast("bigint").alias("rn"),
        F.count("*").over(wn).cast("bigint").alias("n"),
    )
    med = ranked.agg(
        F.max(
            F.when(
                F.col("rn") == F.expr("(n + 1) DIV 2"),
                F.col("remainder_cents"),
            )
        ).alias("med")
    )
    dev0 = ranked.select("hr", "hod", "value_cents", "remainder_cents").crossJoin(
        F.broadcast(med)
    )
    adev = F.abs(F.col("remainder_cents") - F.col("med"))
    wd = Window.partitionBy(bounded_window_key("hr")).orderBy(adev)
    dev = dev0.select(
        "hr",
        "hod",
        "value_cents",
        "remainder_cents",
        "med",
        adev.alias("adev"),
        F.row_number().over(wd).cast("bigint").alias("rn"),
        F.count("*").over(wn).cast("bigint").alias("n"),
    )
    mad = dev.agg(
        F.max(
            F.when(
                F.col("rn") == F.expr("(n + 1) DIV 2"),
                F.col("adev"),
            )
        ).alias("mad")
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .where(F.col("adev") > F.expr(_TSANOM_K) * F.col("mad"))
        .select(
            "hr",
            "hod",
            "value_cents",
            "remainder_cents",
            F.col("med").alias("med_remainder"),
            F.col("mad").alias("mad_remainder"),
            F.col("adev").alias("abs_deviation"),
        )
        .orderBy("hr")
    )


import dataclasses as _dc  # noqa: E402

from kafka_hadoop_loader_spark.registry import REGISTRY as _TSREG  # noqa: E402

_TSREG["ts_anomaly_seasonal"] = _dc.replace(
    _TSREG["ts_anomaly_seasonal"],
    oracle=_TSREG["ts_anomaly_seasonal"]
    .oracle.replace("__K__", _TSANOM_K)
    .format(decomp=_TSREG["ts_decompose_classical"].oracle),
)


# --- Theil-Sen robust trend ------------------------------------------------


@register(
    "stats_theil_sen",
    oracle="""
        WITH daily AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type,
                   CAST(b.cents - a.cents AS DOUBLE)
                       / CAST(b.day_id - a.day_id AS DOUBLE) AS slope
            FROM daily a JOIN daily b
              ON b.event_type = a.event_type AND a.day_id < b.day_id
        ),
        ranked AS (
            SELECT event_type, slope,
                   CAST(row_number() OVER (PARTITION BY event_type
                                           ORDER BY slope) AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n_pairs
            FROM pairs
        ),
        med AS (
            SELECT event_type, MAX(n_pairs) AS n_pairs,
                   MAX(CASE WHEN rn = (n_pairs + 1) // 2 THEN slope END)
                       AS slope
            FROM ranked GROUP BY 1
        ),
        nd AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
            FROM daily GROUP BY 1
        )
        SELECT m.event_type, n.n_days, m.n_pairs,
               m.slope AS slope_cents_per_day, m.slope > 0 AS rising
        FROM med m JOIN nd n ON n.event_type = m.event_type
        ORDER BY m.event_type
    """,
    doc="""Theil-Sen robust trend estimator per event type: the median
    of all pairwise slopes of the daily revenue series — the
    breakdown-point-0.29 answer to "is this series trending?" that a
    single outlier day cannot flip, where the OLS slope
    (regr_by_group) can be dragged arbitrarily.  Emits slope, pair
    count, and the rising verdict per series.

    Determinism: each slope is ONE division of two exact integer
    differences (cents, epoch-days); the median is the type-1 rank
    selection of quantiles_exact's convention — no float averaging or
    accumulation anywhere.

    Scale: the all-pairs join is per-series over the BOUNDED daily
    grid — n days yields n(n-1)/2 pair rows per series (10 years =
    ~6.7M pairs, one task's work), generated by an equi-join on the
    series key, never a corpus cross join; the O(|rows|) stage is the
    shared daily aggregate (managed-persist key shared with
    forecast_backtest_mase).  For minute-grain series at extreme
    spans, subsample pair offsets — the estimator degrades gracefully
    and the plan shape holds.""",
)
def stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.catalog import managed_persist

    e = table(spark, sf_dir, "events")
    daily = managed_persist(
        f"forecast_backtest_mase:daily:{sf_dir}",
        e.groupBy(
            "event_type",
            (F.col("ts_us") / _US_PER_DAY).cast("bigint").alias("day_id"),
        ).agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("bigint")
            .alias("cents")
        ),
    )
    a = daily.select(
        "event_type",
        F.col("day_id").alias("da"),
        F.col("cents").alias("ca"),
    )
    b = daily.select(
        "event_type",
        F.col("day_id").alias("db"),
        F.col("cents").alias("cb"),
    )
    pairs = (
        a.join(b, "event_type")
        .where(F.col("da") < F.col("db"))
        .select(
            "event_type",
            (
                (F.col("cb") - F.col("ca")).cast("double")
                / (F.col("db") - F.col("da")).cast("double")
            ).alias("slope"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("slope")
    wn = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wr).cast("bigint").alias("rn"),
        F.count("*").over(wn).cast("bigint").alias("n_pairs"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max("n_pairs").alias("n_pairs"),
        F.max(
            F.when(F.col("rn") == F.expr("(n_pairs + 1) DIV 2"), F.col("slope"))
        ).alias("slope"),
    )
    nd = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days")
    )
    return (
        med.join(nd, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            F.col("slope").alias("slope_cents_per_day"),
            (F.col("slope") > 0).alias("rising"),
        )
        .orderBy("event_type")
    )
