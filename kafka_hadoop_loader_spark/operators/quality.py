"""Data-quality operators: per-column table profiling and referential-
integrity (FK orphan) auditing.

The loader's landed tables need the same QA surface any warehouse
gives its raw zone: a one-pass column profile (null rates, distinct
counts, ranges, top values) feeding ingest monitoring, and FK-orphan
counts guarding the star schema's joinability (an orphan fact row
silently vanishes from every inner join — the worst kind of data
loss).  Output shapes are LONG-FORMAT (one row per column / per FK
edge) so the profile of a 500-column table is 500 rows, not a
500-column row.

Determinism: counts and ranges are exact; top values tie-break
lexicographically; null rates are divisions of exact integers.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.registry import register

_PROFILE_COLS = (
    ("o_orderstatus", "orders"),
    ("o_orderpriority", "orders"),
    ("l_returnflag", "lineitem"),
    ("l_linestatus", "lineitem"),
    ("event_type", "events"),
    ("lang", "documents"),
    ("source", "documents"),
)


def _profile_one_sql(col: str, tab: str) -> str:
    return f"""
        SELECT '{tab}' AS table_name, '{col}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
               CAST(COUNT({col}) - COUNT(*) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 1.0
                   AS fill_rate,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
               CAST(MIN({col}) AS VARCHAR) AS min_value,
               CAST(MAX({col}) AS VARCHAR) AS max_value,
               (SELECT x FROM (
                   SELECT {col} AS x, COUNT(*) AS c FROM {tab}
                   WHERE {col} IS NOT NULL
                   GROUP BY {col} ORDER BY c DESC, x LIMIT 1
               )) AS top_value
        FROM {tab}
    """


@register(
    "table_profile",
    oracle=" UNION ALL ".join(
        _profile_one_sql(c, t) for c, t in _PROFILE_COLS
    )
    + " ORDER BY table_name, column_name",
    doc="""One-pass column profiler over the categorical columns of the
    landed tables: row/null counts, fill rate, exact distinct count,
    min/max, and the modal value (lexicographic tie-break) — the
    ingest-monitoring profile a warehouse computes on every load.

    Long-format output: one row per profiled column, so wide tables
    profile to narrow results.  Each column's statistics are one hash
    aggregate + one ordered limit(1) for the mode — embarrassingly
    parallel across columns, and each aggregate is a single pass with
    map-side combine.  At 100 TB you profile per-partition and re-merge
    (all these statistics are algebraic except the mode, which merges
    approximately or via a second pass — kept exact here).""",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for col, tab in _PROFILE_COLS:
        t = table(spark, sf_dir, tab)
        stats = t.agg(
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count(col)).alias("n_null"),
            F.expr(
                f"CAST(COUNT({col}) - COUNT(*) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 1.0"
            ).alias("fill_rate"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_value"),
            F.max(col).cast("string").alias("max_value"),
        )
        mode = (
            t.where(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("x"))
            .agg(F.count("*").alias("c"))
            .orderBy(F.col("c").desc(), "x")
            .limit(1)
            .select(F.col("x").cast("string").alias("top_value"))
        )
        outs.append(
            stats.join(F.broadcast(mode)).select(
                F.lit(tab).alias("table_name"),
                F.lit(col).alias("column_name"),
                "n_rows",
                "n_null",
                "fill_rate",
                "n_distinct",
                "min_value",
                "max_value",
                "top_value",
            )
        )
    return reduce(DataFrame.unionAll, outs).orderBy("table_name", "column_name")


_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _fk_one_sql(ft: str, fk: str, pt: str, pk: str) -> str:
    return f"""
        SELECT '{ft}.{fk}' AS fk_column, '{pt}.{pk}' AS pk_column,
               CAST(COUNT(*) AS BIGINT) AS n_fact_rows,
               CAST(SUM(CASE WHEN p.{pk} IS NULL AND f.{fk} IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
               CAST(SUM(CASE WHEN f.{fk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_fk
        FROM {ft} f LEFT JOIN (SELECT DISTINCT {pk} FROM {pt}) p
          ON f.{fk} = p.{pk}
    """


@register(
    "fk_orphan_check",
    oracle=" UNION ALL ".join(_fk_one_sql(*e) for e in _FK_EDGES)
    + " ORDER BY fk_column",
    doc="""Referential-integrity audit over every FK edge of the star
    schema: per edge, the fact row count, orphan count (FK value with
    no matching PK — rows that silently vanish from inner joins), and
    NULL-FK count.  The canonical post-load gate before publishing a
    snapshot.

    Plan: each edge is a left join against the DISTINCT PK projection —
    the parent side reduces to its key column, and the join strategy is
    AQE's by the measured size of that projection (a parent table is
    SF-proportional, so a forced broadcast would cap the audit's scale);
    the orphan test is then a map-side null check, one join pass per
    edge over the fact's key column only (column pruning leaves a
    single-column scan).  All counts exact.""",
)
def fk_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for ft, fk, pt, pk in _FK_EDGES:
        f = table(spark, sf_dir, ft).select(fk)
        p = table(spark, sf_dir, pt).select(pk).distinct()
        joined = f.join(p, f[fk] == p[pk], "left")
        outs.append(
            joined.agg(
                F.count("*").alias("n_fact_rows"),
                F.sum(
                    F.when(p[pk].isNull() & f[fk].isNotNull(), 1).otherwise(0)
                ).alias("n_orphans"),
                F.sum(F.when(f[fk].isNull(), 1).otherwise(0)).alias("n_null_fk"),
            ).select(
                F.lit(f"{ft}.{fk}").alias("fk_column"),
                F.lit(f"{pt}.{pk}").alias("pk_column"),
                "n_fact_rows",
                "n_orphans",
                "n_null_fk",
            )
        )
    return reduce(DataFrame.unionAll, outs).orderBy("fk_column")


@register(
    "observe_metrics_audit",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_value,
               CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_props,
               CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
               CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
        FROM events
    """,
    doc="""Pipeline observability via df.observe(): row count, exact
    value sum, null audit, and time bounds are collected as named
    metrics ON the write pass itself — the load job and its
    data-quality audit share one scan, instead of the audit re-reading
    what was just written.  The observed frame is driven through a noop
    sink (the loader's write stands in); Observation.get returns the
    metrics exactly once.  This is Spark's AccumulatorV2-descendant
    metrics channel: per-task partials merge on the driver, cost ~zero.
    The returned 1-row frame is built from those metrics — the only
    operator where driver-side values are the PRODUCT, which is what
    observe() is for (the alternative, a second full aggregate query,
    is what it saves).  The oracle recomputes the same aggregates
    directly — proving the observed metrics equal the ground truth.""",
)
def observe_metrics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    e = table(spark, sf_dir, "events")
    obs = Observation()
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0
        ).alias("sum_value"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_props"),
        F.min("ts_us").alias("min_ts_us"),
        F.max("ts_us").alias("max_ts_us"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["sum_value"],
                m["n_null_props"],
                m["min_ts_us"],
                m["max_ts_us"],
            )
        ],
        "n_rows bigint, sum_value double, n_null_props bigint,"
        " min_ts_us bigint, max_ts_us bigint",
    )


@register(
    "schema_contract_check",
    oracle="""
        SELECT * FROM (
            SELECT 'event_id_not_null' AS rule,
                   CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violations,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM events
            UNION ALL
            SELECT 'event_id_unique',
                   (SELECT CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
                    FROM events),
                   CAST(COUNT(*) AS BIGINT)
            FROM events
            UNION ALL
            SELECT 'value_non_negative',
                   CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT)
            FROM events
            UNION ALL
            SELECT 'event_type_in_enum',
                   CAST(SUM(CASE WHEN event_type NOT IN
                                 ('click', 'view', 'purchase', 'signup',
                                  'logout')
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT)
            FROM events
            UNION ALL
            SELECT 'ts_in_valid_range',
                   CAST(SUM(CASE WHEN epoch_us(ts) < 1577836800000000
                                   OR epoch_us(ts) > 1893456000000000
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT)
            FROM events
            UNION ALL
            SELECT 'props_parseable_json',
                   CAST(SUM(CASE WHEN props IS NOT NULL
                                  AND json_valid(props) = false
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT)
            FROM events
        )
        ORDER BY rule
    """,
    doc="""Data-contract validation: the declared expectations of the
    events feed (not-null key, key uniqueness, value domain, enum
    membership, timestamp sanity window, JSON parseability) evaluated
    as per-rule violation counts — the Great-Expectations-style publish
    gate, as one query.  All rules except uniqueness are conditional
    sums fused into a single scan; uniqueness is the one aggregate that
    genuinely needs a distinct count.  A zero row per rule is the
    contract certificate the loader attaches to each load; non-zero
    rows carry exactly the triage number on-call needs.  Scale: one
    pass + one distinct-count — this is why contract checks run on
    every 100 TB load rather than being sampled.""",
)
def schema_contract_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    base = e.agg(
        one(F.col("event_id").isNull()).alias("v_null"),
        one(F.col("value") < 0).alias("v_neg"),
        one(
            ~F.col("event_type").isin("click", "view", "purchase", "signup", "logout")
        ).alias("v_enum"),
        one(
            (F.col("ts_us") < 1577836800000000)
            | (F.col("ts_us") > 1893456000000000)
        ).alias("v_ts"),
        one(
            F.col("props").isNotNull()
            & F.expr("try_parse_json(props) IS NULL")
        ).alias("v_json_raw"),
        (F.count("*") - F.countDistinct("event_id")).alias("v_dupe"),
        F.count("*").alias("n_rows"),
    )
    # try_parse_json (variant) is null exactly when the input is not
    # valid JSON of ANY kind — same predicate as the oracle's
    # json_valid(), including valid non-object JSON like '5' or '[1]'
    # (a from_json-with-struct-schema check would miscount those)
    rules = (
        ("event_id_not_null", "v_null"),
        ("event_id_unique", "v_dupe"),
        ("event_type_in_enum", "v_enum"),
        ("props_parseable_json", "v_json_raw"),
        ("ts_in_valid_range", "v_ts"),
        ("value_non_negative", "v_neg"),
    )
    stack_args = ", ".join(f"'{r}', {c}" for r, c in rules)
    return base.selectExpr(
        f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)", "n_rows"
    ).orderBy("rule")


@register(
    "props_key_profile",
    oracle="""
        WITH objs AS (
            SELECT props FROM events
            WHERE props IS NOT NULL AND json_valid(props)
              AND json_type(props) = 'OBJECT'
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_objects FROM objs),
        keys AS (
            SELECT unnest(json_keys(props)) AS key FROM objs
        )
        SELECT k.key,
               CAST(COUNT(*) AS BIGINT) AS n_present,
               CAST(COUNT(*) AS DOUBLE) / CAST(n.n_objects AS DOUBLE)
                   AS present_frac
        FROM keys k CROSS JOIN n
        GROUP BY k.key, n.n_objects
        ORDER BY k.key
    """,
    doc="""Semi-structured key profiling: which keys appear in the JSON
    `props` column and how often — the schema-discovery query run
    before declaring a from_json StructType over a feed (the loader's
    payloads are schemaless by design [pub: HadoopJobMapper.java];
    this is how the downstream consumer decides what schema to
    declare).  Non-objects and malformed JSON are excluded on both
    sides (json_object_keys returns NULL for them in Spark; json_type
    gates in DuckDB).

    Scale: explode keys → one hash aggregate; key cardinality is
    schema-sized (tiny), so the aggregate output is a broadcastable
    profile no matter how large the feed.""",
)
def props_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    objs = e.select(F.expr("json_object_keys(props)").alias("ks")).where(
        F.col("ks").isNotNull()
    )
    n = objs.agg(F.count("*").alias("n_objects"))
    keys = objs.select(F.explode("ks").alias("key"))
    return (
        keys.crossJoin(F.broadcast(n))
        .groupBy("key", "n_objects")
        .agg(F.count("*").alias("n_present"))
        .select(
            "key",
            "n_present",
            (F.col("n_present").cast("double") / F.col("n_objects").cast("double")).alias(
                "present_frac"
            ),
        )
        .orderBy("key")
    )


# --- Distribution drift ---------------------------------------------------
# Chi-square contribution of one category, shared expression: dnum =
# o*N_ref - n_ref*N_cur is an exact BIGINT (two 2-factor products:
# safe until per-half counts reach ~3e9, i.e. well past any single
# ingest batch this audit runs on), cast ONCE to double.  The
# denominator n_ref*N_cur*N_ref is a THREE-factor product that would
# overflow int64 once per-half counts reach ~2M, so it is computed in
# DOUBLE from the start (one cast per count, identical multiply order
# in both engines — the division result is then the same IEEE value).
# n_ref = 0 (a category born after the split) is an explicit
# CASE -> NULL, not an engine-specific inf.
_CHI2 = (
    "CASE WHEN n_ref = 0 THEN NULL ELSE "
    "(CAST(dnum AS DOUBLE) * CAST(dnum AS DOUBLE)) / "
    "(CAST(n_ref AS DOUBLE) * CAST(ncur_total AS DOUBLE)"
    " * CAST(nref_total AS DOUBLE)) "
    "END"
)


@register(
    "drift_category_chi2",
    oracle=f"""
        WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us FROM events),
        bounds AS (
            SELECT MIN(ts_us) + (MAX(ts_us) - MIN(ts_us)) // 2 AS mid
            FROM ev
        ),
        g AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN ts_us < mid THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ref,
                   CAST(SUM(CASE WHEN ts_us < mid THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_cur
            FROM ev CROSS JOIN bounds
            GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(SUM(n_ref) AS BIGINT) AS nref_total,
                   CAST(SUM(n_cur) AS BIGINT) AS ncur_total
            FROM g
        ),
        d AS (
            SELECT event_type, n_ref, n_cur, nref_total, ncur_total,
                   n_cur * nref_total - n_ref * ncur_total AS dnum
            FROM g CROSS JOIN tot
        )
        SELECT event_type, n_ref, n_cur,
               {_CHI2} AS chi2_contrib,
               abs(dnum) * 50 > ncur_total * nref_total AS share_drifted
        FROM d
        ORDER BY event_type
    """,
    doc="""Per-category distribution-drift audit between the two halves
    of the event stream (split at the observed mid-timestamp): each
    event type's chi-square contribution (observed current count vs
    expected-under-reference-share) plus an exact share-shift verdict
    (|current share - reference share| > 2%).  This is the monitoring
    query a training-data pipeline runs on every new ingest batch —
    category mix drift is the cheapest early warning that an upstream
    source changed.

    Cross-engine exactness: the verdict is pure cross-multiplied BIGINT
    (no division); the chi-square statistic is the shared _CHI2
    expression over two exact integers.  The time split rides in as a
    1-row broadcast (no build-time action).

    Scale: two map-side-combining aggregates (category grain, then the
    1-row total) and a broadcast back over the category table — O(rows)
    scan cost, O(|categories|) state.  PSI/KL variants swap the scoring
    expression; the plan is unchanged.""",
)
def drift_category_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("event_type", "ts_us")
    bounds = e.agg(
        (
            F.min("ts_us")
            + F.expr("(max(ts_us) - min(ts_us)) DIV 2")
        ).alias("mid")
    )
    g = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("ts_us") < F.col("mid"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_ref"),
            F.sum(F.when(F.col("ts_us") < F.col("mid"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_cur"),
        )
    )
    tot = g.agg(
        F.sum("n_ref").cast("bigint").alias("nref_total"),
        F.sum("n_cur").cast("bigint").alias("ncur_total"),
    )
    d = g.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_ref",
        "n_cur",
        "nref_total",
        "ncur_total",
        (
            F.col("n_cur") * F.col("nref_total")
            - F.col("n_ref") * F.col("ncur_total")
        ).alias("dnum"),
    )
    return d.select(
        "event_type",
        "n_ref",
        "n_cur",
        F.expr(_CHI2).alias("chi2_contrib"),
        (
            F.abs(F.col("dnum")) * 50 > F.col("ncur_total") * F.col("nref_total")
        ).alias("share_drifted"),
    ).orderBy("event_type")


# --- two-sample Kolmogorov-Smirnov drift test --------------------------


@register(
    "drift_numeric_ks",
    oracle="""
        WITH ev AS (
            SELECT event_type, epoch_us(ts) AS ts_us,
                   CAST(ROUND(value * 100) AS BIGINT) AS vq
            FROM events
        ),
        bounds AS (
            SELECT MIN(ts_us) + (MAX(ts_us) - MIN(ts_us)) // 2 AS mid
            FROM ev
        ),
        g AS (
            SELECT event_type, vq,
                   CAST(SUM(CASE WHEN ts_us < mid THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ref,
                   CAST(SUM(CASE WHEN ts_us < mid THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_cur
            FROM ev CROSS JOIN bounds
            GROUP BY event_type, vq
        ),
        tot AS (
            SELECT event_type,
                   CAST(SUM(n_ref) AS BIGINT) AS nref_total,
                   CAST(SUM(n_cur) AS BIGINT) AS ncur_total
            FROM g GROUP BY event_type
        ),
        cum AS (
            SELECT g.event_type, g.vq, t.nref_total, t.ncur_total,
                   SUM(g.n_ref) OVER w AS cum_ref,
                   SUM(g.n_cur) OVER w AS cum_cur
            FROM g JOIN tot t ON g.event_type = t.event_type
            WINDOW w AS (PARTITION BY g.event_type ORDER BY g.vq
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        scored AS (
            SELECT event_type, vq, nref_total, ncur_total,
                   abs(CAST(cum_ref AS DOUBLE) / CAST(nref_total AS DOUBLE)
                       - CAST(cum_cur AS DOUBLE) / CAST(ncur_total AS DOUBLE))
                       AS ecdf_gap
            FROM cum
        ),
        best AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY ecdf_gap DESC, vq) AS rk
                FROM scored
            ) WHERE rk = 1
        )
        SELECT event_type, nref_total AS n_ref, ncur_total AS n_cur,
               ecdf_gap AS ks_stat,
               CAST(vq AS DOUBLE) / 100.0 AS ks_at_value,
               ecdf_gap > 1.36 * sqrt(
                   (CAST(nref_total AS DOUBLE) + CAST(ncur_total AS DOUBLE))
                   / (CAST(nref_total AS DOUBLE) * CAST(ncur_total AS DOUBLE))
               ) AS drifted
        FROM best
        ORDER BY event_type
    """,
    doc="""Two-sample Kolmogorov-Smirnov drift test on the continuous
    ``value`` column, per event type, between the two halves of the
    stream (same mid-timestamp split as drift_category_chi2 — chi2
    watches the CATEGORY mix, this watches the NUMERIC distribution):
    D = max_x |ECDF_ref(x) - ECDF_cur(x)|, reported with the value at
    which the gap peaks and the alpha=0.05 two-sample verdict
    D > 1.36*sqrt((n1+n2)/(n1*n2)).

    Cross-engine exactness: the ECDFs are evaluated on the exact cent
    grid (value is 2dp decimal-valued — the functions/exact.py scaled-
    BIGINT convention), cumulative counts are BIGINT window sums, and
    the gap is ONE division per side on exact integers (identical IEEE
    order both engines; the critical-value sqrt is IEEE-correctly-
    rounded, so the boolean is bit-stable).  Argmax ties break on the
    grid value.  The count cross-product is never formed in integers —
    per-half counts at 100 TB would overflow the int64 cross-multiply,
    the exact trap drift_category_chi2's denominator note documents.

    Scale: one hash aggregate at (type, cent) grain — state is bounded
    by the VALUE GRID (~49k cells/type at this value range), not the
    row count — then keyed windows over that bounded grid and a
    MAX(struct) argmax aggregate (r13: was a row_number window).  The fact scan dominates; everything after is O(|grid|).""",
)
def drift_numeric_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.functions.exact import scaled_long

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "ts_us",
        scaled_long(F.col("value"), 100).alias("vq"),
    )
    bounds = ev.agg(
        (F.min("ts_us") + F.expr("(max(ts_us) - min(ts_us)) DIV 2")).alias(
            "mid"
        )
    )
    g = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type", "vq")
        .agg(
            F.sum(F.when(F.col("ts_us") < F.col("mid"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_ref"),
            F.sum(F.when(F.col("ts_us") < F.col("mid"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_cur"),
        )
    )
    tot = g.groupBy("event_type").agg(
        F.sum("n_ref").cast("bigint").alias("nref_total"),
        F.sum("n_cur").cast("bigint").alias("ncur_total"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("vq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = g.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "vq",
        "nref_total",
        "ncur_total",
        F.sum("n_ref").over(w).alias("cum_ref"),
        F.sum("n_cur").over(w).alias("cum_cur"),
    )
    scored = cum.select(
        "event_type",
        "vq",
        "nref_total",
        "ncur_total",
        F.abs(
            F.col("cum_ref").cast("double") / F.col("nref_total").cast("double")
            - F.col("cum_cur").cast("double")
            / F.col("ncur_total").cast("double")
        ).alias("ecdf_gap"),
    )
    # KS argmax by (gap desc, vq asc) as MAX(struct(gap, -vq, ...)) —
    # map-side combinable, no Sort+Window over the value grid (r13;
    # vq is unique per (event_type, vq) row so the payload fields never
    # tiebreak; results row-identical, interleaved 1.53s -> 1.07s).
    best = (
        scored.groupBy("event_type")
        .agg(
            F.max(
                F.struct(
                    F.col("ecdf_gap"),
                    (-F.col("vq")).alias("nvq"),
                    F.col("nref_total"),
                    F.col("ncur_total"),
                )
            ).alias("b")
        )
        .select(
            "event_type",
            F.col("b.nref_total").alias("nref_total"),
            F.col("b.ncur_total").alias("ncur_total"),
            F.col("b.ecdf_gap").alias("ecdf_gap"),
            (-F.col("b.nvq")).alias("vq"),
        )
    )
    nref_d = F.col("nref_total").cast("double")
    ncur_d = F.col("ncur_total").cast("double")
    return best.select(
        "event_type",
        F.col("nref_total").alias("n_ref"),
        F.col("ncur_total").alias("n_cur"),
        F.col("ecdf_gap").alias("ks_stat"),
        (F.col("vq").cast("double") / F.lit(100.0)).alias("ks_at_value"),
        (
            F.col("ecdf_gap")
            > F.lit(1.36) * F.sqrt((nref_d + ncur_d) / (nref_d * ncur_d))
        ).alias("drifted"),
    ).orderBy("event_type")


# --- Benford first-digit audit ------------------------------------------
# Expected Benford shares log10(1 + 1/d) are embedded as LITERALS, not
# computed via log10() at runtime: decimal literals parse to the same
# nearest double in every engine (correctly-rounded strtod), whereas
# libm log10 implementations are allowed to differ in the last ulp —
# the one-line constant table buys bit-identical expectations.
_BENFORD_P = {
    1: "0.3010299956639812",
    2: "0.17609125905568124",
    3: "0.12493873660829992",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}

_BENFORD_CASE = (
    "CASE digit "
    + " ".join(
        f"WHEN {d} THEN CAST({p} AS DOUBLE)"
        for d, p in _BENFORD_P.items()
    )
    + " END"
)


@register(
    "quality_benford_audit",
    oracle=f"""
        WITH cents AS (
            SELECT o_orderpriority AS priority,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        census AS (
            SELECT priority,
                   CAST(SUBSTRING(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
                       AS digit,
                   CAST(COUNT(*) AS BIGINT) AS n_obs
            FROM cents GROUP BY 1, 2
        ),
        spine AS (
            SELECT p.priority, CAST(u.d AS INTEGER) AS digit
            FROM (SELECT DISTINCT priority FROM cents) p,
                 unnest(generate_series(1, 9)) AS u(d)
        ),
        dense AS (
            SELECT s.priority, s.digit,
                   COALESCE(c.n_obs, 0) AS n_obs
            FROM spine s LEFT JOIN census c
              ON s.priority = c.priority AND s.digit = c.digit
        ),
        tot AS (
            SELECT priority, CAST(SUM(n_obs) AS BIGINT) AS n_total
            FROM dense GROUP BY priority
        )
        SELECT d.priority, d.digit, d.n_obs, t.n_total,
               CAST(d.n_obs AS DOUBLE) / CAST(t.n_total AS DOUBLE)
                   AS obs_share,
               {_BENFORD_CASE} AS expected_p,
               (CAST(d.n_obs AS DOUBLE)
                    - CAST(t.n_total AS DOUBLE) * ({_BENFORD_CASE}))
               * (CAST(d.n_obs AS DOUBLE)
                    - CAST(t.n_total AS DOUBLE) * ({_BENFORD_CASE}))
               / (CAST(t.n_total AS DOUBLE) * ({_BENFORD_CASE}))
                   AS chi2_term,
               abs(CAST(d.n_obs AS DOUBLE) / CAST(t.n_total AS DOUBLE)
                   - ({_BENFORD_CASE})) > 0.015 AS deviates
        FROM dense d JOIN tot t ON d.priority = t.priority
        ORDER BY d.priority, d.digit
    """,
    doc="""Benford's-law first-significant-digit audit of order prices,
    per order priority — the classic forensic-accounting / synthetic-
    data screen: naturally-occurring multi-scale amounts follow
    P(d) = log10(1 + 1/d), and a fabricated or truncated feed shows up
    as mass piled on one leading digit.  Per (priority, digit): observed
    count, observed share, expected Benford share, the per-digit
    chi-square contribution, and a >1.5pp absolute-deviation flag.

    Cross-engine exactness: the first digit comes off the exact cent
    grid through a decimal string (no float log); expected shares are
    literal doubles (libm log10 may differ in the last ulp between
    engines — see _BENFORD_P); every float expression is a fixed-order
    combination of exact BIGINTs and those literals, and NO float is
    ever summed across rows (the chi-square is reported per digit, not
    totalled).

    Scale: one map-side-combining hash aggregate to (priority, digit)
    grain — at most 9x|priorities| groups of state regardless of row
    count — plus a 9-row-per-priority dense spine so missing digits
    surface as n_obs=0 evidence rather than silently vanishing.""",
)
def quality_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.functions.exact import scaled_long

    cents = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        scaled_long(F.col("o_totalprice"), 100).alias("cents"),
    )
    census = (
        cents.select(
            "priority",
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("int")
            .alias("digit"),
        )
        .groupBy("priority", "digit")
        .agg(F.count("*").cast("bigint").alias("n_obs"))
    )
    spine = (
        cents.select("priority")
        .distinct()
        .select(
            "priority",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit"),
        )
    )
    dense = (
        spine.join(F.broadcast(census), ["priority", "digit"], "left")
        .select(
            "priority",
            "digit",
            F.coalesce("n_obs", F.lit(0).cast("bigint")).alias("n_obs"),
        )
    )
    tot = dense.groupBy("priority").agg(
        F.sum("n_obs").cast("bigint").alias("n_total")
    )
    expected = F.expr(_BENFORD_CASE)
    obs_d = F.col("n_obs").cast("double")
    n_d = F.col("n_total").cast("double")
    diff = obs_d - n_d * expected
    return (
        dense.join(F.broadcast(tot), "priority")
        .select(
            "priority",
            "digit",
            "n_obs",
            "n_total",
            (obs_d / n_d).alias("obs_share"),
            expected.alias("expected_p"),
            (diff * diff / (n_d * expected)).alias("chi2_term"),
            (F.abs(obs_d / n_d - expected) > F.lit(0.015)).alias(
                "deviates"
            ),
        )
        .orderBy("priority", "digit")
    )


# --- Embedding centroid drift -------------------------------------------------

_ECD_SCALE = 1_000_000  # micro-unit grid for exact per-dim sums


@register(
    "drift_embedding_centroid",
    oracle=f"""
        WITH lv AS (
            SELECT vec_id, CAST(label AS BIGINT) AS label,
                   vec_id % 2 AS half, i - 1 AS dim,
                   CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {_ECD_SCALE})
                        AS BIGINT) AS v
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS u(i)
        ),
        sums AS (
            SELECT label, half, dim,
                   CAST(SUM(v) AS BIGINT) AS s,
                   CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
            FROM lv GROUP BY 1, 2, 3
        ),
        gaps AS (
            SELECT a.label, a.dim, a.n AS n_even, b.n AS n_odd,
                   (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
                    - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)) AS gap
            FROM sums a JOIN sums b
              ON b.label = a.label AND b.dim = a.dim
             AND a.half = 0 AND b.half = 1
        ),
        folded AS (
            SELECT label, MAX(n_even) AS n_even, MAX(n_odd) AS n_odd,
                   list_reduce(list(gap * gap ORDER BY dim),
                               (acc, e) -> acc + e) AS dist_sq
            FROM gaps GROUP BY label
        )
        SELECT label, n_even, n_odd, dist_sq,
               sqrt(dist_sq) / {float(_ECD_SCALE)!r} AS centroid_l2,
               dist_sq > {float(_ECD_SCALE) ** 2!r} * 0.01 AS drifted
        FROM folded
        ORDER BY label
    """,
    doc=f"""Embedding centroid drift — the ML-ops monitor for an
    embedding model update or a feature-pipeline change: per label,
    the L2 distance between the class centroid computed from the even
    vec_ids and from the odd vec_ids (interleaved halves; a production
    run splits by model version or time).  A healthy space keeps the
    halves' centroids within sampling noise; a retrained encoder or a
    drifting upstream moves them — the per-label distance with a 0.1
    unit alarm line is the dashboard row.

    Determinism: per-dim sums ride the exact micro-unit
    ({_ECD_SCALE}x) BIGINT grid; each centroid gap is two exact
    divisions and a subtract; the cross-dim sum of squares is a
    SEQUENTIAL FOLD over the dim-ordered gap array (identical IEEE
    chain in F.aggregate and list_reduce — the events_forecast_holt
    convention), so no unordered float aggregation exists; sqrt is
    correctly rounded by spec.

    Scale: one map-side-combining (label, half, dim) aggregate bounds
    everything — state is O(|labels| x 2 x dims) regardless of corpus
    size; the fold runs on 64-element arrays per label.""",
)
def drift_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.catalog import spread, table

    emb = spread(table(spark, sf_dir, "embeddings"))
    lv = emb.select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "val"),
    ).select(
        "vec_id",
        "label",
        "half",
        "dim",
        F.round(F.col("val").cast("double") * _ECD_SCALE)
        .cast("long")
        .alias("v"),
    )
    sums = lv.groupBy("label", "half", "dim").agg(
        F.sum("v").cast("bigint").alias("s"),
        F.countDistinct("vec_id").cast("bigint").alias("n"),
    )
    a = sums.where(F.col("half") == 0).select(
        "label", "dim", F.col("s").alias("sa"), F.col("n").alias("n_even")
    )
    b = sums.where(F.col("half") == 1).select(
        "label", "dim", F.col("s").alias("sb"), F.col("n").alias("n_odd")
    )
    gaps = a.join(b, ["label", "dim"]).select(
        "label",
        "dim",
        "n_even",
        "n_odd",
        (
            F.col("sa").cast("double") / F.col("n_even").cast("double")
            - F.col("sb").cast("double") / F.col("n_odd").cast("double")
        ).alias("gap"),
    )
    folded = gaps.groupBy("label").agg(
        F.max("n_even").alias("n_even"),
        F.max("n_odd").alias("n_odd"),
        F.aggregate(
            F.expr("transform(array_sort(collect_list(struct(dim, gap))), x -> x.gap * x.gap)"),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("dist_sq"),
    )
    return folded.select(
        "label",
        "n_even",
        "n_odd",
        "dist_sq",
        (F.sqrt("dist_sq") / F.lit(float(_ECD_SCALE))).alias("centroid_l2"),
        (
            F.col("dist_sq") > F.lit(float(_ECD_SCALE) ** 2) * F.lit(0.01)
        ).alias("drifted"),
    ).orderBy("label")
