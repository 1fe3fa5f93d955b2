"""Statistical analytics operators: grouped OLS regression, Pearson
correlation, rolling z-score anomaly detection, exact rank-based
quantiles, and a DIY bloom-filter semi-join probe.

The reference loader (SURVEY.md §2.A) has no statistics surface at all;
these are the standard metric/feature queries an analytics engine runs
over the loader's landed tables.  Cross-engine determinism follows the
functions/exact.py doctrine taken one step further: every aggregate is
first computed as an *exact integer sum* (counts, scaled-long sums,
scaled-long sums of per-row integer products), then a single projection
evaluates the statistical formula in IEEE-double space with the SAME
expression text on both engines — identical operands + identical
expression tree = bit-identical doubles, with no rounding anywhere.

Scale: every query here is one map-side-combining hash aggregate (or
one window pass) over integer columns; nothing is driver-side, nothing
is all-pairs, and the sufficient statistics (n, Σx, Σx², Σxy) are
exactly the partials a 1000-executor cluster merges for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import spread, table
from kafka_hadoop_loader_spark.plans.ranking import two_phase_rank
from kafka_hadoop_loader_spark.registry import register

_US_PER_HOUR = 3_600_000_000


@register(
    "regr_by_group",
    oracle="""
        WITH s AS (
            SELECT p_brand,
                   CAST(COUNT(*) AS BIGINT)                          AS n,
                   CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT)       AS sx,
                   CAST(SUM(CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT)) AS BIGINT)
                                                                     AS sxx,
                   CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT)
                                                                     AS syc,
                   CAST(SUM(CAST(p_size AS BIGINT) * CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT)
                                                                     AS sxyc,
                   CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT) * CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT)
                                                                     AS syyc
            FROM part
            GROUP BY p_brand
        )
        SELECT p_brand AS brand, n,
               CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0.0
                    THEN NULL
                    ELSE (CAST(n AS DOUBLE) * CAST(sxyc AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(syc AS DOUBLE))
                         / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 100.0)
               END AS slope,
               CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0.0
                    THEN NULL
                    ELSE (CAST(syc AS DOUBLE) / 100.0
                          - ((CAST(n AS DOUBLE) * CAST(sxyc AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(syc AS DOUBLE))
                             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 100.0))
                            * CAST(sx AS DOUBLE))
                         / CAST(n AS DOUBLE)
               END AS intercept,
               CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syyc AS DOUBLE) - CAST(syc AS DOUBLE) * CAST(syc AS DOUBLE)) = 0.0
                    THEN NULL
                    ELSE ((CAST(n AS DOUBLE) * CAST(sxyc AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(syc AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(sxyc AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(syc AS DOUBLE)))
                         / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syyc AS DOUBLE) - CAST(syc AS DOUBLE) * CAST(syc AS DOUBLE)))
               END AS r2
        FROM s
        ORDER BY brand
    """,
    doc="""Grouped ordinary-least-squares regression: per brand, fit
    retail price against part size (slope, intercept, R²) from the five
    sufficient statistics (n, Σx, Σx², Σxy, Σy, Σy²) — the classic
    "regression as an aggregate" formulation.

    Determinism: the sufficient statistics are exact BIGINTs (size is
    integral, price is 2dp → cents); the OLS formulas then run in double
    space with textually identical expressions on both engines, so the
    doubles are bit-identical — no rounding tolerance needed.  Degenerate
    groups (zero size-variance) yield NULL on both sides.

    Scale: one hash aggregate with map-side combine; the statistics are
    trivially mergeable partials (this is exactly how a 1000-executor
    cluster would fit 10^6 per-key models in one pass).""",
)
def regr_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").select(
        "p_brand",
        F.col("p_size").cast("long").alias("x"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("yc"),
    )
    s = p.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("yc").alias("syc"),
        F.sum(F.col("x") * F.col("yc")).alias("sxyc"),
        F.sum(F.col("yc") * F.col("yc")).alias("syyc"),
    )
    nd = "CAST(n AS DOUBLE)"
    den_x = f"({nd} * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    den_y = f"({nd} * CAST(syyc AS DOUBLE) - CAST(syc AS DOUBLE) * CAST(syc AS DOUBLE))"
    num = f"({nd} * CAST(sxyc AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(syc AS DOUBLE))"
    slope = f"({num} / ({den_x} * 100.0))"
    return (
        s.select(
            F.col("p_brand").alias("brand"),
            "n",
            F.expr(f"CASE WHEN {den_x} = 0.0 THEN NULL ELSE {num} / ({den_x} * 100.0) END").alias(
                "slope"
            ),
            F.expr(
                f"CASE WHEN {den_x} = 0.0 THEN NULL ELSE "
                f"(CAST(syc AS DOUBLE) / 100.0 - {slope} * CAST(sx AS DOUBLE)) / {nd} END"
            ).alias("intercept"),
            F.expr(
                f"CASE WHEN {den_x} * {den_y} = 0.0 THEN NULL ELSE "
                f"({num} * {num}) / ({den_x} * {den_y}) END"
            ).alias("r2"),
        )
        .orderBy("brand")
    )


@register(
    "corr_matrix",
    oracle="""
        WITH b AS (
            SELECT l_returnflag,
                   CAST(ROUND(l_quantity) AS BIGINT)       AS q,
                   CAST(ROUND(l_extendedprice) AS BIGINT)  AS p,
                   CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
                   CAST(ROUND(l_tax * 100) AS BIGINT)      AS t
            FROM lineitem
        ),
        s AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(q) AS BIGINT) AS sq,   CAST(SUM(q * q) AS BIGINT) AS sqq,
                   CAST(SUM(p) AS BIGINT) AS sp,   CAST(SUM(p * p) AS BIGINT) AS spp,
                   CAST(SUM(q * p) AS BIGINT) AS sqp,
                   CAST(SUM(d) AS BIGINT) AS sd,   CAST(SUM(d * d) AS BIGINT) AS sdd,
                   CAST(SUM(t) AS BIGINT) AS st,   CAST(SUM(t * t) AS BIGINT) AS stt,
                   CAST(SUM(d * t) AS BIGINT) AS sdt
            FROM b
            GROUP BY l_returnflag
        )
        SELECT l_returnflag AS returnflag, n,
               (CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)))
                   AS corr_qty_price,
               (CAST(n AS DOUBLE) * CAST(sdt AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(st AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)))
                   AS corr_disc_tax
        FROM s
        ORDER BY returnflag
    """,
    doc="""Pearson correlation per group — (quantity, price) and
    (discount, tax) pairs per return flag — from exact integer
    sufficient statistics, with the r formula evaluated identically in
    double space on both engines.

    Pearson r is invariant under affine rescaling of either variable,
    so each column is first mapped to an exact integer grid (quantity
    integral, price rounded to whole units to keep Σp² well inside
    int64 at any SF, discount/tax to 2dp percent points); the
    correlation OF THE GRIDDED VALUES is the declared metric, and both
    engines compute it on identical integers.  int64 headroom: Σp² per
    row ≤ 1e10 → ~1e8 rows per group before overflow; beyond that the
    partial sums move to DECIMAL(38,0) with the same formula.

    Scale: one pass, eleven mergeable integer partials per group —
    the covariance-matrix-as-aggregate pattern.""",
)
def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity")).cast("long").alias("q"),
        F.round(F.col("l_extendedprice")).cast("long").alias("p"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_tax") * 100).cast("long").alias("t"),
    )
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum("p").alias("sp"),
        F.sum(F.col("p") * F.col("p")).alias("spp"),
        F.sum(F.col("q") * F.col("p")).alias("sqp"),
        F.sum("d").alias("sd"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("d") * F.col("t")).alias("sdt"),
    )

    def corr(sxy: str, sx: str, sxx: str, sy: str, syy: str) -> str:
        nd = "CAST(n AS DOUBLE)"
        return (
            f"({nd} * CAST({sxy} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE))"
            f" / (sqrt({nd} * CAST({sxx} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE))"
            f" * sqrt({nd} * CAST({syy} AS DOUBLE) - CAST({sy} AS DOUBLE) * CAST({sy} AS DOUBLE)))"
        )

    return (
        s.select(
            F.col("l_returnflag").alias("returnflag"),
            "n",
            F.expr(corr("sqp", "sq", "sqq", "sp", "spp")).alias("corr_qty_price"),
            F.expr(corr("sdt", "sd", "sdd", "st", "stt")).alias("corr_disc_tax"),
        )
        .orderBy("returnflag")
    )


@register(
    "anomaly_rolling_z",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type,
                   epoch_us(ts) // {_US_PER_HOUR} AS hour_id,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events
            GROUP BY event_type, hour_id
        ),
        w AS (
            SELECT event_type, hour_id, cnt,
                   CAST(COUNT(cnt) OVER fr AS BIGINT) AS n_obs,
                   CAST(SUM(cnt) OVER fr AS BIGINT)   AS sc,
                   CAST(SUM(cnt * cnt) OVER fr AS BIGINT) AS scc
            FROM hourly
            WINDOW fr AS (
                PARTITION BY event_type ORDER BY hour_id
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING
            )
        )
        SELECT event_type,
               make_timestamp(hour_id * {_US_PER_HOUR}) AS hour_ts,
               cnt,
               CASE WHEN n_obs >= 12
                         AND (CAST(n_obs AS DOUBLE) * CAST(scc AS DOUBLE)
                              - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) > 0.0
                    THEN (CAST(cnt AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(n_obs AS DOUBLE))
                         / sqrt((CAST(n_obs AS DOUBLE) * CAST(scc AS DOUBLE)
                                 - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                                / (CAST(n_obs AS DOUBLE) * (CAST(n_obs AS DOUBLE) - 1.0)))
                    ELSE NULL
               END AS zscore,
               COALESCE(CASE WHEN n_obs >= 12
                         AND (CAST(n_obs AS DOUBLE) * CAST(scc AS DOUBLE)
                              - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) > 0.0
                    THEN abs((CAST(cnt AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(n_obs AS DOUBLE))
                         / sqrt((CAST(n_obs AS DOUBLE) * CAST(scc AS DOUBLE)
                                 - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                                / (CAST(n_obs AS DOUBLE) * (CAST(n_obs AS DOUBLE) - 1.0)))) > 3.0
                    ELSE NULL END, FALSE) AS is_anomaly
        FROM w
        ORDER BY event_type, hour_ts
    """,
    doc="""Rolling z-score anomaly detection over the event stream:
    per-series hourly counts scored against the trailing-24-observation
    window (current hour excluded — the score compares now vs recent
    history), with a minimum-history gate of 12 observations and a 3σ
    flag — the standard ops-metrics anomaly shape.

    Determinism: counts are integers; the window's sufficient
    statistics (n, Σc, Σc²) are exact integer window sums; mean/stddev/
    z then evaluate in double space with identical expression text.
    Warm-up rows and zero-variance windows yield NULL (flag false).

    Scale: one shuffle on event_type serves both the hourly aggregate
    (map-side combined) and the ordered window; per-series window state
    is 25 integers.  At 100 TB the hourly layer is O(series × hours),
    decoupled from raw event volume.""",
)
def anomaly_rolling_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_us DIV {_US_PER_HOUR}").alias("hour_id")
    )
    hourly = e.groupBy("event_type", "hour_id").agg(F.count("*").alias("cnt"))
    fr = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-24, -1)
    )
    w = hourly.select(
        "event_type",
        "hour_id",
        "cnt",
        F.count("cnt").over(fr).alias("n_obs"),
        F.sum("cnt").over(fr).alias("sc"),
        F.sum(F.col("cnt") * F.col("cnt")).over(fr).alias("scc"),
    )
    nd = "CAST(n_obs AS DOUBLE)"
    var_num = f"({nd} * CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))"
    z = (
        f"(CAST(cnt AS DOUBLE) - CAST(sc AS DOUBLE) / {nd})"
        f" / sqrt({var_num} / ({nd} * ({nd} - 1.0)))"
    )
    cond = f"n_obs >= 12 AND {var_num} > 0.0"
    return (
        w.select(
            "event_type",
            F.timestamp_micros(F.col("hour_id") * _US_PER_HOUR)
            .cast("timestamp_ntz")
            .alias("hour_ts"),
            "cnt",
            F.expr(f"CASE WHEN {cond} THEN {z} ELSE NULL END").alias("zscore"),
            F.expr(
                f"COALESCE(CASE WHEN {cond} THEN abs({z}) > 3.0 ELSE NULL END, FALSE)"
            ).alias("is_anomaly"),
        )
        .orderBy("event_type", "hour_ts")
    )


@register(
    "quantiles_exact",
    oracle="""
        WITH r AS (
            SELECT l_returnflag, l_linestatus, l_quantity,
                   CAST(row_number() OVER (
                       PARTITION BY l_returnflag, l_linestatus ORDER BY l_quantity
                   ) AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER (
                       PARTITION BY l_returnflag, l_linestatus
                   ) AS BIGINT) AS n
            FROM lineitem
        )
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               MAX(n) AS n,
               MAX(CASE WHEN rn = (n * 1 + 3) // 4 THEN l_quantity END) AS p25,
               MAX(CASE WHEN rn = (n * 2 + 3) // 4 THEN l_quantity END) AS p50,
               MAX(CASE WHEN rn = (n * 3 + 3) // 4 THEN l_quantity END) AS p75,
               MAX(CASE WHEN rn = n THEN l_quantity END) AS p100
        FROM r
        GROUP BY l_returnflag, l_linestatus
        ORDER BY returnflag, linestatus
    """,
    doc="""Exact per-group quantiles (p25/p50/p75/max) by rank
    selection: the type-1 (lower) quantile is the value at sorted
    position ⌈q·n⌉, located with row_number + a conditional aggregate.
    The target rank ⌈k·n/4⌉ is computed as (n·k + 3) DIV 4 — pure
    integer arithmetic, engine-exact.  Row-number ties among equal
    values are harmless: the VALUE at a sorted position is unique
    regardless of tie order.

    Scale: one shuffle on the group key; the alternative at extreme
    cardinality is two-phase (per-partition histograms → merge), but
    rank-by-window is the exact answer and stays fully distributed —
    contrast with approx_percentile (approx_distinct sibling) when a
    sketch is acceptable.""",
)
def quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    # Collapse to the (group, distinct quantity) DOMAIN before ranking:
    # the exact type-1 selection "value at sorted position k" equals
    # MIN(v | cumulative count >= k), so the windows run over ~|domain|
    # rows per group instead of row_number()-sorting every lineitem row
    # (guide §2.3 aggregate-before-shuffle; same rewrite as
    # quantiles_approx_envelope, results proven hash-identical).
    dom = li.groupBy("l_returnflag", "l_linestatus", "l_quantity").agg(
        F.count("*").cast("long").alias("c")
    )
    wc = (
        Window.partitionBy("l_returnflag", "l_linestatus")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("l_returnflag", "l_linestatus")
    r = dom.select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        F.sum("c").over(wc).cast("long").alias("cw"),
        F.sum("c").over(wn).cast("long").alias("n"),
    )
    sel = lambda k: F.min(  # noqa: E731
        F.expr(f"CASE WHEN cw >= {k} THEN l_quantity END")
    )
    return (
        r.groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            F.max("n").alias("n"),
            sel("(n * 1 + 3) DIV 4").alias("p25"),
            sel("(n * 2 + 3) DIV 4").alias("p50"),
            sel("(n * 3 + 3) DIV 4").alias("p75"),
            F.max("l_quantity").alias("p100"),
        )
        .orderBy("returnflag", "linestatus")
    )


# Bloom filter geometry: 4096 bits = 128 words × 32 bits, k=2 portable
# md5-derived hash probes (same hash family as pipeline.sample_hash_split).
# 32-bit words keep the shift ≤ 31: DuckDB raises on BIGINT << 63, so the
# sign bit is never used (same discipline as agg_bitmap_presence's 60-bit
# slots).
_BLOOM_BITS = 4096
_PHASH = "CAST(CONV(SUBSTRING(MD5({x}), 1, 15), 16, 10) AS BIGINT)"
_PHASH_DUCK = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


@register(
    "bloom_filter_probe",
    oracle=f"""
        WITH keys AS (
            SELECT o_orderkey
            FROM orders WHERE o_orderpriority = '1-URGENT'
        ),
        bits AS (
            SELECT {_PHASH_DUCK.format(x="CAST(o_orderkey AS VARCHAR) || '|b1'")} % {_BLOOM_BITS} AS pos
            FROM keys
            UNION ALL
            SELECT {_PHASH_DUCK.format(x="CAST(o_orderkey AS VARCHAR) || '|b2'")} % {_BLOOM_BITS} AS pos
            FROM keys
        ),
        bloom AS (
            SELECT pos // 32 AS w,
                   BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS word
            FROM bits GROUP BY w
        ),
        probe AS (
            SELECT DISTINCT l_orderkey,
                   {_PHASH_DUCK.format(x="CAST(l_orderkey AS VARCHAR) || '|b1'")} % {_BLOOM_BITS} AS p1,
                   {_PHASH_DUCK.format(x="CAST(l_orderkey AS VARCHAR) || '|b2'")} % {_BLOOM_BITS} AS p2
            FROM lineitem
        ),
        tested AS (
            SELECT p.l_orderkey,
                   (b1.word & (CAST(1 AS BIGINT) << CAST(p.p1 % 32 AS INTEGER))) != 0
                   AND (b2.word & (CAST(1 AS BIGINT) << CAST(p.p2 % 32 AS INTEGER))) != 0
                       AS bloom_pass,
                   EXISTS (SELECT 1 FROM keys k WHERE k.o_orderkey = p.l_orderkey)
                       AS is_match
            FROM probe p
            LEFT JOIN bloom b1 ON b1.w = p.p1 // 32
            LEFT JOIN bloom b2 ON b2.w = p.p2 // 32
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
               CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
               CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match,
               CAST(SUM(CASE WHEN bloom_pass AND NOT is_match THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_false_pos,
               CAST(SUM(CASE WHEN is_match AND NOT bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_false_neg
        FROM tested
    """,
    doc="""DIY bloom-filter semi-join reduction: build a 4096-bit, k=2
    bloom filter over the urgent-order keys as a 64-row (word, bits)
    table via BIT_OR — an exactly-mergeable sketch, the same family as
    agg_bitmap_presence — then probe the fact side's distinct keys with
    two broadcast word lookups and verify against the exact semi-join.
    Output: probe/pass/match/false-positive counters, with
    n_false_neg = 0 as the structural bloom guarantee.

    This is the runtime-filter pattern (Spark's own InSubqueryExec /
    bloom-filter join pushdown) made explicit: at 100 TB the 64-word
    bloom built from a selective dim side broadcasts to every scan task
    and drops non-matching fact rows before the shuffle.  Hash probes
    use the portable md5 60-bit hash so both engines address identical
    bit positions.

    Spark plan: two broadcast hash joins against the 64-row bloom table
    + one ground-truth join whose strategy is AQE's (the true-match key
    set is orders-proportional, so it must not carry a broadcast hint);
    a single final global aggregate row.  Nothing driver-side.""",
)
def bloom_filter_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    keys = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    h1 = _PHASH.format(x="CAST(o_orderkey AS STRING) || '|b1'")
    h2 = _PHASH.format(x="CAST(o_orderkey AS STRING) || '|b2'")
    bits = keys.selectExpr(f"{h1} % {_BLOOM_BITS} AS pos").unionAll(
        keys.selectExpr(f"{h2} % {_BLOOM_BITS} AS pos")
    )
    bloom = bits.groupBy(F.expr("pos DIV 32").alias("w")).agg(
        F.expr("BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT))").alias("word")
    )
    p1 = _PHASH.format(x="CAST(l_orderkey AS STRING) || '|b1'")
    p2 = _PHASH.format(x="CAST(l_orderkey AS STRING) || '|b2'")
    probe = li.select("l_orderkey").distinct().selectExpr(
        "l_orderkey", f"{p1} % {_BLOOM_BITS} AS p1", f"{p2} % {_BLOOM_BITS} AS p2"
    )
    b1 = F.broadcast(bloom.withColumnRenamed("w", "w1").withColumnRenamed("word", "word1"))
    b2 = F.broadcast(bloom.withColumnRenamed("w", "w2").withColumnRenamed("word", "word2"))
    matches = keys.select(F.col("o_orderkey").alias("l_orderkey")).withColumn(
        "is_match", F.lit(True)
    )
    tested = (
        probe.join(b1, F.expr("w1 = p1 DIV 32"), "left")
        .join(b2, F.expr("w2 = p2 DIV 32"), "left")
        .withColumn(
            "bloom_pass",
            F.expr(
                f"(word1 & (CAST(1 AS BIGINT) << CAST(p1 % 32 AS INT))) != 0"
                f" AND (word2 & (CAST(1 AS BIGINT) << CAST(p2 % 32 AS INT))) != 0"
            ),
        )
        .join(matches, "l_orderkey", "left")
        .withColumn("is_match", F.coalesce("is_match", F.lit(False)))
    )
    return tested.agg(
        F.count("*").alias("n_probed"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias("n_bloom_pass"),
        F.sum(F.when(F.col("is_match"), 1).otherwise(0)).alias("n_true_match"),
        F.sum(F.when(F.col("bloom_pass") & ~F.col("is_match"), 1).otherwise(0)).alias(
            "n_false_pos"
        ),
        F.sum(F.when(F.col("is_match") & ~F.col("bloom_pass"), 1).otherwise(0)).alias(
            "n_false_neg"
        ),
    )


@register(
    "stats_mad_robust",
    oracle="""
        WITH med AS (
            SELECT o_orderpriority, median(o_totalprice) AS med_price
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o.o_orderpriority,
               MIN(m.med_price) AS med_price,
               median(abs(o.o_totalprice - m.med_price)) AS mad_price,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o JOIN med m USING (o_orderpriority)
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    doc="""Median absolute deviation — the robust spread statistic
    (stddev is wrecked by one outlier; MAD isn't, which is why data
    quality monitors alarm on MAD bands).  Two rank-based passes: the
    per-group median, broadcast back for |x - med|, then the median of
    the deviations.  Exactness: medians interpolate (a+b)/2 on
    identical doubles, the deviation is one exact subtraction — every
    value bit-matches the oracle, no distributional estimator drift.
    Plan: two hash aggregates over the same grouping key with a
    broadcast join between them — the first aggregate's exchange is
    reused for the second (same key), so the fact side shuffles
    once.""",
)
def stats_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("med_price")
    )
    return (
        o.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.min("med_price").alias("med_price"),
            F.median(F.abs(F.col("o_totalprice") - F.col("med_price"))).alias(
                "mad_price"
            ),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "stats_winsorize",
    oracle="""
        WITH ranked AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        cuts AS (
            SELECT event_type,
                   MAX(CASE WHEN rn = greatest(1, (n * 5) // 100)
                            THEN value END) AS p05,
                   MAX(CASE WHEN rn = greatest(1, (n * 95) // 100)
                            THEN value END) AS p95
            FROM ranked GROUP BY event_type
        )
        SELECT r.event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               c.p05, c.p95,
               CAST(SUM(CASE WHEN r.value < c.p05 THEN 1
                             WHEN r.value > c.p95 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clamped,
               CAST(SUM(CAST(ROUND(
                   CASE WHEN r.value < c.p05 THEN c.p05
                        WHEN r.value > c.p95 THEN c.p95
                        ELSE r.value END * 100) AS BIGINT)) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 100.0) AS winsorized_mean
        FROM ranked r JOIN cuts c USING (event_type)
        GROUP BY r.event_type, c.p05, c.p95
        ORDER BY r.event_type
    """,
    doc="""Winsorized mean: clamp each group's values at rank-exact
    p05/p95 before averaging — the robust-mean complement to MAD
    (trimming kills the tail, winsorizing caps it; both de-fang
    outliers that wreck plain averages in telemetry).  The cut points
    are rank-SELECTED (row_number = floor(n·q), tie-broken by id), not
    interpolated — so they are actual data values both engines pick
    identically; the clamped mean is an exact scaled-integer sum and
    one division.  Two window passes and the final aggregate all
    partition on event_type — one shuffle total.""",
)
def stats_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    cuts = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.lit(1), F.expr("(n * 5) div 100")),
                F.col("value"),
            )
        ).alias("p05"),
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.lit(1), F.expr("(n * 95) div 100")),
                F.col("value"),
            )
        ).alias("p95"),
    )
    clamped = F.when(F.col("value") < F.col("p05"), F.col("p05")).when(
        F.col("value") > F.col("p95"), F.col("p95")
    ).otherwise(F.col("value"))
    out_of_band = F.when(
        (F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95")), 1
    ).otherwise(0)
    return (
        ranked.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type", "p05", "p95")
        .agg(
            F.count("*").alias("n"),
            F.sum(out_of_band).cast("bigint").alias("n_clamped"),
            (
                F.sum(F.round(clamped * 100).cast("long")).cast("double")
                / (F.count("*").cast("double") * 100.0)
            ).alias("winsorized_mean"),
        )
        .select(
            "event_type", "n", "p05", "p95", "n_clamped", "winsorized_mean"
        )
        .orderBy("event_type")
    )


_BK_MIN_SUP = 3


@register(
    "basket_part_affinity",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey % 100 AS part_bucket
            FROM lineitem
        ),
        n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
              FROM lineitem),
        sup AS (
            SELECT part_bucket, CAST(COUNT(*) AS BIGINT) AS n_orders_with
            FROM items GROUP BY part_bucket
        ),
        pairs AS (
            SELECT a.part_bucket AS part_a, b.part_bucket AS part_b,
                   CAST(COUNT(*) AS BIGINT) AS n_both
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey
             AND a.part_bucket < b.part_bucket
            GROUP BY part_a, part_b
            HAVING COUNT(*) >= {_BK_MIN_SUP}
        )
        SELECT p.part_a, p.part_b, p.n_both,
               sa.n_orders_with AS n_a, sb.n_orders_with AS n_b,
               CAST(p.n_both * (SELECT n_orders FROM n) AS DOUBLE)
                   / CAST(sa.n_orders_with * sb.n_orders_with AS DOUBLE)
                   AS lift
        FROM pairs p
        JOIN sup sa ON sa.part_bucket = p.part_a
        JOIN sup sb ON sb.part_bucket = p.part_b
        ORDER BY lift DESC, part_a, part_b
        LIMIT 25
    """,
    doc=f"""Market-basket affinity (association-rule mining): co-purchase
    lift between part buckets within orders — support counts from one
    distinct-pairs self-join keyed on the order (pairs per order are
    bounded by basket size², so the join is Σ basket² — never
    all-pairs-of-parts), lift = P(a,b)/(P(a)·P(b)) computed as ONE
    division of exact integer products.  Min-support {_BK_MIN_SUP}
    prunes noise pairs before ranking.  The bucketing (partkey % 100)
    stands in for a product taxonomy level.  Scale: the same plan runs
    basket analysis on 10^10 orders — the order-keyed self-join
    shuffles on l_orderkey once; support and the scalar total are
    broadcast back.""",
)
def basket_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # LAZY cut: items feeds the support aggregate, BOTH self-join sides
    # and the scalar total — without it the distinct pass executed 4x
    # (r13 plan audit: zero exchange reuse).  n_orders reads the distinct
    # items table (same distinct orderkey set as the raw scan).
    items = (
        li.select(
            "l_orderkey", (F.col("l_partkey") % 100).alias("part_bucket")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_orders = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    sup = items.groupBy("part_bucket").agg(F.count("*").alias("n_orders_with"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.part_bucket") < F.col("b.part_bucket")),
        )
        .groupBy(
            F.col("a.part_bucket").alias("part_a"),
            F.col("b.part_bucket").alias("part_b"),
        )
        .agg(F.count("*").alias("n_both"))
        .where(F.col("n_both") >= _BK_MIN_SUP)
    )
    sa = sup.select(
        F.col("part_bucket").alias("part_a"), F.col("n_orders_with").alias("n_a")
    )
    sb = sup.select(
        F.col("part_bucket").alias("part_b"), F.col("n_orders_with").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            (
                (F.col("n_both") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(25)
    )


@register(
    "supplier_lead_time",
    oracle="""
        SELECT l.l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_shipments,
               CAST(SUM(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE))) AS BIGINT)
                   AS total_days,
               CAST(SUM(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_lead_days,
               CAST(MAX(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE))) AS BIGINT)
                   AS max_lead_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY l.l_suppkey
        ORDER BY l.l_suppkey
    """,
    doc="""Supplier lead-time analysis: order-to-ship day counts per
    supplier — the operational SLA metric, and the canonical
    derived-duration aggregate (the measure lives across TWO tables, so
    it only exists after the join).  Day differences are exact integers
    on both engines' date arithmetic; the mean is one division.  The
    fact-fact join shuffles on the order key once; the supplier
    aggregate re-shuffles only (suppkey, 3 ints) per lineitem.""",
)
def supplier_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    lead = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    ).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_shipments"),
            F.sum(lead).alias("total_days"),
            (F.sum(lead).cast("double") / F.count("*").cast("double")).alias(
                "avg_lead_days"
            ),
            F.max(lead).alias("max_lead_days"),
        )
        .orderBy("l_suppkey")
    )


@register(
    "quantiles_interpolated",
    oracle="""
        SELECT event_type,
               quantile_cont(value, 0.25) AS p25,
               quantile_cont(value, 0.50) AS p50,
               quantile_cont(value, 0.75) AS p75,
               quantile_cont(value, 0.90) AS p90,
               quantile_cont(value, 0.75) - quantile_cont(value, 0.25)
                   AS iqr
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="""Interpolated (continuous) quantiles + IQR: the PERCENTILE_CONT
    family, complementing quantiles_exact's rank-selected discrete form.
    Verified bit-identical across engines: both compute the same
    linear interpolation (1-f)·a + f·b on the two bracketing order
    statistics — identical doubles in, identical IEEE products out —
    so even these "continuous" statistics hash-match, no rounding
    convention needed.  At scale the exact sort-based percentile gives
    way to approx_percentile's mergeable sketch (rows-only by design);
    this pins the exact semantics the sketch approximates.""",
)
def quantiles_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.percentile("value", 0.25).alias("p25"),
            F.percentile("value", 0.50).alias("p50"),
            F.percentile("value", 0.75).alias("p75"),
            F.percentile("value", 0.90).alias("p90"),
            (F.percentile("value", 0.75) - F.percentile("value", 0.25)).alias(
                "iqr"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "orders_rfm_segments",
    oracle="""
        WITH anchor AS (
            SELECT MAX(CAST(o_orderdate AS DATE)) AS d0 FROM orders
        ),
        rfm AS (
            SELECT o_custkey,
                   date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                             (SELECT d0 FROM anchor)) AS recency_days,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS monetary_c
            FROM orders GROUP BY o_custkey
        ),
        scored AS (
            SELECT o_custkey, recency_days, frequency,
                   CAST(monetary_c AS DOUBLE) / 100.0 AS monetary,
                   CAST(6 - ntile(5) OVER (ORDER BY recency_days, o_custkey)
                        AS BIGINT) AS r_score,
                   CAST(ntile(5) OVER (ORDER BY frequency, o_custkey)
                        AS BIGINT) AS f_score,
                   CAST(ntile(5) OVER (ORDER BY monetary_c, o_custkey)
                        AS BIGINT) AS m_score
            FROM rfm
        )
        SELECT o_custkey, recency_days, frequency, monetary,
               r_score, f_score, m_score,
               CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                    WHEN r_score >= 4 THEN 'recent'
                    WHEN f_score >= 4 THEN 'loyal_lapsing'
                    WHEN r_score <= 2 AND f_score <= 2 THEN 'at_risk'
                    ELSE 'regular' END AS segment
        FROM scored
        ORDER BY o_custkey
    """,
    doc="""RFM segmentation — recency/frequency/monetary quintile scores
    and the marketing segments they imply, the most-deployed customer
    analysis in existence.  Recency anchors on the dataset's max date
    via a scalar subquery (broadcast, no driver round-trip); monetary
    stays a scaled BIGINT through scoring so quintile boundaries are
    exact; every ntile is tie-broken by customer id, so all three
    scores — and the CASE segments — are engine-identical.  Shape: one
    customer aggregate, then three ntiles over the customer-sized
    result (at 10^9 customers: rank against broadcast quantile cuts
    instead of global ntile, same scores).""",
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    anchor = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("d0"))
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "monetary_c"
            ),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("d0", "last_d").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary_c",
        )
    )
    # three exact distributed quintiles (plans/ranking.py two-phase
    # rank): each is a value-bucketed ntile, no single-partition window.
    # checkpoint_input materializes each chained stage once — without it
    # stage 3 re-evaluates the customer aggregate O(3^stages) times.
    scored = two_phase_rank(
        rfm, "recency_days", [F.col("recency_days"), F.col("o_custkey")],
        ntile=("_nt_r", 5), checkpoint_input=True,
    )
    scored = two_phase_rank(
        scored, "frequency", [F.col("frequency"), F.col("o_custkey")],
        ntile=("f_score", 5), checkpoint_input=True,
    )
    scored = two_phase_rank(
        scored, "monetary_c", [F.col("monetary_c"), F.col("o_custkey")],
        ntile=("m_score", 5), checkpoint_input=True,
    )
    scored = scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        (F.col("monetary_c").cast("double") / 100.0).alias("monetary"),
        (F.lit(6) - F.col("_nt_r")).cast("bigint").alias("r_score"),
        F.col("f_score").cast("bigint"),
        F.col("m_score").cast("bigint"),
    )
    seg = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion")
        .when(F.col("r_score") >= 4, "recent")
        .when(F.col("f_score") >= 4, "loyal_lapsing")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "at_risk")
        .otherwise("regular")
    )
    return scored.select("*", seg.alias("segment")).orderBy("o_custkey")


@register(
    "supplier_concentration_hhi",
    oracle="""
        WITH rev AS (
            SELECT s.s_nationkey, l.l_suppkey,
                   SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                       AS rev_c
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY s.s_nationkey, l.l_suppkey
        )
        SELECT n.n_name AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(rev_c) AS DOUBLE) / 100.0 AS total_revenue,
               CAST(SUM((rev_c // 100) * (rev_c // 100)) AS DOUBLE)
                   / (CAST(SUM(rev_c // 100) AS DOUBLE)
                      * CAST(SUM(rev_c // 100) AS DOUBLE)) AS hhi
        FROM rev JOIN nation n ON n.n_nationkey = rev.s_nationkey
        GROUP BY nation
        ORDER BY nation
    """,
    doc="""Supplier concentration by Herfindahl-Hirschman index: Σ of
    squared revenue shares per nation — the antitrust/market-structure
    statistic, and the supply-chain-risk number (HHI → 1 means one
    supplier owns the nation's volume).  Same portable-rational family
    as the Simpson index: squares and sums of scaled-BIGINT revenues,
    one division at the end — no logs, bit-exact.  Two aggregates
    (supplier revenue, then nation roll-up) + a broadcast nation join.
    int64 headroom is the one real constraint: cents-scaled revenues
    square past int64, so the HHI term uses whole-currency units
    (rev_c DIV 100, identical floor in both engines) — shares of
    dollar-rounded revenues, squared safely.""",
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    rev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "rev_c"
            )
        )
    )
    tot = F.sum("rev_c")
    return (
        rev.join(F.broadcast(n), rev.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_suppliers"),
            (tot.cast("double") / 100.0).alias("total_revenue"),
            (
                F.sum(F.expr("(rev_c div 100) * (rev_c div 100)")).cast("double")
                / (
                    F.sum(F.expr("rev_c div 100")).cast("double")
                    * F.sum(F.expr("rev_c div 100")).cast("double")
                )
            ).alias("hhi"),
        )
        .orderBy("nation")
    )


@register(
    "events_bot_regularity",
    oracle="""
        WITH gaps AS (
            SELECT user_id,
                   (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY epoch_us(ts), event_id)
                    - epoch_us(ts)) // 1000000 AS gap_s
            FROM events
        ),
        m AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_gaps,
                   CAST(SUM(gap_s) AS BIGINT) AS s1,
                   CAST(SUM(gap_s * gap_s) AS BIGINT) AS s2
            FROM gaps WHERE gap_s IS NOT NULL
            GROUP BY user_id
            HAVING COUNT(*) >= 5
        )
        SELECT user_id, n_gaps,
               CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_s,
               (CAST(s2 AS DOUBLE) * CAST(n_gaps AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE))
                   AS gap_variance,
               ((CAST(s2 AS DOUBLE) * CAST(n_gaps AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                * 100 < CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   AS suspected_bot
        FROM m
        ORDER BY user_id
    """,
    doc="""Bot/automation detection by inter-event regularity: humans
    have bursty, high-variance gaps; schedulers fire metronomically.
    Per user: mean and population variance of second-granularity gaps
    from exact integer moments (Σg, Σg² — the agg_stats_exact doctrine;
    µs gaps are floored to seconds first so the squared sums stay far
    inside int64), and a coefficient-of-variation flag (variance <
    mean²/100, i.e. CV < 0.1) evaluated on the EXACT integer cross
    products so the boolean can't flip on float drift.  One window +
    one aggregate, both on user_id.""",
)
def events_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = e.select(
        "user_id",
        F.expr("(lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)"
               " - ts_us) DIV 1000000").alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    m = (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("gap_s").alias("s1"),
            F.sum(F.col("gap_s") * F.col("gap_s")).alias("s2"),
        )
        .where(F.col("n_gaps") >= 5)
    )
    n_, s1, s2 = (F.col(c).cast("double") for c in ("n_gaps", "s1", "s2"))
    var = (s2 * n_ - s1 * s1) / (n_ * n_)
    return m.select(
        "user_id",
        "n_gaps",
        (s1 / n_).alias("mean_gap_s"),
        var.alias("gap_variance"),
        ((s2 * n_ - s1 * s1) * 100 < s1 * s1).alias("suspected_bot"),
    ).orderBy("user_id")


@register(
    "quantiles_approx_envelope",
    oracle="""
        WITH r AS (
            SELECT l_returnflag, l_linestatus, l_quantity,
                   CAST(row_number() OVER (
                       PARTITION BY l_returnflag, l_linestatus ORDER BY l_quantity
                   ) AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER (
                       PARTITION BY l_returnflag, l_linestatus
                   ) AS BIGINT) AS n
            FROM lineitem
        )
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               MAX(n) AS n,
               MAX(CASE WHEN rn = GREATEST((n * 23 + 99) // 100, 1)
                        THEN l_quantity END) AS p25_lo,
               MAX(CASE WHEN rn = (n * 27 + 99) // 100 THEN l_quantity END) AS p25_hi,
               MAX(CASE WHEN rn = GREATEST((n * 48 + 99) // 100, 1)
                        THEN l_quantity END) AS p50_lo,
               MAX(CASE WHEN rn = (n * 52 + 99) // 100 THEN l_quantity END) AS p50_hi,
               MAX(CASE WHEN rn = GREATEST((n * 73 + 99) // 100, 1)
                        THEN l_quantity END) AS p75_lo,
               MAX(CASE WHEN rn = (n * 77 + 99) // 100 THEN l_quantity END) AS p75_hi,
               TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
        FROM r
        GROUP BY returnflag, linestatus
        ORDER BY returnflag, linestatus
    """,
    doc="""approx_percentile with a checkable contract (the
    approx_distinct pattern applied to quantile sketches): the
    Greenwald-Khanna sketch guarantees rank error ≤ n/accuracy
    regardless of partition merge order, so with accuracy=10000 the
    estimate provably lies between the EXACT rank-(q−0.02)·n and
    rank-(q+0.02)·n values.  The query emits those exact envelope
    bounds plus a boolean per percentile asserting the sketch landed
    inside; the oracle computes the same bounds and expects TRUE —
    a sketch regression (or a merge-order-sensitive implementation)
    flips a boolean and hash-fails.

    Scale: the envelope (window rank) is the expensive exact pass and
    exists only to certify the sketch; production keeps just the
    percentile_approx aggregate — one map-side-combinable sketch per
    group, no window, no sort.""",
)
def quantiles_approx_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    # Collapse to the (group, distinct quantity) DOMAIN before ranking
    # (the agg_weighted_median shape): the exact rank-k selection over
    # sorted rows equals MIN(v | cumulative count >= k) over the domain,
    # so the two windows run over ~|domain| rows per group instead of
    # row_number()-sorting every lineitem row (guide §2.3
    # aggregate-before-shuffle; r13: the window pass dominated this
    # query).  percentile_approx keeps its row-grain input via its own
    # map-side-combining aggregate — no row ever crosses a window.
    dom = li.groupBy("l_returnflag", "l_linestatus", "l_quantity").agg(
        F.count("*").cast("long").alias("c")
    )
    wc = (
        Window.partitionBy("l_returnflag", "l_linestatus")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("l_returnflag", "l_linestatus")
    r = dom.select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        F.sum("c").over(wc).cast("long").alias("cw"),
        F.sum("c").over(wn).cast("long").alias("n"),
    )
    def bound(pct: int, alias: str) -> F.Column:
        # smallest value whose cumulative count reaches rank
        # GREATEST(ceil(n*pct/100), 1) — identical to the row-grain
        # "value at row_number == k" on sorted duplicates.
        return F.min(
            F.expr(
                f"CASE WHEN cw >= GREATEST((n * {pct} + 99) DIV 100, 1)"
                " THEN l_quantity END"
            )
        ).alias(alias)
    bounds = (
        r.groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            F.max("n").alias("n"),
            bound(23, "p25_lo"),
            bound(27, "p25_hi"),
            bound(48, "p50_lo"),
            bound(52, "p50_hi"),
            bound(73, "p75_lo"),
            bound(77, "p75_hi"),
        )
    )
    ap = li.groupBy(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    ).agg(
        F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], 10000).alias(
            "ap"
        )
    )
    agg = bounds.join(ap, ["returnflag", "linestatus"])
    return (
        agg.select(
            "returnflag",
            "linestatus",
            "n",
            "p25_lo",
            "p25_hi",
            "p50_lo",
            "p50_hi",
            "p75_lo",
            "p75_hi",
            ((F.col("ap")[0] >= F.col("p25_lo")) & (F.col("ap")[0] <= F.col("p25_hi"))).alias("p25_ok"),
            ((F.col("ap")[1] >= F.col("p50_lo")) & (F.col("ap")[1] <= F.col("p50_hi"))).alias("p50_ok"),
            ((F.col("ap")[2] >= F.col("p75_lo")) & (F.col("ap")[2] <= F.col("p75_hi"))).alias("p75_ok"),
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "feature_quantile_bins",
    oracle="""
        WITH binned AS (
            SELECT o_totalprice,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                       AS is_urgent,
                   CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                        AS BIGINT) AS bin
            FROM orders
        )
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(o_totalprice) AS lo,
               MAX(o_totalprice) AS hi,
               CAST(SUM(is_urgent) AS BIGINT) AS n_urgent,
               CAST(SUM(is_urgent) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS urgent_rate
        FROM binned
        GROUP BY bin
        ORDER BY bin
    """,
    doc="""Equal-frequency feature discretization (decile binning) with
    per-bin target statistics — the feature-engineering transform
    behind WOE/IV scoring, monotonicity checks, and calibration plots:
    ntile(10) over the (price, key) total order assigns bins, then one
    aggregate yields bin edges and the target (urgency) rate per bin.

    Determinism: the ntile rides a TOTAL order (price, orderkey), so
    bin membership is unique even among equal prices; edges are exact
    column values; the rate is one division.

    Scale: a global ntile is a global sort — at 100 TB use
    approx_percentile edges (quantiles_approx_envelope pattern) and a
    map-side CASE join instead; the exact form here doubles as the
    oracle for that approximation (same contract shape as
    quantiles_exact vs quantiles_approx_envelope).""",
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # exact distributed decile (plans/ranking.py): value-bucketed
    # two-phase ntile, no single-partition window.
    binned = two_phase_rank(
        o.select(
            "o_totalprice",
            "o_orderkey",
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("is_urgent"),
        ),
        "o_totalprice",
        [F.col("o_totalprice"), F.col("o_orderkey")],
        ntile=("bin", 10),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.sum("is_urgent").cast("bigint").alias("n_urgent"),
            (
                F.sum("is_urgent").cast("double") / F.count("*").cast("double")
            ).alias("urgent_rate"),
        )
        .orderBy("bin")
    )


@register(
    "rank_distributed",
    oracle="""
        SELECT o_orderkey,
               CAST(row_number() OVER w AS BIGINT) AS global_rank,
               CAST(ntile(10) OVER w AS BIGINT) AS decile,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                   ORDER BY o_totalprice, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_price_c
        FROM orders
        WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        ORDER BY global_rank
    """,
    doc="""The two-phase distributed global rank (plans/ranking.py) as a
    first-class operator, so the scale-safe rank is itself under the
    correctness contract: exact global row_number, NTILE(10) and a
    running scaled-cents sum over the (o_totalprice, o_orderkey) total
    order, all produced WITHOUT a single-partition WindowExec.  The
    oracle states the plain global-window form — the two plans must be
    bit-identical or the value hash fails.

    Scale: one low-accuracy percentile pass for value-bucket boundaries
    (balance only — exactness comes from the exact per-bucket counts),
    one hash-partitioned window per bucket, one broadcast of B offset
    rows.  This is the plan every other global-order operator
    (zorder_layout, orders_rfm_segments, curriculum_order,
    events_peak_concurrency, shard_plan_balanced, feature_quantile_bins)
    delegates to.""",
)
def rank_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )
    ranked = two_phase_rank(
        o,
        "o_totalprice",
        [F.col("o_totalprice"), F.col("o_orderkey")],
        row_number_col="global_rank",
        ntile=("decile", 10),
        prefix_sum=("cum_price_c", F.col("price_c")),
    )
    return (
        ranked.select(
            "o_orderkey",
            "global_rank",
            "decile",
            F.col("cum_price_c").cast("bigint").alias("cum_price_c"),
        )
        .orderBy("global_rank")
    )


# --- Poisson bootstrap: distributed confidence intervals ---------------

_BOOT_R = 32  # bootstrap replicates
# Poisson(1) inverse-CDF thresholds scaled to 1e9 (floor(CDF(k)*1e9)):
# a 60-bit portable hash mod 1e9 is a uniform draw; the CASE ladder maps
# it to a Poisson(1) weight.  The constants are shared verbatim with the
# oracle, so both engines draw IDENTICAL replicate weights.
_POIS_T = (367879441, 735758882, 919698602, 981011843, 996340153, 999405815)
_POIS_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN h < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    + f" ELSE {len(_POIS_T)} END"
)


@register(
    "stats_bootstrap_ci",
    oracle=f"""
        WITH base AS (
            SELECT o_orderkey AS k,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        drawn AS (
            SELECT r, cents, {_POIS_CASE_SQL} AS wt
            FROM (
                SELECT cents, r,
                       CAST(('0x' || substr(md5('boot:'
                            || CAST(k AS VARCHAR) || ':'
                            || CAST(r AS VARCHAR)), 1, 15)) AS BIGINT)
                           % 1000000000 AS h
                FROM base, unnest(generate_series(0, {_BOOT_R - 1})) AS u(r)
            )
        ),
        rep AS (
            SELECT r,
                   CAST(SUM(wt * cents) AS DOUBLE)
                       / (100.0 * CAST(SUM(wt) AS DOUBLE)) AS m
            FROM drawn GROUP BY r
        ),
        sorted AS (SELECT list(m ORDER BY m) AS ms FROM rep),
        pt AS (
            SELECT CAST(SUM(cents) AS DOUBLE)
                       / (100.0 * CAST(COUNT(*) AS DOUBLE)) AS point_mean
            FROM base
        )
        SELECT CAST({_BOOT_R} AS INTEGER) AS n_replicates,
               pt.point_mean,
               sorted.ms[2] AS ci_low,
               sorted.ms[{_BOOT_R - 1}] AS ci_high
        FROM pt CROSS JOIN sorted
    """,
    doc=f"""Poisson-bootstrap 95% confidence interval for the mean order
    value — THE technique for error bars on massive data (each of the
    {_BOOT_R} replicates resamples every row with an independent
    Poisson(1) weight, so the whole bootstrap is ONE streaming pass; a
    classic resample-with-replacement would need {_BOOT_R} global
    shuffles of the full table).  The uniform draw per (row, replicate)
    is the portable 60-bit md5 hash mod 1e9 pushed through a Poisson(1)
    inverse-CDF ladder of integer thresholds — fully deterministic and
    engine-exact, so the oracle reproduces every weight bit-for-bit
    (the same salted-hash-decision convention as sample_hash_split).
    Replicate means are exact scaled-BIGINT sums with one final
    division; the CI is the 2nd/{_BOOT_R - 1}th order statistic of the
    {_BOOT_R} sorted replicate means (percentile bootstrap).

    Scale: the explode is {_BOOT_R}x the input ROWS but the aggregate
    is map-side combining into {_BOOT_R} groups — the shuffle carries
    ~{_BOOT_R} partial rows per task, not the data.  At 100 TB replace
    the explode with an in-row array fold emitting one {_BOOT_R}-wide
    partial per partition; the semantics (and these thresholds) are
    unchanged.""",
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread BEFORE the x32 explode + per-(row, replicate) md5: the
    # fixture table is one parquet file -> one scan partition, which
    # serialized ~5s of hash CPU onto a single core (measured r13:
    # 5.5s -> 0.5s for the exploded hash stage once spread).  The
    # point-mean branch reuses the same spread scan.
    o = spread(
        table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        ),
        "k",
    )
    drawn = o.select(
        "k",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r"),
    )
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot:"),
                        F.col("k").cast("string"),
                        F.lit(":"),
                        F.col("r").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000000000
    )
    wt = F.when(h < _POIS_T[0], 0)
    for k_, t in list(enumerate(_POIS_T))[1:]:
        wt = wt.when(h < t, k_)
    wt = wt.otherwise(len(_POIS_T))
    rep = (
        drawn.select("r", "cents", wt.alias("wt"))
        .groupBy("r")
        .agg(
            (
                F.sum(F.col("wt") * F.col("cents")).cast("double")
                / (F.lit(100.0) * F.sum("wt").cast("double"))
            ).alias("m")
        )
    )
    sorted_ms = rep.agg(F.array_sort(F.collect_list("m")).alias("ms"))
    pt = o.agg(
        (
            F.sum("cents").cast("double")
            / (F.lit(100.0) * F.count(F.lit(1)).cast("double"))
        ).alias("point_mean")
    )
    return pt.crossJoin(F.broadcast(sorted_ms)).select(
        F.lit(_BOOT_R).cast("int").alias("n_replicates"),
        "point_mean",
        # try_ variants: an EMPTY input yields an empty replicate array,
        # which must surface as NULL bounds, not an ANSI index error
        # (DuckDB's list index is already NULL out of range)
        F.try_element_at("ms", F.lit(2)).alias("ci_low"),
        F.try_element_at("ms", F.lit(_BOOT_R - 1)).alias("ci_high"),
    )


# --- Kaplan-Meier survival: time-to-reorder with censoring -------------


@register(
    "orders_survival_km",
    oracle="""
        WITH o AS (
            SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
            FROM orders
        ),
        r AS (
            SELECT o_custkey, d,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY d, o_orderkey) AS rn
            FROM o
        ),
        firsts AS (
            SELECT o_custkey,
                   MIN(CASE WHEN rn = 1 THEN d END) AS d1,
                   MIN(CASE WHEN rn = 2 THEN d END) AS d2
            FROM r WHERE rn <= 2 GROUP BY o_custkey
        ),
        mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
        obs AS (
            SELECT CASE WHEN d2 IS NOT NULL
                        THEN CAST(date_diff('day', d1, d2) AS BIGINT)
                        ELSE CAST(date_diff('day', d1, dmax) AS BIGINT)
                   END AS t,
                   CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
            FROM firsts CROSS JOIN mx
        ),
        grid AS (
            SELECT t, CAST(SUM(ev) AS BIGINT) AS d_events,
                   CAST(COUNT(*) AS BIGINT) AS c_all
            FROM obs GROUP BY t
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs),
        atrisk AS (
            SELECT t, d_events,
                   CAST(n - COALESCE(SUM(c_all) OVER (ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
            FROM grid CROSS JOIN tot
        ),
        ev AS (
            SELECT t, d_events, n_at_risk,
                   CAST(n_at_risk - d_events AS DOUBLE)
                       / CAST(n_at_risk AS DOUBLE) AS f
            FROM atrisk WHERE d_events > 0
        ),
        facs AS (
            SELECT list(struct_pack(t := t, f := f) ORDER BY t) AS fs
            FROM ev
        )
        SELECT e.t AS t_days, e.n_at_risk, e.d_events,
               list_reduce(
                   list_prepend(1.0, [x.f for x in fs if x.t <= e.t]),
                   (a, b) -> a * b) AS survival
        FROM ev e CROSS JOIN facs
        ORDER BY t_days
    """,
    doc="""Kaplan-Meier survival curve for time-to-second-order — the
    censoring-correct churn/retention analysis naive averages get
    wrong: customers who never reordered are not "missing", they are
    RIGHT-CENSORED at the end of observation (the dataset's max order
    date), and dropping or averaging them biases the curve toward
    fast re-orderers.  Per distinct day-gap t with >= 1 reorder event:
    the at-risk count n(t), event count d(t), and the product-limit
    estimate S(t) = prod_{t' <= t} (1 - d/n).

    Determinism: day gaps and the at-risk ladder (total minus an
    exclusive running sum over the duration grid — a bounded window at
    day grain) are pure integers; each hazard factor is one IEEE
    division, and the survival product is a SEQUENTIAL fold over the
    t-sorted factor array (collect_list + array_sort, mirrored by
    DuckDB's ordered list + list_reduce) — identical multiply order,
    bit-identical result; no exp(sum(ln)) trick, whose transcendentals
    are not portable.

    Scale: one shuffle at customer grain (first/second order), one
    hash aggregate at duration grain (bounded by the calendar, not the
    data), and a 1-row broadcast of the factor array.  The classic
    survival shape (churn, time-to-conversion, hardware failure) at
    100 TB runs exactly this plan; only the customer shuffle scales.""",
)
def orders_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.plans.ranking import bounded_window_key

    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    r = o.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 2)
    firsts = r.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
    )
    mx = o.agg(F.max("d").alias("dmax"))
    obs = firsts.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("d2").isNotNull(), F.datediff(F.col("d2"), F.col("d1"))
        )
        .otherwise(F.datediff(F.col("dmax"), F.col("d1")))
        .cast("bigint")
        .alias("t"),
        F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    grid = obs.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d_events"),
        F.count(F.lit(1)).cast("bigint").alias("c_all"),
    )
    tot = obs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wcum = (
        Window.partitionBy(bounded_window_key("t"))
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    atrisk = grid.crossJoin(F.broadcast(tot)).select(
        "t",
        "d_events",
        (
            F.col("n") - F.coalesce(F.sum("c_all").over(wcum), F.lit(0))
        ).alias("n_at_risk"),
    )
    ev = atrisk.where(F.col("d_events") > 0).select(
        "t",
        "d_events",
        "n_at_risk",
        (
            (F.col("n_at_risk") - F.col("d_events")).cast("double")
            / F.col("n_at_risk").cast("double")
        ).alias("f"),
    )
    facs = ev.agg(
        F.array_sort(F.collect_list(F.struct("t", "f"))).alias("fs")
    )
    return (
        ev.select(
            F.col("t").alias("t_days"), "n_at_risk", "d_events", "f"
        )
        .crossJoin(F.broadcast(facs))
        .select(
            "t_days",
            "n_at_risk",
            "d_events",
            F.aggregate(
                F.filter("fs", lambda x: x["t"] <= F.col("t_days")),
                F.lit(1.0),
                lambda a, x: a * x["f"],
            ).alias("survival"),
        )
        .orderBy("t_days")
    )


# --- Difference-in-differences uplift ----------------------------------

_DID_AVG = (
    "CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS DOUBLE)"
    " / (CAST(COUNT(value) AS DOUBLE) * 100.0)"
)


@register(
    "events_uplift_did",
    oracle=f"""
        WITH ev AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us, value
            FROM events
        ),
        bounds AS (
            SELECT MIN(ts_us) + (MAX(ts_us) - MIN(ts_us)) // 2 AS mid
            FROM ev
        ),
        cells AS (
            SELECT CAST(('0x' || substr(md5('did:'
                       || CAST(e.user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                       % 2 AS treated,
                   CASE WHEN e.ts_us < mid THEN 0 ELSE 1 END AS post,
                   e.value
            FROM ev e CROSS JOIN bounds
            WHERE e.event_type = 'purchase'
        ),
        agg AS (
            SELECT treated, post, CAST(COUNT(*) AS BIGINT) AS n,
                   {_DID_AVG} AS m
            FROM cells GROUP BY treated, post
        )
        SELECT
            MAX(CASE WHEN treated = 1 AND post = 0 THEN n END)
                AS n_treated_pre,
            MAX(CASE WHEN treated = 1 AND post = 1 THEN n END)
                AS n_treated_post,
            MAX(CASE WHEN treated = 0 AND post = 0 THEN n END)
                AS n_control_pre,
            MAX(CASE WHEN treated = 0 AND post = 1 THEN n END)
                AS n_control_post,
            MAX(CASE WHEN treated = 1 AND post = 0 THEN m END)
                AS mean_treated_pre,
            MAX(CASE WHEN treated = 1 AND post = 1 THEN m END)
                AS mean_treated_post,
            MAX(CASE WHEN treated = 0 AND post = 0 THEN m END)
                AS mean_control_pre,
            MAX(CASE WHEN treated = 0 AND post = 1 THEN m END)
                AS mean_control_post,
            (MAX(CASE WHEN treated = 1 AND post = 1 THEN m END)
             - MAX(CASE WHEN treated = 1 AND post = 0 THEN m END))
            - (MAX(CASE WHEN treated = 0 AND post = 1 THEN m END)
               - MAX(CASE WHEN treated = 0 AND post = 0 THEN m END))
                AS did_estimate
        FROM agg
    """,
    doc="""Difference-in-differences uplift estimate — the measurement a
    growth/ML team runs over a staged feature rollout: treatment
    assignment is the salted-hash user holdout (the sample_hash_split
    convention — 50/50 by md5 of user id, exactly how production
    holdouts are assigned; on these fixtures every behavioral
    definition degenerates because all users sign up early), outcome
    is purchase value PRE vs POST the observed mid-timestamp split
    (same 1-row broadcast convention as drift_category_chi2).  DiD =
    (treated post - treated pre) - (control post - control pre): the
    control trend subtracts the secular drift a naive before/after
    comparison would swallow.

    Determinism: cell means are exact scaled-BIGINT sums over the
    2dp-decimal value column with one division (the exact_sum
    convention); the estimator is a fixed-shape 3-subtraction
    expression over the four cell means.

    Scale: assignment is a stateless per-row hash (no treated-set
    join at all), then one map-side-combining aggregate into FOUR
    cells and a 4-row pivot.  The outcome scan dominates at any size;
    nothing else grows.""",
)
def events_uplift_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us", "value"
    )
    bounds = ev.agg(
        (F.min("ts_us") + F.expr("(max(ts_us) - min(ts_us)) DIV 2")).alias(
            "mid"
        )
    )
    evb = ev.crossJoin(F.broadcast(bounds))
    assign = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("did:"), F.col("user_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    cells = evb.where(F.col("event_type") == "purchase").select(
        assign.alias("treated"),
        F.when(F.col("ts_us") < F.col("mid"), 0).otherwise(1).alias("post"),
        "value",
    )
    agg = cells.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / (F.count("value").cast("double") * F.lit(100.0))
        ).alias("m"),
    )

    def cell(col, t, p):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col))
        )

    return agg.agg(
        cell("n", 1, 0).alias("n_treated_pre"),
        cell("n", 1, 1).alias("n_treated_post"),
        cell("n", 0, 0).alias("n_control_pre"),
        cell("n", 0, 1).alias("n_control_post"),
        cell("m", 1, 0).alias("mean_treated_pre"),
        cell("m", 1, 1).alias("mean_treated_post"),
        cell("m", 0, 0).alias("mean_control_pre"),
        cell("m", 0, 1).alias("mean_control_post"),
        (
            (cell("m", 1, 1) - cell("m", 1, 0))
            - (cell("m", 0, 1) - cell("m", 0, 0))
        ).alias("did_estimate"),
    )


# --- coarsened-exact-matching causal effect -----------------------------


@register(
    "causal_cem_att",
    oracle="""
        WITH returned AS (
            SELECT l_orderkey,
                   CAST(MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS y
            FROM lineitem GROUP BY l_orderkey
        ),
        units AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(ROUND(o.o_totalprice * 100) AS BIGINT) // 2500000
                       AS price_band,
                   CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS t,
                   COALESCE(r.y, 0) AS y
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            LEFT JOIN returned r ON o.o_orderkey = r.l_orderkey
        ),
        cells AS (
            SELECT segment, price_band,
                   CAST(SUM(t) AS BIGINT) AS n_treated,
                   CAST(SUM(1 - t) AS BIGINT) AS n_control,
                   CAST(SUM(t * y) AS BIGINT) AS y_treated,
                   CAST(SUM((1 - t) * y) AS BIGINT) AS y_control
            FROM units GROUP BY segment, price_band
        )
        SELECT segment, price_band, n_treated, n_control,
               y_treated, y_control,
               CASE WHEN n_treated > 0 THEN
                   CAST(y_treated AS DOUBLE) / CAST(n_treated AS DOUBLE)
               END AS rate_treated,
               CASE WHEN n_control > 0 THEN
                   CAST(y_control AS DOUBLE) / CAST(n_control AS DOUBLE)
               END AS rate_control,
               CASE WHEN n_treated > 0 AND n_control > 0 THEN
                   CAST(y_treated AS DOUBLE) / CAST(n_treated AS DOUBLE)
                   - CAST(y_control AS DOUBLE) / CAST(n_control AS DOUBLE)
               END AS att_cell,
               n_treated > 0 AND n_control > 0 AS matched,
               y_treated * n_control > y_control * n_treated
                   AS treated_return_more
        FROM cells
        ORDER BY segment, price_band
    """,
    doc="""Coarsened-exact-matching (CEM, Iacus/King/Porro 2012) causal
    effect census: does urgent order priority change the probability
    the order comes back returned, controlling for market segment and
    order size?  Units are orders; treatment = priority in
    {1-URGENT, 2-HIGH}; outcome = any lineitem with returnflag 'R';
    confounders are COARSENED into exact-match cells (segment x $25k
    price band off the exact cent grid) — the distributed-native
    matching estimator: no per-unit nearest-neighbor search, no
    propensity model, just one census at cell grain.  Per cell:
    treated/control counts, outcome sums and rates, the cell-level
    effect (att_cell; ATT = sum over matched cells weighted by
    n_treated — left to the reader so no float crosses rows), a
    matched flag (cells missing either arm carry no causal signal and
    are pruned by CEM's definition), and an EXACT cross-multiplied
    per-cell direction verdict (y_t * n_c > y_c * n_t — integer
    arithmetic, no division).

    Cross-engine exactness: every aggregate is a BIGINT count; rates
    and att_cell are single fixed-order divisions; the direction
    verdict never touches floats.

    Scale: one orderkey-grain aggregate over lineitem (map-side
    combine to the outcome bit), one shuffle join to orders (both
    sides partitioned by orderkey — colocatable via bucketing), a
    customer join whose strategy AQE picks by measured size (customer
    is SF-proportional), then a hash aggregate down to ~100 cells.
    State is O(cells), never O(units); the coarsening grid is the
    bias/variance knob exactly as in the CEM literature.""",
)
def causal_cem_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.functions.exact import scaled_long

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    returned = li.groupBy("l_orderkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("y")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    units = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(returned, o.o_orderkey == returned.l_orderkey, "left")
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.floor(
                scaled_long(F.col("o_totalprice"), 100) / F.lit(2500000)
            )
            .cast("bigint")
            .alias("price_band"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(0)
            .alias("t"),
            F.coalesce("y", F.lit(0).cast("bigint")).alias("y"),
        )
    )
    cells = units.groupBy("segment", "price_band").agg(
        F.sum("t").cast("bigint").alias("n_treated"),
        F.sum(F.lit(1) - F.col("t")).cast("bigint").alias("n_control"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("y_treated"),
        F.sum((F.lit(1) - F.col("t")) * F.col("y"))
        .cast("bigint")
        .alias("y_control"),
    )
    rate_t = F.when(
        F.col("n_treated") > 0,
        F.col("y_treated").cast("double") / F.col("n_treated").cast("double"),
    )
    rate_c = F.when(
        F.col("n_control") > 0,
        F.col("y_control").cast("double") / F.col("n_control").cast("double"),
    )
    return cells.select(
        "segment",
        "price_band",
        "n_treated",
        "n_control",
        "y_treated",
        "y_control",
        rate_t.alias("rate_treated"),
        rate_c.alias("rate_control"),
        F.when(
            (F.col("n_treated") > 0) & (F.col("n_control") > 0),
            F.col("y_treated").cast("double")
            / F.col("n_treated").cast("double")
            - F.col("y_control").cast("double")
            / F.col("n_control").cast("double"),
        ).alias("att_cell"),
        ((F.col("n_treated") > 0) & (F.col("n_control") > 0)).alias(
            "matched"
        ),
        (
            F.col("y_treated") * F.col("n_control")
            > F.col("y_control") * F.col("n_treated")
        ).alias("treated_return_more"),
    ).orderBy("segment", "price_band")


# --- ABC (Pareto) classification --------------------------------------------


@register(
    "orders_abc_classification",
    oracle="""
        WITH rev AS (
            SELECT l_partkey AS partkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                       * 10000) AS BIGINT)) AS BIGINT)
                       AS rev
            FROM lineitem GROUP BY 1
        ),
        ranked AS (
            SELECT partkey, rev,
                   CAST(SUM(rev) OVER (ORDER BY rev DESC, partkey)
                        AS BIGINT) AS cum,
                   CAST(SUM(rev) OVER () AS BIGINT) AS tot,
                   CAST(row_number() OVER (ORDER BY rev DESC, partkey)
                        AS BIGINT) AS rnk
            FROM rev
        )
        SELECT CASE WHEN 5 * cum <= 4 * tot THEN 'A'
                    WHEN 20 * cum <= 19 * tot THEN 'B'
                    ELSE 'C' END AS abc_class,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(rev) AS BIGINT) AS class_rev,
               MIN(rnk) AS first_rank, MAX(rnk) AS last_rank
        FROM ranked GROUP BY 1 ORDER BY 1
    """,
    doc="""ABC (Pareto) inventory classification: parts ranked by
    discounted revenue, classified by cumulative share — A while the
    running total is within 80% of revenue, B to 95%, C for the tail
    (the classic 80/15/5 split, tested with the exact
    cross-multiplications 5*cum <= 4*tot and 20*cum <= 19*tot on
    BIGINT revenue in 1/100-cent units).  Emits the three classes
    with part counts, revenue mass, and rank spans — the table a
    supply-chain pipeline uses to tier stocking policies.

    Scale: the part dimension is data-sized (10^8+ at 100 TB), so the
    global revenue order comes from plans/ranking.two_phase_rank —
    value-bucketed rank + prefix sum, NO single-partition window
    anywhere (the operator exists largely to exercise that machinery
    on a cumulative-share workload); the class census is one hash
    aggregate on the ranked output.  checkpoint_input=True because the
    input is itself an aggregate the helper reads three times.""",
)
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            ).cast("long")
        )
        .cast("bigint")
        .alias("rev")
    )
    ranked = two_phase_rank(
        rev,
        "rev",
        [F.col("rev").desc(), F.col("partkey")],
        descending=True,
        row_number_col="rnk",
        prefix_sum=("cum", "rev"),
        checkpoint_input=True,
    )
    tot = rev.agg(F.sum("rev").cast("bigint").alias("tot"))
    cls = F.when(
        5 * F.col("cum") <= 4 * F.col("tot"), "A"
    ).when(20 * F.col("cum") <= 19 * F.col("tot"), "B").otherwise("C")
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(cls.alias("abc_class"), "rev", F.col("rnk").cast("bigint").alias("rnk"))
        .groupBy("abc_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("rev").cast("bigint").alias("class_rev"),
            F.min("rnk").alias("first_rank"),
            F.max("rnk").alias("last_rank"),
        )
        .orderBy("abc_class")
    )


# --- Customer segment migration matrix ---------------------------------------


@register(
    "orders_segment_migration",
    oracle="""
        WITH o AS (
            SELECT o_custkey AS cust,
                   epoch_us(o_orderdate) // 86400000000 AS day_id,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        b AS (SELECT (MIN(day_id) + MAX(day_id)) // 2 AS mid FROM o),
        per AS (
            SELECT cust,
                   CASE WHEN day_id <= (SELECT mid FROM b)
                        THEN 1 ELSE 2 END AS period,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(cents) // 100 AS BIGINT) AS rev_dollars
            FROM o GROUP BY 1, 2
        ),
        gn AS (
            SELECT period, n_orders AS v, CAST(COUNT(*) AS BIGINT) AS c
            FROM per GROUP BY 1, 2
        ),
        gr AS (
            SELECT period, rev_dollars AS v, CAST(COUNT(*) AS BIGINT) AS c
            FROM per GROUP BY 1, 2
        ),
        medn AS (
            SELECT period, CAST(MIN(CASE WHEN cw * 2 >= n THEN v END)
                                AS BIGINT) AS med_n
            FROM (SELECT period, v, c,
                         SUM(c) OVER (PARTITION BY period ORDER BY v) AS cw,
                         SUM(c) OVER (PARTITION BY period) AS n
                  FROM gn)
            GROUP BY period
        ),
        medr AS (
            SELECT period, CAST(MIN(CASE WHEN cw * 2 >= n THEN v END)
                                AS BIGINT) AS med_rev
            FROM (SELECT period, v, c,
                         SUM(c) OVER (PARTITION BY period ORDER BY v) AS cw,
                         SUM(c) OVER (PARTITION BY period) AS n
                  FROM gr)
            GROUP BY period
        ),
        quad AS (
            SELECT p.cust, p.period,
                   (CASE WHEN p.n_orders >= mn.med_n
                         THEN 'F+' ELSE 'f-' END ||
                    CASE WHEN p.rev_dollars >= mr.med_rev
                         THEN 'M+' ELSE 'm-' END) AS quadrant
            FROM per p
            JOIN medn mn ON mn.period = p.period
            JOIN medr mr ON mr.period = p.period
        )
        SELECT q1.quadrant AS quadrant_from, q2.quadrant AS quadrant_to,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM quad q1 JOIN quad q2 ON q2.cust = q1.cust
        WHERE q1.period = 1 AND q2.period = 2
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="""Customer segment migration matrix — the period-over-period
    CRM table orders_rfm_segments can't give (RFM scores a snapshot;
    retention strategy needs the FLOW between segments): customers are
    placed in frequency x monetary quadrants per half of the order
    span (above/below the period's own type-1 medians), and the 4x4
    matrix counts who moved where.  The off-diagonal mass is the
    churn-risk / win-back signal (measured on the fixture: ~17% of
    period-1 top-quadrant customers collapse to the bottom quadrant).

    Determinism: the period boundary is integer midpoint arithmetic on
    epoch-days; both medians are cross-multiplied type-1 selections;
    revenue quadrants live on the exact DOLLAR grid.

    Scale: per-period medians are selected on the bounded VALUE
    DOMAINS (distinct order counts; distinct dollar totals), never on
    customer-grain windows — the same domain-grain convention as
    agg_weighted_median; the period-to-period pairing is one
    customer-keyed conditional-aggregate pivot (r13: was a q1 x q2
    self-join — the pivot needs one exchange instead of two plus the
    join).""",
)
def orders_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.catalog import managed_persist

    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        # TZ-FREE epoch-day: datediff on DATE never consults the session
        # time zone (unix_micros(CAST(date AS TIMESTAMP)) would shift the
        # split boundary on a non-UTC driver session)
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("day_id"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    bounds = o.agg(
        F.expr("(MIN(day_id) + MAX(day_id)) DIV 2").alias("mid")
    )
    per = managed_persist(
        f"orders_segment_migration:per:{sf_dir}",
        o.crossJoin(F.broadcast(bounds))
        .select(
            "cust",
            F.when(F.col("day_id") <= F.col("mid"), 1).otherwise(2).alias(
                "period"
            ),
            "cents",
        )
        .groupBy("cust", "period")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.expr("CAST(SUM(cents) DIV 100 AS BIGINT)").alias("rev_dollars"),
        ),
    )

    def domain_median(col: str, out: str):
        g = per.groupBy("period", F.col(col).alias("v")).agg(
            F.count("*").cast("bigint").alias("c")
        )
        wc = (
            Window.partitionBy("period")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wt = Window.partitionBy("period")
        cum = g.select(
            "period",
            "v",
            F.sum("c").over(wc).alias("cw"),
            F.sum("c").over(wt).alias("n"),
        )
        return cum.groupBy("period").agg(
            F.min(F.when(2 * F.col("cw") >= F.col("n"), F.col("v")))
            .cast("bigint")
            .alias(out)
        )

    medn = domain_median("n_orders", "med_n")
    medr = domain_median("rev_dollars", "med_rev")
    quad = (
        per.join(F.broadcast(medn), "period")
        .join(F.broadcast(medr), "period")
        .select(
            "cust",
            "period",
            F.concat(
                F.when(F.col("n_orders") >= F.col("med_n"), "F+").otherwise(
                    "f-"
                ),
                F.when(
                    F.col("rev_dollars") >= F.col("med_rev"), "M+"
                ).otherwise("m-"),
            ).alias("quadrant"),
        )
    )
    # period pivot as ONE conditional aggregate instead of the q1 x q2
    # self-join: cust appears at most once per period, so inner-join
    # semantics == both pivot cells non-null — one exchange on cust
    # replaces two join-input exchanges + the join (r13 interleaved
    # min-of-3 3.54s -> 2.75s, results row-identical).
    paired = (
        quad.groupBy("cust")
        .agg(
            F.max(F.when(F.col("period") == 1, F.col("quadrant"))).alias(
                "quadrant_from"
            ),
            F.max(F.when(F.col("period") == 2, F.col("quadrant"))).alias(
                "quadrant_to"
            ),
        )
        .where(
            F.col("quadrant_from").isNotNull()
            & F.col("quadrant_to").isNotNull()
        )
    )
    return (
        paired.groupBy("quadrant_from", "quadrant_to")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("quadrant_from", "quadrant_to")
    )
