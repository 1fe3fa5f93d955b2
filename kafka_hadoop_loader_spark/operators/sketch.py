"""Mergeable-sketch operators with EXACT cross-engine portability:
Count-Min heavy-hitter estimation and a DIY HyperLogLog.

Sketches are the 100 TB answer to "distinct/frequency at interactive
cost": integer counter arrays that merge associatively, so map-side
combine does almost all the work and the final state is KB-sized.
Spark ships approx_count_distinct (HLL++) whose binary is not
oracle-comparable (SURVEY §2: approx_distinct stays rows-only); these
two operators instead build the sketches from the PORTABLE md5 hash
family (pipeline.sample_hash_split's), so every counter, register, and
estimate is bit-identical in DuckDB — the sketch itself becomes
oracle-checkable, estimates included.

Family tour completed by these two: bitmap (agg_bitmap_presence,
exact-membership), bloom (bloom_filter_probe, membership-with-FP),
CMS (frequency, overestimate-only), HLL (cardinality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.registry import register

_PHASH = "CAST(CONV(SUBSTRING(MD5({x}), 1, 15), 16, 10) AS BIGINT)"
_PHASH_DUCK = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"

_CMS_W = 1024  # counters per row
_CMS_D = 4  # hash rows


@register(
    "sketch_cms_heavy_hitters",
    oracle=f"""
        WITH items AS (
            SELECT CAST(l_partkey AS VARCHAR) AS key FROM lineitem
        ),
        hashed AS (
            SELECT key, j,
                   {_PHASH_DUCK.format(x="key || '|cms' || CAST(j AS VARCHAR)")} % {_CMS_W} AS col
            FROM items, unnest([0, 1, 2, 3]) AS u(j)
        ),
        cms AS (
            SELECT j, col, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM hashed GROUP BY j, col
        ),
        truth AS (
            SELECT key, CAST(COUNT(*) AS BIGINT) AS true_cnt
            FROM items GROUP BY key
            ORDER BY true_cnt DESC, key
            LIMIT 10
        ),
        probes AS (
            SELECT t.key, t.true_cnt, u.j,
                   {_PHASH_DUCK.format(x="t.key || '|cms' || CAST(u.j AS VARCHAR)")} % {_CMS_W} AS col
            FROM truth t, unnest([0, 1, 2, 3]) AS u(j)
        )
        SELECT p.key AS key, p.true_cnt AS true_cnt,
               CAST(MIN(c.cnt) AS BIGINT) AS est_cnt,
               CAST(MIN(c.cnt) - p.true_cnt AS BIGINT) AS overcount
        FROM probes p JOIN cms c ON c.j = p.j AND c.col = p.col
        GROUP BY p.key, p.true_cnt
        ORDER BY true_cnt DESC, key
    """,
    doc="""Count-Min sketch (depth 4 × width 1024) over part-key
    frequencies, probed with the true top-10 keys: estimate = MIN of
    the key's 4 counters, with the CMS guarantee est ≥ true surfaced as
    an exact `overcount` column.  Counters are plain integer sums over
    portable-hash cells, so sketch AND estimates hash-match DuckDB.

    Scale: per-partition partials ARE CMS sketches and merge by
    cell-wise +, so a 1000-executor build costs one ≤4096-row shuffle.
    The build here pre-counts per key before hashing (the hash cost
    drops from |rows|×depth to |keys|×depth md5s, measured 5x at
    sf0.1, and the key-count exchange is shared with the truth side);
    when the key space itself is huge, skip the pre-count and hash rows
    directly — both forms produce the identical sketch.  Probing joins
    the 10 probe keys' 40 cells against the broadcast sketch.
    approx_distinct's HLL++ binary can't be oracle-compared; this CMS
    is the same sketch discipline made engine-portable.""",
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    items = li.select(F.col("l_partkey").cast("string").alias("key"))
    js = F.array(*[F.lit(j) for j in range(_CMS_D)])
    hcol = _PHASH.format(x="key || '|cms' || CAST(j AS STRING)")
    # count per key FIRST, then hash only the distinct keys: cell count
    # = Σ per-key counts landing in the cell, identical to hashing every
    # row but with |keys| md5 evaluations instead of |rows|×depth
    # (measured ~5x at sf0.1: 4.95s -> 1.02s), and the key-count exchange is shared with
    # the truth side (ReusedExchange).
    keycnt = items.groupBy("key").agg(F.count("*").alias("true_cnt"))
    hashed = keycnt.select("key", "true_cnt", F.explode(js).alias("j")).selectExpr(
        "key", "true_cnt", "j", f"{hcol} % {_CMS_W} AS col"
    )
    cms = hashed.groupBy("j", "col").agg(F.sum("true_cnt").alias("cnt"))
    truth = keycnt.orderBy(F.col("true_cnt").desc(), "key").limit(10)
    probes = truth.select("key", "true_cnt", F.explode(js).alias("j")).selectExpr(
        "key", "true_cnt", "j", f"{hcol} % {_CMS_W} AS col"
    )
    return (
        probes.join(F.broadcast(cms), ["j", "col"])
        .groupBy("key", "true_cnt")
        .agg(
            F.min("cnt").alias("est_cnt"),
            (F.min("cnt") - F.col("true_cnt")).alias("overcount"),
        )
        .orderBy(F.col("true_cnt").desc(), "key")
    )


_HLL_M = 64  # buckets
_HLL_ALPHA = 0.709  # alpha_64 constant
_HLL_SCALE_EXP = 54  # term = 2^(54 - min(rank,54)); 64*2^53 < 2^63


@register(
    "sketch_hll_distinct",
    oracle=f"""
        WITH keys AS (
            SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS key FROM orders
        ),
        hashed AS (
            SELECT key,
                   {_PHASH_DUCK.format(x="key || '|hb'")} % {_HLL_M} AS bucket,
                   substr(md5(key || '|hw'), 1, 15) AS h
            FROM keys
        ),
        ranked AS (
            SELECT bucket,
                   4 * length(regexp_extract(h, '^(0*)', 1))
                   + CASE substr(h, length(regexp_extract(h, '^(0*)', 1)) + 1, 1)
                         WHEN '1' THEN 3
                         WHEN '2' THEN 2 WHEN '3' THEN 2
                         WHEN '4' THEN 1 WHEN '5' THEN 1
                         WHEN '6' THEN 1 WHEN '7' THEN 1
                         ELSE 0
                     END + 1 AS rank
            FROM hashed
        ),
        regs AS (
            SELECT bucket, CAST(MAX(LEAST(rank, {_HLL_SCALE_EXP})) AS BIGINT) AS reg
            FROM ranked GROUP BY bucket
        ),
        summed AS (
            SELECT CAST(SUM(CAST(1 AS BIGINT) << CAST({_HLL_SCALE_EXP} - reg AS INTEGER)) AS BIGINT)
                       AS s_present,
                   CAST(COUNT(*) AS BIGINT) AS m_present
            FROM regs
        ),
        truth AS (
            SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_true FROM orders
        )
        SELECT t.n_true AS n_true,
               s.m_present AS m_present,
               ({_HLL_ALPHA} * {_HLL_M} * {_HLL_M})
               * (CAST(1 AS BIGINT) << {_HLL_SCALE_EXP})
               / (CAST(s.s_present AS DOUBLE)
                  + CAST({_HLL_M} - s.m_present AS DOUBLE)
                    * CAST(CAST(1 AS BIGINT) << {_HLL_SCALE_EXP} AS DOUBLE))
                   AS hll_estimate
        FROM summed s CROSS JOIN truth t
    """,
    doc="""DIY HyperLogLog (m=64) cardinality estimate of distinct
    customers, fully oracle-checkable: bucket and value hashes come
    from the portable md5 family; the rank (leading-zero count + 1 of
    the 60-bit value hash) is derived from the HEX STRING with string
    ops both engines share; registers are integer MAX per bucket; and
    the harmonic-mean denominator Σ 2^(-reg) is computed as the exact
    integer Σ 2^(54-reg) (empty buckets contribute 2^54 via the
    m_present complement), so even the floating estimate is built from
    exact integers with identical expression text.

    Scale: this IS the production distinct-count layout — per-partition
    (bucket → max rank) partials of 64 integers merge by cell-wise MAX;
    the raw-bits reason approx_count_distinct can't be oracle-compared
    is the only thing this trades away (raw estimate quality: HLL++
    bias correction is omitted; at n >> m the plain HLL formula is the
    right regime).  One hash aggregate + one 64-row reduce.""",
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    keys = o.select(F.col("o_custkey").cast("string").alias("key")).distinct()
    hb = _PHASH.format(x="key || '|hb'")
    hashed = keys.selectExpr(
        f"{hb} % {_HLL_M} AS bucket",
        "SUBSTRING(MD5(key || '|hw'), 1, 15) AS h",
    )
    zeros = "length(regexp_extract(h, '^(0*)', 1))"
    ranked = hashed.selectExpr(
        "bucket",
        f"""4 * {zeros}
            + CASE SUBSTRING(h, {zeros} + 1, 1)
                  WHEN '1' THEN 3
                  WHEN '2' THEN 2 WHEN '3' THEN 2
                  WHEN '4' THEN 1 WHEN '5' THEN 1
                  WHEN '6' THEN 1 WHEN '7' THEN 1
                  ELSE 0
              END + 1 AS rank""",
    )
    regs = ranked.groupBy("bucket").agg(
        F.expr(f"CAST(MAX(LEAST(rank, {_HLL_SCALE_EXP})) AS BIGINT)").alias("reg")
    )
    summed = regs.agg(
        F.expr(
            f"CAST(SUM(CAST(1 AS BIGINT) << CAST({_HLL_SCALE_EXP} - reg AS INT)) AS BIGINT)"
        ).alias("s_present"),
        F.count("*").alias("m_present"),
    )
    truth = o.agg(F.countDistinct("o_custkey").alias("n_true"))
    est = (
        f"({_HLL_ALPHA} * {_HLL_M} * {_HLL_M})"
        f" * (CAST(1 AS BIGINT) << {_HLL_SCALE_EXP})"
        f" / (CAST(s_present AS DOUBLE)"
        f" + CAST({_HLL_M} - m_present AS DOUBLE)"
        f" * CAST(CAST(1 AS BIGINT) << {_HLL_SCALE_EXP} AS DOUBLE))"
    )
    return summed.join(F.broadcast(truth)).selectExpr(
        "n_true", "m_present", f"{est} AS hll_estimate"
    )


@register(
    "sketch_hll_merge_partitioned",
    oracle=f"""
        WITH keys AS (
            SELECT DISTINCT event_type AS part,
                   CAST(user_id AS VARCHAR) AS key
            FROM events
        ),
        hashed AS (
            SELECT part, key,
                   {_PHASH_DUCK.format(x="key || '|hb'")} % {_HLL_M} AS bucket,
                   substr(md5(key || '|hw'), 1, 15) AS h
            FROM keys
        ),
        ranked AS (
            SELECT part, bucket,
                   4 * length(regexp_extract(h, '^(0*)', 1))
                   + CASE substr(h, length(regexp_extract(h, '^(0*)', 1)) + 1, 1)
                         WHEN '1' THEN 3
                         WHEN '2' THEN 2 WHEN '3' THEN 2
                         WHEN '4' THEN 1 WHEN '5' THEN 1
                         WHEN '6' THEN 1 WHEN '7' THEN 1
                         ELSE 0
                     END + 1 AS rank
            FROM hashed
        ),
        part_regs AS (
            SELECT part, bucket,
                   CAST(MAX(LEAST(rank, {_HLL_SCALE_EXP})) AS BIGINT) AS reg
            FROM ranked GROUP BY part, bucket
        ),
        merged_regs AS (
            SELECT bucket, CAST(MAX(reg) AS BIGINT) AS reg
            FROM part_regs GROUP BY bucket
        ),
        all_regs AS (
            SELECT part, bucket, reg FROM part_regs
            UNION ALL
            SELECT '(merged)' AS part, bucket, reg FROM merged_regs
        ),
        summed AS (
            SELECT part,
                   CAST(SUM(CAST(1 AS BIGINT)
                            << CAST({_HLL_SCALE_EXP} - reg AS INTEGER)) AS BIGINT)
                       AS s_present,
                   CAST(COUNT(*) AS BIGINT) AS m_present
            FROM all_regs GROUP BY part
        ),
        truth AS (
            SELECT event_type AS part,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true
            FROM events GROUP BY event_type
            UNION ALL
            SELECT '(merged)' AS part,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true
            FROM events
        )
        SELECT t.part AS part, t.n_true AS n_true, s.m_present AS m_present,
               ({_HLL_ALPHA} * {_HLL_M} * {_HLL_M})
               * (CAST(1 AS BIGINT) << {_HLL_SCALE_EXP})
               / (CAST(s.s_present AS DOUBLE)
                  + CAST({_HLL_M} - s.m_present AS DOUBLE)
                    * CAST(CAST(1 AS BIGINT) << {_HLL_SCALE_EXP} AS DOUBLE))
                   AS hll_estimate
        FROM summed s JOIN truth t ON s.part = t.part
        ORDER BY part
    """,
    doc="""HLL sketch MERGEABILITY — the property that makes sketches
    the 100 TB answer: per-partition (event_type) register sets are
    built independently, then the GLOBAL distinct-user estimate comes
    from a cell-wise MAX merge of the partial registers, never
    re-touching the raw data.  Output: one row per partition plus the
    '(merged)' row, each with its exact truth and its HLL estimate —
    demonstrating that merge(sketch(A), sketch(B)) = sketch(A ∪ B)
    holds bit-exactly in both engines (same md5-derived portable hash
    family and integer register algebra as sketch_hll_distinct).

    Scale: this is exactly the two-level distinct-count topology of a
    1000-executor job — map-side per-partition registers (64 ints),
    one tiny shuffle of registers, cell-MAX reduce; also the layout for
    pre-aggregated daily sketches merged across arbitrary date ranges
    (count distinct users last N days without rescanning N days).""",
)
def sketch_hll_merge_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    keys = (
        e.select(F.col("event_type").alias("part"), F.col("user_id").cast("string").alias("key"))
        .distinct()
    )
    hb = _PHASH.format(x="key || '|hb'")
    hashed = keys.selectExpr(
        "part",
        f"{hb} % {_HLL_M} AS bucket",
        "SUBSTRING(MD5(key || '|hw'), 1, 15) AS h",
    )
    zeros = "length(regexp_extract(h, '^(0*)', 1))"
    ranked = hashed.selectExpr(
        "part",
        "bucket",
        f"""4 * {zeros}
            + CASE SUBSTRING(h, {zeros} + 1, 1)
                  WHEN '1' THEN 3
                  WHEN '2' THEN 2 WHEN '3' THEN 2
                  WHEN '4' THEN 1 WHEN '5' THEN 1
                  WHEN '6' THEN 1 WHEN '7' THEN 1
                  ELSE 0
              END + 1 AS rank""",
    )
    part_regs = ranked.groupBy("part", "bucket").agg(
        F.expr(f"CAST(MAX(LEAST(rank, {_HLL_SCALE_EXP})) AS BIGINT)").alias("reg")
    )
    merged_regs = part_regs.groupBy("bucket").agg(
        F.max("reg").cast("bigint").alias("reg")
    ).select(F.lit("(merged)").alias("part"), "bucket", "reg")
    all_regs = part_regs.unionByName(merged_regs)
    summed = all_regs.groupBy("part").agg(
        F.expr(
            f"CAST(SUM(CAST(1 AS BIGINT) << CAST({_HLL_SCALE_EXP} - reg AS INT)) AS BIGINT)"
        ).alias("s_present"),
        F.count("*").alias("m_present"),
    )
    truth = (
        e.groupBy(F.col("event_type").alias("part"))
        .agg(F.countDistinct("user_id").alias("n_true"))
        .unionByName(
            e.agg(F.countDistinct("user_id").alias("n_true")).select(
                F.lit("(merged)").alias("part"), "n_true"
            )
        )
    )
    est = (
        f"({_HLL_ALPHA} * {_HLL_M} * {_HLL_M})"
        f" * (CAST(1 AS BIGINT) << {_HLL_SCALE_EXP})"
        f" / (CAST(s_present AS DOUBLE)"
        f"    + CAST({_HLL_M} - m_present AS DOUBLE)"
        f"      * CAST(CAST(1 AS BIGINT) << {_HLL_SCALE_EXP} AS DOUBLE))"
    )
    return (
        summed.join(truth, "part")
        .selectExpr("part", "n_true", "m_present", f"{est} AS hll_estimate")
        .orderBy("part")
    )


# --- t-digest: mergeable quantile sketch -------------------------------

_TD_DELTA = 256  # compression: max centroids per digest
_TD_BUCKETS = 64  # deterministic sub-groups sketched independently
# (quantile, lo, hi) rank envelopes in integer hundredths: the estimate
# must land between the exact type-1 quantiles at q∓2%.
# (label, nominal q in hundredths, lo, hi): the estimate interpolates
# the NOMINAL quantile and must land between the exact type-1
# quantiles at the (possibly asymmetric, clipped-at-100) envelope.
_TD_ENVELOPES = (("p50", 50, 48, 52), ("p90", 90, 88, 92), ("p99", 99, 97, 100))


def _td_compress(means, weights, total, delta):
    """One merging-digest compression pass over centroids sorted by
    mean: greedily merge neighbors while the merged weight respects the
    k0 size bound 4·total·q(1-q)/delta (small near the tails, large in
    the middle — tails stay near-exact), floored at total/delta so the
    tails cannot fragment into unbounded singletons: centroid count
    stays <= ~2·delta.  Deterministic for a given sorted input."""
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w, seen = float(means[0]), float(weights[0]), 0.0
    for m, w in zip(means[1:], weights[1:]):
        m, w = float(m), float(w)
        q = (seen + cur_w / 2.0) / total
        limit = max(4.0 * total * q * (1.0 - q) / delta, total / delta, 1.0)
        if cur_w + w <= limit:
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            seen += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return out_m, out_w


def _td_quantile(means, weights, q):
    """Interpolated quantile from centroid (mean, weight) pairs sorted
    by mean — the standard t-digest cumulative-midpoint interpolation."""
    total = sum(weights)
    target = q * total
    cum = 0.0
    for i, w in enumerate(weights):
        mid = cum + w / 2.0
        if target <= mid:
            if i == 0:
                return means[0]
            prev_mid = cum - weights[i - 1] / 2.0
            frac = (target - prev_mid) / (mid - prev_mid)
            return means[i - 1] + frac * (means[i] - means[i - 1])
        cum += w
    return means[-1]


@register(
    "quantiles_tdigest",
    oracle=f"""
        WITH r AS (
            SELECT l_returnflag, l_extendedprice,
                   CAST(row_number() OVER (
                       PARTITION BY l_returnflag ORDER BY l_extendedprice
                   ) AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY l_returnflag)
                        AS BIGINT) AS n
            FROM lineitem
        ),
        bounds AS (
            SELECT l_returnflag AS returnflag, q.qlabel, MAX(n) AS n,
                   MAX(CASE WHEN rn = GREATEST((n * q.lo + 99) // 100, 1)
                            THEN l_extendedprice END) AS lo_bound,
                   MAX(CASE WHEN rn = LEAST((n * q.hi + 99) // 100, n)
                            THEN l_extendedprice END) AS hi_bound
            FROM r CROSS JOIN (VALUES {", ".join(f"('{ql}', {lo}, {hi})" for ql, _, lo, hi in _TD_ENVELOPES)})
                 AS q(qlabel, lo, hi)
            GROUP BY returnflag, q.qlabel
        )
        SELECT returnflag, qlabel, n, lo_bound, hi_bound,
               TRUE AS within_rank_envelope
        FROM bounds
        ORDER BY returnflag, qlabel
    """,
    doc="""Mergeable t-digest quantile sketch (Dunning's merging-digest
    form) — the distributed-quantiles answer when exact rank-by-window
    is too expensive and a sketch must MERGE across partitions/days:
    each deterministic sub-group (l_orderkey % 64) compresses its
    values into <= 256 (mean, weight) centroids under the k0 scale
    bound via applyInPandas; a second applyInPandas concatenates each
    group's centroids (sorted — deterministic), re-compresses, and
    interpolates p50/p90/p99.  Estimates are floats no oracle can
    reproduce, so the contract is the approx_distinct envelope
    pattern: the query emits the EXACT type-1 quantile bounds at
    q∓2% rank (quantiles_exact's integer rank selection) plus a
    boolean asserting the t-digest estimate landed inside; the oracle
    computes the same bounds and expects TRUE.  A drifting sketch
    flips the boolean and hash-fails.

    Scale: stage 1 is embarrassingly parallel per (flag, bucket);
    stage 2 merges 64 x 256 centroid rows per flag — KB-sized, the
    associative-merge property that lets the same sketch roll up
    hourly -> daily -> monthly without touching raw data again.  The
    exact-bounds branch exists only for the correctness contract; at
    100 TB you ship the sketch alone.""",
)
def quantiles_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_extendedprice"
    )

    def sketch_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["l_extendedprice"].sort_values().to_numpy()
        if len(v) == 0:
            return pd.DataFrame(columns=["l_returnflag", "mean", "weight"])
        m, w = _td_compress(v, [1.0] * len(v), float(len(v)), _TD_DELTA)
        return pd.DataFrame(
            {"l_returnflag": pdf["l_returnflag"].iloc[0], "mean": m, "weight": w}
        )

    centroids = (
        li.withColumn("bucket", F.col("l_orderkey") % _TD_BUCKETS)
        .groupBy("l_returnflag", "bucket")
        .applyInPandas(
            sketch_bucket, schema="l_returnflag string, mean double, weight double"
        )
    )

    def merge_flag(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["mean", "weight"]).reset_index(drop=True)
        total = float(pdf["weight"].sum())
        m, w = _td_compress(
            pdf["mean"].to_numpy(), pdf["weight"].to_numpy(), total, _TD_DELTA
        )
        return pd.DataFrame(
            {
                "returnflag": pdf["l_returnflag"].iloc[0],
                "qlabel": [ql for ql, _, _, _ in _TD_ENVELOPES],
                "est": [
                    _td_quantile(m, w, q / 100.0)
                    for _, q, _, _ in _TD_ENVELOPES
                ],
            }
        )

    ests = centroids.groupBy("l_returnflag").applyInPandas(
        merge_flag, schema="returnflag string, qlabel string, est double"
    )

    wr = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wn = Window.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(wr).cast("long").alias("rn"),
        F.count("*").over(wn).cast("long").alias("n"),
    )
    env = spark.createDataFrame(
        [(ql, lo, hi) for ql, _, lo, hi in _TD_ENVELOPES],
        "qlabel string, lo long, hi long",
    )
    bounds = (
        r.crossJoin(F.broadcast(env))
        .groupBy(F.col("l_returnflag").alias("returnflag"), "qlabel")
        .agg(
            F.max("n").alias("n"),
            F.max(
                F.when(
                    F.col("rn")
                    == F.greatest(
                        F.expr("(n * lo + 99) DIV 100"), F.lit(1).cast("long")
                    ),
                    F.col("l_extendedprice"),
                )
            ).alias("lo_bound"),
            F.max(
                F.when(
                    F.col("rn")
                    == F.least(F.expr("(n * hi + 99) DIV 100"), F.col("n")),
                    F.col("l_extendedprice"),
                )
            ).alias("hi_bound"),
        )
    )
    return (
        bounds.join(ests, ["returnflag", "qlabel"])
        .select(
            "returnflag",
            "qlabel",
            "n",
            "lo_bound",
            "hi_bound",
            (
                (F.col("est") >= F.col("lo_bound"))
                & (F.col("est") <= F.col("hi_bound"))
            ).alias("within_rank_envelope"),
        )
        .orderBy("returnflag", "qlabel")
    )


# --- KMV sketch: mergeable distinct + SET OPERATIONS -------------------

_KMV_K = 256
_KMV_SCALE = float(1 << 60)  # hash domain: 60-bit md5 prefix
_KMV_HASH_SQL = (
    "CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15))"
    " AS BIGINT)"
)


@register(
    "sketch_kmv_setops",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS in_a,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS in_b,
                   {_KMV_HASH_SQL} AS h
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY user_id
        ),
        ta AS (SELECT h FROM u WHERE in_a = 1 ORDER BY h, user_id
               LIMIT {_KMV_K}),
        tb AS (SELECT h FROM u WHERE in_b = 1 ORDER BY h, user_id
               LIMIT {_KMV_K}),
        tu AS (SELECT h, in_a, in_b FROM u ORDER BY h, user_id
               LIMIT {_KMV_K}),
        sa AS (SELECT MAX(h) AS uk, CAST(COUNT(*) AS BIGINT) AS n FROM ta),
        sb AS (SELECT MAX(h) AS uk, CAST(COUNT(*) AS BIGINT) AS n FROM tb),
        su AS (SELECT MAX(h) AS uk, CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(in_a * in_b) AS BIGINT) AS n_common
               FROM tu),
        ex AS (SELECT CAST(SUM(in_a) AS BIGINT) AS exact_a,
                      CAST(SUM(in_b) AS BIGINT) AS exact_b,
                      CAST(COUNT(*) AS BIGINT) AS exact_union,
                      CAST(SUM(in_a * in_b) AS BIGINT) AS exact_inter
               FROM u)
        SELECT CAST({_KMV_K} AS INTEGER) AS k,
               CASE WHEN sa.n < {_KMV_K} THEN CAST(sa.n AS DOUBLE)
                    ELSE CAST({_KMV_K - 1} AS DOUBLE) * {_KMV_SCALE}
                         / CAST(sa.uk AS DOUBLE) END AS est_a,
               ex.exact_a,
               CASE WHEN sb.n < {_KMV_K} THEN CAST(sb.n AS DOUBLE)
                    ELSE CAST({_KMV_K - 1} AS DOUBLE) * {_KMV_SCALE}
                         / CAST(sb.uk AS DOUBLE) END AS est_b,
               ex.exact_b,
               CASE WHEN su.n < {_KMV_K} THEN CAST(su.n AS DOUBLE)
                    ELSE CAST({_KMV_K - 1} AS DOUBLE) * {_KMV_SCALE}
                         / CAST(su.uk AS DOUBLE) END AS est_union,
               ex.exact_union,
               (CAST(su.n_common AS DOUBLE) / CAST({_KMV_K} AS DOUBLE))
                   * (CASE WHEN su.n < {_KMV_K} THEN CAST(su.n AS DOUBLE)
                           ELSE CAST({_KMV_K - 1} AS DOUBLE) * {_KMV_SCALE}
                                / CAST(su.uk AS DOUBLE) END)
                   AS est_inter,
               ex.exact_inter,
               CAST(su.n_common AS DOUBLE) / CAST({_KMV_K} AS DOUBLE)
                   AS jaccard_est
        FROM sa CROSS JOIN sb CROSS JOIN su CROSS JOIN ex
    """,
    doc=f"""KMV (k-minimum-values) distinct sketch with SET-OPERATION
    estimates — the capability HLL lacks: sketch_hll_distinct can union
    but never intersect, while the KMV synopsis (Beyer et al., "On
    synopses for distinct-value estimation under multiset operations",
    SIGMOD'07) supports union AND intersection from the same k-sized
    state.  Populations: users who click (A) vs users who purchase (B).
    Each sketch is the {_KMV_K} smallest portable-hash values of the
    population (distinct-user grain); DV estimate = (k-1)/U(k) with
    U(k) the k-th order statistic of the uniform hash, degenerating to
    the exact count when the population is smaller than k.  The
    union sketch is the k smallest of the merged population, and the
    intersection estimate is the within-sketch Jaccard (matching
    members among the union's k minima) scaled by the union estimate.
    Exact counts ride along as audit columns ("measure, don't guess"),
    so the result quantifies its own estimation error.

    Determinism: the hash is the salted md5 prefix (same convention as
    sample_hash_split), order statistics are integer, every estimate
    is a fixed-shape IEEE expression — bit-identical in both engines;
    boundary ties are broken by user_id in both.

    Scale: the per-population "k smallest" is TakeOrdered — each task
    keeps its local {_KMV_K} minima, the driver-free final merge sees
    only tasks x {_KMV_K} rows, never the population (exactly how the
    sketch would merge across 1000 executors or across daily
    partitions: KMV state is a mergeable {_KMV_K}-value set).  The
    audit columns are one extra hash aggregate; at 100 TB you would
    drop them and keep only the sketches.""",
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.operators.pipeline import _phash

    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "event_type")
    )
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("in_b"),
        )
        .withColumn(
            "h",
            _phash(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))),
        )
        # read 4x below; the shared groupBy exchange is reused by AQE,
        # and a lazy localCheckpoint here would cost a build-time job
        # (the no-action-at-construction rule, tests/test_plans.py)
    )

    def sketch(df):
        return df.orderBy("h", "user_id").limit(_KMV_K)

    kd = float(_KMV_K)
    km1 = float(_KMV_K - 1)

    def est(uk, n):
        return F.when(n < _KMV_K, n.cast("double")).otherwise(
            F.lit(km1) * F.lit(_KMV_SCALE) / uk.cast("double")
        )

    sa = sketch(u.where(F.col("in_a") == 1)).agg(
        F.max("h").alias("uk_a"), F.count(F.lit(1)).cast("bigint").alias("n_a")
    )
    sb = sketch(u.where(F.col("in_b") == 1)).agg(
        F.max("h").alias("uk_b"), F.count(F.lit(1)).cast("bigint").alias("n_b")
    )
    su = sketch(u).agg(
        F.max("h").alias("uk_u"),
        F.count(F.lit(1)).cast("bigint").alias("n_u"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_common"),
    )
    ex = u.agg(
        F.sum("in_a").cast("bigint").alias("exact_a"),
        F.sum("in_b").cast("bigint").alias("exact_b"),
        F.count(F.lit(1)).cast("bigint").alias("exact_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("exact_inter"),
    )
    est_union = est(F.col("uk_u"), F.col("n_u"))
    return (
        sa.crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(su))
        .crossJoin(F.broadcast(ex))
        .select(
            F.lit(_KMV_K).cast("int").alias("k"),
            est(F.col("uk_a"), F.col("n_a")).alias("est_a"),
            "exact_a",
            est(F.col("uk_b"), F.col("n_b")).alias("est_b"),
            "exact_b",
            est_union.alias("est_union"),
            "exact_union",
            (
                (F.col("n_common").cast("double") / F.lit(kd)) * est_union
            ).alias("est_inter"),
            "exact_inter",
            (F.col("n_common").cast("double") / F.lit(kd)).alias(
                "jaccard_est"
            ),
        )
    )
