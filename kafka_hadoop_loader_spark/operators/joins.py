"""Join operators (SURVEY.md §2.B Joins): inner/outer/semi/anti/broadcast/
cross/range/as-of.

The reference has no joins at all (map-only job); this is the engine's
new relational surface.  Every join is declared via the DataFrame API so
Catalyst picks the physical strategy (broadcast-hash for small dims,
sort-merge otherwise, AQE switching at runtime).

Scale notes per query in the docstrings; the general posture:
- bounded dims (region/nation) broadcast — zero shuffle of the fact
  side; SF-proportional sides (customer/supplier/part) carry NO hint,
  so AQE broadcasts them only while they measure under the threshold
  and shuffles them once they don't (tests/test_broadcast_hints.py
  enforces the no-hint rule);
- fact-fact joins shuffle on the join key; AQE handles skew;
- the as-of join deliberately avoids a range join: it's a union +
  last-non-null window, one shuffle + one sort, linear at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.functions.exact import exact_avg, exact_sum
from kafka_hadoop_loader_spark.registry import register


@register(
    "join_inner",
    oracle="""
        SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'O'
        ORDER BY o_orderkey
    """,
    doc="""Inner equi-join fact->dim. customer is small relative to
    orders: Catalyst/AQE picks broadcast-hash while customer measures
    under the threshold and falls back to sort-merge once it doesn't —
    at 100 TB customer is TB-scale and both sides shuffle on the key.
    No hint either way; the strategy is the planner's by size.""",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return (
        o.where(F.col("o_orderstatus") == "O")
        .join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "join_left_outer",
    oracle="""
        SELECT c_custkey,
               CAST(COUNT(o_orderkey) AS BIGINT) AS n_open_orders,
               COALESCE(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                             AS DOUBLE) / 100.0, 0.0) AS open_total
        FROM customer
        LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
          ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey
    """,
    doc="""Left outer join + aggregation: customers keep a row even with
    zero matching open orders (count=0, total=0).""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_open_orders"),
            F.coalesce(exact_sum(F.col("o_totalprice")), F.lit(0.0)).alias("open_total"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_right_outer",
    oracle="""
        SELECT p_partkey,
               CAST(COUNT(l_orderkey) AS BIGINT) AS n_lineitems,
               COALESCE(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT), 0)
                   AS total_qty
        FROM (SELECT * FROM lineitem WHERE l_returnflag = 'R') l
        RIGHT JOIN part ON l_partkey = p_partkey
        GROUP BY p_partkey
        ORDER BY p_partkey
    """,
    doc="Right outer join: every part appears, matched or not.",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    p = table(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey")
        .agg(
            F.count("l_orderkey").alias("n_lineitems"),
            F.coalesce(F.sum(F.col("l_quantity").cast("bigint")), F.lit(0)).alias(
                "total_qty"
            ),
        )
        .orderBy("p_partkey")
    )


@register(
    "join_full_outer",
    oracle="""
        WITH cust AS (
            SELECT c_nationkey AS nationkey, COUNT(*) AS n_rich_cust
            FROM customer WHERE c_acctbal > 9000 GROUP BY 1
        ),
        supp AS (
            SELECT s_nationkey AS nationkey, COUNT(*) AS n_rich_supp
            FROM supplier WHERE s_acctbal > 5000 GROUP BY 1
        )
        SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
               CAST(COALESCE(n_rich_cust, 0) AS BIGINT) AS n_rich_cust,
               CAST(COALESCE(n_rich_supp, 0) AS BIGINT) AS n_rich_supp
        FROM cust FULL OUTER JOIN supp USING (nationkey)
        ORDER BY nationkey
    """,
    doc="""Full outer join of two filtered aggregates; both sides have
    keys the other lacks, so both null-extension paths execute.""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cust = (
        c.where(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_rich_cust"))
    )
    supp = (
        s.where(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_rich_supp"))
    )
    return (
        cust.join(supp, "nationkey", "full")
        .select(
            "nationkey",
            F.coalesce("n_rich_cust", F.lit(0)).alias("n_rich_cust"),
            F.coalesce("n_rich_supp", F.lit(0)).alias("n_rich_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 400000)
        ORDER BY c_custkey
    """,
    doc="""Left semi join (EXISTS): no duplication of the left side, right
    side reduced to its keys — at scale this beats join+distinct.""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
    """,
    doc="""Left anti join (NOT IN over a non-null key): customers who never
    placed an URGENT order.""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "join_broadcast",
    oracle="""
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                             AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    doc="""Explicit broadcast-hash join — the operator demo for the one
    case a forced hint is right: a side the CALLER knows is bounded.
    broadcast() pins the zero-shuffle plan so the fact side never moves.
    Everywhere else in this engine an SF-proportional side (customer,
    supplier, part, per-key aggregates) carries NO hint — AQE picks
    broadcast from the measured size whenever the side actually fits,
    and falls back to shuffle when it doesn't, which a pinned hint
    cannot.  tests/test_plans.py asserts BroadcastHashJoin here.""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum(rev, 10000).alias("revenue"),
        )
        .orderBy("p_brand")
    )


@register(
    "join_cross",
    oracle="""
        SELECT r.r_name, n.n_name
        FROM region r CROSS JOIN nation n
        ORDER BY r.r_name, n.n_name
    """,
    doc="Cartesian product of two tiny dims (5 x 25): BroadcastNestedLoop.",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


@register(
    "join_range",
    oracle="""
        SELECT band,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(CAST(ROUND(p_retailprice * 10) AS BIGINT)) AS DOUBLE)
                   / (CAST(COUNT(p_retailprice) AS DOUBLE) * 10.0)
                   AS avg_price
        FROM part
        JOIN (VALUES ('budget', 0.0, 930.0),
                     ('mid',    930.0, 970.0),
                     ('premium', 970.0, 10000.0))
             AS bands(band, lo, hi)
          ON p_retailprice >= lo::DOUBLE AND p_retailprice < hi::DOUBLE
        GROUP BY band
        ORDER BY band
    """,
    doc="""Theta/range join against a literal band table (non-equi
    predicates only -> BroadcastNestedLoopJoin; the band side is 3 rows so
    the nested loop is effectively a broadcast map).  This is the banding
    pattern used at scale instead of per-row CASE pyramids.""",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 930.0), ("mid", 930.0, 970.0), ("premium", 970.0, 10000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            exact_avg(F.col("p_retailprice"), 10).alias("avg_price"),
        )
        .orderBy("band")
    )


@register(
    "join_asof",
    oracle="""
        WITH tagged AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
                   CASE WHEN event_type = 'click' THEN epoch_us(ts) END
                       AS click_ts
            FROM events
            WHERE event_type IN ('click', 'purchase')
        )
        SELECT event_id, user_id, ts_us AS purchase_ts_us,
               last_value(click_ts IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS UNBOUNDED PRECEDING) AS last_click_ts_us
        FROM tagged
        QUALIFY event_type = 'purchase'
        ORDER BY event_id
    """,
    doc="""As-of join: for each purchase, the most recent click at-or-before
    it by the same user.

    Spark-first construction: instead of a range join (quadratic blowup,
    BroadcastNestedLoop at scale) the two event sets are unioned and a
    single `last(click_ts, ignorenulls=True)` running window computes the
    as-of match — one shuffle on user_id + one sort, linear in input.
    This is the pattern that survives 100 TB; the oracle mirrors it with
    last_value IGNORE NULLS.""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.when(F.col("event_type") == "click", F.col("ts_us")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click_ts_us", F.last("click_ts", ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            "last_click_ts_us",
        )
        .orderBy("event_id")
    )


@register(
    "join_bucketed_colocated",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="""Co-located fact-fact join via bucketing: both orders and
    lineitem are written as bucketed tables (8 buckets, bucketed+sorted
    on the orderkey), then joined bucket-to-bucket.  The sort-merge join
    reads matching buckets directly — ZERO Exchange and ZERO Sort on
    either side (asserted in tests/test_plans.py); the only shuffle in
    the query is the final small group-by.  This is the 100 TB pattern
    for repeated fact-fact joins: pay the bucketed write once, then
    every subsequent join on the bucket key is shuffle-free.  The
    `merge` hint pins SMJ so the demo doesn't degrade to broadcast at
    toy scale; at real scale neither side is broadcastable anyway.
    Oracle: the same join/aggregate written directly — bucketing is
    pure physical layout and must not change the answer.""",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    bo, bl = _bucketed_tables(spark, sf_dir)
    return (
        bo.hint("merge")
        .join(bl, bo.o_orderkey == bl.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum(F.col("l_extendedprice")).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_bucket_root: str | None = None


def _bucketed_tables(spark: SparkSession, sf_dir: str):
    """Write orders/lineitem as bucketed tables for ``sf_dir`` (once per
    process) and return them.  External tables under a per-process temp
    root (removed at exit) so concurrent bench/pytest/driver processes
    never race overwrite-vs-read on a shared path; the tag carries the
    sf basename plus a path fingerprint so distinct fixture dirs with
    the same basename can't alias."""
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    global _bucket_root
    if _bucket_root is None:
        _bucket_root = tempfile.mkdtemp(prefix=f"khl_buckets_{os.getpid()}_")
        atexit.register(shutil.rmtree, _bucket_root, ignore_errors=True)

    apath = os.path.abspath(sf_dir.rstrip("/"))
    base = os.path.basename(apath).replace(".", "_").replace("-", "_")
    tag = f"{base}_{hashlib.md5(apath.encode()).hexdigest()[:6]}"
    names = (f"b_orders_{tag}", f"b_lineitem_{tag}")
    specs = (
        ("orders", ("o_orderkey", "o_orderpriority"), "o_orderkey"),
        ("lineitem", ("l_orderkey", "l_extendedprice"), "l_orderkey"),
    )
    for tname, (src, cols, key) in zip(names, specs):
        data_dir = os.path.join(_bucket_root, tname)
        # trust the catalog entry only while its data directory exists
        if spark.catalog.tableExists(tname) and os.path.isdir(data_dir):
            continue
        spark.sql(f"DROP TABLE IF EXISTS {tname}")
        (
            table(spark, sf_dir, src)
            .select(*cols)
            # one file per bucket: Spark only trusts sortBy ordering
            # (eliding the join-side Sort) when each bucket is a
            # single file, so route each bucket's rows to one task
            .repartition(8, F.col(key))
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", data_dir)
            .mode("overwrite")
            .saveAsTable(tname)
        )
    return spark.table(names[0]), spark.table(names[1])


_SALT_N = 8


@register(
    "join_salted_skew",
    oracle="""
        WITH dim AS (
            SELECT event_type,
                   upper(substr(event_type, 1, 1)) AS category,
                   CAST(len(event_type) AS BIGINT) AS weight
            FROM (SELECT DISTINCT event_type FROM events)
        )
        SELECT e.event_type AS event_type, d.category AS category,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND((e.value) * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_value,
               CAST(COUNT(*) * MIN(d.weight) AS BIGINT) AS weighted_n
        FROM events e JOIN dim d ON e.event_type = d.event_type
        GROUP BY e.event_type, d.category
        ORDER BY event_type
    """,
    doc="""Salted replicated join for skewed keys: the fact side's join
    key (event_type, 5 distinct values over the whole stream) is the
    canonical pathological shuffle-join key — every row of a key lands
    on one reducer.  The cure when the dim side is too big to broadcast
    outright: append a salt ``pmod(id, S)`` to the fact key, replicate
    each dim row S ways via explode(sequence(0, S-1)), and join on
    (key, salt) — each hot key now spreads across S tasks, and the
    post-join aggregate is unchanged because the salt never leaves the
    join.  The oracle is the UNSALTED join, proving salting is
    result-invariant.

    Scale: S is chosen per-key from skew stats in production (AQE's
    skew-join split does the same transform adaptively for sort-merge
    joins; explicit salting is the portable form that also covers
    aggregates and broadcast-ineligible dims).  Replication cost is
    S x |dim|, amortized across the fact scan.""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.upper(F.substring("event_type", 1, 1)).alias("category"),
            F.length("event_type").cast("bigint").alias("weight"),
        )
    )
    dim_rep = dim.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(_SALT_N - 1))).alias("salt")
    )
    fact = e.select(
        "event_type", "value", F.pmod(F.col("event_id"), F.lit(_SALT_N)).alias("salt")
    )
    return (
        fact.join(dim_rep, ["event_type", "salt"])
        .groupBy("event_type", "category")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value")).alias("sum_value"),
            (F.count("*") * F.min("weight")).cast("bigint").alias("weighted_n"),
        )
        .orderBy("event_type")
    )


_ASOF_TOL_US = 3_600_000_000  # 1 hour attribution window


@register(
    "join_asof_tolerance",
    oracle=f"""
        WITH tagged AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
                   CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END
                       AS purch_ts
            FROM events
            WHERE event_type IN ('click', 'purchase')
        ),
        matched AS (
            SELECT event_id, user_id, event_type, ts_us,
                   first_value(purch_ts IGNORE NULLS) OVER (
                       PARTITION BY user_id
                       ORDER BY ts_us NULLS FIRST, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS next_purchase_ts_us
            FROM tagged
        )
        SELECT event_id, user_id, ts_us AS click_ts_us,
               CASE WHEN next_purchase_ts_us - ts_us <= {_ASOF_TOL_US}
                    THEN next_purchase_ts_us END AS next_purchase_ts_us,
               COALESCE(next_purchase_ts_us - ts_us <= {_ASOF_TOL_US}, FALSE)
                   AS attributed
        FROM matched
        WHERE event_type = 'click'
        ORDER BY event_id
    """,
    doc="""Forward as-of join with tolerance (attribution window): for
    each click, the next purchase by the same user within 1 hour — the
    mirror image of join_asof (backward, unbounded) with the bounded
    match window every ad-attribution pipeline needs.

    Same linear construction: union-tag both streams, one window with
    first(ignorenulls) over the FOLLOWING frame, then the tolerance
    check as a projection — no range join, no quadratic candidate
    blowup; one shuffle on user_id total.  Clicks with no purchase in
    the window survive with a null match (left-join semantics), which
    the COALESCE makes an explicit boolean.""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.when(F.col("event_type") == "purchase", F.col("ts_us")).alias("purch_ts"),
    )
    # explicit NULLS FIRST: the fixture contains null timestamps and
    # Spark (nulls first) and DuckDB (nulls last) default differently
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc_nulls_first(), "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nxt = F.first("purch_ts", ignorenulls=True).over(w)
    # the tolerance predicate must reference the MATERIALIZED column:
    # reusing the window expression after the click filter would
    # re-evaluate it over the filtered (purchase-free) relation
    within = F.col("nxt") - F.col("ts_us") <= _ASOF_TOL_US
    return (
        tagged.withColumn("nxt", nxt)
        .where(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            F.col("ts_us").alias("click_ts_us"),
            F.when(within, F.col("nxt")).alias("next_purchase_ts_us"),
            F.coalesce(within, F.lit(False)).alias("attributed"),
        )
        .orderBy("event_id")
    )


@register(
    "join_null_safe",
    oracle="""
        WITH l AS (
            SELECT event_id, NULLIF(user_id, 3) AS k, event_type FROM events
            WHERE event_type IN ('click', 'view')
        ),
        r AS (
            SELECT NULLIF(user_id, 3) AS k,
                   CAST(COUNT(*) AS BIGINT) AS n_purchases
            FROM events WHERE event_type = 'purchase'
            GROUP BY k
        )
        SELECT l.event_id AS event_id, l.k AS k, l.event_type AS event_type,
               r.n_purchases AS n_purchases
        FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
        ORDER BY event_id
    """,
    doc="""Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL
    keys match each other instead of vanishing — the semantic needed
    when NULL is a real category (unknown user bucket, here minted
    deterministically via NULLIF).  A plain equi-join silently drops
    every NULL-keyed row from both sides; the null-safe operator keeps
    them as one joinable group.

    Scale: Spark plans <=> as a regular hash join on the key's
    null-wrapped form, so shuffle/broadcast strategies are unchanged —
    but note the NULL group is a single hot key by construction; if
    unknowns dominate, split them out (filter + union) or salt exactly
    like join_salted_skew.""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    left = e.where(F.col("event_type").isin("click", "view")).select(
        "event_id", F.nullif(F.col("user_id"), F.lit(3)).alias("k"), "event_type"
    )
    right = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.nullif(F.col("user_id"), F.lit(3)).alias("k"))
        .agg(F.count("*").alias("n_purchases"))
    )
    return (
        left.join(right, left["k"].eqNullSafe(right["k"]))
        .select("event_id", left["k"].alias("k"), "event_type", "n_purchases")
        .orderBy("event_id")
    )


@register(
    "join_lateral_topn",
    oracle="""
        SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment,
               t.o_orderkey AS o_orderkey, t.o_totalprice AS o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey
    """,
    doc="""Correlated LATERAL join (top-2 orders per customer as a
    per-row subquery): the SQL-standard form of "for each outer row,
    run this dependent subquery" — the surface ORMs and BI tools emit.
    Catalyst DECORRELATES it: the physical plan is the same
    shuffle+window top-k as window_topk_per_group, not a per-row
    nested loop — which is exactly why it scales; the lateral form is
    sugar, the engine never executes N subqueries.

    Registered through spark.sql over uniquely-named temp views (the
    one operator exercising the SQL parser path end-to-end).""",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("khl_lat_cust")
    table(spark, sf_dir, "orders").createOrReplaceTempView("khl_lat_ord")
    return spark.sql("""
        SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment,
               t.o_orderkey AS o_orderkey, t.o_totalprice AS o_totalprice
        FROM khl_lat_cust c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM khl_lat_ord o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey
    """)


@register(
    "join_shuffle_hash",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    doc="""Shuffle-hash join — the third physical join strategy, pinned
    via the SHUFFLE_HASH hint on the smaller (orders) side.  For
    fact-fact joins where neither side broadcasts, sort-merge pays two
    full sorts; shuffle-hash skips both sorts and builds a hash map
    from the smaller partition — the right call when one side is
    reliably smaller per key-partition and spill is acceptable.  The
    plan must show ShuffledHashJoin with NO Sort operators before the
    join (asserted in tests/test_plans.py).  At 100 TB this is the
    strategy AQE itself prefers when a post-shuffle side turns out
    small; the hint form is for when you know it up front.""",
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, li = table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum(F.col("l_extendedprice")).alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


_dpp_root: str | None = None


def _partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events date-partitioned (once per process per sf_dir) and
    read it back — the hive-layout fact table the loader's time-bucketed
    sink produces (streaming/loader.py), here reused to demonstrate
    dynamic partition pruning.  Same per-process temp-root lifecycle as
    _bucketed_tables: no cross-process races, removed at exit."""
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    global _dpp_root
    if _dpp_root is None:
        _dpp_root = tempfile.mkdtemp(prefix=f"khl_dpp_{os.getpid()}_")
        atexit.register(shutil.rmtree, _dpp_root, ignore_errors=True)

    apath = os.path.abspath(sf_dir.rstrip("/"))
    out = os.path.join(_dpp_root, hashlib.md5(apath.encode()).hexdigest()[:8])
    if not os.path.isdir(out):
        ev = table(spark, sf_dir, "events")
        (
            ev.select(
                "event_id",
                "user_id",
                "event_type",
                "value",
                F.date_format("ts", "yyyy-MM-dd").alias("d"),
            )
            # one file per day: the write clusters by partition value so
            # the layout matches what the streaming sink produces
            .repartition(F.col("d"))
            .write.partitionBy("d")
            .mode("overwrite")
            .parquet(out)
        )
    # explicit schema: keeps d a STRING (no partition-type inference)
    # and survives an empty layout (zero data files)
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("d", StringType()),
        ]
    )
    return spark.read.schema(schema).parquet(out)


@register(
    "join_dpp_partitioned",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_value,
               CAST(COUNT(DISTINCT strftime(ts, '%Y-%m-%d')) AS BIGINT)
                   AS n_days
        FROM events
        WHERE date_part('day', ts) <= 7
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="""Dynamic partition pruning over the loader's date-partitioned
    layout: the fact side is events written partitionBy(d) (exactly the
    time-bucketed directory layout the streaming sink emits, ref
    SURVEY.md §2.A R7); the dim side is a day dimension whose filter
    (day-of-month <= 7) is only knowable at run time from the dim scan.
    Catalyst injects a dynamicpruning subquery into the fact scan's
    PartitionFilters, so only the matching date directories are read at
    all — at 100 TB this is the difference between scanning ~23% of
    partitions and scanning everything.  Plan-asserted in
    tests/test_plans.py; oracle is the statically-filtered equivalent
    (pruning must not change the answer).""",
)
def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = _partitioned_events(spark, sf_dir)
    days = (
        table(spark, sf_dir, "events")
        .select(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct()
        .where(F.dayofmonth(F.to_date("d")) <= 7)
    )
    return (
        fact.join(F.broadcast(days), "d")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value")).alias("sum_value"),
            F.countDistinct("d").alias("n_days"),
        )
        .orderBy("event_type")
    )


@register(
    "join_fuzzy_blocked",
    oracle="""
        WITH names AS (
            SELECT p_name AS name,
                   CAST(MIN(p_partkey) AS BIGINT) AS key,
                   CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM part GROUP BY p_name
        )
        SELECT a.name AS name_a, b.name AS name_b,
               a.key AS key_a, b.key AS key_b,
               a.n_parts AS n_parts_a, b.n_parts AS n_parts_b,
               CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist
        FROM names a JOIN names b
          ON abs(len(a.name) - len(b.name)) <= 2 AND a.name < b.name
        WHERE levenshtein(a.name, b.name) <= 2
        ORDER BY name_a, name_b
    """,
    doc="""Fuzzy entity-resolution join: near-identical part names
    (Levenshtein distance <= 2) matched WITHOUT comparing all pairs —
    the record-linkage primitive behind catalog reconciliation and
    duplicate-entity detection.  Names are first collapsed to their
    distinct spellings (min key + multiplicity), then candidates come
    from LENGTH-BAND blocking: |len(a) - len(b)| <= 2 is a NECESSARY
    condition for distance <= 2, so expanding one side to its 5
    admissible lengths and equi-joining on length is a COMPLETE cover
    of the answer (no recall loss), turning the quadratic comparison
    into a hash join whose fan-out is a constant 5.  The exact
    levenshtein predicate then runs only on candidates.

    Determinism: Levenshtein is exact unit-cost integer edit distance
    in both engines; the oracle states the pure length-band predicate.

    Scale: the name-collapse aggregate bounds the join input to the
    distinct-spelling vocabulary; at 100 TB with long strings swap the
    length band for q-gram-count blocking (same complete-cover
    argument, tighter buckets) — the join shape is unchanged.  The
    oracle's inequality join is fine at fixture vocabulary size.""",
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    names = p.groupBy(F.col("p_name").alias("name")).agg(
        F.min("p_partkey").cast("bigint").alias("key"),
        F.count("*").alias("n_parts"),
    )
    a = names.select(
        F.col("name").alias("name_a"),
        F.col("key").alias("key_a"),
        F.col("n_parts").alias("n_parts_a"),
        F.explode(
            F.sequence(F.length("name") - 2, F.length("name") + 2)
        ).alias("blk"),
    )
    b = names.select(
        F.col("name").alias("name_b"),
        F.col("key").alias("key_b"),
        F.col("n_parts").alias("n_parts_b"),
        F.length("name").alias("blk"),
    )
    return (
        a.join(b, "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .where(F.levenshtein("name_a", "name_b") <= 2)
        .select(
            "name_a",
            "name_b",
            "key_a",
            "key_b",
            "n_parts_a",
            "n_parts_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("edit_dist"),
        )
        .orderBy("name_a", "name_b")
    )
