"""Distributed ML primitives: Lloyd's k-means over the embeddings
table as a fixed-iteration DataFrame loop.

k-means is the canonical iterative-ML-on-Spark workload (what MLlib's
KMeans does under the hood: per-iteration assign = join vs broadcast
centroids + argmin, update = one hash aggregate).  Here it is expressed
purely in DataFrame ops over a LONG-FORMAT view of the vectors
(vec_id, dim, value) — no UDF, no linear-algebra library — so the whole
two-iteration fit is one Catalyst plan.

Cross-engine exactness (the graph.py doctrine, applied to ML): vector
components are promoted float→double (exact), then snapped once to a
non-negative integer grid (round(v·1e4) + 1e5 — the shift cancels in every distance and keeps
floor division == truncating division for the centroid update), so
distances, assignments, centroid updates, and inertia are ALL exact
BIGINT arithmetic.  Both engines fit literally the same model.
int64 headroom: per-pair distance ≤ 64·(2.2e4)² ≈ 3e10; inertia sums
~3e10 per vector → ~3e8 vectors before overflow.

Scale: the long format shuffles on (vec_id) for assignment and
(cid, dim) for the update — both map-side-combining aggregates; the
candidate join is vs a broadcast k×dim centroid table (512 rows).
At 10^9 vectors this exact layout holds: the only growing shuffle is
the assignment aggregate, linear in the input, and iteration count is
fixed — MLlib's own cost shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import spread, table
from kafka_hadoop_loader_spark.plans.ranking import bounded_window_key
from kafka_hadoop_loader_spark.registry import register

_K = 8
_SCALE = 10_000
_OFFSET = 100_000  # makes every grid value non-negative: floor == trunc


@register(
    "kmeans_embeddings",
    oracle=f"""
        WITH longv AS (
            SELECT vec_id, i AS dim,
                   CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {_SCALE}) AS BIGINT) + {_OFFSET} AS v
            FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
        ),
        seeds AS (
            SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
            FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_K})
        ),
        cent0 AS (
            SELECT s.cid, l.dim, l.v AS c
            FROM seeds s JOIN longv l ON l.vec_id = s.vec_id
        ),
        d1 AS (
            SELECT l.vec_id, c.cid,
                   CAST(SUM((l.v - c.c) * (l.v - c.c)) AS BIGINT) AS dist2
            FROM longv l JOIN cent0 c ON c.dim = l.dim
            GROUP BY l.vec_id, c.cid
        ),
        a1 AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
                FROM d1
            ) WHERE rn = 1
        ),
        cent1 AS (
            SELECT a.cid, l.dim,
                   CAST(SUM(l.v) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS c
            FROM a1 a JOIN longv l ON l.vec_id = a.vec_id
            GROUP BY a.cid, l.dim
        ),
        d2 AS (
            SELECT l.vec_id, c.cid,
                   CAST(SUM((l.v - c.c) * (l.v - c.c)) AS BIGINT) AS dist2
            FROM longv l JOIN cent1 c ON c.dim = l.dim
            GROUP BY l.vec_id, c.cid
        ),
        a2 AS (
            SELECT vec_id, cid, dist2 FROM (
                SELECT vec_id, cid, dist2,
                       row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
                FROM d2
            ) WHERE rn = 1
        )
        SELECT cid AS cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(dist2) AS BIGINT) AS inertia_scaled,
               CAST(MIN(vec_id) AS BIGINT) AS rep_vec_id
        FROM a2
        GROUP BY cid
        ORDER BY cluster_id
    """,
    doc="""Lloyd's k-means (k=8, 2 fixed iterations, deterministic
    first-k-ids init) over the 64-dim embeddings, entirely in exact
    integer arithmetic on a scaled non-negative grid: assignment =
    argmin of exact squared distances (ties to the lower cluster id),
    update = per-(cluster, dim) integer-mean (floor), inertia = exact
    BIGINT sum of squared distances.  Output: per-cluster size, inertia
    and smallest member id.  The oracle unrolls both iterations over
    the same grid — both engines fit the identical model, something
    float k-means cannot promise under reordered summation.

    Plan: centroids (k·dim = 512 rows) broadcast to the distance join;
    the per-(vec, cluster) distance aggregate and per-(cluster, dim)
    update are map-side-combining hash aggregates; the argmin is a
    MIN(struct(dist2, cid)) hash aggregate (r13: was a row_number
    window — the agg is map-side combinable and needs no sort).  No
    UDF, no driver-side loop state — the fixed-iteration fit is a
    single lazy plan, MLlib's KMeans cost shape expressed
    declaratively.""",
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"))
    longv = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("dim0", "val"),
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        (F.round(F.col("val").cast("double") * _SCALE).cast("long") + _OFFSET).alias("v"),
    ).localCheckpoint(eager=False)  # 5 references: seeds-join + 2x assign + 2x update
    seeds = (
        emb.select("vec_id")
        .orderBy("vec_id")
        .limit(_K)
        .select(
            "vec_id",
            # bounded input: LIMIT k rows, declared single partition
            (
                F.row_number().over(
                    Window.partitionBy(bounded_window_key("vec_id")).orderBy(
                        "vec_id"
                    )
                )
                - 1
            )
            .cast("long")
            .alias("cid"),
        )
    )
    cent = (
        seeds.join(longv, "vec_id")
        .select("cid", "dim", F.col("v").alias("c"))
    )

    assign = None
    for _ in range(2):
        dist = (
            longv.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cid")
            .agg(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias("dist2"))
        )
        # assign and cent are each referenced exactly once per round, so
        # no cuts here (r13: cutting them hid the centroid broadcast
        # from the plan and bought nothing — only longv is multiply
        # referenced).  argmin by (dist2, cid) as a hash-agg MIN(struct)
        # — lexicographic struct order == the former window's ORDER BY,
        # map-side combinable, no per-round Sort+Window (r13 interleaved
        # min-of-3 3.41s -> 3.03s; results row-identical).
        assign = (
            dist.groupBy("vec_id")
            .agg(F.min(F.struct("dist2", "cid")).alias("b"))
            .select(
                "vec_id",
                F.col("b.cid").alias("cid"),
                F.col("b.dist2").alias("dist2"),
            )
        )
        cent = (
            assign.select("vec_id", "cid")
            .join(longv, "vec_id")
            .groupBy("cid", "dim")
            .agg(F.expr("CAST(SUM(v) AS BIGINT) DIV CAST(COUNT(*) AS BIGINT)").alias("c"))
        )
    return (
        assign.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("dist2").alias("inertia_scaled"),
            F.min("vec_id").alias("rep_vec_id"),
        )
        .orderBy("cluster_id")
    )


# --- PCA top principal component by fixed-round power iteration -------
_PCA_XS = 10_000  # component quantization scale
_PCA_VS = 1_000_000  # iterate vector scale


def _tdiv_sql(x: str, d: str, div_kw: str) -> str:
    """Portable truncating integer division of a SIGNED value.

    Both engines currently truncate integer division toward zero
    (Spark ``-7 DIV 2`` = -3; DuckDB ``-7 // 2`` = -3, unlike
    Python), but neither documents the negative-operand contract, so
    signed division is routed through ABS — where floor and truncate
    coincide by construction — with the sign reapplied.  Bit-identical
    in both engines under either rounding rule.  ``div_kw`` is '//'
    (DuckDB) or 'DIV' (Spark).  Canaried by
    tests/test_determinism_edges.py."""
    return (
        f"(CASE WHEN ({x}) < 0 THEN -((-({x})) {div_kw} ({d}))"
        f" ELSE ({x}) {div_kw} ({d}) END)"
    )


def _pca_iter_sql(prev: str, cur: str, div_kw: str) -> str:
    """One power iteration w = Xᵀ(Xv), rescaled to |v| ≤ ~1e6."""
    sdiv = _tdiv_sql("s", str(_PCA_VS), div_kw)
    vdiv = _tdiv_sql("w", f"dn.d", div_kw)
    return f"""
        {cur}_s AS (
            SELECT l.vec_id,
                   CAST(SUM(l.xq * p.v) AS BIGINT) AS s
            FROM longv l JOIN {prev} p ON p.dim = l.dim
            GROUP BY l.vec_id
        ),
        {cur}_sq AS (
            SELECT vec_id, CAST({sdiv} AS BIGINT) AS sq FROM {cur}_s
        ),
        {cur}_w AS (
            SELECT l.dim, CAST(SUM(l.xq * q.sq) AS BIGINT) AS w
            FROM longv l JOIN {cur}_sq q ON q.vec_id = l.vec_id
            GROUP BY l.dim
        ),
        {cur}_m AS (
            SELECT CAST(MAX(ABS(w)) {div_kw} {_PCA_VS} AS BIGINT) + 1 AS d
            FROM {cur}_w
        ),
        {cur} AS (
            SELECT w.dim, CAST({vdiv} AS BIGINT) AS v
            FROM {cur}_w w CROSS JOIN {cur}_m dn
        )"""


@register(
    "pca_power_component",
    oracle=f"""
        WITH longv AS (
            SELECT vec_id, i AS dim,
                   CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {_PCA_XS})
                        AS BIGINT) AS xq
            FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
        ),
        v0 AS (
            SELECT DISTINCT dim, CAST({_PCA_VS} AS BIGINT) AS v FROM longv
        ),
        {_pca_iter_sql("v0", "v1", "//")},
        {_pca_iter_sql("v1", "v2", "//")},
        {_pca_iter_sql("v2", "v3", "//")}
        SELECT v1.dim AS dim, v1.v AS v1, v2.v AS v2, v3.v AS v3
        FROM v1 JOIN v2 ON v1.dim = v2.dim JOIN v3 ON v1.dim = v3.dim
        ORDER BY dim
    """,
    doc=f"""Top principal component of the embedding corpus by POWER
    ITERATION (3 fixed rounds of w ← Xᵀ(Xv), rescaled each round) —
    the building block behind PCA whitening / spectral embedding-drift
    audits, expressed without any linear-algebra library: the Gram
    matrix is never materialized (64×64 would be fine, but Xᵀ(Xv)
    generalizes to d where d² doesn't fit), just two hash aggregates
    per round over the long-format (vec_id, dim, xq) view.

    Exactness: components quantize once to ×{_PCA_XS} ints; every
    product/sum is BIGINT; rescaling uses SIGNED integer division
    routed through ABS so both engines agree regardless of their
    (undocumented) negative-operand rounding — after which all three
    iterate vectors are bit-identical across engines.  Output keeps
    v1/v2/v3 so the convergence trajectory itself is oracle-checked.
    int64 headroom: |Σ xq·sq| ≤ n·2e4·2e6 → safe to n ≈ 2e8 vectors
    per aggregate; beyond that raise the per-round rescale by 10×.

    Scale: per round, one shuffle keyed on vec_id (row dot-products,
    map-side combinable) and one on dim (column reduction, 64 groups),
    plus a 1-row broadcast for the rescale — the distributed matmul
    shape MLlib's RowMatrix.computePrincipalComponents uses, with
    fixed iteration count so the whole fit is one Catalyst plan.""",
)
def pca_power_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    longv = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("dim0", "x"),
    ).select(
        "vec_id",
        (F.col("dim0") + 1).cast("bigint").alias("dim"),
        F.round(F.col("x").cast("double") * _PCA_XS).cast("bigint").alias("xq"),
    ).localCheckpoint(eager=False)  # 7 references (v0 + 2 per round)
    v = longv.select("dim").distinct().select(
        "dim", F.lit(_PCA_VS).cast("bigint").alias("v")
    )
    iterates = []
    for _ in range(3):
        s = (
            longv.join(v, "dim")
            .groupBy("vec_id")
            .agg(F.sum(F.col("xq") * F.col("v")).cast("bigint").alias("s"))
        )
        sq = s.selectExpr(
            "vec_id",
            f"CAST({_tdiv_sql('s', str(_PCA_VS), 'DIV')} AS BIGINT) AS sq",
        )
        w = (
            longv.join(sq, "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.col("xq") * F.col("sq")).cast("bigint").alias("w"))
        )
        m = w.agg(
            F.expr(f"CAST(MAX(ABS(w)) DIV {_PCA_VS} AS BIGINT) + 1").alias("d")
        )
        v = (
            w.crossJoin(F.broadcast(m))
            .selectExpr(
                "dim",
                f"CAST({_tdiv_sql('w', 'd', 'DIV')} AS BIGINT) AS v",
            )
            # each iterate is referenced by BOTH the next round (s and w
            # branches) and the final 3-way join — without a cut round 1
            # re-executes ~5x and the unrolled plan carried 116 scans /
            # 170 Exchanges with zero reuse (r13 plan audit).  A LAZY
            # localCheckpoint per round executes each round exactly once.
            .localCheckpoint(eager=False)
        )
        iterates.append(v)
    v1, v2, v3 = iterates
    return (
        v1.withColumnRenamed("v", "v1")
        .join(v2.withColumnRenamed("v", "v2"), "dim")
        .join(v3.withColumnRenamed("v", "v3"), "dim")
        .orderBy("dim")
    )


# --- Multi-feature OLS via normal equations (closed form) --------------
#
# One shared expression string per coefficient, evaluated verbatim by
# BOTH engines (the bm25_rank convention): the nine sufficient
# statistics are exact BIGINT sums on the cents/unit grid, each cast
# once to DOUBLE (IEEE round-to-nearest of an identical int64 —
# bit-identical everywhere), and Cramer's rule is a fixed ±/× tree on
# those nine doubles, so every intermediate and the final coefficients
# agree bitwise across engines despite being floating point.
_OLS_DET = (
    "(fn*(f11*f22 - f12*f12) - f1*(f1*f22 - f12*f2) + f2*(f1*f12 - f11*f2))"
)
_OLS_B0 = (
    "(fy*(f11*f22 - f12*f12) - f1*(f1y*f22 - f12*f2y)"
    f" + f2*(f1y*f12 - f11*f2y)) / {_OLS_DET}"
)
_OLS_B1 = (
    "(fn*(f1y*f22 - f12*f2y) - fy*(f1*f22 - f12*f2)"
    f" + f2*(f1*f2y - f1y*f2)) / {_OLS_DET}"
)
_OLS_B2 = (
    "(fn*(f11*f2y - f1y*f12) - f1*(f1*f2y - f1y*f2)"
    f" + fy*(f1*f12 - f11*f2)) / {_OLS_DET}"
)


@register(
    "regr_normal_equations",
    oracle=f"""
        WITH obs AS (
            SELECT l.l_returnflag AS returnflag,
                   CAST(l.l_quantity AS BIGINT) AS q,
                   CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS r,
                   CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        mom AS (
            SELECT returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(q) AS BIGINT) AS s1,
                   CAST(SUM(r) AS BIGINT) AS s2,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(q * q) AS BIGINT) AS s11,
                   CAST(SUM(q * r) AS BIGINT) AS s12,
                   CAST(SUM(r * r) AS BIGINT) AS s22,
                   CAST(SUM(q * y) AS BIGINT) AS s1y,
                   CAST(SUM(r * y) AS BIGINT) AS s2y
            FROM obs GROUP BY returnflag
        ),
        f AS (
            SELECT returnflag, n,
                   CAST(n AS DOUBLE) AS fn, CAST(s1 AS DOUBLE) AS f1,
                   CAST(s2 AS DOUBLE) AS f2, CAST(sy AS DOUBLE) AS fy,
                   CAST(s11 AS DOUBLE) AS f11, CAST(s12 AS DOUBLE) AS f12,
                   CAST(s22 AS DOUBLE) AS f22, CAST(s1y AS DOUBLE) AS f1y,
                   CAST(s2y AS DOUBLE) AS f2y
            FROM mom
        )
        SELECT returnflag, n,
               {_OLS_B0} AS beta0_cents,
               {_OLS_B1} AS beta1_cents_per_unit,
               {_OLS_B2} AS beta2
        FROM f
        ORDER BY returnflag
    """,
    doc="""Multi-feature linear regression fit in closed form — the
    distributed-OLS shape: y = b0 + b1·quantity + b2·retailprice per
    returnflag, where ONE aggregation pass computes the nine exact
    sufficient statistics (n, Σx, Σxxᵀ, Σxy on the integer cents/unit
    grid) and Cramer's rule solves the 3x3 normal equations on the
    single resulting row per group.  This is how regression fits at
    100 TB: the data-sized work is one map-side-combining hash
    aggregate; the solve is O(p³) on p+1 numbers per group, never
    touching data again (MLlib's normal-equation solver shape —
    WeightedLeastSquares — minus the library).

    Cross-engine exactness: integer moments are exact and
    order-independent; each is cast ONCE to double (identical IEEE
    rounding of identical int64s) and the Cramer expressions are one
    shared literal string evaluated by both engines, so the float
    coefficients are bit-identical, not approximately equal.  int64
    headroom: Σ(r·y) ≈ 2e12/row → ~4e6 rows per group here; at larger
    scale re-grid to dollars (scale=1) for 1e10-row groups, or go
    two-phase (per-partition moments, BIGINT merge).

    Extends regr_by_group (simple 1-feature regression) to the
    multi-feature case; residual diagnostics live there.""",
)
def regr_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    obs = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("p_retailprice") * 100).cast("long").alias("r"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
    )
    mom = obs.groupBy("returnflag").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s1"),
        F.sum("r").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("q") * F.col("q")).alias("s11"),
        F.sum(F.col("q") * F.col("r")).alias("s12"),
        F.sum(F.col("r") * F.col("r")).alias("s22"),
        F.sum(F.col("q") * F.col("y")).alias("s1y"),
        F.sum(F.col("r") * F.col("y")).alias("s2y"),
    )
    f = mom.select(
        "returnflag",
        "n",
        F.col("n").cast("double").alias("fn"),
        F.col("s1").cast("double").alias("f1"),
        F.col("s2").cast("double").alias("f2"),
        F.col("sy").cast("double").alias("fy"),
        F.col("s11").cast("double").alias("f11"),
        F.col("s12").cast("double").alias("f12"),
        F.col("s22").cast("double").alias("f22"),
        F.col("s1y").cast("double").alias("f1y"),
        F.col("s2y").cast("double").alias("f2y"),
    )
    return (
        f.select(
            "returnflag",
            "n",
            F.expr(_OLS_B0).alias("beta0_cents"),
            F.expr(_OLS_B1).alias("beta1_cents_per_unit"),
            F.expr(_OLS_B2).alias("beta2"),
        )
        .orderBy("returnflag")
    )


# --- Naive Bayes ----------------------------------------------------------
# Likelihood-product score, ONE expression string shared verbatim by both
# engines: every operand is an exact BIGINT (class count nc, train total
# nt, per-feature co-counts n1c/n2c/n3c with +1 Laplace smoothing, domain
# sizes d1/d2/d3), each cast ONCE to double, four divisions and three
# multiplications in fixed left-to-right association -> bit-identical
# IEEE result in Spark and DuckDB.
_NB_SCORE = (
    "(CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE))"
    " * ((CAST(n1c AS DOUBLE) + 1.0E0) / (CAST(nc AS DOUBLE) + CAST(d1 AS DOUBLE)))"
    " * ((CAST(n2c AS DOUBLE) + 1.0E0) / (CAST(nc AS DOUBLE) + CAST(d2 AS DOUBLE)))"
    " * ((CAST(n3c AS DOUBLE) + 1.0E0) / (CAST(nc AS DOUBLE) + CAST(d3 AS DOUBLE)))"
)


@register(
    "ml_naive_bayes",
    oracle=f"""
        WITH feat AS (
            SELECT o_orderkey, o_orderpriority AS cls,
                   (epoch_us(o_orderdate) // 86400000000) % 7 AS f1,
                   o_custkey % 8 AS f2,
                   CAST(FLOOR(o_totalprice / 100000.0) AS BIGINT) AS f3
            FROM orders
        ),
        train AS (SELECT * FROM feat WHERE o_orderkey % 5 <> 0),
        test  AS (SELECT * FROM feat WHERE o_orderkey % 5 = 0),
        pri AS (SELECT cls, CAST(COUNT(*) AS BIGINT) AS nc FROM train GROUP BY cls),
        l1 AS (SELECT cls, f1, CAST(COUNT(*) AS BIGINT) AS n FROM train GROUP BY cls, f1),
        l2 AS (SELECT cls, f2, CAST(COUNT(*) AS BIGINT) AS n FROM train GROUP BY cls, f2),
        l3 AS (SELECT cls, f3, CAST(COUNT(*) AS BIGINT) AS n FROM train GROUP BY cls, f3),
        dom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nt,
                   CAST(COUNT(DISTINCT f1) AS BIGINT) AS d1,
                   CAST(COUNT(DISTINCT f2) AS BIGINT) AS d2,
                   CAST(COUNT(DISTINCT f3) AS BIGINT) AS d3
            FROM train
        ),
        scored AS (
            SELECT t.o_orderkey, t.cls AS actual, p.cls AS candidate,
                   p.nc, dom.nt, dom.d1, dom.d2, dom.d3,
                   COALESCE(l1.n, 0) AS n1c,
                   COALESCE(l2.n, 0) AS n2c,
                   COALESCE(l3.n, 0) AS n3c
            FROM test t
            CROSS JOIN pri p
            CROSS JOIN dom
            LEFT JOIN l1 ON l1.cls = p.cls AND l1.f1 = t.f1
            LEFT JOIN l2 ON l2.cls = p.cls AND l2.f2 = t.f2
            LEFT JOIN l3 ON l3.cls = p.cls AND l3.f3 = t.f3
        ),
        ranked AS (
            SELECT o_orderkey, actual, candidate,
                   row_number() OVER (PARTITION BY o_orderkey
                                      ORDER BY {_NB_SCORE} DESC, candidate)
                       AS rnk
            FROM scored
        )
        SELECT actual, candidate AS predicted,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM ranked WHERE rnk = 1
        GROUP BY actual, candidate
        ORDER BY actual, predicted
    """,
    doc="""Naive Bayes train-and-score as ONE plan — the canonical
    count-based classifier at 100 TB: predict order priority from three
    categorical features (order weekday, customer bucket, total-price
    band) on an 80/20 deterministic key split, reported as the
    confusion matrix.  Training IS aggregation (class priors + one
    (class, value) count table per feature + a 1-row domain/total
    census); scoring is the broadcast of those tiny model tables back
    onto the test scan, a likelihood-product expression, and a per-row
    argmax over the 5 candidate classes.

    Cross-engine exactness: all model statistics are exact BIGINT
    counts; the Laplace-smoothed score is the shared _NB_SCORE
    expression (one CAST per operand, fixed association — the
    regr_normal_equations doctrine), so both engines rank identical
    doubles; argmax tie-breaks on class name.

    Scale: the model is O(classes × Σ|domain_i|) rows — broadcast-size
    by construction for categorical features (bin continuous ones
    first: feature_quantile_bins).  Scoring is map-only after the
    broadcasts except the 5-rows-per-key MIN(struct) argmax aggregate
    (r13: was a window; the agg partial-combines map-side), and the
    confusion matrix is a bounded hash aggregate.  Nothing in the plan
    grows faster than the test scan.""",
)
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    feat = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("cls"),
        (
            F.expr("unix_micros(cast(o_orderdate as timestamp)) DIV 86400000000")
            % 7
        ).alias("f1"),
        (F.col("o_custkey") % 8).alias("f2"),
        F.floor(F.col("o_totalprice") / 100000.0).cast("bigint").alias("f3"),
    )
    train = feat.where(F.col("o_orderkey") % 5 != 0)
    test = feat.where(F.col("o_orderkey") % 5 == 0)
    pri = train.groupBy("cls").agg(F.count("*").alias("nc"))
    l1 = train.groupBy("cls", "f1").agg(F.count("*").alias("n1"))
    l2 = train.groupBy("cls", "f2").agg(F.count("*").alias("n2"))
    l3 = train.groupBy("cls", "f3").agg(F.count("*").alias("n3"))
    dom = train.agg(
        F.count("*").alias("nt"),
        F.countDistinct("f1").alias("d1"),
        F.countDistinct("f2").alias("d2"),
        F.countDistinct("f3").alias("d3"),
    )
    p = pri.select(F.col("cls").alias("candidate"), "nc")
    scored = (
        test.withColumnRenamed("cls", "actual")
        .crossJoin(F.broadcast(p))
        .crossJoin(F.broadcast(dom))
        .join(
            F.broadcast(l1).select(
                F.col("cls").alias("candidate"), "f1", F.col("n1")
            ),
            ["candidate", "f1"],
            "left",
        )
        .join(
            F.broadcast(l2).select(
                F.col("cls").alias("candidate"), "f2", F.col("n2")
            ),
            ["candidate", "f2"],
            "left",
        )
        .join(
            F.broadcast(l3).select(
                F.col("cls").alias("candidate"), "f3", F.col("n3")
            ),
            ["candidate", "f3"],
            "left",
        )
        .select(
            "o_orderkey",
            "actual",
            "candidate",
            "nc",
            "nt",
            "d1",
            "d2",
            "d3",
            F.coalesce("n1", F.lit(0)).alias("n1c"),
            F.coalesce("n2", F.lit(0)).alias("n2c"),
            F.coalesce("n3", F.lit(0)).alias("n3c"),
        )
    )
    # per-order argmax by (score desc, candidate asc) as
    # MIN(struct(-score, candidate)): the score is a product of strictly
    # positive finite terms (Laplace smoothing), so negation is an exact
    # order flip that can never produce NaN — the agg partial-combines
    # the 5 candidate rows per order map-side, replacing the Sort+Window
    # (r13; results row-identical, interleaved min-of-3 1.36s -> 1.22s).
    return (
        scored.groupBy("o_orderkey", "actual")
        .agg(
            F.min(
                F.struct((-F.expr(_NB_SCORE)).alias("ns"), F.col("candidate"))
            ).alias("b")
        )
        .groupBy("actual", F.col("b.candidate").alias("predicted"))
        .agg(F.count("*").alias("n_orders"))
        .orderBy("actual", "predicted")
    )


# --- Decision-stump split search ------------------------------------------
# Weighted Gini impurity of a binary split, shared expression string:
# every operand is an exact BIGINT count below 2^26, so the squares are
# exact doubles and the two divisions + three additions associate
# identically in both engines.
_GINI = (
    "((CAST(nl AS DOUBLE) - (CAST(posl AS DOUBLE) * CAST(posl AS DOUBLE)"
    " + CAST(negl AS DOUBLE) * CAST(negl AS DOUBLE)) / CAST(nl AS DOUBLE))"
    " + (CAST(nr AS DOUBLE) - (CAST(posr AS DOUBLE) * CAST(posr AS DOUBLE)"
    " + CAST(negr AS DOUBLE) * CAST(negr AS DOUBLE)) / CAST(nr AS DOUBLE)))"
)


@register(
    "ml_gini_split",
    oracle=f"""
        WITH obs AS (
            SELECT 'quantity' AS feature, l_quantity AS val,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
            FROM lineitem
            UNION ALL
            SELECT 'discount', l_discount,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
            FROM lineitem
            UNION ALL
            SELECT 'tax', l_tax,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
            FROM lineitem
        ),
        grid AS (
            SELECT feature, val,
                   CAST(COUNT(*) AS BIGINT) AS n_v,
                   CAST(SUM(pos) AS BIGINT) AS pos_v
            FROM obs GROUP BY feature, val
        ),
        cum AS (
            SELECT feature, val,
                   CAST(SUM(n_v) OVER w AS BIGINT) AS nl,
                   CAST(SUM(pos_v) OVER w AS BIGINT) AS posl,
                   CAST(SUM(n_v) OVER t AS BIGINT) AS nt,
                   CAST(SUM(pos_v) OVER t AS BIGINT) AS post
            FROM grid
            WINDOW w AS (PARTITION BY feature ORDER BY val
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   t AS (PARTITION BY feature)
        ),
        cand AS (
            SELECT feature, val AS threshold, nl, posl,
                   nl - posl AS negl,
                   nt - nl AS nr,
                   post - posl AS posr,
                   (nt - nl) - (post - posl) AS negr
            FROM cum WHERE nl < nt
        ),
        scored AS (
            SELECT feature, threshold, nl, posl, nr, posr,
                   {_GINI} AS gini,
                   row_number() OVER (PARTITION BY feature
                                      ORDER BY {_GINI}, threshold) AS rnk
            FROM cand
        )
        SELECT feature, threshold, nl, posl, nr, posr, gini,
               CAST(rnk AS BIGINT) AS rnk
        FROM scored WHERE rnk <= 5
        ORDER BY feature, rnk
    """,
    doc="""Decision-stump split search — the inner loop of distributed
    tree learning (XGBoost/LightGBM histogram method, MLlib decision
    trees): for label returnflag='R', evaluate EVERY candidate binary
    split "feature <= t" over three lineitem features and report the 5
    best per feature by weighted Gini impurity.  The crucial shape: one
    hash aggregate collapses the scan to the (feature, value) count
    grid, cumulative sums over that tiny grid turn each candidate's
    four contingency counts into a window expression, and the split
    scoring never touches row data again — candidate evaluation is
    O(|grid|), not O(rows × candidates).

    Cross-engine exactness: contingency counts are exact BIGINTs via
    windowed prefix sums (explicit ROWS frame, distinct-by-construction
    ordering keys); impurity is the shared _GINI expression; ranking
    tie-breaks on threshold.

    Scale: the per-feature window runs over at most |distinct values|
    rows (bin continuous features to a fixed histogram first — exactly
    what the GBDT histogram trick does — so the grid stays bounded);
    the scan-sized work is the one map-side-combining aggregate.  This
    is the per-node split primitive a tree trainer would call per
    level, with features partitioned across the cluster.""",
)
def ml_gini_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pos = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    obs = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("quantity").alias("feature"),
                    F.col("l_quantity").alias("val"),
                ),
                F.struct(
                    F.lit("discount").alias("feature"),
                    F.col("l_discount").alias("val"),
                ),
                F.struct(
                    F.lit("tax").alias("feature"), F.col("l_tax").alias("val")
                ),
            )
        ).alias("fv"),
        pos.alias("pos"),
    ).select("fv.feature", "fv.val", "pos")
    grid = obs.groupBy("feature", "val").agg(
        F.count("*").alias("n_v"), F.sum("pos").alias("pos_v")
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = Window.partitionBy("feature")
    cum = grid.select(
        "feature",
        "val",
        F.sum("n_v").over(w).cast("bigint").alias("nl"),
        F.sum("pos_v").over(w).cast("bigint").alias("posl"),
        F.sum("n_v").over(t).cast("bigint").alias("nt"),
        F.sum("pos_v").over(t).cast("bigint").alias("post"),
    )
    cand = cum.where(F.col("nl") < F.col("nt")).select(
        "feature",
        F.col("val").alias("threshold"),
        "nl",
        "posl",
        (F.col("nl") - F.col("posl")).alias("negl"),
        (F.col("nt") - F.col("nl")).alias("nr"),
        (F.col("post") - F.col("posl")).alias("posr"),
        ((F.col("nt") - F.col("nl")) - (F.col("post") - F.col("posl"))).alias(
            "negr"
        ),
    )
    # top-5 per feature via slice(array_sort(collect_list), 1, 5) — the
    # wave-8 rewrite applied to the rnk<=5 window: (gini, threshold) is
    # a total order within a feature (thresholds are the distinct grid
    # values, so ties on gini break uniquely), hence the sorted array's
    # first five structs ARE the window's rnk 1..5 rows, but from a
    # map-side-combinable aggregate instead of a second hash-partition +
    # per-bucket sort pass over the candidate grid (guide §2.3/§2.4).
    scored = cand.select(
        "feature", "threshold", "nl", "posl", "nr", "posr",
        F.expr(_GINI).alias("gini"),
    )
    top = (
        scored.groupBy("feature")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct("gini", "threshold", "nl", "posl", "nr", "posr")
                    )
                ),
                1,
                5,
            ).alias("top")
        )
        .select("feature", F.posexplode("top").alias("p0", "s"))
    )
    return top.select(
        "feature",
        F.col("s.threshold").alias("threshold"),
        F.col("s.nl").alias("nl"),
        F.col("s.posl").alias("posl"),
        F.col("s.nr").alias("nr"),
        F.col("s.posr").alias("posr"),
        F.col("s.gini").alias("gini"),
        (F.col("p0") + 1).cast("bigint").alias("rnk"),
    ).orderBy("feature", "rnk")


# --- Leave-one-out target encoding -------------------------------------

_TE_M = 20.0  # smoothing pseudo-count


@register(
    "feature_target_encoding",
    oracle=f"""
        WITH base AS (
            SELECT o.o_orderkey, c.c_mktsegment AS segment,
                   CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        seg AS (
            SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS s
            FROM base GROUP BY segment
        ),
        g AS (
            SELECT CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       AS prior
            FROM base
        )
        SELECT b.o_orderkey, b.segment, b.y,
               (CAST(seg.s - b.y AS DOUBLE) + {_TE_M} * g.prior)
                   / (CAST(seg.n - 1 AS DOUBLE) + {_TE_M}) AS loo_enc
        FROM base b JOIN seg ON b.segment = seg.segment CROSS JOIN g
        ORDER BY b.o_orderkey
    """,
    doc=f"""Leave-one-out target encoding with additive smoothing — the
    categorical-feature workhorse of tabular ML pipelines (each row's
    category is replaced by the target mean of the OTHER rows in its
    category, shrunk toward the global prior by {_TE_M:.0f}
    pseudo-counts so rare categories don't memorize their own label):
    encode customer market segment against a binary urgent-order
    target.  Subtracting the row's own label before dividing is what
    prevents the target leak naive mean-encoding commits.

    Determinism: sums/counts are exact BIGINTs; the encoded value is a
    fixed-shape IEEE expression over them (one cast per aggregate, one
    multiply, one divide) — bit-identical in both engines.

    Scale: one hash aggregate at category grain, a broadcast of the
    (tiny) category stats back onto the fact rows, and a 1-row prior
    broadcast — a single shuffle of the fact table at any size, the
    same shape MLlib's own target encoder produces.  High-cardinality
    categories (user id) just make the stats table bigger; the plan is
    unchanged and never quadratic.""",
)
def feature_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    seg = base.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    g = base.agg(
        (F.sum("y").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "prior"
        )
    )
    return (
        base.join(F.broadcast(seg), "segment")
        .crossJoin(F.broadcast(g))
        .select(
            "o_orderkey",
            "segment",
            "y",
            (
                (
                    (F.col("s") - F.col("y")).cast("double")
                    + F.lit(_TE_M) * F.col("prior")
                )
                / ((F.col("n") - 1).cast("double") + F.lit(_TE_M))
            ).alias("loo_enc"),
        )
        .orderBy("o_orderkey")
    )


# --- Hashing-trick feature vectorizer ----------------------------------

_FH_DIM = 64  # hashed feature dimension


@register(
    "feature_hashing_vectorizer",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5('fh:' || w), 1, 15)) AS BIGINT)
                       % {_FH_DIM} AS bucket,
                   CASE WHEN CAST(('0x' || substr(md5('fhs:' || w), 1, 15))
                             AS BIGINT) % 2 = 0
                        THEN 1 ELSE -1 END AS sgn
            FROM tok WHERE w <> ''
        )
        SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
               CAST(SUM(sgn) AS BIGINT) AS weight
        FROM hashed
        GROUP BY doc_id, bucket
        HAVING SUM(sgn) <> 0
        ORDER BY doc_id, bucket
    """,
    doc=f"""Feature hashing (the "hashing trick", Weinberger et al.) —
    the vocabulary-free vectorizer for ML on unbounded token spaces:
    each token maps to one of {_FH_DIM} buckets by portable hash, with
    a second independent hash supplying a +/-1 sign so collisions
    cancel in expectation instead of biasing upward; the output is the
    sparse document-feature matrix in COO form (doc_id, bucket,
    weight), zero-weight cells dropped.  No vocabulary build, no
    dictionary broadcast, no OOV — the property that makes this THE
    vectorizer for streaming/multi-tenant feature pipelines (and
    Spark MLlib's own HashingTF, here with the signed debiasing MLlib
    omits).

    Determinism: both hashes are the salted md5-prefix convention;
    weights are integer sums.

    Scale: explode -> one map-side-combining aggregate on (doc,
    bucket); the shuffle carries at most nnz <= min(tokens,
    {_FH_DIM}) rows per document.  The dimension is a constant: at
    100 TB nothing grows but the row count.""",
)
def feature_hashing_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")

    def phash60(prefix):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), F.col("w"))), 1, 15),
            16,
            10,
        ).cast("long")

    hashed = tok.select(
        "doc_id",
        (phash60("fh:") % _FH_DIM).cast("int").alias("bucket"),
        F.when(phash60("fhs:") % 2 == 0, 1).otherwise(-1).alias("sgn"),
    )
    return (
        hashed.groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").cast("bigint").alias("weight"))
        .where(F.col("weight") != 0)
        .orderBy("doc_id", "bucket")
    )


# --- in-plan iterative GLM: rational-sigmoid logistic regression -------

# Quantization grid for Gauss-Newton sufficient statistics: per-row
# contributions are arbitrary doubles (NOT 2dp-decimal-valued), so the
# functions/exact.py ROUND convention does not apply — FLOOR does:
# floor(x) on an identical IEEE double is bit-identical in every engine
# (ROUND is not, see exact.py's boundary note).  |contrib| <= 6.25, so
# at grid 1e9 each row adds < 2^33 — int64 headroom to ~1.5e9 rows per
# group; at larger scale drop the grid to 1e6 (the fit moves by <1e-6).
_LR_GRID = "1000000000.0"


def _lr_sql_iter(prev: str, rows: str, stats: str, out: str) -> str:
    """One Gauss-Newton step as DuckDB CTEs, textually parallel to the
    Spark expressions in _lr_step (same literals, same association)."""
    q = lambda e: f"CAST(FLOOR(({e}) * {_LR_GRID}) AS BIGINT)"  # noqa: E731
    det = (
        "(CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)"
        " - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE))"
    )
    return f"""
        {rows} AS (
            SELECT b.segment, b.x, b.y, p.b0, p.b1,
                   0.5 + 0.5 * (p.b0 + p.b1 * b.x)
                       / (1.0 + abs(p.b0 + p.b1 * b.x)) AS sig,
                   0.5 / ((1.0 + abs(p.b0 + p.b1 * b.x))
                          * (1.0 + abs(p.b0 + p.b1 * b.x))) AS sp
            FROM lr_base b JOIN {prev} p USING (segment)
        ),
        {stats} AS (
            SELECT segment, MIN(b0) AS b0, MIN(b1) AS b1,
                   SUM({q("(y - sig) * sp")}) AS g0,
                   SUM({q("(y - sig) * sp * x")}) AS g1,
                   SUM({q("sp * sp")}) AS h00,
                   SUM({q("sp * sp * x")}) AS h01,
                   SUM({q("sp * sp * x * x")}) AS h11
            FROM {rows} GROUP BY segment
        ),
        {out} AS (
            SELECT segment,
                   b0 + (CAST(h11 AS DOUBLE) * CAST(g0 AS DOUBLE)
                         - CAST(h01 AS DOUBLE) * CAST(g1 AS DOUBLE))
                        / {det} AS b0,
                   b1 + (CAST(h00 AS DOUBLE) * CAST(g1 AS DOUBLE)
                         - CAST(h01 AS DOUBLE) * CAST(g0 AS DOUBLE))
                        / {det} AS b1
            FROM {stats}
        )"""


_LR_CTES = f"""lr_base AS (
        SELECT c.c_mktsegment AS segment,
               o.o_totalprice / 100000.0 AS x,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1.0 ELSE 0.0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    lr_b0 AS (SELECT DISTINCT segment, 0.0 AS b0, 0.0 AS b1 FROM lr_base),
    {_lr_sql_iter("lr_b0", "lr_r1", "lr_s1", "lr_b1")},
    {_lr_sql_iter("lr_b1", "lr_r2", "lr_s2", "lr_b2")},
    {_lr_sql_iter("lr_b2", "lr_r3", "lr_s3", "lr_b3")}"""


_LR_ORACLE = f"""
    WITH {_LR_CTES},
    fin AS (
        SELECT b.segment, b.y, p.b0, p.b1,
               (p.b0 + p.b1 * b.x) AS z,
               0.5 + 0.5 * (p.b0 + p.b1 * b.x)
                   / (1.0 + abs(p.b0 + p.b1 * b.x)) AS sig
        FROM lr_base b JOIN lr_b3 p USING (segment)
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN y > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_urgent,
           MIN(b0) AS beta0, MIN(b1) AS beta1,
           CAST(SUM(CASE WHEN (z >= 0.0) = (y > 0.5) THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS accuracy,
           CAST(SUM(CAST(FLOOR(((y - sig) * (y - sig)) * {_LR_GRID})
                         AS BIGINT)) AS DOUBLE) / {_LR_GRID} AS sse
    FROM fin GROUP BY segment
    ORDER BY segment
"""


def _lr_quant(c):
    """FLOOR-quantized BIGINT view of a per-row double contribution."""
    return F.floor(c * F.expr(_LR_GRID)).cast("long")


def _lr_sig_sp(z):
    a = F.lit(1.0) + F.abs(z)
    sig = F.lit(0.5) + F.lit(0.5) * z / a
    sp = F.lit(0.5) / (a * a)
    return sig, sp


def _lr_step(base: DataFrame, betas: DataFrame) -> DataFrame:
    j = base.join(F.broadcast(betas), "segment")
    z = F.col("b0") + F.col("b1") * F.col("x")
    sig, sp = _lr_sig_sp(z)
    r = F.col("y") - sig
    x = F.col("x")
    s = j.groupBy("segment").agg(
        F.min("b0").alias("b0"),
        F.min("b1").alias("b1"),
        F.sum(_lr_quant(r * sp)).alias("g0"),
        F.sum(_lr_quant(r * sp * x)).alias("g1"),
        F.sum(_lr_quant(sp * sp)).alias("h00"),
        F.sum(_lr_quant(sp * sp * x)).alias("h01"),
        F.sum(_lr_quant(sp * sp * x * x)).alias("h11"),
    )
    d = lambda n: F.col(n).cast("double")  # noqa: E731
    det = d("h00") * d("h11") - d("h01") * d("h01")
    return s.select(
        "segment",
        (F.col("b0") + (d("h11") * d("g0") - d("h01") * d("g1")) / det).alias(
            "b0"
        ),
        (F.col("b1") + (d("h00") * d("g1") - d("h01") * d("g0")) / det).alias(
            "b1"
        ),
    )


def _lr_fit(spark: SparkSession, sf_dir: str):
    """(base, fitted betas) for the rational-logistic family — shared by
    the fit/metrics query and the calibration audit."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderpriority"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # customer is SF-proportional; the join strategy is AQE's by
    # measured size (it picks broadcast whenever the dim actually fits).
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_totalprice") / F.lit(100000.0)).alias("x"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0
        )
        .otherwise(0.0)
        .alias("y"),
    ).localCheckpoint(eager=False)
    # base feeds the init-distinct, every Gauss-Newton step AND the
    # caller's scoring join (5+ references); each step's betas is inside
    # the next step's broadcast subtree.  Without cuts the orders x
    # customer join re-executed per reference (20 scans, zero reuse in
    # the r13 plan audit).  LAZY cuts (no action) execute the join once
    # and each 5-row step exactly once.
    betas = base.select("segment").distinct().select(
        "segment", F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1")
    )
    for _ in range(3):
        betas = _lr_step(base, betas).localCheckpoint(eager=False)
    return base, betas


@register(
    "ml_logreg_rational",
    oracle=_LR_ORACLE,
    doc="""Per-segment logistic-style classifier (is this order urgent?
    y = priority in {1-URGENT, 2-HIGH} from x = totalprice/1e5) fit by
    THREE Gauss-Newton steps unrolled into one lazy plan — the in-plan
    iterative-GLM pattern: each step is a 5-row broadcast of the current
    coefficients back over the fact scan, a map-side-combining aggregate
    of quantized sufficient statistics (gradient + 2x2 Gauss-Newton
    Hessian), and a closed-form 2x2 solve — no driver-side loop, no
    action, no collect (the same zero-action discipline as
    regr_normal_equations and kmeans_embeddings).

    The link is the RATIONAL Elliott sigmoid s(z) = 0.5 + 0.5*z/(1+|z|)
    (Elliott 1993), chosen because exp() is not bit-portable across
    engines (see textstats.py's ln() notes) while +,-,*,/,abs are IEEE-
    correctly-rounded everywhere — so every per-row double here is
    bit-identical in Spark and DuckDB, FLOOR-quantization to the 1e9
    grid is exact, the BIGINT sums are order-independent, and the
    fitted coefficients match the oracle bit-for-bit.  Decision
    boundary s(z) >= 0.5 is exactly z >= 0 — the accuracy column needs
    no sigmoid at inference.

    Scale: 3 iterations x (broadcast join + hash aggregate) over a
    column-pruned scan; state is 5 groups x 7 BIGINTs.  Iteration count
    is FIXED and unrolled (Gauss-Newton on a 1-feature logistic is
    near-converged in 3); at 100 TB each step is one scan — the
    classic tradeoff vs caching the projected base once.""",
)
def ml_logreg_rational(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, betas = _lr_fit(spark, sf_dir)
    j = base.join(F.broadcast(betas), "segment")
    z = F.col("b0") + F.col("b1") * F.col("x")
    sig, _ = _lr_sig_sp(z)
    r = F.col("y") - sig
    return (
        j.groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.when(F.col("y") > 0.5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_urgent"),
            F.min("b0").alias("beta0"),
            F.min("b1").alias("beta1"),
            F.sum(
                F.when((z >= F.lit(0.0)) == (F.col("y") > F.lit(0.5)), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_correct"),
            F.sum(_lr_quant(r * r)).alias("sse_q"),
        )
        .select(
            "segment",
            "n_orders",
            "n_urgent",
            "beta0",
            "beta1",
            (
                F.col("n_correct").cast("double")
                / F.col("n_orders").cast("double")
            ).alias("accuracy"),
            (F.col("sse_q").cast("double") / F.expr(_LR_GRID)).alias("sse"),
        )
        .orderBy("segment")
    )


# --- split-conformal prediction intervals ------------------------------

_CONF_PHASH = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


@register(
    "conformal_interval_coverage",
    oracle=f"""
        WITH base AS (
            SELECT c.c_mktsegment AS segment, o.o_orderkey,
                   o.o_totalprice AS y,
                   {_CONF_PHASH.format(x="'conf:' || CAST(o.o_orderkey AS VARCHAR)")}
                       % 4 AS bucket
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        model AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n_train,
                   CAST(SUM(CAST(ROUND(y * 100) AS BIGINT)) AS DOUBLE)
                       / (CAST(COUNT(*) AS DOUBLE) * 100.0) AS yhat
            FROM base WHERE bucket < 2 GROUP BY segment
        ),
        cal AS (
            SELECT b.segment, abs(b.y - m.yhat) AS r, b.o_orderkey
            FROM base b JOIN model m USING (segment)
            WHERE b.bucket = 2
        ),
        cal_rank AS (
            SELECT segment, r,
                   row_number() OVER (PARTITION BY segment
                                      ORDER BY r, o_orderkey) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT)
                       AS n_cal
            FROM cal
        ),
        q AS (
            SELECT segment, n_cal, r AS q_radius
            FROM cal_rank
            WHERE rn = (9 * (n_cal + 1) + 9) // 10
        ),
        test AS (
            SELECT b.segment, m.n_train, m.yhat, q.n_cal, q.q_radius,
                   CASE WHEN abs(b.y - m.yhat) <= q.q_radius
                        THEN 1 ELSE 0 END AS covered
            FROM base b JOIN model m USING (segment) JOIN q USING (segment)
            WHERE b.bucket = 3
        )
        SELECT segment,
               MIN(n_train) AS n_train, MIN(n_cal) AS n_cal,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               MIN(yhat) AS yhat, MIN(q_radius) AS q_radius,
               CAST(SUM(covered) AS BIGINT) AS n_covered,
               CAST(SUM(covered) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS coverage,
               CAST(SUM(covered) AS BIGINT) * 10
                   >= CAST(COUNT(*) AS BIGINT) * 9 AS meets_target
        FROM test GROUP BY segment
        ORDER BY segment
    """,
    doc="""Split-conformal prediction intervals with finite-sample
    coverage audit (Vovk et al.; the distribution-free uncertainty
    wrapper production ML ships around ANY point model): rows are
    hash-split 50/25/25 into train/calibration/test by the portable
    salted md5 (sample_hash_split's convention, its own 'conf:' salt);
    the model is the per-segment train mean of totalprice; the
    conformal radius q is the ceil(0.9*(n_cal+1))-th smallest absolute
    calibration residual — computed as an integer-arithmetic rank
    (9*(n+1)+9)//10, no float quantile — and the test half reports
    empirical coverage of [yhat-q, yhat+q] with an exact cross-
    multiplied >=90% verdict.

    Cross-engine exactness: yhat is the scaled-BIGINT exact mean
    (functions/exact.py), residuals are single IEEE subtractions,
    the order statistic picks an ACTUAL residual value (rank ties
    broken by orderkey never change the selected r among equal
    values), and the coverage verdict never divides.

    Scale: model + radius state is O(|segments|); the only per-row
    shuffles are the two hash aggregates and one keyed rank over the
    25% calibration slice.  That per-segment rank partition grows
    linearly with data — at 100 TB either cap calibration by a second
    hash (fixed-size slice preserves the conformal guarantee) or swap
    in plans/ranking.two_phase_rank per segment; the interval math is
    unchanged.""",
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.functions.exact import scaled_long

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("conf:"), F.col("o_orderkey").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 4
    )
    # spread (1-file scan serialized the 150k md5 bucket draws) + LAZY
    # cut: base feeds model, calibration AND test — without the cut the
    # join + md5 pass executed three times (r13 plan audit).
    o = spread(o, "o_orderkey")
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            "o_orderkey",
            F.col("o_totalprice").alias("y"),
            bucket.alias("bucket"),
        )
        .localCheckpoint(eager=False)
    )
    model = (
        base.where(F.col("bucket") < 2)
        .groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_train"),
            (
                F.sum(scaled_long(F.col("y"), 100)).cast("double")
                / (F.count("*").cast("double") * F.lit(100.0))
            ).alias("yhat"),
        )
    )
    cal = (
        base.where(F.col("bucket") == 2)
        .join(F.broadcast(model), "segment")
        .select(
            "segment",
            F.abs(F.col("y") - F.col("yhat")).alias("r"),
            "o_orderkey",
        )
    )
    wseg = Window.partitionBy("segment")
    cal_rank = cal.select(
        "segment",
        "r",
        F.row_number()
        .over(wseg.orderBy("r", "o_orderkey"))
        .alias("rn"),
        F.count("*").over(wseg).cast("bigint").alias("n_cal"),
    )
    q = cal_rank.where(
        F.col("rn")
        == F.expr("(9 * (n_cal + 1) + 9) DIV 10")
    ).select("segment", "n_cal", F.col("r").alias("q_radius"))
    test = (
        base.where(F.col("bucket") == 3)
        .join(F.broadcast(model), "segment")
        .join(F.broadcast(q), "segment")
        .select(
            "segment",
            "n_train",
            "yhat",
            "n_cal",
            "q_radius",
            F.when(
                F.abs(F.col("y") - F.col("yhat")) <= F.col("q_radius"), 1
            )
            .otherwise(0)
            .alias("covered"),
        )
    )
    return (
        test.groupBy("segment")
        .agg(
            F.min("n_train").alias("n_train"),
            F.min("n_cal").alias("n_cal"),
            F.count("*").cast("bigint").alias("n_test"),
            F.min("yhat").alias("yhat"),
            F.min("q_radius").alias("q_radius"),
            F.sum("covered").cast("bigint").alias("n_covered"),
        )
        .select(
            "segment",
            "n_train",
            "n_cal",
            "n_test",
            "yhat",
            "q_radius",
            "n_covered",
            (
                F.col("n_covered").cast("double")
                / F.col("n_test").cast("double")
            ).alias("coverage"),
            (F.col("n_covered") * 10 >= F.col("n_test") * 9).alias(
                "meets_target"
            ),
        )
        .orderBy("segment")
    )


# --- exact AUC-ROC via grid rank-sum -----------------------------------


@register(
    "ml_auc_roc",
    oracle="""
        WITH base AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS score_q,
                   CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        g AS (
            SELECT segment, score_q,
                   CAST(SUM(y) AS BIGINT) AS n_pos,
                   CAST(SUM(1 - y) AS BIGINT) AS n_neg
            FROM base GROUP BY segment, score_q
        ),
        cum AS (
            SELECT segment, score_q, n_pos, n_neg,
                   COALESCE(SUM(n_neg) OVER (
                       PARTITION BY segment ORDER BY score_q
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS neg_below
            FROM g
        ),
        u AS (
            SELECT segment,
                   CAST(SUM(n_pos * (2 * neg_below + n_neg)) AS BIGINT)
                       AS u2,
                   CAST(SUM(n_pos) AS BIGINT) AS pos_total,
                   CAST(SUM(n_neg) AS BIGINT) AS neg_total
            FROM cum GROUP BY segment
        )
        SELECT segment, pos_total, neg_total,
               CAST(u2 AS DOUBLE)
                   / (2.0 * (CAST(pos_total AS DOUBLE)
                             * CAST(neg_total AS DOUBLE))) AS auc,
               u2 > pos_total * neg_total AS better_than_chance
        FROM u
        ORDER BY segment
    """,
    doc="""Exact AUC-ROC (Mann-Whitney U rank-sum form, tie-correct) of
    totalprice as a ranking score for order urgency, per market
    segment — the evaluation metric every classifier ships with,
    computed WITHOUT materializing the ROC curve or a global sort:
    group scores on the exact cent grid, one cumulative window over the
    bounded grid, and 2U = sum(n_pos_v * (2*neg_below_v + n_neg_v))
    counts discordant-free pairs with ties at half weight — the
    integer identity behind trapezoidal ROC integration.

    Cross-engine exactness: U stays doubled-BIGINT to the end (ties
    contribute odd units), AUC is ONE division of exact integers; the
    better-than-chance verdict (AUC > 0.5) never divides at all.
    int64 frontier: 2U <= 2*n_pos*n_neg — overflow needs ~3e9 of EACH
    class per segment; shard the grid and sum partial U's before that.

    Scale: per-(segment, cent) state like drift_numeric_ks — the
    window runs over the bounded VALUE GRID, never rows; the fact scan
    dominates.  Same plan shape serves any (score, label) pair whose
    score is decimal-valued — swap the projection.""",
)
def ml_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.functions.exact import scaled_long

    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderpriority"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        scaled_long(F.col("o_totalprice"), 100).alias("score_q"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    g = base.groupBy("segment", "score_q").agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(F.lit(1) - F.col("y")).cast("bigint").alias("n_neg"),
    )
    w = (
        Window.partitionBy("segment")
        .orderBy("score_q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = g.select(
        "segment",
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(w), F.lit(0)).alias("neg_below"),
    )
    u = cum.groupBy("segment").agg(
        F.sum(
            F.col("n_pos")
            * (F.lit(2) * F.col("neg_below") + F.col("n_neg"))
        )
        .cast("bigint")
        .alias("u2"),
        F.sum("n_pos").cast("bigint").alias("pos_total"),
        F.sum("n_neg").cast("bigint").alias("neg_total"),
    )
    return u.select(
        "segment",
        "pos_total",
        "neg_total",
        (
            F.col("u2").cast("double")
            / (
                F.lit(2.0)
                * (
                    F.col("pos_total").cast("double")
                    * F.col("neg_total").cast("double")
                )
            )
        ).alias("auc"),
        (F.col("u2") > F.col("pos_total") * F.col("neg_total")).alias(
            "better_than_chance"
        ),
    ).orderBy("segment")


# --- calibration audit over the rational-logistic scores ---------------


@register(
    "ml_calibration_ece",
    oracle=f"""
        WITH {_LR_CTES},
        scored AS (
            SELECT b.y,
                   0.5 + 0.5 * (p.b0 + p.b1 * b.x)
                       / (1.0 + abs(p.b0 + p.b1 * b.x)) AS sig
            FROM lr_base b JOIN lr_b3 p USING (segment)
        ),
        binned AS (
            SELECT CAST(FLOOR(sig * 10.0) AS BIGINT) AS bin, y, sig
            FROM scored
        ),
        per_bin AS (
            SELECT bin,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN y > 0.5 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pos,
                   CAST(SUM(CAST(FLOOR(sig * {_LR_GRID}) AS BIGINT))
                        AS BIGINT) AS conf_q
            FROM binned GROUP BY bin
        ),
        tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS n_total FROM per_bin)
        SELECT bin, n_rows, n_pos,
               CAST(conf_q AS DOUBLE)
                   / (CAST(n_rows AS DOUBLE) * {_LR_GRID}) AS conf_avg,
               CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE) AS accuracy,
               abs(CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE)
                   - CAST(conf_q AS DOUBLE)
                     / (CAST(n_rows AS DOUBLE) * {_LR_GRID})) AS gap,
               (CAST(n_rows AS DOUBLE) / CAST(n_total AS DOUBLE))
                   * abs(CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE)
                         - CAST(conf_q AS DOUBLE)
                           / (CAST(n_rows AS DOUBLE) * {_LR_GRID}))
                   AS ece_contrib
        FROM per_bin CROSS JOIN tot
        ORDER BY bin
    """,
    doc="""Reliability diagram + expected-calibration-error decomposition
    of the rational-logistic scores (the standard post-fit audit: a
    model can rank well — see ml_auc_roc — yet still be miscalibrated):
    predictions from the SAME 3-step in-plan fit as ml_logreg_rational
    (shared _lr_fit plan, shared oracle CTE chain — the two queries
    cannot drift apart), bucketed into 10 fixed-width confidence bins;
    per bin: empirical accuracy vs mean confidence, their gap, and the
    bin's weighted ECE contribution (sum of the column = the scalar
    ECE).

    Cross-engine exactness: the Elliott sigmoid is rational (no exp),
    so bin = floor(10*sig) is exact; mean confidence sums FLOOR-grid
    BIGINTs (same _LR_GRID discipline as the fit); accuracy/gap are
    single divisions on exact integers.

    Scale: after the fit's aggregates, ONE hash aggregate at bin grain
    (10 groups) + a 1-row broadcast total.  The audit adds a single
    pass over the scored scan regardless of data size.""",
)
def ml_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, betas = _lr_fit(spark, sf_dir)
    j = base.join(F.broadcast(betas), "segment")
    z = F.col("b0") + F.col("b1") * F.col("x")
    sig, _ = _lr_sig_sp(z)
    binned = j.select(
        F.floor(sig * F.lit(10.0)).cast("bigint").alias("bin"),
        "y",
        sig.alias("sig"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("y") > 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.floor(F.col("sig") * F.expr(_LR_GRID)).cast("long"))
        .cast("bigint")
        .alias("conf_q"),
    )
    tot = per_bin.agg(F.sum("n_rows").cast("bigint").alias("n_total"))
    conf_avg = F.col("conf_q").cast("double") / (
        F.col("n_rows").cast("double") * F.expr(_LR_GRID)
    )
    accuracy = F.col("n_pos").cast("double") / F.col("n_rows").cast("double")
    gap = F.abs(accuracy - conf_avg)
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_rows",
            "n_pos",
            conf_avg.alias("conf_avg"),
            accuracy.alias("accuracy"),
            gap.alias("gap"),
            (
                (F.col("n_rows").cast("double") / F.col("n_total").cast("double"))
                * gap
            ).alias("ece_contrib"),
        )
        .orderBy("bin")
    )


# --- isotonic (PAV) calibration over the reliability bins ---------------


@register(
    "ml_isotonic_calibration",
    oracle=f"""
        WITH {_LR_CTES},
        scored AS (
            SELECT b.y,
                   0.5 + 0.5 * (p.b0 + p.b1 * b.x)
                       / (1.0 + abs(p.b0 + p.b1 * b.x)) AS sig
            FROM lr_base b JOIN lr_b3 p USING (segment)
        ),
        per_bin AS (
            SELECT CAST(FLOOR(sig * 10.0) AS BIGINT) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN y > 0.5 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pos
            FROM scored GROUP BY 1
        ),
        ivl AS (
            SELECT j.bin AS j, k.bin AS k,
                   CAST(SUM(m.n_pos) AS BIGINT) AS ivl_pos,
                   CAST(SUM(m.n_rows) AS BIGINT) AS ivl_rows
            FROM per_bin j, per_bin k, per_bin m
            WHERE j.bin <= k.bin AND m.bin BETWEEN j.bin AND k.bin
            GROUP BY j.bin, k.bin
        ),
        env AS (
            SELECT i.bin AS bin, v.j,
                   MIN(CAST(v.ivl_pos AS DOUBLE)
                       / CAST(v.ivl_rows AS DOUBLE)) AS lo
            FROM per_bin i JOIN ivl v
              ON v.j <= i.bin AND i.bin <= v.k
            GROUP BY i.bin, v.j
        ),
        iso AS (SELECT bin, MAX(lo) AS iso_fit FROM env GROUP BY bin),
        prev AS (
            SELECT a.bin, MAX(b.iso_fit) AS prev_max
            FROM iso a LEFT JOIN iso b ON b.bin < a.bin
            GROUP BY a.bin
        )
        SELECT p.bin, p.n_rows, p.n_pos,
               CAST(p.n_pos AS DOUBLE) / CAST(p.n_rows AS DOUBLE)
                   AS accuracy,
               s.iso_fit,
               COALESCE(s.iso_fit >= v.prev_max, TRUE) AS monotone_ok
        FROM per_bin p
        JOIN iso s ON p.bin = s.bin
        JOIN prev v ON p.bin = v.bin
        ORDER BY p.bin
    """,
    doc="""Isotonic (pool-adjacent-violators) calibration fitted over the
    reliability bins of the shared rational-logistic scores — the
    non-parametric half of the standard calibration toolkit (Platt
    scaling's sibling; Zadrozny & Elkan 2002): given per-bin empirical
    accuracies that may zig-zag, find the best monotone-non-decreasing
    fit in weighted least squares.

    PAV is usually presented as a sequential pooling loop — useless on
    a cluster.  This plan uses the CLOSED-FORM minimax identity
    instead: iso(i) = max_{{j<=i}} min_{{k>=i}} mean(y[j..k]), which is
    embarrassingly parallel over the BOUNDED bin grid (<=11 bins, so
    <=11^3 interval terms — constant work after the scored scan, no
    loop, no driver action).  Interval means are single divisions of
    exact BIGINT sums; MIN/MAX over identically-computed doubles is
    addition-order-free, so the whole fit is bit-portable across
    engines — float SUMs never cross rows.  The monotone_ok column is
    an in-plan certificate (iso_fit >= every lower bin's fit).

    Scale: one hash aggregate to bin grain (the same shape as
    ml_calibration_ece), then constant-size broadcast joins; the fact
    scan and the fit's own aggregates dominate at any data size.  With
    B bins the minimax costs O(B^3) — the bin grid is the knob, and
    calibration practice caps it at 10-20 regardless of corpus.""",
)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, betas = _lr_fit(spark, sf_dir)
    j = base.join(F.broadcast(betas), "segment")
    z = F.col("b0") + F.col("b1") * F.col("x")
    sig, _ = _lr_sig_sp(z)
    per_bin = (
        j.select(
            F.floor(sig * F.lit(10.0)).cast("bigint").alias("bin"), "y"
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("y") > 0.5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos"),
        )
        # the logistic fit above feeds five minimax branches below; a
        # LAZY lineage cut (no action) executes the fit once instead of
        # once per branch — same pattern as graph.star_contract
        .localCheckpoint(eager=False)
    )
    pj = per_bin.select(F.col("bin").alias("j"))
    pk = per_bin.select(F.col("bin").alias("k"))
    pm = per_bin.select(
        F.col("bin").alias("m"),
        F.col("n_pos").alias("m_pos"),
        F.col("n_rows").alias("m_rows"),
    )
    ivl = (
        pj.join(F.broadcast(pk), F.col("j") <= F.col("k"))
        .join(
            F.broadcast(pm),
            (F.col("m") >= F.col("j")) & (F.col("m") <= F.col("k")),
        )
        .groupBy("j", "k")
        .agg(
            F.sum("m_pos").cast("bigint").alias("ivl_pos"),
            F.sum("m_rows").cast("bigint").alias("ivl_rows"),
        )
    )
    env = (
        per_bin.select(F.col("bin").alias("i"))
        .join(
            F.broadcast(ivl),
            (F.col("j") <= F.col("i")) & (F.col("i") <= F.col("k")),
        )
        .groupBy("i", "j")
        .agg(
            F.min(
                F.col("ivl_pos").cast("double")
                / F.col("ivl_rows").cast("double")
            ).alias("lo")
        )
    )
    iso = env.groupBy("i").agg(F.max("lo").alias("iso_fit"))
    prev = (
        iso.select(F.col("i").alias("pi"))
        .join(
            F.broadcast(
                iso.select(F.col("i").alias("b2"), F.col("iso_fit").alias("f2"))
            ),
            F.col("b2") < F.col("pi"),
            "left",
        )
        .groupBy("pi")
        .agg(F.max("f2").alias("prev_max"))
    )
    return (
        per_bin.join(F.broadcast(iso), per_bin.bin == iso.i)
        .join(F.broadcast(prev), per_bin.bin == prev.pi)
        .select(
            "bin",
            "n_rows",
            "n_pos",
            (
                F.col("n_pos").cast("double") / F.col("n_rows").cast("double")
            ).alias("accuracy"),
            "iso_fit",
            F.coalesce(
                F.col("iso_fit") >= F.col("prev_max"), F.lit(True)
            ).alias("monotone_ok"),
        )
        .orderBy("bin")
    )


# --- Ridge regression (closed form) ---------------------------------------
#
# Same nine sufficient statistics and Cramer tree as
# regr_normal_equations, with the L2 penalty added to the FEATURE
# diagonal of the normal matrix (intercept unpenalized, the standard
# convention): f11 -> f11 + lambda, f22 -> f22 + lambda.  The
# substitution is TEXTUAL on the shared expression strings, so both
# engines still evaluate one identical literal tree.
_RIDGE_L = "1.0E8"  # lambda, sized to the f11/f22 magnitude at sf0.1


def _ridge_expr(e: str) -> str:
    return e.replace("f11", f"(f11 + {_RIDGE_L})").replace(
        "f22", f"(f22 + {_RIDGE_L})"
    )


@register(
    "ml_ridge_regression",
    oracle=f"""
        WITH obs AS (
            SELECT l.l_returnflag AS returnflag,
                   CAST(l.l_quantity AS BIGINT) AS q,
                   CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS r,
                   CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        mom AS (
            SELECT returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(q) AS BIGINT) AS s1,
                   CAST(SUM(r) AS BIGINT) AS s2,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(q * q) AS BIGINT) AS s11,
                   CAST(SUM(q * r) AS BIGINT) AS s12,
                   CAST(SUM(r * r) AS BIGINT) AS s22,
                   CAST(SUM(q * y) AS BIGINT) AS s1y,
                   CAST(SUM(r * y) AS BIGINT) AS s2y
            FROM obs GROUP BY returnflag
        ),
        f AS (
            SELECT returnflag, n,
                   CAST(n AS DOUBLE) AS fn, CAST(s1 AS DOUBLE) AS f1,
                   CAST(s2 AS DOUBLE) AS f2, CAST(sy AS DOUBLE) AS fy,
                   CAST(s11 AS DOUBLE) AS f11, CAST(s12 AS DOUBLE) AS f12,
                   CAST(s22 AS DOUBLE) AS f22, CAST(s1y AS DOUBLE) AS f1y,
                   CAST(s2y AS DOUBLE) AS f2y
            FROM mom
        )
        SELECT returnflag, n,
               CAST({_RIDGE_L} AS DOUBLE) AS lambda,
               {_ridge_expr(_OLS_B0)} AS beta0_cents,
               {_ridge_expr(_OLS_B1)} AS beta1_cents_per_unit,
               {_ridge_expr(_OLS_B2)} AS beta2,
               {_OLS_B1} AS beta1_ols,
               ABS({_ridge_expr(_OLS_B1)}) < ABS({_OLS_B1})
                   AS beta1_shrunk
        FROM f
        ORDER BY returnflag
    """,
    doc=f"""Ridge regression in closed form — regr_normal_equations'
    L2-regularized sibling: the identical one-pass exact sufficient
    statistics, with lambda = {_RIDGE_L} added to the feature diagonal
    of the normal matrix before the same Cramer solve (intercept
    unpenalized, the standard convention).  Emits the ridge
    coefficients next to the OLS slope and a shrinkage verdict — the
    side-by-side a modeling pipeline uses to pick the regularized fit
    when features are collinear (here quantity and retailprice have
    wildly different scales, so the penalty visibly shrinks the
    quantity slope).

    Cross-engine exactness: inherited verbatim from
    regr_normal_equations — the lambda substitution is TEXTUAL on the
    shared Cramer strings, so both engines still evaluate one literal
    IEEE tree on identically-cast exact BIGINT moments.

    Scale: identical to the OLS op — one map-side-combining moment
    aggregate is the only data-sized stage; the solve is O(p^3) per
    group row.  Sweeping lambda re-runs ONLY the solve on the cached
    moments, never the scan (the cross-validation loop at 100 TB).""",
)
def ml_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    obs = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("p_retailprice") * 100).cast("long").alias("r"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
    )
    mom = obs.groupBy("returnflag").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s1"),
        F.sum("r").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("q") * F.col("q")).alias("s11"),
        F.sum(F.col("q") * F.col("r")).alias("s12"),
        F.sum(F.col("r") * F.col("r")).alias("s22"),
        F.sum(F.col("q") * F.col("y")).alias("s1y"),
        F.sum(F.col("r") * F.col("y")).alias("s2y"),
    )
    f = mom.select(
        "returnflag",
        "n",
        F.col("n").cast("double").alias("fn"),
        F.col("s1").cast("double").alias("f1"),
        F.col("s2").cast("double").alias("f2"),
        F.col("sy").cast("double").alias("fy"),
        F.col("s11").cast("double").alias("f11"),
        F.col("s12").cast("double").alias("f12"),
        F.col("s22").cast("double").alias("f22"),
        F.col("s1y").cast("double").alias("f1y"),
        F.col("s2y").cast("double").alias("f2y"),
    )
    return (
        f.select(
            "returnflag",
            "n",
            F.expr(f"CAST({_RIDGE_L} AS DOUBLE)").alias("lambda"),
            F.expr(_ridge_expr(_OLS_B0)).alias("beta0_cents"),
            F.expr(_ridge_expr(_OLS_B1)).alias("beta1_cents_per_unit"),
            F.expr(_ridge_expr(_OLS_B2)).alias("beta2"),
            F.expr(_OLS_B1).alias("beta1_ols"),
            F.expr(
                f"ABS({_ridge_expr(_OLS_B1)}) < ABS({_OLS_B1})"
            ).alias("beta1_shrunk"),
        )
        .orderBy("returnflag")
    )


# --- Precision-recall decision table ----------------------------------------

_PR_BAND = 5_000_000  # threshold grid: $50k bands on the cent grid


@register(
    "ml_pr_curve",
    oracle=f"""
        WITH base AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                       // {_PR_BAND} AS band,
                   CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        g AS (
            SELECT segment, band,
                   CAST(SUM(y) AS BIGINT) AS n_pos,
                   CAST(SUM(1 - y) AS BIGINT) AS n_neg
            FROM base GROUP BY 1, 2
        ),
        cum AS (
            SELECT segment, band,
                   CAST(SUM(n_pos) OVER (PARTITION BY segment
                                         ORDER BY band DESC) AS BIGINT)
                       AS tp,
                   CAST(SUM(n_neg) OVER (PARTITION BY segment
                                         ORDER BY band DESC) AS BIGINT)
                       AS fp,
                   CAST(SUM(n_pos) OVER (PARTITION BY segment) AS BIGINT)
                       AS pos_total
            FROM g
        )
        SELECT segment, band * {_PR_BAND // 100} AS threshold_cents,
               tp, fp, pos_total - tp AS fn,
               CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
               CAST(tp AS DOUBLE) / CAST(pos_total AS DOUBLE) AS recall
        FROM cum ORDER BY segment, threshold_cents
    """,
    doc="""Precision-recall decision table — ml_auc_roc's operational
    complement (AUC says whether the score ranks well; THIS says what
    you get at each deployable threshold): per market segment, for
    every $50k totalprice threshold, the exact confusion counts and
    the precision/recall trade-off of predicting "urgent" above it.
    The table a pipeline reads to pick an alert threshold for a target
    precision.

    Determinism: thresholds live on a fixed integer band grid;
    tp/fp/fn are reverse-cumulative BIGINT sums over that bounded
    grid; precision and recall are single exact divisions.

    Scale: one map-side-combining aggregate to the (segment, band)
    grain bounds everything after — the cumulative window runs over
    the BAND DOMAIN (~50 rows per segment at any corpus size), the
    same banded-grid doctrine as ml_auc_roc and drift_numeric_ks.""",
)
def ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr(f"CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV {_PR_BAND}").alias(
            "band"
        ),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    g = base.groupBy("segment", "band").agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n_neg"),
    )
    wc = (
        Window.partitionBy("segment")
        .orderBy(F.col("band").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("segment")
    cum = g.select(
        "segment",
        "band",
        F.sum("n_pos").over(wc).cast("bigint").alias("tp"),
        F.sum("n_neg").over(wc).cast("bigint").alias("fp"),
        F.sum("n_pos").over(wt).cast("bigint").alias("pos_total"),
    )
    return cum.select(
        "segment",
        (F.col("band") * (_PR_BAND // 100)).alias("threshold_cents"),
        "tp",
        "fp",
        (F.col("pos_total") - F.col("tp")).alias("fn"),
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double")
        ).alias("precision"),
        (F.col("tp").cast("double") / F.col("pos_total").cast("double")).alias(
            "recall"
        ),
    ).orderBy("segment", "threshold_cents")
