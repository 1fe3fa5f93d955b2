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
    update are map-side-combining hash aggregates; the argmin is one
    window over vec_id.  No UDF, no driver-side loop state — the
    fixed-iteration fit is a single lazy plan, MLlib's KMeans cost
    shape expressed declaratively.""",
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
    )
    seeds = (
        emb.select("vec_id")
        .orderBy("vec_id")
        .limit(_K)
        .select(
            "vec_id",
            (F.row_number().over(Window.orderBy("vec_id")) - 1)
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
        wv = Window.partitionBy("vec_id").orderBy("dist2", "cid")
        assign = (
            dist.withColumn("rn", F.row_number().over(wv))
            .where(F.col("rn") == 1)
            .select("vec_id", "cid", "dist2")
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
