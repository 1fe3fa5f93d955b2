"""Spatial join via grid blocking — the classic point-in-rectangle
workload expressed relationally, with the candidate-generation pattern
(cover every rectangle by the grid cells it touches, hash-join points
to cells, verify exact containment on candidates only) that scales the
same way every spatial engine's partitioned R-tree does.

No geo library exists in this environment (and none is needed for
axis-aligned rectangles): geometry is pure arithmetic, which also makes
the whole operator oracle-checkable in DuckDB.

Synthetic geometry derives deterministically from the fixtures:
- points: one per event — x = value (0..100-ish), y = user_id % 100;
- rectangles: one per region×5 offsets — a deterministic 25-rect grid
  spread over the same domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.registry import register

_CELL = 10.0  # grid cell size; rectangles are ≤ 2 cells wide


@register(
    "spatial_join_grid",
    oracle=f"""
        WITH pts AS (
            SELECT event_id,
                   value AS x,
                   CAST(user_id % 100 AS DOUBLE) AS y
            FROM events
        ),
        rects AS (
            SELECT r_regionkey * 5 + o AS rect_id,
                   CAST(r_regionkey * 17 + o * 13 AS DOUBLE) AS x_lo,
                   CAST(r_regionkey * 17 + o * 13 + 11 AS DOUBLE) AS x_hi,
                   CAST(r_regionkey * 23 + o * 7 AS DOUBLE) AS y_lo,
                   CAST(r_regionkey * 23 + o * 7 + 15 AS DOUBLE) AS y_hi
            FROM region, unnest(generate_series(0, 4)) AS u(o)
        ),
        rect_cells AS (
            SELECT rect_id, x_lo, x_hi, y_lo, y_hi, cx, cy
            FROM rects,
                 unnest(generate_series(CAST(FLOOR(x_lo / {_CELL}) AS INT),
                                        CAST(FLOOR(x_hi / {_CELL}) AS INT))) AS ux(cx),
                 unnest(generate_series(CAST(FLOOR(y_lo / {_CELL}) AS INT),
                                        CAST(FLOOR(y_hi / {_CELL}) AS INT))) AS uy(cy)
        ),
        pt_cells AS (
            SELECT event_id, x, y,
                   CAST(FLOOR(x / {_CELL}) AS INT) AS cx,
                   CAST(FLOOR(y / {_CELL}) AS INT) AS cy
            FROM pts
        ),
        hits AS (
            SELECT r.rect_id, p.event_id
            FROM pt_cells p JOIN rect_cells r
              ON p.cx = r.cx AND p.cy = r.cy
            WHERE p.x >= r.x_lo AND p.x < r.x_hi
              AND p.y >= r.y_lo AND p.y < r.y_hi
        )
        SELECT r.rect_id,
               CAST(COUNT(h.event_id) AS BIGINT) AS n_points,
               CAST(MIN(h.event_id) AS BIGINT) AS min_event_id
        FROM rects r LEFT JOIN hits h ON r.rect_id = h.rect_id
        GROUP BY r.rect_id
        ORDER BY r.rect_id
    """,
    doc="""Point-in-rectangle spatial join with GRID BLOCKING: each
    rectangle is replicated to every grid cell it overlaps, each point
    hashes to exactly one cell, and the join is a plain equi-join on
    (cx, cy) followed by exact containment verification — candidates
    only, never all-pairs.  Half-open edges ([lo, hi)) make membership
    unambiguous on boundaries.

    Scale: this is the partitioned-spatial-join shape (SpatialSpark /
    Sedona's grid partitioner): replication factor = avg cells per
    rectangle (≤ 4 here), the join shuffles on cell key so co-located
    cells join locally, and skewed cells split further by salting the
    cell key.  A theta-join (p.x BETWEEN r.x_lo AND r.x_hi AND …)
    would be a broadcast nested loop — fine for 25 rectangles, fatal
    for 25 million; the blocking form is linear in points + replicated
    rectangles either way.""",
)
def spatial_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    r = table(spark, sf_dir, "region")
    pts = e.select(
        "event_id",
        F.col("value").alias("x"),
        (F.col("user_id") % 100).cast("double").alias("y"),
    )
    offsets = F.explode(F.sequence(F.lit(0), F.lit(4))).alias("o")
    rects = r.select("r_regionkey", offsets).select(
        (F.col("r_regionkey") * 5 + F.col("o")).alias("rect_id"),
        (F.col("r_regionkey") * 17 + F.col("o") * 13).cast("double").alias("x_lo"),
        (F.col("r_regionkey") * 17 + F.col("o") * 13 + 11).cast("double").alias("x_hi"),
        (F.col("r_regionkey") * 23 + F.col("o") * 7).cast("double").alias("y_lo"),
        (F.col("r_regionkey") * 23 + F.col("o") * 7 + 15).cast("double").alias("y_hi"),
    )
    cell = lambda c: F.floor(c / _CELL).cast("int")  # noqa: E731
    rect_cells = rects.select(
        "*",
        F.explode(F.sequence(cell(F.col("x_lo")), cell(F.col("x_hi")))).alias("cx"),
    ).select(
        "*",
        F.explode(F.sequence(cell(F.col("y_lo")), cell(F.col("y_hi")))).alias("cy"),
    )
    pt_cells = pts.select(
        "event_id", "x", "y", cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy")
    )
    hits = (
        pt_cells.join(F.broadcast(rect_cells), ["cx", "cy"])
        .where(
            (F.col("x") >= F.col("x_lo"))
            & (F.col("x") < F.col("x_hi"))
            & (F.col("y") >= F.col("y_lo"))
            & (F.col("y") < F.col("y_hi"))
        )
        .select("rect_id", "event_id")
    )
    return (
        rects.join(hits, "rect_id", "left")
        .groupBy("rect_id")
        .agg(
            F.count("event_id").alias("n_points"),
            F.min("event_id").alias("min_event_id"),
        )
        .orderBy("rect_id")
    )
