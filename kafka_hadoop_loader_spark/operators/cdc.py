"""CDC / merge operators: applying a change set (inserts, updates,
deletes) to a base table — the MERGE INTO / upsert pattern every
warehouse ingestion path needs.  Without a transactional table format in
the environment (no Delta/Iceberg), the apply step is expressed as the
underlying relational operation those formats execute: a keyed
full-outer join between base and changes with per-row precedence.

The change set here is DERIVED deterministically from the base table
(modular key predicates), so both engines construct bit-identical
inputs; a real pipeline reads the change stream from the loader
(streaming/loader.py) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.registry import register


@register(
    "merge_upsert",
    oracle="""
        WITH base AS (
            SELECT c_custkey AS k, c_name AS name, c_acctbal AS acctbal
            FROM customer
        ),
        changes AS (
            SELECT k, name, acctbal + 100.0 AS acctbal, 'U' AS op
            FROM base WHERE k % 10 = 0 AND k % 17 <> 0
            UNION ALL
            SELECT k, name, acctbal, 'D' AS op
            FROM base WHERE k % 17 = 0
            UNION ALL
            SELECT k + 1000000 AS k, 'new_' || name AS name,
                   0.0 AS acctbal, 'I' AS op
            FROM base WHERE k % 23 = 0
        )
        SELECT COALESCE(c.k, b.k) AS k,
               COALESCE(c.name, b.name) AS name,
               COALESCE(c.acctbal, b.acctbal) AS acctbal,
               COALESCE(c.op, 'K') AS op
        FROM base b FULL OUTER JOIN changes c ON b.k = c.k
        WHERE COALESCE(c.op, 'K') <> 'D'
        ORDER BY k
    """,
    doc="""MERGE INTO semantics (upsert + delete) as a keyed full-outer
    join: updates overwrite, deletes drop, inserts append, untouched
    base rows pass through tagged 'K'.  This is the exact physical plan
    Delta/Iceberg MERGE lowers to — a shuffle on the merge key then a
    per-row precedence resolve.

    Scale: one shuffle each side on the key (or zero for a bucketed
    base — the join_bucketed_colocated layout is built for exactly this
    repeated-merge use); change sets are typically tiny vs base, so AQE
    broadcasts them and the base is never shuffled at all.  Precedence
    is pure projection (COALESCE), no window needed, because change
    keys are unique per batch — the dedup-within-batch step (latest
    change per key wins) is window_topk_per_group applied upstream.""",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    upd = (
        base.where((F.col("k") % 10 == 0) & (F.col("k") % 17 != 0))
        .select("k", "name", (F.col("acctbal") + 100.0).alias("acctbal"))
        .withColumn("op", F.lit("U"))
    )
    dele = base.where(F.col("k") % 17 == 0).withColumn("op", F.lit("D"))
    ins = base.where(F.col("k") % 23 == 0).select(
        (F.col("k") + 1000000).alias("k"),
        F.concat(F.lit("new_"), F.col("name")).alias("name"),
        F.lit(0.0).alias("acctbal"),
        F.lit("I").alias("op"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    b = base.alias("b")
    c = changes.alias("c")
    return (
        b.join(c, F.col("b.k") == F.col("c.k"), "full_outer")
        .select(
            F.coalesce(F.col("c.k"), F.col("b.k")).alias("k"),
            F.coalesce(F.col("c.name"), F.col("b.name")).alias("name"),
            F.coalesce(F.col("c.acctbal"), F.col("b.acctbal")).alias("acctbal"),
            F.coalesce(F.col("c.op"), F.lit("K")).alias("op"),
        )
        .where(F.col("op") != "D")
        .orderBy("k")
    )


@register(
    "snapshot_diff",
    oracle="""
        WITH old AS (
            SELECT c_custkey AS k, c_name AS name, c_acctbal AS acctbal
            FROM customer WHERE c_custkey % 19 <> 0
        ),
        new AS (
            SELECT c_custkey AS k, c_name AS name,
                   CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 50.0
                        ELSE c_acctbal END AS acctbal
            FROM customer WHERE c_custkey % 23 <> 0
        )
        SELECT COALESCE(n.k, o.k) AS k,
               CASE WHEN o.k IS NULL THEN 'added'
                    WHEN n.k IS NULL THEN 'removed'
                    WHEN n.acctbal <> o.acctbal OR n.name <> o.name
                         THEN 'changed'
                    ELSE 'unchanged' END AS change,
               o.acctbal AS old_acctbal,
               n.acctbal AS new_acctbal
        FROM old o FULL OUTER JOIN new n ON o.k = n.k
        WHERE o.k IS NULL OR n.k IS NULL
           OR n.acctbal <> o.acctbal OR n.name <> o.name
        ORDER BY k
    """,
    doc="""Snapshot diff (table reconciliation): given two snapshots of
    a keyed table — old/new derived here by deterministic modular
    predicates so both engines build identical inputs — emit
    added/removed/changed rows with before/after values.  This is the
    read-side inverse of merge_upsert (diff DERIVES the change set that
    merge APPLIES), the audit primitive behind CDC validation and
    backfill reconciliation.

    Scale: one full-outer shuffle join on the key, the unavoidable
    minimum; in production both sides hash their non-key columns first
    (one narrow column crosses the shuffle instead of the full row) —
    elided here only because the fixture rows are narrow and the
    oracle needs the raw values.""",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    old = c.where(F.col("k") % 19 != 0)
    new = c.where(F.col("k") % 23 != 0).withColumn(
        "acctbal",
        F.when(F.col("k") % 7 == 0, F.col("acctbal") + 50.0).otherwise(
            F.col("acctbal")
        ),
    )
    o, n = old.alias("o"), new.alias("n")
    changed = (F.col("n.acctbal") != F.col("o.acctbal")) | (
        F.col("n.name") != F.col("o.name")
    )
    return (
        o.join(n, F.col("o.k") == F.col("n.k"), "full_outer")
        .select(
            F.coalesce(F.col("n.k"), F.col("o.k")).alias("k"),
            F.when(F.col("o.k").isNull(), "added")
            .when(F.col("n.k").isNull(), "removed")
            .when(changed, "changed")
            .otherwise("unchanged")
            .alias("change"),
            F.col("o.acctbal").alias("old_acctbal"),
            F.col("n.acctbal").alias("new_acctbal"),
        )
        .where(F.col("change") != "unchanged")
        .orderBy("k")
    )
