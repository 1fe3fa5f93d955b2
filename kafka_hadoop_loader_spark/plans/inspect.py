"""Physical-plan inspection helpers — the engine's seatbelt for its
100 TB posture.  The reference has no optimizer to inspect (its plan is
the fixed scan->map->write pipeline [pub: …/HadoopJob.java]); this
engine delegates planning to Catalyst and VERIFIES the outcome instead:
tests assert pushdown reached the scan, dimensions broadcast, hot paths
stayed inside whole-stage codegen.

Used by tests/test_plans.py; also handy interactively:

    from kafka_hadoop_loader_spark.plans.inspect import formatted_plan
    print(formatted_plan(df))
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """Untruncated ``explain("formatted")`` output as a string.

    Raises the metadata truncation limits first: the default 100-char
    clip hides exactly the interesting parts (PushedFilters, ReadSchema).
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def executed_plan(df: DataFrame) -> str:
    """The AQE-final physical plan (after execution; run an action first
    or this shows the initial plan).  ``*(N)`` prefixes mark
    whole-stage-codegen stages."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every scan in the plan (flattened)."""
    out: list[str] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            inner = line.split("[", 1)[-1].rsplit("]", 1)[0]
            out.extend(p.strip() for p in inner.split(",") if p.strip())
    return out


def scan_columns(df: DataFrame) -> list[str]:
    """Column names in every scan's ReadSchema — what actually gets read
    off disk after pruning."""
    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            schema = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(c.split(":")[0].strip() for c in schema.split(",") if c.strip())
    return cols


def has_node(df: DataFrame, node: str) -> bool:
    """True if the formatted plan contains the given physical node name
    (e.g. "BroadcastHashJoin", "TakeOrderedAndProject")."""
    return node in formatted_plan(df)
