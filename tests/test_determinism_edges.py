"""Edge-case canaries for the cross-engine determinism conventions
(SURVEY.md §5.2) that every oracle-checked query rests on:

- scaled-BIGINT sums: Spark ``round(x*scale)`` must equal DuckDB
  ``ROUND(x*scale)`` cast to BIGINT even at the classic half-cent
  traps (x.005, x.015, 2.675 — values whose binary expansion sits just
  below the decimal boundary);
- the portable 60-bit md5 hash: Spark conv(substr(md5)) must equal
  DuckDB's hex-literal cast for empty/unicode/long inputs;
- IEEE sqrt: correctly-rounded by spec, so bit-identical.

If any of these ever fails (engine upgrade, locale, JDK change), the
oracle conventions are broken repo-wide — better one loud canary than
160 mysterious hash mismatches.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.functions.exact import scaled_long

# binary-representation traps: 2.675 is famously 2.67499999999999982...
EDGE_VALUES = [
    0.005, 0.015, 0.025, 0.045, 0.065, 0.085,
    2.675, 1.005, 1.015, 2.665, 2.005,
    -0.005, -2.675, -1.005,
    0.0, 123456789.005, 0.125, 0.375,
]

EDGE_STRINGS = [
    "", "a", " ", "unicode-éü☃", "tab\tnewline\n",
    "0", "x" * 1000, "NATION_0|key", "split:42",
]


def test_scaled_long_matches_duckdb_round(spark):
    df = spark.createDataFrame([(v,) for v in EDGE_VALUES], "v double")
    got = {
        r.v: r.s
        for r in df.select("v", scaled_long(F.col("v"), 100).alias("s")).collect()
    }
    con = duckdb.connect()
    for v in EDGE_VALUES:
        want = con.execute(
            "SELECT CAST(ROUND(CAST(? AS DOUBLE) * 100) AS BIGINT)", [v]
        ).fetchone()[0]
        assert got[v] == want, f"scaled_long({v}) = {got[v]} != duckdb {want}"


def test_portable_hash_matches_duckdb(spark):
    df = spark.createDataFrame([(s,) for s in EDGE_STRINGS], "s string")
    expr = F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long")
    got = {r.s: r.h for r in df.select("s", expr.alias("h")).collect()}
    con = duckdb.connect()
    for s in EDGE_STRINGS:
        want = con.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)", [s]
        ).fetchone()[0]
        assert got[s] == want, f"phash({s!r}) = {got[s]} != duckdb {want}"


def test_sqrt_bitwise_matches_duckdb(spark):
    vals = [2.0, 3.0, 1e-30, 1e30, 123456.789, 0.1, 7.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r.v: r.q for r in df.select("v", F.sqrt("v").alias("q")).collect()}
    con = duckdb.connect()
    import struct

    for v in vals:
        want = con.execute("SELECT sqrt(CAST(? AS DOUBLE))", [v]).fetchone()[0]
        assert struct.pack("<d", got[v]) == struct.pack("<d", want)


@pytest.mark.parametrize("scale", [100, 10000, 1000000])
def test_scaled_sum_order_free(spark, scale):
    # the whole point of integer partial sums: any partition layout,
    # same total — 1-partition vs 32-partition sums must be identical
    df = spark.createDataFrame([(v,) for v in EDGE_VALUES * 50], "v double")
    one = df.coalesce(1).agg(F.sum(scaled_long(F.col("v"), scale))).first()[0]
    many = df.repartition(32).agg(F.sum(scaled_long(F.col("v"), scale))).first()[0]
    assert one == many
