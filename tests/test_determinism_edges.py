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


def test_signed_truncating_division_matches_duckdb(spark):
    """Signed integer division canary for _tdiv_sql (ml.py).  Both
    engines happen to TRUNCATE integer division toward zero today
    (Spark ``-7 DIV 2`` = -3; DuckDB ``-7 // 2`` = -3, unlike
    Python's flooring ``//``), but that agreement is an
    implementation detail nothing in either engine's docs pins down —
    the helper routes signed division through ABS (where floor ==
    truncate by construction) so oracle parity survives either engine
    changing its mind.  Canary both the helper and the naked
    operators; if the naked assert ever fails, an engine changed
    semantics and every un-helped signed DIV in the repo needs audit."""
    from kafka_hadoop_loader_spark.operators.ml import _tdiv_sql

    cases = [(n, d) for n in (-7, -6, -1, 0, 1, 6, 7, -1000001, 999999)
             for d in (1, 2, 3, 1000000)]
    con = duckdb.connect()
    for n, d in cases:
        s_val = spark.sql(
            f"SELECT {_tdiv_sql(str(n), str(d), 'DIV')} AS v"
        ).collect()[0].v
        d_val = con.execute(
            f"SELECT {_tdiv_sql(str(n), str(d), '//')} AS v"
        ).fetchone()[0]
        assert s_val == d_val, (n, d, s_val, d_val)
        assert s_val == int(n / d)  # truncation toward zero
    # today's naked semantics: both truncate
    assert spark.sql("SELECT -7 DIV 2 AS v").collect()[0].v == -3
    assert con.execute("SELECT -7 // 2").fetchone()[0] == -3


def test_phash_kernel_matches_python_reference(spark):
    """Fuzz the Arrow-buffer aHash kernel (multimodal_phash_dedup)
    against a naive per-row Python reference: the buffer-level
    vectorization (offsets arithmetic, fused row x bucket bincount,
    cross-multiplied threshold) must agree with the obvious
    implementation on adversarial payloads — short rows, long rows,
    constant bytes, and the bucket-boundary lengths around 32."""
    import random

    import pyarrow as pa

    from kafka_hadoop_loader_spark.operators.multimodal import (
        _PHASH_BUCKETS,
        _phash_batches,
    )

    rng = random.Random(42)
    payloads = [
        bytes([7]),                       # single byte
        bytes([0] * 31),                  # below bucket count
        bytes([255] * 32),                # exactly bucket count, constant
        bytes([1] * 33),                  # one over
        bytes(rng.randrange(256) for _ in range(47)),   # fixture min
        bytes(rng.randrange(256) for _ in range(553)),  # fixture max
        bytes(rng.randrange(256) for _ in range(2048)),
        bytes([0, 255] * 100),            # alternating extremes
    ]

    def reference(b: bytes) -> int:
        n = len(b)
        tsum = sum(b)
        h = 0
        for bkt in range(_PHASH_BUCKETS):
            members = [b[i] for i in range(n) if i * _PHASH_BUCKETS // n == bkt]
            if members and sum(members) * n > tsum * len(members):
                h |= 1 << bkt
        return h

    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(list(range(len(payloads))), pa.int64()),
            pa.array(payloads, pa.binary()),
        ],
        names=["doc_id", "payload"],
    )
    out = list(_phash_batches(iter([batch])))
    assert len(out) == 1
    got = dict(
        zip(out[0].column("doc_id").to_pylist(), out[0].column("phash").to_pylist())
    )
    for i, p in enumerate(payloads):
        assert got[i] == reference(p), f"payload {i} (len {len(p)})"
    # sliced-batch path: non-zero arr.offset through the buffer math
    sl = batch.slice(2, 4)
    out2 = list(_phash_batches(iter([sl])))
    got2 = dict(
        zip(out2[0].column("doc_id").to_pylist(), out2[0].column("phash").to_pylist())
    )
    assert got2 == {i: got[i] for i in range(2, 6)}
