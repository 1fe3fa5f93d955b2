"""Data-layout operators: multi-dimensional z-order clustering and
schema-evolution-tolerant unions.

The reference's output layout is one-dimensional (topic/date/hour
directories, SURVEY.md §1.2).  At 100 TB the layout IS the query
optimizer's biggest lever: min/max footer stats only prune files when
rows with similar values are physically co-located, and a Z-order
(Morton) curve co-locates on TWO dimensions at once where a sort can
only do one.  This module makes the layout decision itself a queryable,
oracle-checkable computation.
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
from kafka_hadoop_loader_spark.plans.ranking import two_phase_rank
from kafka_hadoop_loader_spark.registry import register

# layout of the fragmented/compacted events copies (d is the partition
# column, kept STRING — declared read schema, never inferred)
_COMPACT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
        StructField("d", StringType()),
    ]
)

_ZBITS = 16  # bits per dimension -> 32-bit interleaved key
_N_FILES = 16

# Bit-interleave SUM(((x >> i) & 1) << (2i+1) | ((y >> i) & 1) << 2i),
# generated as a flat expression so both engines evaluate pure integer
# arithmetic (Spark: shiftleft/shiftright fns; DuckDB: << >> operators).
_Z_SPARK = " + ".join(
    f"(shiftleft(shiftright(x16, {i}) & 1, {2 * i + 1})"
    f" + shiftleft(shiftright(y16, {i}) & 1, {2 * i}))"
    for i in range(_ZBITS)
)
_Z_DUCK = " + ".join(
    f"((((x16 >> {i}) & 1) << {2 * i + 1}) + (((y16 >> {i}) & 1) << {2 * i}))"
    for i in range(_ZBITS)
)


@register(
    "zorder_layout",
    oracle=f"""
        WITH src AS (
            SELECT o_orderkey,
                   o_custkey % {1 << _ZBITS} AS x16,
                   (epoch_us(o_orderdate) // 86400000000) % {1 << _ZBITS}
                       AS y16
            FROM orders
        ),
        z AS (
            SELECT o_orderkey, x16, y16, {_Z_DUCK} AS zval FROM src
        ),
        assigned AS (
            SELECT x16, y16, 'zorder' AS layout,
                   CAST(ntile({_N_FILES}) OVER (ORDER BY zval, o_orderkey)
                        AS BIGINT) AS file_id
            FROM z
            UNION ALL
            SELECT x16, y16, 'natural' AS layout,
                   CAST(ntile({_N_FILES}) OVER (ORDER BY o_orderkey)
                        AS BIGINT) AS file_id
            FROM z
        )
        SELECT layout, file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(x16) AS BIGINT) AS min_cust,
               CAST(MAX(x16) AS BIGINT) AS max_cust,
               CAST(MIN(y16) AS BIGINT) AS min_day,
               CAST(MAX(y16) AS BIGINT) AS max_day,
               CAST(MAX(x16) - MIN(x16) AS BIGINT)
                   + CAST(MAX(y16) - MIN(y16) AS BIGINT) AS span_sum
        FROM assigned
        GROUP BY layout, file_id
        ORDER BY layout, file_id
    """,
    doc="""Z-order (Morton curve) file layout vs natural key order:
    interleave 16 bits of (custkey, order-day) into one integer sort
    key, chop the sorted stream into {n} equal files, and report each
    file's per-dimension min/max envelope — the exact stats a parquet
    footer exposes for pruning.  The z-ordered files' summed envelope
    spans come out far tighter on BOTH dimensions than the natural
    layout's (which is tight on the sort key only), which is the whole
    point: a predicate on either dimension skips most z-ordered files.

    Scale: the z-value is pure per-row integer arithmetic (fused into
    the scan); the production write is repartitionByRange(zval) +
    sortWithinPartitions — a single range shuffle, identical cost to
    any global sort, bought once at write time.  ntile here stands in
    for the range-partition boundaries so the file assignment is
    oracle-checkable.""".format(n=_N_FILES),
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    src = o.select(
        "o_orderkey",
        (F.col("o_custkey") % (1 << _ZBITS)).alias("x16"),
        (
            F.expr("unix_micros(cast(o_orderdate as timestamp)) DIV 86400000000")
            % (1 << _ZBITS)
        ).alias("y16"),
    )
    # materialize the morton projection once (lazy checkpoint): TWO
    # two-phase ranks read it three times each
    z = src.withColumn("zval", F.expr(_Z_SPARK)).localCheckpoint(eager=False)
    # two-phase distributed ntile (plans/ranking.py): value-bucketed
    # ranks, no single-partition WindowExec — same file assignment.
    by_z = two_phase_rank(
        z, "zval", [F.col("zval"), F.col("o_orderkey")],
        ntile=("file_id", _N_FILES),
    ).select("x16", "y16", F.lit("zorder").alias("layout"), "file_id")
    by_key = two_phase_rank(
        z, "o_orderkey", [F.col("o_orderkey")], ntile=("file_id", _N_FILES)
    ).select("x16", "y16", F.lit("natural").alias("layout"), "file_id")
    assigned = by_z.unionByName(by_key)
    return (
        assigned.groupBy("layout", "file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x16").cast("bigint").alias("min_cust"),
            F.max("x16").cast("bigint").alias("max_cust"),
            F.min("y16").cast("bigint").alias("min_day"),
            F.max("y16").cast("bigint").alias("max_day"),
            (
                (F.max("x16") - F.min("x16")).cast("bigint")
                + (F.max("y16") - F.min("y16")).cast("bigint")
            ).alias("span_sum"),
        )
        .orderBy("layout", "file_id")
    )


@register(
    "schema_evolution_union",
    oracle="""
        WITH v1 AS (
            SELECT event_id, ts, user_id, event_type,
                   CAST(NULL AS DOUBLE) AS value,
                   CAST(NULL AS VARCHAR) AS props,
                   CAST(1 AS BIGINT) AS schema_ver
            FROM events WHERE event_id % 2 = 0
        ),
        v2 AS (
            SELECT event_id, ts, user_id, event_type, value, props,
                   CAST(2 AS BIGINT) AS schema_ver
            FROM events WHERE event_id % 2 = 1
        )
        SELECT * FROM v1
        UNION ALL
        SELECT * FROM v2
        ORDER BY event_id
    """,
    doc="""Schema-evolution-tolerant union: merge two generations of the
    events feed — v1 landed before the (value, props) columns existed —
    into the current schema, null-filling the columns v1 lacks and
    tagging provenance.  Spark side is unionByName(
    allowMissingColumns=True), the mechanism that lets a reader span
    old and new loader output without rewriting history (the reference
    would re-run the whole load; SURVEY.md §2 scan rows).

    Scale: zero shuffle — a union is partition concatenation, and the
    null-fill is a projection fused into each side's scan.  The ORDER
    BY is presentation-only.""",
)
def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    v1 = (
        e.where(F.col("event_id") % 2 == 0)
        .select("event_id", "ts", "user_id", "event_type")
        .withColumn("schema_ver", F.lit(1).cast("bigint"))
    )
    v2 = (
        e.where(F.col("event_id") % 2 == 1)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("schema_ver", F.lit(2).cast("bigint"))
    )
    out = v1.unionByName(v2, allowMissingColumns=True)
    # unionByName appends v1's missing columns last; project to the
    # current catalog column order.
    return out.select(
        "event_id", "ts", "user_id", "event_type", "value", "props", "schema_ver"
    ).orderBy("event_id")


_compact_root: str | None = None


def _compact_dirs(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write (once per process per sf_dir) an intentionally fragmented
    date-partitioned copy of events — 8 writer tasks hashed on user_id,
    so every day directory gets up to 8 small files, exactly the layout
    a parallel streaming sink accumulates — and its compacted rewrite
    (repartition on the partition column → one file per day).  Same
    per-process temp-root lifecycle as joins._bucketed_tables."""
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    global _compact_root
    if _compact_root is None:
        _compact_root = tempfile.mkdtemp(prefix=f"khl_compact_{os.getpid()}_")
        atexit.register(shutil.rmtree, _compact_root, ignore_errors=True)

    tag = hashlib.md5(os.path.abspath(sf_dir.rstrip("/")).encode()).hexdigest()[:8]
    frag = os.path.join(_compact_root, f"frag_{tag}")
    compact = os.path.join(_compact_root, f"compact_{tag}")
    if not os.path.isdir(frag):
        ev = table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "value",
            F.date_format("ts", "yyyy-MM-dd").alias("d"),
        )
        ev.repartition(8, F.col("user_id")).write.partitionBy("d").mode(
            "overwrite"
        ).parquet(frag)
    if not os.path.isdir(compact):
        (
            spark.read.schema(_COMPACT_SCHEMA).parquet(frag)
            .repartition(F.col("d"))
            .write.partitionBy("d")
            .mode("overwrite")
            .parquet(compact)
        )
    return frag, compact


@register(
    "compact_small_files",
    oracle="""
        SELECT strftime(ts, '%Y-%m-%d') AS d,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS sum_value,
               CAST(1 AS BIGINT) AS files_after
        FROM events
        GROUP BY d
        ORDER BY d
    """,
    doc="""Small-files compaction (OPTIMIZE/rewrite): the maintenance
    job every long-running partitioned sink needs.  A fragmented copy
    of events (8 writer tasks x N days -> up to 8 small files per day
    directory) is rewritten with a repartition on the partition column
    so each day becomes exactly one right-sized file.  The query reads
    the COMPACTED layout and proves both halves of the contract: data
    identical (per-day counts and exact sums match the oracle computed
    on the original parquet) and layout fixed (files_after, measured
    from distinct input_file_name() per day — not assumed — must equal
    the 1 the oracle states; pytest separately checks the fragmented
    copy really had more).  At 100 TB, compaction is the difference
    between a scan planning 10^6 splits and 10^4.""",
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, compact = _compact_dirs(spark, sf_dir)
    return (
        spark.read.schema(_COMPACT_SCHEMA).parquet(compact)
        # partition-column type inference turns d= into DATE; the
        # contract (and the oracle) use the directory string form
        .withColumn("d", F.date_format("d", "yyyy-MM-dd"))
        # project the file name before aggregating (non-deterministic
        # expressions may not appear inside aggregate arguments)
        .withColumn("fname", F.input_file_name())
        .groupBy("d")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("user_id").alias("sum_user_id"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / 100.0
            ).alias("sum_value"),
            F.countDistinct("fname").alias("files_after"),
        )
        .orderBy("d")
    )


# The audit predicate: a 100x-selective value band a reader might push.
_ZM_LO, _ZM_HI = 42.0, 44.0


@register(
    "zone_map_pruning",
    oracle=f"""
        WITH zm AS (
            SELECT strftime(ts, '%Y-%m-%d') AS d,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   MIN(value) AS zmin,
                   MAX(value) AS zmax
            FROM events
            GROUP BY d
        )
        SELECT d, n_rows, zmin, zmax,
               (zmax < {_ZM_LO} OR zmin > {_ZM_HI}) AS skippable,
               CAST(CASE WHEN zmax < {_ZM_LO} OR zmin > {_ZM_HI}
                         THEN 0 ELSE n_rows END AS BIGINT) AS rows_scanned
        FROM zm
        ORDER BY d
    """,
    doc=f"""Zone-map (min/max) pruning audit — the file-skipping math
    every columnar table format (parquet row groups, Iceberg/Delta file
    stats) applies before touching data: per daily partition, the
    min/max "zone" of `value` is collected, and a point-lookup band
    predicate ({_ZM_LO} <= value <= {_ZM_HI}) is tested against each
    zone.  A partition whose zone misses the band is skippable without
    reading a row; `rows_scanned` is the residual I/O the predicate
    actually pays.

    This is the observability half of data layout work: zorder_layout
    IMPROVES zone tightness, this measures what the zones BUY.  A
    layout where every zone spans the whole domain (random order) scans
    everything; after clustering on `value`, most partitions become
    skippable — the ratio Σrows_scanned / Σn_rows is the layout's
    skip-rate under this probe.

    Scale: one hash aggregate over the scan (map-side min/max combine);
    at 100 TB these stats come free from the table format's manifest,
    and this query runs over the MANIFEST, not the data.""",
)
def zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    zm = (
        e.groupBy(F.date_format(F.col("ts"), "yyyy-MM-dd").alias("d"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("value").alias("zmin"),
            F.max("value").alias("zmax"),
        )
    )
    skippable = (F.col("zmax") < _ZM_LO) | (F.col("zmin") > _ZM_HI)
    return (
        zm.select(
            "d",
            "n_rows",
            "zmin",
            "zmax",
            skippable.alias("skippable"),
            F.when(skippable, F.lit(0))
            .otherwise(F.col("n_rows"))
            .cast("bigint")
            .alias("rows_scanned"),
        )
        .orderBy("d")
    )


_N_SHARDS = 8


@register(
    "shard_plan_balanced",
    oracle=f"""
        WITH sized AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS sz,
                   row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
            FROM documents
        ),
        assigned AS (
            SELECT doc_id, sz, CAST((rk - 1) % {_N_SHARDS} AS BIGINT) AS shard
            FROM sized
        ),
        per AS (
            SELECT shard,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(sz) AS BIGINT) AS shard_bytes,
                   CAST(MAX(sz) AS BIGINT) AS max_doc
            FROM assigned GROUP BY shard
        ),
        g AS (
            SELECT CAST(MAX(shard_bytes) AS BIGINT) AS mx,
                   CAST(MIN(shard_bytes) AS BIGINT) AS mn
            FROM per
        )
        SELECT p.shard, p.n_docs, p.shard_bytes, p.max_doc,
               CAST(g.mx - g.mn AS BIGINT) AS spread_bytes,
               CAST(g.mx - g.mn AS DOUBLE) / CAST(g.mx AS DOUBLE)
                   AS imbalance_frac
        FROM per p CROSS JOIN g
        ORDER BY p.shard
    """,
    doc=f"""Balanced export sharding — the dataset-publishing step that
    splits a corpus into {_N_SHARDS} shards (webdataset tars, TFRecord
    files) with near-equal bytes: documents rank by size descending and
    deal round-robin (rank mod shards), the classic LPT-lite heuristic
    whose imbalance is bounded by one max-document regardless of the
    size distribution.  Output is the shard manifest: per-shard doc
    count, byte total, largest member, plus the global spread — the
    number a training-data loader's stragglers depend on.

    Determinism: the rank rides a total order (size DESC, doc_id);
    everything else is integer arithmetic plus one final division.

    Scale: one global sort-rank (range-partitioned window at 100 TB,
    same cost shape as zorder_layout's ntile) and one |shards|-row
    aggregate; the alternative greedy bin-packing needs a sequential
    pass and buys <1 max-doc of extra balance.""",
)
def shard_plan_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sized = two_phase_rank(
        d.select("doc_id", F.col("n_chars").cast("bigint").alias("sz")),
        "sz",
        [F.col("sz").desc(), F.col("doc_id")],
        descending=True,
        row_number_col="rk",
    )
    assigned = sized.select(
        "doc_id", "sz", ((F.col("rk") - 1) % _N_SHARDS).cast("bigint").alias("shard")
    )
    per = assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("sz").cast("bigint").alias("shard_bytes"),
        F.max("sz").cast("bigint").alias("max_doc"),
    )
    g = per.agg(
        F.max("shard_bytes").alias("mx"), F.min("shard_bytes").alias("mn")
    )
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "shard",
            "n_docs",
            "shard_bytes",
            "max_doc",
            (F.col("mx") - F.col("mn")).cast("bigint").alias("spread_bytes"),
            ((F.col("mx") - F.col("mn")).cast("double") / F.col("mx").cast("double")).alias(
                "imbalance_frac"
            ),
        )
        .orderBy("shard")
    )


# --- Hilbert-curve layout -------------------------------------------------
_HBITS = 8  # bits per dimension -> 256x256 grid, d in [0, 65535]
_H_FILES = 16


def _hilbert_step_exprs(bits: int) -> list[tuple[str, str, str]]:
    """Unrolled xy2d Hilbert steps as (d, x, y) SQL expressions over
    input columns (hx, hy, hd).

    One step of the classic iterative conversion, for literal s:
        rx = (x & s) > 0;  ry = (y & s) > 0
        d += s*s * ((3*rx) XOR ry)
        if ry == 0: { if rx == 1: x,y = s-1-x, s-1-y;  swap(x, y) }
    The XOR of the 2-bit quadrant code is enumerated as a CASE (DuckDB's
    ``^`` is exponentiation, so XOR is the one non-portable operator);
    everything else is +,-,*,& — identical text, identical integers in
    both engines.  Within a step all three outputs read the step's
    INPUT columns (SQL aliases are not visible to sibling expressions),
    so each step is a single projection.
    """
    steps = []
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        quad = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 AND {ry} = 1 THEN 1 "
            f"WHEN {rx} = 1 AND {ry} = 1 THEN 2 ELSE 3 END)"
        )
        d = f"hd + {s * s} * {quad}"
        nx = f"(CASE WHEN {ry} = 1 THEN hx WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END)"
        ny = f"(CASE WHEN {ry} = 1 THEN hy WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END)"
        steps.append((d, nx, ny))
    return steps


# 8-bit morton for the in-query comparison arm (shift-free: * powers of
# 2; integer division spelled per engine — Spark DIV, DuckDB // — on
# non-negative operands, where both truncate identically)
def _z8(div: str) -> str:
    return " + ".join(
        f"((((x8 {div} {1 << i}) % 2) * {1 << (2 * i + 1)})"
        f" + (((y8 {div} {1 << i}) % 2) * {1 << (2 * i)}))"
        for i in range(_HBITS)
    )


def _hilbert_oracle() -> str:
    ctes = [
        f"""src AS (
            SELECT o_orderkey,
                   o_custkey % {1 << _HBITS} AS x8,
                   (epoch_us(o_orderdate) // 86400000000) % {1 << _HBITS}
                       AS y8
            FROM orders
        )""",
        f"""h0 AS (
            SELECT o_orderkey, x8, y8, x8 AS hx, y8 AS hy,
                   CAST(0 AS BIGINT) AS hd
            FROM src
        )""",
    ]
    prev = "h0"
    for n, (d, nx, ny) in enumerate(_hilbert_step_exprs(_HBITS), start=1):
        ctes.append(
            f"""h{n} AS (
            SELECT o_orderkey, x8, y8, {nx} AS hx, {ny} AS hy, {d} AS hd
            FROM {prev}
        )"""
        )
        prev = f"h{n}"
    return f"""
        WITH {",".join(ctes)},
        keyed AS (
            SELECT o_orderkey, x8, y8, hd AS hval, {_z8('//')} AS zval
            FROM {prev}
        ),
        assigned AS (
            SELECT x8, y8, 'hilbert' AS layout,
                   CAST(ntile({_H_FILES}) OVER (ORDER BY hval, o_orderkey)
                        AS BIGINT) AS file_id
            FROM keyed
            UNION ALL
            SELECT x8, y8, 'zorder8' AS layout,
                   CAST(ntile({_H_FILES}) OVER (ORDER BY zval, o_orderkey)
                        AS BIGINT) AS file_id
            FROM keyed
        )
        SELECT layout, file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(x8) AS BIGINT) AS min_x,
               CAST(MAX(x8) AS BIGINT) AS max_x,
               CAST(MIN(y8) AS BIGINT) AS min_y,
               CAST(MAX(y8) AS BIGINT) AS max_y,
               CAST(MAX(x8) - MIN(x8) AS BIGINT)
                   + CAST(MAX(y8) - MIN(y8) AS BIGINT) AS span_sum
        FROM assigned
        GROUP BY layout, file_id
        ORDER BY layout, file_id
    """


@register(
    "hilbert_layout",
    oracle=_hilbert_oracle(),
    doc=f"""Hilbert-curve file layout vs Z-order on the same
    (custkey, order-day) 8-bit grid: the Hilbert curve never takes the
    long diagonal jumps Morton interleaving does, so its equal-size
    file envelopes are tighter on both dimensions — the reason Delta
    and Iceberg grew OPTIMIZE ZORDER *and* Hilbert clustering.  The
    curve index is the classic iterative xy2d conversion, unrolled into
    {_HBITS} integer projection steps generated from ONE template for
    both engines (see _hilbert_step_exprs); file assignment is the
    two-phase distributed ntile (plans/ranking.py) — no
    single-partition window, same contract as zorder_layout.

    Scale: the curve key is pure per-row integer arithmetic fused into
    the scan; the production write is repartitionByRange(hval) +
    sortWithinPartitions, one range shuffle bought at write time; the
    ntile here stands in so the assignment is oracle-checkable.""",
)
def hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    df = o.select(
        "o_orderkey",
        (F.col("o_custkey") % (1 << _HBITS)).alias("x8"),
        (
            F.expr("unix_micros(cast(o_orderdate as timestamp)) DIV 86400000000")
            % (1 << _HBITS)
        ).alias("y8"),
    ).selectExpr("o_orderkey", "x8", "y8", "x8 AS hx", "y8 AS hy", "CAST(0 AS BIGINT) AS hd")
    for d, nx, ny in _hilbert_step_exprs(_HBITS):
        df = df.selectExpr(
            "o_orderkey", "x8", "y8",
            f"{nx} AS hx", f"{ny} AS hy", f"{d} AS hd",
        )
    keyed = df.selectExpr(
        "o_orderkey", "x8", "y8", "hd AS hval", f"{_z8('DIV')} AS zval"
    ).localCheckpoint(eager=False)
    by_h = two_phase_rank(
        keyed, "hval", [F.col("hval"), F.col("o_orderkey")],
        ntile=("file_id", _H_FILES),
    ).select("x8", "y8", F.lit("hilbert").alias("layout"), "file_id")
    by_z = two_phase_rank(
        keyed, "zval", [F.col("zval"), F.col("o_orderkey")],
        ntile=("file_id", _H_FILES),
    ).select("x8", "y8", F.lit("zorder8").alias("layout"), "file_id")
    assigned = by_h.unionByName(by_z)
    return (
        assigned.groupBy("layout", "file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x8").cast("bigint").alias("min_x"),
            F.max("x8").cast("bigint").alias("max_x"),
            F.min("y8").cast("bigint").alias("min_y"),
            F.max("y8").cast("bigint").alias("max_y"),
            (
                (F.max("x8") - F.min("x8")).cast("bigint")
                + (F.max("y8") - F.min("y8")).cast("bigint")
            ).alias("span_sum"),
        )
        .orderBy("layout", "file_id")
    )
