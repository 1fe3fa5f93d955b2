"""Property-based cross-engine parity: hypothesis generates small
tables (ints, strings, doubles-on-a-decimal-grid, NULLs) and the same
relational query runs in Spark and DuckDB; results must agree exactly.

This probes the semantic seams the fixture oracles can't reach —
NULL handling in predicates/joins/aggregates, empty groups, duplicate
keys, negative numbers, empty strings — with inputs nobody hand-picked.
Shapes covered: filter+project, groupBy aggregate, inner + left join,
and ORDER BY with NULL placement.

Determinism rules apply here too: doubles live on a 2-decimal grid and
aggregate via scaled BIGINTs, so equality is exact, not approximate.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Multi-minute robustness pass: excluded from the default (driver-capped)
# run; `pytest -m slow` runs it (see pytest.ini).
pytestmark = pytest.mark.slow


# ---- value/table strategies ------------------------------------------

_keys = st.integers(min_value=-3, max_value=3)
_ints = st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000))
_cents = st.one_of(
    st.none(),
    st.integers(min_value=-99999, max_value=99999).map(lambda c: c / 100.0),
)
_strs = st.one_of(
    st.none(), st.sampled_from(["", "a", "b", "ab", "z", "é", "A", " "])
)

_rows = st.lists(st.tuples(_keys, _ints, _cents, _strs), min_size=0, max_size=25)
_rows_b = st.lists(st.tuples(_keys, _ints), min_size=0, max_size=15)

_SCHEMA_A = "k long, i long, d double, s string"


def _mk_tables(spark, duck, rows, rows_b=None):
    df = spark.createDataFrame(rows, _SCHEMA_A) if rows else spark.createDataFrame(
        [], _SCHEMA_A
    )
    df.createOrReplaceTempView("fz_a")
    duck.execute("DROP TABLE IF EXISTS fz_a")
    duck.execute("CREATE TABLE fz_a (k BIGINT, i BIGINT, d DOUBLE, s VARCHAR)")
    if rows:
        duck.executemany("INSERT INTO fz_a VALUES (?, ?, ?, ?)", rows)
    if rows_b is not None:
        dfb = (
            spark.createDataFrame(rows_b, "k long, v long")
            if rows_b
            else spark.createDataFrame([], "k long, v long")
        )
        dfb.createOrReplaceTempView("fz_b")
        duck.execute("DROP TABLE IF EXISTS fz_b")
        duck.execute("CREATE TABLE fz_b (k BIGINT, v BIGINT)")
        if rows_b:
            duck.executemany("INSERT INTO fz_b VALUES (?, ?)", rows_b)


def _both(spark, duck, sql: str):
    got = [tuple(r) for r in spark.sql(sql).collect()]
    want = duck.execute(sql).fetchall()
    canon = lambda rows: sorted(repr(r) for r in rows)  # noqa: E731
    assert canon(got) == canon(want), f"\nSQL: {sql}\nspark={got}\nduck={want}"


@pytest.fixture(scope="module")
def fuzz_duck():
    return duckdb.connect()


_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(rows=_rows)
@_SETTINGS
def test_fuzz_filter_project(spark, fuzz_duck, rows):
    _mk_tables(spark, fuzz_duck, rows)
    _both(
        spark,
        fuzz_duck,
        """
        SELECT k, i, s
        FROM fz_a
        WHERE (i > 0 AND s IS NOT NULL) OR k = 2
        """,
    )


@given(rows=_rows)
@_SETTINGS
def test_fuzz_group_agg(spark, fuzz_duck, rows):
    _mk_tables(spark, fuzz_duck, rows)
    # COUNT semantics under NULLs + exact scaled sum of the decimal grid
    _both(
        spark,
        fuzz_duck,
        """
        SELECT k,
               COUNT(*) AS n_rows,
               COUNT(i) AS n_i,
               CAST(SUM(CAST(ROUND(d * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
               CAST(MIN(s) AS STRING) AS min_s
        FROM fz_a
        GROUP BY k
        """,
    )


@given(rows=_rows, rows_b=_rows_b)
@_SETTINGS
def test_fuzz_joins(spark, fuzz_duck, rows, rows_b):
    _mk_tables(spark, fuzz_duck, rows, rows_b)
    _both(
        spark,
        fuzz_duck,
        """
        SELECT a.k, a.i, b.v
        FROM fz_a a JOIN fz_b b ON a.k = b.k
        WHERE b.v IS NULL OR b.v >= a.k
        """,
    )
    _both(
        spark,
        fuzz_duck,
        """
        SELECT a.k, b.v
        FROM fz_a a LEFT JOIN fz_b b ON a.k = b.k AND b.v > 0
        """,
    )


@given(rows=_rows)
@_SETTINGS
def test_fuzz_distinct_nulls(spark, fuzz_duck, rows):
    _mk_tables(spark, fuzz_duck, rows)
    # DISTINCT treats NULLs as equal in both engines; verify
    _both(spark, fuzz_duck, "SELECT DISTINCT k, s FROM fz_a")


@given(rows=_rows)
@_SETTINGS
def test_fuzz_window(spark, fuzz_duck, rows):
    _mk_tables(spark, fuzz_duck, rows)
    # rank/row_number over a TOTAL order (k, i, s, d is not unique —
    # add a synthetic uniquifier via row content hash is overkill;
    # instead aggregate the window output so tie order cancels)
    _both(
        spark,
        fuzz_duck,
        """
        SELECT k,
               COUNT(*) AS n,
               CAST(SUM(rnk) AS BIGINT) AS sum_rnk,
               CAST(MAX(dr) AS BIGINT) AS max_dense
        FROM (
            SELECT k,
                   rank() OVER (PARTITION BY k ORDER BY i NULLS FIRST) AS rnk,
                   dense_rank() OVER (PARTITION BY k ORDER BY i NULLS FIRST) AS dr
            FROM fz_a
        )
        GROUP BY k
        """,
    )


@given(rows=_rows, rows_b=_rows_b)
@_SETTINGS
def test_fuzz_setops(spark, fuzz_duck, rows, rows_b):
    _mk_tables(spark, fuzz_duck, rows, rows_b)
    for op in ("UNION", "UNION ALL", "INTERSECT", "EXCEPT"):
        _both(
            spark,
            fuzz_duck,
            f"""
            SELECT k, i FROM fz_a
            {op}
            SELECT k, v FROM fz_b
            """,
        )


@given(rows=_rows)
@_SETTINGS
def test_fuzz_having_orderby_limit(spark, fuzz_duck, rows):
    _mk_tables(spark, fuzz_duck, rows)
    # LIMIT rides a total order (k is unique post-GROUP BY)
    _both(
        spark,
        fuzz_duck,
        """
        SELECT k, COUNT(i) AS n_i
        FROM fz_a
        GROUP BY k
        HAVING COUNT(*) >= 2
        ORDER BY n_i DESC, k
        LIMIT 3
        """,
    )


# ---- sessionization parity (the round-4 _capped_sessions seam) --------

from kafka_hadoop_loader_spark.operators.timeseries import (  # noqa: E402
    _SESSION_GAP_US as _GAP,
)

# gap selectors deliberately include the EXACT boundary (diff == gap,
# which must NOT open a session under the strict-> rule) and both
# off-by-one-microsecond neighbours
_gap_steps = st.sampled_from([0, 1, _GAP - 1, _GAP, _GAP + 1, 5 * _GAP])
_sess_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2), _gap_steps),
    min_size=0,
    max_size=20,
)


@_SETTINGS
@given(rows=_sess_rows)
def test_capped_sessions_matches_duckdb_gap_cte(spark, fuzz_duck, rows):
    """_capped_sessions (Spark windows) vs the oracle's gap CTE on
    generated timelines with boundary-exact inter-event gaps.  An
    engine disagreeing on `diff == gap` (the session_window half-open
    seam window_session_native pins) would flip session counts here."""
    from pyspark.sql import functions as F

    from kafka_hadoop_loader_spark.operators.timeseries import _capped_sessions

    # build per-user cumulative timelines; event_id = insertion index
    ts_by_user: dict[int, int] = {}
    recs = []
    for i, (u, step) in enumerate(rows):
        ts_by_user[u] = ts_by_user.get(u, 1_000_000) + step
        recs.append((u, i, "x", ts_by_user[u]))
    schema = "user_id long, event_id long, event_type string, ts_us long"
    df = (
        spark.createDataFrame(recs, schema)
        if recs
        else spark.createDataFrame([], schema)
    )
    agged = (
        _capped_sessions(df)
        .groupBy("user_id", "sess_id")
        .agg(
            F.count("*").alias("n"),
            F.min("ts_us").alias("lo"),
            F.max("ts_us").alias("hi"),
        )
    )
    got = sorted((r.user_id, r.sess_id, r.n, r.lo, r.hi) for r in agged.collect())
    fuzz_duck.execute("DROP TABLE IF EXISTS fz_ev")
    fuzz_duck.execute(
        "CREATE TABLE fz_ev (user_id BIGINT, event_id BIGINT,"
        " event_type VARCHAR, ts_us BIGINT)"
    )
    if recs:
        fuzz_duck.executemany("INSERT INTO fz_ev VALUES (?, ?, ?, ?)", recs)
    want = sorted(
        tuple(r)
        for r in fuzz_duck.execute(f"""
            WITH ordered AS (
                SELECT user_id, event_id, ts_us,
                       CASE WHEN lag(ts_us) OVER w IS NULL
                              OR ts_us - lag(ts_us) OVER w > {_GAP}
                            THEN 1 ELSE 0 END AS is_new
                FROM fz_ev
                WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
            ),
            sess AS (
                SELECT user_id, ts_us,
                       SUM(is_new) OVER (PARTITION BY user_id
                                         ORDER BY ts_us, event_id
                                         ROWS UNBOUNDED PRECEDING) AS sess_id
                FROM ordered
            )
            SELECT user_id, CAST(sess_id AS BIGINT), CAST(COUNT(*) AS BIGINT),
                   MIN(ts_us), MAX(ts_us)
            FROM sess GROUP BY user_id, sess_id
        """).fetchall()
    )
    assert got == want


# ---- t-digest compressor invariants (pure function, no engines) -------

# max_size must exceed 2*_TD_DELTA (512): below it the size-bound
# assertion is vacuous — a compressor that never merges would pass
_td_values = st.lists(
    st.integers(min_value=-10_000_00, max_value=10_000_00).map(
        lambda c: c / 100.0
    ),
    min_size=1,
    max_size=700,
)


@_SETTINGS
@given(vals=_td_values)
def test_td_compress_invariants(vals):
    """For ANY input: total weight conserved exactly (unit weights sum
    on small ints — no float loss), centroid means sorted and inside
    the data range, centroid count within the 2*delta size bound, and
    every interpolated quantile inside [min, max]."""
    from kafka_hadoop_loader_spark.operators.sketch import (
        _TD_DELTA,
        _td_compress,
        _td_quantile,
    )

    v = sorted(vals)
    m, w = _td_compress(v, [1.0] * len(v), float(len(v)), _TD_DELTA)
    assert sum(w) == float(len(v))
    assert m == sorted(m)
    assert len(m) <= 2 * _TD_DELTA
    assert v[0] <= m[0] and m[-1] <= v[-1]
    for q in (0.0, 0.01, 0.5, 0.99, 1.0):
        est = _td_quantile(m, w, q)
        assert v[0] <= est <= v[-1]


# ---- round-7 shapes: frames, lag, ALL set-ops, rollup, subqueries -----
#
# Tie discipline for the window shapes: ORDER BY lists EVERY column, so
# rows tying on the full key are bit-identical rows — any permutation
# among them yields the same MULTISET of window outputs, which is what
# the canonicalized comparison checks.  (A partial order would make
# running sums legitimately engine-dependent; that's a test bug the
# round-2 shapes avoided by aggregating ranks, this avoids by total
# order.)


@given(rows=_rows)
@_SETTINGS
def test_fuzz_window_frames_and_lag(spark, fuzz_duck, rows):
    _mk_tables(spark, fuzz_duck, rows)
    _both(
        spark,
        fuzz_duck,
        """
        SELECT k,
               CAST(SUM(COALESCE(i, 0)) OVER (
                   PARTITION BY k
                   ORDER BY i NULLS FIRST, d NULLS FIRST, s NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS run_i,
               CAST(COUNT(*) OVER (
                   PARTITION BY k
                   ORDER BY i NULLS FIRST, d NULLS FIRST, s NULLS FIRST
                   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
               ) AS BIGINT) AS near_n,
               lag(i) OVER (
                   PARTITION BY k
                   ORDER BY i NULLS FIRST, d NULLS FIRST, s NULLS FIRST
               ) AS prev_i,
               lead(s, 1, 'EOG') OVER (
                   PARTITION BY k
                   ORDER BY i NULLS FIRST, d NULLS FIRST, s NULLS FIRST
               ) AS next_s
        FROM fz_a
        """,
    )


@given(rows=_rows, rows_b=_rows_b)
@_SETTINGS
def test_fuzz_setops_all(spark, fuzz_duck, rows, rows_b):
    # bag semantics: duplicate counts must subtract/intersect exactly
    _mk_tables(spark, fuzz_duck, rows, rows_b)
    for op in ("INTERSECT ALL", "EXCEPT ALL"):
        _both(
            spark,
            fuzz_duck,
            f"""
            SELECT k, i FROM fz_a
            {op}
            SELECT k, v FROM fz_b
            """,
        )


@given(rows=_rows)
@_SETTINGS
def test_fuzz_rollup_grouping(spark, fuzz_duck, rows):
    # subtotal NULL markers vs genuine NULL group keys: GROUPING()
    # disambiguates; counts and exact cent sums must agree per cell.
    # KNOWN DIVERGENCE (found by this fuzzer, hence the guard): on a
    # ZERO-ROW input DuckDB emits the grand-total row (the standard's
    # empty-grouping-set semantics: one row, COUNT=0) while Spark's
    # ROLLUP emits nothing — so no registered oracle may rely on the
    # grand-total row of a possibly-empty input.  Non-empty inputs
    # agree cell-for-cell.
    if not rows:
        return
    _mk_tables(spark, fuzz_duck, rows)
    _both(
        spark,
        fuzz_duck,
        """
        SELECT k, s,
               CAST(GROUPING(k) AS BIGINT) AS gk,
               CAST(GROUPING(s) AS BIGINT) AS gs,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(d * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM fz_a
        GROUP BY ROLLUP (k, s)
        """,
    )


@given(rows=_rows, rows_b=_rows_b)
@_SETTINGS
def test_fuzz_not_in_null_subquery(spark, fuzz_duck, rows, rows_b):
    # the classic three-valued-logic trap: one NULL in the NOT IN
    # subquery empties the result; EXISTS/NOT EXISTS are unaffected
    _mk_tables(spark, fuzz_duck, rows, rows_b)
    _both(
        spark,
        fuzz_duck,
        "SELECT k, i FROM fz_a WHERE i NOT IN (SELECT v FROM fz_b)",
    )
    _both(
        spark,
        fuzz_duck,
        "SELECT k, i FROM fz_a WHERE i IN (SELECT v FROM fz_b)",
    )
    _both(
        spark,
        fuzz_duck,
        """
        SELECT a.k, a.i FROM fz_a a
        WHERE NOT EXISTS (
            SELECT 1 FROM fz_b b WHERE b.k = a.k AND b.v IS NULL
        )
        """,
    )


@given(rows=_rows)
@_SETTINGS
def test_fuzz_conditional_arithmetic(spark, fuzz_duck, rows):
    # CASE/COALESCE/NULLIF + truncating integer DIV and % on negatives
    _mk_tables(spark, fuzz_duck, rows)
    _both(
        spark,
        fuzz_duck,
        """
        SELECT k,
               CASE WHEN i IS NULL THEN -1
                    WHEN i % 7 = 0
                        THEN CAST(floor(abs(i) / 7.0) AS BIGINT)
                    ELSE NULLIF(i, k) END AS c1,
               COALESCE(i, k, 0) % 5 AS c2,
               CAST(floor(abs(COALESCE(i, 0)) / 3.0) AS BIGINT) AS c3
        FROM fz_a
        """,
    )


# ---- as-of join construction parity (the union-window seam) -----------
#
# join_asof / join_asof_tolerance replace a range join with ONE window
# (last/first IGNORE NULLS over a PRECEDING/FOLLOWING frame) — linear at
# 100 TB, but the construction's correctness hangs on three seams the
# fixtures barely exercise: exact timestamp TIES (broken by event_id),
# NULL timestamps under explicit NULLS FIRST, and users with only one
# side present.  Generate adversarial event sets and hold the Spark
# construction to DuckDB's IGNORE NULLS window on the same data.

_ev_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),            # user
        st.one_of(st.none(), st.integers(0, 6)),          # ts (ties likely)
        st.booleans(),                                    # is_click
    ),
    min_size=0,
    max_size=20,
)

_ASOF_SCHEMA = "u long, eid long, typ string, ts long"


def _mk_events(spark, duck, rows):
    recs = [
        (u, i, "click" if c else "purchase", ts)
        for i, (u, ts, c) in enumerate(rows)
    ]
    df = (
        spark.createDataFrame(recs, _ASOF_SCHEMA)
        if recs
        else spark.createDataFrame([], _ASOF_SCHEMA)
    )
    df.createOrReplaceTempView("fz_ev2")
    duck.execute("DROP TABLE IF EXISTS fz_ev2")
    duck.execute(
        "CREATE TABLE fz_ev2 (u BIGINT, eid BIGINT, typ VARCHAR, ts BIGINT)"
    )
    if recs:
        duck.executemany("INSERT INTO fz_ev2 VALUES (?, ?, ?, ?)", recs)
    return df


@given(rows=_ev_rows)
@_SETTINGS
def test_fuzz_asof_backward(spark, fuzz_duck, rows):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = _mk_events(spark, fuzz_duck, rows)
    w = (
        Window.partitionBy("u")
        .orderBy(F.col("ts").asc_nulls_first(), "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = (
        df.withColumn(
            "click_ts", F.when(F.col("typ") == "click", F.col("ts"))
        )
        .withColumn("last_click", F.last("click_ts", ignorenulls=True).over(w))
        .where(F.col("typ") == "purchase")
        .select("eid", "u", "ts", "last_click")
        .collect()
    )
    want = fuzz_duck.execute(
        """
        SELECT eid, u, ts,
               last_value(CASE WHEN typ = 'click' THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY u ORDER BY ts NULLS FIRST, eid
                         ROWS UNBOUNDED PRECEDING) AS last_click
        FROM fz_ev2
        QUALIFY typ = 'purchase'
        """
    ).fetchall()
    canon = lambda rs: sorted(repr(tuple(r)) for r in rs)  # noqa: E731
    assert canon(got) == canon(want)


@given(rows=_ev_rows)
@_SETTINGS
def test_fuzz_asof_forward_tolerance(spark, fuzz_duck, rows):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tol = 3
    df = _mk_events(spark, fuzz_duck, rows)
    w = (
        Window.partitionBy("u")
        .orderBy(F.col("ts").asc_nulls_first(), "eid")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nxt = F.first(
        F.when(F.col("typ") == "purchase", F.col("ts")), ignorenulls=True
    ).over(w)
    within = F.col("nxt") - F.col("ts") <= tol
    got = (
        df.withColumn("nxt", nxt)
        .where(F.col("typ") == "click")
        .select(
            "eid",
            "u",
            "ts",
            F.when(within, F.col("nxt")).alias("next_purch"),
            F.coalesce(within, F.lit(False)).alias("attributed"),
        )
        .collect()
    )
    want = fuzz_duck.execute(
        f"""
        WITH m AS (
            SELECT eid, u, typ, ts,
                   first_value(CASE WHEN typ = 'purchase' THEN ts END
                               IGNORE NULLS)
                       OVER (PARTITION BY u ORDER BY ts NULLS FIRST, eid
                             ROWS BETWEEN CURRENT ROW
                                  AND UNBOUNDED FOLLOWING) AS nxt
            FROM fz_ev2
        )
        SELECT eid, u, ts,
               CASE WHEN nxt - ts <= {tol} THEN nxt END AS next_purch,
               COALESCE(nxt - ts <= {tol}, FALSE) AS attributed
        FROM m
        WHERE typ = 'click'
        """
    ).fetchall()
    canon = lambda rs: sorted(repr(tuple(r)) for r in rs)  # noqa: E731
    assert canon(got) == canon(want)


@given(rows=_rows)
@_SETTINGS
def test_fuzz_string_family_and_greatest(spark, fuzz_duck, rows):
    # ||-concat NULL-propagates in BOTH engines (unlike concat(), see
    # the divergence pin below); GREATEST/LEAST skip NULLs in both;
    # upper/substr/length/trim agree on the unicode + empty strings in
    # the generator
    _mk_tables(spark, fuzz_duck, rows)
    _both(
        spark,
        fuzz_duck,
        """
        SELECT k,
               upper(s) AS up,
               substr(s, 1, 2) AS pre,
               CAST(length(s) AS BIGINT) AS n_chars,
               trim(s) AS trimmed,
               s || ':' || CAST(k AS STRING) AS tagged,
               GREATEST(i, k) AS hi,
               LEAST(i, k) AS lo
        FROM fz_a
        """,
    )


def test_concat_null_divergence_pin(spark, fuzz_duck):
    """EXECUTABLE DIVERGENCE PIN (found by the round-7 probe):
    ``concat('a', NULL)`` is NULL in Spark (NULL-propagating, like ||)
    but 'a' in DuckDB (NULL-skipping, per the standard's CONCAT).
    Consequence for oracle authors: ``concat()`` is only portable over
    provably NON-NULL columns (fn_string's TPC-H columns qualify);
    anything nullable must use ``||``.  If either engine changes this
    semantic, this test fails and the convention must be re-audited."""
    got = spark.sql("SELECT concat('a', NULL) AS c").collect()[0].c
    want = fuzz_duck.execute("SELECT concat('a', NULL) AS c").fetchone()[0]
    assert got is None and want == "a"


def test_cast_double_bigint_divergence_pin(spark, fuzz_duck):
    """EXECUTABLE DIVERGENCE PIN (found by the round-7 probe):
    ``CAST(<double> AS BIGINT)`` TRUNCATES toward zero in Spark
    (2.7 -> 2, -2.7 -> -2) but ROUNDS in DuckDB (2.7 -> 3, -2.7 -> -3).
    Consequence for oracle authors: casting a double to BIGINT is only
    portable when the value is exactly integral — which is why the
    repo-wide convention is ROUND (or floor/ceil) BEFORE the cast, and
    why exact_sum works on pre-scaled BIGINTs.  If either engine
    changes this, re-audit every CAST(... AS BIGINT) over a double."""
    srow = spark.sql(
        "SELECT CAST(CAST(2.7 AS DOUBLE) AS BIGINT) AS a,"
        "       CAST(CAST(-2.7 AS DOUBLE) AS BIGINT) AS b"
    ).collect()[0]
    drow = fuzz_duck.execute(
        "SELECT CAST(CAST(2.7 AS DOUBLE) AS BIGINT),"
        "       CAST(CAST(-2.7 AS DOUBLE) AS BIGINT)"
    ).fetchone()
    assert (srow.a, srow.b) == (2, -2), "Spark no longer truncates"
    assert drow == (3, -3), "DuckDB no longer rounds"


def test_substr_position_zero_divergence_pin(spark, fuzz_duck):
    """EXECUTABLE DIVERGENCE PIN (found by the round-8 probe):
    ``substr(s, 0, n)`` in Spark treats position 0 like 1 and returns
    n characters ('hello', 0, 1 -> 'h'); DuckDB starts counting AT 0,
    so the phantom position before the string consumes one unit of
    length ('hello', 0, 1 -> '', and 0, 3 -> 'he').  Negative starts
    agree (both count from the end: (-1, 3) -> 'o').  Consequence for
    oracle authors: string positions in portable SQL are 1-based ONLY —
    never emit substr/substring with a computed start that can reach 0
    (clamp with GREATEST(pos, 1) on both sides).  If either engine
    changes this, re-audit every substr with a computed start."""
    srow = spark.sql(
        "SELECT substring('hello', 0, 1) AS a, substring('hello', 0, 3) AS b,"
        "       substring('hello', -1, 3) AS c"
    ).collect()[0]
    drow = fuzz_duck.execute(
        "SELECT substr('hello', 0, 1), substr('hello', 0, 3),"
        "       substr('hello', -1, 3)"
    ).fetchone()
    assert (srow.a, srow.b, srow.c) == ("h", "hel", "o"), (
        "Spark changed substring(pos=0) semantics"
    )
    assert drow == ("", "he", "o"), "DuckDB changed substr(pos=0) semantics"


def test_string_decimal_to_int_cast_divergence_pin(spark, fuzz_duck):
    """EXECUTABLE DIVERGENCE PIN (found by the round-8 probe):
    casting the STRING '4.9' to an integer type ROUNDS in DuckDB
    (CAST and TRY_CAST both give 5) but is MALFORMED in Spark 4
    (ANSI-default: CAST raises CAST_INVALID_INPUT, TRY_CAST gives
    NULL).  Plain integer strings (' 42 ') agree in both engines,
    whitespace trimmed.  Consequence for oracle authors: never cast a
    string that can carry a decimal point directly to an integer type
    in portable SQL — parse it as DOUBLE first, then apply the
    repo-wide ROUND/FLOOR-before-CAST doctrine (see the
    cast_double_bigint pin above).  If either engine changes this,
    re-audit every CAST(<string> AS <int type>)."""
    import pyspark.errors

    srow = spark.sql(
        "SELECT TRY_CAST('4.9' AS INT) AS a, TRY_CAST(' 42 ' AS INT) AS b"
    ).collect()[0]
    assert srow.a is None and srow.b == 42, (
        "Spark changed string-decimal TRY_CAST semantics"
    )
    try:
        spark.sql("SELECT CAST('4.9' AS INT) AS a").collect()
        raise AssertionError(
            "Spark no longer rejects CAST('4.9' AS INT) — ANSI default off?"
        )
    except pyspark.errors.PySparkException:
        pass  # CAST_INVALID_INPUT: the pinned behavior
    drow = fuzz_duck.execute(
        "SELECT CAST('4.9' AS INTEGER), TRY_CAST('4.9' AS INTEGER),"
        "       CAST('  42 ' AS INTEGER)"
    ).fetchone()
    assert drow == (5, 5, 42), "DuckDB changed string-decimal cast rounding"


def test_division_by_zero_divergence_pin(spark, fuzz_duck):
    """EXECUTABLE DIVERGENCE PIN (found by the round-8 probe): division
    and modulo by zero return NULL in DuckDB (every numeric type,
    including DOUBLE — no IEEE Infinity by default) but RAISE in
    ANSI-default Spark 4 (DIVIDE_BY_ZERO / REMAINDER_BY_ZERO, doubles
    included).  Portable form: ``x / NULLIF(y, 0)`` — NULLIF makes the
    divisor NULL and both engines agree NULL-in/NULL-out (Spark's
    try_divide matches DuckDB but has no DuckDB spelling).  Every
    registered oracle hash-matches on the fixtures, so current
    denominators are provably nonzero there; any NEW oracle whose
    denominator can reach zero must use the NULLIF guard on BOTH
    sides."""
    import pyspark.errors

    for bad in ("SELECT 1/0 AS x", "SELECT CAST(1 AS DOUBLE)/0 AS x",
                "SELECT mod(5, 0) AS x"):
        try:
            spark.sql(bad).collect()
            raise AssertionError(f"Spark no longer raises on {bad!r}")
        except pyspark.errors.PySparkException:
            pass
    assert fuzz_duck.execute(
        "SELECT 1/0, CAST(1 AS DOUBLE)/0, mod(5, 0)"
    ).fetchone() == (None, None, None), "DuckDB div-by-zero no longer NULL"
    # the portable guard agrees in both engines
    s = spark.sql(
        "SELECT 1 / NULLIF(0, 0) AS a, 10.0 / NULLIF(4, 0) AS b"
    ).collect()[0]
    d = fuzz_duck.execute(
        "SELECT 1 / NULLIF(0, 0), 10.0 / NULLIF(4, 0)"
    ).fetchone()
    assert s.a is None and d[0] is None
    assert float(s.b) == float(d[1]) == 2.5


def test_math_domain_divergence_pin(spark, fuzz_duck):
    """EXECUTABLE DIVERGENCE PIN (found by the round-8 probe): math
    domain violations RAISE in DuckDB (sqrt(-1), ln(0), ln(-1),
    asin(2) are all Out of Range / Invalid Input errors) but are
    VALUES in Spark (sqrt(-1) -> NaN, ln(0)/ln(-1) -> NULL,
    asin(2) -> NaN).  power(0,0) = 1.0 agrees.  Consequence for oracle
    authors: pre-guard the domain in portable SQL (``CASE WHEN x > 0
    THEN ln(x) END``) — an out-of-domain input that would silently
    produce NULL/NaN on the Spark side is a hard oracle error on the
    DuckDB side, so the fixture either proves the domain or the SQL
    must."""
    import math

    srow = spark.sql(
        "SELECT sqrt(-1.0) AS a, ln(0.0) AS b, ln(-1.0) AS c,"
        "       asin(2.0) AS d, power(0,0) AS e"
    ).collect()[0]
    assert math.isnan(srow.a) and srow.b is None and srow.c is None
    assert math.isnan(srow.d) and srow.e == 1.0
    for bad in ("SELECT sqrt(-1.0)", "SELECT ln(0.0)", "SELECT asin(2.0)"):
        try:
            fuzz_duck.execute(bad).fetchone()
            raise AssertionError(f"DuckDB no longer raises on {bad!r}")
        except Exception as e:  # noqa: BLE001 — duckdb.Error subclasses vary
            assert "Range" in str(e) or "Invalid" in str(e), e
    assert fuzz_duck.execute("SELECT power(0,0)").fetchone()[0] == 1.0


def test_bigint_sum_overflow_divergence_pin(spark, fuzz_duck):
    """EXECUTABLE DIVERGENCE PIN (found by the round-8 probe):
    ``SUM(<bigint>)`` that exceeds int64 RAISES in ANSI-default Spark 4
    (ARITHMETIC_OVERFLOW) but silently WIDENS to HUGEINT in DuckDB
    (int64max + 1 sums fine).  Consequence for the repo's scaled-BIGINT
    exact_sum convention: the scale factor must keep |sum| < 2^63 over
    the full table, or the two engines part ways at the exact moment
    precision mattered.  functions/exact.py's default scale=100 (2dp
    money) leaves ~9.2e16 of summed absolute magnitude — its own
    docstring carries the 100 TB headroom math."""
    import pyspark.errors

    try:
        spark.sql(
            "SELECT SUM(x) AS s FROM VALUES (9223372036854775807), (1) AS t(x)"
        ).collect()
        raise AssertionError("Spark no longer raises on bigint SUM overflow")
    except pyspark.errors.PySparkException:
        pass
    got = fuzz_duck.execute(
        "SELECT SUM(x) FROM (VALUES (9223372036854775807), (1)) t(x)"
    ).fetchone()[0]
    assert int(got) == 9223372036854775808, "DuckDB no longer widens SUM"


def test_element_at_out_of_bounds_divergence_pin(spark, fuzz_duck):
    """EXECUTABLE DIVERGENCE PIN (found by the round-8 probe):
    ``element_at(arr, i)`` with i past the end RAISES in ANSI-default
    Spark 4 (INVALID_ARRAY_INDEX_IN_ELEMENT_AT) but DuckDB's
    ``arr[i]`` / list_extract returns NULL.  Negative indexes AGREE
    (-1 = last element in both), as do array_position misses (0 in
    both).  Consequence for oracle authors: any element_at index
    computed at runtime must be provably within [1, size] — which is
    why every registry construction indexes inside
    ``transform(sequence(1, size - k), ...)`` lambdas (in-bounds by
    construction); an index that can escape needs try_element_at on
    the Spark side AND the corresponding NULL on the DuckDB side."""
    import pyspark.errors

    try:
        spark.sql("SELECT element_at(array(1,2,3), 10) AS x").collect()
        raise AssertionError("Spark no longer raises on OOB element_at")
    except pyspark.errors.PySparkException:
        pass
    srow = spark.sql(
        "SELECT try_element_at(array(1,2,3), 10) AS a,"
        "       element_at(array(1,2,3), -1) AS b,"
        "       array_position(array(1,2), 5) AS c"
    ).collect()[0]
    drow = fuzz_duck.execute(
        "SELECT ([1,2,3])[10], ([1,2,3])[-1], list_position([1,2], 5)"
    ).fetchone()
    assert srow.a is None and drow[0] is None
    assert srow.b == 3 and drow[1] == 3
    assert srow.c == 0 and drow[2] == 0


_ws_strings = st.lists(
    st.sampled_from(
        ["", " ", "  ", "a", "a b", "a  b", " a", "b ", "a b  c ", "\ta",
         "é x", "a   "]
    ),
    min_size=0,
    max_size=12,
)


@given(strs=_ws_strings)
@_SETTINGS
def test_fuzz_token_count_convention(spark, fuzz_duck, strs):
    """The registry-wide token count n_tok = size(split(text, ' ')) must
    equal DuckDB's len(string_split(text, ' ')) on whitespace-adversarial
    strings (leading/trailing/consecutive spaces, empty string, tabs) —
    every documents oracle leans on this equality."""
    from pyspark.sql import functions as F

    recs = [(i, s) for i, s in enumerate(strs)]
    df = (
        spark.createDataFrame(recs, "id long, s string")
        if recs
        else spark.createDataFrame([], "id long, s string")
    )
    got = sorted(
        (r.id, r.n)
        for r in df.select(
            "id", F.size(F.split("s", " ")).cast("bigint").alias("n")
        ).collect()
    )
    fuzz_duck.execute("DROP TABLE IF EXISTS fz_s")
    fuzz_duck.execute("CREATE TABLE fz_s (id BIGINT, s VARCHAR)")
    if recs:
        fuzz_duck.executemany("INSERT INTO fz_s VALUES (?, ?)", recs)
    want = sorted(
        tuple(r)
        for r in fuzz_duck.execute(
            "SELECT id, CAST(len(string_split(s, ' ')) AS BIGINT) FROM fz_s"
        ).fetchall()
    )
    assert got == want


_hash_strings = st.lists(
    st.one_of(
        st.sampled_from(
            ["", " ", "a", "é", "split:0", "split:123456789", "\t\n",
             "ü ü", "0x", "NULL", "ab" * 40]
        ),
        st.text(min_size=0, max_size=20),
    ),
    min_size=0,
    max_size=15,
)


@given(strs=_hash_strings)
@_SETTINGS
def test_fuzz_portable_hash(spark, fuzz_duck, strs):
    """_phash (Spark conv(substr(md5),16,10)) must equal the oracle's
    CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) on arbitrary unicode
    strings — every split / sampling / salting decision in the registry
    rides this equality, so a single mismatching codepoint would skew
    train/val/test membership between engines."""
    from pyspark.sql import functions as F

    from kafka_hadoop_loader_spark.operators.pipeline import _PHASH_SQL, _phash

    # md5 operates on UTF-8 bytes in both engines; NULs excluded (the
    # duckdb client rejects NUL in VARCHAR binds, not an engine seam)
    strs = [s for s in strs if "\x00" not in s]
    recs = [(i, s) for i, s in enumerate(strs)]
    df = (
        spark.createDataFrame(recs, "id long, s string")
        if recs
        else spark.createDataFrame([], "id long, s string")
    )
    got = sorted((r.id, r.h) for r in df.select("id", _phash(F.col("s")).alias("h")).collect())
    fuzz_duck.execute("DROP TABLE IF EXISTS fz_h")
    fuzz_duck.execute("CREATE TABLE fz_h (id BIGINT, s VARCHAR)")
    if recs:
        fuzz_duck.executemany("INSERT INTO fz_h VALUES (?, ?)", recs)
    want = sorted(
        tuple(r)
        for r in fuzz_duck.execute(
            f"SELECT id, {_PHASH_SQL.format(x='s')} FROM fz_h"
        ).fetchall()
    )
    assert got == want
    # and the sign invariant the split buckets rely on
    assert all(h >= 0 for _, h in got)


_fold_cents = st.lists(
    st.integers(min_value=-99999, max_value=99999).map(lambda c: c / 100.0),
    min_size=1,
    max_size=12,
)


@given(xs=_fold_cents)
@_SETTINGS
def test_fuzz_sequential_fold_ieee_chain(spark, fuzz_duck, xs):
    """The sequential-fold convention (events_forecast_holt /
    orders_survival_km / drift_embedding_centroid): Spark's F.aggregate
    and DuckDB's list_reduce must evaluate the identical IEEE chain in
    the identical element order — including a NON-ASSOCIATIVE smoothing
    recurrence where any reordering or fused-multiply difference would
    change low-order bits.  Inputs off the cent grid, accumulator a
    [level, sse] pair, exact equality (repr, not approx)."""
    from pyspark.sql import functions as F

    a = 0.3  # smoothing weight: exactly representable? 0.3 is NOT exact
    # in binary — deliberately so: both engines must parse the same
    # literal to the same double and chain it identically.
    df = spark.createDataFrame([(xs,)], "xs array<double>")
    folded = df.select(
        F.aggregate(
            "xs",
            F.expr("array(CAST(element_at(xs, 1) AS DOUBLE), CAST(0.0 AS DOUBLE))"),
            lambda acc, x: F.array(
                F.lit(a) * x + F.lit(1 - a) * acc[0],
                acc[1] + (x - acc[0]) * (x - acc[0]),
            ),
        ).alias("st")
    ).collect()[0].st
    want = fuzz_duck.execute(
        f"""
        SELECT list_reduce(
                   list_prepend([xs[1], CAST(0.0 AS DOUBLE)],
                                list_transform(xs, x -> [x, 0.0])),
                   (acc, e) -> [{a} * e[1] + {1 - a} * acc[1],
                                acc[2] + (e[1] - acc[1]) * (e[1] - acc[1])]
               ) AS st
        FROM (SELECT ? AS xs)
        """,
        [xs],
    ).fetchone()[0]
    assert repr(list(folded)) == repr(list(want)), (xs, folded, want)


# strings exercising the regex constructs the oracles actually use:
# char classes, quantifiers, alternation, anchors, capture groups —
# the Java-regex / RE2 COMMON SUBSET.  (Backrefs and lookaround are
# Java-only — RE2 rejects them — so no oracle may use them; keeping
# the fuzz to the shared subset IS the convention.)
_re_strings = st.lists(
    st.one_of(
        st.sampled_from(
            ["", "a1b22c333", "x@y.zz", "no digits", "+1-555-0199",
             "a.b@c.dd e.f@g.hh", "123", "...", "a-b_c", "é9ü",
             "UPPER lower 42", " 7 ", "tab\there"]
        ),
        st.text(
            alphabet="ab1@.- _xyzA",
            min_size=0,
            max_size=24,
        ),
    ),
    min_size=0,
    max_size=12,
)


@given(strs=_re_strings)
@_SETTINGS
def test_fuzz_regexp_common_subset(spark, fuzz_duck, strs):
    from pyspark.sql import functions as F

    recs = [(i, s) for i, s in enumerate(strs)]
    df = (
        spark.createDataFrame(recs, "id long, s string")
        if recs
        else spark.createDataFrame([], "id long, s string")
    )
    pat_digits = "([0-9]+)"
    pat_word = "[a-z]+[0-9]"
    got = sorted(
        tuple(r)
        for r in df.select(
            "id",
            F.regexp_extract("s", pat_digits, 1).alias("first_digits"),
            F.regexp_replace("s", "[0-9]", "#").alias("masked"),
            F.col("s").rlike(pat_word).alias("has_word_digit"),
            F.regexp_replace("s", "^\\s+|\\s+$", "").alias("re_trimmed"),
        ).collect()
    )
    fuzz_duck.execute("DROP TABLE IF EXISTS fz_re")
    fuzz_duck.execute("CREATE TABLE fz_re (id BIGINT, s VARCHAR)")
    if recs:
        fuzz_duck.executemany("INSERT INTO fz_re VALUES (?, ?)", recs)
    want = sorted(
        tuple(r)
        for r in fuzz_duck.execute(
            f"""
            SELECT id,
                   regexp_extract(s, '{pat_digits}', 1) AS first_digits,
                   regexp_replace(s, '[0-9]', '#', 'g') AS masked,
                   regexp_matches(s, '{pat_word}') AS has_word_digit,
                   regexp_replace(s, '^\\s+|\\s+$', '', 'g') AS re_trimmed
            FROM fz_re
            """
        ).fetchall()
    )
    assert got == want


_days = st.lists(
    st.one_of(st.none(), st.integers(min_value=-40000, max_value=40000)),
    min_size=0,
    max_size=15,
)


@given(days=_days)
@_SETTINGS
def test_fuzz_date_arithmetic(spark, fuzz_duck, days):
    """Date family over ±~110 years off epoch (both engines are
    proleptic Gregorian): year/month/day/quarter extraction, month
    truncation, epoch-day round trip, and month arithmetic — the
    constructs fn_datetime / SCD2 / cohort oracles use, under NULLs
    and pre-1970 dates the fixtures never reach."""
    recs = [(i, d) for i, d in enumerate(days)]
    fuzz_duck.execute("DROP TABLE IF EXISTS fz_d")
    fuzz_duck.execute("CREATE TABLE fz_d (id BIGINT, ed BIGINT)")
    if recs:
        fuzz_duck.executemany("INSERT INTO fz_d VALUES (?, ?)", recs)
    df = (
        spark.createDataFrame(recs, "id long, ed long")
        if recs
        else spark.createDataFrame([], "id long, ed long")
    )
    df.createOrReplaceTempView("fz_d")
    # DATE_FROM_EPOCH_DAYS: Spark = date_add('1970-01-01', ed);
    # DuckDB = epoch day cast.  Shared text via to_date + arithmetic:
    got = sorted(
        tuple(r)
        for r in spark.sql(
            """
            SELECT id,
                   CAST(year(d) AS BIGINT) AS yr,
                   CAST(month(d) AS BIGINT) AS mo,
                   CAST(day(d) AS BIGINT) AS dy,
                   CAST(quarter(d) AS BIGINT) AS qtr,
                   CAST(date_trunc('month', d) AS DATE) AS mstart,
                   add_months(d, 7) AS plus7m,
                   CAST(datediff(d, DATE '2000-01-01') AS BIGINT) AS dd
            FROM (SELECT id, date_add(DATE '1970-01-01', CAST(ed AS INT)) AS d
                  FROM fz_d)
            """
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in fuzz_duck.execute(
            """
            SELECT id,
                   CAST(year(d) AS BIGINT) AS yr,
                   CAST(month(d) AS BIGINT) AS mo,
                   CAST(day(d) AS BIGINT) AS dy,
                   CAST(quarter(d) AS BIGINT) AS qtr,
                   CAST(date_trunc('month', d) AS DATE) AS mstart,
                   CAST(d + INTERVAL 7 MONTH AS DATE) AS plus7m,
                   CAST(d - DATE '2000-01-01' AS BIGINT) AS dd
            FROM (SELECT id, DATE '1970-01-01' + CAST(ed AS INT) AS d
                  FROM fz_d)
            """
        ).fetchall()
    )
    # DuckDB returns plus7m as datetime.date; Spark too — repr-compare
    canon = lambda rs: [tuple(repr(c) for c in r) for r in rs]  # noqa: E731
    assert canon(got) == canon(want)


_wrows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # group
        st.integers(min_value=-3, max_value=3),  # value (ties likely)
        st.integers(min_value=1, max_value=4),   # weight
    ),
    min_size=1,
    max_size=20,
)

_RANK_SEL_SQL = """
    WITH g AS (
        SELECT grp, v, CAST(SUM(w) AS BIGINT) AS w
        FROM fz_w GROUP BY grp, v
    ),
    cum AS (
        SELECT grp, v, w,
               CAST(SUM(w) OVER (PARTITION BY grp ORDER BY v)
                    AS BIGINT) AS cw,
               CAST(SUM(w) OVER (PARTITION BY grp) AS BIGINT) AS n
        FROM g
    )
    SELECT grp,
           MAX(n) AS total_w,
           CAST(MIN(CASE WHEN cw * 2 >= n THEN v END) AS BIGINT) AS p50,
           CAST(MIN(CASE WHEN cw * 4 >= 3 * n THEN v END) AS BIGINT) AS p75
    FROM cum GROUP BY grp
"""


@given(rows=_wrows)
@_SETTINGS
def test_fuzz_rank_selection_convention(spark, fuzz_duck, rows):
    """The cross-multiplied type-1 quantile convention shared by
    agg_weighted_median / orders_fulfillment_latency / ts_anomaly_
    seasonal's MAD / stats_theil_sen: MIN(v | cum*q_den >= q_num*n)
    over the value-domain grain.  Two assertions: (1) Spark and DuckDB
    agree on the SAME SQL under adversarial weight/value ties
    (boundary-exact cum*2 == n cases included by construction);
    (2) both equal an independent pure-Python type-1 weighted
    quantile — the convention is semantically right, not merely
    consistent."""
    recs = [(i, g, v, w) for i, (g, v, w) in enumerate(rows)]
    df = spark.createDataFrame(recs, "id long, grp long, v long, w long")
    df.createOrReplaceTempView("fz_w")
    fuzz_duck.execute("DROP TABLE IF EXISTS fz_w")
    fuzz_duck.execute(
        "CREATE TABLE fz_w (id BIGINT, grp BIGINT, v BIGINT, w BIGINT)"
    )
    fuzz_duck.executemany("INSERT INTO fz_w VALUES (?, ?, ?, ?)", recs)
    got = sorted(tuple(r) for r in spark.sql(_RANK_SEL_SQL).collect())
    want = sorted(tuple(r) for r in fuzz_duck.execute(_RANK_SEL_SQL).fetchall())
    assert got == want

    # independent semantic oracle: expand weights, take the element at
    # 1-based position ceil(q * n) of the sorted multiset
    import math
    from collections import defaultdict

    expanded = defaultdict(list)
    for _, g, v, w in recs:
        expanded[g].extend([v] * w)
    for grp, total_w, p50, p75 in got:
        vals = sorted(expanded[grp])
        assert total_w == len(vals)
        assert p50 == vals[math.ceil(0.5 * len(vals)) - 1]
        assert p75 == vals[math.ceil(0.75 * len(vals)) - 1]


# ---- star contraction on generated graphs (semantic + certificate) ----

_edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


@given(raw_edges=_edges_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_fuzz_star_contract_vs_union_find(spark, raw_edges):
    """star_contract on GENERATED topologies (random graphs over 15
    nodes: stress paths, cycles, stars, parallel edges) must equal a
    pure-Python union-find, and star_contract_certified must report
    converged=True at the production round count — the semantic
    guarantee behind graph_connected_components and dedup_clusters_star
    beyond the fixture graphs."""
    from kafka_hadoop_loader_spark.operators.graph import star_contract_certified

    canon = sorted({(min(u, v), max(u, v)) for u, v in raw_edges})
    edges = spark.createDataFrame(canon, "u long, v long")
    labels_df, cert_df = star_contract_certified(edges, rounds=6)
    got = {(r.node, r.comp) for r in labels_df.collect()}
    assert cert_df.collect()[0].converged is True

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in canon:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {(n, find(n)) for n in parent}
    assert got == want


def test_star_certificate_detects_insufficient_rounds(spark):
    """The convergence certificate's NEGATIVE contract: on a 40-node
    path graph, rounds=1 cannot reach the star fixpoint, and the
    certificate must say so (converged=False) instead of letting
    wrong labels pass — this is the exact failure mode the r6
    certificate was built to expose at 100 TB diameters."""
    from kafka_hadoop_loader_spark.operators.graph import star_contract_certified

    path = [(i, i + 1) for i in range(40)]
    edges = spark.createDataFrame(path, "u long, v long")
    _, cert = star_contract_certified(edges, rounds=1)
    assert cert.collect()[0].converged is False
    # and with generous rounds the same graph converges to one component
    labels, cert6 = star_contract_certified(edges, rounds=6)
    assert cert6.collect()[0].converged is True
    assert {r.comp for r in labels.collect()} == {0}


@given(rows=_rows)
@_SETTINGS
def test_fuzz_exact_sum_avg_helpers(spark, fuzz_duck, rows):
    """functions/exact.py's scaled-BIGINT aggregates vs their textually
    parallel oracle fragments (o_sum/o_avg) — THE most-used convention
    in the repo — on generated cent-grid doubles with NULLs and
    negatives.  Bit-exact comparison (repr), per group, both scales."""
    from pyspark.sql import functions as F

    from kafka_hadoop_loader_spark.functions.exact import (
        exact_avg,
        exact_sum,
        o_avg,
        o_sum,
    )

    _mk_tables(spark, fuzz_duck, rows)
    got = sorted(
        tuple(repr(c) for c in r)
        for r in spark.table("fz_a")
        .groupBy("k")
        .agg(
            exact_sum(F.col("d")).alias("s100"),
            exact_avg(F.col("d")).alias("a100"),
            exact_sum(F.col("d"), scale=10000).alias("s1e4"),
        )
        .collect()
    )
    want = sorted(
        tuple(repr(c) for c in r)
        for r in fuzz_duck.execute(
            f"""
            SELECT k, {o_sum('d')} AS s100, {o_avg('d')} AS a100,
                   {o_sum('d', 10000)} AS s1e4
            FROM fz_a GROUP BY k
            """
        ).fetchall()
    )
    assert got == want


def test_array_sort_null_placement_divergence_pin(spark, fuzz_duck):
    """EXECUTABLE DIVERGENCE PIN (found by the round-7 probe):
    Spark's ``sort_array`` defaults to NULLS FIRST ascending while
    DuckDB's ``list_sort`` defaults to NULLS LAST — element positions
    diverge the moment a collected array contains a NULL.  Consequence
    for oracle authors: any sorted-array construction over a NULLABLE
    column must either filter NULLs before collecting or spell
    ``list_sort(x, 'ASC', 'NULLS FIRST')`` on the DuckDB side (the one
    registered frame-collect consumer, window_rolling_median, collects
    a provably non-null TPC-H column)."""
    got = spark.sql("SELECT sort_array(array(3, NULL, 1)) AS a").collect()[0].a
    want_default = fuzz_duck.execute(
        "SELECT list_sort([3, NULL, 1])"
    ).fetchone()[0]
    want_explicit = fuzz_duck.execute(
        "SELECT list_sort([3, NULL, 1], 'ASC', 'NULLS FIRST')"
    ).fetchone()[0]
    assert got == [None, 1, 3] and want_default == [1, 3, None]
    assert got == want_explicit


@given(rows=_rows)
@_SETTINGS
def test_fuzz_sorted_array_collect(spark, fuzz_duck, rows):
    """sort_array(collect_list(x)) per group equals DuckDB's
    list_sort(list(x)) once NULLs are filtered (the portable subset per
    the pin above) — the frame-collect convention window_rolling_median
    and the in-row sorted-array folds rely on."""
    from pyspark.sql import functions as F

    _mk_tables(spark, fuzz_duck, rows)
    got = sorted(
        (r.k, list(r.arr))
        for r in spark.table("fz_a")
        .where(F.col("i").isNotNull())
        .groupBy("k")
        .agg(F.sort_array(F.collect_list("i")).alias("arr"))
        .collect()
    )
    want = sorted(
        (k, list(a))
        for k, a in fuzz_duck.execute(
            """
            SELECT k, list_sort(list(i)) FROM fz_a
            WHERE i IS NOT NULL GROUP BY k
            """
        ).fetchall()
    )
    assert got == want
