"""Local replica of the driver's t2 correctness gate.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet fixtures, then compares row count, column-name set, and
(order-insensitively) values.  Floats are compared exactly by default —
the queries are designed to be bit-deterministic across engines — with a
1e-9 fallback tolerance reported separately so near-misses are visible
before the driver's hash compare turns them into hard failures.

Usage:
    python tools/oracle_check.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kafka_hadoop_loader_spark import registry  # noqa: E402
from kafka_hadoop_loader_spark.catalog import TABLES  # noqa: E402
from kafka_hadoop_loader_spark.session import get_spark  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows, columns):
    """Rows -> list of tuples sorted by column name, then row-sorted repr."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def cell_equal(a, b) -> tuple[bool, bool]:
    """(exact, close) for one cell."""
    if a is None or b is None:
        return (a is None and b is None,) * 2
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return (False, False)
        if math.isnan(fa) and math.isnan(fb):
            return True, True
        exact = fa == fb
        close = exact or math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
        return exact, close
    if str(type(a)) != str(type(b)) and not isinstance(a, type(b)):
        # e.g. numpy scalar vs python scalar after fetch — compare by value
        pass
    return (a == b,) * 2


def compare(name, spark_df, sql, con):
    srows = spark_df.collect()
    scols = spark_df.columns
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    problems = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
    if problems:
        return problems, 0

    s_norm = normalize([tuple(r) for r in srows], scols)
    o_norm = normalize(orows, ocols)
    near = 0
    for i, (sr, orow) in enumerate(zip(s_norm, o_norm)):
        for sv, ov in zip(sr, orow):
            exact, close = cell_equal(sv, ov)
            if not exact:
                if close:
                    near += 1
                else:
                    problems.append(f"row {i}: spark={sr!r} oracle={orow!r}")
                    break
        if len(problems) >= 3:
            break
    return problems, near


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    reg = registry.load_all()
    names = args.names or sorted(reg)
    spark = get_spark("oracle-check")
    con = duck_connection(args.sf)

    failed = []
    for name in names:
        q = reg[name]
        t0 = time.time()
        try:
            df = q.fn(spark, args.sf)
            if q.oracle is None:
                n = df.count()
                print(f"  {name:32s} ROWS-ONLY rows={n}  ({time.time()-t0:.1f}s)")
                if n == 0:
                    print(f"    WARNING: {name} returned 0 rows")
                continue
            problems, near = compare(name, df, q.oracle, con)
        except Exception as e:  # noqa: BLE001
            problems, near = [f"EXCEPTION: {type(e).__name__}: {str(e)[:500]}"], 0
        status = "OK" if not problems else "FAIL"
        extra = f" near-miss-cells={near}" if near else ""
        print(f"  {name:32s} {status}{extra}  ({time.time()-t0:.1f}s)")
        for p in problems:
            print(f"    {p}")
        if problems:
            failed.append(name)

    print(f"\n{len(names)-len(failed)}/{len(names)} passed" + (f"; FAILED: {failed}" if failed else ""))
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
