"""Hilbert-curve layout: the unrolled SQL conversion must equal the
classic iterative xy2d algorithm, and must be a true space-filling
curve (a bijection grid -> [0, n^2) whose consecutive cells are grid
neighbors — the locality property the layout exists for)."""

from __future__ import annotations

from kafka_hadoop_loader_spark.operators.layout import _hilbert_step_exprs


def _xy2d_ref(bits: int, x: int, y: int) -> int:
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_unrolled_matches_reference_and_is_space_filling(spark):
    bits = 4  # full 16x16 grid = 256 cells, exhaustive
    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "hx int, hy int"
    ).selectExpr("hx AS x0", "hy AS y0", "hx", "hy", "CAST(0 AS BIGINT) AS hd")
    for d, nx, ny in _hilbert_step_exprs(bits):
        grid = grid.selectExpr(
            "x0", "y0", f"{nx} AS hx", f"{ny} AS hy", f"{d} AS hd"
        )
    rows = {(r.x0, r.y0): r.hd for r in grid.collect()}
    # exact match with the iterative reference on every cell
    for (x, y), d in rows.items():
        assert d == _xy2d_ref(bits, x, y), (x, y)
    # bijection onto [0, n^2)
    assert sorted(rows.values()) == list(range(n * n))
    # unit-step locality: consecutive curve indices are grid neighbors
    by_d = {d: xy for xy, d in rows.items()}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d
