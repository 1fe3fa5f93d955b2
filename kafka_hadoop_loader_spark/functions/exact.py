"""Cross-engine-deterministic aggregate arithmetic.

The driver's t2 gate hash-compares Spark results against DuckDB exactly,
so double aggregates must be *bit-identical* across engines.  Two facts
make that achievable:

1. Per-row IEEE-754 ops (+,-,*,/) on identical inputs are bit-identical
   everywhere — raw products/differences need no rounding at all.
2. The fixtures' numeric columns are decimal-valued (prices/discounts/
   values: 2dp; quantities: integral), so sums can be done on scaled
   BIGINTs — exact, order-independent, engine-independent — and converted
   to double once at the end.

``ROUND(double, n)`` is NOT deterministic across engines at `.5`
boundaries (Spark rounds the exact binary expansion HALF_UP; DuckDB
rounds a scaled float) — these helpers exist so no query ever rounds a
double that can sit on a boundary.

Scale note: scaled-BIGINT partial sums are also what you want at 100 TB —
integer map-side combines, no float drift across 10k tasks.  int64
headroom: price*1e4 scale leaves ~10^14 rows before overflow; use
``scale=100`` aggregates per partition-day in real deployments.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scaled_long(col: Column, scale: int) -> Column:
    """Exact scaled-integer view of a decimal-valued double column."""
    return F.round(col * scale).cast("long")


def exact_sum(col: Column, scale: int = 100) -> Column:
    """SUM of a decimal-valued double, exact and engine-independent."""
    return F.sum(scaled_long(col, scale)).cast("double") / F.lit(float(scale))


def exact_avg(col: Column, scale: int = 100) -> Column:
    """AVG of a decimal-valued double, exact sum / exact count."""
    return F.sum(scaled_long(col, scale)).cast("double") / (
        F.count(col).cast("double") * F.lit(float(scale))
    )


# --- DuckDB oracle-side fragments (keep formulas textually parallel) ---


def o_sum(expr: str, scale: int = 100) -> str:
    return f"CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS DOUBLE) / {float(scale)}"


def o_avg(expr: str, scale: int = 100) -> str:
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS DOUBLE)"
        f" / (CAST(COUNT({expr}) AS DOUBLE) * {float(scale)})"
    )
