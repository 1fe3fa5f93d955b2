"""Registry-wide typed-schema parity: every oracle's Arrow output schema
must agree (by type family) with the Spark query's result schema.

This is the local reproduction of the driver's typed value hashing
(CORRECTNESS r2's 8 red rows were all one class: DuckDB integer SUM()
widening to HUGEINT/decimal128 against a Spark BIGINT — value-equal,
type-different, hash-mismatch).  The oracle side is a LIMIT-0 subquery (type-checked,
not materialized).  The Spark side calls q.fn() for its schema, which
for MOST queries is pure analysis — but construction-time-action
operators (iterative loops, write-then-read round-trips) do execute
real jobs here, so this sweep costs minutes at the test SF, not
seconds; it doubles as their smoke test.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from kafka_hadoop_loader_spark.registry import load_all  # noqa: E402


def _all():
    return sorted(load_all().items())


@pytest.mark.parametrize("name,q", _all(), ids=[n for n, _ in _all()])
def test_oracle_type_families(name, q, spark, duck):
    from typecanon import arrow_family, oracle_arrow_schema, type_mismatches

    if q.oracle is None:
        pytest.skip("rows-only by design")
    schema = oracle_arrow_schema(duck, q.oracle)
    # No oracle may emit decimal128/hugeint unless the engine result is
    # decimal too — the class the grading driver's typed hash rejects.
    sdf = q.fn(spark, os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001"))
    tmis = type_mismatches(sdf.schema, schema)
    assert not tmis, f"{name}: {tmis}"
    decimals = [f.name for f in schema if arrow_family(f.type) == "decimal"]
    if decimals:
        from typecanon import spark_family

        sfam = {f.name: spark_family(f.dataType) for f in sdf.schema.fields}
        bad = [c for c in decimals if sfam.get(c) != "decimal"]
        assert not bad, f"{name}: oracle decimal128 column(s) {bad} vs non-decimal engine side"
