"""Mirror of the driver's t2 gate at sf0.001: every registered query
with an oracle must hash-match DuckDB; rows-only queries must run and
be non-empty."""

from __future__ import annotations

import pytest

from kafka_hadoop_loader_spark import registry
from tests.conftest import SF_DIR, assert_matches_oracle

REG = registry.load_all()


@pytest.mark.parametrize("name", sorted(REG))
def test_query_parity(name, spark, duck):
    q = REG[name]
    df = q.fn(spark, SF_DIR)
    if q.oracle is None:
        assert df.count() > 0, f"{name}: rows-only query returned no rows"
    else:
        assert_matches_oracle(df, q.oracle, duck)


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 40
    # oracle coverage: the vast majority of queries must be hash-checked
    assert len(osql) / len(qs) > 0.8
