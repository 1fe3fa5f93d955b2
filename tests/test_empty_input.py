"""Empty-input robustness: every registered query must EXECUTE (not
just plan) against a zero-row copy of the fixture tables without
raising.  Catches the classic degenerate-input crashes — reduceat on
empty buffers, max() of nothing feeding arithmetic, division by a
zero count, seeds LIMIT k on an empty table — that sf-scaled fixtures
never exercise.  Row counts are not asserted (an empty input may
legitimately produce 0 or a few summary rows); only absence of
exceptions.
"""

from __future__ import annotations

import os

import pytest

from kafka_hadoop_loader_spark.catalog import TABLES
from kafka_hadoop_loader_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        src = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        src.limit(0).write.mode("overwrite").parquet(str(root / f"{t}.parquet"))
    return str(root)


def _all():
    return sorted(load_all().items())


@pytest.mark.parametrize("name,q", _all(), ids=[n for n, _ in _all()])
def test_runs_on_empty_input(name, q, spark, empty_sf_dir):
    df = q.fn(spark, empty_sf_dir)
    df.collect()  # execution, not just analysis
