"""plans/ranking.py contract: the two-phase distributed rank must be
BIT-IDENTICAL to the single-partition global window it replaces —
row_number, NTILE(k) for k below/around/above the row count, and
running sums, ascending and descending, with heavy ties — while its
physical plan contains no unpartitioned WindowExec over unbounded
input (the scale guarantee the whole module exists for)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.plans.inspect import formatted_plan
from kafka_hadoop_loader_spark.plans.ranking import (
    bounded_window_key,
    two_phase_rank,
)


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(20260814)
    rows = [
        (i, rng.randint(-20, 20), rng.randint(-5, 5), rng.random())
        for i in range(1523)
    ]
    return spark.createDataFrame(
        rows, "id long, v long, delta long, x double"
    ).repartition(8)


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("k", [1, 5, 7, 1523, 5000])
def test_matches_global_window(data, descending, k):
    order = [F.col("v").desc() if descending else F.col("v").asc(), F.col("id")]
    w = Window.orderBy(*order)
    expected = data.select(
        "id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.ntile(k).over(w).cast("long").alias("nt"),
        F.sum("delta")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("ps"),
    )
    got = two_phase_rank(
        data,
        "v",
        order,
        descending=descending,
        row_number_col="rn",
        ntile=("nt", k),
        prefix_sum=("ps", "delta"),
        n_buckets=8,
    ).select("id", "rn", "nt", "ps")
    j = expected.alias("e").join(got.alias("g"), "id")
    n = j.count()
    assert n == 1523
    assert (
        j.filter("e.rn != g.rn OR e.nt != g.nt OR e.ps != g.ps").count() == 0
    )


def test_double_primary_and_checkpoint(data):
    order = [F.col("x"), F.col("id")]
    w = Window.orderBy(*order)
    expected = data.select("id", F.row_number().over(w).cast("long").alias("rn"))
    got = two_phase_rank(
        data, "x", order, row_number_col="rn", checkpoint_input=True
    ).select("id", "rn")
    assert expected.exceptAll(got).count() == 0


def test_no_unpartitioned_window_in_plan(data):
    got = two_phase_rank(
        data, "v", [F.col("v"), F.col("id")], row_number_col="rn", n_buckets=8
    )
    plan = formatted_plan(got)
    # every Window node must carry a partition spec: the rank windows
    # partition by the value bucket, the offsets window by the declared
    # bounded-input key (pmod).  An unpartitioned Window would print
    # "windowspecdefinition(<order> ..." with no partition expressions —
    # covered structurally by tools/plan_report.py's auditor; here we
    # assert the helper's own plan never warns.
    assert "No Partition Defined" not in plan


def test_bounded_window_key_not_folded(spark):
    df = spark.range(50).select(
        "id", F.row_number().over(
            Window.partitionBy(bounded_window_key("id")).orderBy("id")
        ).alias("rn")
    )
    plan = formatted_plan(df)
    # the pmod partition key must survive optimization (lit(0) is
    # constant-folded away and re-triggers the single-partition warning)
    assert "pmod" in plan
    assert df.filter("rn != id + 1").count() == 0


def test_requires_a_rank_request(data):
    with pytest.raises(ValueError):
        two_phase_rank(data, "v", [F.col("v")])


@pytest.mark.parametrize("descending", [False, True])
def test_null_primary_matches_spark_null_ordering(spark, descending):
    """NULL primary keys must land where the global window puts them:
    FIRST ascending / LAST descending (Spark's default null ordering).
    Regression for the bucket-0 misroute under descending=True."""
    rng = random.Random(7)
    rows = [
        (i, None if i % 9 == 0 else rng.randint(-50, 50), rng.randint(-5, 5))
        for i in range(400)
    ]
    data = spark.createDataFrame(rows, "id long, v long, delta long").repartition(7)
    order = [F.col("v").desc() if descending else F.col("v").asc(), F.col("id")]
    w = Window.orderBy(*order)
    expected = data.select(
        "id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.ntile(6).over(w).cast("long").alias("nt"),
        F.sum("delta")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("ps"),
    )
    got = two_phase_rank(
        data,
        "v",
        order,
        descending=descending,
        row_number_col="rn",
        ntile=("nt", 6),
        prefix_sum=("ps", "delta"),
        n_buckets=8,
    ).select("id", "rn", "nt", "ps")
    j = expected.alias("e").join(got.alias("g"), "id")
    assert j.count() == 400
    assert (
        j.filter("e.rn != g.rn OR e.nt != g.nt OR e.ps != g.ps").count() == 0
    )


def test_bounded_window_key_null_safe(spark):
    """A NULL in the chosen column must not split the declared single
    partition (pmod(NULL, 1) is NULL)."""
    df = spark.createDataFrame([(1,), (None,), (3,)], "k int")
    vals = df.select(bounded_window_key("k").alias("b")).distinct().collect()
    assert {r["b"] for r in vals} == {0}


@pytest.mark.parametrize("n_buckets", [0, 1, 2])
def test_degenerate_bucket_counts_never_drop_rows(data, n_buckets):
    """A bucket count below 2 — a ``spark.sql.shuffle.partitions=1``
    session resolving the default, or a caller passing 0 — made the
    Phase-0 quantile list EMPTY: percentile_approx over an empty list
    returns NULL, size(filter(NULL)) made every row's bucket NULL, and
    the offsets equi-join silently dropped ALL rows (found by a
    round-12 ``--shuffle 1`` adversarial sweep: 9 driver queries
    returned 0 rows).  The helper must clamp to the smallest shape the
    boundary construction supports and stay bit-identical to the
    global window."""
    order = [F.col("v").asc(), F.col("id")]
    w = Window.orderBy(*order)
    expected = data.select(
        "id", F.row_number().over(w).cast("long").alias("rn")
    )
    got = two_phase_rank(
        data, "v", order, row_number_col="rn", n_buckets=n_buckets
    ).select("id", "rn")
    j = expected.alias("e").join(got.alias("g"), "id")
    assert j.count() == 1523, "no row may be dropped at any bucket count"
    assert j.filter("e.rn != g.rn").count() == 0
