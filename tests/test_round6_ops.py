"""Semantic property checks for the round-6 operators (the oracle gate
proves cross-engine equality; these pin the properties the equality
alone would not catch — monotonicity, validity of the certificate,
estimator sanity)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    from kafka_hadoop_loader_spark import registry

    return registry.load_all()


def test_ivf_frontier_monotone(spark, reg):
    rows = {
        r["nprobe"]: r
        for r in reg["ann_ivf_probe_frontier"].fn(spark, SF).collect()
    }
    nps = sorted(rows)
    assert len(nps) == 4
    for lo, hi in zip(nps, nps[1:]):
        # probing more cells can only scan more and recall at least as much
        assert rows[hi]["scanned_rows"] >= rows[lo]["scanned_rows"]
        assert rows[hi]["recall_at_k"] >= rows[lo]["recall_at_k"]
    assert 0.0 < rows[nps[0]]["scanned_frac"] <= 1.0
    # at max nprobe the frontier must at least match the fixed-nprobe
    # path's measured envelope
    assert rows[nps[-1]]["recall_at_k"] >= 0.4


def test_kcore_all_degrees_at_least_k(spark, reg):
    rows = reg["graph_kcore"].fn(spark, SF).collect()
    assert rows, "2-core empty on fixture"
    assert all(r["core_degree"] >= 2 for r in rows)
    assert all(r["converged"] for r in rows)


def test_kcore_is_subgraph_of_components(spark, reg):
    core = {r["part_id"] for r in reg["graph_kcore"].fn(spark, SF).collect()}
    comp = {
        r["part_id"]
        for r in reg["graph_connected_components"].fn(spark, SF).collect()
    }
    assert core <= comp


def test_bootstrap_ci_brackets_point(spark, reg):
    [r] = reg["stats_bootstrap_ci"].fn(spark, SF).collect()
    assert r["n_replicates"] == 32
    assert r["ci_low"] <= r["point_mean"] <= r["ci_high"]
    # CI of a mean over ~1500 orders is narrow but nonzero
    assert 0 < r["ci_high"] - r["ci_low"] < r["point_mean"]


def test_kmv_estimates_track_exact(spark, reg):
    [r] = reg["sketch_kmv_setops"].fn(spark, SF).collect()
    for est, exact in (
        (r["est_a"], r["exact_a"]),
        (r["est_b"], r["exact_b"]),
        (r["est_union"], r["exact_union"]),
    ):
        assert exact > 0
        # k=256 KMV: sigma ~ 1/sqrt(k-2) ~ 6%; allow 4 sigma
        assert abs(est - exact) / exact < 0.25
    assert r["est_inter"] >= 0
    assert r["exact_inter"] <= min(r["exact_a"], r["exact_b"])


def test_target_encoding_no_self_leak(spark, reg):
    from pyspark.sql import functions as F

    df = reg["feature_target_encoding"].fn(spark, SF)
    # within one (segment, y) group every row has the identical encoding,
    # and the y=1 rows encode LOWER than y=0 rows (their own positive
    # label was subtracted) -- the leave-one-out signature
    agg = (
        df.groupBy("segment", "y")
        .agg(
            F.countDistinct("loo_enc").alias("nd"),
            F.min("loo_enc").alias("m"),
        )
        .collect()
    )
    assert all(a["nd"] == 1 for a in agg)
    by_seg = {}
    for a in agg:
        by_seg.setdefault(a["segment"], {})[a["y"]] = a["m"]
    for seg, d in by_seg.items():
        if 0 in d and 1 in d:
            assert d[1] < d[0], seg
    assert all(0.0 <= a["m"] <= 1.0 for a in agg)


def test_cross_split_leakage_classes(spark, reg):
    rows = reg["dedup_cross_split_leakage"].fn(spark, SF).collect()
    names = {"train", "val", "test"}
    rank = {"train": 0, "val": 1, "test": 2}
    for r in rows:
        assert r["split_from"] in names and r["split_to"] in names
        assert rank[r["split_from"]] <= rank[r["split_to"]]
        if r["split_from"] == r["split_to"]:
            assert r["leaked_eval_docs"] is None
        else:
            assert 0 <= r["leaked_eval_docs"] <= r["n_pairs"]
