"""Round-7 additions: the full-depth corpus-build composite and the
loader dry-run validator's interaction with the registry surface.

pipeline_corpus_build's value-level correctness is oracle-checked by
the driver (its oracle nests dedup_minhash_lsh's full SQL); these tests
pin the INVARIANTS a funnel must satisfy on any input — monotone
survival, split/pack conservation — so a semantics regression fails
even on fixtures where the oracle happens to agree.
"""

from __future__ import annotations

from tests.conftest import SF_DIR, assert_matches_oracle


def _rows(spark):
    from kafka_hadoop_loader_spark.operators.pipeline import pipeline_corpus_build

    out = pipeline_corpus_build(spark, SF_DIR).collect()
    return {r.stage: r for r in out}, [r.stage for r in out]


def test_corpus_build_matches_oracle(spark, duck):
    from kafka_hadoop_loader_spark import registry

    reg = registry.load_all()
    q = reg["pipeline_corpus_build"]
    assert_matches_oracle(q.fn(spark, SF_DIR), q.oracle, duck)


def test_corpus_build_funnel_invariants(spark):
    by, order = _rows(spark)
    assert order == [
        "corpus",
        "quality_pass",
        "exact_dedup",
        "near_dedup",
        "decontaminated",
        "split_train",
        "split_val",
        "split_test",
        "packed_train",
        "packed_val",
        "packed_test",
    ]
    # survival is monotone non-increasing through the filter stages,
    # in docs AND tokens
    chain = ["corpus", "quality_pass", "exact_dedup", "near_dedup", "decontaminated"]
    for a, b in zip(chain, chain[1:]):
        assert by[b].n_units <= by[a].n_units, (a, b)
        assert by[b].n_tokens <= by[a].n_tokens, (a, b)
    # the funnel actually filters something at this fixture
    assert by["decontaminated"].n_units < by["corpus"].n_units
    # splits partition the clean set exactly (docs and tokens)
    assert (
        by["split_train"].n_units + by["split_val"].n_units + by["split_test"].n_units
        == by["decontaminated"].n_units
    )
    assert (
        by["split_train"].n_tokens
        + by["split_val"].n_tokens
        + by["split_test"].n_tokens
        == by["decontaminated"].n_tokens
    )
    # packing conserves tokens per split, and the sequence count is a
    # valid shard-grain ceil-div: at least ceil(tokens/B) overall, at
    # most one partial sequence per (split, source) shard
    from kafka_hadoop_loader_spark.operators.pipeline import _PACK_BUDGET

    n_sources = 20  # fixture sources; upper bound only needs ">= actual"
    for s in ("train", "val", "test"):
        toks = by[f"split_{s}"].n_tokens
        seqs = by[f"packed_{s}"].n_units
        assert by[f"packed_{s}"].n_tokens == toks
        assert seqs >= (toks + _PACK_BUDGET - 1) // _PACK_BUDGET
        assert seqs <= toks // _PACK_BUDGET + n_sources + 1


def test_corpus_build_near_dedup_is_edge_greedy(spark):
    """Every doc dropped by the near-dup stage must be the LARGER end
    of at least one verified pair whose smaller end survived exact
    dedup — and the smaller ends it points at must themselves be
    exact-dedup survivors (the rule never consults dropped docs)."""
    from pyspark.sql import functions as F

    from kafka_hadoop_loader_spark.operators.dedup import _minhash_pairs
    from kafka_hadoop_loader_spark.catalog import spread, table

    by, _ = _rows(spark)
    full = spread(table(spark, SF_DIR, "documents"), "doc_id")
    pairs = _minhash_pairs(full, SF_DIR)
    n_pairs = pairs.count()
    dropped = by["exact_dedup"].n_units - by["near_dedup"].n_units
    assert 0 <= dropped <= n_pairs
