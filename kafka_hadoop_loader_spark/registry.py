"""Query registry: one entry per operator in SURVEY.md §2's inventory.

Each registered query carries:

- ``fn(spark, sf_dir) -> DataFrame``  — the Spark-first implementation;
- ``oracle``                          — equivalent DuckDB SQL over the
  pre-registered fixture views, or ``None`` for genuinely
  non-SQL-expressible ops (driver then records a rows-only check);
- ``doc``                             — what the operator demonstrates +
  scale notes.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry, so adding an operator here is the single registration point.

Determinism conventions (SURVEY.md §5.2), applied to every oracle-checked
query:
- alias every computed column identically on both sides;
- round double aggregates identically on both sides;
- timestamps in outputs are NTZ microseconds on the Spark side (DuckDB
  timestamps are naive microseconds);
- LIMIT always rides on a total order (explicit tie-break keys).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add ``fn`` to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# The grading driver's correctness run evaluates a bounded prefix of
# ``queries()`` (each round covers ~50 insertion-order entries).
# Queries not yet verified by a driver run are therefore rotated to the
# FRONT of the returned mapping each round, so every query accumulates
# a driver-green CORRECTNESS row over successive rounds.
#
# Round 5 priority (exactly 50 entries; after r4 the cumulative
# driver-green set is 189/248 with 0 red, leaving 59 never-tested —
# computed by diffing CORRECTNESS_r0{1..4}.json keys against the
# registry).  Ordering per the round-4 verdict:
# 1. the 15 round-4 operators (highest novelty risk: graph CC/LPA,
#    t-digest, KN-LM, XML, pipe syntax, ANN audit);
# 2. 35 of the 44-name recorded queue, in queue order, explicitly
#    keeping the three round-2 stragglers the verdict called out
#    (text_gini_diversity, agg_bitmap_presence, sample_reservoir_group)
#    and events_peak_concurrency (rewritten onto the two-phase
#    distributed rank this round — its driver row proves the rewrite).
# The 9 spilled names (events/orders §2.BB satellites only) are listed
# in the round-6 queue below.  Pure presentation order — names, fns,
# and oracles are unchanged.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- 1. the 15 round-4 operators --
    "graph_connected_components",
    "text_perplexity_proxy",
    "ann_recall_audit",
    "sample_hard_negatives",
    "quantiles_tdigest",
    "dedup_semantic_prune",
    "regr_normal_equations",
    "sql_pipe_syntax",
    "window_session_native",
    "udf_arrow_optimized",
    "scan_xml",
    "phrase_search",
    "text_bigram_kneser_ney",
    "graph_label_propagation",
    "dedup_clusters_star",
    # -- 2. the recorded round-5 queue (35 of 44, queue order) --
    "agg_bitmap_presence",
    "agg_share_reused_exchange",
    "agg_filtered_bool",
    "agg_grouping_id",
    "orders_basket_size_dist",
    "nation_trade_balance",
    "sample_reservoir_group",
    "pipeline_funnel",
    "sample_weighted_priority",
    "curriculum_order",
    "pack_padding_waste",
    "skew_profile",
    "interval_overlap_join",
    "observe_metrics_audit",
    "schema_contract_check",
    "fn_struct_bitwise",
    "fn_array_setops",
    "doc_sparse_cosine",
    "embedding_quantize_int8",
    "stats_mad_robust",
    "stats_winsorize",
    "basket_part_affinity",
    "supplier_lead_time",
    "quantiles_interpolated",
    "orders_rfm_segments",
    "supplier_concentration_hhi",
    "events_bot_regularity",
    "text_gini_diversity",
    "text_hapax_ratio",
    "cumulative_distinct_users",
    "ts_similarity_search",
    "events_user_lifetime",
    "events_pipeline_report",
    "events_activity_islands",
    "events_peak_concurrency",
)

# Round-6 rotation queue (the 9 events/orders satellite names that
# spilled past round-5's 50-entry window, plus operators newly added in
# round 5; recompute by diffing CORRECTNESS_r0{1..5}.json keys against
# the registry at round-6 start — any r5 misses get re-promoted first,
# then:
#   events_markov_transitions events_time_weighted_avg
#   orders_cohort_revenue events_dau_wau_mau events_seasonality_profile
#   events_longest_streak events_type_diversity events_new_vs_returning
#   orders_reorder_cycle
# round-5 additions (never driver-tested): rank_distributed
#   join_fuzzy_blocked k_anonymity_suppress ann_matryoshka_recall
#   hilbert_layout


def load_all() -> dict[str, Query]:
    """Import every operator module so decorators populate REGISTRY.

    Returns the registry with not-yet-driver-verified queries first
    (see ``_DRIVER_WINDOW_PRIORITY``); relative order is otherwise the
    module import order below.
    """
    # Imports are deferred so that importing the package root stays cheap
    # and so a syntax error in one module is easy to localize.
    from kafka_hadoop_loader_spark.operators import (  # noqa: F401
        aggregates,
        cdc,
        dedup,
        filters,
        graph,
        joins,
        layout,
        ml,
        multimodal,
        pipeline,
        profile,
        quality,
        scalars,
        search,
        setops,
        similarity,
        sketch,
        sorts,
        spatial,
        stats,
        textstats,
        timeseries,
        tokenizer,
        tpch,
        tpch2,
        tpch3,
        udfs,
        windows,
    )
    from kafka_hadoop_loader_spark.sources import formats  # noqa: F401
    from kafka_hadoop_loader_spark.streaming import batch_windows  # noqa: F401

    prio = [n for n in _DRIVER_WINDOW_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(prio)]
    return {n: REGISTRY[n] for n in (*prio, *rest)}
