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


def load_all() -> dict[str, Query]:
    """Import every operator module so decorators populate REGISTRY."""
    # Imports are deferred so that importing the package root stays cheap
    # and so a syntax error in one module is easy to localize.
    from kafka_hadoop_loader_spark.operators import (  # noqa: F401
        aggregates,
        dedup,
        filters,
        joins,
        multimodal,
        scalars,
        setops,
        similarity,
        sorts,
        textstats,
        tpch,
        tpch2,
        tpch3,
        udfs,
        windows,
    )
    from kafka_hadoop_loader_spark.sources import formats  # noqa: F401
    from kafka_hadoop_loader_spark.streaming import batch_windows  # noqa: F401

    return REGISTRY
