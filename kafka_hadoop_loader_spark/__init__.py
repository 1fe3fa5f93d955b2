"""kafka_hadoop_loader_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``michal-harish/kafka-hadoop-loader`` (a Kafka→HDFS incremental
loader, see SURVEY.md §1-§2), re-expressed Spark-first:

- the loader itself is Structured Streaming (``streaming/loader.py``);
- the relational/dataflow surface mandated by SURVEY.md §2.B is the
  DataFrame/SQL API, declared so Catalyst can optimize it
  (``operators/``);
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) are compositions of built-in functions, with
  Pandas UDFs only where built-ins genuinely cannot express the
  semantics (``operators/dedup.py``, ``operators/similarity.py`` ...).

Every query is registered in ``registry.REGISTRY`` together with its
DuckDB oracle SQL; ``__spark_entry__.py`` at the repo root exposes the
driver contract on top of that registry.
"""

from kafka_hadoop_loader_spark.registry import REGISTRY, register

__all__ = ["REGISTRY", "register"]
