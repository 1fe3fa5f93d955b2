"""User-defined function surface (SURVEY.md §2.B "UDF / UDAF / UDTF"):
the reference's one extension point is a pluggable Java deserializer
applied per record [pub: src/main/java/io/amient/kafka/hadoop/
HadoopJobMapper.java — mapper.timestamp.extractor hook]; the engine
generalizes it to the full PySpark UDF surface, always Arrow-batched:

- scalar pandas_udf        (vectorized per-row transform)
- GROUPED_AGG pandas_udf   (custom aggregate)
- applyInPandas            (grouped-map: whole group in, whole frame out)
- Python UDTF              (one row in, many rows out)

Every query here keeps its Python outputs integer-exact so the DuckDB
oracle hash-matches: floats crossing the Arrow boundary are bit-stable,
but integer outputs make determinism obvious and shuffle-order-proof.

Scale notes: pandas UDFs move columns, not rows, through Arrow — at
100 TB the per-batch overhead amortizes to ~zero and the Python work
runs data-parallel in every executor's worker pool.  Row-at-a-time
``F.udf`` never appears in this engine (10-100x slower; the hot paths
stay JVM-side entirely).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kafka_hadoop_loader_spark.catalog import spread, table
from kafka_hadoop_loader_spark.registry import register


def _make_vowel_count():
    """Scalar pandas UDF, built lazily: @pandas_udf parses its DDL return
    type against the ACTIVE session, so decorating at import time would
    require a SparkContext before the engine has one."""

    @pandas_udf("bigint")
    def _vowel_count(texts: pd.Series) -> pd.Series:
        return texts.str.count(r"[aeiou]").astype("int64")

    return _vowel_count


@register(
    "udf_scalar_pandas",
    oracle="""
        SELECT lang,
               CAST(SUM(length(regexp_replace(text, '[^aeiou]', '', 'g'))) AS BIGINT) AS vowels,
               CAST(SUM(length(text)) AS BIGINT) AS chars,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    doc="""Scalar pandas_udf (Arrow-vectorized vowel count) feeding a
    JVM aggregate — the R5 deserializer-hook pattern generalized
    [pub: …/HadoopJobMapper.java]: custom per-record Python logic in the
    middle of an otherwise JVM-side plan.  Integer outputs, exact.""",
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    vowel_count = _make_vowel_count()
    return (
        d.select("lang", vowel_count(F.col("text")).alias("v"), F.length("text").alias("c"))
        .groupBy("lang")
        .agg(
            F.sum("v").alias("vowels"),
            F.sum("c").cast("bigint").alias("chars"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("lang")
    )


def _make_token_count_aggs():
    """GROUPED_AGG pandas UDFs (lazy for the same session reason).  Both
    aggregates are pandas UDFs because Spark disallows mixing a group
    aggregate pandas UDF with JVM aggregates in one agg()
    (INVALID_PANDAS_UDF_PLACEMENT)."""

    @pandas_udf("bigint")
    def _token_count_agg(tokens: pd.Series) -> int:
        return int(tokens.sum())

    @pandas_udf("bigint")
    def _group_size(tokens: pd.Series) -> int:
        return int(len(tokens))

    return _token_count_agg, _group_size


@register(
    "udaf_grouped_agg",
    oracle="""
        SELECT lang,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    doc="""GROUPED_AGG pandas_udf: a user-defined aggregate over groups
    (total whitespace tokens per language).  Partial aggregation is not
    available to Python UDAFs, so at scale pre-reduce JVM-side where
    possible — here the per-row token count is computed JVM-side
    (F.size(F.split())) and only the final custom reduction is Python.""",
)
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    toks = d.select("lang", F.size(F.split("text", " ")).cast("bigint").alias("tc"))
    token_count_agg, group_size = _make_token_count_aggs()
    return (
        toks.groupBy("lang")
        .agg(
            token_count_agg(F.col("tc")).alias("total_tokens"),
            group_size(F.col("tc")).alias("n_docs"),
        )
        .orderBy("lang")
    )


def _per_lang_running(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map: whole language-group in, running totals out.
    Sorts by doc_id internally so the result is shuffle-order-proof."""
    pdf = pdf.sort_values("doc_id")
    pdf["run_chars"] = pdf["chars"].cumsum().astype("int64")
    pdf["lang_rank"] = range(1, len(pdf) + 1)
    return pdf[["lang", "doc_id", "chars", "run_chars", "lang_rank"]]


@register(
    "udf_grouped_map",
    oracle="""
        SELECT lang, doc_id,
               CAST(length(text) AS BIGINT) AS chars,
               CAST(SUM(CAST(length(text) AS BIGINT))
                   OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS run_chars,
               CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id)
                    AS BIGINT) AS lang_rank
        FROM documents
        ORDER BY lang, doc_id
    """,
    doc="""applyInPandas grouped-map: each language's documents arrive as
    one pandas frame; running character totals computed in pandas.  The
    oracle is the equivalent SQL window — proving the grouped-map path
    reproduces window semantics exactly.  At scale each group must fit
    one executor's memory: use this for per-entity model fitting, not
    for giant groups (windows/aggs cover those JVM-side).""",
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    chars = d.select("lang", "doc_id", F.length("text").cast("bigint").alias("chars"))
    out = chars.groupBy("lang").applyInPandas(
        _per_lang_running,
        schema="lang string, doc_id bigint, chars bigint, run_chars bigint, lang_rank bigint",
    )
    return out.orderBy("lang", "doc_id")


@register(
    "udtf_tokens",
    oracle="""
        SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok
        FROM (
            SELECT doc_id,
                   generate_subscripts(string_split(text, ' '), 1) AS pos,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
        )
        WHERE length(tok) >= 8
        ORDER BY doc_id, pos
    """,
    doc="""UDTF pattern (one row -> many rows): tokenize each document
    and emit one row per long token with its position.  Implemented as
    the JVM-side posexplode of a split — the idiomatic Spark UDTF; a
    Python UDTF would only be warranted for logic inexpressible as an
    array expression (none in this engine).""",
)
def udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok"))
        .select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "tok")
        .where(F.length("tok") >= 8)
        .orderBy("doc_id", "pos")
    )


_SEG = 10  # words per segment


@register(
    "udtf_python_api",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents WHERE doc_id < 2000
        )
        SELECT doc_id,
               CAST((s - 1) // {_SEG} AS BIGINT) AS seg_idx,
               CAST(LEAST({_SEG}, len(ws) - s + 1) AS INTEGER) AS n_words,
               ws[s] AS first_word,
               ws[LEAST(s + {_SEG} - 1, len(ws))] AS last_word
        FROM w, unnest(generate_series(1, len(ws), {_SEG})) AS u(s)
        ORDER BY doc_id, seg_idx
    """,
    doc=f"""Python UDTF via the real Spark 4 @udtf class API (eval ->
    yield, Arrow-optimized transfer, registered + invoked through SQL's
    LATERAL table-function syntax) — the genuinely-custom-table-function
    seam, complementing udtf_tokens which shows the same SHAPE compiled
    to a JVM posexplode.  Segments documents into {_SEG}-word windows
    with per-segment stats.  The division of labor the pair
    demonstrates: if the fan-out is expressible as explode, use the
    JVM form (udtf_tokens); reach for a Python UDTF only when per-row
    expansion logic is real code — and then mark it Arrow-optimized, as
    here.  Bounded to doc_id < 2000: per-row Python is the slow path by
    design.""",
)
def udtf_python_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "doc_id bigint, seg_idx bigint, n_words int,"
            " first_word string, last_word string"
        ),
        useArrow=True,
    )
    class SegmentUdtf:
        def eval(self, doc_id, text):
            words = text.split(" ")
            for i in range(0, len(words), _SEG):
                seg = words[i : i + _SEG]
                yield doc_id, i // _SEG, len(seg), seg[0], seg[-1]

    spark.udtf.register("khl_segments", SegmentUdtf)
    table(spark, sf_dir, "documents").where(F.col("doc_id") < 2000).select(
        "doc_id", "text"
    ).createOrReplaceTempView("khl_udtf_docs")
    return spark.sql("""
        SELECT u.doc_id AS doc_id, u.seg_idx AS seg_idx,
               u.n_words AS n_words, u.first_word AS first_word,
               u.last_word AS last_word
        FROM khl_udtf_docs AS d,
        LATERAL khl_segments(d.doc_id, d.text) AS u
        ORDER BY doc_id, seg_idx
    """)


def _make_tail_signature():
    """Arrow-optimized row-at-a-time Python UDF (Spark 3.5+/4
    ``useArrow=True``): plain-Python function semantics with Arrow
    batch transfer — ArrowEvalPython in the plan, NOT the row-pickling
    BatchEvalPython the plan tests forbid.  Built lazily (same session
    reason as the pandas UDFs)."""

    @F.udf("string", useArrow=True)
    def _tail_signature(text: str | None) -> str | None:
        # deterministic per-row transform, SQL-replayable: the last 12
        # code points reversed, lowercased.  NULL in -> NULL out (the
        # oracle's reverse(NULL) is NULL; without the guard None[::-1]
        # raises inside the Arrow batch).  Code-point-wise like Spark's
        # and DuckDB's reverse() on this fixture's ASCII text.
        if text is None:
            return None
        return text[::-1][:12].lower()

    return _tail_signature


@register(
    "udf_arrow_optimized",
    oracle="""
        SELECT doc_id,
               lower(substr(reverse(text), 1, 12)) AS tail_sig,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
        ORDER BY doc_id
    """,
    doc="""Arrow-optimized Python UDF (``F.udf(..., useArrow=True)``,
    the Spark 4 default-able third UDF tier): write per-row Python, get
    Arrow-batched transfer — the migration path for legacy row UDFs
    that cannot be vectorized as pandas_udf.  The plan shows
    ArrowEvalPython (asserted in tests/test_plans.py), never the
    pickled BatchEvalPython this repo bans.  The transform (reverse ->
    take 12 -> lower) is code-point-wise and replayed exactly by the
    oracle's reverse/substr/lower.  Scale: same Arrow batch economics
    as a scalar pandas UDF; still Python-per-row inside the batch, so
    pandas_udf remains the hot-path choice (udf_scalar_pandas).""",
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    tail_sig = _make_tail_signature()
    return (
        d.select(
            "doc_id",
            tail_sig(F.col("text")).alias("tail_sig"),
            F.length("text").cast("bigint").alias("n_chars"),
        )
        .orderBy("doc_id")
    )
