"""Scalar function families (SURVEY.md §2.B Scalar functions).

String / date / math / array / map / JSON — all built-in
``pyspark.sql.functions`` (JVM expressions inside whole-stage codegen;
no Python anywhere).  JSON extraction is the one scalar capability the
reference itself has (R6: event-time from a JSON payload field).

Cross-engine notes encoded here:
- DuckDB regexp_replace needs the 'g' flag to match Spark's
  replace-all default;
- DuckDB dayofweek is 0-based (Sunday=0), Spark 1-based (Sunday=1);
- transcendental fns (ln/exp) are NOT correctly-rounded and may differ
  by 1 ulp between libm implementations — only IEEE-exact math (sqrt,
  floor/ceil/abs/mod/x*x) appears in oracle-checked outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import table
from kafka_hadoop_loader_spark.functions.exact import exact_sum
from kafka_hadoop_loader_spark.registry import register


@register(
    "fn_string",
    oracle="""
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               lower(c_mktsegment) AS seg_lower,
               substr(c_name, 1, 8) AS name_prefix,
               length(c_name) AS name_len,
               concat(c_mktsegment, ':', c_name) AS tagged, -- NON-NULL
               -- cols only: concat() NULL-skips in DuckDB but
               -- NULL-propagates in Spark (pinned by
               -- tests/test_fuzz_parity.py::test_concat_null_divergence_pin);
               -- nullable inputs must use || instead
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
               regexp_extract(c_name, '([0-9]+)', 1) AS digits,
               regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
               CAST(len(string_split(c_name, '#')) AS BIGINT) AS n_parts
        FROM customer
        WHERE c_custkey < 500
        ORDER BY c_custkey
    """,
    doc="String family: case, substr, length, concat, lpad, regexp, split.",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.where(F.col("c_custkey") < 500)
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.lower("c_mktsegment").alias("seg_lower"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.length("c_name").cast("bigint").alias("name_len"),
            F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
            F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
            F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
            F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
            F.size(F.split("c_name", "#")).cast("bigint").alias("n_parts"),
        )
        .orderBy("c_custkey")
    )


@register(
    "fn_datetime",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo,
               CAST(day(o_orderdate) AS INTEGER) AS dy,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               strftime(o_orderdate, '%Y-%m') AS ym,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
               CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
        FROM orders
        WHERE o_orderkey < 1000
        ORDER BY o_orderkey
    """,
    doc="""Date/time family: extract fields, truncate, format, diff,
    add_months (month-end clamped identically in both engines), last_day.
    This generalizes the reference's R6 event-time bucketing.""",
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.where(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.year(d).alias("yr"),
            F.month(d).alias("mo"),
            F.dayofmonth(d).alias("dy"),
            F.quarter(d).alias("qtr"),
            F.dayofweek(d).alias("dow"),
            F.date_trunc("month", d).cast("date").alias("month_start"),
            F.date_format(d, "yyyy-MM").alias("ym"),
            F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias(
                "days_to_y2k"
            ),
            F.add_months(d.cast("date"), 3).alias("plus_3mo"),
            F.last_day(d.cast("date")).alias("month_end"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               floor(l_extendedprice) AS price_floor,
               ceil(l_extendedprice) AS price_ceil,
               abs(l_discount - 0.05) AS disc_dev,
               CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
               l_quantity * l_quantity AS qty_sq,
               sqrt(l_extendedprice) AS price_sqrt,
               CAST(round(l_quantity) AS BIGINT) AS qty_round,
               CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
        FROM lineitem
        WHERE l_orderkey < 500
        ORDER BY l_orderkey, l_linenumber
    """,
    doc="""Math family over IEEE-exact ops (floor/ceil/abs/mod/square/
    sqrt/sign — sqrt is correctly-rounded by IEEE-754 so it's portable;
    ln/exp are not and stay out of oracle-checked outputs).""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_orderkey") < 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.floor("l_extendedprice").cast("double").alias("price_floor"),
            F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
            (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
            F.sqrt("l_extendedprice").alias("price_sqrt"),
            F.round("l_quantity").cast("bigint").alias("qty_round"),
            F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "fn_array",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang, string_split(text, ' ') AS words
            FROM documents
        )
        SELECT doc_id, lang,
               CAST(len(words) AS INTEGER) AS n_tokens,
               words[1] AS first_token,
               list_contains(words, 'spark') AS has_spark,
               array_to_string(list_sort(words)[1:3], ',') AS first3_sorted,
               CAST(len(list_distinct(words)) AS INTEGER) AS n_distinct_tokens
        FROM toks
        ORDER BY doc_id
    """,
    doc="""Array family: split, size, element_at, array_contains,
    sort_array+slice+array_join, array_distinct — the building blocks the
    text-analysis operators compose.""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return (
        d.select(
            "doc_id",
            "lang",
            F.size(words).alias("n_tokens"),
            F.element_at(words, 1).alias("first_token"),
            F.array_contains(words, "spark").alias("has_spark"),
            F.array_join(F.slice(F.sort_array(words), 1, 3), ",").alias("first3_sorted"),
            F.size(F.array_distinct(words)).alias("n_distinct_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_json",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="""JSON extraction — the reference's only scalar function (R6:
    read a field out of a JSON payload).  get_json_object pushes into
    codegen; no Python JSON parsing.""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "fn_map",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
               array_to_string(json_keys(props), ',') AS prop_keys
        FROM events
        WHERE event_id < 200
        ORDER BY event_id
    """,
    doc="""Map family via from_json: payload JSON -> MapType, then
    element_at + map_keys (R5/R6 deserialization-hook parity, typed).""",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        ev.where(F.col("event_id") < 200)
        .select(
            "event_id",
            F.element_at(m, "k").cast("bigint").alias("k_value"),
            F.array_join(F.sort_array(F.map_keys(m)), ",").alias("prop_keys"),
        )
        .orderBy("event_id")
    )


@register(
    "fn_struct_bitwise",
    oracle="""
        SELECT o_orderkey,
               ({'k': o_orderkey, 'c': o_custkey}).k + 1 AS st_key_next,
               ({'k': o_orderkey, 'c': o_custkey}).c AS st_cust,
               o_orderkey & o_custkey AS b_and,
               o_orderkey | o_custkey AS b_or,
               xor(o_orderkey, o_custkey) AS b_xor,
               o_orderkey << 3 AS shl3,
               o_orderkey >> 1 AS shr1,
               CAST(bit_count(o_orderkey) AS INTEGER) AS popcnt,
               greatest(o_orderkey, o_custkey * 10, 1000) AS g3,
               least(o_orderkey, o_custkey * 10, 1000) AS l3,
               nullif(o_custkey % 5, 0) AS nz_mod,
               coalesce(nullif(o_custkey % 5, 0), -1) AS nz_mod_filled
        FROM orders
        WHERE o_orderkey < 2000
        ORDER BY o_orderkey
    """,
    doc="""Struct construction/field access + the bitwise family
    (AND/OR/XOR/shifts/popcount) + n-ary conditionals
    (greatest/least/nullif/coalesce) — the expression-matrix rows not
    covered by the string/date/math/array/map/json tours.  Structs are
    built then immediately field-accessed so the output stays scalar
    (nested columns don't canonicalize in the driver's pandas hash);
    Catalyst collapses the construct+access to the field expression, so
    the struct costs nothing at any scale.  All integer ops — exact on
    both engines by definition.""",
)
def fn_struct_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    st = F.struct(F.col("o_orderkey").alias("k"), F.col("o_custkey").alias("c"))
    return (
        o.where(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            (st.getField("k") + 1).alias("st_key_next"),
            st.getField("c").alias("st_cust"),
            F.col("o_orderkey").bitwiseAND(F.col("o_custkey")).alias("b_and"),
            F.col("o_orderkey").bitwiseOR(F.col("o_custkey")).alias("b_or"),
            F.col("o_orderkey").bitwiseXOR(F.col("o_custkey")).alias("b_xor"),
            F.shiftleft("o_orderkey", 3).alias("shl3"),
            F.shiftright("o_orderkey", 1).alias("shr1"),
            F.bit_count("o_orderkey").alias("popcnt"),
            F.greatest("o_orderkey", F.col("o_custkey") * 10, F.lit(1000)).alias("g3"),
            F.least("o_orderkey", F.col("o_custkey") * 10, F.lit(1000)).alias("l3"),
            F.nullif(F.col("o_custkey") % 5, F.lit(0)).alias("nz_mod"),
            F.coalesce(F.nullif(F.col("o_custkey") % 5, F.lit(0)), F.lit(-1)).alias(
                "nz_mod_filled"
            ),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_variant",
    oracle="""
        WITH j AS (
            SELECT event_id,
                   '{"k":' || CAST(user_id % 100 AS VARCHAR)
                   || ',"tags":["t' || CAST(event_id % 3 AS VARCHAR)
                   || '","x"],"meta":{"u":' || CAST(user_id AS VARCHAR)
                   || '}}' AS doc,
                   props
            FROM events
            WHERE event_id < 5000
        )
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER) AS props_k,
               CAST(json_extract(doc, '$.k') AS INTEGER) AS k_int,
               CAST(json_extract(doc, '$.meta.u') AS BIGINT) AS meta_u,
               json_extract_string(doc, '$.tags[0]') AS tag0,
               CAST(NULL AS VARCHAR) AS k_as_string_try,
               CAST(json_array_length(json_extract(doc, '$.tags')) AS INTEGER)
                   AS n_tags
        FROM j
        ORDER BY event_id
    """,
    doc="""VARIANT semi-structured type (Spark 4): parse_json turns the
    props JSON string and a constructed nested document into the binary
    VARIANT encoding; typed path extraction via variant_get (nested
    object path, array index), try_variant_get returning NULL on a type
    mismatch instead of failing, and array cardinality — the
    shred-on-read pattern that replaces string re-parsing per access.
    At 100 TB, VARIANT's advantage is decode-once: the binary encoding
    is ~an order of magnitude cheaper to path-extract than re-tokenizing
    JSON text per field (and parquet shredding can push extraction to
    the scan).  Oracle replays the same paths with DuckDB's JSON ops on
    the identical strings; the try-mismatch column is the NULL contract
    itself.""",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").where(F.col("event_id") < 5000)
    doc = F.format_string(
        '{"k":%d,"tags":["t%d","x"],"meta":{"u":%d}}',
        F.col("user_id") % 100,
        F.col("event_id") % 3,
        F.col("user_id"),
    )
    v = F.parse_json(doc)
    return e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("props_k"),
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.meta.u", "bigint").alias("meta_u"),
        F.try_variant_get(v, "$.tags[0]", "string").alias("tag0"),
        # wrong-type extraction must yield NULL, not error (an object
        # can't cast to int; note variant->string never fails — it
        # serializes the value as JSON text instead)
        F.try_variant_get(v, "$.meta", "int").cast("string").alias("k_as_string_try"),
        F.try_variant_get(v, "$.tags", "array<string>").alias("tags_arr"),
    ).select(
        "event_id",
        "props_k",
        "k_int",
        "meta_u",
        "tag0",
        "k_as_string_try",
        F.size("tags_arr").alias("n_tags"),
    ).orderBy("event_id")


@register(
    "fn_try_safe",
    oracle="""
        SELECT c_custkey,
               TRY_CAST(c_name AS INTEGER) AS name_as_int,
               TRY_CAST(substr(c_name, 10) AS BIGINT) AS suffix_as_int,
               CASE WHEN c_custkey % 7 = 0 THEN NULL
                    ELSE CAST(c_custkey AS DOUBLE)
                         / CAST(c_custkey % 7 AS DOUBLE) END AS safe_div,
               TRY_CAST('2024-13-45' AS DATE) AS bad_date,
               TRY_CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS good_cast
        FROM customer
        WHERE c_custkey < 2000
        ORDER BY c_custkey
    """,
    doc="""ANSI-safety functions: try_cast and try_divide return NULL on
    malformed input / division by zero instead of failing the 10-hour
    job at row 3 billion — the error-containment contract a production
    pipeline runs under (spark.sql.ansi.enabled=true makes plain casts
    THROW; the try_* family is the per-expression opt-out).  NULL-on-
    failure semantics are proven against the oracle: DuckDB TRY_CAST
    for the casts, an explicit zero-guard CASE for the division (which
    is exactly what try_divide compiles to).  Stateless map, fused into
    the scan.""",
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.where(F.col("c_custkey") < 2000)
        .select(
            "c_custkey",
            F.expr("try_cast(c_name AS int)").alias("name_as_int"),
            F.expr("try_cast(substring(c_name, 10) AS bigint)").alias(
                "suffix_as_int"
            ),
            F.try_divide(
                F.col("c_custkey").cast("double"),
                (F.col("c_custkey") % 7).cast("double"),
            ).alias("safe_div"),
            F.expr("try_cast('2024-13-45' AS date)").alias("bad_date"),
            F.expr("try_cast(cast(c_custkey AS string) AS bigint)").alias(
                "good_cast"
            ),
        )
        .orderBy("c_custkey")
    )


@register(
    "fn_collation_ci",
    oracle="""
        SELECT lower(c_mktsegment) AS seg_ci,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT lower(c_name)) AS BIGINT) AS n_names,
               min(upper(c_name)) AS first_name_ci
        FROM customer
        GROUP BY seg_ci
        ORDER BY seg_ci
    """,
    doc="""Collation-aware comparison (Spark 4 COLLATE): grouping and
    min() under UNICODE_CI compare case-insensitively at the TYPE
    level — the collation travels with the column through every
    operator, instead of wrapping each use-site in lower() and hoping
    nobody forgets one.  Engine-portability note baked into the query
    shape: a CI-collated string's IDENTITY (which representative
    survives) is engine-specific, so the output projects explicit
    lower()/upper() canonical forms — the collation governs the
    COMPARISON semantics (group membership, the min ordering), while
    the output stays bit-portable.  That split — collate for
    semantics, canonicalize for output — is the right discipline at
    any scale.""",
)
def fn_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    seg_ci = F.expr("c_mktsegment COLLATE UNICODE_CI")
    return (
        c.groupBy(seg_ci.alias("seg"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct(F.expr("c_name COLLATE UNICODE_CI")).alias("n_names"),
            F.min(F.upper(F.expr("c_name COLLATE UNICODE_CI"))).alias(
                "first_name_ci"
            ),
        )
        .select(
            F.lower(F.col("seg").cast("string")).alias("seg_ci"),
            "n",
            "n_names",
            F.col("first_name_ci").cast("string"),
        )
        .orderBy("seg_ci")
    )


@register(
    "fn_array_setops",
    oracle="""
        WITH halves AS (
            SELECT doc_id,
                   list_sort(list_distinct(
                       string_split(text, ' ')[1:len(string_split(text, ' ')) // 2]
                   )) AS first_half,
                   list_sort(list_distinct(
                       string_split(text, ' ')[len(string_split(text, ' ')) // 2 + 1:]
                   )) AS second_half
            FROM documents
        )
        SELECT doc_id,
               CAST(len(first_half) AS INTEGER) AS n_first,
               CAST(len(second_half) AS INTEGER) AS n_second,
               CAST(len(list_intersect(first_half, second_half)) AS INTEGER)
                   AS n_common,
               CAST(len(list_filter(first_half,
                                    x -> NOT list_contains(second_half, x)))
                    AS INTEGER) AS n_dropped,
               CAST(len(list_filter(second_half,
                                    x -> NOT list_contains(first_half, x)))
                    AS INTEGER) AS n_new
        FROM halves
        ORDER BY doc_id
    """,
    doc="""Array set algebra (array_intersect / array_except) applied as
    vocabulary-churn analysis: split each document in half and measure
    shared, dropped, and newly-introduced words between the halves —
    the drift diagnostic run between corpus snapshots, here in-row.
    All in-row higher-order functions over sorted distinct arrays:
    zero shuffle, zero UDF; set sizes are exact integers.  (DuckDB
    lacks list_except, so the oracle derives it as a filtered
    NOT-contains — same semantics, independently expressed.)""",
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n = F.size(w)
    fh = F.sort_array(F.array_distinct(F.slice(w, 1, F.floor(n / 2).cast("int"))))
    sh = F.sort_array(
        F.array_distinct(
            F.expr(
                "slice(split(text, ' '), CAST(size(split(text, ' ')) / 2 AS INT)"
                " + 1, size(split(text, ' ')))"
            )
        )
    )
    halves = d.select("doc_id", fh.alias("first_half"), sh.alias("second_half"))
    return halves.select(
        "doc_id",
        F.size("first_half").alias("n_first"),
        F.size("second_half").alias("n_second"),
        F.size(F.array_intersect("first_half", "second_half")).alias("n_common"),
        F.size(F.array_except("first_half", "second_half")).alias("n_dropped"),
        F.size(F.array_except("second_half", "first_half")).alias("n_new"),
    ).orderBy("doc_id")


@register(
    "fn_explode_outer",
    oracle="""
        WITH src AS (
            SELECT n_nationkey,
                   CASE WHEN n_nationkey % 3 = 0
                        THEN CAST(NULL AS VARCHAR[])
                        WHEN n_nationkey % 3 = 1
                        THEN CAST([] AS VARCHAR[])
                        ELSE string_split(n_name, 'A')
                   END AS parts
            FROM nation
        )
        SELECT n_nationkey,
               CAST(u.part AS VARCHAR) AS part,
               CAST(u.i - 1 AS BIGINT) AS pos
        FROM src
        LEFT JOIN LATERAL (
            SELECT src.parts[g.i] AS part, g.i AS i
            FROM unnest(generate_series(1, len(src.parts))) AS g(i)
        ) AS u ON TRUE
        ORDER BY n_nationkey, pos NULLS FIRST
    """,
    doc="""explode_outer / posexplode_outer NULL semantics — the seam
    where inner and outer lateral views diverge: an INNER explode DROPS
    rows whose array is NULL or empty, an OUTER explode keeps them with
    NULL element/position.  One third of the nations get a NULL array,
    one third an empty array, one third real splits, so all three
    behaviors land in the result (and the row-preserving guarantee —
    every nationkey present — is what the oracle's LEFT JOIN LATERAL
    replays).

    Scale: explode is a zero-shuffle generator either way; the outer
    form matters because silently dropping null-array parents is the
    most common correctness bug in fan-out ETL (a doc with no chunks
    vanishes from per-doc accounting).""",
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    parts = (
        F.when(F.col("n_nationkey") % 3 == 0, F.lit(None).cast("array<string>"))
        .when(F.col("n_nationkey") % 3 == 1, F.array().cast("array<string>"))
        .otherwise(F.split("n_name", "A"))
    )
    return (
        n.select("n_nationkey", parts.alias("parts"))
        .select(
            "n_nationkey",
            F.posexplode_outer("parts").alias("pos0", "part"),
        )
        .select(
            "n_nationkey",
            "part",
            F.col("pos0").cast("bigint").alias("pos"),
        )
        .orderBy("n_nationkey", F.col("pos").asc_nulls_first())
    )
