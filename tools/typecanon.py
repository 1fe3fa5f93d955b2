"""Typed-schema parity between Spark results and DuckDB oracles.

Round 2 lesson: the grading driver canonicalizes *typed* values (via
Arrow/pandas), so a DuckDB integer ``SUM()`` that silently widens to
HUGEINT/decimal128 hash-mismatches a Spark BIGINT even when every value
is numerically identical.  ``repr()``-of-``fetchall()`` hashing is
type-blind to this (DuckDB hands HUGEINT to Python as a plain ``int``),
which is why CORRECTNESS_r02's 8 red rows were invisible locally.

The check here compares *type families* between the Spark result schema
and the oracle's Arrow schema.  Families are deliberately coarse —
int32 vs int64 is fine (driver-green rows exist for Spark ``rank()``'s
int32 vs DuckDB's BIGINT) — but decimal-vs-int, float-vs-int,
string-vs-anything etc. are exactly the silent killers.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa


def arrow_family(t: pa.DataType) -> str:
    """Coarse type family of a pyarrow type (oracle side)."""
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "list"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_map(t):
        return "map"
    if pa.types.is_null(t):
        return "null"
    return f"other:{t}"


def spark_family(dt: Any) -> str:
    """Coarse type family of a pyspark sql type (engine side)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, (T.StringType, T.VarcharType, T.CharType)):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.ArrayType):
        return "list"
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.MapType):
        return "map"
    if isinstance(dt, T.NullType):
        return "null"
    return f"other:{dt.simpleString()}"


def oracle_arrow_schema(con, sql: str) -> pa.Schema:
    """Arrow schema of an oracle query without materializing its rows.

    Any SELECT (including ones ending in ORDER BY / LIMIT) can be wrapped
    as a zero-row subquery; DuckDB still type-checks the full expression
    tree, which is all we need.
    """
    return con.execute(f"SELECT * FROM ({sql}) AS _tc LIMIT 0").arrow().schema


def type_mismatches(spark_schema, arrow_schema: pa.Schema) -> list[str]:
    """Family mismatches between a Spark schema and an oracle Arrow schema.

    Returns human-readable ``col: spark_family(sparktype) != arrow_family
    (arrowtype)`` strings; empty list means typed hashing will agree.
    Column sets are compared by the caller (driver checks names
    separately); here only the intersection is type-checked.
    """
    sfam = {f.name: (spark_family(f.dataType), f.dataType.simpleString()) for f in spark_schema.fields}
    out = []
    for field in arrow_schema:
        if field.name not in sfam:
            continue
        sf, sdetail = sfam[field.name]
        af = arrow_family(field.type)
        if sf != af:
            out.append(f"{field.name}: spark {sf}({sdetail}) != oracle {af}({field.type})")
    return out
