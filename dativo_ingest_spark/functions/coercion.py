"""Contract type coercion as Catalyst Column expressions.

Re-expresses the reference's per-row ``_coerce_type`` semantics
(reference: src/dativo_ingest/schema_validator.py:174-263) as pure Spark SQL
expressions so coercion runs JVM-side inside whole-stage codegen — no Python
in the hot path. Semantics preserved:

- ``string``   : cast to string.
- ``integer``  : int stays; numeric string parses (a decimal string like
  ``"3.7"`` FAILS, as Python ``int(str)`` does); float TRUNCATES toward zero.
- ``float``    : numeric or numeric-string to double.
- ``boolean``  : strings via token sets {true,1,yes,on} / {false,0,no,off}
  (case-insensitive); numerics via ``!= 0``.
- ``timestamp``/``datetime``/``date`` : strptime ladder of 7 formats
  (ISO 'T' w/ and w/o fraction / 'Z' / offset, space-separated, bare date →
  midnight). ``date`` maps to Spark DateType (the reference inconsistently
  writes parquet timestamp-us but declares Iceberg DateType — SURVEY §1.2;
  we standardize on DateType and document the divergence).
- unknown type : value passes through as string (degradation rule).

Coercion FAILURE is represented as NULL-out plus an error record; the
validation operator (operators/validation.py) turns that into the strict/warn
behavior of the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Python strptime ladder from the reference, translated to Spark datetime
# patterns. Order matters only for documentation — each input string matches
# at most one pattern family; fraction patterns accept 1-6 digits via [S..].
TIMESTAMP_PATTERNS: tuple[str, ...] = (
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'",
    "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "yyyy-MM-dd'T'HH:mm:ssxx",
    "yyyy-MM-dd'T'HH:mm:ssxxx",
)

TRUE_TOKENS = ("true", "1", "yes", "on")
FALSE_TOKENS = ("false", "0", "no", "off")

#: CSV NA sentinels nulled at read time (reference: csv_extractor.py:171-173).
NA_SENTINELS = ("", "NULL", "null", "None")


def coerce_string(col: Column) -> Column:
    return col.cast("string")


def coerce_integer(col: Column) -> Column:
    """int | integer-string | float(truncate) → long; else NULL.

    try_cast(string → long) rejects decimal strings, matching ``int(str)``;
    try_cast(double → long) truncates toward zero, matching ``int(float)``.
    """
    return col.try_cast("long")


def coerce_float(col: Column) -> Column:
    return col.try_cast("double")


def coerce_boolean(col: Column, input_type: T.DataType | None = None) -> Column:
    """Token-set boolean (strings) / != 0 (numerics) / NULL on failure."""
    if isinstance(input_type, T.BooleanType):
        return col
    if isinstance(input_type, T.NumericType):
        return col != F.lit(0)
    lowered = F.lower(col.cast("string"))
    as_num = col.try_cast("double")
    return (
        F.when(lowered.isin(*TRUE_TOKENS), F.lit(True))
        .when(lowered.isin(*FALSE_TOKENS), F.lit(False))
        .when(as_num.isNotNull(), as_num != F.lit(0.0))
        .otherwise(F.lit(None).cast("boolean"))
    )


def coerce_timestamp(col: Column, input_type: T.DataType | None = None) -> Column:
    """strptime format ladder → timestamp; NULL when no format matches.

    Already-typed temporal inputs pass straight through (the reference
    short-circuits on ``isinstance(value, datetime)``); dates become
    midnight, matching ``datetime.combine(value, time.min)``.
    """
    if isinstance(
        input_type, (T.TimestampType, T.TimestampNTZType, T.DateType)
    ):
        return col.cast("timestamp")
    s = col.cast("string")
    return F.coalesce(
        *[F.try_to_timestamp(s, F.lit(p)) for p in TIMESTAMP_PATTERNS]
    )


def coerce_date(col: Column, input_type: T.DataType | None = None) -> Column:
    return coerce_timestamp(col, input_type).cast("date")


_COERCERS = {
    "string": coerce_string,
    "integer": coerce_integer,
    "float": coerce_float,
    "double": coerce_float,
    "boolean": coerce_boolean,
    "timestamp": coerce_timestamp,
    "datetime": coerce_timestamp,
    "date": coerce_date,
}

#: Spark type name produced per contract type (unknown → string degradation).
SPARK_TYPE_FOR = {
    "string": "string",
    "integer": "bigint",
    "float": "double",
    "double": "double",
    "boolean": "boolean",
    "timestamp": "timestamp",
    "datetime": "timestamp",
    "date": "date",
}


_TYPE_AWARE = {"boolean", "timestamp", "datetime", "date"}


def coerce(
    col: Column, contract_type: str, input_type: T.DataType | None = None
) -> Column:
    """Coerce ``col`` to the contract type; unknown types degrade to string.

    ``input_type`` (the source column's Spark type, when known) enables the
    reference's short-circuits for already-typed values.
    """
    fn = _COERCERS.get(contract_type, coerce_string)
    if contract_type in _TYPE_AWARE:
        return fn(col, input_type)
    return fn(col)


def spark_type_for(contract_type: str) -> str:
    return SPARK_TYPE_FOR.get(contract_type, "string")


def null_na_sentinels(col: Column, sentinels: tuple[str, ...] = NA_SENTINELS) -> Column:
    """CSV NA-sentinel nulling: '', 'NULL', 'null', 'None' → NULL."""
    return F.when(col.isin(*sentinels), F.lit(None).cast("string")).otherwise(col)
