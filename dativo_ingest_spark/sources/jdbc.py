"""JDBC source builders (Postgres / MySQL dialects).

Reference semantics: cursor predicate compiled into the source SQL —
``WHERE cursor >= %s`` on resume, ``>= CURRENT_DATE - INTERVAL`` lookback on
first run (``postgres_extractor.py:156-204``, ``mysql_extractor.py:166-217``);
identifier quoting ``"s"."t"`` vs backticks; server-side fetch batches of
10 000; MySQL BLOB → utf-8/base64 string (``mysql_extractor.py:337-347``).

Spark-first upgrades over the reference:

* the SELECT list is pruned to the contract columns (the reference always
  ships ``SELECT *`` over the wire);
* reads parallelize with ``partitionColumn/lowerBound/upperBound/
  numPartitions`` — N concurrent range scans instead of one cursor;
* ``ORDER BY cursor`` is dropped: the reference needs it so the *last* row
  carries the max cursor, Spark gets the new state from ``max(cursor)``
  (``operators/incremental.state_update_frame``) with no DB-side sort.

Everything here is option/SQL construction (unit-testable without a live
database); the actual read is one ``spark.read.format("jdbc")`` call.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_FETCH_SIZE = 10_000  # reference batch_size (postgres_extractor.py:43-46)


@dataclass(frozen=True)
class Dialect:
    name: str
    quote: str
    lookback_sql: str  # template with {days}

    def ident(self, *parts: str) -> str:
        q = self.quote
        return ".".join(f"{q}{p}{q}" for p in parts if p)


POSTGRES = Dialect("postgres", '"', "CURRENT_DATE - INTERVAL '{days} days'")
MYSQL = Dialect("mysql", "`", "DATE_SUB(CURDATE(), INTERVAL {days} DAY)")
#: embedded Derby — ships in Spark's own jars, so the whole read path
#: (cursor predicate pushdown, partitioned range scans) is exercisable
#: end-to-end in tests with no external database.
DERBY = Dialect(
    "derby", '"',
    "{{fn TIMESTAMPADD(SQL_TSI_DAY, -{days}, CURRENT_DATE)}}")
DIALECTS = {d.name: d for d in (POSTGRES, MYSQL, DERBY)}


def _sql_literal(value: Any) -> str:
    if isinstance(value, (int, float)):
        return str(value)
    if isinstance(value, (_dt.datetime, _dt.date)):
        return f"'{value.isoformat(sep=' ') if isinstance(value, _dt.datetime) else value.isoformat()}'"
    escaped = str(value).replace("'", "''")
    return f"'{escaped}'"


def build_query(
    dialect: str | Dialect,
    table: str,
    schema: str | None = None,
    columns: list[str] | None = None,
    cursor_field: str | None = None,
    cursor_start: Any | None = None,
    lookback_days: int | None = None,
) -> str:
    """Pushed-down extraction query. Cursor resume beats lookback when both
    are present (reference: state wins once it exists,
    ``postgres_extractor.py:186-197``)."""
    d = DIALECTS[dialect] if isinstance(dialect, str) else dialect
    select = ", ".join(d.ident(c) for c in columns) if columns else "*"
    sql = f"SELECT {select} FROM {d.ident(schema or '', table)}"
    if cursor_field and cursor_start is not None:
        sql += f" WHERE {d.ident(cursor_field)} >= {_sql_literal(cursor_start)}"
    elif cursor_field and lookback_days is not None:
        sql += (f" WHERE {d.ident(cursor_field)} >= "
                + d.lookback_sql.format(days=lookback_days))
    return sql


def reader_options(
    url: str,
    query: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: Any | None = None,
    upper_bound: Any | None = None,
    num_partitions: int | None = None,
    fetch_size: int = DEFAULT_FETCH_SIZE,
) -> dict[str, str]:
    """Options dict for ``spark.read.format("jdbc")``. With partition bounds
    the scan fans out to ``num_partitions`` concurrent range queries."""
    opts: dict[str, str] = {
        "url": url,
        "query" if partition_column is None else "dbtable": (
            query if partition_column is None else f"({query}) AS src"
        ),
        "fetchsize": str(fetch_size),
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if partition_column is not None:
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs column+bounds+count")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    return spark.read.format("jdbc").options(**options).load()


def blob_to_string(col: Column) -> Column:
    """MySQL BLOB handling (``mysql_extractor.py:337-347``): decode utf-8
    when clean, else base64. Expressed as try-decode + fallback."""
    utf8 = col.cast("string")
    # a lossless decode re-encodes to the original bytes; lossy decodes
    # (replacement chars) don't, and fall back to base64
    return F.when(F.encode(utf8, "UTF-8") == col, utf8).otherwise(F.base64(col))


METADATA_SQL_POSTGRES = """
SELECT a.attname AS column_name,
       pg_catalog.col_description(c.oid, a.attnum) AS comment,
       a.attnotnull AS not_null,
       pg_catalog.format_type(a.atttypid, a.atttypmod) AS data_type,
       COALESCE(i.indisprimary, false) AS is_primary_key
FROM pg_catalog.pg_attribute a
JOIN pg_catalog.pg_class c ON c.oid = a.attrelid
JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
LEFT JOIN pg_catalog.pg_index i
       ON i.indrelid = c.oid AND a.attnum = ANY(i.indkey) AND i.indisprimary
WHERE n.nspname = {schema} AND c.relname = {table}
  AND a.attnum > 0 AND NOT a.attisdropped
"""


def metadata_query(schema: str, table: str) -> str:
    """Source-tag probe (reference ``postgres_extractor.py:379-514``): one
    catalog query returning comments/PK/NOT NULL/type per column."""
    return METADATA_SQL_POSTGRES.format(
        schema=_sql_literal(schema), table=_sql_literal(table)
    )


def estimate_query(dialect: str, schema: str, table: str) -> str:
    """Row-count estimate (``postgres_extractor.py:333-377``)."""
    if dialect == "postgres":
        return (
            "SELECT reltuples::bigint FROM pg_class c "
            "JOIN pg_namespace n ON n.oid = c.relnamespace "
            f"WHERE n.nspname = {_sql_literal(schema)} "
            f"AND c.relname = {_sql_literal(table)}"
        )
    return (f"SELECT table_rows FROM information_schema.tables "
            f"WHERE table_schema = {_sql_literal(schema)} "
            f"AND table_name = {_sql_literal(table)}")
