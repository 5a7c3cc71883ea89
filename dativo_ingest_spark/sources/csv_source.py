"""Contract-driven CSV source.

Reference semantics (``/root/reference/src/dativo_ingest/connectors/
csv_extractor.py``): read everything as string and defer typing to the
validator (``:170``); NA sentinels ``"", NULL, null, None`` → null
(``:171-173``); per-file modified-time skip against incremental state
(``:131-150``); multi-file reads are an implicit UNION ALL (``:110-194``).

Spark-first: one ``spark.read.csv`` over the *changed-file list* with an
explicit all-string schema (no inference pass over 100 TB of text), sentinel
nulling as a codegen'd expression, then the shared validation kernel for the
contract cast. Typing stays out of the scan so Catalyst can still prune
columns into the parquet-ified downstream, and the mtime skip turns
re-ingestion cost into O(changed files).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dativo_ingest_spark.config.contracts import AssetDefinition
from dativo_ingest_spark.functions.coercion import NA_SENTINELS, null_na_sentinels
from dativo_ingest_spark.operators import incremental, validation

#: reference defaults (csv_extractor.py:26-75)
DEFAULT_OPTIONS = {
    "header": "true",
    "multiLine": "false",
    "encoding": "UTF-8",
    "sep": ",",
}


def list_csv_files(pattern: str) -> list[tuple[str, float]]:
    """(path, mtime) listing for the mtime-skip diff (driver-side)."""
    return [(p, os.path.getmtime(p)) for p in sorted(_glob.glob(pattern))
            if os.path.isfile(p)]


def changed_files(
    pattern: str,
    seen: dict[str, float] | None = None,
    lookback_days: float = 0.0,
) -> list[str]:
    """Changed-file subset; ``lookback_days > 0`` disables the skip, like the
    reference (``validator.py:309-349`` skips only when lookback is 0)."""
    listing = list_csv_files(pattern)
    if lookback_days > 0 or seen is None:
        return [p for p, _ in listing]
    return incremental.file_mtime_filter(listing, seen)


def _header_columns(spark: SparkSession, path: str, options: dict) -> list[str]:
    """Column names from the first file's header line (driver reads one
    line, not the file)."""
    first = spark.read.options(**{**options, "inferSchema": "false"}).csv(path)
    return first.columns


def read_csv(
    spark: SparkSession,
    paths: list[str] | str,
    asset: AssetDefinition | None = None,
    options: dict | None = None,
    na_sentinels: tuple[str, ...] = NA_SENTINELS,
) -> DataFrame:
    """All-string CSV read with sentinel nulling and header-drift handling.

    Files are grouped by header signature (one cheap header-line probe per
    file, driver-side — the same listing pass the mtime skip already does)
    and each group reads as one ``spark.read.csv`` with an explicit
    all-string schema; groups combine with
    ``unionByName(allowMissingColumns=True)``. That reproduces the
    reference's per-file read + warn-mode column union (csv_extractor.py:
    110-194, schema_validator.py:114-123): a column absent from some files
    is null there, never positionally misparsed. With an ``asset``, the
    contract's fields are appended to every group's schema so missing
    trailing columns surface as nulls instead of load errors.
    """
    opts = {**DEFAULT_OPTIONS, **(options or {})}
    if isinstance(paths, str):
        paths = [paths]
    expanded: list[str] = []
    for p in paths:
        hits = sorted(_glob.glob(p)) if _glob.has_magic(p) else [p]
        expanded.extend(hits)
    paths = expanded
    if not paths:
        raise ValueError("read_csv: empty path list (all files skipped?)")

    groups: dict[tuple[str, ...], list[str]] = {}
    for p in paths:
        sig = tuple(_header_columns(spark, p, opts))
        groups.setdefault(sig, []).append(p)

    frames = []
    for header_cols, group_paths in groups.items():
        names = list(header_cols)
        if asset is not None:
            names += [f for f in asset.field_names() if f not in names]
        schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
        frames.append(spark.read.options(**opts).schema(schema).csv(group_paths))

    df = frames[0]
    for other in frames[1:]:
        df = df.unionByName(other, allowMissingColumns=True)
    for c in df.columns:
        df = df.withColumn(c, null_na_sentinels(df[c], na_sentinels))
    return df


def extract(
    spark: SparkSession,
    pattern: str,
    asset: AssetDefinition,
    mode: str = "strict",
    options: dict | None = None,
    seen: dict[str, float] | None = None,
    lookback_days: float = 0.0,
) -> validation.ValidationResult | None:
    """Full source pipeline: changed-file diff → all-string read → sentinel
    nulling → contract validation split. Returns None when every file was
    skipped (reference yields no batches then)."""
    files = changed_files(pattern, seen, lookback_days)
    if not files:
        return None
    df = read_csv(spark, files, asset, options)
    return validation.validate(df, asset, mode)


def extract_source_tags(
    spark: SparkSession,
    pattern_or_paths: list[str] | str,
    options: dict | None = None,
) -> dict[str, str]:
    """Naturally-available CSV metadata (reference csv_extractor.py:260-316):
    column names from each file's header row, marked ``"column"``. One
    driver-side header-line probe per file — the same probe read_csv's
    header-drift grouping performs; unreadable files are skipped like the
    reference. Feeds the catalog's source-entity metadata (structural tags,
    NOT classifications — those come from explicit contract/override/JDBC-
    comment levels only; reference tag_derivation.py:59-70 does no
    auto-detection either)."""
    opts = {**DEFAULT_OPTIONS, **(options or {})}
    if isinstance(pattern_or_paths, str):
        paths = [p for p, _ in list_csv_files(pattern_or_paths)]
    else:
        paths = list(pattern_or_paths)
    tags: dict[str, str] = {}
    for p in paths:
        try:
            for col in _header_columns(spark, p, opts):
                tags[col] = "column"
        except Exception:
            continue  # unreadable file: skip (reference :312-314)
    return tags
