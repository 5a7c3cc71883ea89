"""Markdown-KV file source.

The reference registers ``markdown_kv`` as a bidirectional connector
(``registry/connectors.yaml:49-57``) but its CLI has no routing branch for it
(``cli.py:606-614`` falls through to "Unsupported source type") — this module
closes that gap on Spark: whole-file text reads → doc_id from filename →
either storage shape from ``operators/mdkv``.

``spark.read.text(wholetext=True)`` gives one row per file and distributes
the file set across executors, so a 100 TB corpus of .md/.mdkv documents
parses with per-file parallelism and zero driver involvement; the mtime skip
reuses the shared listing diff.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dativo_ingest_spark.operators import incremental, mdkv

EXTENSIONS = (".md", ".mdkv")  # reference markdown_kv recipe file formats


def list_markdown_files(pattern: str) -> list[tuple[str, float]]:
    return [(p, os.path.getmtime(p)) for p in sorted(_glob.glob(pattern))
            if os.path.isfile(p) and p.endswith(EXTENSIONS)]


def read_markdown_files(
    spark: SparkSession,
    pattern: str,
    seen: dict[str, float] | None = None,
) -> DataFrame | None:
    """(doc_id, path, content) — one row per changed file; doc_id is the
    filename without extension. None when everything was mtime-skipped."""
    listing = list_markdown_files(pattern)
    files = (incremental.file_mtime_filter(listing, seen) if seen is not None
             else [p for p, _ in listing])
    if not files:
        return None
    df = spark.read.text(files, wholetext=True)
    path = F.input_file_name()
    doc_id = F.regexp_extract(path, r"([^/]+?)(?:\.mdkv|\.md)?$", 1)
    return df.select(
        doc_id.alias("doc_id"), path.alias("path"),
        F.col("value").alias("content"),
    )


def extract(
    spark: SparkSession,
    pattern: str,
    storage: str = "row_per_kv",
    extracted_at: str = "1970-01-01T00:00:00",
    seen: dict[str, float] | None = None,
) -> DataFrame | None:
    """Source pipeline for the three storage shapes (``config.py:419-443``):
    ``string`` (raw content rows), ``row_per_kv`` explode, or
    ``document_level`` nesting."""
    docs = read_markdown_files(spark, pattern, seen)
    if docs is None:
        return None
    if storage == "string":
        return docs
    if storage == "row_per_kv":
        return mdkv.rows_from_markdown(docs, "doc_id", "content", extracted_at)
    if storage == "document_level":
        return mdkv.documents_from_markdown(docs, "doc_id", "content",
                                            extracted_at)
    raise ValueError(f"unknown markdown_kv storage shape: {storage}")
