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


def resolve_storage(options: dict) -> tuple[str, str]:
    """Map source options to (storage, file_extension), accepting both the
    engine's flat ``storage: row_per_kv`` shorthand and the reference's
    nested ``markdown_kv_storage: {mode, structured_pattern,
    file_extension}`` config (config.py:419-443): mode ``string``/
    ``raw_file`` map directly; mode ``structured`` selects its
    ``structured_pattern`` (row_per_kv / document_level / hybrid)."""
    block = options.get("markdown_kv_storage")
    if isinstance(block, dict):
        mode = str(block.get("mode", "structured"))
        ext = str(block.get("file_extension", ".mdkv"))
        if mode == "structured":
            return str(block.get("structured_pattern", "row_per_kv")), ext
        return mode, ext
    return (str(options.get("storage", "row_per_kv")),
            str(options.get("file_extension", ".mdkv")))


def extract(
    spark: SparkSession,
    pattern: str,
    storage: str = "row_per_kv",
    extracted_at: str = "1970-01-01T00:00:00",
    seen: dict[str, float] | None = None,
    file_extension: str = ".mdkv",
) -> DataFrame | None:
    """Source pipeline for every storage shape the reference validates
    (``config.py:419-443``): ``string`` (raw content rows), ``raw_file``
    (one row per file of the configured extension, raw text + path),
    ``row_per_kv`` explode, ``document_level`` nesting, or ``hybrid``
    (row_per_kv ∪ document_level context).

    ``file_extension`` applies to ``raw_file`` only and mirrors the
    reference's ``markdown_kv_storage.file_extension`` validation
    (``.md``/``.mdkv``)."""
    if storage == "raw_file" and file_extension not in EXTENSIONS:
        raise ValueError(
            f"markdown_kv file_extension must be '.md' or '.mdkv', "
            f"got: {file_extension}")
    docs = read_markdown_files(spark, pattern, seen)
    if docs is None:
        return None
    if storage == "string":
        return docs
    if storage == "raw_file":
        # one row per kept file, raw bytes untouched — the "store the
        # document as-is" shape (reference cli.py:856-931 defers raw_file
        # to the writer; here the frame IS the writer input)
        return docs.filter(F.col("path").endswith(file_extension))
    if storage == "row_per_kv":
        return mdkv.rows_from_markdown(docs, "doc_id", "content", extracted_at)
    if storage == "document_level":
        return mdkv.documents_from_markdown(docs, "doc_id", "content",
                                            extracted_at)
    if storage == "hybrid":
        return mdkv.hybrid_from_markdown(docs, "doc_id", "content",
                                         extracted_at)
    raise ValueError(f"unknown markdown_kv storage shape: {storage}")
