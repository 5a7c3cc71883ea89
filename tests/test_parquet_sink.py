"""Partitioned parquet sink: hive layout, sanitize/unknown/ingest_date
derivation, size-targeted files, snappy compression."""

from __future__ import annotations

import datetime
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from dativo_ingest_spark.sinks import parquet_sink
from tests.conftest import SF_DIR


@pytest.fixture()
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # null out some sources and add a dirty value to exercise sanitize paths
    return df.withColumn(
        "source",
        F.when(F.col("doc_id") % 7 == 0, None)
        .when(F.col("doc_id") % 7 == 1, F.lit("Src One!"))
        .otherwise(F.col("source")),
    )


def test_hive_layout_and_sanitize(spark, docs, tmp_path):
    out = str(tmp_path / "t")
    pcols = parquet_sink.write_partitioned(
        docs, out, ["ingest_date", "source"],
        ingest_date=datetime.date(2026, 8, 13), mode="overwrite",
    )
    assert pcols == ["_p_ingest_date", "_p_source"]
    dirs = {p["dir"] for p in parquet_sink.list_partitions(out)}
    assert "_p_ingest_date=2026-08-13" in dirs
    vals = {p["value"] for p in parquet_sink.list_partitions(out)
            if p["column"] == "_p_source"}
    assert "unknown" in vals          # nulls
    assert "src_one_" in vals         # "Src One!" sanitized
    # roundtrip preserves row count and partition pruning works
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    pruned = back.filter(F.col("_p_source") == "unknown")
    assert pruned.count() == docs.filter(F.col("source").isNull()).count()


def test_timestamp_partition_is_iso_date(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2025, 3, 4, 15, 30))], "id bigint, ts timestamp"
    )
    out = str(tmp_path / "ts")
    parquet_sink.write_partitioned(df, out, ["ts"], mode="overwrite")
    assert {p["value"] for p in parquet_sink.list_partitions(out)} == {"2025-03-04"}


def test_size_targeted_files_and_snappy(spark, docs, tmp_path):
    out = str(tmp_path / "sized"
              )
    # ~tiny target forces multiple rolled files from a single task
    parquet_sink.write_partitioned(
        docs.coalesce(1), out, [], target_file_size_mb=0, mode="overwrite",
    )
    files = list(Path(out).rglob("*.parquet"))
    assert len(files) > 1  # maxRecordsPerFile rolled over
    meta = pq.ParquetFile(files[0]).metadata
    assert meta.row_group(0).column(0).compression.lower() == "snappy"


def test_unpartitioned_write(spark, docs, tmp_path):
    out = str(tmp_path / "flat")
    assert parquet_sink.write_partitioned(docs, out, None, mode="overwrite") == []
    assert spark.read.parquet(out).count() == docs.count()
