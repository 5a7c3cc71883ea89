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


class TestShardExport:
    """Deterministic shard export: same input -> byte-identical shard
    assignment across runs, and the manifest audits the written files."""

    def test_rerun_produces_identical_manifest(self, spark, tmp_path):
        from dativo_ingest_spark.queries import load
        from dativo_ingest_spark.sinks.shard_export import (
            export_training_shards)
        from tests.conftest import SF_DIR

        docs = load(spark, SF_DIR, "documents")
        m1 = sorted(map(tuple, export_training_shards(
            docs, "doc_id", "n_chars", str(tmp_path / "a"),
            n_shards=4).collect()))
        m2 = sorted(map(tuple, export_training_shards(
            docs.repartition(13), "doc_id", "n_chars",
            str(tmp_path / "b"), n_shards=4).collect()))
        assert m1 == m2 and len(m1) == 4
        assert sum(r[1] for r in m1) == docs.count()

    def test_manifest_audits_written_files(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from dativo_ingest_spark.queries import load
        from dativo_ingest_spark.sinks.shard_export import (
            _shard_hash, export_training_shards)
        from tests.conftest import SF_DIR

        docs = load(spark, SF_DIR, "documents")
        out = str(tmp_path / "shards")
        manifest = {r.shard: (r.n_rows, r.hash_sum)
                    for r in export_training_shards(
                        docs, "doc_id", "n_chars", out,
                        n_shards=4).collect()}
        # independent auditor: recompute from the LOGICAL corpus
        audit = {r.shard: (r.n, r.hs) for r in docs.select(
            _shard_hash("doc_id", "epoch0").alias("h"))
            .select((F.col("h") % 4).alias("shard"), "h")
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("h").alias("hs"))
            .collect()}
        assert manifest == audit
        # deterministic intra-shard order: the written file must hold
        # the (_h, id) shuffle order, not whatever the dynamic-partition
        # writer's own sort left behind
        rows = spark.read.parquet(f"{out}/shard=0").collect()
        assert [(r["_h"], r.id) for r in rows] == \
               sorted((r["_h"], r.id) for r in rows)
        assert len(rows) > 0

    def test_mixed_format_manifest_fails_loudly(self, spark, tmp_path):
        # ADVICE r13: a manifest that ever holds mixed fmt values (e.g.
        # two exports unioned into one manifest dir) must not audit
        # every shard under the first row's format
        import pytest

        from dativo_ingest_spark.queries import load
        from dativo_ingest_spark.sinks.shard_export import (
            audit_shards, export_training_shards)
        from tests.conftest import SF_DIR

        docs = load(spark, SF_DIR, "documents")
        out = str(tmp_path / "mixed")
        m = export_training_shards(docs, "doc_id", "n_chars", out,
                                   n_shards=4)
        # corrupt the manifest: union a second export's rows recorded
        # under the other container format
        mixed = m.unionByName(
            m.limit(1).withColumn("fmt", F.lit("jsonl")))
        mixed.write.mode("overwrite").parquet(f"{out}/manifest")
        with pytest.raises(ValueError, match="mixed container"):
            audit_shards(spark, out)

    def test_jsonl_format_manifest_matches_parquet(self, spark, tmp_path):
        # r12: fmt="jsonl" — same assignment, order and manifest as the
        # parquet container; r13: the manifest RECORDS the container
        # format so the audit reads it instead of sniffing extensions
        import json
        import os

        from dativo_ingest_spark.queries import load
        from dativo_ingest_spark.sinks.shard_export import (
            audit_shards, export_training_shards)
        from tests.conftest import SF_DIR

        docs = load(spark, SF_DIR, "documents")
        mp_df = export_training_shards(
            docs, "doc_id", "n_chars", str(tmp_path / "pq"), n_shards=4)
        mp = sorted(map(tuple, mp_df.drop("fmt").collect()))
        out = str(tmp_path / "jl")
        mj_df = export_training_shards(
            docs, "doc_id", "n_chars", out, n_shards=4, fmt="jsonl")
        mj = sorted(map(tuple, mj_df.drop("fmt").collect()))
        assert mj == mp
        # the container format rides in the manifest itself (ADVICE r12)
        assert {r.fmt for r in mp_df.select("fmt").collect()} == {"parquet"}
        assert {r.fmt for r in mj_df.select("fmt").collect()} == {"jsonl"}
        # the shard files are real newline-delimited JSON in (_h, id)
        # order — a zero-dependency trainer loader can stream them
        sdir = os.path.join(out, "shard=0")
        fname = next(f for f in os.listdir(sdir) if f.endswith(".json"))
        lines = [json.loads(ln) for ln in
                 open(os.path.join(sdir, fname)) if ln.strip()]
        assert lines and all({"id", "n_tokens", "_h"} <= set(d)
                             for d in lines)
        assert [d["_h"] for d in lines] ==                sorted(d["_h"] for d in lines)
        # format-sniffing audit: publish the manifest where the auditor
        # looks, then verify the round trip over the JSON files
        mj_df.coalesce(1).write.mode("overwrite").parquet(
            f"{out}/manifest")
        rep = audit_shards(spark, out)
        assert rep["ok"] and rep["shards"] == 4
        # legacy layout (manifest without the fmt column): the audit
        # falls back to the Hadoop-FS extension sniff, URI-neutral
        mj_df.drop("fmt").coalesce(1).write.mode("overwrite").parquet(
            f"{out}/manifest")
        rep = audit_shards(spark, out)
        assert rep["ok"] and rep["shards"] == 4

        with pytest.raises(ValueError, match="fmt"):
            export_training_shards(docs, "doc_id", "n_chars",
                                   str(tmp_path / "x"), fmt="csv")

    def test_invalid_shard_count(self, spark):
        import pytest as _pytest

        from dativo_ingest_spark.sinks.shard_export import (
            export_training_shards)

        df = spark.createDataFrame([(1, 2)], "id bigint, t bigint")
        with _pytest.raises(ValueError, match="n_shards"):
            export_training_shards(df, "id", "t", "/tmp/x", n_shards=0)


class TestSortedShardExport:
    def test_global_order_and_read_back(self, spark, tmp_path):
        from dativo_ingest_spark.queries import load
        from dativo_ingest_spark.sinks.shard_export import (
            export_sorted_shards)
        from tests.conftest import SF_DIR

        docs = load(spark, SF_DIR, "documents")
        out = str(tmp_path / "sorted")
        m = {r.shard: (r.n_rows, r.min_key, r.max_key)
             for r in export_sorted_shards(
                 docs, "doc_id", "n_chars", out, n_shards=4).collect()}
        assert sum(n for n, *_ in m.values()) == docs.count()
        # reading shards in order yields a globally sorted key column
        keys = []
        for s in sorted(m):
            keys += [r.k for r in
                     spark.read.parquet(f"{out}/shard={s}").collect()]
        assert keys == sorted(keys)
        # shard ranges may touch at a boundary but never interleave
        shards = sorted(m)
        for a, b in zip(shards, shards[1:]):
            assert m[a][2] <= m[b][1]

    def test_sketch_cuts_are_the_default(self):
        # the 100 TB contract: exact percentile holds EVERY value in
        # one aggregation buffer — the mergeable sketch must be the
        # default fit; exact stays an explicit opt-in (the
        # oracle-pinned gate query passes exact_cuts=True itself)
        import inspect

        from dativo_ingest_spark.sinks.shard_export import (
            export_sorted_shards)

        sig = inspect.signature(export_sorted_shards)
        assert sig.parameters["exact_cuts"].default is False

    def test_single_shard_and_validation(self, spark, tmp_path):
        import pytest as _pytest

        from dativo_ingest_spark.sinks.shard_export import (
            export_sorted_shards)

        df = spark.createDataFrame([(i, float(i % 5)) for i in range(20)],
                                   "id bigint, v double")
        m = export_sorted_shards(df, "id", "v",
                                 str(tmp_path / "one"), n_shards=1).collect()
        assert len(m) == 1 and m[0].n_rows == 20
        with _pytest.raises(ValueError, match="n_shards"):
            export_sorted_shards(df, "id", "v", "/tmp/x", n_shards=0)


class TestPartitionAudit:
    def test_missing_and_extra_detected(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from dativo_ingest_spark.sinks.parquet_sink import partition_audit

        out = str(tmp_path / "days")
        df = spark.createDataFrame(
            [(i, f"2024-01-{d:02d}") for d in (1, 2, 4) for i in range(5)],
            "id bigint, day string")
        df.write.partitionBy("day").parquet(out)
        expected = spark.createDataFrame(
            [(f"2024-01-{d:02d}",) for d in (1, 2, 3)], "day string")
        got = {(r.partition, r.status)
               for r in partition_audit(expected, out, "day").collect()}
        assert got == {("2024-01-03", "missing"), ("2024-01-04", "extra")}

    def test_complete_output_is_empty(self, spark, tmp_path):
        from dativo_ingest_spark.sinks.parquet_sink import partition_audit

        out = str(tmp_path / "ok")
        df = spark.createDataFrame([(1, "a"), (2, "b")],
                                   "id bigint, k string")
        df.write.partitionBy("k").parquet(out)
        audit = partition_audit(
            spark.createDataFrame([("a",), ("b",)], "k string"), out, "k")
        assert audit.count() == 0
        # nonexistent output: everything expected is missing
        gone = partition_audit(
            spark.createDataFrame([("a",)], "k string"),
            str(tmp_path / "nope"), "k").collect()
        assert [(r.partition, r.status) for r in gone] == [("a", "missing")]


class TestReadSortedRange:
    def test_pruned_range_read(self, spark, tmp_path):
        from dativo_ingest_spark.sinks.shard_export import (
            export_sorted_shards, read_sorted_range)

        df = spark.createDataFrame([(i, float(i)) for i in range(400)],
                                   "id bigint, v double")
        out = str(tmp_path / "sorted")
        m = {r.shard: (r.min_key, r.max_key) for r in
             export_sorted_shards(df, "id", "v", out,
                                  n_shards=8).collect()}
        got = read_sorted_range(spark, out, 120.0, 140.0)
        rows = sorted((r.id, r.k) for r in got.collect())
        assert rows == [(i, float(i)) for i in range(120, 141)]
        # pruning really happened: the touched shards are only those
        # whose manifest range overlaps the query range
        touched = {r.shard for r in got.collect()}
        overlapping = {s for s, (lo, hi) in m.items()
                       if not (hi < 120.0 or lo > 140.0)}
        assert touched <= overlapping
        assert len(overlapping) < 8   # narrow range != full scan
        # empty range outside the domain
        assert read_sorted_range(spark, out, 10000.0,
                                 20000.0).count() == 0
        import pytest as _pytest
        with _pytest.raises(ValueError, match="lo"):
            read_sorted_range(spark, out, 5.0, 1.0)
