"""JSONL contract source: all-string read, nested-value degradation,
key-union across files, contract-column fill, and the full runner
lifecycle (strict/warn exit codes + mtime skip) — the CSV semantics on a
second file format, unchanged."""

from __future__ import annotations

import json
import os

import pytest

from dativo_ingest_spark import runner
from dativo_ingest_spark.config.contracts import JobConfig
from dativo_ingest_spark.sources import jsonl_source
from tests.test_runner import job_dict


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "people.jsonl"
    rows = [
        {"id": 1, "name": "alice", "active": True},
        {"id": 2, "name": "bob", "active": "no"},
        {"id": 3, "name": "carol", "active": 1},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return str(p)


def test_all_string_read_defers_typing(spark, jsonl_file):
    df = jsonl_source.read_jsonl(spark, jsonl_file)
    assert all(t == "string" for _, t in df.dtypes)
    got = {r["id"]: r["active"] for r in df.collect()}
    assert got == {"1": "true", "2": "no", "3": "1"}


def test_nested_values_degrade_to_json_text(spark, tmp_path):
    p = tmp_path / "nested.jsonl"
    p.write_text(json.dumps(
        {"id": 1, "meta": {"a": 1, "b": [2, 3]}, "tags": ["x", "y"]}) + "\n")
    df = jsonl_source.read_jsonl(spark, str(p))
    row = df.collect()[0]
    # primitivesAsString applies inside nested values too: leaves arrive
    # as strings, structure is preserved
    assert json.loads(row["meta"]) == {"a": "1", "b": ["2", "3"]}
    assert json.loads(row["tags"]) == ["x", "y"]
    assert dict(df.dtypes) == {"id": "string", "meta": "string",
                               "tags": "string"}


def test_key_union_across_files_and_na_sentinels(spark, tmp_path):
    (tmp_path / "a.jsonl").write_text(
        json.dumps({"id": 1, "name": "alice"}) + "\n")
    (tmp_path / "b.jsonl").write_text(
        json.dumps({"id": 2, "city": "NULL"}) + "\n")
    df = jsonl_source.read_jsonl(spark, str(tmp_path / "*.jsonl"))
    rows = {r["id"]: r for r in df.collect()}
    assert rows["1"]["city"] is None      # key absent in file a
    assert rows["2"]["name"] is None
    assert rows["2"]["city"] is None      # NA sentinel nulled


def test_contract_columns_appended_when_absent(spark, tmp_path):
    p = tmp_path / "d.jsonl"
    p.write_text(json.dumps({"id": 1, "name": "alice"}) + "\n")
    job = JobConfig.from_dict(job_dict(str(p), str(tmp_path / "out")))
    df = jsonl_source.read_jsonl(spark, str(p), job.asset)
    assert "active" in df.columns
    assert df.collect()[0]["active"] is None


def test_runner_strict_job_end_to_end(spark, jsonl_file, tmp_path):
    out = str(tmp_path / "out")
    cfg = job_dict(jsonl_file, out)
    cfg["source"]["type"] = "jsonl"
    res = runner.run_job(spark, JobConfig.from_dict(cfg))
    assert res.exit_code == runner.EXIT_SUCCESS
    back = spark.read.parquet(out)
    assert dict(back.dtypes) == {"id": "bigint", "name": "string",
                                 "active": "boolean"}
    assert {r["id"] for r in back.collect()} == {1, 2, 3}


def test_runner_strict_failure_exit_2(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(json.dumps({"id": None, "name": "x"}) + "\n")
    cfg = job_dict(str(p), str(tmp_path / "out"))
    cfg["source"]["type"] = "jsonl"
    res = runner.run_job(spark, JobConfig.from_dict(cfg))
    assert res.exit_code == runner.EXIT_FAILURE


def test_runner_mtime_skip_second_run(spark, jsonl_file, tmp_path):
    out = str(tmp_path / "out")
    cfg = job_dict(jsonl_file, out,
                   incremental={"enabled": True,
                                "strategy": "file_modified_time"})
    cfg["source"]["type"] = "jsonl"
    state = str(tmp_path / "state")
    r1 = runner.run_job(spark, JobConfig.from_dict(cfg), state_root=state)
    assert r1.exit_code == runner.EXIT_SUCCESS
    assert r1.records_in == 3 and not r1.skipped
    r2 = runner.run_job(spark, JobConfig.from_dict(cfg), state_root=state)
    assert r2.skipped and r2.exit_code == runner.EXIT_SUCCESS
    os.utime(jsonl_file)               # touch -> re-ingested
    r3 = runner.run_job(spark, JobConfig.from_dict(cfg), state_root=state)
    assert not r3.skipped and r3.records_in == 3


def test_check_and_discover_jsonl(spark, jsonl_file):
    from dativo_ingest_spark import inspect_cmd
    from dativo_ingest_spark.config.contracts import SourceConfig

    src = SourceConfig.from_dict({"type": "jsonl", "path": jsonl_file})
    doc = inspect_cmd.check_source(spark, src)
    assert doc["ok"] and doc["details"]["files"] == 1
    assert set(doc["details"]["columns"]) == {"id", "name", "active"}
    streams = inspect_cmd.discover(spark, src)
    assert len(streams) == 1 and streams[0]["stream"] == "people"

    missing = SourceConfig.from_dict(
        {"type": "jsonl", "path": "/nope/*.jsonl"})
    assert not inspect_cmd.check_source(spark, missing)["ok"]


def test_malformed_line_never_leaks_corrupt_column(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"id": 1, "name": "ok"}\n{"id": 2, "name":\n')
    df = jsonl_source.read_jsonl(spark, str(p))
    assert "_corrupt_record" not in df.columns
    rows = sorted(df.collect(), key=lambda r: (r["id"] is None, r["id"]))
    # the malformed line survives as an all-null row (strict mode's
    # required-field check rejects it; warn mode flags it) — the CSV
    # failure shape, not a schema mutation
    assert rows[0].asDict() == {"id": "1", "name": "ok"}
    assert all(v is None for v in rows[1].asDict().values())

    cfg = job_dict(str(p), str(tmp_path / "out"))
    cfg["source"]["type"] = "jsonl"
    res = runner.run_job(spark, JobConfig.from_dict(cfg))
    assert res.exit_code == runner.EXIT_FAILURE  # strict: exit 2


def test_check_source_probes_all_files_not_first(spark, tmp_path):
    """A contract column present only in LATER files must show up in the
    probe (the actual read unions keys across the whole glob), and so must
    later-file-only extras — first-file-only probing falsely reported both
    missing."""
    from dativo_ingest_spark import inspect_cmd
    from dativo_ingest_spark.config.contracts import SourceConfig

    (tmp_path / "a.jsonl").write_text('{"id": 1, "name": "x"}\n')
    (tmp_path / "b.jsonl").write_text(
        '{"id": 2, "name": "y", "active": true, "extra": "z"}\n')
    src = SourceConfig.from_dict(
        {"type": "jsonl", "path": str(tmp_path / "*.jsonl")})
    doc = inspect_cmd.check_source(spark, src)
    assert doc["ok"] and doc["details"]["files"] == 2
    assert {"id", "name", "active", "extra"} <= \
        set(doc["details"]["columns"])


def test_check_source_gz_falls_back_to_spark_probe(spark, tmp_path):
    """Compressed jsonl: the raw local-text probe would read gzip bytes
    and find no keys while still reporting ok:true — the r7 regression.
    The probe must route through the Spark reader (which decompresses
    transparently) and report the real columns."""
    import gzip

    from dativo_ingest_spark import inspect_cmd
    from dativo_ingest_spark.config.contracts import SourceConfig

    p = tmp_path / "people.jsonl.gz"
    with gzip.open(p, "wt", encoding="utf-8") as fh:
        fh.write('{"id": 1, "name": "alice"}\n{"id": 2, "city": "x"}\n')
    src = SourceConfig.from_dict({"type": "jsonl", "path": str(p)})
    doc = inspect_cmd.check_source(spark, src)
    assert doc["ok"]
    assert set(doc["details"]["columns"]) == {"id", "name", "city"}


def test_check_source_linesep_falls_back_to_spark_probe(spark, tmp_path):
    """Custom record separator: one physical line holds many records; the
    per-line json.loads probe sees malformed text and yields an empty
    column list. With lineSep set, the probe must use the Spark reader
    and honor it."""
    from dativo_ingest_spark import inspect_cmd
    from dativo_ingest_spark.config.contracts import SourceConfig

    p = tmp_path / "recs.jsonl"
    p.write_text('{"id": 1, "name": "a"};{"id": 2, "active": true}')
    src = SourceConfig.from_dict({
        "type": "jsonl", "path": str(p), "options": {"lineSep": ";"}})
    doc = inspect_cmd.check_source(spark, src)
    assert doc["ok"]
    assert set(doc["details"]["columns"]) == {"id", "name", "active"}
