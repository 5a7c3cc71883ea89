"""Retry policy classification/backoff + check/discover probes."""

from __future__ import annotations

import pytest

from dativo_ingest_spark import inspect_cmd
from dativo_ingest_spark.config.contracts import SourceConfig
from dativo_ingest_spark.retry import RetryConfig, RetryPolicy
from dativo_ingest_spark.runner import JobResult


def test_retry_classification():
    p = RetryPolicy(RetryConfig(max_retries=2))
    assert p.should_retry(1, attempt=0)
    assert p.should_retry(2, attempt=1)
    assert not p.should_retry(2, attempt=2)       # retries exhausted
    assert not p.should_retry(0, attempt=0)       # success not retryable
    assert not p.should_retry(3, attempt=0)       # unknown exit code


def test_retry_error_patterns():
    p = RetryPolicy(RetryConfig(
        retryable_error_patterns=("timeout", "connection re(fused|set)",
                                  "[invalid")))
    assert p.should_retry(2, "Read TIMEOUT after 30s", 0)   # case-insensitive
    assert p.should_retry(2, "connection refused", 0)
    assert not p.should_retry(2, "schema mismatch", 0)
    # invalid regex skipped, not fatal
    assert p.should_retry(2, "timeout", 0)
    # no message with patterns configured → retryable (pattern gate only
    # applies when a message is present, like the reference)
    assert p.should_retry(2, None, 0)


def test_backoff_curve():
    p = RetryPolicy(RetryConfig(initial_delay_seconds=2,
                                backoff_multiplier=3, max_delay_seconds=25))
    assert [p.calculate_delay(a) for a in range(4)] == [2, 6, 18, 25]


def test_run_with_retries():
    calls = []
    outcomes = [JobResult(exit_code=2), JobResult(exit_code=2),
                JobResult(exit_code=0)]

    def fn():
        calls.append(1)
        return outcomes[len(calls) - 1]

    slept = []
    result, attempts = RetryPolicy(RetryConfig(initial_delay_seconds=0.01))\
        .run_with_retries(fn, sleep=slept.append)
    assert result.exit_code == 0 and attempts == 3
    assert len(slept) == 2

    # non-retryable path: strict failure with patterns that don't match
    policy = RetryPolicy(RetryConfig(retryable_error_patterns=("timeout",)))
    bad = JobResult(exit_code=2, error_sample=[{"error": "type_mismatch"}])
    result, attempts = policy.run_with_retries(lambda: bad, sleep=slept.append)
    assert result.exit_code == 2 and attempts == 1


def test_check_and_discover(spark, tmp_path):
    (tmp_path / "a.csv").write_text("id,name\n1,x\n")
    (tmp_path / "b.csv").write_text("id,name\n2,y\n")
    src = SourceConfig.from_dict({"type": "csv",
                                  "path": str(tmp_path / "*.csv")})
    chk = inspect_cmd.check_source(spark, src)
    assert chk["ok"] and chk["details"] == {"files": 2,
                                            "columns": ["id", "name"]}
    streams = inspect_cmd.discover(spark, src)
    assert [s["stream"] for s in streams] == ["a", "b"]

    missing = SourceConfig.from_dict({"type": "csv",
                                      "path": str(tmp_path / "*.tsv")})
    assert not inspect_cmd.check_source(spark, missing)["ok"]

    pg = SourceConfig.from_dict({"type": "postgres",
                                 "options": {"table": "users",
                                             "schema": "app"}})
    chk = inspect_cmd.check_source(spark, pg)
    assert not chk["ok"] and 'FROM "app"."users"' in chk["details"]["would_run"]

    (tmp_path / "d.md").write_text("k:: v\n")
    md = SourceConfig.from_dict({"type": "markdown_kv",
                                 "path": str(tmp_path / "*")})
    assert inspect_cmd.check_source(spark, md)["ok"]
    assert inspect_cmd.discover(spark, md)[0]["stream"] == "d"


def test_catalog_push_after_commit(spark, tmp_path):
    from dativo_ingest_spark import catalog, runner
    from dativo_ingest_spark.config.contracts import JobConfig
    from tests.test_runner import job_dict

    p = tmp_path / "c.csv"
    p.write_text("id,name\n1,x\n")
    out = str(tmp_path / "out")
    job = JobConfig.from_dict(job_dict(str(p), out))
    rec = catalog.RecordingCatalog()
    res = runner.run_job(spark, job, catalog=rec)
    assert res.exit_code == 0
    assert res.catalog_status == {"ensure_source": "ok", "ensure_target": "ok",
                                  "source_metadata": "ok",
                                  "metadata": "ok", "lineage": "ok"}
    assert rec.lineage == [("acme.csv.people", "acme.parquet.people")]
    meta = rec.metadata["acme.parquet.people"]
    assert meta["properties"]["classification.fields.name"] == "pii"
    assert {f["name"] for f in meta["schema"]} == {"id", "name", "active"}

    # backend outage: job still succeeds, status records errors
    res = runner.run_job(spark, job, catalog=catalog.RecordingCatalog(fail=True))
    assert res.exit_code == 0
    assert all(v.startswith("error") for v in res.catalog_status.values())


def test_catalog_source_tags_pushed(spark, tmp_path):
    """File-source column names ride to the catalog as source-entity
    structural metadata (never classifications)."""
    from dativo_ingest_spark import catalog, runner
    from dativo_ingest_spark.config.contracts import JobConfig

    p = tmp_path / "in.csv"
    p.write_text("id,name,surprise_col\n1,alice,x\n")
    rec = catalog.RecordingCatalog()
    job = JobConfig.from_dict({
        "tenant_id": "acme", "schema_validation_mode": "warn",
        "source": {"type": "csv", "path": str(p)},
        "target": {"type": "parquet", "path": str(tmp_path / "out"),
                   "options": {"mode": "overwrite"}},
        "asset": {"name": "people",
                  "schema": [{"name": "id", "type": "integer"},
                             {"name": "name", "type": "string"}]},
    })
    res = runner.run_job(spark, job, catalog=rec)
    assert res.catalog_status.get("source_metadata") == "ok"
    src_fqn = "acme.csv.people"
    assert rec.metadata[src_fqn]["properties"]["surprise_col"] == "column"
    # target properties untouched by structural tags
    tgt_fqn = [k for k in rec.metadata if k != src_fqn][0]
    assert "surprise_col" not in rec.metadata[tgt_fqn]["properties"]


def test_cli_main_run_check_discover(spark, tmp_path, capsys):
    """CLI routing: run --config (exit codes + JSON doc), run --job-dir
    (worst-exit combination), check/discover probes, config error → 2."""
    import json as _json

    import yaml

    from dativo_ingest_spark import __main__ as cli
    from tests.test_runner import job_dict

    good = tmp_path / "good.csv"
    good.write_text("id,name\n1,x\n")
    bad = tmp_path / "bad.csv"
    bad.write_text("id,name\n,missing\n")

    j1 = tmp_path / "j1.yaml"
    j1.write_text(yaml.dump(job_dict(str(good), str(tmp_path / "o1"))))
    rc = cli.main(["--master", "local[2]", "run", "--config", str(j1)])
    assert rc == 0
    doc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc["records_valid"] == 1 and doc["exit_code"] == 0

    jobs = tmp_path / "jobs"
    jobs.mkdir()
    (jobs / "a.yaml").write_text(yaml.dump(
        job_dict(str(good), str(tmp_path / "o2"))))
    (jobs / "b.yaml").write_text(yaml.dump(
        job_dict(str(bad), str(tmp_path / "o3"))))
    rc = cli.main(["run", "--job-dir", str(jobs)])
    assert rc == 2  # worst job wins (strict failure)
    capsys.readouterr()

    rc = cli.main(["check", "--type", "csv", "--path", str(good)])
    assert rc == 0
    assert _json.loads(capsys.readouterr().out.strip())["ok"]
    rc = cli.main(["check", "--type", "csv",
                   "--path", str(tmp_path / "none*.csv")])
    assert rc == 2
    capsys.readouterr()

    rc = cli.main(["discover", "--type", "csv",
                   "--path", str(tmp_path / "*.csv")])
    assert rc == 0
    streams = _json.loads(capsys.readouterr().out.strip())
    assert {s["stream"] for s in streams} == {"good", "bad"}


def test_plan_summary_reads_signals(spark):
    from dativo_ingest_spark import inspect_cmd
    from dativo_ingest_spark.queries import QUERIES

    doc = inspect_cmd.plan_query(spark, "q5_region_revenue",
                                 "/root/testdata/sf0.001", execute=True)
    assert doc["query"] == "q5_region_revenue"
    assert doc["broadcast_hash_joins"] >= 4
    assert doc["sort_merge_joins"] == 0
    assert doc["cartesian_products"] == 0
    assert doc["python_evals"] == 0
    assert doc["codegen_spans"] > 0
    scans = {tuple(s["columns"]) for s in doc["scans"]}
    assert ("r_regionkey", "r_name") in scans  # pruned dim scan
    region = next(s for s in doc["scans"]
                  if s["columns"] == ["r_regionkey", "r_name"])
    assert any(f.startswith("EqualTo(r_name") for f
               in region.get("pushed_filters", []))  # filter reached scan


def test_plan_query_unknown_name(spark):
    from dativo_ingest_spark import inspect_cmd

    with pytest.raises(ValueError, match="unknown query"):
        inspect_cmd.plan_query(spark, "nope", "/root/testdata/sf0.001")


def test_plan_cli_full_includes_formatted(spark):
    from dativo_ingest_spark import inspect_cmd

    doc = inspect_cmd.plan_query(spark, "q1_pricing_summary",
                                 "/root/testdata/sf0.001", full=True,
                                 execute=True)
    assert "formatted" in doc and "Physical Plan" in doc["formatted"]
    assert doc["final"] and doc["codegen_spans"] > 0
    assert "isFinalPlan=true" in doc["final_plan"]


def test_metadata_tables_and_maintain_cli(spark, tmp_path, capsys):
    import json as _json

    from dativo_ingest_spark import __main__ as cli
    from dativo_ingest_spark.sinks.table_commit import FsTable

    root = str(tmp_path / "tbl")
    table = FsTable.create(root)
    df = spark.range(100).withColumnRenamed("id", "k")
    # two tiny appends -> a small-file tail worth compacting
    table.write_append(df.repartition(4))
    table.write_append(df.repartition(4))

    snaps = table.snapshots_df(spark).collect()
    assert [r["operation"] for r in snaps][:2] == ["append", "append"]
    # appends accumulate: head holds both batches' files, its parent one
    # batch, the create() bootstrap none
    assert [r["n_files"] for r in snaps[:2]] == [8, 4]
    files = table.files_df(spark).collect()
    assert len(files) == 8 and all(r["size_bytes"] > 0 for r in files)

    rc = cli.main(["--master", "local[2]", "maintain", "--table-root", root,
                   "--compact", "--snapshots", "--files"])
    assert rc == 0
    out = capsys.readouterr().out
    doc = _json.loads(out[out.index("{"):])
    assert doc["compacted_to_version"] is not None
    # post-compaction head: bin-packed to fewer files, content unchanged
    head = table.files_df(spark).collect()
    assert len(head) < 8
    assert table.read(spark).count() == 200
    assert doc["snapshots"][0]["operation"] in ("append", "replace")
    # the CLI lists the head AFTER its compaction step: bin-packed
    assert len(doc["files"]) == len(head) < 8

    rc = cli.main(["maintain", "--table-root", root,
                   "--vacuum-keep", "1", "--vacuum-min-age-s", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    vac = _json.loads(out[out.index("{"):])["vacuum"]
    assert vac["manifests"] >= 1 and vac["data_files"] >= 1
    assert table.read(spark).count() == 200  # live head untouched


def test_contract_diff_probe(spark, tmp_path, capsys):
    import json as _json

    from dativo_ingest_spark import __main__ as cli
    from dativo_ingest_spark import inspect_cmd
    from dativo_ingest_spark.config.contracts import JobConfig
    from tests.test_runner import job_dict

    # source carries an extra column and misses the optional 'active'
    src = tmp_path / "drift.csv"
    src.write_text("id,name,surprise\n1,alice,x\n")
    job = JobConfig.from_dict(job_dict(str(src), str(tmp_path / "out")))
    doc = inspect_cmd.contract_diff(spark, job)
    assert doc["ok"] and doc["drift"]
    assert doc["extra_in_source"] == ["surprise"]
    assert doc["missing_in_source"] == ["active"]
    assert doc["required_missing"] == []

    # a REQUIRED contract column absent -> not ok (strict would exit 2)
    bad = tmp_path / "bad.csv"
    bad.write_text("name\nalice\n")
    job2 = JobConfig.from_dict(job_dict(str(bad), str(tmp_path / "out")))
    doc2 = inspect_cmd.contract_diff(spark, job2)
    assert not doc2["ok"] and doc2["required_missing"] == ["id"]

    # CLI wiring: exit code mirrors ok
    import yaml

    cfg_path = tmp_path / "job.yaml"
    cfg_path.write_text(yaml.safe_dump(job_dict(str(src),
                                                str(tmp_path / "out"))))
    rc = cli.main(["--master", "local[2]", "contract-diff",
                   "--config", str(cfg_path)])
    out = capsys.readouterr().out
    assert rc == 0 and _json.loads(out[out.index("{"):])["drift"]


def test_maintain_cli_ivfpq_compact(spark, tmp_path, capsys):
    # r14: index-table maintenance wired into maintain mode (r13
    # verdict Next #3) — compact + vacuum in one invocation, serving
    # bit-identical across it
    import json as _json

    from pyspark.sql import functions as F

    from dativo_ingest_spark import __main__ as cli
    from dativo_ingest_spark.operators import quantization as Q
    from dativo_ingest_spark.sinks.table_commit import FsTable

    rows = [(i, [float(((i * 7 + d * 3) % 23) - 11) / 3.0
                 for d in range(16)]) for i in range(48)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")
    art = Q.ivfpq_train_artifact(emb, "vec_id", "embedding",
                                 m=2, k_codes=4, n_cells=4, n_iter=1)
    root = str(tmp_path / "ix")
    t = FsTable.create(root)
    Q.ivfpq_index_build(emb.filter(F.col("vec_id") < 16),
                        "vec_id", "embedding", t, artifact=art)
    for lo in (16, 32):
        Q.ivfpq_index_append(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 16)),
            "vec_id", "embedding", t, art)
    queries = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
               for r in emb.filter(F.col("vec_id").isin(0, 1)).collect()}
    before = sorted(map(tuple, Q.ivfpq_index_topk(
        spark, t, art, queries, n_probe=2, k=10).collect()))
    n_files_before = len([f for f in t.snapshot(t.current_version()).files
                          if f.get("num_rows")])

    rc = cli.main(["--master", "local[2]", "maintain",
                   "--table-root", root, "--ivfpq-compact",
                   "--vacuum-keep", "1", "--vacuum-min-age-s", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    doc = _json.loads(out[out.index("{"):])
    assert doc["ivfpq_compact"]["files_after"] < n_files_before
    assert doc["vacuum"]["data_files"] >= 1  # old layout reclaimed
    after = sorted(map(tuple, Q.ivfpq_index_topk(
        spark, t, art, queries, n_probe=2, k=10).collect()))
    assert after == before

    # range-scoped flag plumbs through (fresh fragmentation first)
    Q.ivfpq_index_append(
        emb.filter(F.col("vec_id") < 4).withColumn(
            "vec_id", F.col("vec_id") + 100),
        "vec_id", "embedding", t, art)
    rc = cli.main(["maintain", "--table-root", root, "--ivfpq-compact",
                   "--max-files-per-cell", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    doc = _json.loads(out[out.index("{"):])
    assert "ivfpq_compact" in doc


def test_maintain_cli_rollback(spark, tmp_path, capsys):
    import json as _json

    from dativo_ingest_spark import __main__ as cli
    from dativo_ingest_spark.sinks.table_commit import FsTable

    root = str(tmp_path / "rbtbl")
    table = FsTable.create(root)
    table.write_append(spark.range(10).withColumnRenamed("id", "k"))
    good = table.current_version()
    table.write_append(spark.range(10, 40).withColumnRenamed("id", "k"))

    rc = cli.main(["--master", "local[2]", "maintain",
                   "--table-root", root, "--rollback-to", str(good)])
    assert rc == 0
    out = capsys.readouterr().out
    doc = _json.loads(out[out.index("{"):])
    assert doc["rolled_back_to"] == good
    assert doc["rollback_version"] > good      # forward commit
    assert table.read(spark).count() == 10

    # unreachable version -> config error exit, nothing committed
    head = table.current_version()
    rc = cli.main(["maintain", "--table-root", root,
                   "--rollback-to", "9999"])
    assert rc == 2
    capsys.readouterr()
    assert table.current_version() == head


def test_maintain_cli_manifest_aggregate(spark, tmp_path, capsys):
    import json as _json

    from dativo_ingest_spark import __main__ as cli
    from dativo_ingest_spark.sinks.table_commit import FsTable

    root = str(tmp_path / "aggtbl")
    t = FsTable.create(root)
    t.write_append(spark.range(7).withColumnRenamed("id", "k"),
                   stats_columns=["k"])
    rc = cli.main(["--master", "local[2]", "maintain",
                   "--table-root", root, "--aggregate", "k"])
    assert rc == 0
    out = capsys.readouterr().out
    doc = _json.loads(out[out.index("{"):])
    assert doc["aggregate"]["num_rows"] == 7
    assert doc["aggregate"]["columns"]["k"] == {"min": 0, "max": 6}


def test_cli_audit_shards(spark, tmp_path, capsys):
    import json as _json

    from dativo_ingest_spark import __main__ as cli
    from dativo_ingest_spark.sinks.shard_export import (
        export_training_shards)

    df = spark.createDataFrame([(i, i * 3) for i in range(1, 31)],
                               "id bigint, toks bigint")
    out = str(tmp_path / "shards")
    manifest = export_training_shards(df, "id", "toks", out, n_shards=3)
    manifest.coalesce(1).write.mode("overwrite").parquet(out + "/manifest")

    rc = cli.main(["audit-shards", "--shards-dir", out])
    doc = _json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and doc["ok"] and doc["shards"] == 3

    # corrupt one shard (drop a file) -> audit must fail with the diff
    import glob
    import os

    victim = glob.glob(out + "/shard=*/part-*.parquet")[0]
    os.remove(victim)
    rc = cli.main(["audit-shards", "--shards-dir", out])
    doc = _json.loads(capsys.readouterr().out.strip())
    assert rc == 2 and not doc["ok"] and doc["mismatches"]


def test_cli_audit_shards_streaming_layout(spark, tmp_path, capsys):
    """The CLI auto-detects a streaming layout (manifest.json +
    epoch=K dirs) and audits committed epochs only."""
    import glob
    import json as _json
    import os

    from dativo_ingest_spark import __main__ as cli
    from dativo_ingest_spark.streaming import pipeline

    out = str(tmp_path / "stream_shards")
    writer = pipeline.shard_epoch_writer(out, "id", "toks", n_shards=3,
                                         query_id="q1")
    df = spark.createDataFrame([(i, i * 3) for i in range(1, 31)],
                               "id bigint, toks bigint")
    writer(df, 0)
    writer(spark.createDataFrame([(i, i) for i in range(31, 41)],
                                 "id bigint, toks bigint"), 1)

    rc = cli.main(["audit-shards", "--shards-dir", out])
    doc = _json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and doc["ok"] and doc["epochs"] == 2

    victim = glob.glob(out + "/epoch=*/shard=*/part-*.parquet")[0]
    os.remove(victim)
    rc = cli.main(["audit-shards", "--shards-dir", out])
    doc = _json.loads(capsys.readouterr().out.strip())
    assert rc == 2 and not doc["ok"] and doc["mismatches"]
