"""Z-order layout: key correctness (hand-computed + DuckDB bit-math
replica) and the property the operator exists for — a Z-ordered file
layout lets manifest min/max stats prune range predicates on EVERY curve
column, where a linear sort prunes only its own column."""

from __future__ import annotations

import glob

import duckdb
import pytest

from pyspark.sql import functions as F

from dativo_ingest_spark.operators import layout
from dativo_ingest_spark.queries import load
from dativo_ingest_spark.sinks import table_commit

SF = "/root/testdata/sf0.001"


def test_zorder_key_hand_computed(spark):
    # 2 cols, 2 bits, ranges [0, 3]: quantized value == raw value.
    # x=1 (01), y=2 (10) -> interleaved (y1 x1 y0 x0) = 1 0 0 1 = 9
    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    key = df.select(
        layout.zorder_key({"x": (0, 3), "y": (0, 3)}, bits=2).alias("k")
    ).collect()[0]["k"]
    assert key == 0b1001


def test_zorder_key_matches_duckdb_bit_math(spark):
    bits, lo, hi = 8, 0.0, 1000.0
    ev = load(spark, SF, "events").select("event_id", "user_id", "value")
    got = {
        r["event_id"]: r["k"]
        for r in ev.select(
            "event_id",
            layout.zorder_key({"user_id": (lo, hi), "value": (lo, hi)},
                              bits=bits).alias("k"),
        ).collect()
    }
    levels = (1 << bits) - 1
    q = f"""
    WITH q AS (
      SELECT event_id,
             greatest(0, least({levels},
               CAST(floor((user_id::DOUBLE - {lo}) / {hi - lo} * {levels})
                    AS BIGINT))) AS qa,
             greatest(0, least({levels},
               CAST(floor((value::DOUBLE - {lo}) / {hi - lo} * {levels})
                    AS BIGINT))) AS qb
      FROM '{SF}/events.parquet')
    SELECT event_id, {" | ".join(
        f"(((qa >> {i}) & 1) << {2 * i}) | (((qb >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits))} AS k
    FROM q
    """
    want = dict(duckdb.sql(q).fetchall())
    assert got == want and len(got) > 100


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    ev = load(spark, SF, "events").select("event_id", "user_id", "value")
    lo_u, hi_u = 0.0, float(ev.agg(F.max("user_id")).collect()[0][0])
    lo_v, hi_v = 0.0, float(ev.agg(F.max("value")).collect()[0][0])

    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    layout.zorder_write(ev, zpath,
                        {"user_id": (lo_u, hi_u), "value": (lo_v, hi_v)},
                        n_files=8)
    # linear layout: range-sorted by user_id only
    ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id")\
        .write.mode("overwrite").parquet(lpath)

    def excluded(path, col, val):
        n = 0
        for f in sorted(glob.glob(path + "/*.parquet")):
            stats = table_commit._footer_stats(f, ["user_id", "value"])
            if table_commit.file_excluded(stats, [(col, ">=", val)]):
                n += 1
        return n

    # moderate selectivity: ~30% of rows match, so every ~125-row random
    # file almost surely contains matches — only real clustering prunes
    u70 = ev.approxQuantile("user_id", [0.7], 0.0)[0]
    v70 = ev.approxQuantile("value", [0.7], 0.0)[0]
    # the linear layout prunes its own sort column...
    assert excluded(lpath, "user_id", u70) >= 4
    # ...but is blind on the other dimension; the z-order prunes BOTH
    assert excluded(lpath, "value", v70) == 0
    assert excluded(zpath, "user_id", u70) >= 1
    assert excluded(zpath, "value", v70) >= 1


def test_zorder_layout_preserves_rows(spark, tmp_path):
    ev = load(spark, SF, "events").select("event_id", "user_id", "value")
    out = layout.zorder_by(ev, {"user_id": (0, 1000), "value": (0, 1000)},
                           n_files=4)
    assert out.count() == ev.count()
    assert sorted(out.columns) == ["_zkey", "event_id", "user_id", "value"]
    # deterministic: same key for same row across layouts
    a = dict(out.select("event_id", "_zkey").collect())
    b = dict(
        layout.zorder_by(ev.repartition(13),
                         {"user_id": (0, 1000), "value": (0, 1000)},
                         n_files=4).select("event_id", "_zkey").collect()
    )
    assert a == b


def test_zorder_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        layout.zorder_key({})
    with pytest.raises(ValueError):
        layout.zorder_key({"a": (0, 10), "b": (0, 10), "c": (0, 10)},
                          bits=21)
    with pytest.raises(ValueError):
        layout.zorder_key({"a": (5, 5)})


def test_runner_zorder_option_clusters_output(spark, tmp_path):
    import csv as _csv

    from dativo_ingest_spark import runner
    from dativo_ingest_spark.config.contracts import ConfigError, JobConfig

    src = tmp_path / "pts.csv"
    with open(src, "w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(["id", "x", "y"])
        for i in range(2000):
            w.writerow([i, i % 50, (i * 7) % 50])
    out = str(tmp_path / "out")

    def job(opts):
        return JobConfig.from_dict({
            "tenant_id": "t", "schema_validation_mode": "strict",
            "source": {"type": "csv", "path": str(src)},
            "target": {"type": "parquet", "path": out,
                       "options": {"mode": "overwrite", **opts}},
            "asset": {"name": "pts", "schema": [
                {"name": "id", "type": "integer", "required": True},
                {"name": "x", "type": "integer"},
                {"name": "y", "type": "integer"}]},
        })

    res = runner.run_job(spark, job({
        "zorder": {"columns": {"x": [0, 49], "y": [0, 49]},
                   "bits": 6, "files": 8}}))
    assert res.exit_code == runner.EXIT_SUCCESS
    files = sorted(glob.glob(out + "/*.parquet"))
    assert len(files) >= 4
    # z-clustered layout: for a range predicate on EITHER curve column,
    # at least one file proves itself out via footer stats
    for col in ("x", "y"):
        excluded = sum(
            1 for f in files
            if table_commit.file_excluded(
                table_commit._footer_stats(f, ["x", "y"]),
                [(col, ">=", 40)])
        )
        assert excluded >= 1, col
    # bad configs exit via ConfigError
    import pytest as _pytest

    with _pytest.raises(ConfigError):
        runner.run_job(spark, job({"zorder": {"columns": {}}}))
    with _pytest.raises(ConfigError):
        runner.run_job(spark, job({"zorder": {"columns": {"nope": [0, 1]}}}))


def test_rewrite_zorder_prunes_reads(spark, tmp_path):
    """FsTable.rewrite_zorder: after the clustered rewrite, a 2-dimension
    predicate plans only the files whose recorded ranges can match."""
    from pyspark.sql import functions as F

    from dativo_ingest_spark.sinks.table_commit import FsTable

    table = FsTable.create(str(tmp_path / "tbl"))
    df = spark.range(4096).select(
        (F.col("id") % 64).cast("double").alias("x"),
        (F.col("id") / 64).cast("double").alias("y"),
        F.col("id").alias("payload"))
    # scattered initial layout: every file spans the full x/y space
    table.write_append(df.repartition(8), stats_columns=["x", "y"])
    before = table.snapshot(table.current_version())
    where = [("x", "<", 8.0), ("y", "<", 8.0)]
    assert len(table.matching_files(before, where)) == len(before.files)

    snap = table.rewrite_zorder(spark, {"x": (0, 64), "y": (0, 64)},
                                n_files=8)
    # the precise replace commit (never a blind overwrite: concurrent
    # appends between read and commit re-plan instead of vanishing)
    assert snap is not None and snap.operation == "replace"
    pruned = table.matching_files(snap, where)
    assert 0 < len(pruned) < len(snap.files)
    # content identical
    assert table.read(spark).count() == 4096
    got = table.read(spark, where=where).filter(
        (F.col("x") < 8) & (F.col("y") < 8)).count()
    exp = df.filter((F.col("x") < 8) & (F.col("y") < 8)).count()
    assert got == exp

    empty = FsTable.create(str(tmp_path / "empty"))
    assert empty.rewrite_zorder(spark, {"x": (0, 1)}) is None


def test_rewrite_zorder_replans_past_concurrent_append(spark, tmp_path,
                                                       monkeypatch):
    """A row appended between the rewrite's read and its commit must
    survive: the first commit attempt hits CommitConflict and the rewrite
    re-plans from the new head."""
    from pyspark.sql import functions as F

    from dativo_ingest_spark.sinks import table_commit
    from dativo_ingest_spark.sinks.table_commit import FsTable

    table = FsTable.create(str(tmp_path / "tbl"))
    df = spark.range(256).select(
        (F.col("id") % 16).cast("double").alias("x"),
        (F.col("id") / 16).cast("double").alias("y"))
    table.write_append(df, stats_columns=["x", "y"])

    race = {"armed": True}
    orig = table_commit.FsTable.replace_files

    def racing_replace(self, remove_paths, staged, expected_base, **kw):
        if race["armed"]:
            race["armed"] = False
            # concurrent ingestion commits between plan and commit
            self.write_append(
                spark.createDataFrame([(99.0, 99.0)], "x double, y double"))
        return orig(self, remove_paths, staged, expected_base, **kw)

    monkeypatch.setattr(table_commit.FsTable, "replace_files",
                        racing_replace)
    snap = table.rewrite_zorder(spark, {"x": (0, 16), "y": (0, 16)},
                                n_files=4)
    assert snap is not None
    assert table.read(spark).count() == 257  # the racer's row survived


def test_rewrite_zorder_preserves_prior_stats_columns(spark, tmp_path):
    from pyspark.sql import functions as F

    from dativo_ingest_spark.sinks.table_commit import FsTable

    table = FsTable.create(str(tmp_path / "tbl"))
    df = spark.range(512).select(
        (F.col("id") % 8).cast("double").alias("x"),
        (F.col("id") % 4).cast("long").alias("day"))
    table.write_append(df.repartition(4), stats_columns=["day"])
    snap = table.rewrite_zorder(spark, {"x": (0, 8)}, n_files=4)
    # day stats (recorded at ingest) must survive the layout rewrite
    assert all("day" in (f.get("stats") or {}) for f in snap.files)
    assert all("x" in (f.get("stats") or {}) for f in snap.files)


def test_rewrite_zorder_validates_branch_and_columns(spark, tmp_path):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dativo_ingest_spark.sinks.table_commit import FsTable

    table = FsTable.create(str(tmp_path / "tbl"))
    table.write_append(spark.range(4).select(
        F.col("id").cast("double").alias("x")))
    with _pytest.raises(ValueError, match="unknown branch"):
        table.rewrite_zorder(spark, {"x": (0, 1)}, branch="typo")
    with _pytest.raises(ValueError, match="not in table schema"):
        table.rewrite_zorder(spark, {"nope": (0, 1)})


def test_maintain_cli_zorder_spec_errors_exit_2(spark, tmp_path, capsys):
    from dativo_ingest_spark import __main__ as cli
    from dativo_ingest_spark.sinks.table_commit import FsTable

    root = str(tmp_path / "tbl")
    FsTable.create(root)
    for bad in ("x", "x=5:5,", "=0:1"):
        rc = cli.main(["--master", "local[2]", "maintain",
                       "--table-root", root, "--zorder", bad])
        assert rc == 2, bad
        capsys.readouterr()
