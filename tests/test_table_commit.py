"""Transactional contract of sinks/table_commit.py: atomic visibility,
exactly-one-winner versioning, time travel, branches, crash orphans."""

import json
import os

import pytest

from dativo_ingest_spark.sinks.table_commit import CommitConflict, FsTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "v")


def test_append_commits_are_versioned_and_cumulative(spark, tmp_path):
    t = FsTable.create(str(tmp_path / "t"))
    s1 = t.write_append(_df(spark, 0, 10))
    s2 = t.write_append(_df(spark, 10, 15))
    assert (s1.version, s2.version) == (1, 2)
    assert t.read(spark).count() == 15
    # time travel: v1 still sees only the first commit
    assert t.read(spark, version=1).count() == 10
    assert {r.v for r in t.read(spark, version=1).collect()} == set(range(10))


def test_empty_table_reads_with_schema(spark, tmp_path):
    t = FsTable.create(str(tmp_path / "t"))
    assert t.read(spark).count() == 0


def test_overwrite_replaces_file_set(spark, tmp_path):
    t = FsTable.create(str(tmp_path / "t"))
    t.write_append(_df(spark, 0, 10))
    df = _df(spark, 100, 103)
    stage = "data/manualstage"
    out = tmp_path / "t" / stage
    df.write.parquet(str(out))
    staged = [
        {"path": f"{stage}/{n}"} for n in sorted(os.listdir(out))
        if n.endswith(".parquet")
    ]
    t.add_files(staged, operation="overwrite", schema_json=df.schema.json())
    assert {r.v for r in t.read(spark).collect()} == {100, 101, 102}
    assert t.read(spark, version=1).count() == 10


def test_concurrent_commit_single_winner(spark, tmp_path):
    t = FsTable.create(str(tmp_path / "t"))
    t.write_append(_df(spark, 0, 5))
    # simulate a racing writer that publishes v2 between our read and publish
    racer = FsTable(str(tmp_path / "t"))
    racer._publish(
        type(racer.snapshot(1))(version=2, operation="append", files=[],
                                parent=1)
    )
    with pytest.raises(CommitConflict):
        t._publish(
            type(t.snapshot(1))(version=2, operation="append", files=[],
                                parent=1)
        )
    # add_files retries past the conflict onto v3
    racer._set_ref("main", 2)
    snap = t.add_files([], operation="append")
    assert snap.version == 3


def test_crash_before_publish_leaves_table_unchanged(spark, tmp_path):
    t = FsTable.create(str(tmp_path / "t"))
    t.write_append(_df(spark, 0, 5))
    # a writer died after staging parquet but before commit
    _df(spark, 90, 99).write.parquet(str(tmp_path / "t" / "data" / "orphan"))
    assert t.read(spark).count() == 5
    assert t.current_version() == 1


def test_branches_pin_versions_independently(spark, tmp_path):
    t = FsTable.create(str(tmp_path / "t"))
    t.write_append(_df(spark, 0, 5))
    t.create_branch("audit")
    t.write_append(_df(spark, 5, 20))
    assert t.read(spark, branch="audit").count() == 5
    assert t.read(spark).count() == 20
    t.write_append(_df(spark, 90, 91), branch="audit")
    assert t.read(spark, branch="audit").count() == 6
    assert t.read(spark).count() == 20


def test_properties_merge_through_commits(spark, tmp_path):
    t = FsTable.create(str(tmp_path / "t"), properties={"owner": "data-eng"})
    t.write_append(_df(spark, 0, 3), properties={"classification": "internal"})
    snap = t.snapshot(t.current_version())
    assert snap.properties == {"owner": "data-eng",
                               "classification": "internal"}
    manifest = json.load(open(os.path.join(t._meta, "v1.json")))
    assert manifest["parent"] == 0
