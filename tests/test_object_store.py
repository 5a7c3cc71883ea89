"""S3 object publishing: path parsing, metadata/tag decoration, capped
unique tag sets, directory publish over a fake client, s3a conf."""

from __future__ import annotations

import datetime as dt

import pytest

from dativo_ingest_spark.config.contracts import AssetDefinition
from dativo_ingest_spark.sinks import object_store as obj

NOW = dt.datetime(2026, 8, 13, 12, 0, 0)


def _asset():
    return AssetDefinition.from_dict({
        "name": "people", "version": "2.1", "domain": "hr",
        "dataProduct": "workforce", "tenant": "acme",
        "team": {"owner": "data-eng"},
        "compliance": {"classification": ["internal", "pii"],
                       "retention_days": 30},
        "schema": [{"name": "id", "type": "integer"}],
    })


class FakeS3:
    def __init__(self):
        self.puts: list[tuple[str, str, dict]] = []

    def upload_fileobj(self, fileobj, bucket, key, ExtraArgs=None):
        assert fileobj.read(4) is not None
        self.puts.append((bucket, key, ExtraArgs))


def test_parse_s3_path():
    assert obj.parse_s3_path("s3://b/a//c/f.parquet") == ("b", "a/c/f.parquet")
    assert obj.parse_s3_path("bucket/k.parquet") == ("bucket", "k.parquet")
    with pytest.raises(ValueError, match="full path after the bucket"):
        obj.parse_s3_path("s3://bucket-only")


def test_object_metadata_and_tags():
    md, tags = obj.object_metadata(
        _asset(), branch="acme",
        file_metadata={"record_count": 42, "size_bytes": 1024,
                       "partition": "ingest_date=2026-08-13"},
        asset_tags=["gold"], now=NOW)
    assert md["asset-name"] == "people" and md["asset-version"] == "2.1"
    assert md["classification"] == "internal,pii"
    assert md["retention-days"] == "30"
    assert md["record-count"] == "42"
    assert md["ingest-timestamp"] == "2026-08-13T12:00:00Z"
    assert md["compression"] == "snappy"
    assert tags == ["domain:hr", "data-product:workforce", "tenant:acme",
                    "branch:acme", "owner:data-eng", "asset-tag:gold",
                    "partition:ingest_date=2026-08-13"]


def test_tag_set_cap_and_uniqueness():
    tags = [f"k{i}:v{i}" for i in range(12)] + ["k0:dup"]
    ts = obj.tag_set(tags)
    assert len(ts) == 10  # S3 cap
    assert ts[0] == {"Key": "k0", "Value": "v0"}  # first wins
    s = obj.tagging_string([{"Key": "a b", "Value": "x/y"}])
    assert s == "a%20b=x/y"


def test_upload_file_decorates(tmp_path):
    p = tmp_path / "f.parquet"
    p.write_bytes(b"PAR1....")
    s3 = FakeS3()
    extra = obj.upload_file(s3, str(p), "s3://lake/hr/people/f.parquet",
                            _asset(), branch="acme", now=NOW)
    (bucket, key, sent), = s3.puts
    assert (bucket, key) == ("lake", "hr/people/f.parquet")
    assert sent is extra
    assert sent["ContentType"] == "application/x-parquet"
    assert sent["Metadata"]["tenant-id"] == "acme"
    assert "domain=hr" in sent["Tagging"]


def test_upload_directory_preserves_hive_layout(tmp_path):
    d = tmp_path / "staged"
    (d / "_p_date=2026-08-13").mkdir(parents=True)
    (d / "_p_date=2026-08-13" / "part-0.parquet").write_bytes(b"PAR1")
    (d / "_p_date=2026-08-14").mkdir()
    (d / "_p_date=2026-08-14" / "part-1.parquet").write_bytes(b"PAR1")
    (d / "_SUCCESS").write_bytes(b"")  # committer marker: never uploaded
    s3 = FakeS3()
    keys = obj.upload_directory(s3, str(d), "s3://lake/t", _asset(),
                                branch="acme", now=NOW)
    assert keys == ["_p_date=2026-08-13/part-0.parquet",
                    "_p_date=2026-08-14/part-1.parquet"]
    md = s3.puts[0][2]["Metadata"]
    assert md["partition"] == "_p_date=2026-08-13"
    assert all(b == "lake" and k.startswith("t/") for b, k, _ in s3.puts)


def test_s3a_conf_minio():
    conf = obj.s3a_conf(endpoint="http://minio:9000", access_key="ak",
                        secret_key="sk", path_style=True)
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "directory"
    assert "PathOutputCommitProtocol" in conf[
        "spark.sql.sources.commitProtocolClass"]
