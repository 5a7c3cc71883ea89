"""Plugin SDK: dynamic loading, driver drain, distributed read, writer sink."""

from __future__ import annotations

import json

import pytest

from dativo_ingest_spark import plugins

PLUGIN_SRC = '''
from dativo_ingest_spark.plugins import (BaseReader, BaseWriter,
                                         ConnectionTestResult, DiscoveryResult)

class RangeReader(BaseReader):
    """Yields rows [start, start+count) in batches of batch_size."""
    def check_connection(self):
        return ConnectionTestResult(success=True, message="ok",
                                    details={"server": "fake"})
    def discover(self):
        return DiscoveryResult(objects=[{"name": "numbers", "type": "stream"}])
    def get_total_records_estimate(self):
        return self.source_config.get("count", 0)
    def extract(self, state=None):
        start = self.source_config.get("start", 0)
        count = self.source_config.get("count", 10)
        bs = self.source_config.get("batch_size", 4)
        batch = []
        for i in range(start, start + count):
            batch.append({"n": i, "squared": i * i})
            if len(batch) >= bs:
                yield batch
                batch = []
        if batch:
            yield batch

class JsonLinesWriter(BaseWriter):
    def write_batch(self, records, counter):
        import os
        path = os.path.join(self.target_config["dir"], f"part_{counter}.jsonl")
        import json as _json
        with open(path, "w") as fh:
            for r in records:
                fh.write(_json.dumps(r) + "\\n")
        return [{"path": path, "record_count": len(records)}]

class NotAReader:
    pass
'''


@pytest.fixture()
def plugin_file(tmp_path):
    p = tmp_path / "my_plugin.py"
    p.write_text(PLUGIN_SRC)
    return str(p)


def test_load_and_validate(plugin_file):
    cls = plugins.load_reader(f"{plugin_file}:RangeReader")
    r = cls({"count": 3})
    assert r.check_connection().success
    assert r.discover().objects[0]["name"] == "numbers"
    assert r.get_total_records_estimate() == 3
    with pytest.raises(plugins.PluginError):
        plugins.load_reader(f"{plugin_file}:NotAReader")
    with pytest.raises(plugins.PluginError):
        plugins.load_reader(f"{plugin_file}:Missing")
    with pytest.raises(plugins.PluginError):
        plugins.load_reader("no-colon-spec")


def test_reader_to_dataframe(spark, plugin_file):
    cls = plugins.load_reader(f"{plugin_file}:RangeReader")
    df = plugins.reader_to_dataframe(
        spark, cls({"count": 10, "batch_size": 3}),
        "n bigint, squared bigint")
    rows = {r.n: r.squared for r in df.collect()}
    assert rows == {i: i * i for i in range(10)}


def test_partitioned_read(spark, plugin_file):
    from pyspark.sql import types as T
    schema = T.StructType([T.StructField("n", T.LongType()),
                           T.StructField("squared", T.LongType())])
    tasks = [{"start": 0, "count": 5}, {"start": 100, "count": 5},
             {"start": 200, "count": 5}]
    df = plugins.partitioned_read(spark, plugin_file, "RangeReader",
                                  tasks, schema)
    got = sorted(r.n for r in df.collect())
    assert got == list(range(0, 5)) + list(range(100, 105)) + \
        list(range(200, 205))


def test_writer_sink(spark, plugin_file, tmp_path):
    out = tmp_path / "sinkout"
    out.mkdir()
    df = spark.createDataFrame([(i, str(i)) for i in range(25)],
                               "id bigint, s string").repartition(3)
    files = plugins.writer_sink(df, plugin_file, "JsonLinesWriter",
                                {"dir": str(out)}, batch_size=10)
    assert sum(f["record_count"] for f in files) == 25
    written = []
    for f in files:
        with open(f["path"]) as fh:
            written.extend(json.loads(line)["id"] for line in fh)
    assert sorted(written) == list(range(25))
