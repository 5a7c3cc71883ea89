"""Subprocess plugin jail: isolation, streaming extract, failure modes.

Reference contract: sandbox.py:43-140 (PluginSandbox limits),
sandboxed_plugin_wrapper.py:36-155 (BaseReader-compatible wrapper),
sandbox.py:1328-1363 (should_sandbox_plugin gating)."""

from __future__ import annotations

import time

import pytest

from dativo_ingest_spark import plugin_sandbox, plugins
from dativo_ingest_spark.plugin_sandbox import (
    SandboxedReader,
    SandboxError,
    SubprocessSandbox,
    make_reader,
    should_sandbox_plugin,
)

PLUGIN = '''
import os

from dativo_ingest_spark.plugins import (
    BaseReader, ConnectionTestResult, DiscoveryResult)


class GoodReader(BaseReader):
    def check_connection(self):
        return ConnectionTestResult(success=True, message="ok")

    def discover(self):
        return DiscoveryResult(objects=[{"name": "t1"}])

    def extract(self, state=None):
        start = int(self.source_config.get("start", 0))
        for b in range(2):
            yield [{"id": start + b * 2 + i, "env_leak":
                    os.environ.get("DATIVO_SECRET__T__PW", "none"),
                    "cwd": os.getcwd()} for i in range(2)]


class CrashReader(BaseReader):
    def extract(self, state=None):
        yield [{"id": 1}]
        raise RuntimeError("boom mid-stream")


class SlowReader(BaseReader):
    def extract(self, state=None):
        import time
        time.sleep(60)
        yield [{"id": 1}]
'''


@pytest.fixture()
def plugin_file(tmp_path):
    # no PYTHONPATH needed: the jail bootstrap inserts the SDK path itself
    p = tmp_path / "my_plugin.py"
    p.write_text(PLUGIN)
    return str(p)


def _sandbox(plugin_file, cls="GoodReader", **kw):
    return SubprocessSandbox(f"{plugin_file}:{cls}", **kw)


def test_gating_matches_reference():
    assert not should_sandbox_plugin("p.py:C")  # self_hosted default: off
    assert should_sandbox_plugin("p.py:C", mode="cloud")
    assert not should_sandbox_plugin("p.txt:C", mode="cloud")
    assert should_sandbox_plugin(
        "p.py:C", plugin_config={"sandbox": {"enabled": True}})
    assert not should_sandbox_plugin(
        "p.py:C", mode="cloud", plugin_config={"sandbox": {"enabled": False}})


def test_scalar_calls_roundtrip(plugin_file, monkeypatch):
    monkeypatch.setenv("DATIVO_SECRET__T__PW", "leakme")
    reader = SandboxedReader(
        f"{plugin_file}:GoodReader", {"start": 0}, {})
    conn = reader.check_connection()
    assert conn.success and conn.message == "ok"
    disc = reader.discover()
    assert disc.objects == [{"name": "t1"}]


def test_extract_streams_and_isolates_env(plugin_file, monkeypatch, tmp_path):
    """The jail sees neither the driver's secrets nor its cwd."""
    monkeypatch.setenv("DATIVO_SECRET__T__PW", "leakme")
    reader = SandboxedReader(
        f"{plugin_file}:GoodReader", {"start": 10}, {})
    batches = list(reader.extract())
    assert [len(b) for b in batches] == [2, 2]
    rows = [r for b in batches for r in b]
    assert [r["id"] for r in rows] == [10, 11, 12, 13]
    assert all(r["env_leak"] == "none" for r in rows)  # secret scrubbed
    assert all("dativo_jail_" in r["cwd"] for r in rows)  # scratch cwd


def test_crash_mid_stream_raises_with_traceback(plugin_file):
    sb = _sandbox(plugin_file, "CrashReader")
    got = []
    with pytest.raises(SandboxError, match="boom mid-stream"):
        for doc in sb.stream("extract", {}):
            got.append(doc)
    assert got and got[0]["type"] == "batch"  # first batch arrived


def test_timeout_kills_process_group(plugin_file):
    sb = _sandbox(plugin_file, "SlowReader", timeout=1.5)
    t0 = time.monotonic()
    with pytest.raises(SandboxError, match="timeout"):
        list(sb.stream("extract", {}))
    assert time.monotonic() - t0 < 30


def test_bad_specs_fail_fast(plugin_file):
    with pytest.raises(plugins.PluginError, match="ClassName"):
        SubprocessSandbox(plugin_file)  # missing :Class
    with pytest.raises(plugins.PluginError, match="not found"):
        SubprocessSandbox("/nope/missing.py:C")
    sb = _sandbox(plugin_file, "NoSuchClass")
    with pytest.raises(SandboxError, match="NoSuchClass"):
        list(sb.stream("extract", {}))


def test_make_reader_routes_by_gating(plugin_file):
    inproc = make_reader(f"{plugin_file}:GoodReader", {"start": 0})
    assert type(inproc).__name__ == "GoodReader"
    jailed = make_reader(
        f"{plugin_file}:GoodReader", {"start": 0},
        plugin_config={"sandbox": {"enabled": True}})
    assert isinstance(jailed, SandboxedReader)


def test_sandboxed_reader_feeds_dataframe(spark, plugin_file):
    """Drop-in for the existing plugin machinery: the jailed reader drains
    into a DataFrame exactly like an in-process one."""
    reader = SandboxedReader(
        f"{plugin_file}:GoodReader", {"start": 0}, {})
    df = plugins.reader_to_dataframe(
        spark, reader, "id long, env_leak string, cwd string")
    assert df.count() == 4
    assert df.filter("env_leak = 'none'").count() == 4


def test_custom_python_job_end_to_end(spark, plugin_file, tmp_path):
    """Runner routes source type custom_python through the plugin factory:
    in-process by default, jailed when sandbox.enabled — same lifecycle
    (validate → write → exit code) either way."""
    from dativo_ingest_spark import runner
    from dativo_ingest_spark.config.contracts import JobConfig

    def job(out, sandbox=None):
        opts = {"plugin": f"{plugin_file}:GoodReader",
                "schema": "id long, env_leak string, cwd string",
                "start": 0}
        if sandbox:
            opts["sandbox"] = sandbox
        return JobConfig.from_dict({
            "tenant_id": "acme",
            "source": {"type": "custom_python", "options": opts},
            "target": {"type": "parquet", "path": out,
                       "options": {"mode": "overwrite"}},
            "asset": {"name": "p", "schema": [
                {"name": "id", "type": "integer", "required": True},
                {"name": "env_leak", "type": "string"},
                {"name": "cwd", "type": "string"},
            ]},
        })

    out1 = str(tmp_path / "o1")
    res = runner.run_job(spark, job(out1))
    assert res.exit_code == runner.EXIT_SUCCESS
    assert res.records_valid == 4
    assert spark.read.parquet(out1).count() == 4

    out2 = str(tmp_path / "o2")
    res = runner.run_job(spark, job(out2, sandbox={"enabled": True}))
    assert res.exit_code == runner.EXIT_SUCCESS
    jailed_rows = spark.read.parquet(out2).collect()
    assert all("dativo_jail_" in r.cwd for r in jailed_rows)


def test_check_and_discover_route_custom_python(spark, plugin_file):
    from dativo_ingest_spark import inspect_cmd
    from dativo_ingest_spark.config.contracts import SourceConfig

    src = SourceConfig.from_dict({
        "type": "custom_python",
        "options": {"plugin": f"{plugin_file}:GoodReader"}})
    doc = inspect_cmd.check_source(spark, src)
    assert doc == {"ok": True, "source_type": "custom_python",
                   "details": {"message": "ok"}}
    assert inspect_cmd.discover(spark, src) == [{"name": "t1"}]
    # broken spec: probe reports, never raises
    bad = SourceConfig.from_dict({
        "type": "custom_python", "options": {"plugin": "/nope.py:C"}})
    doc = inspect_cmd.check_source(spark, bad)
    assert doc["ok"] is False and "not found" in doc["error"]


def test_check_and_discover_jail_in_cloud_mode(spark, plugin_file,
                                               monkeypatch):
    """check/discover execute plugin code, so cloud mode must route them
    through the same sandbox gating as the runner — an in-process probe
    would be an unjailed escape hatch for untrusted code."""
    from dativo_ingest_spark import inspect_cmd
    from dativo_ingest_spark.config.contracts import SourceConfig

    seen_modes = []
    real = plugin_sandbox.make_reader

    def recording(spec, source_config, mode="self_hosted",
                  plugin_config=None):
        seen_modes.append(mode)
        return real(spec, source_config, mode=mode,
                    plugin_config=plugin_config)

    monkeypatch.setattr(plugin_sandbox, "make_reader", recording)
    src = SourceConfig.from_dict({
        "type": "custom_python",
        "options": {"plugin": f"{plugin_file}:GoodReader"}})
    # cloud probes succeed AND run jailed (gating says sandbox for .py)
    doc = inspect_cmd.check_source(spark, src, mode="cloud")
    assert doc["ok"] is True
    assert inspect_cmd.discover(spark, src, mode="cloud") == [{"name": "t1"}]
    assert seen_modes == ["cloud", "cloud"]
    assert isinstance(real(f"{plugin_file}:GoodReader",
                           {"plugin": f"{plugin_file}:GoodReader"},
                           mode="cloud"), SandboxedReader)
