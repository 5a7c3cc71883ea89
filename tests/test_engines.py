"""Airbyte/Singer protocol bridge: fake connector subprocess → spooled
streams → distributed JSON parse → STATE passthrough."""

from __future__ import annotations

import json
import os
import sys

import pytest

from dativo_ingest_spark.config.registry import CONNECTORS
from dativo_ingest_spark.operators.incremental import StateKey, StateStore
from dativo_ingest_spark.sources import engines

# A stand-in connector: reads config from stdin, emits a scripted Airbyte
# message sequence (records for two streams, interleaved STATE checkpoints,
# log noise, a non-JSON line), exits 0. Driven as a REAL subprocess.
FAKE_AIRBYTE = r"""
import json, sys
cfg = json.loads(sys.stdin.read())
n = int(cfg.get("n", 7))
sys.stdout.write("not json at all\n")
print(json.dumps({"type": "LOG", "log": {"level": "INFO", "message": "hi"}}))
for i in range(n):
    print(json.dumps({"type": "RECORD", "record": {
        "stream": "charges", "data": {"id": i, "amount": i * 10,
                                      "cursor": 1000 + i}}}))
    if i % 3 == 2:
        print(json.dumps({"type": "STATE", "state": {
            "data": {"charges": {"cursor": 1000 + i}}}}))
for i in range(3):
    print(json.dumps({"type": "RECORD", "record": {
        "stream": "customers", "data": {"id": 100 + i, "name": f"c{i}"}}}))
print(json.dumps({"type": "STATE", "state": {
    "data": {"customers": {"id": 102}}}}))
"""

FAKE_SINGER = r"""
import json, sys
sys.stdin.read()
print(json.dumps({"type": "SCHEMA", "stream": "t", "schema": {}}))
for i in range(4):
    print(json.dumps({"type": "RECORD", "stream": "t",
                      "record": {"k": i}}))
print(json.dumps({"type": "STATE", "value": {"bookmarks": {"t": {"k": 3}}}}))
"""

FAKE_FAILING = r"""
import sys
sys.stdin.read()
sys.stderr.write("connection refused: api.stripe.com\n")
sys.exit(3)
"""


def _argv(script: str) -> list[str]:
    return [sys.executable, "-c", script]


def test_protocol_spools_streams_and_batches(tmp_path):
    spool = str(tmp_path / "spool")
    res = engines.run_protocol(
        _argv(FAKE_AIRBYTE), {"n": 7}, spool, batch_size=3)
    assert res.n_records == 10
    assert set(res.streams) == {"charges", "customers"}
    # STATE checkpoints force flushes, so part files roll at <= batch_size
    parts = sorted(os.listdir(res.streams["charges"]))
    assert len(parts) >= 3 and all(p.endswith(".jsonl") for p in parts)
    rows = []
    for p in parts:
        with open(os.path.join(res.streams["charges"], p)) as fh:
            rows += [json.loads(ln) for ln in fh]
    assert [r["id"] for r in rows] == list(range(7))
    assert res.states[-1] == {"customers": {"id": 102}}


def test_state_callback_fires_after_preceding_records_flushed(tmp_path):
    """Airbyte checkpoint contract: when a STATE arrives, every record
    before it on the wire must already be durable in the spool."""
    seen = []

    def cb(state):
        stream_dir = os.path.join(str(tmp_path / "s"), "charges")
        on_disk = 0
        for p in os.listdir(stream_dir):
            with open(os.path.join(stream_dir, p)) as fh:
                on_disk += sum(1 for _ in fh)
        seen.append((state, on_disk))

    engines.run_protocol(
        _argv(FAKE_AIRBYTE), {"n": 7}, str(tmp_path / "s"),
        batch_size=100, state_callback=cb)
    # checkpoints at record 3 and 6: all preceding records were on disk
    assert seen[0][0] == {"charges": {"cursor": 1002}} and seen[0][1] >= 3
    assert seen[1][0] == {"charges": {"cursor": 1005}} and seen[1][1] >= 6


def test_nonzero_exit_raises_with_stderr(tmp_path):
    with pytest.raises(engines.EngineProtocolError, match="connection refused"):
        engines.run_protocol(_argv(FAKE_FAILING), {}, str(tmp_path / "s"))


def test_stripe_source_end_to_end(spark, tmp_path):
    """StripeSource with an injected argv: registry-derived defaults,
    engine config assembly, spool → Spark DataFrame, STATE → StateStore."""
    store = StateStore(str(tmp_path / "state"))
    key = StateKey("acme", "stripe", "charges")
    src = engines.StripeSource(
        argv=_argv(FAKE_AIRBYTE),
        options={"credentials": {"type": "api_key",
                                 "from_env": "FAKE_STRIPE_KEY"},
                 "start_date_default": "2024-01-01"},
        objects=["charges", "customers"],
        cursor_field="cursor",
        batch_size=4,
    )
    assert src.spec is CONNECTORS["stripe"]
    assert src.extract_metadata()["tags"]["category"] == "payments"

    staged: list[dict] = []
    res = src.extract(str(tmp_path / "spool"),
                      state_callback=staged.append,
                      env={"FAKE_STRIPE_KEY": "sk_test_x"})
    df = res.read(spark, "charges")
    got = {(r.id, r.amount, r.cursor) for r in df.collect()}
    assert got == {(i, i * 10, 1000 + i) for i in range(7)}
    assert res.read(spark, "customers").count() == 3

    # commit-then-state: merge staged STATEs only after the sink commit
    for s in staged:
        store.merge_engine_state(key, s)
    assert store.get_engine_state(key) == {
        "charges": {"cursor": 1005}, "customers": {"id": 102}}


def test_engine_config_assembly(tmp_path):
    spec = CONNECTORS["stripe"]
    cfg = engines.build_engine_config(
        spec,
        options={"credentials": {"type": "api_key", "from_env": "K"},
                 "start_date_default": "2023-06-01",
                 "streams_default": ["charges"],
                 "connection": {"account_id": "acct_1"}},
        objects=["invoices", "charges"],  # job override wins
        cursor_field="created",
        env={"K": "sk_live_y"},
    )
    assert cfg == {"api_key": "sk_live_y", "start_date": "2023-06-01",
                   "streams": ["invoices", "charges"],
                   "cursor_field": "created", "account_id": "acct_1"}
    with pytest.raises(ValueError, match="not supported"):
        engines.build_engine_config(spec, objects=["refunds"])
    # service-account file with {tenant} substitution
    sa = tmp_path / "acme.json"
    sa.write_text(json.dumps({"client_email": "x@y"}))
    cfg2 = engines.build_engine_config(
        CONNECTORS["gdrive_csv"],
        options={"credentials": {
            "type": "service_account",
            "file_template": str(tmp_path / "{tenant}.json")}},
        tenant_id="acme", env={},
    )
    assert cfg2["client_email"] == "x@y"


def test_singer_source(spark, tmp_path):
    src = engines.SingerSource(argv=_argv(FAKE_SINGER))
    res = src.extract(str(tmp_path / "spool"))
    assert res.n_records == 4
    assert [r.k for r in res.read(spark, "t").orderBy("k").collect()] == [0, 1, 2, 3]
    assert res.states == [{"bookmarks": {"t": {"k": 3}}}]


def test_airbyte_requires_image_without_argv():
    with pytest.raises(ValueError, match="docker_image"):
        engines.AirbyteSource()
    argv = engines.docker_argv("airbyte/source-faker")
    assert argv[:4] == ["docker", "run", "--rm", "-i"]


def test_meltano_source_invokes_singer_protocol(spark, tmp_path):
    """MeltanoSource = Singer parser over `meltano invoke tap-x` argv;
    default argv assembled from tap + project dir, injectable for tests."""
    m = engines.MeltanoSource(tap="tap-postgres", project_dir="/proj")
    assert m.argv == ["meltano", "--cwd", "/proj", "invoke", "tap-postgres"]
    m2 = engines.MeltanoSource(tap="tap-x", argv=_argv(FAKE_SINGER))
    res = m2.extract(str(tmp_path / "spool"))
    assert res.n_records == 4
    assert res.states == [{"bookmarks": {"t": {"k": 3}}}]
