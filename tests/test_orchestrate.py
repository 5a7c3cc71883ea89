"""Scheduling model: cron subset, XOR validation, per-tenant serialization."""

from __future__ import annotations

import datetime as dt

import pytest

from dativo_ingest_spark import orchestrate
from dativo_ingest_spark.config.contracts import ConfigError
from dativo_ingest_spark.orchestrate import (RunnerConfig, Schedule,
                                             cron_matches, next_fire,
                                             run_pending, runnable)


def test_cron_xor_interval():
    with pytest.raises(ConfigError):
        Schedule.from_dict({"name": "x", "job_config": "j.yaml"})
    with pytest.raises(ConfigError):
        Schedule.from_dict({"name": "x", "job_config": "j.yaml",
                            "cron": "* * * * *", "interval_seconds": 60})
    s = Schedule.from_dict({"name": "x", "job_config": "j.yaml",
                            "interval_seconds": 300})
    assert s.interval_seconds == 300 and s.enabled


def test_cron_matching():
    at = dt.datetime(2026, 8, 13, 9, 30)          # Thursday
    assert cron_matches("30 9 * * *", at)
    assert cron_matches("*/15 * * * *", at)
    assert not cron_matches("0 9 * * *", at)
    assert cron_matches("30 9 13 8 *", at)
    assert cron_matches("30 9 * * 4", at)          # Thursday = 4
    assert not cron_matches("30 9 * * 0", at)
    # dom OR dow when both restricted (POSIX)
    assert cron_matches("30 9 1 * 4", at)          # dom=1 false, dow ok
    with pytest.raises(ConfigError):
        cron_matches("* * *", at)
    with pytest.raises(ConfigError):
        cron_matches("99 * * * *", at)


def test_next_fire():
    s = Schedule(name="s", job_config="j", cron="0 12 * * *")
    nxt = next_fire(s, dt.datetime(2026, 8, 13, 9, 30))
    assert nxt == dt.datetime(2026, 8, 13, 12, 0)
    si = Schedule(name="i", job_config="j", interval_seconds=600)
    assert next_fire(si, dt.datetime(2026, 8, 13, 9, 0)) == \
        dt.datetime(2026, 8, 13, 9, 10)


def test_per_tenant_serialization():
    a1 = Schedule(name="a1", job_config="j", tenant_id="a", interval_seconds=1)
    a2 = Schedule(name="a2", job_config="j", tenant_id="a", interval_seconds=1)
    b1 = Schedule(name="b1", job_config="j", tenant_id="b", interval_seconds=1)
    off = Schedule(name="off", job_config="j", tenant_id="c",
                   interval_seconds=1, enabled=False)
    picked = runnable([a1, a2, b1, off], running={})
    assert [s.name for s in picked] == ["a1", "b1"]  # one per tenant, off skipped
    picked = runnable([a1, b1], running={"a": 1})
    assert [s.name for s in picked] == ["b1"]        # tenant a already running


def test_run_pending_tick():
    cfg = RunnerConfig(schedules=[
        Schedule(name="every5", job_config="j1", tenant_id="a",
                 interval_seconds=300),
        Schedule(name="daily", job_config="j2", tenant_id="b",
                 cron="0 12 * * *"),
    ])
    executed = []
    now = dt.datetime(2026, 8, 13, 12, 0)
    last: dict[str, dt.datetime] = {}
    fired = run_pending(cfg, now, last, executed.append)
    assert set(f for f in fired) == {"every5", "daily"}
    # immediately after: nothing due
    fired = run_pending(cfg, now + dt.timedelta(minutes=1), last,
                        executed.append)
    assert fired == []
    # 5 minutes later the interval schedule fires again, cron does not
    fired = run_pending(cfg, now + dt.timedelta(minutes=5), last,
                        executed.append)
    assert fired == ["every5"]


def test_runner_config_yaml(tmp_path):
    p = tmp_path / "runner.yaml"
    p.write_text(
        "schedules:\n"
        "  - name: nightly\n    job_config: jobs/a.yaml\n"
        "    tenant_id: acme\n    cron: '0 2 * * *'\n"
        "  - name: fast\n    job_config: jobs/b.yaml\n"
        "    interval_seconds: 60\n"
    )
    cfg = RunnerConfig.from_yaml(str(p))
    assert [s.name for s in cfg.schedules] == ["nightly", "fast"]
    assert cfg.schedules[0].cron == "0 2 * * *"
