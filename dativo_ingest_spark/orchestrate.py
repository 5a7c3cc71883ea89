"""Orchestration glue: schedule config + dispatch planning.

Reference semantics (``/root/reference/src/dativo_ingest/orchestrated.py:
154-354``, config ``config.py:1070-1159``): a runner config declares
schedules — each with ``cron`` XOR ``interval_seconds``, a timezone, an
``enabled`` flag and ``max_concurrent_runs`` — and execution is serialized
per tenant (concurrency 1). The reference materializes these as Dagster
assets that shell out to the CLI; here the same model drives any external
scheduler (Airflow/cron/Databricks Jobs) or the minimal in-process loop in
:func:`run_pending`, with each firing calling ``runner.run_job_file`` under
the retry policy.

The cron subset implemented is the classic 5-field form with ``*``, lists,
ranges and ``*/step`` — enough for every fixture the reference ships.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

from dativo_ingest_spark.config.contracts import ConfigError


@dataclass
class Schedule:
    name: str
    job_config: str
    tenant_id: str = "default"
    cron: str | None = None
    interval_seconds: int | None = None
    timezone: str = "UTC"
    enabled: bool = True
    max_concurrent_runs: int = 1

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Schedule":
        cron, interval = d.get("cron"), d.get("interval_seconds")
        if (cron is None) == (interval is None):
            raise ConfigError(
                f"schedule '{d.get('name', '?')}' needs exactly one of "
                "cron | interval_seconds"
            )
        return cls(
            name=d.get("name") or d["job_config"],
            job_config=d["job_config"],
            tenant_id=d.get("tenant_id", "default"),
            cron=cron,
            interval_seconds=int(interval) if interval is not None else None,
            timezone=d.get("timezone", "UTC"),
            enabled=bool(d.get("enabled", True)),
            max_concurrent_runs=int(d.get("max_concurrent_runs", 1)),
        )


@dataclass
class RunnerConfig:
    schedules: list[Schedule] = dc_field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "RunnerConfig":
        return cls(schedules=[Schedule.from_dict(s)
                              for s in d.get("schedules") or []])

    @classmethod
    def from_yaml(cls, path: str) -> "RunnerConfig":
        if yaml is None:  # pragma: no cover
            raise ConfigError("PyYAML unavailable")
        with open(path) as fh:
            return cls.from_dict(yaml.safe_load(fh) or {})


# --- cron subset -----------------------------------------------------------

def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        stepped = "/" in part
        if stepped:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part in ("*", ""):
            rng = range(lo, hi + 1)
        elif "-" in part:
            a, b = part.split("-", 1)
            rng = range(int(a), int(b) + 1)
        elif stepped:
            # vixie semantics: "a/step" == "a-hi/step", anchored at a
            rng = range(int(part), hi + 1)
        else:
            rng = range(int(part), int(part) + 1)
        out.update(v for v in rng if (v - rng.start) % step == 0)
    if not out or min(out) < lo or max(out) > hi:
        raise ConfigError(f"cron field out of range: {spec}")
    return out


def cron_matches(cron: str, at: _dt.datetime) -> bool:
    """5-field cron match (minute hour dom month dow; dow 0=Sunday).
    dom/dow combine with OR when both are restricted, per POSIX cron."""
    fields = cron.split()
    if len(fields) != 5:
        raise ConfigError(f"cron needs 5 fields: {cron!r}")
    minute = _parse_field(fields[0], 0, 59)
    hour = _parse_field(fields[1], 0, 23)
    dom = _parse_field(fields[2], 1, 31)
    month = _parse_field(fields[3], 1, 12)
    dow = _parse_field(fields[4], 0, 6)
    if at.minute not in minute or at.hour not in hour or at.month not in month:
        return False
    dom_restricted = fields[2] != "*"
    dow_restricted = fields[4] != "*"
    dom_ok = at.day in dom
    dow_ok = (at.weekday() + 1) % 7 in dow  # python Mon=0 → cron Sun=0
    if dom_restricted and dow_restricted:
        return dom_ok or dow_ok
    return dom_ok and dow_ok


def next_fire(schedule: Schedule, after: _dt.datetime,
              horizon_minutes: int = 366 * 24 * 60) -> _dt.datetime | None:
    """Next fire time strictly after ``after`` (minute resolution for cron)."""
    if schedule.interval_seconds is not None:
        return after + _dt.timedelta(seconds=schedule.interval_seconds)
    t = after.replace(second=0, microsecond=0)
    for _ in range(horizon_minutes):
        t += _dt.timedelta(minutes=1)
        if cron_matches(schedule.cron, t):
            return t
    return None


# --- dispatch planning -----------------------------------------------------

def runnable(
    due: list[Schedule],
    running: dict[str, int],
) -> list[Schedule]:
    """Filter due schedules by the per-tenant serialization rule
    (``orchestrated.py:344-346``: concurrency 1 per tenant) and each
    schedule's ``max_concurrent_runs``. ``running`` maps tenant → active
    run count."""
    picked: list[Schedule] = []
    tenants_in_batch: set[str] = set()
    for s in due:
        if not s.enabled:
            continue
        active = running.get(s.tenant_id, 0)
        if active >= 1 or s.tenant_id in tenants_in_batch:
            continue
        if active >= s.max_concurrent_runs:
            continue
        picked.append(s)
        tenants_in_batch.add(s.tenant_id)
    return picked


def run_pending(
    config: RunnerConfig,
    now: _dt.datetime,
    last_fired: dict[str, _dt.datetime],
    execute: Callable[[Schedule], Any],
) -> list[str]:
    """One scheduler tick: fire every enabled schedule whose next fire time
    since its last firing is <= now, serialized per tenant. Returns the
    names fired. The ``execute`` callback is typically
    ``lambda s: retry_policy.run_with_retries(lambda: run_job_file(...))``.
    """
    due = []
    for s in config.schedules:
        prev = last_fired.get(s.name, now - _dt.timedelta(days=1))
        nxt = next_fire(s, prev)
        if nxt is not None and nxt <= now:
            due.append(s)
    fired = []
    for s in runnable(due, running={}):
        execute(s)
        last_fired[s.name] = now
        fired.append(s.name)
    return fired
