"""Incremental-sync operators: cursor predicates, lookback, state store.

Re-expresses the reference's incremental machinery (reference:
src/dativo_ingest/connectors/postgres_extractor.py:156-204 predicate
construction, :284-328 state update; src/dativo_ingest/validator.py:273-425
state file shape; src/dativo_ingest/config.py:682-711 state path derivation)
on Spark:

- the cursor predicate is a plain Column comparison, so Catalyst pushes it
  into the source scan (JDBC WHERE / parquet row-group pruning / Iceberg
  partition pruning) — this is what makes incremental reads cheap at 100 TB;
- precedence matches the reference: stored state → ``cursor >= last_value``;
  no state but ``lookback_days > 0`` → ``cursor >= as_of - lookback``; else
  full scan. ``>=`` re-reads the boundary row, so downstream must be
  idempotent (dedup/MERGE) — same contract as the reference;
- state update is **commit-then-state**: derive ``max(cursor)`` from the
  written batch and persist only after the sink commit succeeds (the
  reference updates state *during* extraction — postgres_extractor.py:317-328
  — which can skip rows on mid-job failure; we fix that, as SURVEY §4 notes);
- the state store is a JSON-file-per-(tenant, connector, object) directory,
  mirroring the reference layout; at cluster scale the same interface can be
  backed by a table.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def effective_cursor_start(
    last_value: Any | None,
    lookback_days: int = 0,
    as_of: _dt.datetime | None = None,
) -> Any | None:
    """Resolve the cursor lower bound per reference precedence.

    state present → state; else lookback window from ``as_of``; else None
    (full extract). ``as_of`` is injected (never ``now()`` inline) so plans
    stay deterministic and testable.
    """
    if last_value is not None:
        return last_value
    if lookback_days > 0:
        if as_of is None:
            as_of = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        return as_of - _dt.timedelta(days=lookback_days)
    return None


def cursor_predicate(cursor_field: str, start: Any | None) -> Column:
    """``cursor >= start`` as a pushdown-friendly Column (lit True if None)."""
    if start is None:
        return F.lit(True)
    return F.col(cursor_field) >= F.lit(start)


def cursor_filter(
    df: DataFrame,
    cursor_field: str,
    last_value: Any | None = None,
    lookback_days: int = 0,
    as_of: _dt.datetime | None = None,
) -> DataFrame:
    start = effective_cursor_start(last_value, lookback_days, as_of)
    return df.filter(cursor_predicate(cursor_field, start))


def state_update_frame(df: DataFrame, cursor_field: str) -> DataFrame:
    """One-row frame ``(last_value, n_records)`` — the next run's state.

    Replaces the reference's ORDER BY + take-last-row-of-last-batch with a
    partial-aggregated ``max`` (no sort, no single-threaded drain).
    """
    return df.agg(
        F.max(cursor_field).alias("last_value"),
        F.count(F.lit(1)).alias("n_records"),
    )


@dataclass
class StateKey:
    tenant_id: str
    connector_type: str
    object_name: str

    def filename(self) -> str:
        return f"{self.connector_type}.{self.object_name}.state.json"


class StateStore:
    """JSON-file state store: ``{root}/{tenant}/{type}.{object}.state.json``.

    Layout mirrors the reference's derivation (config.py:682-711). Values are
    stored ISO-formatted for timestamps, raw for scalars.
    """

    def __init__(self, root: str):
        self.root = root

    def _path(self, key: StateKey) -> str:
        return os.path.join(self.root, key.tenant_id, key.filename())

    def get(self, key: StateKey, cursor_field: str) -> Any | None:
        path = self._path(key)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            doc = json.load(fh)
        entry = doc.get(f"{key.object_name}.{cursor_field}")
        if not entry:
            return None
        value = entry.get("last_value")
        parsed = _maybe_parse_ts(value)
        return parsed if parsed is not None else value

    def set(self, key: StateKey, cursor_field: str, last_value: Any) -> None:
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        doc: dict[str, Any] = {}
        if os.path.exists(path):
            with open(path) as fh:
                doc = json.load(fh)
        if isinstance(last_value, (_dt.datetime, _dt.date)):
            last_value = last_value.isoformat()
        doc[f"{key.object_name}.{cursor_field}"] = {
            "last_value": last_value,
            "updated_at": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(doc, fh, indent=2)
        os.replace(tmp, path)  # atomic on POSIX

    def get_file_mtimes(self, key: StateKey) -> dict[str, float]:
        """Per-file modified-time map (reference ``file_<id>: last_modified``
        entries, validator.py:309-349)."""
        path = self._path(key)
        if not os.path.exists(path):
            return {}
        with open(path) as fh:
            doc = json.load(fh)
        return {
            k[len("file_"):]: v["last_modified"]
            for k, v in doc.items()
            if k.startswith("file_") and isinstance(v, dict)
        }

    def set_file_mtimes(self, key: StateKey, mtimes: dict[str, float]) -> None:
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        doc: dict[str, Any] = {}
        if os.path.exists(path):
            with open(path) as fh:
                doc = json.load(fh)
        now = _dt.datetime.now(_dt.timezone.utc).isoformat()
        for p, m in mtimes.items():
            doc[f"file_{p}"] = {"last_modified": m, "updated_at": now}
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(doc, fh, indent=2)
        os.replace(tmp, path)  # atomic on POSIX

    def get_engine_state(self, key: StateKey) -> dict[str, Any]:
        """Opaque engine (Airbyte/Singer) STATE blob for this object."""
        path = self._path(key)
        if not os.path.exists(path):
            return {}
        with open(path) as fh:
            doc = json.load(fh)
        return doc.get("engine_state", {})

    def merge_engine_state(self, key: StateKey, state: dict[str, Any]) -> None:
        """Merge an engine STATE message into the stored blob (reference
        engine_framework.py:254-303: read-update-write of the state file;
        here the update is atomic via tmp+rename like every other write)."""
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        doc: dict[str, Any] = {}
        if os.path.exists(path):
            with open(path) as fh:
                doc = json.load(fh)
        merged = doc.get("engine_state", {})
        merged.update(state)
        doc["engine_state"] = merged
        doc["engine_state_updated_at"] = _dt.datetime.now(
            _dt.timezone.utc).isoformat()
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(doc, fh, indent=2)
        os.replace(tmp, path)  # atomic on POSIX

    def commit_from(self, df: DataFrame, key: StateKey, cursor_field: str) -> Any | None:
        """Commit-then-state: persist max(cursor) of the *written* frame."""
        row = state_update_frame(df, cursor_field).collect()[0]
        if row["last_value"] is not None:
            self.set(key, cursor_field, row["last_value"])
        return row["last_value"]


def _maybe_parse_ts(value: Any) -> _dt.datetime | None:
    if not isinstance(value, str):
        return None
    try:
        return _dt.datetime.fromisoformat(value)
    except ValueError:
        return None


def file_mtime_filter(
    paths: list[tuple[str, float]],
    seen: dict[str, float],
) -> list[str]:
    """File-modified-time skip (reference: validator.py:309-349): keep paths
    whose mtime is newer than the recorded one. Driver-side listing diff —
    the Spark read then only opens changed files."""
    return [p for p, m in paths if m > seen.get(p, -1.0)]
