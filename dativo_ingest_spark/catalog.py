"""Catalog metadata/lineage push (OpenMetadata/Glue/Unity/Nessie analogs).

Reference surface (``/root/reference/src/dativo_ingest/catalog/base.py:
29-278``; driver hook ``cli.py:1139-1205``): after a successful commit the
engine pushes (1) table metadata + derived tags, (2) source→target lineage,
(3) entity existence — and **catalog failures never fail the job**
(``cli.py:1194-1205``).

Driver-side REST calls in every real implementation; this module ships the
interface, the entity-derivation rules, a recording in-memory catalog (tests
/ dry-runs), and a generic JSON-over-HTTP pusher gated behind an import-try
(no network in this environment).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Any

from dativo_ingest_spark.config.contracts import JobConfig


@dataclass
class Entity:
    """Catalog entity reference: a source or target dataset."""

    kind: str           # e.g. "csv", "postgres", "parquet", "iceberg"
    name: str           # table/asset name
    namespace: str      # tenant / database / domain scope
    location: str | None = None

    @property
    def fqn(self) -> str:
        return f"{self.namespace}.{self.kind}.{self.name}"


def source_entity(job: JobConfig) -> Entity:
    """Reference ``catalog/base.py:88-189`` source-entity derivation."""
    return Entity(
        kind=job.source.type,
        name=job.asset.name,
        namespace=job.tenant_id,
        location=job.source.path,
    )


def target_entity(job: JobConfig) -> Entity:
    return Entity(
        kind=job.target.type,
        name=job.target.table or job.asset.name,
        namespace=job.target.branch or job.tenant_id,
        location=job.target.path,
    )


class BaseCatalog:
    """Interface: subclass per backend (OpenMetadata, Glue, Unity, Nessie)."""

    def ensure_entity_exists(self, entity: Entity) -> None:
        raise NotImplementedError

    def push_metadata(self, entity: Entity, properties: dict[str, str],
                      schema: list[dict[str, Any]] | None = None) -> None:
        raise NotImplementedError

    def push_lineage(self, source: Entity, target: Entity,
                     job_name: str | None = None) -> None:
        raise NotImplementedError


@dataclass
class RecordingCatalog(BaseCatalog):
    """In-memory catalog for tests and dry runs."""

    entities: list[str] = dc_field(default_factory=list)
    metadata: dict[str, dict[str, Any]] = dc_field(default_factory=dict)
    lineage: list[tuple[str, str]] = dc_field(default_factory=list)
    fail: bool = False  # simulate backend outage

    def ensure_entity_exists(self, entity: Entity) -> None:
        if self.fail:
            raise ConnectionError("catalog unavailable")
        if entity.fqn not in self.entities:
            self.entities.append(entity.fqn)

    def push_metadata(self, entity: Entity, properties: dict[str, str],
                      schema: list[dict[str, Any]] | None = None) -> None:
        if self.fail:
            raise ConnectionError("catalog unavailable")
        self.metadata[entity.fqn] = {"properties": dict(properties),
                                     "schema": list(schema or [])}

    def push_lineage(self, source: Entity, target: Entity,
                     job_name: str | None = None) -> None:
        if self.fail:
            raise ConnectionError("catalog unavailable")
        self.lineage.append((source.fqn, target.fqn))


class HttpJsonCatalog(BaseCatalog):
    """Generic JSON-over-HTTP backend: POSTs entity/metadata/lineage docs to
    ``{base_url}/entities|metadata|lineage``. Concrete backends override
    payload shaping; transport errors propagate and are swallowed by
    :func:`push_after_commit` (non-fatal contract)."""

    def __init__(self, base_url: str, token: str | None = None,
                 timeout_s: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.token = token
        self.timeout_s = timeout_s

    def _post(self, path: str, doc: dict[str, Any]) -> None:
        import urllib.request

        req = urllib.request.Request(
            f"{self.base_url}/{path}",
            data=json.dumps(doc).encode(),
            headers={"Content-Type": "application/json",
                     **({"Authorization": f"Bearer {self.token}"}
                        if self.token else {})},
        )
        urllib.request.urlopen(req, timeout=self.timeout_s).read()

    def ensure_entity_exists(self, entity: Entity) -> None:
        self._post("entities", {"fqn": entity.fqn, "kind": entity.kind,
                                "location": entity.location})

    def push_metadata(self, entity: Entity, properties: dict[str, str],
                      schema: list[dict[str, Any]] | None = None) -> None:
        self._post("metadata", {"fqn": entity.fqn, "properties": properties,
                                "schema": schema or []})

    def push_lineage(self, source: Entity, target: Entity,
                     job_name: str | None = None) -> None:
        self._post("lineage", {"from": source.fqn, "to": target.fqn,
                               "job": job_name})


def push_after_commit(
    catalog: BaseCatalog,
    job: JobConfig,
    properties: dict[str, str],
) -> dict[str, Any]:
    """Post-commit catalog hook: entities → metadata → lineage, each step
    individually non-fatal (reference ``cli.py:1194-1205``). Returns a
    status dict ``{step: "ok" | "error: ..."}`` for the job log."""
    src, dst = source_entity(job), target_entity(job)
    schema = [{"name": f.name, "type": f.type, "required": f.required}
              for f in job.asset.fields]
    status: dict[str, Any] = {}
    for step, call in (
        ("ensure_source", lambda: catalog.ensure_entity_exists(src)),
        ("ensure_target", lambda: catalog.ensure_entity_exists(dst)),
        ("metadata", lambda: catalog.push_metadata(dst, properties, schema)),
        ("lineage", lambda: catalog.push_lineage(src, dst, job.asset.name)),
    ):
        try:
            call()
            status[step] = "ok"
        except Exception as exc:  # non-fatal by contract
            status[step] = f"error: {exc}"
    return status
