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


#: contract type → OpenMetadata column dataType
#: (reference catalog/openmetadata.py:176-196)
_OM_TYPES = {
    "string": "STRING", "integer": "INT", "float": "FLOAT",
    "double": "DOUBLE", "boolean": "BOOLEAN", "timestamp": "TIMESTAMP",
    "datetime": "TIMESTAMP", "date": "DATE",
}


def _urllib_transport(method: str, url: str, doc: dict | None,
                      headers: dict, timeout: float) -> tuple[int, dict]:
    """Default HTTP transport (no requests dependency in this env)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url, method=method,
        data=json.dumps(doc).encode() if doc is not None else None,
        headers=headers,
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
            return resp.status, json.loads(body) if body else {}
    except urllib.error.HTTPError as e:
        return e.code, {}


class OpenMetadataCatalog(BaseCatalog):
    """OpenMetadata REST backend (reference ``catalog/openmetadata.py``,
    352 LoC): get-or-create database service → table entities under
    ``{service}.{database}.{table}`` FQNs → columns typed via the contract
    mapping with NOT_NULL constraints → table tags from properties →
    lineage edges PUT at the target table.

    ``transport`` is injectable (``(method, url, json, headers, timeout) →
    (status, body)``) — tests record the exact request sequence; production
    uses the stdlib urllib transport. All errors propagate and are
    swallowed by :func:`push_after_commit` (the reference's non-fatal
    contract, cli.py:1194-1205)."""

    def __init__(self, api_url: str, token: str | None = None,
                 service_name: str = "dativo-ingest",
                 transport=None, timeout_s: float = 10.0):
        self.api_url = api_url.rstrip("/")
        self.service_name = service_name
        self.timeout_s = timeout_s
        self._transport = transport or _urllib_transport
        self.headers = {"Content-Type": "application/json",
                        **({"Authorization": f"Bearer {token}"}
                           if token else {})}
        self._service_fqn: str | None = None

    def _call(self, method: str, path: str,
              doc: dict | None = None) -> tuple[int, dict]:
        return self._transport(method, f"{self.api_url}/{path}", doc,
                               self.headers, self.timeout_s)

    def _service(self) -> str:
        """Get-or-create the database service, cached per catalog instance
        (reference :49-93)."""
        if self._service_fqn:
            return self._service_fqn
        status, body = self._call(
            "GET", f"v1/services/databaseService/name/{self.service_name}")
        if status != 200:
            status, body = self._call(
                "POST", "v1/services/databaseService",
                {"name": self.service_name,
                 "serviceType": "CustomDatabase"})
            if status not in (200, 201):
                raise ConnectionError(
                    f"service create failed with HTTP {status}")
        self._service_fqn = body.get("fullyQualifiedName", self.service_name)
        return self._service_fqn

    def _fqn(self, entity: Entity) -> str:
        return f"{self._service()}.{entity.namespace}.{entity.name}"

    def ensure_entity_exists(self, entity: Entity) -> None:
        """GET by name; POST a bare table when absent (reference :95-174 —
        columns arrive with push_metadata)."""
        fqn = self._fqn(entity)
        status, _ = self._call("GET", f"v1/tables/name/{fqn}")
        if status == 200:
            return
        status, _ = self._call("POST", "v1/tables", {
            "name": entity.name,
            "database": {"name": entity.namespace,
                         "service": {"name": self._service()}},
            "tableType": "Regular",
        })
        if status not in (200, 201):
            raise ConnectionError(f"table create failed with HTTP {status}")

    def push_metadata(self, entity: Entity, properties: dict[str, str],
                      schema: list[dict[str, Any]] | None = None) -> None:
        """createOrUpdate with typed columns + properties as classification
        tag labels ``key:value`` (reference :197-290)."""
        columns = [
            {"name": f["name"],
             "dataType": _OM_TYPES.get(str(f.get("type", "string")).lower(),
                                       "STRING"),
             "constraint": "NOT_NULL" if f.get("required") else "NULL"}
            for f in (schema or [])
        ]
        tag_labels = [{"tagFQN": f"{k}:{v}", "source": "Classification"}
                      for k, v in sorted(properties.items())]
        status, _ = self._call("PUT", "v1/tables", {
            "name": entity.name,
            "database": {"name": entity.namespace,
                         "service": {"name": self._service()}},
            "columns": columns,
            "tags": tag_labels,
        })
        if status not in (200, 201):
            raise ConnectionError(f"metadata push failed with HTTP {status}")

    def push_lineage(self, source: Entity, target: Entity,
                     job_name: str | None = None) -> None:
        """Edge list PUT at the target table (reference :292-350)."""
        target_fqn = self._fqn(target)
        status, _ = self._call(
            "PUT", f"v1/lineage/table/name/{target_fqn}",
            {"description": f"Lineage from {job_name or 'ingest'}",
             "edges": [{"fromEntity": source.fqn, "toEntity": target_fqn,
                        "description": f"{job_name or 'ingest'} operation"}]},
        )
        if status not in (200, 201):
            raise ConnectionError(f"lineage push failed with HTTP {status}")


#: contract type → Glue/Hive data type (reference catalog/aws_glue.py:153-172)
_GLUE_TYPES = {
    "string": "string", "integer": "bigint", "float": "float",
    "double": "double", "boolean": "boolean", "timestamp": "timestamp",
    "datetime": "timestamp", "date": "date",
}

#: Glue Table-response keys that are read-only and must not ride back into
#: TableInput on update (reference aws_glue.py:174-208)
_GLUE_READONLY = {
    "DatabaseName", "CreateTime", "UpdateTime", "CreatedBy",
    "IsRegisteredWithLakeFormation", "CatalogId", "VersionId",
}


def _glue_not_found(exc: Exception) -> bool:
    """botocore ClientError duck-check (no boto3 in this environment)."""
    resp = getattr(exc, "response", None)
    return bool(resp) and resp.get("Error", {}).get(
        "Code") == "EntityNotFoundException"


class GlueCatalog(BaseCatalog):
    """AWS Glue Data Catalog backend (reference ``catalog/aws_glue.py``,
    316 LoC): database get-or-create, EXTERNAL parquet tables with typed
    columns, metadata in table Parameters, lineage in
    ``lineage_sources``/``lineage_operation`` parameters (Glue has no
    native lineage). The client is injectable (boto3's ``client("glue")``
    surface: get_database/create_database/get_table/create_table/
    update_table); errors propagate and are swallowed by
    :func:`push_after_commit`."""

    def __init__(self, client):
        self.client = client

    def _ensure_database(self, name: str) -> None:
        try:
            self.client.get_database(Name=name)
        except Exception as e:
            if not _glue_not_found(e):
                raise
            self.client.create_database(
                DatabaseInput={"Name": name,
                               "Description": f"Database for {name}"})

    def ensure_entity_exists(self, entity: Entity) -> None:
        self._ensure_database(entity.namespace)
        try:
            self.client.get_table(DatabaseName=entity.namespace,
                                  Name=entity.name)
            return
        except Exception as e:
            if not _glue_not_found(e):
                raise
        self.client.create_table(
            DatabaseName=entity.namespace,
            TableInput={
                "Name": entity.name,
                "TableType": "EXTERNAL_TABLE",
                "StorageDescriptor": {
                    "Location": entity.location or "",
                    "SerdeInfo": {"SerializationLibrary":
                                  "org.apache.hadoop.hive.ql.io.parquet."
                                  "serde.ParquetHiveSerDe"},
                },
                "Parameters": {},
            },
        )

    def _table_input(self, database: str, name: str) -> dict[str, Any]:
        table = self.client.get_table(DatabaseName=database,
                                      Name=name)["Table"]
        return {k: v for k, v in table.items() if k not in _GLUE_READONLY}

    def push_metadata(self, entity: Entity, properties: dict[str, str],
                      schema: list[dict[str, Any]] | None = None) -> None:
        ti = self._table_input(entity.namespace, entity.name)
        if schema:
            ti.setdefault("StorageDescriptor", {})["Columns"] = [
                {"Name": f["name"],
                 "Type": _GLUE_TYPES.get(
                     str(f.get("type", "string")).lower(), "string"),
                 "Comment": f.get("description") or ""}
                for f in schema
            ]
        ti["Parameters"] = {**ti.get("Parameters", {}), **properties}
        self.client.update_table(DatabaseName=entity.namespace,
                                 TableInput=ti)

    def push_lineage(self, source: Entity, target: Entity,
                     job_name: str | None = None) -> None:
        ti = self._table_input(target.namespace, target.name)
        ti["Parameters"] = {
            **ti.get("Parameters", {}),
            "lineage_sources": source.fqn,
            "lineage_operation": job_name or "ingest",
        }
        self.client.update_table(DatabaseName=target.namespace,
                                 TableInput=ti)


#: contract type → Databricks SQL data type (reference
#: catalog/databricks_unity.py:148-159)
_UNITY_TYPES = {
    "string": "STRING", "integer": "BIGINT", "float": "FLOAT",
    "double": "DOUBLE", "boolean": "BOOLEAN", "timestamp": "TIMESTAMP",
    "datetime": "TIMESTAMP", "date": "DATE",
}


def _sql_str(value: str | None) -> str:
    """SQL string-literal escape: double the single quotes (reference
    databricks_unity.py:124-138 — user-controlled values reach ALTER/CREATE
    statements as literals)."""
    return "" if value is None else str(value).replace("'", "''")


class UnityCatalog(BaseCatalog):
    """Databricks Unity Catalog backend (reference
    ``catalog/databricks_unity.py``, 300 LoC). Two API surfaces, as in the
    reference: the Unity REST tables endpoint (existence GET, owner PATCH)
    and the SQL-statements endpoint for everything DDL-shaped —
    ``CREATE TABLE IF NOT EXISTS ... USING DELTA`` with contract-typed
    columns, ``ALTER TABLE ... SET TBLPROPERTIES`` for metadata, and
    lineage recorded as ``lineage_sources``/``lineage_operation``
    properties (Unity's own lineage graph is workflow-managed, so the
    reference stores edges as table properties — mirrored here).

    ``transport`` is injectable exactly like :class:`OpenMetadataCatalog`;
    tests record the request sequence including the generated SQL text.
    Errors propagate and are swallowed by :func:`push_after_commit`."""

    def __init__(self, workspace_url: str, access_token: str,
                 catalog: str = "main", warehouse_id: str | None = None,
                 transport=None, timeout_s: float = 10.0):
        if not workspace_url or not access_token:
            raise ValueError(
                "Unity catalog needs workspace_url and access_token")
        self.workspace_url = workspace_url.rstrip("/")
        self.catalog = catalog
        self.warehouse_id = warehouse_id
        self.timeout_s = timeout_s
        self._transport = transport or _urllib_transport
        self.headers = {"Content-Type": "application/json",
                        "Authorization": f"Bearer {access_token}"}

    def _call(self, method: str, path: str,
              doc: dict | None = None) -> tuple[int, dict]:
        return self._transport(method, f"{self.workspace_url}/{path}", doc,
                               self.headers, self.timeout_s)

    def _sql(self, statement: str) -> None:
        doc: dict[str, Any] = {"statement": statement}
        if self.warehouse_id:
            doc["warehouse_id"] = self.warehouse_id
        status, _ = self._call("POST", "api/2.0/sql/statements", doc)
        if status not in (200, 201):
            raise ConnectionError(f"SQL statement failed with HTTP {status}")

    def _full_name(self, entity: Entity) -> str:
        return f"{self.catalog}.{entity.namespace}.{entity.name}"

    def ensure_entity_exists(
            self, entity: Entity,
            schema: list[dict[str, Any]] | None = None) -> None:
        """GET the three-level name; absent ⇒ CREATE TABLE IF NOT EXISTS
        USING DELTA [LOCATION] (reference :49-122; bare ``id string``
        column when no contract schema is at hand, as the reference does)."""
        full = self._full_name(entity)
        status, _ = self._call(
            "GET", f"api/2.1/unity-catalog/tables/{full}")
        if status == 200:
            return
        cols = ", ".join(
            f"{f['name']} "
            f"{_UNITY_TYPES.get(str(f.get('type', 'string')).lower(), 'STRING')}"
            f"{' NOT NULL' if f.get('required') else ''}"
            for f in (schema or [])
        ) or "id STRING"
        location = (f" LOCATION '{_sql_str(entity.location)}'"
                    if entity.location else "")
        self._sql(f"CREATE TABLE IF NOT EXISTS {full} ({cols})"
                  f" USING DELTA{location}")

    def push_metadata(self, entity: Entity, properties: dict[str, str],
                      schema: list[dict[str, Any]] | None = None) -> None:
        """One ALTER ... SET TBLPROPERTIES with every property (sorted for
        deterministic statements); ``owner`` property becomes the PATCH the
        reference sends (:190-201)."""
        full = self._full_name(entity)
        props = dict(properties)
        owner = props.pop("governance.owner", None)
        if owner:
            self._call("PATCH",
                       f"api/2.1/unity-catalog/tables/{full}",
                       {"owner": owner})
        if props:
            pairs = ", ".join(
                f"'{_sql_str(k)}' = '{_sql_str(v)}'"
                for k, v in sorted(props.items()))
            self._sql(f"ALTER TABLE {full} SET TBLPROPERTIES ({pairs})")

    def push_lineage(self, source: Entity, target: Entity,
                     job_name: str | None = None) -> None:
        full = self._full_name(target)
        self._sql(
            f"ALTER TABLE {full} SET TBLPROPERTIES ("
            f"'lineage_sources' = '{_sql_str(source.fqn)}', "
            f"'lineage_operation' = '{_sql_str(job_name or 'ingest')}')")


class TablePropertiesCatalog(BaseCatalog):
    """Nessie-analog backend (reference ``catalog/nessie.py``: "lineage is
    stored in Iceberg table properties" — table existence belongs to the
    committer): metadata and lineage commit as property-only snapshots on
    the target :class:`~dativo_ingest_spark.sinks.table_commit.FsTable`,
    so the lineage record is versioned, branch-scoped, and time-travels
    with the data it describes."""

    def __init__(self, table, branch: str = "main"):
        self.table = table
        self.branch = branch

    def ensure_entity_exists(self, entity: Entity) -> None:
        return  # the snapshot commit created the table (reference :32-56)

    def push_metadata(self, entity: Entity, properties: dict[str, str],
                      schema: list[dict[str, Any]] | None = None) -> None:
        self.table.add_files([], operation="append", branch=self.branch,
                             properties=dict(properties))

    def push_lineage(self, source: Entity, target: Entity,
                     job_name: str | None = None) -> None:
        # reference nessie.py:108-118 lineage_info keys
        self.table.add_files([], operation="append", branch=self.branch,
                             properties={
                                 "lineage.sources": source.fqn,
                                 "lineage.operation": job_name or "ingest",
                                 "lineage.target": target.fqn,
                             })


def push_after_commit(
    catalog: BaseCatalog,
    job: JobConfig,
    properties: dict[str, str],
    source_tags: dict[str, str] | None = None,
) -> dict[str, Any]:
    """Post-commit catalog hook: entities → metadata → lineage, each step
    individually non-fatal (reference ``cli.py:1194-1205``). Returns a
    status dict ``{step: "ok" | "error: ..."}`` for the job log.
    ``source_tags`` (e.g. CSV header columns marked ``"column"``, JDBC
    comment tags) attach to the *source* entity as structural metadata."""
    src, dst = source_entity(job), target_entity(job)
    schema = [{"name": f.name, "type": f.type, "required": f.required}
              for f in job.asset.fields]
    steps = [
        ("ensure_source", lambda: catalog.ensure_entity_exists(src)),
        ("ensure_target", lambda: catalog.ensure_entity_exists(dst)),
        ("metadata", lambda: catalog.push_metadata(dst, properties, schema)),
        ("lineage", lambda: catalog.push_lineage(src, dst, job.asset.name)),
    ]
    if source_tags:
        steps.insert(2, ("source_metadata",
                         lambda: catalog.push_metadata(src, source_tags)))
    status: dict[str, Any] = {}
    for step, call in steps:
        try:
            call()
            status[step] = "ok"
        except Exception as exc:  # non-fatal by contract
            status[step] = f"error: {exc}"
    return status
