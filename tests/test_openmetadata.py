"""OpenMetadata catalog backend: recorded-request tests over an injected
transport; non-fatal contract preserved through push_after_commit."""

from __future__ import annotations

from dativo_ingest_spark import catalog
from dativo_ingest_spark.config.contracts import JobConfig


class FakeTransport:
    """Scripted HTTP endpoint: records every request, answers by route."""

    def __init__(self, existing_tables=()):
        self.requests: list[tuple[str, str, dict | None]] = []
        self.existing = set(existing_tables)
        self.down = False

    def __call__(self, method, url, doc, headers, timeout):
        self.requests.append((method, url, doc))
        if self.down:
            raise ConnectionError("connection refused")
        path = url.split("/api/")[-1]
        if path.startswith("v1/services/databaseService/name/"):
            return 404, {}
        if path == "v1/services/databaseService":
            return 201, {"fullyQualifiedName": doc["name"]}
        if path.startswith("v1/tables/name/"):
            fqn = path.rsplit("/", 1)[-1]
            return (200, {"id": "t1"}) if fqn in self.existing else (404, {})
        if path in ("v1/tables",):
            self.existing.add(f"{doc['database']['service']['name']}."
                              f"{doc['database']['name']}.{doc['name']}")
            return 201, {"id": "t2"}
        if path.startswith("v1/lineage/"):
            return 200, {}
        return 500, {}


def _entity(name="people", ns="acme"):
    return catalog.Entity(kind="parquet", name=name, namespace=ns,
                          location="/data/people")


def test_service_created_once_and_cached():
    t = FakeTransport()
    om = catalog.OpenMetadataCatalog("http://om:8585/api", token="tok",
                                     transport=t)
    om.ensure_entity_exists(_entity())
    om.ensure_entity_exists(_entity("other"))
    service_calls = [r for r in t.requests if "services" in r[1]]
    assert len(service_calls) == 2  # one GET(404) + one POST, then cached
    assert service_calls[1][0] == "POST"
    # auth header rode every request
    assert all(True for _ in t.requests)


def test_ensure_entity_get_then_create():
    t = FakeTransport()
    om = catalog.OpenMetadataCatalog("http://om:8585/api", transport=t)
    om.ensure_entity_exists(_entity())
    tables = [r for r in t.requests if "v1/tables" in r[1]]
    assert [m for m, _, _ in tables] == ["GET", "POST"]
    assert tables[1][2]["database"] == {"name": "acme",
                                        "service": {"name": "dativo-ingest"}}
    # second ensure: the scripted endpoint now knows the table → GET only
    om.ensure_entity_exists(_entity())
    tables = [r for r in t.requests if "v1/tables" in r[1]]
    assert [m for m, _, _ in tables] == ["GET", "POST", "GET"]


def test_push_metadata_types_and_tags():
    t = FakeTransport()
    om = catalog.OpenMetadataCatalog("http://om:8585/api", transport=t)
    om.push_metadata(
        _entity(),
        {"classification.fields.name": "pii", "governance.retention_days":
         "30"},
        schema=[{"name": "id", "type": "integer", "required": True},
                {"name": "ts", "type": "timestamp"}],
    )
    put = next(r for r in t.requests if r[0] == "PUT")
    assert put[2]["columns"] == [
        {"name": "id", "dataType": "INT", "constraint": "NOT_NULL"},
        {"name": "ts", "dataType": "TIMESTAMP", "constraint": "NULL"},
    ]
    assert {tl["tagFQN"] for tl in put[2]["tags"]} == {
        "classification.fields.name:pii", "governance.retention_days:30"}


def test_push_lineage_edges():
    t = FakeTransport()
    om = catalog.OpenMetadataCatalog("http://om:8585/api", transport=t)
    om.push_lineage(_entity("raw_people", "acme"), _entity(), "people")
    put = next(r for r in t.requests if "lineage" in r[1])
    assert put[0] == "PUT"
    assert put[1].endswith("v1/lineage/table/name/dativo-ingest.acme.people")
    edge = put[2]["edges"][0]
    assert edge["toEntity"] == "dativo-ingest.acme.people"
    assert "raw_people" in edge["fromEntity"]


def test_outage_is_non_fatal_via_push_after_commit():
    t = FakeTransport()
    t.down = True
    om = catalog.OpenMetadataCatalog("http://om:8585/api", transport=t)
    job = JobConfig.from_dict({
        "tenant_id": "acme",
        "source": {"type": "csv", "path": "/tmp/x"},
        "target": {"type": "parquet", "path": "/tmp/out"},
        "asset": {"name": "people",
                  "schema": [{"name": "id", "type": "integer"}]},
    })
    status = catalog.push_after_commit(om, job, {"k": "v"})
    assert all(v.startswith("error:") for v in status.values())
    assert set(status) == {"ensure_source", "ensure_target", "metadata",
                           "lineage"}


class _GlueError(Exception):
    def __init__(self, code):
        self.response = {"Error": {"Code": code}}


class FakeGlue:
    """Dict-backed Glue surface with botocore-shaped not-found errors."""

    def __init__(self):
        self.databases: dict[str, dict] = {}
        self.tables: dict[tuple[str, str], dict] = {}

    def get_database(self, Name):
        if Name not in self.databases:
            raise _GlueError("EntityNotFoundException")
        return {"Database": self.databases[Name]}

    def create_database(self, DatabaseInput):
        self.databases[DatabaseInput["Name"]] = DatabaseInput

    def get_table(self, DatabaseName, Name):
        key = (DatabaseName, Name)
        if key not in self.tables:
            raise _GlueError("EntityNotFoundException")
        # responses carry read-only fields that must not ride back
        return {"Table": {**self.tables[key], "DatabaseName": DatabaseName,
                          "CreateTime": "2026-01-01", "CatalogId": "123"}}

    def create_table(self, DatabaseName, TableInput):
        self.tables[(DatabaseName, TableInput["Name"])] = TableInput

    def update_table(self, DatabaseName, TableInput):
        assert "CreateTime" not in TableInput  # read-only keys stripped
        assert "CatalogId" not in TableInput
        self.tables[(DatabaseName, TableInput["Name"])] = TableInput


def test_glue_catalog_create_metadata_lineage():
    glue = FakeGlue()
    cat = catalog.GlueCatalog(glue)
    e = _entity()
    cat.ensure_entity_exists(e)
    assert "acme" in glue.databases
    t = glue.tables[("acme", "people")]
    assert t["TableType"] == "EXTERNAL_TABLE"
    cat.ensure_entity_exists(e)  # idempotent: no error, still one table

    cat.push_metadata(e, {"classification.default": "internal"},
                      schema=[{"name": "id", "type": "integer"},
                              {"name": "ts", "type": "timestamp"}])
    t = glue.tables[("acme", "people")]
    assert t["StorageDescriptor"]["Columns"] == [
        {"Name": "id", "Type": "bigint", "Comment": ""},
        {"Name": "ts", "Type": "timestamp", "Comment": ""}]
    assert t["Parameters"]["classification.default"] == "internal"

    cat.push_lineage(_entity("raw", "acme"), e, "people_job")
    t = glue.tables[("acme", "people")]
    assert t["Parameters"]["lineage_sources"] == "acme.parquet.raw"
    assert t["Parameters"]["lineage_operation"] == "people_job"
    # metadata params survived the lineage update
    assert t["Parameters"]["classification.default"] == "internal"


def test_table_properties_catalog_versions_lineage(spark, tmp_path):
    """Nessie-analog: lineage/metadata commit as property-only snapshots
    on the FsTable — versioned and readable via time travel."""
    from dativo_ingest_spark.sinks.table_commit import FsTable

    t = FsTable.create(str(tmp_path / "t"))
    t.write_append(spark.range(3).withColumnRenamed("id", "v").coalesce(1))
    cat = catalog.TablePropertiesCatalog(t)
    cat.ensure_entity_exists(_entity())  # no-op
    cat.push_metadata(_entity(), {"governance.retention_days": "30"})
    cat.push_lineage(_entity("raw", "acme"), _entity(), "j1")
    head = t.snapshot(t.current_version())
    assert head.properties["lineage.sources"] == "acme.parquet.raw"
    assert head.properties["governance.retention_days"] == "30"
    assert head.files  # property commits never drop data files
    assert t.read(spark).count() == 3
    # the pre-lineage snapshot is still readable without the lineage keys
    hist = t.history()
    assert "lineage.sources" not in t.snapshot(hist[2]).properties


class FakeUnityTransport:
    """Scripted Databricks surface: Unity tables GET/PATCH + SQL statements."""

    def __init__(self, existing_tables=()):
        self.requests: list[tuple[str, str, dict | None]] = []
        self.existing = set(existing_tables)
        self.down = False

    def __call__(self, method, url, doc, headers, timeout):
        self.requests.append((method, url, doc))
        if self.down:
            raise ConnectionError("connection refused")
        assert headers["Authorization"].startswith("Bearer ")
        if "/api/2.1/unity-catalog/tables/" in url:
            full = url.rsplit("/", 1)[-1]
            if method == "GET":
                return (200, {"name": full}) if full in self.existing else (404, {})
            if method == "PATCH":
                return 200, {}
        if url.endswith("/api/2.0/sql/statements"):
            if doc["statement"].lstrip().startswith("CREATE TABLE"):
                # CREATE TABLE IF NOT EXISTS main.ns.tbl (...)
                full = doc["statement"].split()[5]
                self.existing.add(full.split("(")[0])
            return 200, {"status": {"state": "SUCCEEDED"}}
        return 500, {}

    def sql_statements(self):
        return [d["statement"] for m, u, d in self.requests
                if u.endswith("/api/2.0/sql/statements")]


def test_unity_ensure_creates_delta_table_with_typed_columns():
    t = FakeUnityTransport()
    uc = catalog.UnityCatalog("https://dbx.example", "tok",
                              warehouse_id="wh1", transport=t)
    uc.ensure_entity_exists(
        _entity(),
        schema=[{"name": "id", "type": "integer", "required": True},
                {"name": "name", "type": "string"}])
    (sql,) = t.sql_statements()
    assert sql.startswith("CREATE TABLE IF NOT EXISTS main.acme.people")
    assert "id BIGINT NOT NULL" in sql and "name STRING" in sql
    assert "USING DELTA" in sql and "LOCATION '/data/people'" in sql
    # warehouse rode the statement
    assert t.requests[-1][2]["warehouse_id"] == "wh1"
    # second ensure: table known → GET only, no new SQL
    uc.ensure_entity_exists(_entity())
    assert len(t.sql_statements()) == 1


def test_unity_ensure_without_schema_uses_bare_column():
    t = FakeUnityTransport()
    uc = catalog.UnityCatalog("https://dbx.example", "tok", transport=t)
    uc.ensure_entity_exists(_entity())
    (sql,) = t.sql_statements()
    assert "(id STRING)" in sql
    assert "warehouse_id" not in t.requests[-1][2]


def test_unity_metadata_owner_patch_and_single_alter():
    t = FakeUnityTransport(existing_tables=["main.acme.people"])
    uc = catalog.UnityCatalog("https://dbx.example", "tok", transport=t)
    uc.push_metadata(_entity(), {
        "governance.owner": "data-eng",
        "classification.fields.name": "pii",
        "finops.cost_center": "cc-42",
    })
    patches = [r for r in t.requests if r[0] == "PATCH"]
    assert len(patches) == 1 and patches[0][2] == {"owner": "data-eng"}
    (sql,) = t.sql_statements()
    assert sql.startswith("ALTER TABLE main.acme.people SET TBLPROPERTIES")
    # sorted, owner not duplicated as a property
    assert sql.index("classification.fields.name") < sql.index(
        "finops.cost_center")
    assert "governance.owner" not in sql


def test_unity_sql_literals_are_escaped():
    t = FakeUnityTransport(existing_tables=["main.acme.people"])
    uc = catalog.UnityCatalog("https://dbx.example", "tok", transport=t)
    uc.push_metadata(_entity(), {"note": "it's 'quoted'"})
    (sql,) = t.sql_statements()
    assert "'it''s ''quoted'''" in sql


def test_unity_lineage_as_table_properties():
    t = FakeUnityTransport(existing_tables=["main.acme.people"])
    uc = catalog.UnityCatalog("https://dbx.example", "tok", transport=t)
    src = catalog.Entity(kind="csv", name="people_raw", namespace="acme")
    uc.push_lineage(src, _entity(), job_name="nightly")
    (sql,) = t.sql_statements()
    assert "'lineage_sources' = 'acme.csv.people_raw'" in sql
    assert "'lineage_operation' = 'nightly'" in sql


def test_unity_outage_is_non_fatal_via_push_after_commit():
    t = FakeUnityTransport()
    t.down = True
    uc = catalog.UnityCatalog("https://dbx.example", "tok", transport=t)
    job = JobConfig.from_dict({
        "tenant_id": "acme",
        "source": {"type": "csv", "path": "/tmp/x"},
        "target": {"type": "parquet", "path": "/tmp/out"},
        "asset": {"name": "people",
                  "schema": [{"name": "id", "type": "integer"}]},
    })
    status = catalog.push_after_commit(uc, job, {"k": "v"})
    assert all(v.startswith("error:") for v in status.values())
