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
