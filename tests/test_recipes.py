"""Connector recipes: reference merge semantics (config.py:625-710) —
incremental disabled unless the job enables it, {} explicitly disables,
enabling merges recipe defaults, job options override recipe defaults."""

from __future__ import annotations

import os

import pytest
import yaml

from dativo_ingest_spark.config import recipes
from dativo_ingest_spark.config.contracts import ConfigError, JobConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _job(tmp_path, source=None, extra=None):
    doc = {
        "tenant_id": "t",
        "source_connector_path": os.path.join(REPO, "connectors", "csv.yaml"),
        "source": {"path": str(tmp_path / "*.csv"), **(source or {})},
        "target": {"type": "parquet", "path": str(tmp_path / "out")},
        "asset": {"name": "a", "schema": [{"name": "id", "type": "integer"}]},
        **(extra or {}),
    }
    return doc


def test_shipped_recipes_parse():
    for name in os.listdir(os.path.join(REPO, "connectors")):
        r = recipes.load_recipe(os.path.join(REPO, "connectors", name))
        assert r.type and r.roles


def test_recipe_supplies_type_and_option_defaults(tmp_path):
    job = JobConfig.from_dict(_job(tmp_path))
    assert job.source.type == "csv"
    assert job.source.options["header"] == "true"   # recipe default
    # incremental NOT enabled by the recipe alone
    assert not job.source.incremental.enabled


def test_job_enables_incremental_and_inherits_defaults(tmp_path):
    job = JobConfig.from_dict(_job(tmp_path, source={"incremental": {"enabled": True}}))
    inc = job.source.incremental
    assert inc.enabled
    assert inc.strategy == "file_modified_time"     # recipe default
    assert inc.lookback_days == 0


def test_empty_dict_explicitly_disables(tmp_path):
    job = JobConfig.from_dict(_job(tmp_path, source={"incremental": {}}))
    assert not job.source.incremental.enabled


def test_job_options_override_recipe_defaults(tmp_path):
    job = JobConfig.from_dict(
        _job(tmp_path, source={"options": {"header": "false", "sep": ";"}}))
    assert job.source.options["header"] == "false"  # job wins
    assert job.source.options["sep"] == ";"
    assert job.source.options["encoding"] == "UTF-8"  # recipe keeps the rest


def test_connection_template_env_expansion(tmp_path, monkeypatch):
    monkeypatch.setenv("PGHOST", "db.example")
    r = recipes.load_recipe(os.path.join(REPO, "connectors", "postgres.yaml"))
    assert r.option_defaults["host"] == "db.example"
    assert r.option_defaults["credentials_type"] == "basic"
    assert r.incremental_defaults == {
        "strategy": "updated_at", "cursor_field": "updated_at",
        "lookback_days": 1}


def test_role_and_missing_file_errors(tmp_path):
    doc = _job(tmp_path)
    doc["source_connector_path"] = os.path.join(REPO, "connectors",
                                                "postgres.yaml")
    # postgres recipe has only the source role; using it as target fails
    doc["target_connector_path"] = doc["source_connector_path"]
    with pytest.raises(ConfigError, match="target role"):
        JobConfig.from_dict(doc)
    doc2 = _job(tmp_path)
    doc2["source_connector_path"] = "/nope/missing.yaml"
    with pytest.raises(ConfigError, match="not found"):
        JobConfig.from_dict(doc2)


def test_target_recipe_merges(tmp_path):
    doc = _job(tmp_path, extra={
        "target_connector_path": os.path.join(REPO, "connectors",
                                              "parquet_table.yaml"),
    })
    doc["target"] = {"path": str(tmp_path / "out")}
    job = JobConfig.from_dict(doc)
    assert job.target.type == "parquet"
    assert job.target.options["commit"] == "table"  # recipe default


def test_recipe_job_runs_end_to_end(spark, tmp_path):
    (tmp_path / "d.csv").write_text("id\n1\n2\n")
    from dativo_ingest_spark import runner

    doc = _job(tmp_path)
    res = runner.run_job(spark, JobConfig.from_dict(doc))
    assert res.exit_code == 0
    assert spark.read.parquet(str(tmp_path / "out")).count() == 2


def test_reference_shaped_recipe_loads(tmp_path):
    # a recipe written for the reference engine (meltano engine block,
    # nested tap_config) loads; engine internals carry into options
    p = tmp_path / "ref_pg.yaml"
    p.write_text(yaml.safe_dump({
        "name": "postgres", "type": "postgres", "roles": ["source", "target"],
        "default_engine": {"type": "meltano", "options": {"meltano": {
            "tap": "tap-postgres", "tap_config": {"replication_method":
                                                  "INCREMENTAL"}}}},
        "credentials": {"type": "basic",
                        "file_template": "/secrets/{tenant}/postgres.env"},
        "incremental": {"strategy": "updated_at",
                        "cursor_field_default": "updated_at",
                        "lookback_days_default": 1},
    }))
    r = recipes.load_recipe(str(p))
    assert r.option_defaults["tap"] == "tap-postgres"
    assert r.incremental_defaults["cursor_field"] == "updated_at"


def test_registry_coverage_every_connector_has_a_recipe():
    """A user copying a reference job that names any registry connector
    (``source_connector_path: connectors/stripe.yaml`` etc.) must find a
    shipped recipe file whose type and roles agree with the capability
    registry — the round-7 gap: code existed for every source but only
    five recipe files shipped."""
    from dativo_ingest_spark.config import registry

    shipped = {}
    for name in os.listdir(os.path.join(REPO, "connectors")):
        r = recipes.load_recipe(os.path.join(REPO, "connectors", name))
        shipped[r.type] = r
    # custom_python/derby/jdbc are code-level types a job configures
    # inline (no recipe file is meaningful for them)
    expected = set(registry.CONNECTORS) - {"custom_python", "derby", "jdbc"}
    missing = expected - set(shipped)
    assert not missing, f"registry types without a recipe file: {missing}"
    for t in expected:
        spec = registry.CONNECTORS[t]
        assert set(shipped[t].roles) <= set(spec.roles), (
            t, shipped[t].roles, spec.roles)


def test_airbyte_recipe_feeds_engine_config():
    """The stripe recipe's engine options must flow through
    build_engine_config exactly like the reference's recipe vocabulary:
    streams default from the recipe, start_date carried, api key from the
    declared env var convention."""
    from dativo_ingest_spark.config import registry
    from dativo_ingest_spark.sources import engines

    r = recipes.load_recipe(os.path.join(REPO, "connectors", "stripe.yaml"))
    assert r.option_defaults["docker_image"] == "airbyte/source-stripe:2.1.5"
    # the structured credentials block survives recipe flattening — the
    # engine layer resolves from_env from it
    assert r.option_defaults["credentials"]["from_env"] == "STRIPE_API_KEY"
    cfg = engines.build_engine_config(
        registry.CONNECTORS["stripe"], dict(r.option_defaults),
        env={"STRIPE_API_KEY": "sk_test"})
    assert cfg["streams"] == ["customers", "charges", "invoices"]
    assert cfg["start_date"] == "2024-01-01"
    assert cfg["api_key"] == "sk_test"
