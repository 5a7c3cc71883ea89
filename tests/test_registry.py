"""Connector registry: role, cloud-mode, and incremental gating."""

import pytest

from dativo_ingest_spark.config.contracts import ConfigError, JobConfig
from dativo_ingest_spark.config import registry


def _job(src_type="csv", inc=None, target_type="parquet"):
    return JobConfig.from_dict({
        "tenant_id": "acme",
        "source": {"type": src_type, "path": "/tmp/x",
                   **({"incremental": inc} if inc else {})},
        "target": {"type": target_type, "path": "/tmp/out"},
        "asset": {"name": "a", "schema": [{"name": "id", "type": "integer"}]},
    })


def test_unknown_connector_rejected():
    with pytest.raises(ConfigError, match="not found in registry"):
        registry.connector_spec("oracle_fusion")


def test_role_gating():
    assert registry.connector_spec("stripe", "source").category == "payments"
    with pytest.raises(ConfigError, match="does not support the 'target'"):
        registry.connector_spec("stripe", "target")
    with pytest.raises(ConfigError, match="does not support the 'source'"):
        registry.connector_spec("iceberg", "source")


def test_cloud_mode_blocks_database_connectors():
    pg = registry.connector_spec("postgres", "source")
    registry.validate_mode(pg, "self_hosted")  # fine
    with pytest.raises(ConfigError, match="not allowed in cloud mode"):
        registry.validate_mode(pg, "cloud")
    registry.validate_mode(registry.connector_spec("stripe"), "cloud")
    with pytest.raises(ConfigError, match="mode must be one of"):
        registry.validate_mode(pg, "staging")


def test_incremental_gating():
    spec = registry.connector_spec("csv")
    # matching file strategy passes
    registry.validate_incremental(spec, _job(inc={
        "enabled": True, "strategy": "file_modified_time"}))
    # cursor strategy without cursor_field fails
    hub = registry.connector_spec("hubspot")
    job = _job(inc={"enabled": True, "strategy": "updated_after"},
               src_type="hubspot")
    with pytest.raises(ConfigError, match="requires 'cursor_field'"):
        registry.validate_incremental(hub, job)
    # strategy differing from connector default (non-file) fails
    stripe = registry.connector_spec("stripe")
    with pytest.raises(ConfigError, match="does not match connector default"):
        registry.validate_incremental(stripe, _job(inc={
            "enabled": True, "strategy": "updated_after",
            "cursor_field": "x"}, src_type="hubspot"))
    # the generic column-cursor superset path needs only the field
    registry.validate_incremental(spec, _job(inc={
        "enabled": True, "strategy": "cursor", "cursor_field": "id"}))
    with pytest.raises(ConfigError, match="requires 'cursor_field'"):
        registry.validate_incremental(spec, _job(inc={
            "enabled": True, "strategy": "cursor"}))


def test_gate_job_end_to_end():
    registry.gate_job(_job(), mode="cloud")  # csv → parquet is cloud-safe
    with pytest.raises(ConfigError, match="not allowed in cloud mode"):
        registry.gate_job(_job(src_type="postgres"), mode="cloud")
    registry.gate_job(_job(src_type="postgres"), mode="self_hosted")
