"""Opt-in JSON-schema validation of job YAML (reference config.py:291-337:
validate_against_schema + the validate_schema opt-in flag, exit 2 at parse).
"""

from __future__ import annotations

import pytest
import yaml

from dativo_ingest_spark import runner
from dativo_ingest_spark.config import schema_validation
from dativo_ingest_spark.config.contracts import ConfigError, JobConfig

VALID = {
    "tenant_id": "acme",
    "source": {"type": "csv", "path": "/data/*.csv",
               "incremental": {"enabled": True,
                               "strategy": "file_modified_time",
                               "cursor_field": "updated_at",
                               "lookback_days": 3}},
    "target": {"type": "parquet", "path": "/out",
               "partition_by": ["dt"], "target_file_size_mb": 150},
    "asset": {"name": "contacts", "schema": [
        {"name": "id", "type": "integer", "required": True},
        {"name": "email", "type": "string", "classification": "pii"},
    ]},
    "schema_validation_mode": "warn",
}


def test_valid_config_passes():
    schema_validation.validate_job_dict(VALID)  # no raise


def test_violations_listed_with_pointers():
    bad = {
        "tenant_id": "",                     # minLength 1
        "source": {"path": "/x"},            # missing type
        "target": {"target_file_size_mb": 0},  # minimum 1
        "asset": {"name": "a", "schema": []},  # minItems 1
        "schema_validation_mode": "loose",   # enum
    }
    with pytest.raises(ConfigError) as exc:
        schema_validation.validate_job_dict(bad)
    msg = str(exc.value)
    assert "/tenant_id" in msg
    assert "/source" in msg
    assert "/target/target_file_size_mb" in msg
    assert "/asset/schema" in msg or "/asset" in msg
    assert "/schema_validation_mode" in msg
    assert "violation" in msg


def test_markdown_kv_storage_shapes_rejected():
    """The reference's own fixture shapes: bad mode, bad structured_pattern,
    bad file_extension (config.py:419-443 validation rules)."""
    for block in (
        {"mode": "nope"},
        {"mode": "structured", "structured_pattern": "zigzag"},
        {"mode": "raw_file", "file_extension": ".txt"},
    ):
        doc = dict(VALID)
        doc["source"] = {"type": "markdown_kv", "path": "/d/*.md",
                         "options": {"markdown_kv_storage": block}}
        with pytest.raises(ConfigError, match="markdown_kv_storage"):
            schema_validation.validate_job_dict(doc)
    # every valid combination passes
    doc = dict(VALID)
    doc["source"] = {"type": "markdown_kv", "path": "/d/*.md",
                     "options": {"markdown_kv_storage": {
                         "mode": "structured",
                         "structured_pattern": "hybrid"}}}
    schema_validation.validate_job_dict(doc)


def test_opt_in_flag_and_self_declared_schema(tmp_path):
    bad = dict(VALID)
    bad = {**VALID, "schema_validation_mode": "loose"}
    p = tmp_path / "job.yaml"
    p.write_text(yaml.dump(bad))
    # default OFF: schema violations surface via dataclass checks only
    # (this one happens to be caught there too, so use a schema-only flaw)
    shape_only = {**VALID,
                  "target": {**VALID["target"], "target_file_size_mb": 0}}
    p2 = tmp_path / "job2.yaml"
    p2.write_text(yaml.dump(shape_only))
    JobConfig.from_yaml(str(p2))  # off: dataclass checks don't mind 0
    with pytest.raises(ConfigError, match="target_file_size_mb"):
        JobConfig.from_yaml(str(p2), validate_schema=True)
    # self-declared $schema turns validation on without the flag
    p3 = tmp_path / "job3.yaml"
    p3.write_text(yaml.dump({**shape_only,
                             "$schema": "schemas/job-config.schema.json"}))
    with pytest.raises(ConfigError, match="target_file_size_mb"):
        JobConfig.from_yaml(str(p3))


def test_runner_validates_before_secrets(tmp_path, monkeypatch):
    """load_job_with_secrets gates on the schema BEFORE resolving secrets:
    a malformed config never touches a secret backend."""
    doc = {**VALID,
           "secrets": "env",
           "target": {**VALID["target"], "target_file_size_mb": -5}}
    p = tmp_path / "job.yaml"
    p.write_text(yaml.dump(doc))

    from dativo_ingest_spark import secrets as secrets_mod

    def boom(*a, **k):
        raise AssertionError("secret backend touched before schema gate")

    monkeypatch.setattr(secrets_mod, "load_secrets", boom)
    with pytest.raises(ConfigError, match="target_file_size_mb"):
        runner.load_job_with_secrets(str(p), validate_schema=True)


def test_missing_schema_file_is_config_error():
    with pytest.raises(ConfigError, match="not found"):
        schema_validation.validate_job_dict(VALID,
                                            schema_path="/nope.schema.json")


# --- asset contracts (ODCS profile) ----------------------------------------

ASSET = {
    "name": "contacts",
    "version": "2.1",
    "domain": "crm",
    "source_type": "csv",
    "object": "contacts",
    "target": {"file_format": "parquet", "partitioning": ["dt"],
               "mode": "strict"},
    "compliance": {"classification": ["PII"], "regulations": ["GDPR"],
                   "retention_days": 365},
    "team": {"owner": "data-eng"},
    "schema": [
        {"name": "id", "logicalType": "integer", "required": True},
        {"name": "email", "logicalType": "string", "classification": "pii"},
    ],
}


def test_asset_normalization_fills_odcs_envelope():
    doc = schema_validation.normalize_asset_to_odcs(ASSET)
    assert doc["apiVersion"] == "v3.0.2"
    assert doc["kind"] == "DataContract"
    assert doc["status"] == "active"
    assert doc["id"]  # minted
    # deterministic: same asset -> same id, every run
    assert doc["id"] == schema_validation.normalize_asset_to_odcs(ASSET)["id"]
    # explicit envelope fields are never overwritten
    keep = schema_validation.normalize_asset_to_odcs(
        {**ASSET, "status": "draft", "id": "fixed"})
    assert keep["status"] == "draft" and keep["id"] == "fixed"


def test_asset_legacy_nested_wrapper_unwrapped():
    doc = schema_validation.normalize_asset_to_odcs({"asset": ASSET})
    assert doc["name"] == "contacts"


def test_asset_governance_migrates_to_team():
    src = {k: v for k, v in ASSET.items() if k != "team"}
    src["governance"] = {"owner": "legacy-team"}
    doc = schema_validation.normalize_asset_to_odcs(src)
    assert doc["team"] == {"owner": "legacy-team"}


def test_valid_asset_passes_and_invalid_listed():
    schema_validation.validate_asset_dict(ASSET)  # no raise
    bad = {**ASSET, "status": "bogus",
           "schema": [{"logicalType": "string"}],       # field missing name
           "compliance": {"retention_days": -1}}
    with pytest.raises(ConfigError) as exc:
        schema_validation.validate_asset_dict(bad)
    msg = str(exc.value)
    assert "/status" in msg
    assert "/schema/0" in msg
    assert "/compliance/retention_days" in msg


def test_job_yaml_opt_in_validates_inline_asset(tmp_path):
    cfg = dict(VALID)
    cfg["asset"] = {**ASSET, "status": "bogus"}
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ConfigError, match="/status"):
        JobConfig.from_yaml(str(p), validate_schema=True)
    # default-off path still loads (dataclass checks only)
    cfg["asset"]["status"] = "active"
    p.write_text(yaml.safe_dump(cfg))
    assert JobConfig.from_yaml(str(p)).asset.name == "contacts"


def test_asset_path_reference_validates(tmp_path):
    ap = tmp_path / "asset.yaml"
    ap.write_text(yaml.safe_dump({**ASSET, "schema": [{"notname": True}]}))
    cfg = dict(VALID)
    cfg["asset"] = str(ap)
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ConfigError):
        JobConfig.from_yaml(str(p), validate_schema=True)


def test_shipped_examples_validate():
    """Every shipped example job passes full opt-in validation (job schema
    + ODCS asset normalization) and builds a JobConfig — the 'a reference
    user could run these' contract."""
    import glob
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "examples", "jobs", "*.yaml")))
    assert len(paths) >= 5
    for p in paths:
        doc = yaml.safe_load(open(p))
        if "${secret:" in open(p).read():
            # secret placeholders resolve at run time; validate the shape
            schema_validation.validate_job_dict(doc)
            if isinstance(doc.get("asset"), dict):
                schema_validation.validate_asset_dict(doc["asset"])
            continue
        job = JobConfig.from_yaml(p, validate_schema=True)
        assert job.asset.fields, p
