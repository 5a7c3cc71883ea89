"""Job / asset / connector contract models (driver-side, no Spark needed).

Mirrors the reference's config surface (reference: src/dativo_ingest/
config.py:195-247 AssetDefinition, :519-569 JobConfig, :15-56 ConnectorRecipe)
as plain dataclasses: YAML job configs with an ODCS-style asset contract
(field list with name/type/required/classification), source/target connector
configs with incremental settings, and the merge rules that matter
semantically:

- incremental is OFF unless the job explicitly configures it
  (reference: config.py:640-672);
- branch defaults to tenant_id (reference: config.py:756-761);
- jobs fail fast when the asset has no non-empty schema
  (reference: config.py:786-823);
- schema_validation_mode defaults to "strict" (reference: config.py:552).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field as dc_field
from typing import Any

try:  # PyYAML ships with pyspark environments; gate anyway.
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

KNOWN_TYPES = {
    "string", "integer", "float", "double", "boolean",
    "timestamp", "datetime", "date",
}

VALIDATION_MODES = ("strict", "warn")

#: incremental strategy → connector families that may use it
#: (reference: registry/connectors.yaml:9-90, validator.py:162-241)
INCREMENTAL_STRATEGIES = {
    "updated_at": {"postgres", "mysql", "jdbc"},
    "updated_after": {"hubspot"},
    "created": {"stripe"},
    "file_modified_time": {"csv", "jsonl", "gdrive_csv", "markdown_kv",
                           "parquet", "files"},
    "spreadsheet_modified_time": {"google_sheets"},
}


class ConfigError(ValueError):
    """Invalid job/asset configuration (reference exit code 2 analog)."""


@dataclass
class Field:
    name: str
    type: str = "string"
    required: bool = False
    classification: str | None = None
    description: str | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Field":
        return cls(
            name=d["name"],
            type=str(d.get("type", "string")).lower(),
            required=bool(d.get("required", False)),
            classification=d.get("classification"),
            description=d.get("description"),
        )


@dataclass
class AssetDefinition:
    """ODCS-style data contract: identity + governance + field schema."""

    name: str
    version: str = "1.0"
    domain: str | None = None
    data_product: str | None = None
    tenant: str | None = None
    fields: list[Field] = dc_field(default_factory=list)
    governance: dict[str, Any] = dc_field(default_factory=dict)
    finops: dict[str, Any] = dc_field(default_factory=dict)
    #: ODCS compliance block: classification (list), retention_days,
    #: regulations (list) — reference config.py:195-247
    compliance: dict[str, Any] = dc_field(default_factory=dict)
    #: team block: owner, ... — reference config.py:195-247
    team: dict[str, Any] = dc_field(default_factory=dict)
    #: data_quality block: expectations/monitoring/alerts — reference
    #: config.py:137-142 PARSES this and never evaluates it; here the
    #: expectations list is enforced at runtime (operators/quality.py)
    data_quality: dict[str, Any] = dc_field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "AssetDefinition":
        raw_schema = d.get("schema") or []
        if not raw_schema:
            raise ConfigError(
                f"asset '{d.get('name', '?')}' must declare a non-empty schema"
            )
        return cls(
            name=d.get("name", "unnamed"),
            version=str(d.get("version", "1.0")),
            domain=d.get("domain"),
            data_product=d.get("dataProduct") or d.get("data_product"),
            tenant=d.get("tenant"),
            fields=[Field.from_dict(f) for f in raw_schema],
            governance=d.get("governance") or d.get("team") or {},
            finops=d.get("finops") or {},
            compliance=d.get("compliance") or {},
            team=d.get("team") or {},
            data_quality=d.get("data_quality") or {},
        )

    def required_fields(self) -> list[Field]:
        return [f for f in self.fields if f.required]

    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]


@dataclass
class IncrementalConfig:
    enabled: bool = False
    strategy: str | None = None
    cursor_field: str | None = None
    lookback_days: int = 0


@dataclass
class SourceConfig:
    type: str
    path: str | None = None
    options: dict[str, Any] = dc_field(default_factory=dict)
    incremental: IncrementalConfig = dc_field(default_factory=IncrementalConfig)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "SourceConfig":
        inc = d.get("incremental") or {}
        # Incremental is off unless explicitly configured by the job.
        incremental = IncrementalConfig(
            enabled=bool(inc.get("enabled", bool(inc))),
            strategy=inc.get("strategy"),
            cursor_field=inc.get("cursor_field") or inc.get("cursor"),
            lookback_days=int(inc.get("lookback_days", 0)),
        )
        return cls(
            type=str(d.get("type", "")).lower(),
            path=_expand_env(d.get("path")),
            options={k: v for k, v in (d.get("options") or {}).items()},
            incremental=incremental,
        )


@dataclass
class TargetConfig:
    type: str = "parquet"
    path: str | None = None
    table: str | None = None
    partition_by: list[str] = dc_field(default_factory=list)
    target_file_size_mb: int = 150  # reference default, 128-200 band
    branch: str | None = None
    options: dict[str, Any] = dc_field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any], tenant_id: str | None = None) -> "TargetConfig":
        return cls(
            type=str(d.get("type", "parquet")).lower(),
            path=_expand_env(d.get("path")),
            table=d.get("table"),
            partition_by=list(d.get("partition_by") or []),
            target_file_size_mb=int(d.get("target_file_size_mb", 150)),
            # Branch-per-tenant default (Nessie semantics in the reference).
            branch=d.get("branch") or tenant_id,
            options={k: v for k, v in (d.get("options") or {}).items()},
        )


@dataclass
class JobConfig:
    tenant_id: str
    source: SourceConfig
    target: TargetConfig
    asset: AssetDefinition
    validation_mode: str = "strict"

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "JobConfig":
        if "source_connector_path" in d or "target_connector_path" in d:
            # reference-style connector recipes (config.py:526-710):
            # recipe defaults merge under the job's own source/target
            from dativo_ingest_spark.config import recipes

            d = recipes.resolve_connectors(d)
        mode = str(d.get("schema_validation_mode", "strict")).lower()
        if mode not in VALIDATION_MODES:
            raise ConfigError(f"schema_validation_mode must be one of {VALIDATION_MODES}")
        tenant = d.get("tenant_id") or "default"
        asset_d = d.get("asset")
        if isinstance(asset_d, str):
            asset = load_asset(asset_d)
        elif isinstance(asset_d, dict):
            asset = AssetDefinition.from_dict(asset_d)
        else:
            raise ConfigError("job must declare an asset (inline dict or path)")
        job = cls(
            tenant_id=tenant,
            source=SourceConfig.from_dict(d.get("source") or {}),
            target=TargetConfig.from_dict(d.get("target") or {}, tenant_id=tenant),
            asset=asset,
            validation_mode=mode,
        )
        job.validate()
        return job

    @classmethod
    def from_yaml(cls, path: str,
                  validate_schema: bool = False) -> "JobConfig":
        """``validate_schema`` opt-in mirrors the reference's flag
        (config.py:331-337): when on — or when the doc self-declares
        ``$schema`` — the raw dict is checked against
        schemas/job-config.schema.json before dataclass construction."""
        if yaml is None:  # pragma: no cover
            raise ConfigError("PyYAML unavailable")
        with open(path) as fh:
            doc = yaml.safe_load(fh) or {}
        if "source_connector_path" in doc or "target_connector_path" in doc:
            # recipes resolve BEFORE schema validation: the recipe supplies
            # required keys (source.type) the raw job may omit
            from dativo_ingest_spark.config import recipes

            doc = recipes.resolve_connectors(doc)
        from dativo_ingest_spark.config import schema_validation

        if schema_validation.should_validate(doc, validate_schema):
            schema_validation.validate_job_dict(doc)
            # the asset contract gets the same treatment: inline dicts are
            # normalized to the ODCS envelope and checked against
            # schemas/asset-contract.schema.json (path-referenced assets
            # validate in load_asset)
            if isinstance(doc.get("asset"), dict):
                schema_validation.validate_asset_dict(doc["asset"])
            elif isinstance(doc.get("asset"), str):
                load_asset(doc["asset"], validate_schema=True)
        return cls.from_dict(doc)

    def validate(self) -> None:
        if not self.source.type:
            raise ConfigError("source.type is required")
        inc = self.source.incremental
        if inc.enabled and inc.strategy:
            allowed = INCREMENTAL_STRATEGIES.get(inc.strategy)
            if allowed is not None and self.source.type not in allowed:
                raise ConfigError(
                    f"incremental strategy '{inc.strategy}' not valid for "
                    f"source type '{self.source.type}'"
                )
        for f in self.asset.fields:
            if not f.name:
                raise ConfigError("asset schema fields must be named")


def load_asset(path: str, validate_schema: bool = False) -> AssetDefinition:
    if yaml is None:  # pragma: no cover
        raise ConfigError("PyYAML unavailable")
    with open(_expand_env(path)) as fh:
        doc = yaml.safe_load(fh) or {}
    from dativo_ingest_spark.config import schema_validation

    if schema_validation.should_validate(doc, validate_schema):
        doc = schema_validation.validate_asset_dict(doc)
    elif isinstance(doc.get("asset"), dict):
        doc = doc["asset"]  # legacy nested wrapper
    return AssetDefinition.from_dict(doc)


_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _expand_env(value: str | None) -> str | None:
    """${VAR} expansion in paths (reference: config.py env expansion)."""
    if value is None:
        return None
    return _ENV_RE.sub(lambda m: os.environ.get(m.group(1), m.group(0)), str(value))
