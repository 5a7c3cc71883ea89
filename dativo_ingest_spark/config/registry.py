"""Connector capability registry + mode/role gating.

Mirrors the reference's versioned registry semantics (reference:
``registry/connectors.yaml:1-115``) and its startup validation
(``validator.py:88-241``): connector types declare roles (source/target),
an engine lattice, cloud-mode availability, and incremental capability;
jobs are gated *before any data is touched*. Violations raise
:class:`~dativo_ingest_spark.config.contracts.ConfigError` — the runner
maps that to exit code 2, matching the reference's ``sys.exit(2)``
fail-at-startup contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from dativo_ingest_spark.config.contracts import ConfigError, JobConfig

MODES = ("self_hosted", "cloud")

#: strategies that are accepted on any file-family connector even when they
#: differ from the connector default (reference validator.py:205-214)
_FILE_STRATEGIES = ("file_modified_time", "spreadsheet_modified_time")
#: strategies that require a cursor_field (reference validator.py:222-231)
_CURSOR_STRATEGIES = ("updated_at", "created", "updated_after")


@dataclass(frozen=True)
class ConnectorSpec:
    name: str
    roles: tuple[str, ...]
    category: str | None = None
    default_engine: str = "native"
    engines_supported: tuple[str, ...] = ("native",)
    allowed_in_cloud: bool = True
    supports_incremental: bool = False
    incremental_strategy_default: str | None = None
    objects_supported: tuple[str, ...] = ()
    extra: dict = dc_field(default_factory=dict)


#: reference registry/connectors.yaml:9-115, re-expressed. Database
#: connectors are blocked in cloud mode (SaaS must not reach into customer
#: networks); API connectors ride the Airbyte engine by default.
CONNECTORS: dict[str, ConnectorSpec] = {
    s.name: s
    for s in [
        ConnectorSpec("hubspot", ("source",), "crm", "airbyte",
                      ("airbyte", "singer", "native"), True, True,
                      "updated_after", ("contacts", "deals", "companies")),
        ConnectorSpec("stripe", ("source",), "payments", "airbyte",
                      ("airbyte", "singer", "native"), True, True,
                      "created", ("charges", "customers", "invoices")),
        ConnectorSpec("gdrive_csv", ("source",), "files", "native",
                      ("native", "airbyte", "meltano"), True, True,
                      "file_modified_time", ("file",)),
        ConnectorSpec("csv", ("source", "target"), "files", "native",
                      ("native",), True, True, "file_modified_time",
                      ("file",)),
        ConnectorSpec("markdown_kv", ("source", "target"), "files", "native",
                      ("native",), True, True, "file_modified_time",
                      ("file",)),
        ConnectorSpec("google_sheets", ("source", "target"), "files",
                      "native", ("native", "airbyte", "meltano"), True, True,
                      "spreadsheet_modified_time", ("sheet",)),
        ConnectorSpec("postgres", ("source", "target"), "database", "meltano",
                      ("meltano", "airbyte", "jdbc"), False, True,
                      "updated_at",
                      extra={"requires_tables": True,
                             "supports_queries": True}),
        ConnectorSpec("mysql", ("source", "target"), "database", "meltano",
                      ("meltano", "airbyte", "jdbc"), False, True,
                      "updated_at",
                      extra={"requires_tables": True,
                             "supports_queries": True}),
        ConnectorSpec("iceberg", ("target",), None, "native",
                      ("native", "spark"), True, False,
                      extra={"file_formats": ("parquet", "markdown_kv"),
                             "supports_schema_evolution": True}),
        ConnectorSpec("s3", ("source", "target")),
        ConnectorSpec("minio", ("source", "target")),
        ConnectorSpec("azure_blob", ("source", "target")),
        # engine-native types of this repo, absent from the reference
        # registry (parquet rides the same file family as csv; derby/jdbc
        # are the embedded-testable database family — cloud-blocked like
        # postgres/mysql)
        ConnectorSpec("parquet", ("source", "target"), "files", "native",
                      ("native",), True, True, "file_modified_time",
                      ("file",)),
        ConnectorSpec("jsonl", ("source",), "files", "native",
                      ("native",), True, True, "file_modified_time",
                      ("file",)),
        ConnectorSpec("derby", ("source", "target"), "database", "jdbc",
                      ("jdbc",), False, True, "updated_at",
                      extra={"requires_tables": True}),
        ConnectorSpec("jdbc", ("source", "target"), "database", "jdbc",
                      ("jdbc",), False, True, "updated_at",
                      extra={"requires_tables": True}),
        # Custom Python reader plugins (reference plugins.py:616-723):
        # allowed in cloud mode BECAUSE cloud mode force-sandboxes them
        # (plugin_sandbox.should_sandbox_plugin; reference
        # sandbox.py:1328-1363 gates identically).
        ConnectorSpec("custom_python", ("source",), "plugin", "native",
                      ("native",), True, True, "cursor"),
    ]
}


def connector_spec(connector_type: str, role: str = "source") -> ConnectorSpec:
    """Registry lookup + role check (reference validator.py:88-140)."""
    spec = CONNECTORS.get(connector_type)
    if spec is None:
        raise ConfigError(
            f"connector type '{connector_type}' not found in registry; "
            f"available: {', '.join(sorted(CONNECTORS))}"
        )
    if role not in spec.roles:
        raise ConfigError(
            f"connector type '{connector_type}' does not support the "
            f"'{role}' role (roles: {list(spec.roles)})"
        )
    return spec


def validate_mode(spec: ConnectorSpec, mode: str) -> None:
    """Cloud-mode restriction (reference validator.py:141-158): database
    connectors only run self-hosted."""
    if mode not in MODES:
        raise ConfigError(f"mode must be one of {MODES}, got '{mode}'")
    if mode == "cloud" and not spec.allowed_in_cloud:
        raise ConfigError(
            f"connector '{spec.name}' is not allowed in cloud mode; "
            "database connectors can only run in self_hosted mode"
        )


def validate_incremental(spec: ConnectorSpec, job: JobConfig) -> None:
    """Incremental gating (reference validator.py:164-241): strategy must be
    declared, supported by the connector, and match the connector default
    (file-family strategies are exempt); cursor strategies need a field."""
    inc = job.source.incremental
    if not inc.enabled:
        return
    if not spec.supports_incremental:
        raise ConfigError(
            f"connector '{spec.name}' does not support incremental "
            "extraction"
        )
    # Deliberate superset of the reference gate: this engine supports a
    # generic column-cursor predicate on ANY incremental-capable source
    # (operators/incremental.py) — the reference ties cursors to specific
    # connector families. 'cursor' (or a bare cursor_field with no
    # strategy) selects that path and only needs the field.
    if inc.strategy in (None, "cursor"):
        if not inc.cursor_field:
            raise ConfigError(
                "generic cursor incremental requires 'cursor_field' "
                f"(connector '{spec.name}')"
            )
        return
    if (inc.strategy != spec.incremental_strategy_default
            and inc.strategy not in _FILE_STRATEGIES):
        raise ConfigError(
            f"incremental strategy '{inc.strategy}' does not match "
            f"connector default '{spec.incremental_strategy_default}' for "
            f"'{spec.name}'"
        )
    if inc.strategy in _CURSOR_STRATEGIES and not inc.cursor_field:
        raise ConfigError(
            f"incremental strategy '{inc.strategy}' requires 'cursor_field'"
        )
    if inc.strategy in _FILE_STRATEGIES and not job.source.path:
        raise ConfigError(
            f"incremental strategy '{inc.strategy}' requires a source path"
        )


def gate_job(job: JobConfig, mode: str = "self_hosted") -> None:
    """Full pre-flight gate for one job: source role + target role +
    cloud-mode + incremental. Raises ConfigError before any data moves."""
    src = connector_spec(job.source.type, "source")
    validate_mode(src, mode)
    validate_incremental(src, job)
    if job.target.type in CONNECTORS:
        tgt = connector_spec(job.target.type, "target")
        validate_mode(tgt, mode)
