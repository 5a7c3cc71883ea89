"""Opt-in JSON-schema validation of job YAML.

The reference validates job configs against ``schemas/job-config.schema.json``
with a jsonschema ref-resolver behind an opt-in flag (reference:
src/dativo_ingest/config.py:291-327 validate_against_schema, :331-337 the
``validate_schema`` kwarg defaulting to False). Same contract here:

* default OFF — dataclass-level checks (config/contracts.py) always run;
* when enabled, the raw YAML dict is checked against the shipped draft-07
  schema BEFORE dataclass construction, so a malformed-but-parseable config
  fails at parse time (exit 2) with every violation listed by JSON pointer,
  instead of failing mid-job with whatever attribute error it happens to hit;
* a job that self-declares ``$schema`` is validated automatically — the key
  is an explicit ask for the contract.

The shipped schema keeps all refs internal (``$defs``) so no external
resolver is needed — the reference's RefResolver is deprecated upstream and
its only job there is stitching schema files together.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Any

from dativo_ingest_spark.config.contracts import ConfigError

#: repo-root schemas/ dir (module lives at dativo_ingest_spark/config/)
DEFAULT_SCHEMA_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "schemas", "job-config.schema.json",
)


@lru_cache(maxsize=8)
def _load_schema(path: str) -> dict[str, Any]:
    if not os.path.exists(path):
        raise ConfigError(f"job-config schema not found: {path}")
    with open(path) as fh:
        return json.load(fh)


def validate_job_dict(doc: dict[str, Any],
                      schema_path: str | None = None,
                      max_errors: int = 10) -> None:
    """Raise ConfigError listing every schema violation (capped) with its
    JSON-pointer path; no-op on a conforming document."""
    try:
        import jsonschema
    except ImportError:  # pragma: no cover - baked into this environment
        raise ConfigError(
            "validate_schema requested but jsonschema is not installed")
    schema = _load_schema(schema_path or DEFAULT_SCHEMA_PATH)
    validator = jsonschema.Draft7Validator(schema)
    errors = sorted(validator.iter_errors(doc),
                    key=lambda e: list(e.absolute_path))
    if not errors:
        return
    lines = []
    for err in errors[:max_errors]:
        pointer = "/" + "/".join(str(p) for p in err.absolute_path)
        lines.append(f"  {pointer or '/'}: {err.message}")
    more = len(errors) - max_errors
    if more > 0:
        lines.append(f"  ... and {more} more")
    raise ConfigError(
        "job config failed schema validation "
        f"({len(errors)} violation{'s' if len(errors) != 1 else ''}):\n"
        + "\n".join(lines))


def should_validate(doc: dict[str, Any], requested: bool) -> bool:
    """Opt-in flag OR a self-declared ``$schema`` key turns validation on."""
    return bool(requested or doc.get("$schema"))


# --- asset contracts (ODCS profile) ----------------------------------------

#: sibling schema for asset data contracts (ODCS v3.0.2 profile + ingest
#: extensions; reference analog: schemas/odcs/dativo-odcs-3.0.2-extended
#: validated by tests/integration/test_odcs_compliance.py)
ASSET_SCHEMA_PATH = os.path.join(
    os.path.dirname(DEFAULT_SCHEMA_PATH), "asset-contract.schema.json",
)

_ODCS_DEFAULTS = {
    "apiVersion": "v3.0.2",
    "kind": "DataContract",
    "status": "active",
    "version": "1.0",
}


def normalize_asset_to_odcs(asset: dict[str, Any]) -> dict[str, Any]:
    """Return a copy of an asset dict lifted to the ODCS contract shape.

    Mirrors the reference's pre-validation conversion: unwrap a legacy
    nested ``{"asset": {...}}`` document, fill the ODCS envelope defaults
    (apiVersion/kind/status/version), migrate a ``governance`` block to
    ``team``, and mint a missing ``id`` DETERMINISTICALLY (uuid5 of the
    asset name — the reference uses uuid4, which re-deals ids per run;
    a contract id that changes on every validation is not an id).
    """
    doc = dict(asset.get("asset") or asset)
    for key, val in _ODCS_DEFAULTS.items():
        doc.setdefault(key, val)
    if "governance" in doc and "team" not in doc:
        doc["team"] = doc["governance"]
    if not doc.get("id"):
        import uuid

        doc["id"] = str(
            uuid.uuid5(uuid.NAMESPACE_URL,
                       f"asset:{doc.get('name', 'unnamed')}")
        )
    return doc


def validate_asset_dict(asset: dict[str, Any],
                        schema_path: str | None = None,
                        max_errors: int = 10) -> dict[str, Any]:
    """Normalize an asset dict to the ODCS shape and validate it; raises
    ConfigError listing violations, returns the normalized document."""
    doc = normalize_asset_to_odcs(asset)
    validate_job_dict(doc, schema_path=schema_path or ASSET_SCHEMA_PATH,
                      max_errors=max_errors)
    return doc
