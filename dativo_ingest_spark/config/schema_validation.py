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
