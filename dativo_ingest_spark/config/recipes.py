"""Connector recipes: reusable per-connector defaults merged into jobs.

Reference parity (``/root/reference/src/dativo_ingest/config.py:526-710``
+ ``connectors/*.yaml``): a job names a recipe file
(``source_connector_path`` / ``target_connector_path``) and the recipe
contributes connector type, connection templates, credential conventions,
and incremental defaults; the job's own ``source``/``target`` blocks
override per key. The reference's merge rules are kept exactly where they
carry semantics:

* incremental is DISABLED unless the job explicitly configures it — a
  recipe's ``incremental`` block is defaults-on-enable, not enable;
  ``incremental: {}`` or ``null`` in the job explicitly disables;
* a non-empty job ``incremental`` dict enables and merges over the recipe
  defaults (``strategy``, ``cursor_field_default`` -> ``cursor_field``,
  ``lookback_days_default`` -> ``lookback_days``);
* nested dicts deep-merge one level (job wins per key), scalars override.

Recipe files accept the REFERENCE field vocabulary (``type``, ``roles``,
``default_engine.options``, ``connection_template``, ``credentials``,
``incremental``) so recipes written for the reference load unchanged;
engine-specific blocks the Spark build replaces (pandas/meltano engine
internals) are carried into ``options`` verbatim for the connector to
interpret or ignore. ``${VAR}`` in connection templates expands from the
environment at load time (reference expandvars behavior).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field as dc_field
from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

from dativo_ingest_spark.config.contracts import ConfigError

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _expand(v: Any) -> Any:
    if isinstance(v, str):
        return _ENV_RE.sub(lambda m: os.environ.get(m.group(1), m.group(0)), v)
    if isinstance(v, dict):
        return {k: _expand(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_expand(x) for x in v]
    return v


@dataclass
class ConnectorRecipe:
    name: str
    type: str
    roles: list[str] = dc_field(default_factory=lambda: ["source"])
    description: str = ""
    #: flattened option defaults: connection_template + default_engine
    #: options + credentials conventions, job options override per key
    option_defaults: dict[str, Any] = dc_field(default_factory=dict)
    #: incremental DEFAULTS (applied only when the job enables incremental)
    incremental_defaults: dict[str, Any] = dc_field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ConnectorRecipe":
        if not d.get("type"):
            raise ConfigError("connector recipe must declare a type")
        opts: dict[str, Any] = {}
        engine = d.get("default_engine") or {}
        if isinstance(engine, dict):
            for block in (engine.get("options") or {}).values():
                if isinstance(block, dict):
                    opts.update(block)
        conn = d.get("connection_template") or {}
        if isinstance(conn, dict):
            opts.update(conn)
        creds = d.get("credentials") or {}
        if isinstance(creds, dict) and creds.get("type") not in (None, "none"):
            opts.setdefault("credentials_type", creds.get("type"))
            if creds.get("file_template"):
                opts.setdefault("credentials_file_template",
                                creds["file_template"])
            # the STRUCTURED block is what the engine layer consumes
            # (sources/engines.py build_engine_config resolves api_key
            # env vars / service-account files from it) — without it a
            # recipe's credential convention never reached the engine
            opts.setdefault("credentials", dict(creds))
        inc = d.get("incremental") or {}
        inc_defaults: dict[str, Any] = {}
        if isinstance(inc, dict) and inc:
            if inc.get("strategy"):
                inc_defaults["strategy"] = inc["strategy"]
            if inc.get("cursor_field_default"):
                inc_defaults["cursor_field"] = inc["cursor_field_default"]
            if inc.get("lookback_days_default") is not None:
                inc_defaults["lookback_days"] = inc["lookback_days_default"]
        return cls(
            name=str(d.get("name") or d["type"]),
            type=str(d["type"]),
            roles=list(d.get("roles") or ["source"]),
            description=str(d.get("description") or ""),
            option_defaults=_expand(opts),
            incremental_defaults=inc_defaults,
        )


def load_recipe(path: str) -> ConnectorRecipe:
    if yaml is None:  # pragma: no cover
        raise ConfigError("PyYAML unavailable")
    expanded = os.path.expandvars(path)
    if not os.path.exists(expanded):
        raise ConfigError(f"connector recipe not found: {expanded}")
    with open(expanded) as fh:
        return ConnectorRecipe.from_dict(yaml.safe_load(fh) or {})


def _merge_source(recipe: ConnectorRecipe, src: dict[str, Any]) -> dict[str, Any]:
    """Reference merge semantics (config.py:625-710) on our source shape."""
    out: dict[str, Any] = {
        "type": src.get("type") or recipe.type,
        "options": {**recipe.option_defaults, **(src.get("options") or {})},
    }
    if src.get("path") is not None:
        out["path"] = src["path"]
    inc = src.get("incremental", None)
    if inc is None or (isinstance(inc, dict) and not inc):
        pass  # disabled: absent, null, or explicit {}
    elif isinstance(inc, dict):
        out["incremental"] = {
            "enabled": True, **recipe.incremental_defaults, **inc,
        }
    else:
        out["incremental"] = inc
    for k, v in src.items():
        if k in ("type", "options", "incremental", "path"):
            continue
        out[k] = v
    return out


def resolve_connectors(doc: dict[str, Any]) -> dict[str, Any]:
    """Resolve ``source_connector_path``/``target_connector_path`` into a
    plain job dict (no-op when neither key is present)."""
    if "source_connector_path" not in doc and \
            "target_connector_path" not in doc:
        return doc
    out = dict(doc)
    sp = out.pop("source_connector_path", None)
    out.pop("source_connector", None)
    if sp:
        recipe = load_recipe(str(sp))
        if "source" not in recipe.roles:
            raise ConfigError(
                f"recipe '{recipe.name}' does not support the source role")
        out["source"] = _merge_source(recipe, dict(out.get("source") or {}))
    tp = out.pop("target_connector_path", None)
    out.pop("target_connector", None)
    if tp:
        recipe = load_recipe(str(tp))
        if "target" not in recipe.roles:
            raise ConfigError(
                f"recipe '{recipe.name}' does not support the target role")
        tgt = dict(out.get("target") or {})
        tgt.setdefault("type", recipe.type)
        tgt["options"] = {**recipe.option_defaults,
                          **(tgt.get("options") or {})}
        out["target"] = tgt
    return out
