"""Governance/FinOps tag derivation → table properties.

Reference semantics (``/root/reference/src/dativo_ingest/tag_derivation.py``):
three-level precedence — job overrides > asset contract > source-system tags
(``:72-129``); NO automatic PII/classification detection anywhere; namespaced
output ``classification.default`` / ``classification.fields.<name>`` /
``governance.*`` / ``finops.*`` (``:249-280``).

Driver-side pure functions: the resulting dict feeds Iceberg
``TBLPROPERTIES`` (or any catalog's table-properties API) at table
create/commit time — no Spark involvement, so it is unit-tested without a
session.
"""

from __future__ import annotations

from typing import Any

from dativo_ingest_spark.config.contracts import AssetDefinition


def field_classifications(
    asset: AssetDefinition,
    classification_overrides: dict[str, str] | None = None,
    source_tags: dict[str, str] | None = None,
) -> dict[str, str]:
    """Per-field classification, lowercased; later levels override earlier:
    source tags < contract ``classification`` < job overrides. Only contract
    fields are considered (a source tag for an undeclared column is noise)."""
    overrides = classification_overrides or {}
    source = source_tags or {}
    out: dict[str, str] = {}
    for f in asset.fields:
        if f.name in source:
            out[f.name] = source[f.name].lower()
        if f.classification:
            out[f.name] = f.classification.lower()
        if f.name in overrides:
            out[f.name] = overrides[f.name].lower()
    return out


def default_classification(
    asset: AssetDefinition,
    classification_overrides: dict[str, str] | None = None,
) -> str | None:
    """Table-level default: ``default`` override key, else the first entry
    of the compliance classification list. Never inferred from fields."""
    overrides = classification_overrides or {}
    if "default" in overrides:
        return overrides["default"].lower()
    classes = asset.compliance.get("classification") or []
    if isinstance(classes, str):
        classes = [classes]
    return classes[0].lower() if classes else None


def governance_tags(
    asset: AssetDefinition,
    governance_overrides: dict[str, Any] | None = None,
) -> dict[str, str]:
    """retention_days (0 is valid), owner (override may blank it), domain,
    data_product, regulations (comma-joined)."""
    gov = governance_overrides or {}
    tags: dict[str, str] = {}

    retention = gov.get("retention_days")
    if retention is None:
        retention = asset.compliance.get("retention_days")
    if retention is not None:
        tags["retention_days"] = str(retention)

    if "owner" in gov:
        if gov["owner"]:
            tags["owner"] = gov["owner"]
    elif asset.team.get("owner"):
        tags["owner"] = asset.team["owner"]

    if asset.domain:
        tags["domain"] = asset.domain
    if asset.data_product:
        tags["data_product"] = asset.data_product

    regulations = asset.compliance.get("regulations")
    if regulations:
        tags["regulations"] = ",".join(regulations)
    return tags


def finops_tags(
    asset: AssetDefinition,
    finops_overrides: dict[str, Any] | None = None,
) -> dict[str, str]:
    """cost_center / business_tags (comma-joined) / project / environment;
    overrides shadow the contract's finops block key-by-key."""
    merged = {**(asset.finops or {}), **(finops_overrides or {})}
    tags: dict[str, str] = {}
    if merged.get("cost_center"):
        tags["cost_center"] = str(merged["cost_center"])
    if merged.get("business_tags"):
        bt = merged["business_tags"]
        tags["business_tags"] = ",".join(bt) if isinstance(bt, list) else str(bt)
    if merged.get("project"):
        tags["project"] = str(merged["project"])
    if merged.get("environment"):
        tags["environment"] = str(merged["environment"])
    return tags


def derive_table_properties(
    asset: AssetDefinition,
    classification_overrides: dict[str, str] | None = None,
    finops_overrides: dict[str, Any] | None = None,
    governance_overrides: dict[str, Any] | None = None,
    source_tags: dict[str, str] | None = None,
) -> dict[str, str]:
    """All namespaced tags for table properties."""
    props: dict[str, str] = {}
    default = default_classification(asset, classification_overrides)
    if default:
        props["classification.default"] = default
    for name, cls in field_classifications(
        asset, classification_overrides, source_tags
    ).items():
        props[f"classification.fields.{name}"] = cls
    for k, v in governance_tags(asset, governance_overrides).items():
        props[f"governance.{k}"] = v
    for k, v in finops_tags(asset, finops_overrides).items():
        props[f"finops.{k}"] = v
    return props


def s3_object_tags(props: dict[str, str], cap: int = 10) -> list[tuple[str, str]]:
    """First ``cap`` tags, deduped by key, for sinks with tag-count limits
    (reference ``iceberg_committer.py:823-833``)."""
    seen: set[str] = set()
    out: list[tuple[str, str]] = []
    for k, v in props.items():
        if k in seen:
            continue
        seen.add(k)
        out.append((k, v))
        if len(out) >= cap:
            break
    return out
