"""Tag derivation: three-level precedence, namespacing, no auto-detection."""

from __future__ import annotations

from dativo_ingest_spark.config import tags
from dativo_ingest_spark.config.contracts import AssetDefinition

ASSET = AssetDefinition.from_dict({
    "name": "customers", "version": "1.0", "domain": "sales",
    "dataProduct": "crm",
    "schema": [
        {"name": "email", "type": "string", "classification": "SENSITIVE_PII"},
        {"name": "amount", "type": "float"},
        {"name": "notes", "type": "string"},
    ],
    "compliance": {"classification": ["internal", "pii"],
                   "retention_days": 365,
                   "regulations": ["GDPR", "CCPA"]},
    "team": {"owner": "data-eng@example.com"},
    "finops": {"cost_center": "FIN-001", "business_tags": ["crm", "revenue"],
               "environment": "prod"},
})


def test_three_level_precedence():
    got = tags.field_classifications(
        ASSET,
        classification_overrides={"email": "HIGH_PII"},
        source_tags={"email": "PII", "amount": "FINANCIAL"},
    )
    # job override > asset classification > source tag; all lowercased
    assert got == {"email": "high_pii", "amount": "financial"}
    # no override/source: only asset classification survives
    assert tags.field_classifications(ASSET) == {"email": "sensitive_pii"}
    # source tag for an undeclared column is dropped
    assert "ghost" not in tags.field_classifications(
        ASSET, source_tags={"ghost": "PII"})


def test_no_auto_detection():
    # 'email'-looking name with no explicit tags anywhere → nothing derived
    bare = AssetDefinition.from_dict({
        "name": "a", "schema": [{"name": "email", "type": "string"}]})
    assert tags.field_classifications(bare) == {}
    assert tags.default_classification(bare) is None


def test_default_classification():
    assert tags.default_classification(ASSET) == "internal"
    assert tags.default_classification(
        ASSET, {"default": "RESTRICTED"}) == "restricted"


def test_governance():
    got = tags.governance_tags(ASSET)
    assert got == {"retention_days": "365", "owner": "data-eng@example.com",
                   "domain": "sales", "data_product": "crm",
                   "regulations": "GDPR,CCPA"}
    # overrides: retention 0 is valid, empty owner suppresses
    got = tags.governance_tags(ASSET, {"retention_days": 0, "owner": ""})
    assert got["retention_days"] == "0"
    assert "owner" not in got


def test_finops_merge():
    got = tags.finops_tags(ASSET, {"cost_center": "ENG-9", "project": "p1"})
    assert got == {"cost_center": "ENG-9", "business_tags": "crm,revenue",
                   "project": "p1", "environment": "prod"}


def test_namespaced_properties_and_s3_cap():
    props = tags.derive_table_properties(
        ASSET, classification_overrides={"email": "HIGH_PII"},
        source_tags={"amount": "FINANCIAL"})
    assert props["classification.default"] == "internal"
    assert props["classification.fields.email"] == "high_pii"
    assert props["classification.fields.amount"] == "financial"
    assert props["governance.domain"] == "sales"
    assert props["finops.business_tags"] == "crm,revenue"
    capped = tags.s3_object_tags(props, cap=3)
    assert len(capped) == 3 and len({k for k, _ in capped}) == 3
