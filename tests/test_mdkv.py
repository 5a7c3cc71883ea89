"""Markdown-KV parse/encode semantics (reference markdown_kv.py behaviors)."""

from __future__ import annotations

from pyspark.sql import Row

from dativo_ingest_spark.operators import mdkv

DOC = """---
title: Widget Report
doc_id: 42
---

intro:: hello world
config:: {"a": 1, "b": [2, 3]}

# Metrics
count:: 7
notes:: first line
  second line

  third line
plain text closes the open value
orphan:: tail
"""


def test_front_matter_scalar_subset():
    fm, body = mdkv.split_front_matter(DOC)
    assert fm == {"title": "Widget Report", "doc_id": "42"}
    assert body.startswith("intro:: hello world")
    assert mdkv.split_front_matter("no fence here") == (None, "no fence here")
    # unparseable fence body degrades to (None, content) like the YAMLError path
    bad = "---\n- listitem\n---\nbody"
    assert mdkv.split_front_matter(bad) == (None, bad)


def test_sections_and_default():
    secs = mdkv.split_sections("a:: 1")
    assert [s["name"] for s in secs] == ["_default"]
    secs = mdkv.split_sections("pre:: x\n# One\na:: 1\n## Two\nb:: 2")
    assert [(s["name"], s["level"]) for s in secs] == [("One", 1), ("Two", 2)]
    # content before the first header is dropped (reference: only sections
    # after a header are captured when any header exists)
    assert secs[0]["content"] == "a:: 1"


def test_kv_multiline_and_json():
    pairs = mdkv.split_kv_pairs(
        'a:: {"x": 1}\nb:: first\n  cont\n\n  more\nflush line\nc:: 3'
    )
    assert [p["key"] for p in pairs] == ["a", "b", "c"]
    assert pairs[0]["value_json"] == '{"x": 1}'
    assert pairs[1]["value"] == "first\n  cont\n\n  more"
    assert pairs[1]["value_json"] is None
    assert pairs[2]["value_json"] == "3"


def test_row_per_kv_global_ord():
    rows = mdkv.parse_row_per_kv(DOC, "42", "2026-01-01T00:00:00")
    assert [r["ord"] for r in rows] == list(range(len(rows)))
    # intro/config sit before the first header: dropped, like the reference
    # (extract_sections only captures content after a header when any exists)
    assert [(r["section"], r["key"]) for r in rows] == [
        ("_front_matter", "title"), ("_front_matter", "doc_id"),
        ("Metrics", "count"), ("Metrics", "notes"), ("Metrics", "orphan"),
    ]
    assert all(r["doc_id"] == "42" for r in rows)


def test_document_level_title_chain():
    d = mdkv.parse_document_level(DOC, "42", "t")
    assert d["title"] == "Widget Report"
    assert [s["section"] for s in d["sections"]] == ["_front_matter", "Metrics"]
    assert d["raw_md"] == DOC
    # no front-matter title → first section name; no sections → doc_id
    assert mdkv.parse_document_level("# Top\na:: 1", "d9", "t")["title"] == "Top"
    assert mdkv.parse_document_level("", "d9", "t")["title"] == "_default"


def test_encode_expression(spark):
    df = spark.createDataFrame(
        [(7, "x", ["a", "b"], None)],
        "doc_id bigint, name string, tags array<string>, score double",
    )
    out = mdkv.encode(df).select("mdkv").first()[0]
    assert out == (
        "---\ndoc_id: 7\n---\n\n"
        'name:: x\ntags:: ["a","b"]\nscore:: '
    )


def test_spark_roundtrip(spark):
    df = spark.createDataFrame([Row(doc_id=1, a="v1", n=10),
                                Row(doc_id=2, a="v2", n=20)])
    enc = mdkv.encode(df)
    rows = mdkv.rows_from_markdown(enc, "doc_id", "mdkv", "t0").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.section, r.key, r.value, r.ord))
    assert by_doc["1"] == [("_front_matter", "doc_id", "1", 0),
                           ("_default", "a", "v1", 1),
                           ("_default", "n", "10", 2)]
    docs = {r.doc_id: r for r in
            mdkv.documents_from_markdown(enc, "doc_id", "mdkv", "t0").collect()}
    assert docs["2"].title == "_default"
    assert [s.section for s in docs["2"].sections] == ["_front_matter", "_default"]
    assert [kv.key for kv in docs["2"].sections[1].kv] == ["a", "n"]


def test_hybrid_rows_carry_document_context(spark):
    """hybrid = row_per_kv rows + document-level columns; ord is the
    per-section kv ordering (document_level semantics, not row_per_kv's
    document-global counter)."""
    df = spark.createDataFrame([Row(doc_id=1, a="v1", n=10)])
    enc = mdkv.encode(df)
    rows = sorted(
        mdkv.hybrid_from_markdown(enc, "doc_id", "mdkv", "t0").collect(),
        key=lambda r: (r.section, r.ord))
    assert [(r.section, r.key, r.value, r.ord) for r in rows] == [
        ("_default", "a", "v1", 0),
        ("_default", "n", "10", 1),
        ("_front_matter", "doc_id", "1", 0),
    ]
    assert all(r.title == "_default" and r.n_sections == 2 and r.n_kv == 3
               and r.extracted_at == "t0" for r in rows)


def test_hybrid_plan_is_shuffle_free(spark):
    """One parse + explodes only — no Exchange at any corpus size."""
    df = spark.createDataFrame([Row(doc_id=1, a="v1")])
    enc = mdkv.encode(df)
    plan = mdkv.hybrid_from_markdown(
        enc, "doc_id", "mdkv", "t0")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
