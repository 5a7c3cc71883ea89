"""Markdown-KV encode/parse — the reference engine's only complex transform.

Semantics mirror ``/root/reference/src/dativo_ingest/markdown_kv.py``:
encode (record → front-matter + ``key:: value`` doc, ``markdown_kv.py:396-451``),
row_per_kv explode (``markdown_kv.py:203-269``), document_level nesting
(``markdown_kv.py:272-366``), section headers (``markdown_kv.py:34-98``),
multi-line value continuation (``markdown_kv.py:101-200``).

Spark-first split:

* **encode** is a pure Column expression (``concat_ws``) — runs inside
  whole-stage codegen in the scan stage, zero Python, zero shuffle; at
  100 TB it costs nothing beyond the read.
* **parse** is inherently a per-line state machine (front-matter fences,
  header tracking, indented continuation lines), so it runs as an
  Arrow-batched ``mapInPandas`` — the sanctioned slow path. It is
  embarrassingly parallel (per-document), preserves the input partitioning,
  and adds no shuffle; the explode happens inside the batch iterator so
  memory stays bounded by (batch rows × kv pairs/doc).

The pure-Python parse functions are importable without Spark for unit tests.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dativo_ingest_spark.operators.util import widen as _widen

#: doc_id inference order of the reference driver loop (``cli.py:856-931``).
DOC_ID_FIELDS = (
    "businessentityid", "productid", "customerid", "salesorderid",
    "addressid", "productcategoryid", "id", "doc_id",
)

#: front-matter keys the encoder promotes out of the body
#: (``markdown_kv.py:428-434``).
FRONT_MATTER_KEYS = ("title", "id", "doc_id")

_HEADER_RE = re.compile(r"^(#{1,6})\s+(.+)$")
_KV_RE = re.compile(r"^([^:]+)::\s*(.*)$")
_FENCE_RE = re.compile(r"^---\s*\n(.*?)\n---\s*\n", re.DOTALL)

ROW_PER_KV_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("section", T.StringType()),
    T.StructField("key", T.StringType()),
    T.StructField("value", T.StringType()),
    T.StructField("value_json", T.StringType()),
    T.StructField("ord", T.LongType()),
    T.StructField("extracted_at", T.StringType()),
])

KV_STRUCT = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("value", T.StringType()),
    T.StructField("value_json", T.StringType()),
    T.StructField("ord", T.LongType()),
])

DOCUMENT_LEVEL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("sections", T.ArrayType(T.StructType([
        T.StructField("section", T.StringType()),
        T.StructField("level", T.IntegerType()),
        T.StructField("kv", T.ArrayType(KV_STRUCT)),
    ]))),
    T.StructField("raw_md", T.StringType()),
    T.StructField("extracted_at", T.StringType()),
])


# ---------------------------------------------------------------------------
# Pure-Python parse kernel (no Spark imports needed)
# ---------------------------------------------------------------------------

def split_front_matter(content: str) -> tuple[dict[str, str] | None, str]:
    """Pop a leading ``---`` YAML fence; scalar ``key: value`` subset only.

    The reference delegates to PyYAML (``markdown_kv.py:9-31``); the encoder
    below only ever emits plain scalars, so a scalar-line parser keeps the
    roundtrip closed without a YAML dependency on executors. Unparseable
    fence bodies behave like the reference's YAMLError path: (None, content).
    """
    m = _FENCE_RE.match(content)
    if not m:
        return None, content
    fm: dict[str, str] = {}
    for line in m.group(1).split("\n"):
        if not line.strip():
            continue
        if ":" not in line or line.startswith((" ", "\t", "-")):
            return None, content
        k, _, v = line.partition(":")
        fm[k.strip()] = v.strip()
    return fm, content[m.end():]


def split_sections(content: str) -> list[dict[str, Any]]:
    """``#``-header sections; headerless content → one ``_default`` section."""
    out: list[dict[str, Any]] = []
    name, level, buf = None, 0, []
    for line in content.split("\n"):
        m = _HEADER_RE.match(line)
        if m:
            if name is not None:
                out.append({"name": name, "level": level,
                            "content": "\n".join(buf).strip()})
            name, level, buf = m.group(2).strip(), len(m.group(1)), []
        else:
            buf.append(line)
    if name is not None:
        out.append({"name": name, "level": level,
                    "content": "\n".join(buf).strip()})
    if not out:
        out.append({"name": "_default", "level": 0, "content": content.strip()})
    return out


def _finish_kv(key: str, value_lines: list[str], ordinal: int) -> dict[str, Any]:
    value = "\n".join(value_lines).strip()
    try:
        json.loads(value)
        value_json: str | None = value
    except (json.JSONDecodeError, ValueError):
        value_json = None
    return {"key": key.strip(), "value": value, "value_json": value_json,
            "ord": ordinal}


def split_kv_pairs(content: str) -> list[dict[str, Any]]:
    """``key:: value`` pairs; indented/blank lines continue the open value;
    a flush non-kv line closes it."""
    pairs: list[dict[str, Any]] = []
    key: str | None = None
    buf: list[str] = []
    for line in content.split("\n"):
        m = _KV_RE.match(line)
        if m:
            if key is not None:
                pairs.append(_finish_kv(key, buf, len(pairs)))
            key = m.group(1)
            head = m.group(2).strip()
            buf = [head] if head else []
        elif key is not None and (line.startswith((" ", "\t")) or not line.strip()):
            buf.append(line)
        elif key is not None:
            pairs.append(_finish_kv(key, buf, len(pairs)))
            key, buf = None, []
    if key is not None:
        pairs.append(_finish_kv(key, buf, len(pairs)))
    return pairs


def parse_row_per_kv(content: str, doc_id: str,
                     extracted_at: str) -> list[dict[str, Any]]:
    """One dict per kv pair: front matter first (section ``_front_matter``),
    then body sections; ``ord`` is document-global."""
    fm, body = split_front_matter(content)
    rows: list[dict[str, Any]] = []
    if fm:
        for k, v in fm.items():
            rows.append({"doc_id": doc_id, "section": "_front_matter",
                         "key": k, "value": v,
                         "value_json": _finish_kv(k, [v], 0)["value_json"],
                         "ord": len(rows), "extracted_at": extracted_at})
    for sec in split_sections(body):
        for kv in split_kv_pairs(sec["content"]):
            rows.append({"doc_id": doc_id, "section": sec["name"],
                         "key": kv["key"], "value": kv["value"],
                         "value_json": kv["value_json"], "ord": len(rows),
                         "extracted_at": extracted_at})
    return rows


def parse_document_level(content: str, doc_id: str,
                         extracted_at: str) -> dict[str, Any]:
    """Nested one-row-per-doc shape: title + sections[].kv[] + raw_md."""
    fm, body = split_front_matter(content)
    title = fm.get("title") if fm else None
    sections: list[dict[str, Any]] = []
    if fm:
        fm_kv = [_finish_kv(k, [v], i)
                 for i, (k, v) in enumerate((k, v) for k, v in fm.items()
                                            if k != "title")]
        if fm_kv:
            sections.append({"section": "_front_matter", "level": 0, "kv": fm_kv})
    body_secs = split_sections(body)
    for sec in body_secs:
        kvs = split_kv_pairs(sec["content"])
        if kvs:
            sections.append({"section": sec["name"], "level": sec["level"],
                             "kv": kvs})
    if not title and body_secs:
        title = body_secs[0]["name"]
    return {"doc_id": doc_id, "title": title or doc_id, "sections": sections,
            "raw_md": content, "extracted_at": extracted_at}


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def doc_id_expr(df: DataFrame) -> Column:
    """coalesce over the reference's id-field chain, else 'unknown'."""
    present = [c for c in DOC_ID_FIELDS if c in df.columns]
    if not present:
        return F.lit("unknown")
    return F.coalesce(*[F.col(c).cast("string") for c in present],
                      F.lit("unknown"))


def encode(df: DataFrame, body_cols: list[str] | None = None,
           out_col: str = "mdkv") -> DataFrame:
    """Append an ``out_col`` markdown-kv rendering of each row (compact
    format): front matter for title/id/doc_id (keys sorted, as yaml.dump
    does), blank separator, then ``key:: value`` per remaining column in
    DataFrame column order; null → empty value; array/map/struct columns are
    JSON-encoded.

    Pure expression — no UDF, no shuffle.
    """
    body_cols = body_cols or df.columns
    complex_types = (T.ArrayType, T.MapType, T.StructType)
    dtypes = {f.name: f.dataType for f in df.schema.fields}

    def render(name: str) -> Column:
        c = F.col(name)
        if isinstance(dtypes[name], complex_types):
            return F.coalesce(F.to_json(c), F.lit(""))
        return F.coalesce(c.cast("string"), F.lit(""))

    fm_keys = sorted(k for k in FRONT_MATTER_KEYS if k in body_cols)
    parts: list[Column] = []
    if fm_keys:
        parts.append(F.lit("---"))
        parts += [F.concat(F.lit(f"{k}: "), render(k)) for k in fm_keys]
        parts += [F.lit("---"), F.lit("")]
    parts += [F.concat(F.lit(f"{k}:: "), render(k))
              for k in body_cols if k not in fm_keys]
    return df.withColumn(out_col, F.concat_ws("\n", *parts))


def _map_in_pandas_parse(df: DataFrame, doc_id_col: str, content_col: str,
                         extracted_at: str, row_per_kv: bool) -> DataFrame:
    import pandas as pd  # executor-side import

    schema = ROW_PER_KV_SCHEMA if row_per_kv else DOCUMENT_LEVEL_SCHEMA
    cols = [f.name for f in schema.fields]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[Any] = []
            for did, content in zip(pdf[doc_id_col], pdf[content_col]):
                did = "unknown" if did is None else str(did)
                content = "" if content is None else str(content)
                if row_per_kv:
                    out.extend(tuple(r[c] for c in cols)
                               for r in parse_row_per_kv(content, did,
                                                         extracted_at))
                else:
                    d = parse_document_level(content, did, extracted_at)
                    secs = [(s["section"], s["level"],
                             [(kv["key"], kv["value"], kv["value_json"],
                               kv["ord"]) for kv in s["kv"]])
                            for s in d["sections"]]
                    out.append((d["doc_id"], d["title"], secs, d["raw_md"],
                                d["extracted_at"]))
            yield pd.DataFrame(out, columns=cols)

    projected = df.select(F.col(doc_id_col).cast("string").alias(doc_id_col),
                          F.col(content_col))
    # Python parse is the bottleneck stage: widen tiny scans so the Arrow
    # batches fan out across the executor pool instead of one task.
    return _widen(projected).mapInPandas(run, schema)


def rows_from_markdown(df: DataFrame, doc_id_col: str, content_col: str,
                       extracted_at: str = "1970-01-01T00:00:00") -> DataFrame:
    """row_per_kv storage shape: 1 doc → N (doc_id, section, key, value,
    value_json, ord, extracted_at) rows. Arrow-batched explode."""
    return _map_in_pandas_parse(df, doc_id_col, content_col, extracted_at,
                                row_per_kv=True)


def documents_from_markdown(df: DataFrame, doc_id_col: str, content_col: str,
                            extracted_at: str = "1970-01-01T00:00:00") -> DataFrame:
    """document_level storage shape: 1 doc → 1 nested row."""
    return _map_in_pandas_parse(df, doc_id_col, content_col, extracted_at,
                                row_per_kv=False)


def hybrid_from_markdown(df: DataFrame, doc_id_col: str, content_col: str,
                         extracted_at: str = "1970-01-01T00:00:00") -> DataFrame:
    """``hybrid`` structured pattern: row_per_kv ∪ document_level — flat KV
    rows (join/filter-friendly) each carrying the document-level context
    (title, per-doc section/kv cardinalities). The reference VALIDATES this
    pattern (config.py:419-443 allows structured_pattern='hybrid') but its
    parser raises on it (markdown_kv.py:386-393) — here it is routed.

    One Python parse (the document_level kernel), then JVM-side explodes:
    sections → kv, with the doc-level aggregates computed on the nested row
    BEFORE exploding so they cost nothing extra. Scan-stage only — no
    shuffle at any corpus size."""
    nested = documents_from_markdown(df, doc_id_col, content_col,
                                     extracted_at)
    return (
        nested
        .withColumn("n_sections", F.size("sections").cast("long"))
        .withColumn("n_kv", F.expr(
            "aggregate(sections, 0L, (acc, s) -> acc + size(s.kv))"))
        .select("doc_id", "title", "n_sections", "n_kv", "extracted_at",
                F.explode("sections").alias("sec"))
        .select("doc_id", "title", "n_sections", "n_kv", "extracted_at",
                F.col("sec.section").alias("section"),
                F.explode("sec.kv").alias("kv"))
        .select("doc_id", "title", "section",
                F.col("kv.key").alias("key"),
                F.col("kv.value").alias("value"),
                F.col("kv.value_json").alias("value_json"),
                F.col("kv.ord").alias("ord"),
                "n_sections", "n_kv", "extracted_at")
    )
