"""``dativo check`` / ``dativo discover`` analogs.

Reference: connection tests (``cli.py:1243-1599``) and stream listing
(``cli.py:1602-1846``). Driver-side probes — no job execution, no writes;
each source type answers "can I connect?" and "what streams/columns exist?".
JDBC sources get a config-level check only in this environment (no live
endpoints); the generated query/options from ``sources/jdbc.py`` are
returned so an operator can eyeball what would run.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Any

from pyspark.sql import SparkSession

from dativo_ingest_spark.config.contracts import SourceConfig
from dativo_ingest_spark.sources import csv_source, jdbc, mdkv_source


#: lines read per file by the jsonl column probe — bounds preflight cost
#: at O(files), not O(bytes)
PROBE_LINES = 100

#: file suffixes Spark's text reader decompresses transparently — the raw
#: local-text probe would read gibberish from these, so they force the
#: Spark-based probe fallback
_COMPRESSED_SUFFIXES = (".gz", ".bz2", ".deflate", ".zst", ".lz4", ".snappy")


def _needs_spark_probe(files: list[str], options: dict) -> bool:
    """True when the raw line-oriented text probe cannot faithfully see the
    records: a custom record separator (``lineSep``), multi-line JSON
    documents (``multiLine``), or codec-compressed files. These are
    exactly the reader options the actual ``spark.read.json`` path honors
    but ``open()`` + per-line ``json.loads`` does not."""
    if "lineSep" in options or str(
            options.get("multiLine", "")).lower() == "true":
        return True
    return any(f.lower().endswith(_COMPRESSED_SUFFIXES) for f in files)


def _probe_jsonl_columns(files: list[str],
                         max_lines: int = PROBE_LINES,
                         encoding: str = "utf-8") -> list[str]:
    """Union of top-level object keys across the first ``max_lines``
    lines of EVERY file, sorted like Spark's json schema inference.
    Malformed/non-object lines are skipped (the read path admits them as
    all-null rows; they contribute no columns either way). ``encoding``
    honors the source's reader option of the same name. Callers must
    route sources whose other reader options change record framing
    (``lineSep``/``multiLine``/compression — see ``_needs_spark_probe``)
    to the Spark-based probe instead; plain-text newline-framed files are
    the only shape this fast path is valid for."""
    import json as _json

    seen: set[str] = set()
    for path in files:
        with open(path, "r", encoding=encoding, errors="replace") as fh:
            for i, line in enumerate(fh):
                if i >= max_lines:
                    break
                line = line.strip()
                if not line:
                    continue
                try:
                    obj = _json.loads(line)
                except ValueError:
                    continue
                if isinstance(obj, dict):
                    seen.update(obj)
    return sorted(seen)


def check_source(spark: SparkSession, src: SourceConfig,
                 mode: str = "self_hosted") -> dict[str, Any]:
    """Connection/readability probe. Never raises — returns
    ``{"ok": bool, "source_type": ..., "details"/"error": ...}``.

    ``mode`` is the deployment mode and reaches the plugin factory: cloud
    mode force-jails custom_python probes exactly like the runner does —
    check/discover execute plugin code too, so they get the same sandbox
    gating (the reason custom_python is cloud-allowed at all,
    config/registry.py)."""
    try:
        if src.type == "csv":
            files = [p for p, _ in csv_source.list_csv_files(src.path)]
            if not files:
                return {"ok": False, "source_type": "csv",
                        "error": f"no files match {src.path}"}
            cols = csv_source._header_columns(spark, files[0], {
                **csv_source.DEFAULT_OPTIONS, **src.options})
            return {"ok": True, "source_type": "csv",
                    "details": {"files": len(files), "columns": cols}}
        if src.type == "parquet":
            df = spark.read.parquet(src.path)
            return {"ok": True, "source_type": "parquet",
                    "details": {"columns": df.columns}}
        if src.type == "jsonl":
            files = [p for p, _ in csv_source.list_csv_files(src.path)]
            if not files:
                return {"ok": False, "source_type": "jsonl",
                        "error": f"no files match {src.path}"}
            # probe ALL files, not files[0]: the actual read unions keys
            # across the glob, so a required column present only in later
            # files must not be reported missing (and extra columns in
            # later files must show up). BOUNDED probe — a full
            # spark.read.json over the glob would schema-infer every
            # byte, turning a preflight into an ingest-sized scan; the
            # first PROBE_LINES lines of each file cover the per-file
            # key-drift case the probe exists for (keys first appearing
            # deeper than that are missed — documented depth limit).
            # lineSep/multiLine/compressed sources fall back to the
            # Spark reader (the raw text probe would mis-frame or read
            # gibberish): full inference cost, but correct columns.
            if _needs_spark_probe(files, src.options):
                opts = {k: str(v) for k, v in src.options.items()}
                opts.setdefault("primitivesAsString", "true")
                jdf = spark.read.options(**opts).json(files)
                corrupt = opts.get("columnNameOfCorruptRecord",
                                   "_corrupt_record")
                cols = sorted(c for c in jdf.columns if c != corrupt)
            else:
                cols = _probe_jsonl_columns(
                    files,
                    encoding=str(src.options.get("encoding", "utf-8")))
            return {"ok": True, "source_type": "jsonl",
                    "details": {"files": len(files), "columns": cols}}
        if src.type == "markdown_kv":
            files = mdkv_source.list_markdown_files(src.path)
            return {"ok": bool(files), "source_type": "markdown_kv",
                    **({"details": {"files": len(files)}} if files
                       else {"error": f"no .md/.mdkv files match {src.path}"})}
        if src.type in ("postgres", "mysql", "jdbc"):
            dialect = "mysql" if src.type == "mysql" else "postgres"
            q = jdbc.build_query(
                dialect,
                src.options.get("table", "<table>"),
                schema=src.options.get("schema"),
            )
            return {"ok": False, "source_type": src.type,
                    "error": "no live database endpoint in this environment",
                    "details": {"would_run": q}}
        if src.type == "custom_python":
            # plugin check_connection through the same gated factory the
            # runner uses (reference cli.py:1243-1599 routes plugin checks;
            # sandboxed when config demands)
            from dativo_ingest_spark import plugin_sandbox

            reader = plugin_sandbox.make_reader(
                str(src.options.get("plugin", "")), dict(src.options),
                mode=mode,
                plugin_config={k: v for k, v in src.options.items()
                               if k == "sandbox"})
            res = reader.check_connection()
            return {"ok": bool(res.success), "source_type": "custom_python",
                    **({"details": {"message": res.message}} if res.success
                       else {"error": res.message})}
        return {"ok": False, "source_type": src.type,
                "error": f"unsupported source type '{src.type}'"}
    except Exception as exc:  # probe must never raise
        return {"ok": False, "source_type": src.type, "error": str(exc)}


def discover(spark: SparkSession, src: SourceConfig,
             mode: str = "self_hosted") -> list[dict[str, Any]]:
    """Stream listing: one entry per discoverable stream with its columns.
    ``mode`` gates plugin sandboxing exactly as in :func:`check_source`."""
    if src.type == "csv":
        streams = []
        for path, mtime in csv_source.list_csv_files(src.path):
            cols = csv_source._header_columns(spark, path, {
                **csv_source.DEFAULT_OPTIONS, **src.options})
            streams.append({
                "stream": os.path.splitext(os.path.basename(path))[0],
                "path": path, "modified_at": mtime, "columns": cols,
            })
        return streams
    if src.type == "parquet":
        return [{
            "stream": os.path.basename(p).removesuffix(".parquet"),
            "path": p,
            "columns": spark.read.parquet(p).columns,
        } for p in sorted(_glob.glob(src.path))]
    if src.type == "jsonl":
        # bounded per-file key probe (see _probe_jsonl_columns) — a
        # full read_jsonl here would schema-infer each file end-to-end
        return [{
            "stream": os.path.splitext(os.path.basename(p))[0],
            "path": p, "modified_at": m,
            "columns": _probe_jsonl_columns(
                [p], encoding=str(src.options.get("encoding", "utf-8"))),
        } for p, m in csv_source.list_csv_files(src.path)]
    if src.type == "markdown_kv":
        return [{
            "stream": os.path.splitext(os.path.basename(p))[0],
            "path": p, "modified_at": m,
        } for p, m in mdkv_source.list_markdown_files(src.path)]
    if src.type == "custom_python":
        from dativo_ingest_spark import plugin_sandbox

        reader = plugin_sandbox.make_reader(
            str(src.options.get("plugin", "")), dict(src.options),
            mode=mode,
            plugin_config={k: v for k, v in src.options.items()
                           if k == "sandbox"})
        return [dict(obj) for obj in reader.discover().objects]
    return []


# --- plan inspection --------------------------------------------------------

_PLAN_PATTERNS = {
    # every Exchange is a shuffle (or broadcast distribution) boundary
    "exchanges": r"\bExchange hashpartitioning",
    "broadcast_exchanges": r"\bExchange.*broadcast|BroadcastExchange",
    "broadcast_hash_joins": r"\bBroadcastHashJoin\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "cartesian_products": r"\bCartesianProduct\b|\bBroadcastNestedLoopJoin\b",
    "python_evals": r"\bArrowEvalPython\b|\bBatchEvalPython\b|\bMapInPandas\b"
                    r"|\bFlatMapGroupsInPandas\b",
    "codegen_spans": r"\*\(\d+\)",
}


def plan_summary(df) -> dict[str, Any]:
    """Plan-quality read-out for a DataFrame: the same signals the repo's
    plan gates assert (tests/test_plans.py), exposed as ops tooling —
    shuffle count, join strategies, Python boundaries, whole-stage codegen
    spans, and per-scan pushed filters + pruned columns.

    This is the ".explain() and iterate" loop as a command: a scan reading
    every column for a two-column projection, or a fact-dim join gone
    SortMergeJoin, shows up here before it costs anything at scale.
    """
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    out: dict[str, Any] = {
        key: len(re.findall(pat, plan)) for key, pat in _PLAN_PATTERNS.items()
    }
    out["codegen_spans"] = len(set(re.findall(r"\*\((\d+)\)", plan)))
    scans = []
    for m in re.finditer(r"FileScan (\w+) \[([^\]]*)\]", plan):
        entry: dict[str, Any] = {
            "format": m.group(1),
            "columns": [c.split("#")[0].strip()
                        for c in m.group(2).split(",") if c.strip()],
        }
        tail = plan[m.end():m.end() + 2000]
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", tail)
        if pf:
            # split on commas OUTSIDE parens (EqualTo(r_name,ASIA) is one)
            entry["pushed_filters"] = [
                f.strip()
                for f in re.split(r",(?![^(]*\))", pf.group(1))
                if f.strip()
            ]
        scans.append(entry)
    out["scans"] = scans
    out["aqe"] = "AdaptiveSparkPlan" in plan
    return out


def plan_query(spark: SparkSession, name: str, sf_dir: str,
               full: bool = False, execute: bool = False) -> dict[str, Any]:
    """Plan summary for a registered query (queries.py surface).

    ``execute`` runs the query to a noop sink first so AQE finalizes —
    codegen spans and runtime join/shuffle choices only exist in the FINAL
    plan (an un-executed AdaptiveSparkPlan shows the static guess)."""
    from dativo_ingest_spark.queries import QUERIES

    if name not in QUERIES:
        raise ValueError(f"unknown query '{name}'; see queries.QUERIES")
    df = QUERIES[name].fn(spark, sf_dir)
    if execute:
        # collect() executes THIS DataFrame's queryExecution (a write would
        # wrap it in a new command and leave this plan un-finalized);
        # results are discarded — size the sf_dir accordingly
        df.collect()
    doc = {"query": name, "final": bool(execute), **plan_summary(df)}
    if full:
        doc["formatted"] = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        if execute:
            # formatted explain re-renders the pre-execution adaptive plan;
            # the finalized tree (real joins, codegen ids) is executedPlan
            doc["final_plan"] = (
                df._jdf.queryExecution().executedPlan().toString())
    return doc


def contract_diff(spark: SparkSession, job, mode: str = "self_hosted"
                  ) -> dict[str, Any]:
    """Schema-drift report: observed source columns vs the asset contract.

    The pre-flight answer to "will this job's warn-mode union grow the
    table / will strict mode fail?" without ingesting anything:
    ``extra_in_source`` columns would be added by warn mode (dropped by
    strict), ``missing_in_source`` contract columns arrive as nulls —
    fatal in strict mode when required. ``ok`` is False exactly when a
    REQUIRED contract column is absent from the source (the strict-mode
    exit-2 condition, caught at probe time instead of mid-job)."""
    probe = check_source(spark, job.source, mode=mode)
    if not probe.get("ok"):
        return {"ok": False, "source_type": job.source.type,
                "error": probe.get("error", "source probe failed")}
    observed = (probe.get("details") or {}).get("columns")
    if observed is None:
        return {"ok": False, "source_type": job.source.type,
                "error": f"source type '{job.source.type}' does not "
                         "expose columns to probe"}
    contract = job.asset.field_names()
    required = {f.name for f in job.asset.required_fields()}
    missing = [f for f in contract if f not in observed]
    extra = [c for c in observed if c not in contract]
    required_missing = [f for f in missing if f in required]
    return {
        "ok": not required_missing,
        "source_type": job.source.type,
        "observed": list(observed),
        "contract": contract,
        "missing_in_source": missing,
        "required_missing": required_missing,
        "extra_in_source": extra,
        "drift": bool(missing or extra),
    }
