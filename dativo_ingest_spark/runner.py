"""Job runner: the reference's ``dativo run`` lifecycle on Spark.

Retraces ``cli.py`` §3.1 (reference ``/root/reference/src/dativo_ingest/
cli.py:285-1228``): parse/resolve config → build the extractor → validate
against the asset contract → partitioned write → commit → update incremental
state → exit code. The explicit per-batch loop disappears: the whole job is
one lazy DataFrame DAG that Catalyst optimizes and Spark executes
distributed.

Exit-code contract (``cli.py:971-983, 1123-1129``):
  0 = success; 1 = partial success (warn mode with invalid records);
  2 = failure (config error, strict-mode validation failure, source error).

Commit-then-state ordering: the reference updates cursor state *during*
extraction (``postgres_extractor.py:317-328``), which double-ingests on
mid-job failure; here state is written only after the sink commit succeeds
(idempotent with ``>=`` cursor predicates — SURVEY §4(b)).

Table properties (governance/classification/finops) are written as a JSON
sidecar ``_dativo_properties.json`` next to the parquet output — the stand-in
for Iceberg ``TBLPROPERTIES`` until a catalog is attached (documented
divergence; `config/tags.py` produces the identical dict either way).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dativo_ingest_spark import catalog as catalog_mod
from dativo_ingest_spark.config import tags as tags_mod
from dativo_ingest_spark.config.contracts import ConfigError, JobConfig
from dativo_ingest_spark.operators import incremental, validation
from dativo_ingest_spark.sinks import parquet_sink
from dativo_ingest_spark.sources import csv_source, mdkv_source

EXIT_SUCCESS = 0
EXIT_PARTIAL = 1
EXIT_FAILURE = 2


@dataclass
class JobResult:
    exit_code: int
    records_in: int = 0
    records_valid: int = 0
    records_invalid: int = 0
    error_sample: list[dict] = dc_field(default_factory=list)
    output_path: str | None = None
    partition_cols: list[str] = dc_field(default_factory=list)
    table_properties: dict[str, str] = dc_field(default_factory=dict)
    state_value: Any | None = None
    duration_s: float = 0.0
    skipped: bool = False  # every source file unchanged (mtime skip)
    catalog_status: dict[str, Any] = dc_field(default_factory=dict)

    @property
    def records_per_second(self) -> float:
        """Reference metrics.py:189-238 throughput counter."""
        return self.records_in / self.duration_s if self.duration_s else 0.0


def _state_key(job: JobConfig) -> incremental.StateKey:
    obj = job.asset.name
    return incremental.StateKey(job.tenant_id, job.source.type, obj)


def _extract(spark: SparkSession, job: JobConfig,
             store: incremental.StateStore | None) -> DataFrame | None:
    """Extractor dispatch on source.type (cli.py:453-614 analog)."""
    src = job.source
    inc = src.incremental
    key = _state_key(job)

    if src.type == "csv":
        seen = None
        if store is not None and inc.enabled and \
                inc.strategy == "file_modified_time":
            seen = store.get_file_mtimes(key)
        files = csv_source.changed_files(src.path, seen, inc.lookback_days)
        if not files:
            return None
        return csv_source.read_csv(spark, files, job.asset, src.options)

    if src.type == "parquet":
        df = spark.read.options(**{
            k: str(v) for k, v in src.options.items()
        }).parquet(src.path)
        if inc.enabled and inc.cursor_field:
            state = store.get(key, inc.cursor_field) if store else None
            start = incremental.effective_cursor_start(
                state, inc.lookback_days)
            if start is not None:
                df = df.filter(
                    incremental.cursor_predicate(inc.cursor_field, start))
        return df

    if src.type == "markdown_kv":
        seen = None
        if store is not None and inc.enabled and \
                inc.strategy == "file_modified_time":
            seen = store.get_file_mtimes(key)
        storage = src.options.get("storage", "row_per_kv")
        return mdkv_source.extract(spark, src.path, storage=storage, seen=seen)

    raise ConfigError(
        f"source type '{src.type}' is not runnable in this environment "
        "(jdbc/sheets/drive/airbyte need live endpoints; see sources/)"
    )


def run_job(
    spark: SparkSession,
    job: JobConfig,
    state_root: str | None = None,
    classification_overrides: dict[str, str] | None = None,
    governance_overrides: dict[str, Any] | None = None,
    finops_overrides: dict[str, Any] | None = None,
    catalog: "catalog_mod.BaseCatalog | None" = None,
) -> JobResult:
    """Execute one job end-to-end; never raises for data errors — the
    exit code carries the outcome (config errors raise ConfigError before
    any data is touched, matching the reference's fail-at-startup)."""
    t0 = time.perf_counter()
    store = incremental.StateStore(state_root) if state_root else None
    key = _state_key(job)

    df = _extract(spark, job, store)
    if df is None:
        return JobResult(exit_code=EXIT_SUCCESS, skipped=True,
                         duration_s=time.perf_counter() - t0)

    # markdown_kv structured shapes bypass the contract cast (their schema
    # is fixed by the parser), everything else validates against the asset.
    if job.source.type == "markdown_kv" and \
            job.source.options.get("storage", "row_per_kv") != "string":
        valid, invalid_count, sample = df, 0, []
    else:
        result = validation.validate(df, job.asset, job.validation_mode)
        invalid_count = result.invalid.count()
        sample = result.error_summary() if invalid_count else []
        if job.validation_mode == "strict" and invalid_count:
            return JobResult(
                exit_code=EXIT_FAILURE,
                records_invalid=invalid_count,
                error_sample=sample,
                duration_s=time.perf_counter() - t0,
            )
        if job.validation_mode == "warn":
            # warn mode keeps the original (pre-coercion) values alongside
            # the coerced columns (reference schema_validator.py:114-123
            # preserves originals on coercion failure) — the raw struct
            # column travels into the sink so nothing is lost.
            valid = result.valid.drop(validation.ERRORS_COL)
        else:
            valid = result.valid.drop(validation.ERRORS_COL,
                                      validation.RAW_COL)

    props = tags_mod.derive_table_properties(
        job.asset,
        classification_overrides=classification_overrides,
        governance_overrides=governance_overrides,
        finops_overrides=finops_overrides,
    )

    out_path = job.target.path
    pcols = parquet_sink.write_partitioned(
        valid,
        out_path,
        job.target.partition_by,
        target_file_size_mb=job.target.target_file_size_mb,
        mode=str(job.target.options.get("mode", "append")),
    )
    with open(os.path.join(out_path, "_dativo_properties.json"), "w") as fh:
        json.dump(props, fh, indent=2, sort_keys=True)

    n_valid = valid.count()
    n_in = n_valid + invalid_count

    # Commit-then-state: only after the write succeeded.
    state_value = None
    inc = job.source.incremental
    if store is not None and inc.enabled:
        if inc.cursor_field:
            state_value = store.commit_from(valid, key, inc.cursor_field)
        if inc.strategy == "file_modified_time" and job.source.path:
            listing = (csv_source.list_csv_files(job.source.path)
                       if job.source.type == "csv"
                       else mdkv_source.list_markdown_files(job.source.path))
            store.set_file_mtimes(key, dict(listing))

    # Catalog push after commit+state; failures never fail the job
    # (reference cli.py:1194-1205).
    catalog_status = (catalog_mod.push_after_commit(catalog, job, props)
                      if catalog is not None else {})

    return JobResult(
        exit_code=EXIT_PARTIAL if invalid_count else EXIT_SUCCESS,
        records_in=n_in,
        records_valid=n_valid,
        records_invalid=invalid_count,
        error_sample=sample,
        output_path=out_path,
        partition_cols=pcols,
        table_properties=props,
        state_value=state_value,
        duration_s=time.perf_counter() - t0,
        catalog_status=catalog_status,
    )


def run_job_file(spark: SparkSession, config_path: str,
                 state_root: str | None = None) -> JobResult:
    """``dativo run --config job.yaml`` analog."""
    try:
        job = JobConfig.from_yaml(config_path)
    except ConfigError:
        raise
    return run_job(spark, job, state_root=state_root)


def run_job_dir(spark: SparkSession, job_dir: str,
                state_root: str | None = None) -> dict[str, JobResult]:
    """``dativo run --job-dir`` analog: recursive YAML discovery, sequential
    execution, combined exit semantics (reference cli.py:121-323)."""
    results: dict[str, JobResult] = {}
    for root, _dirs, files in os.walk(job_dir):
        for fname in sorted(files):
            if fname.endswith((".yaml", ".yml")):
                path = os.path.join(root, fname)
                results[path] = run_job_file(spark, path, state_root)
    return results
