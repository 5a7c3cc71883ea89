"""JSONL (newline-delimited JSON) contract source.

Absent from the reference's registry (its file family is CSV-only), but the
same contract semantics apply unchanged, so the source rides the identical
machinery: driver-side mtime-skip listing → all-string read → NA-sentinel
nulling → strict/warn contract validation. Reading primitives as strings
(``primitivesAsString``) defers ALL typing to the coercion ladder, exactly
like the CSV path's ``dtype=str`` analog (csv_extractor.py:170), so a job
can switch a source between csv and jsonl without changing its asset
contract or its failure modes.

Nested values (objects/arrays) degrade to their JSON text — the
reference's rule for complex values everywhere (markdown_kv.py:231-234,
mysql BLOBs): unknown shapes become strings, never load errors.

Scale: ``spark.read.json`` with an explicit schema skips the sampling
inference pass entirely (one read, not two), stays fully distributed and
splittable per line, and Catalyst prunes unreferenced JSON fields at the
parser level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dativo_ingest_spark.config.contracts import AssetDefinition
from dativo_ingest_spark.functions.coercion import NA_SENTINELS, null_na_sentinels
from dativo_ingest_spark.operators import validation
from dativo_ingest_spark.sources.csv_source import changed_files


def read_jsonl(
    spark: SparkSession,
    paths: list[str] | str,
    asset: AssetDefinition | None = None,
    options: dict | None = None,
    na_sentinels: tuple[str, ...] = NA_SENTINELS,
) -> DataFrame:
    """All-string JSONL read: primitives as strings, nested values as JSON
    text, contract columns appended as nulls when absent from the data
    (the CSV path's trailing-column rule). Keys that only appear in some
    files surface as nulls elsewhere — ``spark.read.json`` unions keys
    across files by construction, the warn-mode column-union for free."""
    opts = {k: str(v) for k, v in (options or {}).items()}
    opts.setdefault("primitivesAsString", "true")
    if isinstance(paths, str):
        paths = [paths]
    df = spark.read.options(**opts).json(paths)
    # Malformed lines: PERMISSIVE mode admits them as all-null rows and
    # grows a corrupt-record column. Unless the caller asked for that
    # column explicitly, drop it so it never leaks into the target as a
    # data column — the all-null row remains, which strict mode rejects
    # via required-field checks (exit 2) and warn mode flags, the same
    # failure shape as an unparseable CSV row. Pass mode=FAILFAST in
    # options to hard-fail the read instead.
    corrupt_col = opts.get("columnNameOfCorruptRecord", "_corrupt_record")
    if "columnNameOfCorruptRecord" not in opts and corrupt_col in df.columns:
        df = df.drop(corrupt_col)
    for name, dtype in df.dtypes:
        if not dtype.startswith("string"):
            # nested object/array → its JSON text (string degradation rule)
            df = df.withColumn(name, F.to_json(F.col(name)))
    if asset is not None:
        present = set(df.columns)
        for fname in asset.field_names():
            if fname not in present:
                df = df.withColumn(fname, F.lit(None).cast(T.StringType()))
    for c in df.columns:
        df = df.withColumn(c, null_na_sentinels(df[c], na_sentinels))
    return df


def extract(
    spark: SparkSession,
    pattern: str,
    asset: AssetDefinition,
    mode: str = "strict",
    options: dict | None = None,
    seen: dict[str, float] | None = None,
    lookback_days: float = 0.0,
) -> validation.ValidationResult | None:
    """Full source pipeline, mirroring csv_source.extract: changed-file
    diff → all-string read → contract validation split. None when every
    file was skipped."""
    files = changed_files(pattern, seen, lookback_days)
    if not files:
        return None
    df = read_jsonl(spark, files, asset, options)
    return validation.validate(df, asset, mode)
