"""Training-shard export: shuffle a curated corpus into N deterministic
shards, write them, and emit a verifiable manifest.

The last mile of every LLM-data pipeline: after dedup/filter/sample, the
corpus ships to the trainer as fixed-count shards (webdataset tars,
Megatron bins, parquet shards — the container varies, the contract
doesn't): assignment must be DETERMINISTIC (a re-run after a crash must
produce byte-identical shards), balanced without a global sort, and
auditable (the trainer verifies the manifest before burning GPU hours).

Design for 100 TB:

* shard assignment is ``md5(seed || id) % n_shards`` — no global sort,
  no row_number over everything, balanced in expectation at any scale;
  re-runs, retries and AQE re-plans land every row in the same shard.
* intra-shard order is the same hash (the epoch-shuffle trick
  operators/sampling.epoch_shuffle uses): one ``repartition(shard) +
  sortWithinPartitions`` shuffle writes each shard as one contiguous,
  deterministically-ordered parquet directory.
* the manifest is computed from the FILES READ BACK, not the pre-write
  plan — it proves the round trip: per shard (n_rows, n_tokens,
  hash_sum) where hash_sum folds each row's md5-derived uint32 with an
  order-insensitive exact BIGINT sum any engine can replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from dativo_ingest_spark.operators.util import local_df


def _shard_hash(id_col: str, seed: str) -> F.Column:
    """uint32 from md5(seed || '_' || id) — the engine-portable hash
    (md5 is md5 everywhere; DuckDB replays it as
    ``CAST(('0x' || substr(md5(...), 1, 8)) AS BIGINT)``)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("_", F.lit(seed),
                                      F.col(id_col).cast("string"))), 1, 8),
        16, 10,
    ).cast("long")


def export_training_shards(
    df: DataFrame,
    id_col: str,
    token_col: str,
    out_dir: str,
    n_shards: int = 8,
    seed: str = "epoch0",
    fmt: str = "parquet",
) -> DataFrame:
    """Write ``df`` as ``n_shards`` deterministic shards under
    ``out_dir`` (hive layout ``shard=K``) and return the read-back
    manifest: (shard, n_rows, n_tokens, hash_sum, min_id).

    The manifest scans the WRITTEN files, so a green manifest proves
    assignment + write + read round-trip together. ``hash_sum`` is the
    per-shard sum of each row's md5-uint32 — order-insensitive, exact
    BIGINT (uint32 sums stay under 2^53 past 10^9 rows/shard), so any
    engine can recompute it from the logical corpus and any later
    reader can audit a shard without trusting this writer.

    ``fmt``: ``parquet`` (snappy — the serving/audit default) or
    ``jsonl`` (newline-delimited JSON, the container most tokenizer /
    trainer loaders stream directly). Assignment, intra-shard order,
    the manifest contract and :func:`audit_shards` are format-neutral;
    jsonl trades size for zero-dependency readability.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be parquet or jsonl, got {fmt!r}")
    spark = df.sparkSession
    h = _shard_hash(id_col, seed)
    staged = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(token_col).cast("long"), F.lit(0))
        .alias("n_tokens"),
        h.alias("_h"),
        (h % n_shards).cast("long").alias("shard"),
    )
    # sort key leads with the partition column: the dynamic-partition
    # writer re-sorts rows by partition columns (non-stably) when the
    # incoming order doesn't already satisfy it, which would silently
    # destroy the deterministic (_h, id) order inside each shard file
    writer = (staged.repartition(n_shards, "shard")
              .sortWithinPartitions("shard", "_h", "id")
              .write.mode("overwrite").partitionBy("shard"))
    if fmt == "jsonl":
        writer.json(out_dir)
        # explicit schema: JSON round-trips longs fine, but inference
        # would cost an extra pass and could widen id's type
        back = (spark.read
                .schema(staged.drop("shard").schema)
                .option("basePath", out_dir)
                .json(f"{out_dir}/shard=*"))
    else:
        writer.option("compression", "snappy").parquet(out_dir)
        back = spark.read.parquet(out_dir)
    return (back.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.sum("_h").alias("hash_sum"),
                 F.min("id").alias("min_id"))
            .select(F.col("shard").cast("long").alias("shard"),
                    "n_rows", "n_tokens", "hash_sum", "min_id",
                    # container format recorded IN the manifest (ADVICE
                    # r12): the audit reads it from here instead of
                    # sniffing part-file extensions with os.listdir,
                    # which bound audits to local filesystem paths
                    F.lit(fmt).alias("fmt")))


def export_sorted_shards(
    df: DataFrame,
    id_col: str,
    sort_col: str,
    out_dir: str,
    n_shards: int = 8,
    exact_cuts: bool = False,
) -> DataFrame:
    """Totally-ordered export WITHOUT a single-task global sort: fit
    ``n_shards - 1`` quantile cut points on ``sort_col`` in one
    aggregate pass (mergeable-sketch quantiles by DEFAULT — exact
    ``percentile`` holds every value in one aggregation buffer, so the
    sketch is the 100 TB path; pass ``exact_cuts=True`` only when the
    cut values themselves must replay bit-for-bit, e.g. an
    oracle-pinned gate), assign each row its range shard by a literal
    ``<=`` cascade (scan-stage, deterministic — unlike
    ``repartitionByRange``, whose reservoir sample moves with the input
    partitioning), sort within each shard, write. Reading shards
    0..N-1 in order yields the globally sorted corpus — the layout a
    binary-searchable / range-prunable serving copy needs.

    Returns the read-back manifest (shard, n_rows, min_key, max_key)
    and RAISES if any two shards' [min, max] key ranges interleave —
    the global-order contract is checked against the WRITTEN files,
    not assumed from the plan. Ties exactly on a cut edge all land in
    the lower shard (the cascade is ``<=``), so ranges can touch at a
    shared boundary value but never cross it with a third shard.

    .. versionchanged:: round 10
        The ``exact_cuts`` DEFAULT flipped True -> False (sketch
        quantiles). Every row is still exported exactly once and the
        global order still holds, but the CUT POINTS — and therefore
        which shard a given row lands in — can differ from layouts
        written under the old default. A caller re-exporting next to a
        pre-flip layout who needs byte-identical shard boundaries must
        pass ``exact_cuts=True`` explicitly (the oracle-pinned gate
        query does).
    """
    from dativo_ingest_spark.operators.quality import (
        apply_equi_depth_bins, equi_depth_edges)

    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    spark = df.sparkSession
    staged = df.select(F.col(id_col).alias("id"),
                       F.col(sort_col).cast("double").alias("k"))
    if n_shards == 1:
        staged = staged.withColumn("shard", F.lit(0).cast("long"))
    else:
        edges = equi_depth_edges(staged, "k", n_shards, exact=exact_cuts)
        staged = apply_equi_depth_bins(staged, "k", edges,
                                       out_col="shard")
    # sort key must LEAD with the partition column: the dynamic-
    # partition writer requires rows sorted by partition columns and
    # inserts its own (non-stable) sort when they aren't — which would
    # silently destroy the k order inside each shard file
    (staged.repartition(n_shards, "shard")
     .sortWithinPartitions("shard", "k", "id")
     .write.mode("overwrite").partitionBy("shard")
     .option("compression", "snappy").parquet(out_dir))
    back = spark.read.parquet(out_dir)
    manifest = (back.groupBy("shard")
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.min("k").alias("min_key"),
                     F.max("k").alias("max_key"))
                .select(F.col("shard").cast("long").alias("shard"),
                        "n_rows", "min_key", "max_key")
                .orderBy("shard"))
    rows = manifest.collect()
    for lo, hi in zip(rows, rows[1:]):
        if hi.min_key is not None and lo.max_key is not None \
                and hi.min_key < lo.max_key:
            raise AssertionError(
                f"global order violated: shard {lo.shard} max "
                f"{lo.max_key} > shard {hi.shard} min {hi.min_key}")
    out = local_df(
        spark,
        [(r.shard, r.n_rows, r.min_key, r.max_key) for r in rows],
        "shard bigint, n_rows bigint, min_key double, max_key double")
    # persist the manifest next to the shards: range-pruned readers
    # (read_sorted_range) consult it instead of opening every footer
    out.write.mode("overwrite").parquet(f"{out_dir}/manifest")
    return out


def _container_is_jsonl(spark, recorded_fmt, glob_pattern: str) -> bool:
    """True when the shard layout's container is jsonl. Prefers the
    format RECORDED in the manifest at export time (r13, ADVICE r12);
    legacy layouts without it are sniffed through the Hadoop FileSystem
    API — URI-neutral (s3a://, hdfs://, file:/), unlike the old
    glob/os.listdir sniff which only worked on local paths even though
    the actual data reads always went through Spark."""
    if recorded_fmt in ("parquet", "jsonl"):
        return recorded_fmt == "jsonl"
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(glob_pattern)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = fs.globStatus(jpath)
    names = ([str(s.getPath().getName()) for s in statuses]
             if statuses is not None else [])
    return any(n.endswith(".json") for n in names)


def audit_shards(spark, out_dir: str) -> dict:
    """Trainer-side shard audit: recompute every shard's (n_rows,
    n_tokens, hash_sum) from the SHARD FILES and compare against the
    published manifest — the check a training job runs before burning
    GPU hours on a corpus that lost a file to a partial copy. Returns
    {"shards": N, "ok": bool, "mismatches": [...]}; metadata plus one
    scan of the shard frame, no re-hash of content (the md5-uint32
    column was persisted precisely so auditors fold it cheaply)."""
    mdf = spark.read.parquet(f"{out_dir}/manifest")
    manifest = {
        int(r.shard): (int(r.n_rows), int(r.n_tokens), int(r.hash_sum))
        for r in mdf.collect()}
    # container format: recorded in the manifest at export time (r13);
    # legacy layouts without the column fall back to a URI-neutral
    # Hadoop-FS sniff — the audit aggregates only need the numeric
    # columns, which JSON inference types as BIGINT. ADVICE r13: a
    # manifest holding MIXED fmt values (e.g. two exports unioned into
    # one manifest dir) would silently audit every shard under the
    # first row's format — fail loudly instead; per-format audits must
    # run per export.
    recorded = None
    if "fmt" in mdf.columns:
        fmts = sorted({str(r["fmt"]) for r in
                       mdf.select("fmt").distinct().collect()})
        if len(fmts) > 1:
            raise ValueError(
                f"manifest at {out_dir}/manifest records mixed container "
                f"formats {fmts}; audit each export separately")
        recorded = fmts[0] if fmts else None
    _is_jsonl = _container_is_jsonl(
        spark, recorded, f"{out_dir}/shard=*/*")
    _reader = spark.read.option("basePath", out_dir)
    _frame = (_reader.json(f"{out_dir}/shard=*") if _is_jsonl
              else _reader.parquet(f"{out_dir}/shard=*"))
    actual = {
        int(r.shard): (int(r.n_rows), int(r.n_tokens), int(r.hash_sum))
        # glob the shard dirs only (basePath keeps the partition
        # column): a bare read of out_dir would union in the published
        # manifest/ files themselves
        for r in (_frame
                  .groupBy("shard")
                  .agg(F.count(F.lit(1)).alias("n_rows"),
                       F.sum("n_tokens").alias("n_tokens"),
                       F.sum("_h").alias("hash_sum"))
                  .collect())}
    mismatches = []
    for shard in sorted(set(manifest) | set(actual)):
        m, a = manifest.get(shard), actual.get(shard)
        if m != a:
            mismatches.append({"shard": shard, "manifest": m, "files": a})
    return {"shards": len(manifest), "ok": not mismatches,
            "mismatches": mismatches}


def audit_streaming_shards(spark, out_dir: str) -> dict:
    """Trainer-side audit of a streaming shard layout
    (streaming/pipeline.py:shard_epoch_writer): recompute every shard's
    (n_rows, n_tokens, hash_sum) from the COMMITTED epoch directories
    and compare against the published ``manifest.json``. Scans only
    epochs the manifest references — orphan ``epoch=K`` files from a
    crash between shard write and marker publish are invisible here
    exactly as they are to readers (the replay republishes them).

    Returns {"shards": N, "epochs": M, "ok": bool, "mismatches": [...]}.
    """
    import json as _json
    import os

    with open(os.path.join(out_dir, "manifest.json")) as fh:
        man = _json.load(fh)
    epochs = man["epochs"]
    manifest = {int(k): (v["n_rows"], v["n_tokens"], v["hash_sum"])
                for k, v in man["shards"].items()}
    # an EMPTY micro-batch commits its marker (exactly-once bookkeeping)
    # without writing an epoch directory — scan only the epochs that
    # produced data, or the read fails on the phantom path
    data_epochs = [e for e in epochs
                   if os.path.isdir(os.path.join(out_dir, f"epoch={e}"))]
    actual: dict = {}
    if data_epochs:
        # container format: recorded in manifest.json at export time
        # (r13); legacy manifests fall back to the Hadoop-FS sniff
        is_jsonl = _container_is_jsonl(
            spark, man.get("format"),
            f"{out_dir}/epoch={data_epochs[0]}/shard=*/*")
        reader = spark.read.option("basePath", out_dir)
        paths = [f"{out_dir}/epoch={e}" for e in data_epochs]
        # NB: DataFrameReader.json takes a LIST (a second positional
        # arg would be parsed as a schema); .parquet takes varargs
        df = reader.json(paths) if is_jsonl else reader.parquet(*paths)
        actual = {
            int(r.shard): (int(r.n_rows), int(r.n_tokens),
                           int(r.hash_sum))
            for r in (df.groupBy("shard")
                      .agg(F.count(F.lit(1)).alias("n_rows"),
                           F.sum("n_tokens").alias("n_tokens"),
                           F.sum("_h").alias("hash_sum"))
                      .collect())}
    mismatches = []
    for shard in sorted(set(manifest) | set(actual)):
        m, a = manifest.get(shard), actual.get(shard)
        if m != a:
            mismatches.append({"shard": shard, "manifest": m, "files": a})
    return {"shards": len(manifest), "epochs": len(epochs),
            "ok": not mismatches, "mismatches": mismatches}


def read_sorted_range(spark, out_dir: str, lo: float,
                      hi: float) -> DataFrame:
    """Range-pruned read over an :func:`export_sorted_shards` layout:
    consult the persisted manifest, open ONLY the shards whose
    [min_key, max_key] overlap [lo, hi], then row-filter — the serving
    read the sorted layout exists for (at 100 TB a narrow range touches
    one shard of thousands; a plain filter would still scan every
    file's footer). Returns the (id, k, shard) rows in range.
    """
    if lo > hi:
        raise ValueError("lo must be <= hi")
    man = spark.read.parquet(f"{out_dir}/manifest").collect()
    picked = [int(r.shard) for r in man
              if r.min_key is not None and r.max_key is not None
              and not (r.max_key < lo or r.min_key > hi)]
    if not picked:
        return local_df(spark, [], "id bigint, k double, shard bigint")
    df = (spark.read.option("basePath", out_dir)
          .parquet(*[f"{out_dir}/shard={s}" for s in sorted(picked)]))
    return (df.filter((F.col("k") >= lo) & (F.col("k") <= hi))
            .select("id", "k", F.col("shard").cast("long").alias("shard")))
