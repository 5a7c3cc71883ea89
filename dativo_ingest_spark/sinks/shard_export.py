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
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    spark = df.sparkSession
    h = _shard_hash(id_col, seed)
    staged = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(token_col).cast("long"), F.lit(0))
        .alias("n_tokens"),
        h.alias("_h"),
        (h % n_shards).cast("long").alias("shard"),
    )
    (staged.repartition(n_shards, "shard")
     .sortWithinPartitions("_h", "id")
     .write.mode("overwrite").partitionBy("shard")
     .option("compression", "snappy").parquet(out_dir))
    back = spark.read.parquet(out_dir)
    return (back.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.sum("_h").alias("hash_sum"),
                 F.min("id").alias("min_id"))
            .select(F.col("shard").cast("long").alias("shard"),
                    "n_rows", "n_tokens", "hash_sum", "min_id"))
