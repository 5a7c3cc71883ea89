"""Shuffle-topology operators: bucketed co-located joins and skew salting.

The two named techniques for 100 TB join/aggregation topology that the
rest of the engine's declarative plans don't cover by themselves:

* **Bucketing** (`write_bucketed` / `read_bucketed_join_ready`): persist a
  table pre-shuffled on its join key so every later equi-join or
  aggregation on that key is exchange-free — the "reuse a partitioning
  across stages" move. A fact table joined daily against N dimensions
  pays its shuffle once at write time instead of N times per day.
  Backed by Spark's native ``bucketBy`` catalog tables (Hive-compatible
  layout, bucket pruning, SMJ with zero Exchange when both sides share
  the bucket spec).

* **Salting** (`salted_join` / `two_phase_count`): when one join/group key
  carries a disproportionate share of rows (the null key, the megacity,
  the bot user), AQE's skew splitting handles joins it can see — but
  pre-aggregation hot keys and deliberate replication joins still need
  explicit salt. ``salted_join`` spreads the skewed LEFT side over
  ``n_salts`` sub-keys and replicates the small RIGHT side once per salt
  (deterministic — no ``rand()``, so retries/speculative tasks agree);
  ``two_phase_count`` does map-side partial → salted partial → final
  merge for grouped counts whose key histogram is pathological.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Both sides of a future join bucketed to the SAME ``num_buckets`` on
    the join key produce a SortMergeJoin with no Exchange on either side
    (and no Sort when ``sort_cols`` match). At 100 TB this converts the
    recurring fact-join shuffle into a one-time write-side cost."""
    writer = df.write.format("parquet").mode(mode) \
        .bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata rides the catalog —
    a path read would lose it)."""
    return spark.table(table)


def salt_column(key, n_salts: int):
    """Deterministic salt in [0, n_salts) from the key's own bytes (md5,
    matching the engine's portable-hash convention): stable across
    retries and engines, unlike ``rand()``-based salting."""
    return F.pmod(
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(n_salts),
    ).cast("int")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skew-heavy frame against a smaller one with explicit
    key salting: the skewed side gets a per-row salt derived from a
    uniqueness column set (all its columns), the small side is replicated
    ``n_salts``× via an exploded literal range, and the join runs on
    (keys + salt) — one hot key becomes ``n_salts`` evenly-sized shuffle
    keys. Output columns = the plain join's (salt/replica dropped).

    Use when the small side is too big to broadcast but small enough to
    replicate ``n_salts``×; for broadcast-able sides just broadcast, and
    for plain joins AQE's skew split usually suffices. Cost model:
    replication multiplies the small side's shuffle volume by
    ``n_salts`` — keep it at the smallest value that caps the hot key.

    ``how`` is restricted to join types where replicating the RIGHT side
    per salt preserves semantics: every left row carries exactly one salt,
    so inner/left/semi/anti match each left row against exactly the one
    replica sharing its salt. Right and full outer joins are rejected —
    an unmatched right row exists once per replica and would surface
    ``n_salts`` duplicate null-extended rows; salt the other side (swap
    the arguments and use ``left``) instead."""
    allowed = {"inner", "left", "leftouter", "left_outer",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti", "cross"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}) is not supported: replicating the "
            f"small side per salt emits unmatched right rows n_salts "
            f"times under right/full outer semantics. Allowed: inner, "
            f"left, left_semi, left_anti, cross — for right/full, swap "
            f"sides so the skewed frame stays on the left.")
    # salt from the whole row (concat of column hashes) so rows sharing a
    # hot key still spread; deterministic for retry safety
    row_key = F.concat_ws("|", *[F.col(c).cast("string")
                                 for c in skewed.columns])
    left = skewed.withColumn("_salt", salt_column(row_key, n_salts))
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    joined = left.join(right, [*keys, "_salt"], how)
    return joined.drop("_salt")


def two_phase_count(
    df: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    count_col: str = "n",
) -> DataFrame:
    """Grouped count immune to a pathological key histogram: first
    aggregate on (keys + salt) — the hot key's rows split across
    ``n_salts`` partial groups — then merge partials per key. Two small
    shuffles instead of one shuffle with a straggler task.

    Spark's own partial aggregation covers this when upstream partitions
    are balanced; reach for the explicit form when a prior stage already
    clustered the hot key into few partitions (e.g. reading back a
    key-partitioned layout)."""
    salted = df.withColumn(
        "_salt",
        salt_column(F.concat_ws("|", F.spark_partition_id(),
                                F.monotonically_increasing_id()), n_salts),
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(*keys).agg(
        F.sum("_partial").cast("long").alias(count_col))


def key_skew_report(df: DataFrame, key_col: str,
                    exact: bool = True) -> DataFrame:
    """One-row skew diagnostic for a prospective join/agg key: the
    numbers that decide between a plain shuffle, a broadcast, salting
    (:func:`salted_join`) or an AQE skew split — measured, not guessed.

    Columns: ``n_rows``, ``n_keys``, ``max_count``, ``p50``/``p90``/
    ``p99`` (exact interpolated percentiles of the per-key count
    distribution — integer counts interpolate on .5-exact doubles, the
    mad_outliers portability argument), ``top_key`` (string; ties to
    smallest), ``top_share_micro`` = floor(1e6 * max_count / n_rows
    + 0.5).

    Shape: one map-side-combined count per key (the only corpus-sized
    shuffle), then one tiny aggregate over the key-count frame.
    ``exact=False`` swaps the percentiles for the mergeable
    approx_percentile sketch — the 100 TB default when the KEY SPACE
    itself is huge (billions of keys make even the count frame big);
    max/top are exact either way.
    """
    pct = "percentile" if exact else "approx_percentile"
    counts = df.groupBy(F.col(key_col).cast("string").alias("_k")).agg(
        F.count(F.lit(1)).alias("_c"))
    return counts.agg(
        F.sum("_c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("_c").cast("bigint").alias("max_count"),
        F.expr(f"{pct}(_c, 0.5D)").alias("p50"),
        F.expr(f"{pct}(_c, 0.9D)").alias("p90"),
        F.expr(f"{pct}(_c, 0.99D)").alias("p99"),
        F.expr("min_by(_k, struct(-_c, _k))").alias("top_key"),
        F.expr(
            "CAST(floor(1000000.0 * max(_c) / sum(_c) + 0.5) AS BIGINT)")
        .alias("top_share_micro"),
    )
