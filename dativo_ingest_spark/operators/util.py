"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the scan produced fewer partitions than
    cores (tiny/single-file inputs) so expression- or Python-heavy pipeline
    stages use the whole executor pool. No-op at scale, where scans already
    have ample partitions — the check costs a plan inspection, never a job."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

#: target rows per parquet file for incremental index appends — per-batch
#: entry sets are tiny relative to the shuffle partition count, and an
#: un-coalesced append fragments the index into one near-empty file per
#: partition per batch (compaction debt + listing cost on every read).
INDEX_APPEND_ROWS_PER_FILE = 1_000_000


def index_append_partitions(n_rows: int) -> int:
    """File count for an index append of ``n_rows`` entry rows."""
    return max(1, -(-int(n_rows) // INDEX_APPEND_ROWS_PER_FILE))
