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
