"""Sketch-based approximate aggregation with accuracy contracts.

At 100 TB an exact ``count(DISTINCT user)`` over a high-cardinality key is
a full shuffle of every distinct value; the HyperLogLog++ sketch replaces
it with a fixed-size (≤ a few KB) mergeable state per group — partial
sketches combine map-side, so the exchange moves kilobytes per group
regardless of corpus size. The price is a relative error ~1.04/sqrt(2^p);
this module makes that contract *checkable* by computing the sketch and
the exact count side by side and emitting a per-group pass/fail.

In production the exact column is dropped and only the sketch runs; the
paired form exists so the accuracy claim is a regression-testable output
(and a driver-provable query) rather than folklore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_check(
    df: DataFrame,
    group_col: str,
    key_col: str,
    rsd: float = 0.02,
    tolerance: float = 0.05,
) -> DataFrame:
    """(group, exact, approx_ok): HLL++ count-distinct vs the exact count.

    ``approx_ok`` is true when the sketch lands within ``tolerance``
    relative error of the exact count. The sketch estimate itself is
    deterministic for a given dataset (hash-based, seed-free) but NOT
    portable across engines, so the boolean — not the estimate — is the
    comparable output.
    """
    return (
        df.groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count_distinct(F.col(key_col)).alias("exact"),
            F.approx_count_distinct(F.col(key_col), rsd).alias("_approx"),
        )
        .select(
            "group",
            "exact",
            (
                F.abs(F.col("_approx") - F.col("exact"))
                <= F.lit(float(tolerance)) * F.col("exact")
            ).alias("approx_ok"),
        )
    )


def approx_quantile_rank_check(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q: float = 0.5,
    accuracy: int = 10000,
    rank_tolerance: float = 0.05,
) -> DataFrame:
    """(group, n, rank_ok): percentile_approx honored as a RANK contract.

    Quantile sketches (Spark's Greenwald-Khanna variant, t-digest, KLL)
    guarantee rank error — the returned value sits within ``eps·n`` ranks
    of the true q-quantile — not value error, so the checkable contract is
    rank-based: the fraction of values <= the sketch's answer must lie
    within ``rank_tolerance`` of ``q``.  Computed as a second aggregate
    over the same grouping key with the (group, quantile) frame broadcast
    back — two shuffles total, both on the group key; state per group is
    O(1/eps), so the exchange moves KB per group at any corpus size.
    """
    # percentile_approx ignores nulls, so the rank fraction must count
    # only non-null values too — otherwise a group with nulls spuriously
    # fails the contract even when the sketch met its guarantee
    vals = df.select(
        F.col(group_col).alias("group"), F.col(value_col).alias("_v")
    ).filter(F.col("_v").isNotNull())
    qv = (
        vals.groupBy("group")
        .agg(F.percentile_approx(F.col("_v"), q, accuracy).alias("_qv"))
    )
    return (
        vals.join(F.broadcast(qv), "group")
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.abs(
                    F.sum((F.col("_v") <= F.col("_qv")).cast("long"))
                    .cast("double") / F.count(F.lit(1)) - F.lit(float(q))
                ) <= F.lit(float(rank_tolerance))
            ).alias("rank_ok"),
        )
    )
