"""Temporal joins: distributed as-of join.

Spark has no ASOF JOIN; the naive formulation (theta-join on ``l.ts >=
r.ts`` + row_number) materializes O(n·m) pairs per key before pruning. This
implements the classic scalable form instead: union both sides tagged,
window-sort per key, and forward-fill the right payload — for each left row
the filled value is exactly the latest right row with ``right.ts <=
left.ts`` (ties match: right rows order before left rows at equal
timestamps).

Cost at scale: ONE shuffle on the equality keys + an in-partition sort —
identical to a regular co-partitioned join; no pair blow-up, no Python.
Skewed keys behave like any keyed window (AQE/salting apply). Tolerance is
a post-fill null-out, not a join-shape change.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    tolerance: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: latest right row with ``right.on <= left.on`` per
    ``by`` group (inclusive). Unmatched left rows keep nulls.

    Right payload columns come back suffixed; the matched right timestamp is
    ``{on}{suffix}``. ``tolerance`` (an INTERVAL literal body, e.g.
    ``'2 hours'``) nulls matches older than ``left.on - tolerance``.

    Right rows that tie on (by, on) are resolved arbitrarily — pre-aggregate
    the right side to unique keys for deterministic output (DuckDB's native
    ASOF has the same caveat, which keeps the two oracle-comparable).
    """
    by = list(by)
    rp = [c for c in right.columns if c not in by and c != on]
    l_cols = [c for c in left.columns if c not in by]
    matched = [f"{on}{suffix}"] + [f"{c}{suffix}" for c in rp]
    # The whole matched right row travels as ONE struct so the forward fill
    # can never tear it: last(_m, ignorenulls) picks a single right row per
    # left row even when individual right payload columns are NULL (a
    # per-column fill would mix values from different right rows).
    m_struct = F.struct(
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rp],
    )
    m_type = right.select(m_struct.alias("_m")).schema["_m"].dataType
    lpart = left.select(
        *by,
        *[F.col(c) for c in l_cols],
        F.col(on).alias("_t"),
        F.lit(1).alias("_is_l"),
        F.lit(None).cast(m_type).alias("_m"),
    )
    rpart = right.select(
        *by,
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_cols],
        F.col(on).alias("_t"),
        F.lit(0).alias("_is_l"),
        m_struct.alias("_m"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("_t", "_is_l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lpart.unionByName(rpart).select(
        *by,
        *l_cols,
        "_is_l",
        F.last("_m", ignorenulls=True).over(w).alias("_m"),
    )
    out = filled.filter(F.col("_is_l") == 1)
    if tolerance is not None:
        # Null the whole struct — all matched columns drop together.
        ok = F.col("_m")[f"{on}{suffix}"] >= F.col(on) - F.expr(
            f"INTERVAL {tolerance}"
        )
        out = out.withColumn("_m", F.when(ok, F.col("_m")))
    return out.select(
        *by,
        *l_cols,
        *[F.col("_m")[c].alias(c) for c in matched],
    )
