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
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join (pandas ``merge_asof`` directions) per ``by`` group.

    * ``backward`` (default): latest right row with ``right.on <= left.on``
      (inclusive) — the classic as-of.
    * ``forward``: earliest right row with ``right.on >= left.on``.
    * ``nearest``: the closer of the two; exact-distance ties resolve
      backward. Costs a second in-partition sort over the SAME shuffle
      (both fills share one Exchange on the keys).

    Unmatched left rows keep nulls. Right payload columns come back
    suffixed; the matched right timestamp is ``{on}{suffix}``.
    ``tolerance`` (an INTERVAL literal body, e.g. ``'2 hours'``) nulls
    matches outside the window on the relevant side(s).

    Right rows that tie on (by, on) are resolved arbitrarily — pre-aggregate
    the right side to unique keys for deterministic output (DuckDB's native
    ASOF has the same caveat, which keeps the two oracle-comparable).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}")
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
    # Both fills sort (ts, right-before-left-at-ties) — ascending for the
    # backward fill, descending for the forward fill. Same partitioning
    # either way, so `nearest` reuses one Exchange with a second sort.
    wb = (
        Window.partitionBy(*by)
        .orderBy("_t", "_is_l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t").desc(), "_is_l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lpart.unionByName(rpart)
    fills = []
    if direction in ("backward", "nearest"):
        fills.append(F.last("_m", ignorenulls=True).over(wb).alias("_mb"))
    if direction in ("forward", "nearest"):
        fills.append(F.last("_m", ignorenulls=True).over(wf).alias("_mf"))
    filled = unioned.select(*by, *l_cols, "_is_l", "_t", *fills)
    out = filled.filter(F.col("_is_l") == 1)

    ts_key = f"{on}{suffix}"
    if direction == "backward":
        out = out.withColumn("_m", F.col("_mb"))
    elif direction == "forward":
        out = out.withColumn("_m", F.col("_mf"))
    else:
        # timestamp subtraction yields a day-time interval and compares
        # natively — works for TIMESTAMP and TIMESTAMP_NTZ alike
        # (unix_micros would reject the NTZ type bare parquet reads infer)
        db = F.col("_t") - F.col("_mb")[ts_key]
        df_ = F.col("_mf")[ts_key] - F.col("_t")
        out = out.withColumn(
            "_m",
            F.when(F.col("_mb").isNull(), F.col("_mf"))
            .when(F.col("_mf").isNull(), F.col("_mb"))
            .when(df_ < db, F.col("_mf"))        # ties (df_ == db) go backward
            .otherwise(F.col("_mb")),
        )
    if tolerance is not None:
        # Null the whole struct — all matched columns drop together.
        iv = F.expr(f"INTERVAL {tolerance}")
        matched_ts = F.col("_m")[ts_key]
        ok = F.when(
            matched_ts <= F.col(on), matched_ts >= F.col(on) - iv
        ).otherwise(matched_ts <= F.col(on) + iv)
        out = out.withColumn("_m", F.when(ok, F.col("_m")))
    return out.select(
        *by,
        *l_cols,
        *[F.col("_m")[c].alias(c) for c in matched],
    )
