"""Temporal joins: distributed as-of join and bucketed range join.

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

``range_join`` covers the complementary shape: a pure time-proximity join
with NO (or low-cardinality) equality keys. Spark plans that as
BroadcastNestedLoopJoin / cartesian + filter — O(n·m) compared pairs, the
single worst plan shape at scale. Bucketing the time axis turns it into an
ordinary shuffle equi-join (the same rewrite Databricks' range-join
optimization applies under the hood, expressed here with public APIs only).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from dativo_ingest_spark.operators.util import local_df


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


def _floor_div(expr: str, divisor: int) -> F.Column:
    # floor division on BIGINT microsecond epochs. SQL `div` truncates
    # toward zero, which mis-buckets pre-1970 (negative) epochs; subtracting
    # the non-negative pmod first makes the numerator an exact multiple, so
    # `div` equals mathematical floor for any sign. All-integer: no double
    # rounding at bucket boundaries (epoch µs ~1.7e15 is within 2^53, but
    # exactness by construction beats exactness by accident).
    return F.expr(f"({expr} - pmod({expr}, {divisor})) div {divisor}")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    keys: Sequence[str] = (),
    bucket_s: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Bucketed range join: pairs where ``right_ts ∈ [left_ts + lower_s,
    left_ts + upper_s]`` (seconds; ``lower_s`` may be negative), plus
    optional equality ``keys``.

    The naive formulation — ``left.join(right, range_predicate)`` — has no
    equi-conjunct, so Spark plans BroadcastNestedLoopJoin (or a cartesian
    product): every left row compared against every right row. This instead
    quantizes the time axis into ``bucket_s``-wide buckets (default: the
    window span), explodes each left row onto the buckets its window
    covers, and equi-joins on ``(keys..., bucket)`` before applying the
    exact range predicate:

    * right rows map to their single containing bucket, so each true pair
      is produced exactly once (the left side covers any bucket at most
      once — ``sequence`` emits distinct ids);
    * left-side duplication is ``1 + ceil(span / bucket_s)`` rows (2 at the
      default width) — constant, not data-dependent;
    * the join is an ordinary shuffle equi-join: SMJ/shuffled-hash under
      AQE, map-side pushdown on both scans, skew handling as usual.

    Cost at 100 TB: one shuffle per side on ``(keys, bucket)`` with ~2×
    left amplification, versus O(n·m) pair evaluation for the BNLJ plan.
    Bucket width trades duplication (narrow) against false-candidate
    filtering (wide); the span default keeps both at ≤2×.

    Only ``how='inner'`` is supported: an outer flavor over the exploded
    left side would emit unmatched rows once per covering bucket, and the
    exact-predicate filter runs after the join. Compose with an anti-join
    for "left rows with no partner".

    Both timestamp columns are normalized via ``cast('timestamp')`` →
    ``unix_micros`` (TIMESTAMP and TIMESTAMP_NTZ inputs alike; both sides
    shift identically under NTZ, so pairing is unaffected). Column-name
    collisions are the caller's concern — pre-alias the sides (same
    contract as ``streaming.pipeline.interval_join``).
    """
    if how != "inner":
        raise ValueError(f"range_join supports how='inner' only, got {how!r}")
    if upper_s <= lower_s:
        raise ValueError(f"empty range: [{lower_s}, {upper_s}]")
    span_us = int(round((upper_s - lower_s) * 1_000_000))
    w_us = span_us if bucket_s is None else int(round(bucket_s * 1_000_000))
    if w_us <= 0:
        raise ValueError(f"bucket must be positive, got {bucket_s}")
    lo_us = int(round(lower_s * 1_000_000))
    up_us = int(round(upper_s * 1_000_000))
    keys = list(keys)

    lf = left.withColumn(
        "_l_us", F.unix_micros(F.col(left_ts).cast("timestamp")))
    rf = right.withColumn(
        "_r_us", F.unix_micros(F.col(right_ts).cast("timestamp")))
    lf = lf.withColumn(
        "_bucket",
        F.explode(F.sequence(_floor_div(f"_l_us + ({lo_us})", w_us),
                             _floor_div(f"_l_us + ({up_us})", w_us))),
    )
    rf = rf.withColumn("_bucket", _floor_div("_r_us", w_us))
    cond = lf["_bucket"] == rf["_bucket"]
    for k in keys:
        cond = (lf[k] == rf[k]) & cond
    joined = lf.join(rf, cond, "inner").filter(
        (rf["_r_us"] >= lf["_l_us"] + F.lit(lo_us))
        & (rf["_r_us"] <= lf["_l_us"] + F.lit(up_us))
    )
    out_cols = [lf[c] for c in left.columns]
    out_cols += [rf[c] for c in right.columns if c not in keys]
    return joined.select(*out_cols)


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    bucket_s: float,
    aggs: dict,
    keys: Sequence[str] = (),
    start=None,
    end=None,
    fill: str = "null",
) -> DataFrame:
    """Regular-grid time-series rollup with gap filling — the hypertable
    ``time_bucket_gapfill`` shape: aggregate per (keys, bucket), then emit
    EVERY bucket of the grid, including empty ones, so downstream charting
    / feature windows / drift monitors never mistake "no data" for
    "missing row".

    ``aggs`` maps output name -> aggregate Column evaluated over each
    bucket's rows (e.g. ``{"n": F.count("*"), "avg_v": F.avg("value")}``).
    The grid per key runs from its first to its last observed bucket;
    passing ``start``/``end`` (anything ``cast('timestamp')`` accepts)
    pins a common closed range for ALL keys instead. ``fill`` controls
    empty buckets: ``"null"`` leaves the aggregate columns NULL,
    ``"zero"`` coalesces them to 0, ``"locf"`` carries the last observed
    value forward per key (buckets before a key's first observation stay
    NULL; a genuinely-NULL observed aggregate is carried over too — the
    standard LOCF convention).

    Plan shape: one shuffle aggregates raw rows to (keys, bucket) grain;
    every later step — per-key bounds, ``sequence``+``explode`` grid, the
    left join, the LOCF window — runs over the AGGREGATED frame (n_keys ×
    n_buckets rows), never the raw corpus. At 100 TB the raw scan is paid
    once with map-side partial aggregation; grid cost is independent of
    row count. Bucketing uses the same all-integer floor-division on
    microsecond epochs as :func:`range_join` (pre-1970-safe, no double
    rounding at boundaries; TIMESTAMP and TIMESTAMP_NTZ alike). BOUND:
    with ``keys=()`` the LOCF window and the grid have a single
    partition — fine for one series, not for key-free 100 TB input.
    """
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be positive, got {bucket_s}")
    if fill not in ("null", "locf", "zero"):
        raise ValueError(f"fill must be null|locf|zero, got {fill!r}")
    if not aggs:
        raise ValueError("aggs must name at least one aggregate")
    if (start is None) != (end is None):
        raise ValueError("pass both start and end, or neither")
    keys = list(keys)
    w_us = int(round(bucket_s * 1_000_000))
    val_names = list(aggs)

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucketed = df.withColumn("_us", us).withColumn(
        "_bucket", _floor_div("_us", w_us))
    agged = bucketed.groupBy(*keys, "_bucket").agg(
        *[aggs[n].alias(n) for n in val_names])

    if start is not None:
        lo = _floor_div(f"unix_micros(cast('{start}' as timestamp))", w_us)
        hi = _floor_div(f"unix_micros(cast('{end}' as timestamp))", w_us)
        bounds = (agged.select(*keys).distinct()
                  .withColumn("_lo", lo).withColumn("_hi", hi))
    else:
        bounds = agged.groupBy(*keys).agg(
            F.min("_bucket").alias("_lo"), F.max("_bucket").alias("_hi"))
    grid = bounds.select(
        *keys, F.explode(F.sequence("_lo", "_hi")).alias("_bucket"))

    filled = grid.join(agged, [*keys, "_bucket"], "left")
    if fill == "zero":
        from pyspark.sql.types import NumericType

        non_numeric = [
            n for n in val_names
            if not isinstance(agged.schema[n].dataType, NumericType)]
        if non_numeric:
            raise ValueError(
                f"fill='zero' needs numeric aggregates; {non_numeric} are "
                "not — use fill='null' or 'locf'")
        filled = filled.select(
            *keys, "_bucket",
            *[F.coalesce(F.col(n),
                         F.lit(0).cast(agged.schema[n].dataType)).alias(n)
              for n in val_names])
    elif fill == "locf":
        from pyspark.sql.window import Window

        w = (Window.partitionBy(*keys).orderBy("_bucket")
             .rowsBetween(Window.unboundedPreceding, 0))
        # distinguish "empty bucket" from "observed NULL aggregate": wrap
        # each OBSERVED bucket's values in a non-null struct (membership
        # marker), carry the struct forward, then unpack — an observed row
        # overwrites even when its values are NULL, a gap inherits.
        observed = agged.withColumn(
            "_obs", F.struct(*[F.col(n) for n in val_names]))
        filled = (
            grid.join(observed.drop(*val_names), [*keys, "_bucket"], "left")
            .withColumn("_carried", F.last("_obs", ignorenulls=True).over(w))
            .select(
                *keys, "_bucket",
                *[F.col("_carried")[n].alias(n) for n in val_names])
        )
    return filled.select(
        *keys,
        F.timestamp_micros(F.col("_bucket") * F.lit(w_us)).alias("bucket_ts"),
        *val_names,
    )


def sliding_day_membership(
    df: DataFrame,
    ts_col: str,
    window_days: int,
    out_col: str = "window_day",
) -> DataFrame:
    """Explode each row into every trailing ``window_days``-day window
    that contains it: a row on day d belongs to the windows ENDING on
    days d .. d+window_days-1. ``out_col`` is the integer epoch-day the
    window ends on.

    This is the scalable shape for sliding-window DISTINCT aggregates
    (distinct is not subtractable, so no incremental trick exists):
    explode by the window/slide ratio once, then one grouped
    count-distinct — versus re-scanning the corpus per window offset.
    The explosion factor IS the cost model (x window_days for daily
    slide); it happens scan-stage before the single shuffle, and
    Catalyst folds the distinct into a two-level (window, value)
    partial aggregate. Algebraic aggregates (sum/count) should NOT pay
    this — use a plain bucket rollup + windowed frame sum instead; this
    operator exists for the holistic ones.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    day = F.expr(
        f"unix_micros(CAST(`{ts_col}` AS TIMESTAMP)) div 86400000000")
    return df.withColumn(
        out_col,
        F.explode(F.sequence(day, day + F.lit(int(window_days) - 1))))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tie_col: str | None = None,
) -> DataFrame:
    """Batch sessionization: split each user's event stream into
    sessions separated by silence longer than ``gap_seconds``.

    Returns one row per session: (user, session_start, session_end,
    n_events). The classic lag-flag/running-sum construction — a new
    session starts where the gap to the previous event exceeds the
    threshold; the running sum of start flags is the session ordinal;
    one groupBy collapses to session grain. Gap arithmetic in integer
    epoch-micros so engines agree exactly. Mid-session timestamp ties
    produce a zero gap regardless of their relative order, but a tie ON
    a session's first event makes the running sum order-sensitive
    (which tied row carries the start flag varies) — pass ``tie_col``
    (any unique column, e.g. the event id) whenever duplicate
    (user, ts) pairs can occur.

    Scale: ONE user-keyed exchange — both window frames and the final
    aggregate reuse the same partitioning (Catalyst plans a single
    Exchange; the windows are O(1)-state running frames). Power-law
    users cost a longer sorted partition scan, never a blowup.
    """
    from pyspark.sql.window import Window as _W

    us = F.expr(f"unix_micros(CAST(`{ts_col}` AS TIMESTAMP))")
    gap_us = int(gap_seconds) * 1_000_000
    order = ["us"] + ([ "_tie"] if tie_col else [])
    w = _W.partitionBy("user").orderBy(*order)
    run = w.rowsBetween(_W.unboundedPreceding, _W.currentRow)
    cols = [F.col(user_col).alias("user"), us.alias("us")]
    if tie_col:
        cols.append(F.col(tie_col).alias("_tie"))
    return (
        df.select(*cols)
        .withColumn(
            "_new",
            F.when(
                F.lag("us").over(w).isNull()
                | (F.col("us") - F.lag("us").over(w) > gap_us),
                F.lit(1)).otherwise(F.lit(0)))
        .withColumn("_sid", F.sum("_new").over(run))
        .groupBy("user", "_sid")
        .agg(
            F.timestamp_micros(F.min("us")).alias("session_start"),
            F.timestamp_micros(F.max("us")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_sid")
    )


def sessionize_incremental(
    state: DataFrame | None,
    batch: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tie_col: str | None = None,
):
    """Incremental sessionization over cursor-ordered batches: merge a
    new batch's sessions with the carried per-user OPEN-session state,
    WITHOUT rescanning history (the batch analog of the streaming
    sessionizer in streaming/pipeline.py, for pipelines that land data
    in cursor-ordered batch loads — operators/incremental.py's
    contract: every batch event is later than every state event for
    its user).

    ``state`` holds each user's LAST session (the only one a later
    event can extend). Returns ``(closed, new_state)``:

    * ``closed`` — sessions that can never extend again: the batch's
      non-final sessions, plus carried state that a user's new activity
      failed to merge with. State for users ABSENT from the batch stays
      open in ``new_state`` (emit it at end-of-stream).
    * ``new_state`` — the new last session per active user (merged with
      carried state when the batch's first event falls within
      ``gap_seconds`` of the carried end), plus untouched state of
      inactive users.

    Invariant (pinned in tests): closed-so-far ∪ new_state ==
    :func:`sessionize` over all data seen — incremental and full
    recompute are path-equal.

    Scale: per-batch cost is one batch sessionization (one user-keyed
    exchange of the BATCH) plus user-keyed joins of batch-session
    boundaries against the state table — both sized by batch users ∪
    state users, never by event history. This is the same
    cost-∝-batch/churn contract as operators/rollup.py.
    """
    gap_us = int(gap_seconds) * 1_000_000
    bs = sessionize(batch, user_col, ts_col, gap_seconds, tie_col=tie_col)
    cols = ["user", "session_start", "session_end", "n_events"]
    if state is None:
        state = local_df(bs.sparkSession, 
            [], bs.select(*cols).schema)
    state = state.select(*cols)
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("user").orderBy(F.col("session_start"))
    marked = (
        bs.withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "_last",
            F.col("_rk") == F.max("_rk").over(_W.partitionBy("user")))
    )
    first = marked.filter(F.col("_rk") == 1).select(
        "user",
        F.col("session_start").alias("f_start"),
        F.col("session_end").alias("f_end"),
        F.col("n_events").alias("f_n"),
    )
    st = state.join(first, "user", "left")
    merged_state = st.filter(
        F.col("f_start").isNotNull()
        & (F.unix_micros(F.col("f_start"))
           - F.unix_micros(F.col("session_end")) <= gap_us))
    closed_state = st.filter(
        F.col("f_start").isNotNull()
        & (F.unix_micros(F.col("f_start"))
           - F.unix_micros(F.col("session_end")) > gap_us)
    ).select(*cols)
    idle_state = st.filter(F.col("f_start").isNull()).select(*cols)
    # extend each merged user's FIRST batch session backwards onto the
    # carried state (start/count from both sides; end is the batch's)
    merge_map = merged_state.select(
        "user",
        F.col("session_start").alias("m_start"),
        F.col("n_events").alias("m_n"),
    )
    # user-keyed join (merge_map is bounded by the batch's merged users;
    # AQE broadcasts it when small, and the window above already left
    # `marked` user-partitioned, so no extra exchange on the big side)
    adjusted = (
        marked.join(merge_map, "user", "left")
        .select(
            "user",
            F.when((F.col("_rk") == 1) & F.col("m_start").isNotNull(),
                   F.col("m_start"))
            .otherwise(F.col("session_start")).alias("session_start"),
            "session_end",
            (F.col("n_events")
             + F.when((F.col("_rk") == 1) & F.col("m_n").isNotNull(),
                      F.col("m_n")).otherwise(F.lit(0)))
            .alias("n_events"),
            "_last",
        )
    )
    closed = (adjusted.filter(~F.col("_last")).select(*cols)
              .unionByName(closed_state))
    new_state = (adjusted.filter(F.col("_last")).select(*cols)
                 .unionByName(idle_state))
    return closed, new_state


def sliding_distinct_hll(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Approximate trailing-window distinct via MERGEABLE HLL sketches —
    the 100 TB swap :func:`sliding_day_membership` documents: instead of
    exploding every row x window_days for an exact holistic distinct,
    sketch each day ONCE (hll_sketch_agg — Apache DataSketches, KBs of
    state), then union the trailing frame's sketches per window
    (hll_union_agg over a rows frame) and estimate. Cost: one (day)-
    keyed partial-agg shuffle of KB sketches + a day-grain window —
    independent of both row count and distinct cardinality; the daily
    sketches persist and EXTEND incrementally (yesterday's sketches
    never recompute).

    (window_day, approx_distinct) — the estimate is deterministic for a
    given dataset but NOT engine-portable; gate queries compare the
    within-tolerance boolean against the exact count (the
    approx_distinct_check contract).
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    day = F.expr(
        f"unix_micros(CAST(`{ts_col}` AS TIMESTAMP)) div 86400000000")
    daily = (df.select(day.alias("window_day"), F.col(key_col).alias("k"))
             .groupBy("window_day")
             .agg(F.hll_sketch_agg("k").alias("sk")))
    # RANGE frame on the integer day so calendar gaps don't widen the
    # window (a rows frame would span more days when days are missing)
    w = (Window.orderBy("window_day")
         .rangeBetween(-(window_days - 1), Window.currentRow))
    return daily.select(
        "window_day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
        .cast("long").alias("approx_distinct"))
