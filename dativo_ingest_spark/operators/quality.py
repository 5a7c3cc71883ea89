"""Data-quality expectations: enforce the ODCS ``data_quality`` block.

The reference models ``data_quality.expectations`` on the asset contract
(config.py:137-142 DataQualityModel) but never evaluates them — the block
is parsed and carried, not enforced. Here the expectations are a real
runtime check, compiled into ONE aggregate pass over the frame:

* every expectation becomes a conditional-count expression, so N
  expectations cost one job with map-side partial aggregation — no
  per-expectation scans, no shuffle beyond the final single-row reduce
  (``unique`` adds a distinct count, which Catalyst plans via expand —
  one widened pass, still a single job);
* results come back as a small report (one row per expectation) the
  runner can log, gate on, or write next to the output.

Supported kinds (dbt / Great Expectations vocabulary):

  {"type": "not_null",        "column": c}
  {"type": "unique",          "column": c}
  {"type": "accepted_values", "column": c, "values": [...]}
  {"type": "range",           "column": c, "min": x, "max": y}   (either bound optional)
  {"type": "regex",           "column": c, "pattern": p}
  {"type": "row_count_min",   "min": n}
  {"type": "expression",      "expression": sql_bool}  (violations = NOT expr)
  {"type": "freshness",       "column": ts, "max_age": "2 hours",
                              "as_of": "2024-01-02T00:00:00"}

Row-level kinds accept Great-Expectations-style ``"mostly": 0.95`` —
the expectation passes while violations stay within the (1 - mostly)
fraction of rows. ``freshness`` compares ``max(column)`` against a
REQUIRED literal ``as_of`` (never wall-clock ``now()`` — a check that
passes or fails depending on when it runs is not reproducible).

Scale: the report is O(n_expectations) rows; the data pass is the same
single scan the job already paid for validation. At 100 TB ``unique``
over a high-cardinality column is the only expensive check (exact
distinct = expand + shuffle); swap to approx_count_distinct via
``approx_unique=True`` when a bounded error (~2%) is acceptable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dativo_ingest_spark.config.contracts import ConfigError
from dativo_ingest_spark.operators.util import local_df

KINDS = ("not_null", "unique", "accepted_values", "range", "regex",
         "row_count_min", "expression", "freshness")

_AGE_UNITS = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
              "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}


def _age_seconds(raw) -> float:
    if isinstance(raw, (int, float)):
        return float(raw)
    parts = str(raw).split()
    if len(parts) == 2 and parts[1].lower() in _AGE_UNITS:
        return float(parts[0]) * _AGE_UNITS[parts[1].lower()]
    raise ConfigError(f"freshness max_age not parseable: {raw!r}")


@dataclass
class ExpectationResult:
    name: str
    kind: str
    column: str | None
    failed: int
    total: int
    mostly: float = 1.0  # GE-style tolerance: pass while failed fraction
                         # stays within (1 - mostly)

    @property
    def passed(self) -> bool:
        if self.mostly >= 1.0:
            return self.failed == 0
        return self.failed <= (1.0 - self.mostly) * self.total


def _violation_expr(exp: dict[str, Any]):
    """Column expression counting rows violating the expectation (the
    single-pass building block); None for frame-level kinds."""
    kind = exp["type"]
    col = exp.get("column")
    if kind in ("not_null", "unique", "accepted_values", "range", "regex") \
            and not col:
        raise ConfigError(f"expectation {kind} requires a column")
    c = F.col(col) if col else None
    if kind == "not_null":
        return F.sum(F.when(c.isNull(), 1).otherwise(0))
    if kind == "accepted_values":
        values = exp.get("values")
        if not values:
            raise ConfigError("accepted_values requires non-empty values")
        # NULL is not a violation here — pair with not_null to forbid it
        return F.sum(
            F.when(c.isNotNull() & ~c.isin(*values), 1).otherwise(0))
    if kind == "range":
        lo, hi = exp.get("min"), exp.get("max")
        if lo is None and hi is None:
            raise ConfigError("range requires min and/or max")
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (c < F.lit(lo))
        if hi is not None:
            cond = cond | (c > F.lit(hi))
        return F.sum(F.when(c.isNotNull() & cond, 1).otherwise(0))
    if kind == "regex":
        pattern = exp.get("pattern")
        if not pattern:
            raise ConfigError("regex requires a pattern")
        return F.sum(
            F.when(c.isNotNull() & ~c.rlike(pattern), 1).otherwise(0))
    if kind == "expression":
        sql = exp.get("expression")
        if not sql:
            raise ConfigError("expression requires an expression")
        # three-valued logic: a NULL-evaluating expectation is a violation,
        # not a silent pass (coalesce to false before negating)
        return F.sum(
            F.when(~F.coalesce(F.expr(sql), F.lit(False)), 1).otherwise(0))
    if kind in ("unique", "row_count_min", "freshness"):
        return None  # handled from the same aggregate row
    raise ConfigError(f"unknown expectation type '{kind}' (one of {KINDS})")


def run_expectations(
    df: DataFrame,
    expectations: list[dict[str, Any]],
    approx_unique: bool = False,
) -> list[ExpectationResult]:
    """Evaluate every expectation in one aggregate pass; returns one
    result per expectation (insertion order). Raises ConfigError on a
    malformed expectation — a typo'd check that silently passes is worse
    than a failed job."""
    if not expectations:
        return []
    aggs = [F.count(F.lit(1)).alias("_total")]
    names: list[str] = []
    for i, exp in enumerate(expectations):
        kind = exp.get("type")
        v = _violation_expr({**exp, "type": kind})
        if v is not None:
            aggs.append(F.coalesce(v, F.lit(0)).alias(f"_v{i}"))
        elif kind == "unique":
            col = exp["column"]
            cnt = (F.approx_count_distinct(col) if approx_unique
                   else F.count_distinct(F.col(col)))
            aggs.append(cnt.alias(f"_d{i}"))
            aggs.append(F.count(F.col(col)).alias(f"_n{i}"))
        elif kind == "freshness":
            col = exp.get("column")
            if not col or not exp.get("as_of") or exp.get("max_age") is None:
                raise ConfigError(
                    "freshness requires column, max_age, and a literal "
                    "as_of timestamp")
            _age_seconds(exp["max_age"])  # validate before running the job
            aggs.append(F.max(F.col(col)).alias(f"_f{i}"))
        names.append(exp.get("name") or f"{kind}_{exp.get('column', i)}")
    row = df.agg(*aggs).collect()[0]
    total = int(row["_total"])
    out: list[ExpectationResult] = []
    for i, exp in enumerate(expectations):
        kind = exp["type"]
        if kind == "unique":
            failed = int(row[f"_n{i}"]) - int(row[f"_d{i}"])
        elif kind == "row_count_min":
            failed = max(0, int(exp.get("min", 0)) - total)
        elif kind == "freshness":
            import datetime as _dt

            newest = row[f"_f{i}"]
            as_of = _dt.datetime.fromisoformat(str(exp["as_of"]))
            if newest is not None and newest.tzinfo is not as_of.tzinfo:
                newest = newest.replace(tzinfo=as_of.tzinfo)
            horizon = as_of - _dt.timedelta(
                seconds=_age_seconds(exp["max_age"]))
            failed = 0 if (newest is not None and newest >= horizon) else 1
        else:
            failed = int(row[f"_v{i}"])
        out.append(ExpectationResult(
            name=names[i], kind=kind, column=exp.get("column"),
            failed=failed, total=total,
            mostly=float(exp.get("mostly", 1.0))))
    return out


def report_df(spark, results: list[ExpectationResult]) -> DataFrame:
    """Report as a small DataFrame (write it next to the output)."""
    rows = [(r.name, r.kind, r.column, r.failed, r.total, r.passed)
            for r in results]
    return local_df(spark, 
        rows, "name string, kind string, column string, failed long, "
              "total long, passed boolean")


def quantile_bounds(
    df: DataFrame,
    columns: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
    accuracy: int = 10_000,
) -> dict:
    """Per-column (lower, upper) percentile bounds in ONE aggregate pass.

    Corpus curation routinely clips metric outliers (token counts, quality
    scores, byte lengths) at data-driven percentiles rather than hand-picked
    literals. ``percentile_approx`` is a mergeable KLL-style sketch, so all
    columns and both tails cost a single scan with map-side partial
    aggregation — O(accuracy) state per column per partition, never a sort.
    Returns ``{column: (lo, hi)}`` with None for a column whose values are
    all NULL.

    The bounds are plain literals by design: persist them and re-apply via
    :func:`apply_bounds` to later batches so an incremental pipeline clips
    every batch against the SAME thresholds (train/serve consistency) —
    recomputing per batch would silently shift the distribution.
    """
    if not columns:
        raise ConfigError("quantile_bounds requires at least one column")
    if not (0.0 <= lower < upper <= 1.0):
        raise ConfigError("need 0 <= lower < upper <= 1")
    aggs = [
        F.percentile_approx(
            F.col(c).cast("double"), [float(lower), float(upper)],
            int(accuracy),
        ).alias(f"_q_{i}")
        for i, c in enumerate(columns)
    ]
    row = df.agg(*aggs).collect()[0]
    out: dict = {}
    for i, c in enumerate(columns):
        pair = row[f"_q_{i}"]
        out[c] = None if pair is None else (float(pair[0]), float(pair[1]))
    return out


def apply_bounds(
    df: DataFrame, bounds: dict, keep_nulls: bool = True
) -> DataFrame:
    """Filter rows whose columns fall outside precomputed ``bounds``
    (the output of :func:`quantile_bounds`, or hand-set literals).

    Pure scan-stage conjunction of literal BETWEENs — pushes into the
    parquet scan when the columns are stored. ``keep_nulls`` controls
    whether a NULL value passes (default) or drops the row; columns with
    a None bound (all-NULL at fit time) are skipped entirely.
    """
    pred = None
    for c, pair in bounds.items():
        if pair is None:
            continue
        lo, hi = pair
        in_range = F.col(c).cast("double").between(
            F.lit(float(lo)), F.lit(float(hi)))
        clause = (in_range | F.col(c).isNull()) if keep_nulls else in_range
        pred = clause if pred is None else (pred & clause)
    return df if pred is None else df.filter(pred)


def mad_outliers(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    k: float = 3.0,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Robust per-group outlier flagging by median absolute deviation:
    a row is an outlier when ``|x - median| > k * MAD`` (Hampel filter,
    the robust cousin of the z-score — one wild sensor value cannot
    drag the center or the spread the way it drags a mean/stddev).
    Returns the input plus ``_med``, ``_mad``, ``_is_outlier``.

    Shape: two grouped aggregates (median, then MAD over the residuals),
    each joined back on the group keys — with few groups both stats
    frames broadcast, so the corpus is scanned twice and shuffled zero
    times beyond the two group-sized aggs. ``exact=True`` uses
    ``percentile`` (sort-based, interpolated — the oracle-replicable
    path; DuckDB's ``quantile_cont`` computes the identical statistic);
    at 100 TB pass ``exact=False`` for the mergeable
    ``approx_percentile`` sketch (same KB-state contract
    :func:`quantile_bounds` pins), trading bit-parity for a
    constant-memory single-pass agg.

    Degeneracy (documented, not hidden): when a strict majority of a
    group sits exactly ON its median, MAD is 0 and every deviating row
    flags — the standard Hampel behavior for near-constant columns.
    Pre-filter such groups (``_mad == 0``) or clip with
    :func:`quantile_clip` when that is not what you want.
    """
    group = list(keys or [])
    pct = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {int(accuracy)}"

    def _med(col: str) -> "F.Column":
        return F.expr(f"{pct}(`{col}`, 0.5D{acc})")

    gb = df.groupBy(*group) if group else df.groupBy()
    med = gb.agg(_med(value_col).alias("_med"))
    with_med = (df.join(F.broadcast(med), on=group) if group
                else df.crossJoin(F.broadcast(med)))
    resid = with_med.withColumn(
        "_absdev", F.abs(F.col(value_col) - F.col("_med")))
    gb2 = resid.groupBy(*group) if group else resid.groupBy()
    mad = gb2.agg(_med("_absdev").alias("_mad"))
    flagged = (resid.join(F.broadcast(mad), on=group) if group
               else resid.crossJoin(F.broadcast(mad)))
    return flagged.withColumn(
        "_is_outlier",
        F.col("_absdev") > F.lit(float(k)) * F.col("_mad")
    ).drop("_absdev")


def quantile_clip(
    df: DataFrame,
    columns: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
    accuracy: int = 10_000,
    keep_nulls: bool = True,
) -> tuple[DataFrame, dict]:
    """Fit-and-apply convenience: returns (clipped frame, bounds).

    Two passes total over the corpus — one sketch aggregate, one filtered
    scan — regardless of how many columns are clipped."""
    bounds = quantile_bounds(df, columns, lower, upper, accuracy)
    return apply_bounds(df, bounds, keep_nulls=keep_nulls), bounds


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    order_cols: list[str],
    lookback: int = 20,
    min_n: int = 12,
    out_col: str = "z_micro",
) -> DataFrame:
    """Streaming-shaped anomaly score: each row's z-score against the
    trailing ``lookback`` rows of its own key (frame ends at 1 PRECEDING,
    so a wild value never launders its own baseline). Returns the input
    plus ``_win_n`` (rows in the frame) and ``out_col`` — the z-score in
    integer micro-units, NULL when the frame is short (< ``min_n``) or
    degenerate (zero variance).

    ``value_col`` must already be integral (cents/micros — the repo-wide
    fixed-point discipline): count/sum/sum-of-squares then stay exact
    BIGINTs and the one float expression (mean/stddev/divide/sqrt)
    computes from identical operands on any engine, so the quantized
    score is engine-portable, unlike stddev_samp's engine-specific float
    fold. Overflow bound: |value| <= ~600k keeps sum(x^2) inside BIGINT
    for any lookback <= 50; mean-shift larger magnitudes first.

    Shape: ONE window over (keys, order) — a single hash-partitioned
    sort per key group, no self-join, no second pass; at 100 TB the
    shuffle is the per-key repartition any per-entity timeline op pays,
    and skewed keys are bounded by the O(lookback) frame state. The
    strictly-past frame makes the operator replayable incrementally:
    scores depend only on each row's trailing window, so a batch append
    re-scores just the new rows (plus ``lookback`` boundary rows).
    """
    from pyspark.sql.window import Window as _W

    if lookback < 2 or min_n < 2:
        raise ValueError("lookback and min_n must be >= 2")
    w = (_W.partitionBy(*keys)
         .orderBy(*order_cols)
         .rowsBetween(-lookback, -1))
    x = F.col(value_col)
    base = (
        df.withColumn("_win_n", F.count(F.lit(1)).over(w))
        .withColumn("_s", F.sum(x).over(w))
        .withColumn("_ss", F.sum(x * x).over(w))
    )
    ok = (
        (F.col("_win_n") >= F.lit(int(min_n)))
        & (F.col("_win_n") * F.col("_ss") - F.col("_s") * F.col("_s") > 0)
    )
    z = F.expr(
        f"CAST(floor(1000000.0 * (`{value_col}` - CAST(_s AS DOUBLE) / _win_n) "
        "/ sqrt((CAST(_ss AS DOUBLE) - CAST(_s AS DOUBLE) * CAST(_s AS DOUBLE) "
        "/ _win_n) / (_win_n - 1)) + 0.5) AS BIGINT)")
    return base.withColumn(out_col, F.when(ok, z)).drop("_s", "_ss")


def equi_depth_edges(df: DataFrame, col: str, n_bins: int,
                     exact: bool = True,
                     accuracy: int = 10_000) -> list[float]:
    """Fit ``n_bins - 1`` interior equi-depth (quantile) cut points for
    ``col`` in ONE aggregate pass. ``exact=True`` uses the interpolated
    exact percentile (integer inputs interpolate on .5-exact doubles —
    engine-portable, the mad_outliers argument); ``exact=False`` the
    mergeable sketch (the 100 TB default, same contract as
    :func:`quantile_bounds`)."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    fracs = [i / n_bins for i in range(1, n_bins)]
    pct = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {int(accuracy)}"
    arr = ", ".join(f"{f!r}D" for f in fracs)
    row = df.agg(F.expr(
        f"{pct}(`{col}`, array({arr}){acc})").alias("_e")).collect()[0]
    return [float(v) for v in row._e]


def apply_equi_depth_bins(df: DataFrame, col: str, edges: list[float],
                          out_col: str = "bin") -> DataFrame:
    """Assign each row its equi-depth bin index (0..len(edges)) by a
    literal `<=` cascade over the fitted edges — scan-stage, no join, no
    shuffle; the fit-once/apply-many contract of
    :func:`quantile_bounds`: incremental batches bin against the SAME
    edges instead of re-fitting and drifting. Rows exactly ON an edge go
    to the lower bin (<=), NULLs get NULL."""
    expr = None
    for i, e in enumerate(edges):
        cond = F.col(col) <= F.lit(float(e))
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    expr = (F.lit(len(edges)) if expr is None
            else expr.otherwise(len(edges)))
    return df.withColumn(
        out_col, F.when(F.col(col).isNull(), None).otherwise(expr)
        .cast("bigint"))


def weighted_median(
    df: DataFrame,
    key_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact weighted median per key: the smallest value whose
    cumulative weight reaches half the key's total weight.

    The corpus-sizing statistic the plain median gets wrong: with
    weight = document length, this answers "half the corpus's BYTES
    live in documents shorter than X" — the number that drives chunk
    sizing and packing efficiency, where the unweighted median is
    skew-blind (a million tweets hide one book).

    Pure integer selection (weights/values as BIGINT, predicate
    ``2 * cum >= total``): bit-exact across engines. Null or
    non-positive weights contribute nothing; a key with no positive
    weight is omitted.

    Scale: one (key, value) partial-agg shuffle collapses duplicates
    BEFORE the window (the cumsum runs over distinct values per key,
    not rows), one key-ordered window, one min-fold. Never a sort of
    raw rows; per-key state is O(distinct values).
    """
    w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
    from pyspark.sql.window import Window as _W

    grouped = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(value_col).cast("long").alias("v"),
            w.alias("w"))
        .filter(F.col("w") > 0)
        .groupBy("key", "v")
        .agg(F.sum("w").alias("vw"))
    )
    per_key = _W.partitionBy("key")
    ordered = _W.partitionBy("key").orderBy("v")
    return (
        grouped
        .withColumn("_total", F.sum("vw").over(per_key))
        .withColumn("_cum", F.sum("vw").over(ordered))
        .filter(F.col("_cum") * 2 >= F.col("_total"))
        .groupBy("key")
        .agg(
            F.min("v").alias("weighted_median"),
            F.min("_total").alias("total_weight"),
        )
    )


def join_fanout_check(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    expect: str = "one_to_many",
) -> DataFrame:
    """Join-multiplicity contract check — the DQ guard for the silent
    row-explosion class of bug: a dimension that was supposed to be
    unique picks up a duplicate (a bad SCD2 close, a double-loaded
    partition) and every fact joining it silently double-counts. Run
    BEFORE the join that assumes the contract.

    ``expect``: ``one_to_one`` (both sides unique per key),
    ``one_to_many`` (LEFT unique per key), ``many_to_one`` (RIGHT
    unique per key). Returns one row per violating key:
    (key columns..., left_rows, right_rows, violation) — empty means
    the contract holds. ``violation`` names which side broke.

    Scale shape: one partial-agg count per side (map-side combinable),
    one key-equi join of the two COUNT frames (key-cardinality-sized,
    never row-sized) — the check never joins the raw rows at all, so it
    costs two aggregates however explosive the real join would be.
    """
    if expect not in ("one_to_one", "one_to_many", "many_to_one"):
        raise ValueError(
            f"expect must be one_to_one|one_to_many|many_to_one, "
            f"got {expect!r}")
    if not keys:
        raise ValueError("keys must name at least one join column")
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("left_rows"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("right_rows"))
    joined = lc.join(rc, list(keys), "inner")
    left_bad = F.col("left_rows") > 1
    right_bad = F.col("right_rows") > 1
    if expect == "one_to_one":
        bad = left_bad | right_bad
        label = (F.when(left_bad & right_bad, "both")
                 .when(left_bad, "left").otherwise("right"))
    elif expect == "one_to_many":
        bad = left_bad
        label = F.lit("left")
    else:
        bad = right_bad
        label = F.lit("right")
    return (joined.filter(bad)
            .select(*keys,
                    F.col("left_rows").cast("long").alias("left_rows"),
                    F.col("right_rows").cast("long").alias("right_rows"),
                    label.alias("violation")))


def referential_check(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Referential-integrity check: fact keys with NO matching dimension
    row — the orphan-foreign-key complement of
    :func:`join_fanout_check` (fanout guards against a dim key
    appearing twice; this guards against it not appearing at all, the
    bug an inner join silently EATS rows on and a left join turns into
    surprise NULLs).

    Returns one row per orphan key: (key columns..., orphan_rows).
    Empty means every fact row has a parent. NULL fact keys are
    reported as an orphan key too (they can never join) — the not_null
    expectation is the usual companion.

    Scale: one per-key fact count (map-side combinable) anti-joined
    against the dim's distinct keys — key-cardinality-sized frames on
    both sides of the join, never the raw rows; the dim side broadcasts
    whenever it fits.
    """
    if not keys:
        raise ValueError("keys must name at least one join column")
    fc = fact.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("orphan_rows"))
    return (fc.join(dim.select(*keys).dropDuplicates(keys), list(keys),
                    "left_anti")
            .select(*keys,
                    F.col("orphan_rows").cast("long").alias("orphan_rows")))
