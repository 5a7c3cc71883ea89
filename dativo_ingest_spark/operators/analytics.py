"""Product-analytics operators over event streams: conversion funnels
and cohort retention.

The reference has no analytics layer at all (its pipeline ends at the
partitioned sink — SURVEY §2 notes "no joins, aggregations or windows
anywhere in src/"); these are beyond-reference operators the engine's
analytics charter adds on the `events` shape the batch/streaming rollup
family already serves. Both compose from plain keyed aggregates and
joins, so Catalyst owns the physical plan end-to-end.

Scale shapes (100 TB of events):

* **funnel**: k-1 user-keyed join+aggregate stages for a k-step funnel.
  Every stage is an equi-join on the user key followed by a min — the
  per-stage frame is ONE ROW PER CONVERTED USER (monotonically
  shrinking), so each later stage joins a smaller survivor set against
  the events scan; all shuffles are user-keyed and partially
  aggregated map-side. No window over the full event history, no
  per-user event-array materialization — the two shapes that die on
  power-law users.
* **cohort retention**: two aggregates (first-touch bucket per user,
  distinct active buckets per user) joined on the user key, then one
  (cohort, offset) count — output is #cohorts × #offsets rows, KBs at
  any input scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from dativo_ingest_spark.operators.util import local_df

#: micros per day — the funnel deadline / cohort bucket arithmetic is
#: integer micros end to end so engines cannot disagree on rounding
_US_PER_DAY = 86_400_000_000


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_days: int | None = None,
) -> DataFrame:
    """Ordered conversion funnel: how many users performed ``steps`` in
    sequence, each step strictly after the previous one's FIRST
    qualifying occurrence (and within ``within_days`` of it, when set).

    Returns (step_index, step, n_users) — step_index 1-based; a user
    counts for step i+1 only if they counted for step i, so
    ``n_users`` is non-increasing. First-occurrence semantics: step i's
    anchor timestamp is the EARLIEST event satisfying the chain, the
    standard product-analytics funnel (an earlier-but-too-late second
    occurrence cannot resurrect a user).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if within_days is not None and within_days <= 0:
        raise ValueError("within_days must be positive")
    ev = df.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    )
    stages: list[DataFrame] = []
    prev: DataFrame | None = None
    for step in steps:
        matched = ev.filter(F.col("etype") == step)
        if prev is not None:
            cond = F.col("ts") > F.col("_t")
            if within_days is not None:
                # .cast("timestamp") first: unix_micros rejects the
                # TIMESTAMP_NTZ type bare parquet reads infer (UTC
                # machine -> identity cast, the temporal.py convention)
                cond = cond & (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    <= F.unix_micros(F.col("_t").cast("timestamp"))
                    + F.lit(within_days * _US_PER_DAY)
                )
            matched = matched.join(prev, "user").filter(cond)
        cur = matched.groupBy("user").agg(F.min("ts").alias("_t"))
        stages.append(cur)
        prev = cur
    out = None
    for i, (step, frame) in enumerate(zip(steps, stages), start=1):
        counted = frame.agg(
            F.count(F.lit(1)).cast("long").alias("n_users")
        ).select(
            F.lit(i).cast("long").alias("step_index"),
            F.lit(step).alias("step"),
            "n_users",
        )
        out = counted if out is None else out.unionByName(counted)
    return out


def _bucket(col: Column, bucket_days: int) -> Column:
    # cast first: unix_micros rejects TIMESTAMP_NTZ (UTC machine ->
    # identity cast); floor over double is exact here (epoch us ~1.7e15
    # is within 2^53)
    return F.floor(
        F.unix_micros(col.cast("timestamp"))
        / F.lit(bucket_days * _US_PER_DAY)
    ).cast("long")


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by FIRST-seen period,
    counted in every later period they were active.

    Returns (cohort_bucket, offset, n_users): ``cohort_bucket`` is the
    integer ``bucket_days``-period index of the user's first event
    (floor of epoch-micros / period — UTC-fixed, no calendar
    dependence), ``offset`` the number of periods after the cohort
    period (0 = the cohort period itself, so offset 0 counts the cohort
    size), ``n_users`` distinct users from that cohort active at that
    offset. Retention rate is ``n_users / n_users@offset0`` — left as a
    ratio for the caller since the counts are the exact, portable part.
    """
    if bucket_days <= 0:
        raise ValueError("bucket_days must be positive")
    ev = df.select(
        F.col(user_col).alias("user"),
        _bucket(F.col(ts_col), bucket_days).alias("bucket"),
    )
    first = ev.groupBy("user").agg(F.min("bucket").alias("cohort"))
    active = ev.distinct()
    return (
        active.join(first, "user")
        .groupBy(
            F.col("cohort").alias("cohort_bucket"),
            (F.col("bucket") - F.col("cohort")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            F.col("cohort_bucket").cast("long").alias("cohort_bucket"),
            F.col("offset").cast("long").alias("offset"),
            "n_users",
        )
    )


def attribute_last_touch(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    conversion: str,
    touch_types: list[str],
    within: str | None = None,
) -> DataFrame:
    """Last-touch revenue attribution: each ``conversion`` event is
    credited to the user's most recent PRECEDING touch event (one of
    ``touch_types``), optionally only if the touch happened within
    ``within`` (an INTERVAL literal body, e.g. ``'72 hours'``) of the
    conversion. Conversions with no qualifying touch attribute to the
    ``'none'`` channel.

    Returns one row per conversion event:
    (user, ts, value, touch_type, touch_ts) — ``touch_type`` is the
    credited channel (``'none'`` when unattributed, in which case
    ``touch_ts`` is null). Channel-level rollups (revenue per channel,
    conversion counts) are one aggregate on top; the row grain is the
    operator output so callers can also join campaign dimensions in.

    Determinism: multiple touches at the SAME (user, timestamp) collapse
    to the lexicographically greatest type before the as-of join (the
    as-of resolves exact ties arbitrarily otherwise — this is DuckDB
    ASOF's caveat too, so the collapse keeps the two oracle-comparable).

    Scale (100 TB of events): this is one backward as-of join
    (operators/temporal.py) — a single user-keyed Exchange of the
    conversion and touch slices (both FILTERED at the scan: predicate
    pushdown drops every other event type before the shuffle) plus an
    in-partition merge via a running window. No per-user event arrays,
    no full-history window, no pair join; skewed power-users cost one
    sorted partition scan, not a quadratic blowup.
    """
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    if conversion in touch_types:
        raise ValueError("conversion type cannot also be a touch type")
    from dativo_ingest_spark.operators.temporal import asof_join

    conv = df.filter(F.col(type_col) == conversion).select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    )
    touches = (
        df.filter(F.col(type_col).isin(list(touch_types)))
        .groupBy(
            F.col(user_col).alias("user"),
            F.col(ts_col).alias("ts"),
        )
        .agg(F.max(type_col).alias("touch"))
    )
    joined = asof_join(
        conv, touches, on="ts", by=["user"],
        tolerance=within, direction="backward",
    )
    return joined.select(
        "user",
        "ts",
        "value",
        F.coalesce(F.col("touch_r"), F.lit("none")).alias("touch_type"),
        F.col("ts_r").alias("touch_ts"),
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_days: int = 1,
    threshold_days: int = 2,
) -> DataFrame:
    """Per-key CUSUM level-shift detection over a time-bucketed series
    (Page 1954 — the standard SPC drift detector; the monitoring layer a
    100 TB ingest pipeline runs over its own daily volumes/quality
    scores to catch upstream regressions).

    One row per (key, bucket): the bucket's summed value, the one-sided
    positive and negative CUSUM statistics, and a flag when either side
    crosses the threshold. The textbook recursion
    ``S_i = max(0, S_{i-1} + dev_i)`` is NOT a window primitive, but its
    closed form is: ``S_i = C_i - min(0, min_{j<=i}(C_j))`` with ``C``
    the running sum of deviations and the 0 term the empty-prefix
    baseline — so both sides compute as a running sum
    plus a running extremum, two O(1)-state frames over one
    key-partitioned sort. No recursion, no UDF, no state store.

    Integer discipline (oracle-exact): values quantize to cents at the
    scan; deviations use ``x_i * n - T`` (the per-key mean ``T/n``
    scaled through by ``n``) so every intermediate is a BIGINT — no
    float mean ever materializes. The threshold is expressed in
    mean-days (``threshold_days`` × the key's average bucket value,
    i.e. ``threshold_days * T`` in scaled units), dimensionally stable
    across keys of different volume.

    Scale: grouping to (key, bucket) grain is one partial-agg shuffle of
    the raw events; the windows then run over the AGGREGATED frame —
    ``keys × buckets`` rows, orders of magnitude smaller than the input.
    Per-key series sort is bounded by the calendar, not the data.
    """
    from pyspark.sql.window import Window as _W

    cents = F.expr(
        f"CAST(floor(`{value_col}` * 100 + 0.5) AS BIGINT)")
    day_us = 86_400_000_000 * bucket_days
    bucketed = (
        df.select(
            F.col(key_col).alias("key"),
            F.expr(f"unix_micros(CAST(`{ts_col}` AS TIMESTAMP))")
            .alias("_us"),
            cents.alias("_cents"),
        )
        .withColumn("bucket", F.expr(f"_us div {day_us}"))
        .groupBy("key", "bucket")
        .agg(F.sum("_cents").alias("cents"))
    )
    per_key = _W.partitionBy("key")
    ordered = _W.partitionBy("key").orderBy("bucket")
    stats = (
        bucketed
        .withColumn("_n", F.count(F.lit(1)).over(per_key))
        .withColumn("_t", F.sum("cents").over(per_key))
        .withColumn("_dev", F.col("cents") * F.col("_n") - F.col("_t"))
        .withColumn("_c", F.sum("_dev").over(ordered))
        .withColumn(
            "cusum_pos",
            F.col("_c")
            - F.least(F.lit(0).cast("long"), F.min("_c").over(ordered)))
        .withColumn(
            "cusum_neg",
            F.greatest(F.lit(0).cast("long"), F.max("_c").over(ordered))
            - F.col("_c"))
    )
    h = F.col("_t") * threshold_days
    return stats.select(
        "key",
        "bucket",
        "cents",
        "cusum_pos",
        "cusum_neg",
        ((F.col("cusum_pos") > h) | (F.col("cusum_neg") > h))
        .alias("flagged"),
    )


def pareto_classes(
    df: DataFrame,
    key_col: str,
    value_col: str,
    bounds: tuple[int, int] = (80, 95),
) -> DataFrame:
    """ABC / Pareto classification: rank keys by summed value and class
    them by cumulative share — A up to ``bounds[0]`` percent of the
    total, B to ``bounds[1]``, C the tail (the 80/15/5 inventory
    analysis; for corpora: which sources carry 80% of the tokens).

    A key's class comes from the cumulative share BEFORE it (integer
    predicate ``(cum - own) * 100 < bound * total``), so the item that
    crosses a boundary belongs to the class it completes — the standard
    convention, deterministic under ties via (value desc, key) order.
    All arithmetic BIGINT.

    Returns (key, value, rank, abc_class). Scale: the raw frame folds
    to key grain in one partial-agg shuffle FIRST; the ranking windows
    then run over the aggregated frame — orders of magnitude smaller
    than the input, but still a keys=() single-partition sort at the
    end (the cumulative_new_users_daily bound): corpora with >~100M
    distinct keys should range-partition the cumsum the way
    operators/sampling.py:systematic_sample does.
    """
    from pyspark.sql.window import Window as _W

    a_bound, b_bound = int(bounds[0]), int(bounds[1])
    if not 0 < a_bound < b_bound < 100:
        raise ValueError("bounds must satisfy 0 < A < B < 100")
    agg = (
        df.select(F.col(key_col).alias("key"),
                  F.col(value_col).cast("long").alias("v"))
        .groupBy("key").agg(F.sum("v").alias("value"))
    )
    order = _W.orderBy(F.col("value").desc(), F.col("key"))
    run = order.rowsBetween(_W.unboundedPreceding, _W.currentRow)
    everything = _W.partitionBy()
    ranked = (
        agg.withColumn("rank", F.row_number().over(order))
        .withColumn("_cum", F.sum("value").over(run))
        .withColumn("_total", F.sum("value").over(everything))
    )
    before = (F.col("_cum") - F.col("value")) * 100
    return ranked.select(
        "key", "value", F.col("rank").cast("long").alias("rank"),
        F.when(before < F.col("_total") * a_bound, "A")
        .when(before < F.col("_total") * b_bound, "B")
        .otherwise("C").alias("abc_class"),
    )


def grouped_topk(
    df: DataFrame,
    key_col: str,
    order_col: str,
    payload_cols: list[str],
    k: int,
    n_shards: int = 32,
    ascending: bool = False,
) -> DataFrame:
    """Exact top-``k`` rows per key WITHOUT sorting whole key groups:
    the two-phase partial-combine pattern the window formulation
    (``row_number() OVER (PARTITION BY key ORDER BY v)``) cannot give
    you — the window shuffles and SORTS every row of every key, so one
    hot key (a power-law user, the 'en' language bucket) funnels its
    entire history through one sort task. Here each (key, shard) cell
    keeps a local k-slice (shard = deterministic md5 of the payload's
    first column), then the ≤ ``k * n_shards`` survivors per key merge
    in a second k-slice. Exactness: any global top-k row is by
    definition inside its own shard's top-k, so the merge sees every
    candidate. Memory honesty: the local ``collect_list`` buffers a
    whole (key, shard) CELL, not O(k) — the bound is rows-per-key /
    ``n_shards``, and ``n_shards`` is the knob that splits a hot key
    across that many parallel tasks (the window alternative sorts the
    same rows but in ONE task per key; a true O(k) heap needs a custom
    UDAF, which is the documented swap if cells outgrow memory).

    Returns (key, rank, order value, payloads), rank 1-based;
    ``ascending=False`` (default) ranks the LARGEST values first. Ties
    resolve deterministically by the payload tuple (ascending), so the
    output is engine-portable.

    ``array_sort`` over struct elements compares field-by-field in
    declaration order — the order value leads the struct, negated for
    descending ranking (BIGINT order values only; the negation trick
    keeps the comparator pure Catalyst).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if not payload_cols:
        raise ValueError("payload_cols must be non-empty")
    sort_v = (F.col(order_col).cast("long") if ascending
              else -F.col(order_col).cast("long"))
    item = F.struct(
        sort_v.alias("_v"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    shard = (
        F.conv(F.substring(F.md5(
            F.col(payload_cols[0]).cast("string")), 1, 8), 16, 10)
        .cast("long") % n_shards
    )
    local = (
        df.withColumn("_sh", shard)
        .groupBy(F.col(key_col).alias("key"), "_sh")
        .agg(F.slice(F.array_sort(F.collect_list(item)), 1, k)
             .alias("_top"))
    )
    merged = (
        local.select("key", F.explode("_top").alias("_it"))
        .groupBy("key")
        .agg(F.slice(F.array_sort(F.collect_list("_it")), 1, k)
             .alias("_top"))
    )
    exploded = merged.select(
        "key", F.posexplode("_top").alias("_rk", "_it"))
    val = (F.col("_it._v") if ascending else -F.col("_it._v"))
    return exploded.select(
        "key",
        (F.col("_rk") + 1).cast("long").alias("rank"),
        val.alias(order_col),
        *[F.col(f"_it.{c}").alias(c) for c in payload_cols],
    )


def ab_proportion_test(
    df: DataFrame,
    variant_col: str,
    success_col: str,
    z_critical_milli: int = 1960,
) -> DataFrame:
    """Two-proportion z-test between every pair of experiment variants —
    the A/B readout: is variant B's success rate different from A's
    beyond what chance explains at the given critical value (1.96 ~
    two-sided alpha 0.05, 2.576 ~ 0.01)?

    One row per ordered variant pair (variant_a < variant_b):
    (variant_a, variant_b, n_a, s_a, n_b, s_b, z_micro, significant).

    Determinism: counts are exact BIGINTs from ONE partial-agg pass;
    the z statistic evaluates in a FIXED IEEE op order — pooled p via
    one divide, the standard error via multiplies + one sqrt (sqrt is
    correctly rounded by the standard, unlike ln) and one final divide
    — so z_micro and the significance boolean replay bit-for-bit in the
    oracle. Zero-variance pairs (pooled p of 0 or 1) emit NULL z and
    significant = false: no information, not infinite evidence.

    Scale: variant-cardinality frames only after the one aggregate —
    the pair join is |variants|^2 rows, nothing row-sized ever joins.
    """
    agg = (df.groupBy(F.col(variant_col).alias("variant"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col(success_col).cast("long")).alias("s")))
    a = agg.select(F.col("variant").alias("variant_a"),
                   F.col("n").alias("n_a"), F.col("s").alias("s_a"))
    b = agg.select(F.col("variant").alias("variant_b"),
                   F.col("n").alias("n_b"), F.col("s").alias("s_b"))
    pairs = a.join(b, F.col("variant_a") < F.col("variant_b"))
    p_pool = ((F.col("s_a") + F.col("s_b")).cast("double")
              / (F.col("n_a") + F.col("n_b")).cast("double"))
    se = F.sqrt(p_pool * (F.lit(1.0) - p_pool)
                * (F.lit(1.0) / F.col("n_a").cast("double")
                   + F.lit(1.0) / F.col("n_b").cast("double")))
    z = ((F.col("s_a").cast("double") / F.col("n_a").cast("double"))
         - (F.col("s_b").cast("double") / F.col("n_b").cast("double"))) / se
    z_micro = F.when(se > 0, F.floor(z * 1000000 + F.lit(0.5))
                     .cast("long"))
    return pairs.select(
        "variant_a", "variant_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("s_a").cast("long").alias("s_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("s_b").cast("long").alias("s_b"),
        z_micro.alias("z_micro"),
        F.coalesce(F.abs(z_micro) > F.lit(z_critical_milli * 1000),
                   F.lit(False)).alias("significant"))


def mann_whitney_u(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    z_critical_milli: int = 1960,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between exactly two
    variants — the nonparametric sibling of :func:`ab_proportion_test`
    for CONTINUOUS metrics: compares whole distributions through ranks,
    so a heavy-tailed revenue metric can't hide a shift behind its
    variance the way a t-test's mean/stddev can.

    One row: (variant_a, variant_b, n_a, n_b, u2_a, z_micro,
    significant) where ``u2_a`` is 2x the U statistic of the lower
    variant (doubled so tie-averaged ranks stay exact BIGINTs).

    Exactness: values quantize to cents; rank sums come from the
    (value)-grain count frame — for a distinct value with preceding
    cumulative count C and count c, the doubled tie-averaged rank is
    ``2C + c + 1``, so the whole rank sum is one exact integer fold and
    no row-level ranking window ever runs (state is distinct-values,
    not rows — the ks_drift shape). The normal approximation
    z = (U - n1*n2/2) / sqrt(n1*n2*(n+1)/12) evaluates in fixed IEEE
    order (one sqrt, one divide) without the tie-correction term
    (documented: with cents quantization ties are real but modest; the
    uncorrected z is conservative).
    """
    from pyspark.sql.window import Window

    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    base = (df.filter(F.col(value_col).isNotNull())
            .select(F.col(variant_col).alias("variant"),
                    cents.alias("v")))
    variants = [r.variant for r in
                base.select("variant").distinct().collect()]
    if len(variants) != 2:
        raise ValueError(
            f"mann_whitney_u needs exactly two variants, got {variants}")
    va, vb = sorted(variants)
    counts = base.groupBy("v").agg(
        F.sum((F.col("variant") == va).cast("long")).alias("a_c"),
        F.count(F.lit(1)).alias("c"))
    w = (Window.orderBy("v")
         .rowsBetween(Window.unboundedPreceding, -1))
    ranked = counts.select(
        "v", "a_c", "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cum"))
    agg = ranked.agg(
        F.sum("a_c").alias("n_a"),
        (F.sum("c") - F.sum("a_c")).alias("n_b"),
        F.sum(F.col("a_c") * (2 * F.col("cum") + F.col("c") + 1))
        .alias("r2_a"))
    # doubled U: U1*2 = 2*n_a*n_b + n_a*(n_a+1) - R1*2
    u2 = (2 * F.col("n_a") * F.col("n_b")
          + F.col("n_a") * (F.col("n_a") + 1) - F.col("r2_a"))
    n = F.col("n_a") + F.col("n_b")
    se = F.sqrt((F.col("n_a") * F.col("n_b")).cast("double")
                * (n + 1).cast("double") / F.lit(12.0))
    z = ((u2 - F.col("n_a") * F.col("n_b")).cast("double")
         / (F.lit(2.0) * se))
    z_micro = F.when(se > 0,
                     F.floor(z * 1000000 + F.lit(0.5)).cast("long"))
    return agg.select(
        F.lit(va).alias("variant_a"), F.lit(vb).alias("variant_b"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        u2.cast("long").alias("u2_a"),
        z_micro.alias("z_micro"),
        F.coalesce(F.abs(z_micro) > F.lit(z_critical_milli * 1000),
                   F.lit(False)).alias("significant"))


def chi_square_independence(
    df: DataFrame,
    variant_col: str,
    category_col: str,
    chi2_critical_milli: int = 9488,
) -> DataFrame:
    """Chi-square test of independence between an experiment variant and
    a categorical outcome — completes the experiment-analysis family
    (two-proportion z for binary, Mann-Whitney for continuous, chi2 for
    k-category outcomes like plan tier or error class).

    One row: (n_variants, n_categories, dof, chi2_micro, significant)
    with ``significant = chi2 > chi2_critical_milli/1000`` (the caller
    supplies the critical value for their dof/alpha — 9.488 is
    dof=4 at 0.05; chi-square quantiles are not IEEE-computable
    in-engine, so the threshold is an explicit literal, never a hidden
    approximation).

    Determinism: observed counts are exact BIGINTs from one pass; each
    cell's (O-E)^2/E term evaluates in fixed IEEE order from exact
    operands and quantizes to micro BEFORE the cross-cell sum (float
    sums are partition-order-private; integer sums are not) — so
    chi2_micro replays bit-for-bit. The textbook statistic sums over
    ALL r*c cells, so the observed counts are right-joined against the
    full distinct-variant x distinct-category grid: an EMPTY cell
    (O = 0) contributes (0-E)^2/E = E, and dropping those terms would
    systematically understate chi2 on sparse contingency tables.
    Cells with E = 0 cannot occur (E = row*col/N and both marginals
    are positive for every variant/category that appears at all).

    Scale: one (variant, category) partial-agg pass; everything after
    is cells x 1 frames (broadcast marginals; the grid cross-join is
    n_variants x n_categories — contingency-table-sized, never
    row-sized).
    """
    obs = (df.groupBy(F.col(variant_col).alias("variant"),
                      F.col(category_col).alias("category"))
           .agg(F.count(F.lit(1)).alias("o")))
    row_t = obs.groupBy("variant").agg(F.sum("o").alias("rt"))
    col_t = obs.groupBy("category").agg(F.sum("o").alias("ct"))
    n_t = obs.agg(F.sum("o").alias("n"))
    grid = (obs.select("variant").distinct()
            .crossJoin(F.broadcast(obs.select("category").distinct())))
    full = (grid.join(obs, ["variant", "category"], "left")
            .select("variant", "category",
                    F.coalesce(F.col("o"), F.lit(0)).alias("o")))
    cells = (full.join(F.broadcast(row_t), "variant")
             .join(F.broadcast(col_t), "category")
             .crossJoin(F.broadcast(n_t)))
    e = (F.col("rt") * F.col("ct")).cast("double") / F.col("n").cast("double")
    term_micro = F.floor(
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e)
        / e * 1000000 + F.lit(0.5)).cast("long")
    agg = cells.agg(
        F.countDistinct("variant").alias("n_variants"),
        F.countDistinct("category").alias("n_categories"),
        F.sum(term_micro).alias("chi2_micro"))
    dof = ((F.col("n_variants") - 1)
           * (F.col("n_categories") - 1)).cast("long")
    return agg.select(
        F.col("n_variants").cast("long").alias("n_variants"),
        F.col("n_categories").cast("long").alias("n_categories"),
        dof.alias("dof"),
        F.col("chi2_micro").cast("long").alias("chi2_micro"),
        (F.col("chi2_micro")
         > F.lit(chi2_critical_milli * 1000)).alias("significant"))


def sprt_binary(
    df: DataFrame,
    variant_col: str,
    ts_col: str,
    success_col: str,
    p0: float,
    p1: float,
    alpha_milli: int = 50,
    beta_milli: int = 200,
    n_buckets: int = 1024,
) -> DataFrame:
    """Wald's sequential probability ratio test per variant — the
    peeking-safe experiment monitor: instead of fixing n up front, the
    log-likelihood ratio accumulates event by event and the test STOPS
    the moment the evidence crosses either bound, typically at a
    fraction of the fixed-n sample size.

    Per variant: (variant, n, s, llr_micro, decision, decided_at_n)
    where ``decision`` is ``accept_h1`` / ``accept_h0`` / ``continue``
    and ``decided_at_n`` the 1-based event ordinal of the FIRST bound
    crossing (the sequential part — a later drift back inside the
    bounds cannot un-decide a stopped test).

    Exactness: the per-event increments ln(p1/p0) and ln((1-p1)/(1-p0))
    quantize to micro-nat literals ONCE driver-side and ride into both
    the plan and the generated oracle as the same integers, so the
    running LLR is an exact BIGINT fold (ordering ties on the
    timestamp break by success flag — rows tied on BOTH carry equal
    increments, so any order among them yields the same running values
    and the same first-crossing ordinal); the bounds
    ln(B) = ln(beta/(1-alpha)), ln(A) = ln((1-beta)/alpha) quantize
    the same way. ``ts_col`` must be castable to timestamp (nulls
    order first).

    Scale — two-level scan, NO per-variant whole-arm window (variants
    number 2-10, so ``Window.partitionBy(variant)`` would sort and
    prefix-sum an entire experiment arm in ONE task — billions of
    events at 100x; sessionization escapes that only because it
    partitions by user):

    1. one scan aggregates per (variant, time-bucket) success/failure
       counts (~``n_buckets`` x variants rows — the systematic-sample
       cumsum pattern from operators/sampling.py);
    2. a driver-side prefix over those bucket sums finds every bucket
       that COULD host the first crossing (entry LLR still inside the
       bounds and the SIGNED-extrema envelope reaches a bound:
       max_exit = entry + max(s*l1,0) + max(f*l0,0) >= hi or
       min_exit = entry + min(s*l1,0) + min(f*l0,0) <= lo — valid for
       BOTH hypothesis orderings, p1>p0 giving l1>0/l0<0 and p1<p0
       flipping both signs), stopping once a bucket's EXIT value has
       certainly crossed;
    3. one window partitioned by (variant, bucket) over only the
       candidate buckets — each a ~1/n_buckets slice of one arm —
       locates the exact first-crossing ordinal; totals and the final
       LLR are plain aggregates (final LLR = s*l1 + (n-s)*l0, no
       window at all).
    """
    import math

    if not (0 < p0 < 1 and 0 < p1 < 1 and p0 != p1):
        raise ValueError("p0 and p1 must be distinct probabilities in "
                         "(0, 1)")
    l1 = int(math.floor(math.log(p1 / p0) * 1e6 + 0.5))
    l0 = int(math.floor(math.log((1 - p1) / (1 - p0)) * 1e6 + 0.5))
    alpha = alpha_milli / 1000.0
    beta = beta_milli / 1000.0
    lo = int(math.floor(math.log(beta / (1 - alpha)) * 1e6 + 0.5))
    hi = int(math.floor(math.log((1 - beta) / alpha) * 1e6 + 0.5))

    from pyspark.sql.window import Window

    _NULL_BKT = -(1 << 61)
    base = df.select(
        F.col(variant_col).alias("variant"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tnum"),
        F.col(success_col).cast("long").alias("succ"))

    # bucket edges from one bounded agg (two scalars to the driver)
    rng = base.agg(F.min("tnum").alias("t0"),
                   F.max("tnum").alias("t1")).collect()[0]
    t0 = rng.t0 if rng.t0 is not None else 0
    t1 = rng.t1 if rng.t1 is not None else 0
    width = max(1, (t1 - t0) // max(1, n_buckets) + 1)
    # integer DIV (not double /): exact at any epoch distance, and the
    # numerator is non-negative so truncation == floor
    bkt_expr = F.when(F.col("tnum").isNull(), F.lit(_NULL_BKT)) \
        .otherwise(F.expr(f"(tnum - {t0}L) DIV {width}L"))
    bucketed = base.withColumn("bkt", bkt_expr)

    # level 1: per-(variant, bucket) partials — bounded collect
    # (variants x ~n_buckets rows), the only driver-side state
    parts = (bucketed.groupBy("variant", "bkt")
             .agg(F.count(F.lit(1)).alias("c"),
                  F.sum("succ").alias("sc"))
             .collect())
    by_variant: dict = {}
    for r in parts:
        by_variant.setdefault(r.variant, []).append(
            (r.bkt, int(r.c), int(r.sc or 0)))

    # level 2 (driver prefix over bucket sums): candidate buckets that
    # could host the FIRST crossing, each with its entry LLR/ordinal
    candidates = []                 # (variant, bkt, p_prev, n_prev)
    for variant, rows_v in by_variant.items():
        p_run, n_run = 0, 0
        for bkt, c, sc in sorted(rows_v):
            fc = c - sc
            # signed extrema of the running LLR inside this bucket:
            # p1>p0 gives l1>0/l0<0, p1<p0 flips both signs, so the
            # reachable maximum takes whichever increments are
            # positive and the minimum whichever are negative —
            # all-success / all-failure envelopes alone miss every
            # crossing when p1<p0 (l1<0 makes sc*l1 a LOWER bound)
            max_exit = p_run + max(sc * l1, 0) + max(fc * l0, 0)
            min_exit = p_run + min(sc * l1, 0) + min(fc * l0, 0)
            if max_exit >= hi or min_exit <= lo:
                candidates.append((variant, bkt, p_run, n_run))
            p_run += sc * l1 + fc * l0
            n_run += c
            if p_run >= hi or p_run <= lo:
                break               # first crossing is <= this bucket

    totals = base.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("succ").alias("s"))
    spark = df.sparkSession
    from pyspark.sql.types import (LongType, StructField, StructType)
    # the variant column keeps its source type (int experiment ids,
    # strings, ...) — a hardcoded string schema would mis-join or
    # raise on non-string variants
    v_field = base.schema["variant"]
    cand_schema = StructType([
        StructField("variant", v_field.dataType, True),
        StructField("bkt", LongType(), False),
        StructField("p_prev", LongType(), False),
        StructField("n_prev", LongType(), False)])
    if candidates:
        cand = local_df(spark, candidates, cand_schema)
        w_ord = Window.partitionBy("variant", "bkt") \
            .orderBy("tnum", "succ")
        w_run = w_ord.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)
        in_bkt = bucketed.join(F.broadcast(cand), ["variant", "bkt"])
        run = in_bkt.select(
            "variant", "p_prev", "n_prev",
            F.row_number().over(w_ord).alias("rn"),
            (F.col("p_prev")
             + F.sum(F.when(F.col("succ") == 1, F.lit(l1))
                     .otherwise(F.lit(l0))).over(w_run)).alias("llr"))
        crossed = run.select(
            "variant",
            (F.col("n_prev") + F.col("rn")).alias("gn"),
            F.when(F.col("llr") >= hi, F.lit("accept_h1"))
            .when(F.col("llr") <= lo, F.lit("accept_h0"))
            .alias("_dec")).filter(F.col("_dec").isNotNull())
        first_dec = (crossed.groupBy("variant")
                     .agg(F.min("gn").alias("decided_at_n"),
                          F.min_by("_dec", "gn").alias("decision")))
    else:
        from pyspark.sql.types import StringType
        first_dec = local_df(spark, [], StructType([
            StructField("variant", v_field.dataType, True),
            StructField("decided_at_n", LongType(), True),
            StructField("decision", StringType(), True)]))

    return (totals
            .join(F.broadcast(first_dec), "variant", "left")
            .select("variant",
                    F.col("n").cast("long").alias("n"),
                    F.col("s").cast("long").alias("s"),
                    (F.col("s") * F.lit(l1)
                     + (F.col("n") - F.col("s")) * F.lit(l0))
                    .cast("long").alias("llr_micro"),
                    F.coalesce("decision", F.lit("continue"))
                    .alias("decision"),
                    F.col("decided_at_n").cast("long")
                    .alias("decided_at_n")))


def basket_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_both: int = 1,
) -> DataFrame:
    """Association lift between item pairs across baskets (users,
    sessions, orders): ``lift(a,b) = P(a,b) / (P(a)·P(b))`` over basket
    membership — the market-basket signal behind "users who trigger X
    also trigger Y", > 1e6 micro meaning positive association.

    One row per unordered pair (item_a < item_b, co-occurrence >=
    ``min_both``): (item_a, item_b, n_a, n_b, n_both, lift_micro).

    Exactness: lift = n_both * N / (n_a * n_b) — all exact BIGINTs into
    ONE floor division after scaling by 1e6 (int64-safe while
    n_both·N·1e6 < 2^63 — shard past ~3e6 baskets with full
    co-occurrence, documented). No floats anywhere.

    Scale: distinct (basket, item) membership (one partial-agg
    shuffle), then a per-basket self-join on item < item — cost is
    sum of per-basket (k choose 2) with k = distinct items per basket,
    linear when item vocabularies per basket are bounded (event types,
    product categories); a hot basket with thousands of distinct items
    should be capped upstream like every other pair join here.
    """
    m = (df.select(F.col(basket_col).alias("b"),
                   F.col(item_col).alias("item"))
         .dropDuplicates(["b", "item"]))
    n_total = m.select("b").distinct().count()
    item_n = m.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    a = m.select("b", F.col("item").alias("item_a"))
    bb = m.select("b", F.col("item").alias("item_b"))
    pairs = (a.join(bb, "b")
             .filter(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("n_both"))
             .filter(F.col("n_both") >= min_both))
    return (pairs
            .join(item_n.select(F.col("item").alias("item_a"),
                                F.col("n").alias("n_a")), "item_a")
            .join(item_n.select(F.col("item").alias("item_b"),
                                F.col("n").alias("n_b")), "item_b")
            .select("item_a", "item_b",
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.col("n_both").cast("long").alias("n_both"),
                    F.expr(f"(n_both * {int(n_total)}L * 1000000L) DIV "
                           "(n_a * n_b)").alias("lift_micro")))
