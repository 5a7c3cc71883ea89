"""Table profiling: per-column statistics in one pass over the data.

The reference's ``discover``/``check`` surface probes source metadata
(row-count estimates, column comments, types — ``postgres_extractor.py:
333-514``) but computes nothing over the *values*. A data-profiling
operator is the ingestion-engine complement: given any DataFrame, emit a
long-form stats table — one row per profiled column — that a contract
author or drift monitor can diff run-over-run.

Output schema (all engines render these identically, so profiles are
oracle-checkable): ``column`` string, ``n_rows`` / ``n_null`` /
``n_distinct`` bigint, ``min_value`` / ``max_value`` string (native-typed
min/max cast to string *after* aggregation, so numeric ordering is
numeric, not lexicographic).

At 100 TB the cost question is the distinct counts:

* ``distinct_mode="approx"`` (the scale default): one
  ``approx_count_distinct`` (HLL++) per column — a single map-side
  combinable aggregate pass, KB of state per column, no row expansion.
* ``distinct_mode="exact"``: Spark plans k exact distincts over one scan
  via an Expand (each input row multiplied k ways, one shuffle) —
  exact, but the shuffle carries k copies of the projected columns.
  Right for tests/oracles and small dims; the docstring knob exists so
  the 100 TB caller never pays it accidentally.

Everything else (count/null/min/max) folds into the same single
aggregate — partial-aggregated map-side, merged at one reducer row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from dativo_ingest_spark.operators.util import local_df


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  distinct_mode: str = "approx",
                  rsd: float = 0.01) -> DataFrame:
    """Per-column profile of ``columns`` (default: every column).

    One aggregate job; the single stats row is then unpivoted JVM-side
    (``stack``) into the long form — no driver-side collect of data, no
    per-column pass.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    if distinct_mode not in ("exact", "approx"):
        raise ValueError("distinct_mode must be 'exact' or 'approx'")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"_nn_{i}"))
        if distinct_mode == "exact":
            aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{i}"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c), rsd).alias(f"_nd_{i}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{i}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{i}"))
    row = df.agg(*aggs)

    # unpivot the 1-row aggregate into (column, stats) rows
    parts = []
    for i, c in enumerate(cols):
        parts.append(
            f"'{c}', CAST(_n AS BIGINT), CAST(_n - _nn_{i} AS BIGINT), "
            f"CAST(_nd_{i} AS BIGINT), _min_{i}, _max_{i}")
    stacked = row.select(F.expr(
        f"stack({len(cols)}, {', '.join(parts)}) AS "
        "(`column`, n_rows, n_null, n_distinct, min_value, max_value)"))
    return stacked


def column_top_values(df: DataFrame, column: str, k: int = 10) -> DataFrame:
    """Top-k most frequent values of one column:
    ``[value string, n bigint]``, ties broken by value so the cut is
    deterministic. One map-side-combined count + a k-row ordered take —
    the standard companion drill-down to a profile row."""
    return (
        df.groupBy(F.col(column).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("value"))
        .limit(k)
    )


def fd_violations(df: DataFrame,
                  pairs: list[tuple[str, str]]) -> DataFrame:
    """Functional-dependency check over candidate (determinant ->
    dependent) column pairs — the contract-discovery complement of
    :func:`profile_table`: ``det -> dep`` holds iff no determinant value
    maps to two dependent values, i.e. ``n_distinct(det, dep) ==
    n_distinct(det)``.

    Output: ``[determinant, dependent, n_det bigint, n_pairs bigint,
    violations bigint, is_fd boolean]`` — ``violations`` counts the
    extra (det, dep) combinations beyond one-per-determinant (0 = the
    FD holds; a contract author can then mark ``dep`` derivable or a
    drift monitor can alarm when a historical FD breaks).

    All pairs fold into ONE aggregate job: each needs two exact distinct
    counts, which Catalyst plans as a single Expand-widened pass (the
    ``profile_table(distinct_mode="exact")`` cost shape — 2*k row
    multiplication, one shuffle). FD checking is inherently exact; there
    is no sketch mode (HLL error would fabricate or mask violations).
    """
    if not pairs:
        raise ValueError("pairs must be non-empty")
    for det, dep in pairs:
        for c in (det, dep):
            if c not in df.columns:
                raise ValueError(f"fd_violations: unknown column {c!r}")
    aggs = []
    for i, (det, dep) in enumerate(pairs):
        aggs.append(F.countDistinct(F.col(det)).alias(f"_d_{i}"))
        aggs.append(
            F.countDistinct(F.col(det), F.col(dep)).alias(f"_p_{i}"))
    row = df.agg(*aggs)
    parts = []
    for i, (det, dep) in enumerate(pairs):
        parts.append(
            f"'{det}', '{dep}', CAST(_d_{i} AS BIGINT), "
            f"CAST(_p_{i} AS BIGINT), CAST(_p_{i} - _d_{i} AS BIGINT), "
            f"_p_{i} = _d_{i}")
    return row.select(F.expr(
        f"stack({len(pairs)}, {', '.join(parts)}) AS "
        "(determinant, dependent, n_det, n_pairs, violations, is_fd)"))


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    exact: bool = True,
    micro_units: int = 1_000_000,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    numeric distribution (the standard model-monitoring drift score;
    the numeric-feature complement of the corpus-level unigram KL in
    operators/textops.py:unigram_drift — a 100 TB pipeline runs both
    over each ingest batch to catch upstream regressions before they
    reach training).

    Fit-on-reference equi-depth bins (operators/quality.py:
    equi_depth_edges — exact interpolated percentiles here, the
    mergeable-sketch knob for 100 TB), then
    ``PSI = sum_i (p_i - q_i) * ln(p_i / q_i)`` with add-one (Laplace)
    smoothing so empty bins are well-defined. Returns one row per bin:
    (bin, n_ref, n_cur, psi_micro) — the total is one sum on top;
    per-bin grain localizes WHERE the distribution moved. The
    conventional rule of thumb: total PSI < 0.1 stable, > 0.25 shifted.

    Determinism: counts are exact BIGINTs; the float term evaluates in
    a FIXED IEEE order ((p - q) * ln(p / q), each share one divide)
    and quantizes to integer micro-nats, so the score is oracle-exact.

    Scale: one percentile aggregate over the reference + one
    scan-stage bin cascade and count-shuffle per side (keyed on
    ~n_bins values — trivially small); the bin-domain frame and the
    two one-row totals broadcast. Nothing here grows with data volume
    except the two linear scans.
    """
    from dativo_ingest_spark.operators.quality import (
        apply_equi_depth_bins, equi_depth_edges)

    edges = equi_depth_edges(ref, value_col, n_bins, exact=exact)
    k = len(edges) + 1  # bin count (also the Laplace denominator add)

    def _binned(df: DataFrame, out: str) -> DataFrame:
        return (
            apply_equi_depth_bins(df, value_col, edges)
            .filter(F.col("bin").isNotNull())
            .groupBy("bin").agg(F.count(F.lit(1)).alias(out))
        )

    spark = ref.sparkSession
    domain = spark.range(k).select(F.col("id").alias("bin"))
    rb = _binned(ref, "n_ref")
    cb = _binned(cur, "n_cur")
    joined = (
        domain.join(rb, "bin", "left").join(cb, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = joined.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur"))
    p = ((F.col("n_ref") + 1).cast("double")
         / (F.col("t_ref") + k).cast("double"))
    q = ((F.col("n_cur") + 1).cast("double")
         / (F.col("t_cur") + k).cast("double"))
    return (
        joined.join(F.broadcast(tot))
        .select(
            "bin", "n_ref", "n_cur",
            F.floor((p - q) * F.log(p / q) * micro_units + 0.5)
            .cast("long").alias("psi_micro"),
        )
    )


def ks_drift(
    ref: DataFrame,
    cur: DataFrame,
    key_cols: list[str],
    value_col: str,
    c_milli: int = 1358,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift test per key group —
    the distribution-free complement of :func:`psi_drift` (PSI needs
    bins and a stability rule of thumb; KS gives a calibrated p-value
    threshold with NO binning, so it catches shape changes equi-depth
    bins can wash out).

    One row per key: (key..., n_ref, n_cur, d_stat_micro, crit_micro,
    drift) where ``d_stat_micro`` is the KS statistic
    ``D = max_x |ECDF_ref(x) - ECDF_cur(x)|`` in exact micro-units and
    ``drift = d_stat_micro > crit_micro`` at the ``c_milli/1000``
    significance coefficient (1.358 ~ alpha 0.05, 1.628 ~ 0.01).

    Determinism: values quantize to cents (BIGINT) so grouping/ordering
    never touches a float; the ECDF gap clears denominators —
    ``|cum_ref * m - cum_cur * n|`` is an exact BIGINT whose max then
    integer-divides by n*m into micro-units. The critical value
    ``c * sqrt((n+m)/(n*m))`` uses only IEEE correctly-rounded single
    ops (one divide, one sqrt, one multiply) before quantization, so
    both engines floor the same integer — unlike ln, sqrt is exact by
    the standard. int64 bound: |gap|*1e6 <= n*m*1e6 — safe to ~3e12
    pairwise product; shard larger groups or drop to 1e3 units past
    that (documented contract, not a silent overflow).

    Scale shape: one (key, value)-grain count aggregate (partial,
    map-side combinable), one key-partitioned ordered window for the
    running ECDFs (the unordered per-key totals reuse the same
    partitioning — no extra Exchange), one final per-key max. State is
    distinct-values-per-key, not rows.
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one grouping column")
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")

    def _side(df: DataFrame, flag: int) -> DataFrame:
        return (df.filter(F.col(value_col).isNotNull())
                .select(*key_cols, cents.alias("v"),
                        F.lit(flag).alias("is_ref")))

    pooled = _side(ref, 1).unionByName(_side(cur, 0))
    counts = pooled.groupBy(*key_cols, "v").agg(
        F.sum("is_ref").cast("long").alias("r_i"),
        F.sum(1 - F.col("is_ref")).cast("long").alias("c_i"))
    w_cum = (Window.partitionBy(*key_cols).orderBy("v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(*key_cols)
    gapped = counts.select(
        *key_cols,
        F.sum("r_i").over(w_cum).alias("cum_r"),
        F.sum("c_i").over(w_cum).alias("cum_c"),
        F.sum("r_i").over(w_all).alias("n"),
        F.sum("c_i").over(w_all).alias("m"),
    ).select(
        *key_cols, "n", "m",
        F.abs(F.col("cum_r") * F.col("m")
              - F.col("cum_c") * F.col("n")).alias("gap"),
    )
    return (gapped.groupBy(*key_cols)
            .agg(F.max("n").alias("n_ref"), F.max("m").alias("n_cur"),
                 F.max("gap").alias("d_int"))
            .filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
            .select(
                *key_cols, "n_ref", "n_cur",
                F.expr("(d_int * 1000000) DIV (n_ref * n_cur)")
                .alias("d_stat_micro"),
                F.floor(
                    F.lit(float(c_milli * 1000))
                    * F.sqrt((F.col("n_ref") + F.col("n_cur")).cast("double")
                             / (F.col("n_ref") * F.col("n_cur"))
                             .cast("double"))
                    + F.lit(0.5)).cast("long").alias("crit_micro"))
            .withColumn("drift",
                        F.col("d_stat_micro") > F.col("crit_micro")))


def dataset_card(df: DataFrame, id_col: str, text_col: str,
                 lang_col: str | None = None) -> DataFrame:
    """Dataset datasheet in one place — the summary block every released
    corpus ships (Gebru et al.'s "Datasheets for Datasets" reduced to
    its quantitative rows): volume, vocabulary, duplication, PII
    exposure and length shape, each an exact engine-portable integer.

    (metric string, value bigint) rows: n_docs, total_words,
    total_chars, vocab_size, dup_docs (docs whose exact text content is
    shared with at least one other doc — md5 groups), docs_with_email,
    median_words_x2 (doubled so the interpolated exact median stays an
    integer), n_langs (when ``lang_col`` given).

    Scale: one tokenized scan feeding three aggregates (doc grain,
    word grain, md5 grain) — the vocab count is the only
    vocabulary-sized exchange; everything else is doc-grain partial
    aggs. The report frame is a dozen rows at any corpus size.
    """
    from dativo_ingest_spark.functions import text
    from dativo_ingest_spark.operators.pii import PII_PATTERNS

    base = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
        *([F.col(lang_col).alias("lang")] if lang_col else []))
    words = base.select("id", text.words(F.col("t")).alias("w"),
                        F.md5(F.col("t")).alias("fp"),
                        F.length("t").alias("nc"),
                        (F.regexp_count(
                            F.col("t"),
                            F.lit(PII_PATTERNS["email"])) > 0)
                        .cast("long").alias("has_email"),
                        *(["lang"] if lang_col else []))
    doc_stats = words.select(
        "id", F.size("w").cast("long").alias("nw"), "nc", "fp",
        "has_email", *(["lang"] if lang_col else []))
    agg = doc_stats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nw").alias("total_words"),
        F.sum("nc").alias("total_chars"),
        F.sum("has_email").alias("docs_with_email"),
        F.floor(F.expr("percentile(nw, 0.5D)") * 2 + F.lit(0.5))
        .alias("median_words_x2"),
        *([F.countDistinct("lang").alias("n_langs")] if lang_col
          else []))
    vocab = (words.select(F.explode("w").alias("word"))
             .agg(F.countDistinct("word").alias("vocab_size")))
    dups = (doc_stats.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
            .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("dup_docs")))
    row = agg.crossJoin(F.broadcast(vocab)).crossJoin(F.broadcast(dups)) \
        .first()
    metrics = [("n_docs", row["n_docs"]),
               ("total_words", row["total_words"]),
               ("total_chars", row["total_chars"]),
               ("vocab_size", row["vocab_size"]),
               ("dup_docs", row["dup_docs"]),
               ("docs_with_email", row["docs_with_email"]),
               ("median_words_x2", row["median_words_x2"])]
    if lang_col:
        metrics.append(("n_langs", row["n_langs"]))
    spark = df.sparkSession
    return local_df(spark, 
        [(k, int(v)) for k, v in metrics], "metric string, value bigint")


#: Benford expected first-digit shares, micro-quantized once (the
#: vendored-constant pattern): floor(log10(1 + 1/d) * 1e6 + 0.5)
BENFORD_MICRO = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_check(df: DataFrame, value_col: str) -> DataFrame:
    """First-digit (Benford's law) conformity report — the classic
    fabrication/corruption tripwire for organically-grown numeric
    columns (amounts, populations, file sizes): genuine multiplicative
    data leads with 1 ~30%% of the time, uniform-random or hand-typed
    data doesn't.

    One row per digit 1-9 — ALWAYS all nine, right-joined against the
    inlined 1..9 digit table: a digit with ZERO observations is the
    strongest Benford anomaly (dev_micro = expected_micro) and must
    appear as n_obs = 0, not silently vanish from the report. Columns:
    (digit, n_obs, obs_micro, expected_micro, dev_micro). Total
    deviation / max dev is the caller's alarm knob (Benford conformity
    thresholds are domain lore, not statistics — report the exact
    numbers, let the monitor pick the bar).

    Exactness: the first digit extracts from the BIGINT cents' decimal
    STRING (regexp on digits — no log10 at runtime); observed shares
    are pure integer floor divisions; the expected shares are
    micro-quantized constants inlined on both engines. Zero floats.

    Scale: one scan-stage digit extraction + a 9-key count — nothing
    else.
    """
    cents = F.floor(F.abs(F.col(value_col)) * 100 + F.lit(0.5)) \
        .cast("long")
    digits = (df.filter(F.col(value_col).isNotNull())
              .select(F.regexp_extract(cents.cast("string"),
                                       "^([1-9])", 1).alias("d"))
              .filter(F.col("d") != ""))
    observed = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n_obs"))
    all_digits = (df.sparkSession.range(1, 10)
                  .select(F.col("id").cast("string").alias("d")))
    counts = (all_digits.join(observed, "d", "left")
              .select("d",
                      F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs")))
    total = digits.count()
    exp_expr = F.element_at(
        F.array(*[F.lit(BENFORD_MICRO[d]) for d in range(1, 10)]),
        F.col("d").cast("int"))
    return (counts.select(
        F.col("d").cast("long").alias("digit"),
        F.col("n_obs").cast("long").alias("n_obs"),
        F.expr(f"(n_obs * 1000000) DIV {max(int(total), 1)}L")
        .alias("obs_micro"),
        exp_expr.cast("long").alias("expected_micro"))
        .withColumn("dev_micro",
                    F.abs(F.col("obs_micro") - F.col("expected_micro"))
                    .cast("long")))


def gini_concentration(df: DataFrame, group_col: str,
                       weight_col: str) -> DataFrame:
    """Gini coefficient of weight concentration across groups — the
    corpus-diversity readout next to Pareto-ABC: how much of the corpus
    (tokens, bytes, documents) comes from how few sources/hosts/
    domains. 0 = perfectly even, ->1 = one group holds everything; a
    rising Gini across ingest runs means the crawl is collapsing onto a
    few mega-sources even when volume looks healthy.

    One row: (n_groups, total_weight, gini_micro). With ascending-sorted
    group weights x_1..x_n, ``Gini = (2*sum(i*x_i) - (n+1)*S) / (n*S)``
    — every term an exact BIGINT (tie blocks contribute x*sum(ranks)
    regardless of intra-tie order, so the statistic is
    permutation-stable), one final correctly-rounded division before
    micro quantization.

    Scale: one group aggregate (the only corpus-sized pass), then a
    rank window over the GROUP-cardinality frame — sources/hosts number
    thousands, not billions; past that, bucket the weights first.
    """
    from pyspark.sql.window import Window

    g = (df.groupBy(F.col(group_col).alias("g"))
         .agg(F.sum(F.coalesce(F.col(weight_col), F.lit(0))
                    .cast("long")).alias("x")))
    ranked = g.select(
        "x", F.row_number().over(Window.orderBy("x", "g")).alias("i"))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("i") * F.col("x")).alias("w"))
    gini = ((2 * F.col("w") - (F.col("n") + 1) * F.col("s"))
            .cast("double")
            / (F.col("n") * F.col("s")).cast("double"))
    return agg.select(
        F.col("n").cast("long").alias("n_groups"),
        F.col("s").cast("long").alias("total_weight"),
        F.when(F.col("s") > 0,
               F.floor(gini * 1000000 + F.lit(0.5)))
        .cast("long").alias("gini_micro"))
