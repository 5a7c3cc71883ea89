"""In-engine training of the linear quality classifier.

The reference ships *inference* for an offline-trained quality head (the
classifier-gate flow this repo mirrors in
``operators/textops.py:learned_classifier_infer`` — FineWeb-Edu's
"train a small head offline, score the corpus in the pipeline" shape);
training itself lives outside the reference engine. This module closes
that loop IN-engine, Spark-first (a beyond-reference component, like the
Singer/Meltano engines and the JSONL contract source): full-batch
logistic-regression training where each round is ONE distributed
aggregate over a persisted fixed-point feature frame and the weight
update runs driver-side over a 5-number gradient vector.

Determinism / oracle story (the DoReMi discipline, dsir.py:190):

* Features are the exact 1e4-scale BIGINT fixed point the inference seam
  uses (``learned_classifier_infer``), so train and infer share one
  representation.
* The sigmoid is the **hard sigmoid** ``max(0, min(1, z/4 + 1/2))`` —
  the standard quantized-training surrogate (same slope 1/4 at 0 as the
  logistic, saturating at |z| = 2). In milli units it is
  ``(clamp(z_micro, ±2e6) + 2e6) DIV 4000`` — the numerator is
  non-negative BY CONSTRUCTION, so Spark's truncating ``DIV``, DuckDB's
  truncating ``//`` and Python's flooring ``//`` all agree bit-for-bit.
* The margin ``z_micro = (Σ w_j·x_j) / 1e4`` also divides through a
  non-negative numerator: ``(S + OFF) DIV 1e4 − OFF/1e4`` with
  ``OFF = 5·W_MAX·X_SCALE`` ≥ |S| (weights are clipped to ±W_MAX, the
  features to [0, X_SCALE] by construction).
* Gradient sums CAN be negative, so their divisions happen only where
  exactly two implementations must agree: the driver (:func:`_tdiv`,
  truncation toward zero) and the DuckDB oracle (``//``, which also
  truncates toward zero — verified; Python's bare ``//`` floors and is
  deliberately NOT used). Spark never divides a signed quantity.

Scale shape: the feature frame is computed once (scan-stage, zero
shuffle — quality_features + fixed-point projection) and persisted;
every training round is ONE map-side-combinable aggregate producing a
6-value row (5 gradient sums + n). No window, no join, no Python UDF in
the loop; weights re-enter each round's plan as literals. Per-doc
per-feature gradient magnitude ≤ X_SCALE·1e3 = 1e7, so the int64 sums
hold to ~9e11 documents; beyond that the same two-level mean used by
the samplers applies (document the swap, don't pre-pay it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dativo_ingest_spark.operators.textops import quality_features
from dativo_ingest_spark.operators.util import local_df

MICRO = 1_000_000
X_SCALE = 10_000          # features are 1e4 fixed point (infer-seam scale)
W_MAX = 10 * MICRO        # weight clip: keeps every w·x product in int64
Z_SAT = 2 * MICRO         # hard sigmoid saturates at |z| = 2 (natural)
_OFF = 5 * W_MAX * X_SCALE  # ≥ |Σ w_j·x_j| for 5 clipped features

#: feature order — shared with learned_classifier_infer's fixed frame
FEATURES = ("bias", "words", "stopwords", "punct", "word_len")


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward ZERO — DuckDB's ``//``
    semantics, so the SQL oracle replays driver-side updates exactly.
    (Python's ``//`` floors: -7 // 2 == -4, DuckDB returns -3.)"""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def fixed_point_features(df: DataFrame, id_col: str, text_col: str,
                         label_col: str | None = None) -> DataFrame:
    """The inference seam's 1e4-scale BIGINT features, with an optional
    0/1 label column riding the same scan (no re-join):
    (id, x0..x4[, y]). Every x_j lies in [0, X_SCALE] by construction
    (ratios are ratios; words and word-length are clamped)."""
    if label_col in ("id", "n_chars", "n_words", "avg_word_len",
                     "punct_ratio", "stopword_ratio", "quality_ok"):
        # the passthrough rides the featurization select; a label named
        # like a feature column would silently shadow it
        raise ValueError(
            f"label_col '{label_col}' collides with a feature column; "
            "rename the label before training")
    passthrough = (label_col,) if label_col else ()
    feats = quality_features(df, id_col, text_col,
                             passthrough=passthrough)
    cols = [
        F.col("id"),
        F.lit(X_SCALE).cast("long").alias("x0"),
        (F.least(F.col("n_words"), F.lit(1000)) * F.lit(10))
        .cast("long").alias("x1"),
        F.floor(F.col("stopword_ratio") * F.lit(10000) + F.lit(0.5))
        .cast("long").alias("x2"),
        F.floor(F.col("punct_ratio") * F.lit(10000) + F.lit(0.5))
        .cast("long").alias("x3"),
        F.floor(F.least(F.col("avg_word_len"), F.lit(10.0)) * F.lit(1000)
                + F.lit(0.5)).cast("long").alias("x4"),
    ]
    if label_col:
        cols.append(F.col(label_col).cast("long").alias("y"))
    return feats.select(*cols)


def margin_micro(weights_micro: list[int]) -> Column:
    """Exact integer margin ``z_micro = Σ w_j·x_j / X_SCALE`` over the
    fixed feature columns x0..x4, via the non-negative-offset trick so
    truncation == floor in every engine."""
    if len(weights_micro) != len(FEATURES):
        raise ValueError(f"need {len(FEATURES)} weights")
    for w in weights_micro:
        if abs(w) > W_MAX:
            raise ValueError(f"weight {w} exceeds ±{W_MAX} clip")
    s = " + ".join(f"x{j} * CAST({w} AS BIGINT)"
                   for j, w in enumerate(weights_micro))
    return F.expr(
        f"({s} + CAST({_OFF} AS BIGINT)) DIV {X_SCALE} "
        f"- CAST({_OFF // X_SCALE} AS BIGINT)")


def hard_sigmoid_milli(z_micro: Column) -> Column:
    """``σ_milli(z) = (clamp(z, ±Z_SAT) + Z_SAT) DIV 4000`` ∈ [0, 1000].
    The shifted numerator is non-negative, so subtract-mod division is
    exact and engine-neutral (Spark ``%`` takes the dividend's sign —
    irrelevant on a non-negative dividend)."""
    zc = F.greatest(F.lit(-Z_SAT).cast("long"),
                    F.least(F.lit(Z_SAT).cast("long"),
                            z_micro.cast("long")))
    shifted = zc + F.lit(Z_SAT).cast("long")
    return ((shifted - shifted % F.lit(4000)) / F.lit(4000)).cast("long")


def train_quality_logreg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    n_rounds: int = 4,
    lr_milli: int = 2000,
    init_micro: list[int] | None = None,
    two_level: int | None = None,
    minibatch: int | None = None,
    minibatch_layout_dir: str | None = None,
) -> DataFrame:
    """Train the binary quality head by full-batch gradient descent under
    the hard-sigmoid surrogate; returns one row per feature:
    (feature, weight_micro, grad_sum_last).

    Per round (all exact integers):

    1. ``z_micro = Σ w_j·x_j / 1e4`` per doc   (offset-DIV, in-plan)
    2. ``σ_milli = hard_sigmoid(z)``           (non-negative DIV, in-plan)
    3. ``err = σ_milli − 1000·y``              (∈ [−1000, 1000])
    4. cluster: ``g_j = Σ x_j·err``, ``n = count(*)``  (ONE aggregate)
    5. driver: ``w_j ← clip(w_j − tdiv(lr_milli·tdiv(g_j, n), 1e4),
       ±W_MAX)`` — ``tdiv`` truncates toward zero like DuckDB ``//``.

    The update is the logistic-loss gradient ``x(σ−y)`` with σ swapped
    for its hard surrogate; lr_milli=1000 is a natural learning rate of
    1.0. ``n_rounds=0`` returns the (clipped) init unchanged.

    Labels must be binary: any y outside {0, 1} raises before the first
    pass — a stray label would push ``err`` outside its documented
    [−1000, 1000] range, voiding the int64 gradient-sum bound and
    silently training a non-logistic objective (the multiclass trainer
    has carried this guard since r11; mirrored here per ADVICE r11).

    ``two_level`` (r11 verdict Next #6 — the samplers' enforced-not-
    documented pattern): the single aggregate's int64 gradient sums
    bound the corpus at ~9e11 documents (per-doc per-feature magnitude
    ≤ X_SCALE·1e3 = 1e7). Passing ``two_level=B`` swaps round topology
    to a (bucket = hash(id) mod B) partial-sum aggregate — B bounded
    rows to the driver, combined there with Python's unbounded ints —
    which multiplies the corpus bound by ~B (modulo hash skew; buckets
    are md5-uniform over ids). The combine is exact integer addition,
    commutative and associative, so the trained weights are
    BIT-IDENTICAL to the single-aggregate path (pinned by a test);
    still one map-side-combinable aggregate per round, now keyed.

    ``minibatch`` (r12 verdict Next #6): passing ``minibatch=B`` (B>1)
    makes round ``r`` aggregate over ONLY the md5-shard bucket
    ``hash(id) % B == r % B`` — a deterministic, layout-independent
    mini-batch schedule with a fixed visit order (bucket 0, 1, …,
    wrapping), so per-round aggregate work drops ~B× while the result
    stays bit-reproducible across partitionings/retries/engines (the
    bucket is id-derived, never partition-derived — pinned by a test).
    On a columnar store the bucket predicate prunes the round's scan;
    on the cached path it prunes the aggregate's input. An EMPTY bucket
    skips its update (the round is a no-op) rather than ending
    training. ``minibatch=1`` is exactly full-batch (bit-identical).
    Composes with ``two_level`` (different md5 salt, so the two bucket
    keys are independent).

    ``minibatch_layout_dir`` (r13 verdict Next #2 — the at-scale half
    of the schedule): with ``minibatch=B``, stage the featurized frame
    ONCE to hive-partitioned parquet keyed by ``_mb_bucket`` under this
    directory, and run every round against the READ-BACK frame — round
    ``r``'s bucket filter then partition-prunes the scan to bucket
    ``r mod B``'s files, so each round reads ~1/B of the corpus FROM
    STORAGE instead of scanning everything to discard (B−1)/B of it
    (the cached path is free locally, but at 100 TB the cache doesn't
    hold and every round re-reads the corpus). Features are exact
    BIGINTs, so the parquet round-trip is bit-lossless and the trained
    weights are BIT-IDENTICAL to the in-memory path (pinned by a
    test). The caller owns the directory (a scratch path or a
    bucketed FsTable stage); it is left in place for re-runs.
    """
    if n_rounds < 0:
        raise ValueError("n_rounds must be >= 0")
    if lr_milli < 0:
        raise ValueError("lr_milli must be >= 0")
    if two_level is not None and two_level < 1:
        raise ValueError("two_level bucket count must be >= 1")
    if minibatch is not None and minibatch < 1:
        raise ValueError("minibatch bucket count must be >= 1")
    w = list(init_micro) if init_micro is not None \
        else [0] * len(FEATURES)
    if len(w) != len(FEATURES):
        raise ValueError(f"init_micro needs {len(FEATURES)} entries")
    w = [max(-W_MAX, min(W_MAX, int(v))) for v in w]

    def _mb_bucket_col():
        # id-derived (NOT partition-derived) shard key, salted so it is
        # independent of the two_level key — deterministic across
        # layouts, retries and engines
        return (F.conv(F.substring(
            F.md5(F.concat(F.lit("mb:"),
                           F.col("id").cast("string"))), 1, 8),
            16, 10).cast("long") % F.lit(int(minibatch))).cast("long")

    staged_layout = (minibatch is not None and minibatch > 1
                     and minibatch_layout_dir is not None)
    feats = fixed_point_features(df, id_col, text_col, label_col) \
        .filter(F.col("y").isNotNull())
    if staged_layout:
        # one featurization pass writes the bucket-partitioned layout;
        # every round then reads ONLY its bucket's files (hive
        # partition pruning on the _mb_bucket directory key)
        (feats.withColumn("_mb_bucket", _mb_bucket_col())
         .write.mode("overwrite").partitionBy("_mb_bucket")
         .parquet(minibatch_layout_dir))
        base = df.sparkSession.read.parquet(minibatch_layout_dir)
    else:
        # persist BEFORE the label guard (ADVICE r12): the guard's
        # count() is then the featurization pass that fills the cache
        # the gradient rounds read, instead of a full throwaway scan
        base = feats.persist()
    fixed = base
    try:
        bad = fixed.filter(~F.col("y").isin(0, 1)).count()
        if bad:
            raise ValueError(
                f"{bad} labels outside {{0, 1}}; pre-binarize the label "
                "column before training")
        if two_level is not None:
            # md5-uniform bucket key: deterministic, id-derived, and
            # irrelevant to the result (integer addition is exact and
            # commutative — bucketing only bounds each partial sum).
            # Derived on top of the persisted base: the cached subtree
            # still serves the bucketed plan's scan.
            fixed = fixed.withColumn(
                "_tl_bucket",
                (F.conv(F.substring(F.md5(F.col("id").cast("string")),
                                    1, 8),
                        16, 10).cast("long") % F.lit(int(two_level)))
                .cast("long"))
        if minibatch is not None and minibatch > 1 and not staged_layout:
            fixed = fixed.withColumn("_mb_bucket", _mb_bucket_col())
        grads = [0] * len(FEATURES)
        for rnd in range(n_rounds):
            err = (hard_sigmoid_milli(margin_micro(w))
                   - F.col("y") * F.lit(1000)).alias("_err")
            scored = fixed.select("*", err)
            if minibatch is not None and minibatch > 1:
                # fixed visit order: round r reads bucket r mod B
                scored = scored.filter(
                    F.col("_mb_bucket") == F.lit(rnd % minibatch))
            aggs = [F.sum(F.col(f"x{j}") * F.col("_err")).alias(f"g{j}")
                    for j in range(len(FEATURES))]
            aggs.append(F.count(F.lit(1)).alias("n"))
            if two_level is None:
                rows = [scored.agg(*aggs).first()]
            else:
                # B bounded partial rows; the exact combine happens here
                # with Python's unbounded ints
                rows = scored.groupBy("_tl_bucket").agg(*aggs).collect()
            n = sum(int(r["n"]) for r in rows)
            if n == 0:
                if minibatch is not None and minibatch > 1:
                    continue  # empty SHARD: skip the round, keep going
                break  # empty corpus: no later round can be non-empty
            grads = [sum(int(r[f"g{j}"]) for r in rows)
                     for j in range(len(FEATURES))]
            for j in range(len(FEATURES)):
                delta = _tdiv(lr_milli * _tdiv(grads[j], n), X_SCALE)
                w[j] = max(-W_MAX, min(W_MAX, w[j] - delta))
    finally:
        base.unpersist()
    out = [(FEATURES[j], w[j], grads[j]) for j in range(len(FEATURES))]
    return local_df(df.sparkSession, 
        out, "feature string, weight_micro bigint, grad_sum_last bigint")


def quality_score_milli(text_col: str | Column,
                        weights_micro: list[int]) -> Column:
    """The trained head's score as ONE self-contained Column expression
    over a raw text column — featurize + margin + hard sigmoid inline,
    so a STREAMING batch (or any frame that must keep its full row)
    filters scan-stage with zero Python and no select pipeline.
    NULL text scores as empty text (a gate needs a total function).
    Bit-identical to :func:`predict_quality_logreg`'s score by
    construction of the same integer formulas (pinned by a test)."""
    from functools import reduce
    from operator import add

    from dativo_ingest_spark.functions import text
    from dativo_ingest_spark.operators.textops import PUNCT_PATTERN

    if len(weights_micro) != len(FEATURES):
        raise ValueError(f"need {len(FEATURES)} weights")
    for w in weights_micro:
        if abs(w) > W_MAX:
            raise ValueError(f"weight {w} exceeds ±{W_MAX} clip")
    txt = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col,
        F.lit(""))
    norm = text.normalize_ws(txt)
    words = F.when(norm == "", F.array().cast("array<string>")) \
        .otherwise(F.split(norm, " "))
    n_chars = F.length(txt).cast("long")
    n_words = F.size(words).cast("long")
    letters = F.length(F.regexp_replace(norm, " ", ""))
    n_punct = F.size(F.regexp_extract_all(txt, F.lit(PUNCT_PATTERN), 0))
    stop_hits = F.size(F.filter(words,
                                lambda w: w.isin(*text.STOPWORDS)))
    awl = F.round(F.when(n_words == F.lit(0), F.lit(0.0))
                  .otherwise(letters / n_words), 4)
    pr = F.round(F.when(n_chars == F.lit(0), F.lit(0.0))
                 .otherwise(n_punct / n_chars), 4)
    sr = F.round(F.when(n_words == F.lit(0), F.lit(0.0))
                 .otherwise(stop_hits / n_words), 4)
    xs = [
        F.lit(X_SCALE).cast("long"),
        (F.least(n_words, F.lit(1000)) * F.lit(10)).cast("long"),
        F.floor(sr * F.lit(10000) + F.lit(0.5)).cast("long"),
        F.floor(pr * F.lit(10000) + F.lit(0.5)).cast("long"),
        F.floor(F.least(awl, F.lit(10.0)) * F.lit(1000) + F.lit(0.5))
        .cast("long"),
    ]
    s = reduce(add, [x * F.lit(int(w))
                     for x, w in zip(xs, weights_micro)])
    shifted = (s + F.lit(_OFF)).cast("long")  # ≥ 0 by the weight clip
    z = ((shifted - shifted % F.lit(X_SCALE)) / F.lit(X_SCALE)) \
        .cast("long") - F.lit(_OFF // X_SCALE)
    return hard_sigmoid_milli(z)


def predict_quality_logreg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights_micro: list[int],
    threshold_milli: int = 500,
) -> DataFrame:
    """Score documents under a trained weight vector:
    (id, score_milli, predicted) — the same exact-integer margin and
    hard sigmoid as training, so train-time and serve-time scores agree
    bit-for-bit. Scan-stage: zero shuffle, zero Python."""
    fixed = fixed_point_features(df, id_col, text_col)
    score = hard_sigmoid_milli(margin_micro(weights_micro))
    return fixed.select(
        "id",
        score.cast("long").alias("score_milli"),
        (score >= F.lit(threshold_milli)).alias("predicted"),
    )


def train_quality_grades(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    n_classes: int = 4,
    n_rounds: int = 4,
    lr_milli: int = 2000,
    two_level: int | None = None,
) -> DataFrame:
    """One-vs-rest multiclass trainer for the grade head — produces the
    SAME (n_classes × 5) integer weight-matrix shape the vendored
    ``models/quality_grades_v1.json`` inference artifact carries, so a
    trained matrix drops straight into
    ``textops.learned_classifier_infer(model=...)`` (argmax is
    invariant to the micro-vs-milli scale; a common positive factor
    cannot reorder logits).

    One row per (class, feature): (class, feature, weight_micro).

    Every round is still ONE distributed aggregate: the per-class
    margins/sigmoids are sibling Column expressions in a single
    projection, and the n_classes·5 gradient sums + n ride one
    map-side-combinable agg row back to the driver (bounded:
    classes × features integers). Same exactness contract as the
    binary trainer — non-negative in-plan divisions, signed divisions
    driver-side with DuckDB's truncation semantics. Labels outside
    [0, n_classes) raise before any pass (a silent all-rest class
    would train a head nobody asked for).

    ``two_level`` mirrors :func:`train_quality_logreg`'s flag: bucket
    the round's aggregate on hash(id) mod B and combine the B partial
    rows driver-side with unbounded Python ints — bit-identical
    weights, corpus bound ×B per class.
    """
    if n_classes < 2:
        raise ValueError("n_classes must be >= 2")
    if n_rounds < 0 or lr_milli < 0:
        raise ValueError("n_rounds and lr_milli must be >= 0")
    if two_level is not None and two_level < 1:
        raise ValueError("two_level bucket count must be >= 1")
    w = [[0] * len(FEATURES) for _ in range(n_classes)]

    # persist BEFORE the label guard (ADVICE r12): the guard count fills
    # the cache the gradient rounds read (same shape as the binary trainer)
    base = fixed_point_features(df, id_col, text_col, label_col) \
        .filter(F.col("y").isNotNull()).persist()
    fixed = base
    try:
        bad = fixed.filter((F.col("y") < 0) | (F.col("y") >= n_classes)) \
            .count()
        if bad:
            raise ValueError(
                f"{bad} labels outside [0, {n_classes}); fix the label "
                "column before training")
        if two_level is not None:
            fixed = fixed.withColumn(
                "_tl_bucket",
                (F.conv(F.substring(F.md5(F.col("id").cast("string")),
                                    1, 8),
                        16, 10).cast("long") % F.lit(int(two_level)))
                .cast("long"))
        for _ in range(n_rounds):
            errs = [
                (hard_sigmoid_milli(margin_micro(w[k]))
                 - (F.col("y") == F.lit(k)).cast("long") * F.lit(1000))
                .alias(f"_e{k}")
                for k in range(n_classes)
            ]
            scored = fixed.select("*", *errs)
            aggs = [F.sum(F.col(f"x{j}") * F.col(f"_e{k}"))
                    .alias(f"g{k}_{j}")
                    for k in range(n_classes)
                    for j in range(len(FEATURES))]
            aggs.append(F.count(F.lit(1)).alias("n"))
            if two_level is None:
                rows = [scored.agg(*aggs).first()]
            else:
                rows = scored.groupBy("_tl_bucket").agg(*aggs).collect()
            n = sum(int(r["n"]) for r in rows)
            if n == 0:
                break
            for k in range(n_classes):
                for j in range(len(FEATURES)):
                    g = sum(int(r[f"g{k}_{j}"]) for r in rows)
                    delta = _tdiv(lr_milli * _tdiv(g, n), X_SCALE)
                    w[k][j] = max(-W_MAX, min(W_MAX, w[k][j] - delta))
    finally:
        base.unpersist()
    out = [(k, FEATURES[j], w[k][j])
           for k in range(n_classes) for j in range(len(FEATURES))]
    return local_df(df.sparkSession, 
        out, "class bigint, feature string, weight_micro bigint")


def grades_model_from_weights(weights_df: DataFrame) -> dict:
    """Fold a :func:`train_quality_grades` result into the vendored
    artifact dict ``learned_classifier_infer`` consumes (collect is
    classes×features — bounded).

    Scale note (ADVICE r11): the trainer's weights are MICRO-scale while
    the vendored ``quality_grades_v1`` artifact carries milli-scale
    values under the same ``weights_milli`` key. Inference is
    scale-invariant for the ``grade`` column (argmax — a common positive
    factor cannot reorder logits), but ``top_logit`` comes out 1000×
    the vendored scale. The emitted dict therefore sets the artifact
    schema's numeric ``weight_scale`` marker to ``MICRO`` (the vendored
    ``quality_grades_v1.json`` carries ``weight_scale: 1000``) so any
    consumer that thresholds logits can rescale instead of mislabeling
    units; persist the marker with the artifact."""
    rows = weights_df.collect()
    n_classes = max(int(r["class"]) for r in rows) + 1
    idx = {f: j for j, f in enumerate(FEATURES)}
    W = [[0] * len(FEATURES) for _ in range(n_classes)]
    for r in rows:
        W[int(r["class"])][idx[r.feature]] = int(r.weight_micro)
    return {"feature_names": list(FEATURES), "weights_milli": W,
            "weight_scale": MICRO}
