"""Text-analysis operators: quality scoring, language ID, token counts,
document fingerprinting.

All pure-expression pipelines over functions/text.py building blocks — they
run inside the scan stage (no shuffle, no Python) and so cost ~nothing at
100 TB beyond the read itself.

Intermediate arrays (token lists) are materialized through projection
boundaries: lambdas in higher-order functions get no common-subexpression
elimination, so re-using an inlined normalize+split expression multiplies
the per-row cost (measured >40x on gram pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dativo_ingest_spark.functions import hashing, text
from dativo_ingest_spark.operators.util import local_df

#: marker-word sets for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "les", "des", "et"),
}

PUNCT_PATTERN = r"[.,;:!?]"


def _tokenized(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _text, _norm, _words) with each stage materialized once."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_text"),
        text.normalize_ws(F.col(text_col)).alias("_norm"),
    ).select(
        "id",
        "_text",
        "_norm",
        F.when(F.col("_norm") == "", F.array().cast("array<string>"))
        .otherwise(F.split("_norm", " "))
        .alias("_words"),
    )


def quality_features(
    df: DataFrame, id_col: str, text_col: str, min_words: int = 20,
    max_stopword_ratio: float = 0.5,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Per-doc quality stats + a keep/drop flag.

    (id, n_chars, n_words, avg_word_len, punct_ratio, stopword_ratio,
    quality_ok) — plus any ``passthrough`` columns carried through
    verbatim (a label riding the featurization scan avoids a
    corpus-scale re-join downstream; see operators/training.py).
    """
    staged = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_text"),
        text.normalize_ws(F.col(text_col)).alias("_norm"),
        *[F.col(c) for c in passthrough],
    ).select(
        "id", "_text", "_norm",
        F.when(F.col("_norm") == "", F.array().cast("array<string>"))
        .otherwise(F.split("_norm", " "))
        .alias("_words"),
        *[F.col(c) for c in passthrough],
    ).select(
        "id",
        F.length("_text").cast("long").alias("n_chars"),
        F.size("_words").cast("long").alias("n_words"),
        F.length(F.regexp_replace("_norm", " ", "")).alias("_letters"),
        F.size(F.regexp_extract_all("_text", F.lit(PUNCT_PATTERN), 0)).alias(
            "_n_punct"
        ),
        F.size(
            F.filter(F.col("_words"), lambda w: w.isin(*text.STOPWORDS))
        ).alias("_stop_hits"),
        *[F.col(c) for c in passthrough],
    )
    stop_ratio = F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
        F.col("_stop_hits") / F.col("n_words")
    )
    return staged.select(
        "id",
        "n_chars",
        "n_words",
        F.round(
            F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
                F.col("_letters") / F.col("n_words")
            ),
            4,
        ).alias("avg_word_len"),
        F.round(
            F.when(F.col("n_chars") == 0, F.lit(0.0)).otherwise(
                F.col("_n_punct") / F.col("n_chars")
            ),
            4,
        ).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        ((F.col("n_words") >= min_words) & (stop_ratio <= max_stopword_ratio)).alias(
            "quality_ok"
        ),
        *[F.col(c) for c in passthrough],
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language scores + argmax prediction.

    (id, score_en, score_de, score_es, score_fr, predicted_lang) — argmax
    tie-break follows the declaration order en > de > es > fr.
    """
    langs = list(LANG_MARKERS)

    def _marker_filter(markers: tuple[str, ...]):
        return lambda w: w.isin(*markers)

    scored = _tokenized(df, id_col, text_col).select(
        "id",
        *[
            F.size(F.filter(F.col("_words"), _marker_filter(m)))
            .cast("long")
            .alias(f"score_{lang}")
            for lang, m in LANG_MARKERS.items()
        ],
    )
    pred = None
    for i, lang in enumerate(langs):
        cond = None
        for other in langs[i + 1:]:
            c = F.col(f"score_{lang}") >= F.col(f"score_{other}")
            cond = c if cond is None else (cond & c)
        if cond is None:
            pred = pred.otherwise(F.lit(lang))
        elif pred is None:
            pred = F.when(cond, F.lit(lang))
        else:
            pred = pred.when(cond, F.lit(lang))
    return scored.select(
        "id", *[f"score_{lang}" for lang in langs], pred.alias("predicted_lang")
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_ws_tokens, n_bpe_tokens): whitespace + BPE-ish regex counts."""
    return _tokenized(df, id_col, text_col).select(
        "id",
        F.size("_words").cast("long").alias("n_ws_tokens"),
        text.bpe_ish_token_count(F.col("_text")).alias("n_bpe_tokens"),
    )


def repetition_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dup_word_ratio: float = 0.6,
    max_dup_bigram_ratio: float = 0.4,
) -> DataFrame:
    """Gopher-style repetition stats + keep/drop flag, scan-stage only.

    (id, n_words, dup_word_ratio, dup_bigram_ratio, repetition_ok) where
    dup_X_ratio = 1 - distinct/total (0.0 for docs too short to form X).
    Heavily repeated boilerplate — nav bars, SEO spam, generation loops —
    scores high and gets ``repetition_ok = false``.

    Pure array expressions over the token list (no shuffle, no Python);
    the bigram transform allocates short space-joined strings per row,
    which profiling shows is safe at this width — unlike per-row *hash*
    array HOFs, which are banned in this package for GC reasons.
    """
    staged = _tokenized(df, id_col, text_col).select(
        "id",
        F.size("_words").cast("long").alias("n_words"),
        F.size(F.array_distinct("_words")).cast("long").alias("_n_distinct"),
        text.word_ngrams(F.col("_words"), 2).alias("_bigrams"),
    ).select(
        "id",
        "n_words",
        "_n_distinct",
        F.size("_bigrams").cast("long").alias("_n_bi"),
        F.size(F.array_distinct("_bigrams")).cast("long").alias("_n_bi_distinct"),
    )
    dup_word = F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
        1 - F.col("_n_distinct") / F.col("n_words")
    )
    dup_bigram = F.when(F.col("_n_bi") == 0, F.lit(0.0)).otherwise(
        1 - F.col("_n_bi_distinct") / F.col("_n_bi")
    )
    return staged.select(
        "id",
        "n_words",
        F.round(dup_word, 4).alias("dup_word_ratio"),
        F.round(dup_bigram, 4).alias("dup_bigram_ratio"),
        (
            (dup_word <= max_dup_word_ratio)
            & (dup_bigram <= max_dup_bigram_ratio)
        ).alias("repetition_ok"),
    )


def top_word_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Most-frequent-word share per doc: (id, top_word_count, top_word_fraction).

    The one repetition metric that needs a mode, so it is the classic
    two-level word-count: explode → partial-aggregated groupBy(id, word) →
    groupBy(id). Both aggregations combine map-side; the shuffles carry one
    row per (doc, distinct word) then one per doc — linear at corpus scale.
    Empty docs keep top_word_count = 0, fraction 0.0.
    """
    exploded = _tokenized(df, id_col, text_col).select(
        "id", F.explode_outer("_words").alias("word")
    )
    per_word = exploded.groupBy("id", "word").agg(
        F.count(F.when(F.col("word").isNotNull(), 1)).alias("_n")
    )
    return per_word.groupBy("id").agg(
        F.max("_n").cast("long").alias("top_word_count"),
        F.round(
            F.when(F.sum("_n") == 0, F.lit(0.0)).otherwise(
                F.max("_n") / F.sum("_n")
            ),
            4,
        ).alias("top_word_fraction"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per doc by TF-IDF.

    (id, term, tf, df_docs, tfidf, term_rank) — tf = in-doc occurrences,
    df_docs = docs containing the term, tfidf = tf * ln(n_docs / df_docs)
    rounded to 4dp.

    Ranking uses the *rational* score tf * n_docs / df_docs (exact in
    doubles for counts < 2^53, so bit-identical across engines) with the
    term string as tie-break; ln is monotonic in n_docs/df_docs at fixed
    tf but not across tf levels, so the rational rank is a deliberate,
    documented linear-idf variant — deterministic rank beats a
    transcendental-equality footgun at the oracle boundary.

    Distributed shape: explode → groupBy(id, term) [tf] → groupBy(term)
    [df] → term-keyed join (reuses the term partitioning) → per-doc
    window top-k. All aggregates partial; the corpus-size scalar rides a
    broadcast cross join.
    """
    exploded = _tokenized(df, id_col, text_col).select(
        "id", F.explode("_words").alias("term")
    )
    tf = exploded.groupBy("id", "term").agg(F.count("*").alias("tf"))
    # df_docs derives from tf ((id, term) is unique there, so a plain row
    # count per term == distinct docs). This recomputes the scan→explode→
    # partial-agg subtree once more (self-join dedup re-aliases the
    # branches, so the exchange is not reused) — a deliberate trade: the
    # alternative, a count window over partitionBy(term), buffers every
    # (doc, term) row of a hot term (stopwords ≈ every doc) in ONE task
    # with no partial aggregation, which is unbounded skew at corpus
    # scale. 2× linear compute beats that; the tf⋈df join's own hot-term
    # skew is split by AQE (the df side is one row per term).
    df_t = tf.groupBy("term").agg(F.count("*").alias("df_docs"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("_n_docs")
    )
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df_docs").cast("long").alias("df_docs"),
            (F.col("tf") * F.col("_n_docs") / F.col("df_docs")).alias("_lin"),
            F.round(
                F.col("tf") * F.log(F.col("_n_docs") / F.col("df_docs")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("_lin").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select("id", "term", "tf", "df_docs", "tfidf", "term_rank")
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: dict[str, list[str]],
    k: int = 10,
) -> DataFrame:
    """Exact BM25 top-k retrieval for a broadcast query set.

    (query_id, rank, id, score_micro) — the standard Okapi BM25 with
    Lucene's always-positive IDF ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    and k1 = 1.2, b = 0.75, ranked (score desc, id asc).

    Determinism: per-term scores are EXACT integer quotients. With
    S = total corpus words, N = docs, L = doc length, f = term frequency,
    the k1/b constants clear denominators to
    ``score_t = (idf_micro * 22*S*f) DIV (10*S*f + 3*S + 9*L*N)`` —
    pure BIGINT arithmetic both engines floor identically (idf_micro > 0
    so truncation == floor), quantized BEFORE the per-doc sum so
    partition order cannot move a bit. The one transcendental (ln in
    idf) quantizes to micro-nats at the vocab grain, the same proven
    discipline as :func:`unigram_logprob`. Numerator magnitude is
    ~idf·22·S·f — int64-safe past 10^12 corpus words; shard the corpus
    or drop micro to 10^3 units beyond that (docstring contract, not a
    silent overflow).

    Distributed shape: the query vocabulary broadcast-semi-filters the
    exploded words BEFORE any aggregate, so tf/df/join costs scale with
    matched terms only, never the corpus vocabulary; N and S ride the
    one-row broadcast-literal idiom; top-k is a per-query row_number
    over the (query, doc)-grain scored frame (|queries| × matched docs,
    tiny next to the scan).
    """
    if not queries or any(not terms for terms in queries.values()):
        raise ValueError("queries must map query_id -> non-empty terms")
    spark = df.sparkSession
    qterms = local_df(spark, 
        [(qid, t) for qid, terms in queries.items()
         for t in dict.fromkeys(terms)],
        "query_id string, term string")

    toks = _tokenized(df, id_col, text_col).select(
        "id", F.col("_words").alias("words"))
    doclen = toks.select(
        "id", F.size("words").cast("long").alias("doc_len"))
    totals = doclen.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_len").alias("total_len"))

    vocab = [t for terms in queries.values() for t in terms]
    matched = (toks.select("id", F.explode("words").alias("term"))
               .filter(F.col("term").isin(vocab)))
    tf = matched.groupBy("id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("f"))
    # (id, term) unique in tf -> row count per term == doc frequency
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long")
                                  .alias("df_docs"))
    idf = (df_t.crossJoin(F.broadcast(totals))
           .select(
               "term",
               F.floor(F.log(
                   F.lit(1.0)
                   + (F.col("n_docs") - F.col("df_docs") + F.lit(0.5))
                   / (F.col("df_docs") + F.lit(0.5))) * F.lit(1000000)
                   + F.lit(0.5)).cast("long").alias("idf_micro")))

    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(doclen, "id")
        .crossJoin(F.broadcast(totals))
        .join(F.broadcast(qterms), "term")
        .select(
            "query_id", "id",
            F.expr(
                "(idf_micro * 22 * total_len * f) DIV "
                "(10 * total_len * f + 3 * total_len "
                "+ 9 * doc_len * n_docs)").alias("score_t"))
        .groupBy("query_id", "id")
        .agg(F.sum("score_t").cast("long").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("rank").cast("long").alias("rank"),
                    "id", "score_micro"))


def boilerplate_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    min_df: int = 20,
    max_fraction: float = 0.5,
) -> DataFrame:
    """C4-style cross-document boilerplate detection at n-gram granularity.

    An n-gram is *boilerplate* when it appears in ≥ ``min_df`` distinct
    docs (nav bars, license headers, SEO footers). Per doc:
    (id, n_distinct_grams, n_boilerplate_grams, boilerplate_fraction,
    boilerplate_ok) — fraction over the doc's distinct grams, 0.0 for
    docs too short to form any.

    Distributed shape: explode *distinct* grams per doc → groupBy(gram)
    document-frequency [partial-agg] → the hot-gram set joins back on the
    gram key (reusing the gram partitioning) → groupBy(id). Never a
    doc×doc join, so a gram shared by every doc costs one hot key in a
    count — linear, unlike candidate-pair self-joins which need the skew
    guards in operators/dedup.py.
    """
    base = _tokenized(df, id_col, text_col).select(
        "id",
        F.array_distinct(text.word_ngrams(F.col("_words"), n)).alias("_dgrams"),
    )
    totals = base.select(
        "id", F.size("_dgrams").cast("long").alias("n_distinct_grams"), "_dgrams"
    )
    exploded = totals.select("id", "n_distinct_grams", F.explode("_dgrams").alias("gram"))
    hot = (
        exploded.groupBy("gram")
        .agg(F.countDistinct("id").alias("_gram_docs"))
        .filter(F.col("_gram_docs") >= min_df)
        .select("gram")
    )
    hits = exploded.join(hot, "gram").groupBy("id").agg(
        F.count("*").alias("n_boilerplate_grams")
    )
    joined = totals.select("id", "n_distinct_grams").join(
        hits, "id", "left"
    ).select(
        "id",
        "n_distinct_grams",
        F.coalesce(F.col("n_boilerplate_grams"), F.lit(0))
        .cast("long")
        .alias("n_boilerplate_grams"),
    )
    frac = F.when(F.col("n_distinct_grams") == 0, F.lit(0.0)).otherwise(
        F.col("n_boilerplate_grams") / F.col("n_distinct_grams")
    )
    return joined.select(
        "id",
        "n_distinct_grams",
        "n_boilerplate_grams",
        F.round(frac, 4).alias("boilerplate_fraction"),
        (frac <= max_fraction).alias("boilerplate_ok"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint, fp_bucket): md5 content hash + 4-hex shard key.

    The short bucket prefix is the natural shard/partition key for
    dedup-at-scale (uniform 16-bit fanout).
    """
    staged = df.select(
        F.col(id_col).alias("id"),
        hashing.content_fingerprint(F.col(text_col)).alias("fingerprint"),
    )
    return staged.select(
        "id", "fingerprint", F.substring("fingerprint", 1, 4).alias("fp_bucket")
    )


#: distilled linear quality-classifier weights: feature name -> weight.
#: Features are the rational quality_features outputs (deterministic 4dp
#: doubles), each squashed to [0, 1] before weighting.
CLASSIFIER_WEIGHTS = {
    "intercept": -0.5,
    "words": 1.0,      # applied to least(n_words, 1000) / 1000
    "stopwords": 8.0,  # natural prose carries stopwords (the C4 signal)
    "punct": -3.0,     # punctuation spam is penalized
    "word_len": 0.8,   # applied to least(avg_word_len, 10) / 10
}


def classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Distilled linear quality classifier with hard-sigmoid calibration.

    (id, score, keep) — ``score`` in [0, 1], ``keep = score >= threshold``.
    The model is a fixed-weight linear combination of the rational
    :func:`quality_features` outputs followed by a HARD sigmoid
    ``clamp(0.25 * z + 0.5, 0, 1)``: every op is a multiply/add/clamp on
    deterministic operands in a fixed association order, so scores are
    bit-identical across engines and retries (a transcendental sigmoid is
    monotone-equivalent for thresholding but not bit-portable; a real
    learned model — fastText or a distilBERT head — slots in here as an
    Arrow-batched pandas-UDF scoring the same (id, features) frame).

    Scale: pure scan-stage projection on top of quality_features (itself
    scan-stage) — zero shuffle at any corpus size.
    """
    w = dict(CLASSIFIER_WEIGHTS)
    if weights:
        w.update(weights)
    feats = quality_features(df, id_col, text_col)
    z = (
        F.lit(float(w["intercept"]))
        + F.lit(float(w["words"]))
        * (F.least(F.col("n_words"), F.lit(1000)) / F.lit(1000.0))
        + F.lit(float(w["stopwords"])) * F.col("stopword_ratio")
        + F.lit(float(w["punct"])) * F.col("punct_ratio")
        + F.lit(float(w["word_len"]))
        * (F.least(F.col("avg_word_len"), F.lit(10.0)) / F.lit(10.0))
    )
    score = F.round(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), F.lit(0.25) * z + F.lit(0.5))),
        6,
    )
    return feats.select(
        "id",
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


def unicode_normalize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    accent_fold: bool = True,
) -> DataFrame:
    """Unicode canonicalization — the step every other text operator
    here implicitly assumes has already happened: visually-identical
    strings with different codepoint sequences (composed ``é`` vs
    ``e`` + combining acute) hash differently, so exact dedup, n-gram
    fingerprints, MinHash signatures and blocklist joins all silently
    miss across sources that disagree on normal form.

    (id, norm_text, changed, n_chars) — NFC canonical composition,
    optional accent folding (NFD → drop combining marks — the
    DuckDB/utf8proc ``strip_accents`` semantics), control characters to
    spaces, whitespace runs collapsed, trimmed.

    Engine story: NFC and combining-mark classification are defined by
    the Unicode standard — Python's ``unicodedata`` (UCD) and DuckDB's
    ``nfc_normalize``/``strip_accents`` (utf8proc) implement the same
    tables, so the oracle replays the pipeline with builtins. The
    codepoint work runs in ONE Arrow-batched pandas UDF (Spark SQL has
    no NFC builtin — this is the honest Python seam, like the decode
    kernels in multimodal); the cheap control/whitespace cleanup stays
    JVM-side AFTER it so the Arrow batch carries each string once.

    Scale: scan-stage, zero shuffle; per-row cost is one UCD pass.
    """
    import unicodedata

    def _norm_series(s):
        def one(t):
            if t is None:
                return None
            u = unicodedata.normalize("NFC", t)
            if accent_fold:
                u = "".join(c for c in unicodedata.normalize("NFD", u)
                            if not unicodedata.combining(c))
                u = unicodedata.normalize("NFC", u)
            return u
        return s.map(one)

    norm_udf = F.pandas_udf(_norm_series, "string")
    # NULL text normalizes to the empty string: downstream hash/dedup
    # consumers need a total function, not a null-propagating one
    cleaned = F.trim(F.regexp_replace(
        F.regexp_replace(norm_udf(F.coalesce(F.col(text_col),
                                             F.lit(""))),
                         "[\\x00-\\x1F\\x7F]", " "),
        "\\s+", " "))
    return df.select(
        F.col(id_col).alias("id"),
        cleaned.alias("norm_text"),
        (cleaned != F.coalesce(F.col(text_col), F.lit("")))
        .alias("changed"),
        F.length(cleaned).cast("long").alias("n_chars"),
    )


def load_quality_grade_model(path: str | None = None) -> dict:
    """Load a vendored multiclass-linear quality-grade model artifact.

    The FineWeb-Edu-style flow: a small classifier is TRAINED OFFLINE
    (fastText / a distilled LLM-judge head) and shipped as an artifact the
    pipeline loads at plan-build time. This repo vendors
    ``models/quality_grades_v1.json`` — integer milli-unit weights over
    the rational :func:`quality_features` outputs — so the seam (artifact
    load → broadcast to executors → Arrow-batched inference) is real and
    testable; a retrained matrix drops in by pointing ``path`` elsewhere.
    """
    import json as _json
    import os as _os

    if path is None:
        path = _os.path.join(_os.path.dirname(__file__), _os.pardir,
                             "models", "quality_grades_v1.json")
    with open(path) as fh:
        model = _json.load(fh)
    n_feat = len(model["feature_names"])
    if any(len(row) != n_feat for row in model["weights_milli"]):
        raise ValueError("model weight rows do not match feature_names")
    return model


def learned_classifier_infer(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: dict | None = None,
) -> DataFrame:
    """Learned-model document grading through the REAL inference seam:
    featurize JVM-side, then score with an Arrow-batched pandas UDF that
    matmuls a vendored weight matrix — the exact plumbing a fastText /
    distilBERT quality head uses (FineWeb-Edu's educational-value grades),
    with the model swapped for :func:`load_quality_grade_model`'s vendored
    artifact.

    (id, grade, top_logit) — ``grade`` is the argmax class index (ties →
    lowest index, deterministic), ``top_logit`` the winning integer logit.

    Weight scale is free: ``grade`` is argmax-invariant to any common
    positive factor, so milli-scale vendored artifacts and MICRO-scale
    matrices from ``training.grades_model_from_weights`` both serve
    unchanged — but ``top_logit``'s unit follows the artifact's scale
    (micro-trained weights yield logits 1000× the vendored scale; check
    the dict's ``weight_scale`` key before thresholding logits).

    Determinism / oracle story: features quantize to BIGINT 1e4-scale
    fixed point BEFORE inference (the 4dp-rounded ratios are exact at that
    scale) and the weights are integer milli-units, so every logit is an
    exact int64 dot product — bit-identical across engines, Arrow batches
    and retries. np.matmul on int64 is associative-exact; no float enters.

    Scale shape: quality_features is scan-stage (zero shuffle); inference
    adds one ArrowEvalPython projection over five BIGINT columns — the
    weight matrix rides into the closure (KBs; a real embedding-model head
    would broadcast its tensor the same way). No Exchange anywhere:
    per-row cost is a (n_classes × n_features) int multiply, ~nothing
    against the scan at 100 TB.
    """
    import numpy as np
    import pandas as pd

    if model is None:
        model = load_quality_grade_model()
    W = np.asarray(model["weights_milli"], dtype=np.int64)

    # total on NULL text (scores as empty — the quality_score_milli
    # contract): quality_features propagates NULL features, which the
    # Arrow kernel's int64 cast would turn into platform-dependent
    # garbage logits (NaN->int64 is undefined; caught by the empty-doc
    # parity probe, r13)
    feats = quality_features(
        df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit(""))),
        id_col, text_col)
    fixed = feats.select(
        "id",
        F.lit(10000).cast("long").alias("f_bias"),
        (F.least(F.col("n_words"), F.lit(1000)) * F.lit(10))
        .cast("long").alias("f_words"),
        F.floor(F.col("stopword_ratio") * F.lit(10000) + F.lit(0.5))
        .cast("long").alias("f_stop"),
        F.floor(F.col("punct_ratio") * F.lit(10000) + F.lit(0.5))
        .cast("long").alias("f_punct"),
        F.floor(F.least(F.col("avg_word_len"), F.lit(10.0)) * F.lit(1000)
                + F.lit(0.5)).cast("long").alias("f_wlen"),
    )

    # struct-returning scalar pandas UDF: registered via the explicit
    # form (PySpark's type-hint inference does not accept a
    # Series... -> DataFrame signature)
    def _infer(b, fw, fs, fp, fl):
        X = np.stack(
            [s.to_numpy(dtype=np.int64) for s in (b, fw, fs, fp, fl)],
            axis=1,
        )
        logits = X @ W.T                       # (batch, n_classes) int64
        return pd.DataFrame({
            "grade": logits.argmax(axis=1).astype(np.int64),
            "top_logit": logits.max(axis=1),
        })

    infer = F.pandas_udf(_infer, "grade bigint, top_logit bigint")

    out = fixed.select(
        "id",
        infer("f_bias", "f_words", "f_stop", "f_punct", "f_wlen")
        .alias("_pred"),
    )
    return out.select(
        "id",
        F.col("_pred.grade").alias("grade"),
        F.col("_pred.top_logit").alias("top_logit"),
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    micro_units: int = 1_000_000,
) -> DataFrame:
    """Corpus-derived unigram language-model score per document.

    (id, n_words, avg_logprob) — ``avg_logprob`` is the mean natural-log
    probability of the document's words under the corpus's own unigram
    distribution (the CCNet/RedPajama quality signal: low scores flag
    gibberish, OCR noise, and word-salad; a held-out reference LM slots
    into the same plumbing by swapping the counts frame).

    Determinism: each word's log-prob quantizes to integer micro-nats
    (``floor(ln(c/total)*1e6 + 0.5)``) BEFORE the per-document sum, so
    partial-aggregation order cannot perturb a bit; the final average is
    one exact-bigint / count division, rounded at 6dp.

    Scale: two aggregations (word counts; per-doc fold) plus one join of
    the exploded words against the vocabulary frame — all shuffles are on
    high-cardinality keys. The word join is Zipf-skewed ("the" is ~5% of
    all tokens); AQE's skew-join split handles it, and the vocabulary side
    broadcasts outright whenever it fits the threshold. The single-row
    total joins as a broadcast literal, never a shuffle.
    """
    words = _tokenized(df, id_col, text_col).select(
        "id", F.explode("_words").alias("word"))
    # cache: the vocabulary table feeds BOTH the total aggregate and the
    # scoring join — uncached, Spark plans no ReusedExchange across the
    # two branches and the full corpus tokenize+explode subtree under
    # ``counts`` evaluates twice (one extra corpus pass at any scale);
    # the cache is vocabulary-sized, never corpus-sized
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("c")).cache()
    total = counts.agg(F.sum("c").alias("total"))
    lp = (
        counts.join(F.broadcast(total))
        .select(
            "word",
            F.floor(
                F.log(F.col("c").cast("double") / F.col("total").cast("double"))
                * micro_units + 0.5
            ).cast("long").alias("lpq"),
        )
    )
    return (
        words.join(lp, "word")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(
                F.sum("lpq").cast("double") / F.count(F.lit(1))
                / float(micro_units), 6
            ).alias("avg_logprob"),
        )
    )


def unigram_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str,
    text_col: str,
    smoothing: float = 0.5,
    top_k: int = 20,
) -> DataFrame:
    """Corpus drift report: per-word KL(A || B) contributions between two
    corpus versions' unigram distributions.

    The data-quality monitor for a continuously-ingested corpus: a new
    crawl slice whose word distribution diverges from the corpus (spam
    influx, language shift, boilerplate flood) shows up as mass in a few
    words long before downstream metrics move. Output: the ``top_k``
    words by absolute KL contribution with both probabilities
    (add-``smoothing`` estimated over the union vocabulary, so words
    absent from one side stay finite), plus their share of total |KL|.

    Scale: one word-count aggregation per side (the joined vocabulary
    frame is persisted for the duration of the call, so the corpus text
    really is scanned once per side), a full-outer join on the word key
    (vocabulary-sized, not corpus-sized), one top-k. The returned report
    is materialized (≤ top_k rows) — nothing stays cached afterwards.
    """
    if smoothing <= 0:
        raise ValueError(
            "smoothing must be > 0: words absent from one side would "
            "otherwise yield infinite KL contributions")

    def counts(df, side):
        return (
            _tokenized(df, id_col, text_col)
            .select(F.explode("_words").alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias(f"c_{side}"))
        )

    joined = counts(df_a, "a").join(counts(df_b, "b"), "word", "full_outer")
    filled = joined.select(
        "word",
        F.coalesce("c_a", F.lit(0)).alias("c_a"),
        F.coalesce("c_b", F.lit(0)).alias("c_b"),
    ).persist()
    try:
        t = filled.agg(
            F.sum("c_a").alias("t_a"), F.sum("c_b").alias("t_b"),
            F.count(F.lit(1)).alias("v")).first()
        t_a, t_b, v = t["t_a"] or 0, t["t_b"] or 0, t["v"]
        scored = filled.select(
            "word", "c_a", "c_b",
            ((F.col("c_a") + smoothing)
             / F.lit(float(t_a + smoothing * v))).alias("p_a"),
            ((F.col("c_b") + smoothing)
             / F.lit(float(t_b + smoothing * v))).alias("p_b"),
        ).withColumn(
            "kl_contrib", F.col("p_a") * F.log(F.col("p_a") / F.col("p_b")))
        total_abs = scored.agg(
            F.sum(F.abs(F.col("kl_contrib")))).first()[0] or 0.0
        rows = (
            scored
            # identical corpora: total |KL| exactly 0 -> share defined as 0
            .withColumn("share",
                        F.abs(F.col("kl_contrib")) / F.lit(total_abs)
                        if total_abs > 0 else F.lit(0.0))
            .orderBy(F.abs(F.col("kl_contrib")).desc(), F.col("word"))
            .limit(top_k)
            .select("word", "c_a", "c_b",
                    F.round("p_a", 8).alias("p_a"),
                    F.round("p_b", 8).alias("p_b"),
                    F.round("kl_contrib", 8).alias("kl_contrib"),
                    F.round("share", 6).alias("share"))
            .collect()
        )
    finally:
        filled.unpersist()
    return local_df(df_a.sparkSession, 
        rows, "word string, c_a bigint, c_b bigint, p_a double, "
              "p_b double, kl_contrib double, share double")


#: Gopher rule stop-word list (Rae et al. 2021 Appendix A uses a small
#: "must contain 2 of these" set — presence evidence of running English
#: prose, not a frequency feature like STOPWORDS above)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The published Gopher quality rule set (Rae et al. 2021, App. A) as
    one scan-stage pass: per-document booleans for every rule plus the
    conjunction, the recognizable drop-in heuristic gate ahead of a
    learned classifier (:func:`classifier_score`).

    Rules: word count in [min, max]; mean word length in [3, 10];
    symbol-to-word ratio (``#`` and ellipsis) <= 0.1; <= 90% of lines
    bullet-started and <= 30% ellipsis-ended; >= 80% of words containing
    an alphabetic character; >= 2 distinct members of the
    :data:`GOPHER_STOPWORDS` presence list.

    Output: (id, n_words, mean_word_len, symbol_ratio, bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, stopword_hits, per-rule ok_*
    booleans, gopher_ok). Ratios round to 4dp. Pure Catalyst array/regex
    expressions — zero shuffles at any corpus size, filter pushes into
    the scan when composed. Empty AND NULL documents normalize to the
    empty string: they fail the word-count rule with zero ratios and
    real False flags, so three-valued logic can never silently drop
    them from both the keep and the reject side of a filter.
    """
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    lines = F.split(F.col("_text"), "\n")
    bullet = F.size(F.filter(
        lines, lambda ln: F.ltrim(ln).rlike(r"^[-*•]")))
    ellipsis_end = F.size(F.filter(
        lines, lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$")))
    n_lines = F.size(lines)
    n_words = F.size("_words").cast("long")
    alpha_words = F.size(F.filter(F.col("_words"),
                                  lambda w: w.rlike("[a-z]")))
    symbols = (
        F.size(F.split(F.col("_text"), "#", -1)) - 1
        + F.size(F.split(F.col("_text"), r"\.\.\.", -1)) - 1
        + F.size(F.split(F.col("_text"), "…", -1)) - 1
    )
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(F.col("_words")),
        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])))
    mean_wl = F.when(
        n_words > 0,
        F.length(F.replace(F.col("_norm"), F.lit(" "), F.lit("")))
        / n_words).otherwise(F.lit(0.0))

    def frac(num, den):
        return F.when(den > 0, num / den).otherwise(F.lit(0.0))

    staged = _tokenized(df, id_col, text_col).select(
        "id",
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(frac(symbols, n_words), 4).alias("symbol_ratio"),
        F.round(frac(bullet, n_lines), 4).alias("bullet_line_frac"),
        F.round(frac(ellipsis_end, n_lines), 4).alias("ellipsis_line_frac"),
        F.round(frac(alpha_words, n_words), 4).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stopword_hits"),
    )
    checks = {
        "ok_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_symbol_ratio": F.col("symbol_ratio") <= max_symbol_ratio,
        "ok_bullet_lines": F.col("bullet_line_frac")
        <= max_bullet_line_frac,
        "ok_ellipsis_lines": F.col("ellipsis_line_frac")
        <= max_ellipsis_line_frac,
        "ok_alpha_words": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "ok_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }
    out = staged
    overall = None
    for name, cond in checks.items():
        out = out.withColumn(name, cond)
        overall = cond if overall is None else (overall & cond)
    return out.withColumn("gopher_ok", overall)


#: above this many over-df line fingerprints the anti-join falls back
#: from a forced broadcast to a shuffle join (~48 B/md5 in a broadcast
#: relation puts the default near 200 MB per executor)
HOT_LINE_BROADCAST_LIMIT = 4_000_000


def drop_duplicate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_line_df: int = 2,
    min_line_chars: int = 1,
) -> DataFrame:
    """C4-style corpus-wide duplicate-LINE removal: delete every line
    whose trimmed content appears in more than ``max_line_df`` distinct
    documents (the "three-sentence/line rule" — nav bars, cookie
    banners, license footers repeat verbatim across pages; prose does
    not), then reassemble each document from its surviving lines in
    original order.

    Output: (id, text, n_lines, n_dropped) — ``text`` rebuilt with
    ``\\n`` joins, empty when every line dropped; NULL input text
    normalizes to the empty string, so EVERY input document appears in
    the output. Lines shorter than ``min_line_chars`` after trimming
    (blank lines) carry no content signal and are dropped
    unconditionally.

    Distributed shape: posexplode lines → md5(trimmed line) →
    count-DISTINCT-docs per fingerprint [partial-agg] → the over-df
    fingerprint set joins back as an anti-join on the exploded frame —
    BROADCAST while it fits :data:`HOT_LINE_BROADCAST_LIMIT` (the
    common case: a heavy-hitter tail), shuffle anti-join past it (a
    web-scale crawl's per-site boilerplate makes the hot set grow with
    site count; an unguarded forced broadcast would OOM exactly there)
    — then one groupBy(id) reassembly shuffle. Linear at any corpus
    size — a line shared by every document costs one hot key in a
    count, never a pair join. Cache discipline: the exploded line frame
    is cached only while the two SMALL aggregates (hot fingerprints,
    per-doc totals) are eagerly materialized via ``localCheckpoint`` —
    then UNPERSISTED before return, so no corpus-sized cache entry
    outlives the call (checkpoint blocks are ContextCleaner-released
    when the returned plan is garbage collected, unlike catalog cache
    entries). The lazy anti-join probe re-derives the line frame from
    source at consumption time — one extra scan-stage pass over the
    text column, pipelined with the join, the price of leak-free
    long-lived sessions. Exact-duplicate documents keep
    their mutual lines only while ``<= max_line_df`` copies exist — run
    the document-level dedup family first; this operator targets
    template fragments inside otherwise-distinct pages.
    """
    if max_line_df < 1:
        raise ValueError("max_line_df must be >= 1")
    text_safe = F.coalesce(F.col(text_col), F.lit(""))
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(text_safe, "\n")).alias("pos", "line"),
    ).withColumn("_t", F.trim(F.col("line")))
    lines = lines.withColumn(
        "_fp",
        F.when(F.length("_t") >= min_line_chars, F.md5(F.col("_t"))))
    lines = lines.cache()
    # both aggregates are materialized EAGERLY off the cached frame
    # (one text scan builds the cache, the second agg reads it), then
    # checkpoint-truncated so they stop referencing `lines` and the
    # cache can be dropped before return — the leak fix: no
    # corpus-sized cache entry survives the call
    hot = (
        lines.filter(F.col("_fp").isNotNull())
        .groupBy("_fp")
        .agg(F.count_distinct("id").alias("_df"))
        .filter(F.col("_df") > max_line_df)
        .select("_fp")
        .localCheckpoint(eager=True)
    )
    per_doc = lines.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_lines")).localCheckpoint(eager=True)
    lines.unpersist()
    # data-driven join strategy: one cheap count over the materialized
    # hot set decides broadcast vs shuffle, the guard every other
    # forced broadcast in this package carries
    n_hot = hot.count()
    anti_side = F.broadcast(hot) if n_hot <= HOT_LINE_BROADCAST_LIMIT \
        else hot
    kept = (
        lines.filter(F.col("_fp").isNotNull())
        .join(anti_side, "_fp", "left_anti")
    )
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("line")))
            )["line"],
            "\n",
        ).alias("text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    return (
        per_doc.join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("text", F.lit("")).alias("text"),
            F.col("n_lines").cast("long").alias("n_lines"),
            (F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long").alias("n_dropped"),
        )
    )


#: entity decode table for :func:`strip_html` — the half-dozen entities
#: that dominate real web text; full HTML5 entity tables are a
#: data-file swap, not a code change
_HTML_ENTITIES = (
    ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"),
)


def strip_html(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Visible-text extraction from raw HTML — the web-curation step
    ahead of every text gate (C4 starts from pre-extracted WET files;
    FineWeb re-extracts from WARC precisely because extraction quality
    dominates downstream filters).

    (id, text, html_len, text_ratio) per input row: ``<script>`` /
    ``<style>`` / comment blocks drop with their CONTENT, remaining tags
    drop keeping their content, the common entities decode
    (:data:`_HTML_ENTITIES`), and whitespace collapses. ``text_ratio``
    = extracted chars / html chars (4dp) — the classic boilerplate
    signal (nav-chrome pages extract little; article pages extract
    most), ready for a threshold gate. NULL html normalizes to the
    empty document.

    Scale: one scan-stage pass of regexp_replace chains — pure Catalyst,
    zero shuffles, zero UDFs; the patterns use the Java-regex/RE2 common
    subset ((?s) dotall + non-greedy, no lookaround) so a SQL oracle
    replays them verbatim. A DOM-fidelity extractor (trafilatura et al.)
    is the documented mapInPandas swap when layout-aware extraction
    matters; this operator is the dependency-free 95% case.
    """
    html = F.coalesce(F.col(html_col), F.lit(""))
    # two patterns, not one with a backreference — RE2 (the oracle
    # engine) has no backrefs; this stays in the Java/RE2 common subset
    txt = F.regexp_replace(
        html, r"(?s)<script\b[^>]*>.*?</script\s*>", " ")
    txt = F.regexp_replace(
        txt, r"(?s)<style\b[^>]*>.*?</style\s*>", " ")
    txt = F.regexp_replace(txt, r"(?s)<!--.*?-->", " ")
    txt = F.regexp_replace(txt, r"(?s)<[^>]+>", " ")
    for ent, rep in _HTML_ENTITIES:
        txt = F.replace(txt, F.lit(ent), F.lit(rep))
    txt = F.trim(F.regexp_replace(txt, r"\s+", " "))
    return df.select(
        F.col(id_col).alias("id"),
        txt.alias("text"),
        F.length(html).cast("long").alias("html_len"),
        F.round(
            F.when(F.length(html) == 0, F.lit(0.0)).otherwise(
                F.length(txt).cast("double")
                / F.length(html).cast("double")),
            4,
        ).alias("text_ratio"),
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model_df: DataFrame | None = None,
    micro_units: int = 1_000_000,
) -> DataFrame:
    """Stupid-backoff bigram language-model score per document
    (Brants et al. 2007, "Large Language Models in Machine Translation").

    Extends :func:`unigram_logprob` one order up: each in-document word
    bigram (w1, w2) scores

        ln(c(w1,w2) / c(w1))                  when the model saw the bigram,
        ln(0.4 * (c(w2)+1) / (total+vocab))   otherwise (backoff to the
                                              add-one-smoothed unigram),

    with counts taken from ``model_df`` (defaults to ``df`` itself —
    though self-training makes the backoff path unreachable, since every
    scored bigram is then in the model; pass a reference slice to get
    held-out behavior, the out-of-domain / gibberish detector CCNet runs
    with a KenLM n-gram model).

    Determinism: the backoff product folds into ONE exact-integer
    quotient — ``(2*(c2+1)) / (5*(total+vocab))`` — so each path is a
    single IEEE divide + one ``ln``, quantized to integer micro-nats
    BEFORE the per-document sum (the unigram_logprob discipline: no
    float accumulation, partial-agg order cannot move a bit). Returns
    (id, n_bigrams, n_backoff, avg_logprob) for documents with >= 2
    words; ``n_backoff`` counts positions that fell to the unigram path
    (a direct out-of-domain-mass signal).

    Scale: bigram construction is a scan-stage array transform (zero
    shuffle); the model is two aggregates over the model slice; scoring
    is one join on the bigram key and one on w2 — both Zipf-skewed
    (AQE skew-split handles the hot function words; the model frames
    broadcast outright whenever they fit). Corpus-size independent
    state: model rows are vocabulary-sized, not corpus-sized.
    """
    if model_df is None:
        model_df = df

    def _bigrams(frame: DataFrame) -> DataFrame:
        tok = _tokenized(frame, id_col, text_col)
        # 0-based [] indexing: pairs (w[i], w[i+1]) for i in 0..size-2
        return tok.filter(F.size("_words") >= 2).select(
            "id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_words) - 2), "
                    "i -> struct(_words[i] AS w1, _words[i + 1] AS w2))"
                )
            ).alias("_bg"),
        ).select("id", F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))

    m_words = _tokenized(model_df, id_col, text_col).select(
        F.explode("_words").alias("word"))
    # cache: the unigram model table has THREE consumers (the scalar
    # totals and the c1/c2 scoring joins) — uncached, each consumer
    # re-evaluates the full model-slice tokenize+explode subtree (no
    # ReusedExchange fires across the branches), i.e. two extra model
    # passes; the cache is vocabulary-sized, never corpus-sized
    uc = m_words.groupBy("word").agg(F.count(F.lit(1)).alias("c")).cache()
    scalars = uc.agg(
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("vocab"),
    )
    bc = _bigrams(model_df).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12"))

    scored = (
        _bigrams(df)
        .join(bc, ["w1", "w2"], "left")
        .join(uc.select(F.col("word").alias("w1"), F.col("c").alias("c1")),
              "w1", "left")
        .join(uc.select(F.col("word").alias("w2"), F.col("c").alias("c2")),
              "w2", "left")
        .join(F.broadcast(scalars))
    )
    seen = F.col("c12").isNotNull()
    lp_seen = F.log(F.col("c12").cast("double") / F.col("c1").cast("double"))
    lp_back = F.log(
        (2 * (F.coalesce(F.col("c2"), F.lit(0)) + 1)).cast("double")
        / (5 * (F.col("total") + F.col("vocab"))).cast("double")
    )
    lpq = F.floor(
        F.when(seen, lp_seen).otherwise(lp_back) * micro_units + 0.5
    ).cast("long")
    return (
        scored.select("id", lpq.alias("_lpq"),
                      F.when(seen, 0).otherwise(1).alias("_back"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_back").cast("long").alias("n_backoff"),
            F.round(
                F.sum("_lpq").cast("double") / F.count(F.lit(1))
                / float(micro_units), 6
            ).alias("avg_logprob"),
        )
    )


def kneser_ney_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model_df: DataFrame | None = None,
    micro_units: int = 1_000_000,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram language model (Kneser & Ney
    1995; the smoothing production n-gram LMs — KenLM included —
    actually use, completing this repo's family: unigram → stupid
    backoff → KN). Absolute discount D = 3/4; continuation probability
    from bigram-TYPE counts, which is the KN insight — "Francisco" is
    frequent but only ever follows "San", so its continuation mass is
    tiny where a unigram backoff would overrate it:

        P(w2|w1) = max(c12 - D, 0)/c1 + D·N1+(w1,·)/c1 · N1+(·,w2)/B

    Determinism: with D = 3/4 the whole interpolation clears
    denominators into ONE exact-integer quotient —
    ``(max(4·c12 − 3, 0)·B + 3·N1f(w1)·N1p(w2)) / (4·c1·B)`` — so each
    scored position is a single IEEE divide + one ln, quantized to
    micro-nats BEFORE the per-document sum (the unigram_logprob
    discipline). Positions with an unknown context (or zero KN mass:
    c12 = 0 and w2 never a continuation) fall to the add-one unigram
    ``(c2+1)/(total+vocab)`` and are counted in ``n_unk``. int64 bound:
    the numerator is ~4·c12·B — past ~10^18 shard the model or shrink
    counts to type-log scale (documented contract).

    (id, n_bigrams, n_unk, avg_logprob) for documents with >= 2 words.

    Scale: model = three vocabulary-sized aggregates over the model
    slice (bigram counts, follower/predecessor type counts) + one
    scalar row; scoring joins on the bigram key and the two word keys —
    Zipf-skewed, AQE-split, broadcast when they fit. Same shapes as
    bigram_logprob, one extra type-count table per side.
    """
    if model_df is None:
        model_df = df

    def _bigrams(frame: DataFrame) -> DataFrame:
        tok = _tokenized(frame, id_col, text_col)
        return tok.filter(F.size("_words") >= 2).select(
            "id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_words) - 2), "
                    "i -> struct(_words[i] AS w1, _words[i + 1] AS w2))"
                )
            ).alias("_bg"),
        ).select("id", F.col("_bg.w1").alias("w1"),
                 F.col("_bg.w2").alias("w2"))

    m_words = _tokenized(model_df, id_col, text_col).select(
        F.explode("_words").alias("word"))
    # cache both model tables: ``uc`` has three consumers (c1/c2 joins +
    # the scalar totals) and ``bc`` FOUR (the bigram join, both
    # continuation-type counts, and the b_types scalar) — uncached, each
    # consumer re-evaluates the full model-slice tokenize/bigram subtree
    # (no ReusedExchange fires across branches): five extra model passes
    # per scoring run. Both caches are vocabulary-sized (uc) /
    # bigram-TYPE-sized (bc), never corpus-sized.
    uc = m_words.groupBy("word").agg(F.count(F.lit(1)).alias("c")).cache()
    bc = _bigrams(model_df).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")).cache()
    n1f = bc.groupBy("w1").agg(F.count(F.lit(1)).alias("n1f"))
    n1p = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p"))
    scalars = uc.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("vocab")
    ).crossJoin(F.broadcast(
        bc.agg(F.count(F.lit(1)).alias("b_types"))))

    scored = (
        _bigrams(df)
        .join(bc, ["w1", "w2"], "left")
        .join(uc.select(F.col("word").alias("w1"), F.col("c").alias("c1")),
              "w1", "left")
        .join(uc.select(F.col("word").alias("w2"), F.col("c").alias("c2")),
              "w2", "left")
        .join(n1f, "w1", "left")
        .join(n1p, "w2", "left")
        .join(F.broadcast(scalars))
    )
    c12 = F.coalesce(F.col("c12"), F.lit(0))
    n1p_c = F.coalesce(F.col("n1p"), F.lit(0))
    n1f_c = F.coalesce(F.col("n1f"), F.lit(0))
    num = (F.greatest(4 * c12 - 3, F.lit(0)) * F.col("b_types")
           + 3 * n1f_c * n1p_c)
    # the KN path needs strictly positive mass: a seen bigram, or BOTH
    # type counts positive (w1 leading somewhere AND w2 continuing
    # somewhere) — anything else falls to the add-one unigram
    known = F.col("c1").isNotNull() & (
        (c12 > 0) | ((n1f_c > 0) & (n1p_c > 0)))
    lp_kn = F.log(num.cast("double")
                  / (4 * F.col("c1") * F.col("b_types")).cast("double"))
    lp_unk = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
        / (F.col("total") + F.col("vocab")).cast("double"))
    lpq = F.floor(
        F.when(known, lp_kn).otherwise(lp_unk) * micro_units + 0.5
    ).cast("long")
    return (
        scored.select("id", lpq.alias("_lpq"),
                      F.when(known, 0).otherwise(1).alias("_unk"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_unk").cast("long").alias("n_unk"),
            F.round(
                F.sum("_lpq").cast("double") / F.count(F.lit(1))
                / float(micro_units), 6
            ).alias("avg_logprob"),
        )
    )


def feature_hash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 1024,
    signed: bool = False,
) -> DataFrame:
    """Hashing-trick featurization: sparse bag-of-words vectors with a
    FIXED dimensionality and NO fitted vocabulary. Returns long-form
    ``[id_col, bucket bigint, weight bigint]`` — one row per (doc,
    bucket) with a non-zero weight.

    The bucket is md5-derived (leading 8 hex chars mod ``n_buckets``) so
    any engine reproduces the mapping bit-for-bit; ``signed=True`` flips
    each token's contribution by one extra hash bit (Weinberger et al.'s
    debiasing — collisions then cancel in expectation instead of
    accumulating; rows whose signed weights cancel to 0 are dropped so
    the sparse form stays canonical).

    Shape: scan-stage split/explode + ONE (id, bucket) partial-agg
    shuffle — linear, vocabulary-free (the whole point vs TF-IDF: no
    second pass, no vocab table, stable dimensionality under drift). At
    100 TB the shuffle carries one row per distinct (doc, bucket), upper
    bounded by tokens and by docs*n_buckets.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
                    r"\s+")).alias("_tok"),
    ).filter(F.col("_tok") != "")
    h = F.md5(F.col("_tok"))
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
              % F.lit(int(n_buckets)))
    if signed:
        sign = F.when(
            F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0,
            F.lit(1)).otherwise(F.lit(-1)).cast("long")
    else:
        sign = F.lit(1).cast("long")
    out = (
        toks.select(F.col(id_col), bucket.alias("bucket"),
                    sign.alias("_sign"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("_sign").alias("weight"))
    )
    return out.filter(F.col("weight") != 0) if signed else out


def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    micro_units: int = 1_000_000,
) -> DataFrame:
    """Corpus-level collocation detection by pointwise mutual
    information over adjacent word pairs (Church & Hanks 1990 — the
    classic phrase-mining signal; training pipelines use it to find
    multi-word expressions worth single tokens and to spot templated
    boilerplate whose PMI is implausibly high).

    Returns (w1, w2, n_pair, pmi_micro): every adjacent pair seen at
    least ``min_count`` times, with
    ``pmi = ln( p(w1,w2) / (p(w1) * p(w2)) )`` — pair probability from
    the bigram total, word probabilities from the unigram total —
    quantized to integer micro-nats (``floor(ln(r)*1e6 + 0.5)``) so the
    statistic is engine-portable bit-for-bit. The ratio is evaluated in
    a FIXED operation order ((c_ab/N_bi) / ((c_a/N_uni) * (c_b/N_uni)))
    that oracle SQL replays exactly; IEEE doubles make the same ops in
    the same order produce the same bits.

    Scale: three aggregations (unigram counts, bigram counts, the two
    one-row totals) and two vocabulary-keyed joins attaching c_a/c_b to
    the bigram frame — the joins are on the SMALL aggregated frames
    (distinct pairs/words), never the exploded token stream; the
    Zipf-skewed keys are exactly the ones ``min_count`` has already
    thinned. No pair explosion beyond adjacency: work is linear in
    corpus tokens.
    """
    toks = _tokenized(df, id_col, text_col)
    bigrams = toks.select(
        F.explode(text.word_ngrams(F.col("_words"), 2)).alias("bg"))
    pair_counts = (
        bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
            "n_pair",
        )
    )
    words = toks.select(F.explode("_words").alias("word"))
    uni = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_bi = bigrams.agg(F.count(F.lit(1)).alias("n_bi"))
    ratio = (
        (F.col("n_pair").cast("double") / F.col("n_bi").cast("double"))
        / (
            (F.col("c1").cast("double") / F.col("n_uni").cast("double"))
            * (F.col("c2").cast("double") / F.col("n_uni").cast("double"))
        )
    )
    return (
        pair_counts
        .join(uni.select(F.col("word").alias("w1"),
                         F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("word").alias("w2"),
                         F.col("c").alias("c2")), "w2")
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bi))
        .select(
            "w1", "w2", "n_pair",
            F.floor(F.log(ratio) * micro_units + 0.5).cast("long")
            .alias("pmi_micro"),
        )
    )


#: deliberately innocuous default for tests/demos — production pipelines
#: pass their own vetted list (the C4 "bad words" list is the public
#: precedent; shipping one here would be noise, not safety)
BLOCKLIST_DEFAULT = ("lorem", "ipsum", "asdf", "qwerty")


def blocklist_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms=BLOCKLIST_DEFAULT,
    max_hits: int = 0,
) -> DataFrame:
    """C4-style blocklist gate: flag documents containing more than
    ``max_hits`` occurrences of any blocklisted WORD (whole-token match
    on the normalized stream — substring matching would flag
    'classic' for 'ass', the blocklist false-positive C4's critics
    documented; token-exact is the defensible default).

    Returns (id, n_hits, blocked). Keep/drop is the caller's filter so
    audits can count WHAT would be dropped before enforcement — the
    same report-then-enforce contract as operators/quality.py.

    MULTI-WORD terms are supported (the real C4 list contains phrases):
    a term with spaces matches as a whole-token n-gram on the
    normalized stream — same false-positive discipline, one extra
    word-ngram projection per distinct phrase LENGTH in the list (a
    handful), each still scan-stage.

    Scale: pure scan-stage Catalyst — normalize/split once, one
    ``filter(array_contains-style lambda)`` fold against the literal
    term set per phrase length (blocklists are hundreds of terms:
    inline literals, no join, no UDF, no shuffle). A million-term list
    would switch to a broadcast semi-join against the exploded tokens;
    the knob is the same INLINE_LITERAL_BUDGET argument as
    clustering's centroids.
    """
    norm_terms = [" ".join(str(t).lower().split()) for t in terms]
    norm_terms = [t for t in norm_terms if t]
    if not norm_terms:
        raise ValueError("terms must be non-empty")
    by_len: dict[int, list[str]] = {}
    for t in norm_terms:
        by_len.setdefault(len(t.split()), []).append(t)
    toks = _tokenized(df, id_col, text_col)
    hits = None
    for n, group in sorted(by_len.items()):
        seq = (F.col("_words") if n == 1
               else text.word_ngrams(F.col("_words"), n))
        h = F.size(F.filter(seq, lambda w: w.isin(*group)))
        hits = h if hits is None else hits + h
    return toks.select(
        "id",
        hits.cast("long").alias("n_hits"),
        (hits > max_hits).alias("blocked"),
    )


#: sentence terminators for the readability estimate (a run of .!? counts
#: once — "?!" is one boundary); documents with none count as ONE sentence
_SENT_BOUNDARY = r"[.!?]+"

#: vowel-group syllable heuristic: a maximal run of vowels (y included)
#: approximates one syllable — the standard zero-dictionary estimator;
#: a real hyphenation table slots into the same three-count formula
_SYLLABLE_RUN = r"[aeiouyAEIOUY]+"


def flesch_reading_ease(
    df: DataFrame,
    id_col: str,
    text_col: str,
    micro_units: int = 1_000_000,
) -> DataFrame:
    """Flesch reading-ease per document (Flesch 1948; the classic
    document-difficulty signal curation mixes use alongside the LM
    scores — extreme values flag word salad on the low end and
    telegraphic boilerplate on the high end).

    ``206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)`` with
    the three counts as scan-stage regex/array expressions: words from
    the shared normalized tokenizer, sentences as terminator runs
    (min 1), syllables as vowel-group runs (the standard
    zero-dictionary heuristic). Returns (id, n_words, n_sentences,
    n_syllables, flesch_micro) — the score quantized to integer
    micro-points in a FIXED IEEE order the oracle replays, empty docs
    NULL.

    Scale: one scan-stage projection, no shuffle/join/UDF — rides the
    same pass as every other quality feature.
    """
    toks = _tokenized(df, id_col, text_col)
    n_words = F.size("_words").cast("long")
    n_sents = F.greatest(
        F.regexp_count(F.col("_text"), F.lit(_SENT_BOUNDARY)),
        F.lit(1)).cast("long")
    n_syll = F.regexp_count(
        F.col("_text"), F.lit(_SYLLABLE_RUN)).cast("long")
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sents.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double"))
    )
    return toks.select(
        "id",
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        F.when(n_words > 0,
               F.floor(score * micro_units + 0.5).cast("long"))
        .alias("flesch_micro"),
    )


def char_entropy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    long_doc_threshold: int | None = None,
) -> DataFrame:
    """Per-document character-level Shannon entropy (nats) over the
    normalized text — the classic gibberish/compression quality signal:
    natural prose sits in a narrow entropy band, while base64 blobs,
    minified code and keyboard mash sit far above it and repeated-char
    padding far below. Complements the word-level signals
    (quality_features, repetition, unigram LM) at the sub-token grain
    they cannot see.

    (id, n_chars, entropy_micro) — per-character-class terms
    ``-p·ln(p)`` evaluate in fixed IEEE order (one divide for p, one
    ln, one multiply) and quantize to integer micro-nats BEFORE the
    per-document sum, the unigram_logprob discipline (integer terms, so
    the sum is order-free — any grouping of the same run lengths agrees
    bit-for-bit with the oracle's GROUP BY). Empty documents emit 0
    entropy over 0 chars.

    Scale (r13 rewrite): ZERO shuffle, zero explode, zero join — the
    whole computation is one scan-stage projection. Per document:
    extract codepoints (``regexp_extract_all(t, '(?s).')`` — Java regex
    ``.`` matches one code POINT, so astral chars keep the same
    per-codepoint semantics as the oracle's substr walk), sort, then a
    run-length ``aggregate`` fold closes one ``-p·ln(p)`` term per
    character class. O(n log n) per doc in whole-stage codegen. The
    previous shape (per-position explode → (doc, char) partial-agg
    shuffle → doc-grain fold → broadcast re-join for empty docs)
    measured 6-7 s at sf0.1; this plan measures sub-second on the same
    corpus, and at 100 TB removes two corpus-scale exchanges entirely.

    Memory bound (ADVICE r13): the one-scan plan materializes one
    sorted codepoint array per row (plus the fold's struct state), so a
    single pathological multi-hundred-MB document would concentrate in
    one row buffer. The supported per-document size for the default
    plan is ~tens of millions of chars under the executor-memory
    discipline this repo ships (32 x 4 GiB); corpora that can carry
    bigger outliers should pass ``long_doc_threshold`` (chars) — docs
    above it take a fallback explode → (id, char)-keyed partial-agg →
    per-doc sum branch whose per-row state is O(1) (the Generate's
    transient array is still O(doc) but is streamed, never sorted or
    folded in-expression). The two branches union; integer micro-nat
    terms keep the result bit-identical to the default plan (pinned by
    a test). Default None = pure one-scan plan (the threshold branch
    adds a second corpus scan + one bounded shuffle to the plan, so it
    is opt-in, not free).
    """
    staged = df.select(
        F.col(id_col).alias("id"),
        text.normalize_ws(F.coalesce(F.col(text_col), F.lit("")))
        .alias("t"))
    if long_doc_threshold is not None:
        short = char_entropy(
            staged.filter(F.length("t") <= int(long_doc_threshold)),
            "id", "t")
        long_docs = staged.filter(
            F.length("t") > int(long_doc_threshold))
        n_long = F.length("t").cast("double")
        counts = (long_docs
                  .select("id", F.length("t").cast("long")
                          .alias("n_chars"), n_long.alias("_n"),
                          F.explode(F.regexp_extract_all(
                              "t", F.lit(r"(?s)."), 0)).alias("ch"))
                  .groupBy("id", "n_chars", "_n", "ch")
                  .agg(F.count(F.lit(1)).cast("long").alias("run")))
        p = F.col("run").cast("double") / F.col("_n")
        term = F.floor(-p * F.log(p) * 1000000 + F.lit(0.5)) \
            .cast("long")
        long_out = (counts.select("id", "n_chars", term.alias("_t"))
                    .groupBy("id", "n_chars")
                    .agg(F.sum("_t").cast("long")
                         .alias("entropy_micro")))
        return short.unionByName(long_out)

    n = F.length("t").cast("double")

    def term(run):
        p = run.cast("double") / n
        return F.floor(-p * F.log(p) * 1000000 + F.lit(0.5)).cast("long")

    # run-length fold over the SORTED codepoint array: state carries
    # (current run's char, run length, accumulated micro-nats); each
    # char either extends the run or closes it into one entropy term
    state0 = F.struct(F.lit("").alias("prev"),
                      F.lit(0).cast("long").alias("run"),
                      F.lit(0).cast("long").alias("acc"))

    def step(acc, ch):
        closed = F.when(acc["run"] > 0, term(acc["run"])) \
            .otherwise(F.lit(0).cast("long"))
        return (F.when(ch == acc["prev"],
                       F.struct(acc["prev"].alias("prev"),
                                (acc["run"] + 1).alias("run"),
                                acc["acc"].alias("acc")))
                .otherwise(F.struct(ch.alias("prev"),
                                    F.lit(1).cast("long").alias("run"),
                                    (acc["acc"] + closed).alias("acc"))))

    def finish(acc):
        return acc["acc"] + (F.when(acc["run"] > 0, term(acc["run"]))
                             .otherwise(F.lit(0).cast("long")))

    entropy = F.aggregate(
        F.array_sort(F.regexp_extract_all("t", F.lit(r"(?s)."), 0)),
        state0, step, finish)
    return staged.select(
        "id",
        F.length("t").cast("long").alias("n_chars"),
        F.when(F.length("t") > 0, entropy)
        .otherwise(F.lit(0)).cast("long").alias("entropy_micro"))
