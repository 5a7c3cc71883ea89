"""Text-analysis operators: quality scoring, language ID, token counts,
document fingerprinting.

All pure-expression pipelines over functions/text.py building blocks — they
run inside the scan stage (no shuffle, no Python) and so cost ~nothing at
100 TB beyond the read itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dativo_ingest_spark.functions import hashing, text

#: marker-word sets for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "les", "des", "et"),
}

PUNCT_PATTERN = r"[.,;:!?]"


def _marker_score(words_col: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(words_col, lambda w: w.isin(*markers))).cast("long")


def quality_features(
    df: DataFrame, id_col: str, text_col: str, min_words: int = 20,
    max_stopword_ratio: float = 0.5,
) -> DataFrame:
    """Per-doc quality stats + a keep/drop flag.

    (id, n_chars, n_words, avg_word_len, punct_ratio, stopword_ratio,
    quality_ok)
    """
    t = F.col(text_col)
    w = text.words(t)
    n_words = F.size(w).cast("long")
    n_chars = F.length(t).cast("long")
    # letters-only length over word count (normalized text has single spaces)
    letters = F.length(F.regexp_replace(text.normalize_ws(t), " ", ""))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(PUNCT_PATTERN), 0))
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(
            F.when(n_words == 0, F.lit(0.0)).otherwise(letters / n_words), 4
        ).alias("avg_word_len"),
        F.round(
            F.when(n_chars == 0, F.lit(0.0)).otherwise(n_punct / n_chars), 4
        ).alias("punct_ratio"),
        F.round(text.stopword_ratio(w), 4).alias("stopword_ratio"),
        (
            (n_words >= min_words)
            & (text.stopword_ratio(w) <= max_stopword_ratio)
        ).alias("quality_ok"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language scores + argmax prediction.

    (id, score_en, score_de, score_es, score_fr, predicted_lang) — argmax
    tie-break follows the declaration order en > de > es > fr.
    """
    w = text.words(F.col(text_col))
    scores = {
        lang: _marker_score(w, markers) for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    pred = None
    for i, lang in enumerate(langs):
        cond = None
        for other in langs[i + 1:]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        branch = F.lit(lang)
        if pred is None:
            pred = F.when(cond, branch) if cond is not None else branch
        else:
            pred = pred.when(cond, branch) if cond is not None else pred.otherwise(branch)
    return df.select(
        F.col(id_col).alias("id"),
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        pred.alias("predicted_lang"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_ws_tokens, n_bpe_tokens): whitespace + BPE-ish regex counts."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        text.word_count(t).alias("n_ws_tokens"),
        text.bpe_ish_token_count(t).alias("n_bpe_tokens"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint, fp_bucket): md5 content hash + 4-hex shard key.

    The short bucket prefix is the natural shard/partition key for
    dedup-at-scale (uniform 16-bit fanout).
    """
    fp = hashing.content_fingerprint(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        fp.alias("fingerprint"),
        F.substring(fp, 1, 4).alias("fp_bucket"),
    )
