"""Text-analysis Column expressions (JVM-side, UDF-free).

Building blocks for the training-data pipeline operators: whitespace
normalization, tokenization, word n-grams, stopword/punctuation statistics.
All pure ``pyspark.sql.functions`` compositions so they stay inside
whole-stage codegen and scale linearly with no Python overhead — at 100 TB
these run in the scan stage with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small English stopword set used by quality scoring / language ID.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

#: BPE-ish token pattern: runs of letters, runs of digits, or a single
#: non-alphanumeric non-space character (GPT-2-style coarse pre-tokenizer).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def normalize_ws(col: Column) -> Column:
    """lower + trim + collapse all whitespace runs to single spaces."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def words(col: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    n = normalize_ws(col)
    return F.when(n == "", F.array().cast("array<string>")).otherwise(
        F.split(n, " ")
    )


def word_count(col: Column) -> Column:
    return F.size(words(col)).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens via regexp_extract_all (no UDF)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)).cast("long")


def word_ngrams(words_col: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; [] when fewer than n words.

    1-indexed ``element_at`` so the equivalent DuckDB list expression (also
    1-indexed) is symmetrical for oracle parity.
    """
    idx = F.when(
        F.size(words_col) >= n,
        F.sequence(F.lit(1), F.size(words_col) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words_col, i + k) for k in range(n)]
    )
    return F.transform(idx, gram)


def distinct_word_ngrams(col: Column, n: int) -> Column:
    """Distinct word n-grams of raw text (the shingle *set*)."""
    return F.array_distinct(word_ngrams(words(col), n))


def stopword_ratio(words_col: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """fraction of tokens that are stopwords; 0.0 for empty docs."""
    n = F.size(words_col)
    hits = F.size(F.filter(words_col, lambda w: w.isin(*stopwords)))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)
