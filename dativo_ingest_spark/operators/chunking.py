"""Document chunking for training-data pipelines (UDF-free, scan-stage).

Splits long documents into sliding word-window chunks — the preprocessing
step between curation and tokenization in an LLM data pipeline (context
windows, embedding inputs, retrieval passages). Beyond the reference's
surface (it has no text pipeline; SURVEY §2 LLM-operator family), built
like the rest of this engine's text stack: pure ``pyspark.sql.functions``
array expressions that run inside whole-stage codegen at the scan, so a
100 TB corpus chunks with ZERO shuffles and linear cost.

Chunk ``i`` of a document covers words ``[i*stride, i*stride+chunk_size)``
(1-indexed slice below); the final chunk is the first whose window reaches
the document's end — a ragged tail is kept, empty chunks never emitted.
``stride < chunk_size`` yields overlapping chunks (the usual 25% overlap
for retrieval corpora); ``stride == chunk_size`` is exact partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dativo_ingest_spark.functions import text


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk) sliding word-window chunks.

    ``n_chunks = 1 + ceil((n_words - chunk_size) / stride)`` for documents
    longer than one window, 1 otherwise (0 for empty docs). Integer-exact
    arithmetic end-to-end so a SQL oracle reproduces values bit-for-bit.
    """
    if not 0 < stride <= chunk_size:
        raise ValueError("need 0 < stride <= chunk_size")
    # No repartition here: at scale the parquet scan's file splits provide
    # the parallelism and chunking stays a zero-shuffle scan-stage map;
    # callers chunking a single small file can repartition themselves.
    return _window_chunks(df, id_col, text.words(F.col(text_col)),
                          chunk_size, stride, "n_tokens")

def _window_chunks(
    df: DataFrame,
    id_col: str,
    arr,
    size: int,
    stride: int,
    size_alias: str,
) -> DataFrame:
    """Shared window-count/explode/slice scaffolding for both chunkers:
    ``n_chunks = 1 + ceil((n - size) / stride)`` over one window, 1
    otherwise, 0 for empty arrays; ragged tail kept, integer-exact."""
    staged = df.select(
        F.col(id_col).alias("id"), arr.alias("_a"), F.size(arr).alias("_n"))
    extra = F.floor(
        (F.col("_n") - F.lit(size) + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")
    n_chunks = (
        F.when(F.col("_n") <= 0, F.lit(0))
        .when(F.col("_n") <= size, F.lit(1))
        .otherwise(extra + 1)
    )
    idx = F.when(
        n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    chunked = staged.select("id", "_a", F.explode(idx).alias("chunk_id"))
    sl = F.slice(F.col("_a"), F.col("chunk_id") * stride + 1, size)
    return chunked.select(
        "id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(sl).cast("long").alias(size_alias),
        F.concat_ws(" ", sl).alias("chunk"),
    )




#: sentence boundary: ., !, ? (optionally repeated, e.g. "?!"), followed by
#: whitespace. split() consumes the whitespace; the terminator stays with
#: its sentence via the lookbehind.
SENTENCE_BOUNDARY = r"(?<=[.!?])\s+"


def chunk_by_sentences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_sentences: int = 5,
    overlap: int = 1,
) -> DataFrame:
    """(id, chunk_id, n_sentences, chunk) sentence-window chunks.

    The retrieval-passage variant of :func:`chunk_documents`: windows
    advance ``max_sentences - overlap`` SENTENCES at a time so chunk
    boundaries never split a sentence — the usual prep for RAG corpora
    and embedding inputs, where mid-sentence truncation hurts retrieval
    quality. Sentences come from a regex boundary split (terminator +
    whitespace); a trailing ragged window is kept, empty docs yield no
    chunks.

    Same execution shape as the word chunker: pure array expressions in
    the scan stage, zero shuffles at any corpus size. Documents that are
    one run-on sentence produce one chunk of one (long) sentence —
    degrade to :func:`chunk_documents` for hard token bounds.
    """
    if not 0 <= overlap < max_sentences:
        raise ValueError("need 0 <= overlap < max_sentences")
    stride = max_sentences - overlap
    trimmed = F.trim(F.col(text_col))
    sents = F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, SENTENCE_BOUNDARY))
    return _window_chunks(df, id_col, sents, max_sentences, stride,
                          "n_sentences")
