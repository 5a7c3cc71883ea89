"""ADVICE r12 (low): the empty-text guard (CASE WHEN t = '' THEN []) was
applied to only the trainer/gate/infer oracles; every other word-splitting
oracle still evaluates string_split('', ' ') = [''] (n_words=1) where the
Spark side yields 0 — a latent parity gap that stays invisible because the
sf fixtures contain no empty documents.

This module forces it to surface: it builds an AUGMENTED sf dir (the real
sf0.001 tables, with documents extended by empty / whitespace-only / NULL
text rows) and re-runs the driver's exact parity compare for every
registered query whose oracle word-splits the documents table. The
augmented corpus is what a real 100 TB crawl looks like — empty documents
are routine there, so oracle semantics must match Spark's on them.
"""

from __future__ import annotations

import re
import shutil

import duckdb
import pytest

from dativo_ingest_spark.queries import QUERIES, TABLES
from tests.conftest import SF_DIR
from tests.test_oracle_parity import _duck_rows, _spark_rows

#: queries whose oracle both word-splits and reads documents — computed
#: from the registry so new word-splitting oracles are covered on landing
AFFECTED = sorted(
    name
    for name, q in QUERIES.items()
    if q.oracle is not None
    and "string_split" in q.oracle
    and re.search(r"\bdocuments\b", q.oracle)
)

EDGE_ROWS = [
    # (doc_id, text, lang, source, n_chars) — ids far above the fixture max
    (9_000_001, "", "en", "web", 0),          # empty text
    (9_000_002, "   ", "en", "web", 3),       # whitespace-only
    (9_000_003, None, "de", "books", 0),      # NULL text
    (9_000_004, "\n\t \n", "es", "wiki", 5),  # whitespace incl. newlines
]


@pytest.fixture(scope="module")
def aug_dir(tmp_path_factory, spark):
    """sf0.001 with documents augmented by empty/whitespace/NULL texts."""
    root = tmp_path_factory.mktemp("sf_empty_docs")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_DIR}/{t}.parquet", root / f"{t}.parquet")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    extra = spark.createDataFrame(EDGE_ROWS, schema=base.schema)
    # single output file so DuckDB's '<dir>/documents.parquet' view and
    # Spark's directory read see the identical table
    out = str(root / "documents.parquet")
    base.unionByName(extra).toPandas().to_parquet(out, index=False)
    return str(root)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_affected_set_is_nonempty_and_stable():
    # the set must keep covering the known word-splitting families; if
    # this shrinks unexpectedly the regex drifted, not the risk
    assert len(AFFECTED) >= 30
    for expected in ("token_counts_docs", "tfidf_top_terms",
                     "bigram_logprob_quality", "dedup_lines_docs",
                     "chunk_documents_sliding", "bm25_topk_docs"):
        assert expected in AFFECTED


@pytest.mark.parametrize("name", AFFECTED)
def test_parity_with_empty_docs(spark, aug_dir, name):
    q = QUERIES[name]
    sdf = q.fn(spark, aug_dir)
    s_cols, s_rows = _spark_rows(sdf)
    d_cols, d_rows = _duck_rows(_duck(aug_dir), q.oracle)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert sum(s_rows.values()) == sum(d_rows.values()), (
        f"{name}: row count {sum(s_rows.values())} vs {sum(d_rows.values())}"
    )
    if s_rows != d_rows:
        only_s = list((s_rows - d_rows).items())[:5]
        only_d = list((d_rows - s_rows).items())[:5]
        pytest.fail(
            f"{name}: value mismatch on empty-doc corpus\n"
            f"  spark-only: {only_s}\n  duck-only:  {only_d}"
        )
