"""Document chunking + token-budget sampling semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dativo_ingest_spark.operators import chunking, sampling


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunk_exact_partitioning(spark):
    """stride == chunk_size tiles the doc exactly: every word appears in
    exactly one chunk, ragged tail kept."""
    words = " ".join(f"w{i}" for i in range(10))
    out = chunking.chunk_documents(_docs(spark, [(1, words)]), "doc_id",
                                   "text", chunk_size=4, stride=4)
    rows = sorted((r.chunk_id, r.n_tokens, r.chunk) for r in out.collect())
    assert rows == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w4 w5 w6 w7"),
        (2, 2, "w8 w9"),
    ]


def test_chunk_overlap_and_boundaries(spark):
    """stride < chunk_size overlaps: chunk i starts at word i*stride; the
    last chunk is the first window reaching the end (no empty windows)."""
    words = " ".join(f"w{i}" for i in range(7))
    out = chunking.chunk_documents(_docs(spark, [(1, words)]), "doc_id",
                                   "text", chunk_size=4, stride=2)
    rows = sorted((r.chunk_id, r.chunk) for r in out.collect())
    assert rows == [
        (0, "w0 w1 w2 w3"),
        (1, "w2 w3 w4 w5"),
        (2, "w4 w5 w6"),
    ]


def test_chunk_short_and_empty_docs(spark):
    out = chunking.chunk_documents(
        _docs(spark, [(1, "only three words"), (2, ""), (3, "   ")]),
        "doc_id", "text", chunk_size=10, stride=5)
    rows = [(r.id, r.chunk_id, r.chunk) for r in out.collect()]
    assert rows == [(1, 0, "only three words")]  # empties emit nothing


def test_chunk_rejects_bad_stride(spark):
    with pytest.raises(ValueError, match="stride"):
        chunking.chunk_documents(_docs(spark, [(1, "a b")]), "doc_id",
                                 "text", chunk_size=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        chunking.chunk_documents(_docs(spark, [(1, "a b")]), "doc_id",
                                 "text", chunk_size=4, stride=0)


def test_token_budget_sample_quota_semantics(spark):
    rows = [(i, "en" if i % 2 else "de", 100) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, wc bigint")
    out = sampling.token_budget_sample(df, "doc_id", "lang", "wc",
                                       budget_tokens=450)
    got = [(r.lang, r.id, r.cum_tokens) for r in out.collect()]
    per_lang = {}
    for lang, _id, cum in got:
        per_lang.setdefault(lang, []).append(cum)
    # each group admits docs until crossing the budget: 5 docs x 100 = 500
    for lang, cums in per_lang.items():
        assert len(cums) == 5
        assert max(cums) == 500  # first crossing kept -> reaches >= budget
    # admission order is deterministic: rerun identical
    again = [(r.lang, r.id, r.cum_tokens) for r in
             sampling.token_budget_sample(df, "doc_id", "lang", "wc",
                                          budget_tokens=450).collect()]
    assert sorted(got) == sorted(again)
    # no admitted row had already-met budget before it
    assert all(cum - 100 < 450 for _, _, cum in got)


def test_token_budget_sample_small_groups_kept_whole(spark):
    df = spark.createDataFrame([(1, "fr", 30), (2, "fr", 30)],
                               "doc_id bigint, lang string, wc bigint")
    out = sampling.token_budget_sample(df, "doc_id", "lang", "wc",
                                       budget_tokens=1000)
    assert sorted((r.id, r.cum_tokens) for r in out.collect()) in (
        [(1, 30), (2, 60)], [(1, 60), (2, 30)])  # order is hash-determined


def test_token_budget_sample_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, "x", 1)],
                               "doc_id bigint, lang string, wc bigint")
    with pytest.raises(ValueError, match="positive"):
        sampling.token_budget_sample(df, "doc_id", "lang", "wc", 0)
    with pytest.raises(ValueError, match="positive"):
        sampling.token_budget_sample_sharded(df, "doc_id", "lang", "wc",
                                             100, n_shards=0)


def test_token_budget_sample_sharded_skewed_groups(spark):
    """The skew-proof variant on a pathologically skewed 2-group frame:
    one group holds 95% of rows. Per-(group, shard) quotas hold, every
    shard admits at most quota+1 crossing row, totals still reach the
    budget, and the window never partitions on the bare group key."""
    rows = [(i, "en", 50) for i in range(950)] + \
           [(10_000 + i, "de", 50) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, wc bigint")
    out = sampling.token_budget_sample_sharded(
        df, "doc_id", "lang", "wc", budget_tokens=1600, n_shards=8)
    got = out.collect()
    per = {}
    for r in got:
        per.setdefault((r.lang, r.shard), []).append(r)
    # shard-local quota: 1600/8 = 200 tokens -> 4 docs x 50, crossing kept
    for (lang, shard), rs in per.items():
        assert 0 <= shard < 8
        assert max(r.cum_tokens for r in rs) <= 200 + 50  # quota + 1 doc
        assert all(r.cum_tokens - r.n_tokens < 200 for r in rs)
    en_total = sum(r.n_tokens for r in got if r.lang == "en")
    assert en_total >= 1600  # enough material -> budget reached
    # deterministic across reruns
    again = sampling.token_budget_sample_sharded(
        df, "doc_id", "lang", "wc", budget_tokens=1600, n_shards=8).collect()
    assert sorted((r.lang, r.id, r.cum_tokens) for r in got) == \
        sorted((r.lang, r.id, r.cum_tokens) for r in again)
    # plan partitions the window on (group, shard), not the bare group
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    import re
    wspec = plan[plan.index("Window"):].split("\n")[0]
    assert re.search(r"partitionBy.*shard|shard.*windowspecdefinition|"
                     r"windowspecdefinition\(lang#\d+, shard", plan) or \
        "shard" in wspec


class TestSentenceChunking:
    def test_windows_never_split_sentences(self, spark):
        from dativo_ingest_spark.operators.chunking import chunk_by_sentences

        text = "One here. Two there! Three now? Four then. Five end."
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = {r["chunk_id"]: r for r in chunk_by_sentences(
            df, "doc_id", "text", max_sentences=2, overlap=1).collect()}
        assert out[0]["chunk"] == "One here. Two there!"
        assert out[1]["chunk"] == "Two there! Three now?"
        assert out[2]["chunk"] == "Three now? Four then."
        assert out[3]["chunk"] == "Four then. Five end."
        assert all(r["n_sentences"] == 2 for r in out.values())

    def test_ragged_tail_and_short_docs(self, spark):
        from dativo_ingest_spark.operators.chunking import chunk_by_sentences

        df = spark.createDataFrame(
            [(1, "A one. B two. C three."), (2, "Single."), (3, "")],
            ["doc_id", "text"])
        rows = chunk_by_sentences(df, "doc_id", "text",
                                  max_sentences=2, overlap=0).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["id"], []).append(r)
        assert len(by_doc[1]) == 2              # 2 + ragged 1
        assert by_doc[1][-1]["n_sentences"] == 1
        assert len(by_doc[2]) == 1
        assert 3 not in by_doc                  # empty doc: no chunks

    def test_scan_stage_no_shuffle(self, spark):
        from dativo_ingest_spark.operators.chunking import chunk_by_sentences
        from dativo_ingest_spark.queries import load
        from tests.conftest import SF_DIR

        docs = load(spark, SF_DIR, "documents")
        plan = chunk_by_sentences(docs, "doc_id", "text")\
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_validation(self, spark):
        import pytest as _pytest

        from dativo_ingest_spark.operators.chunking import chunk_by_sentences

        df = spark.createDataFrame([(1, "x.")], ["doc_id", "text"])
        with _pytest.raises(ValueError):
            chunk_by_sentences(df, "doc_id", "text",
                               max_sentences=2, overlap=2)
