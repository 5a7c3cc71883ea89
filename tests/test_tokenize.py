"""Tokenizer-aware (BPE) token counting: the operational merge loop, the
distinct-word corpus path vs the scan-stage column path, and the
samplers' token_count_mode knob."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dativo_ingest_spark.operators import sampling, tokenize


class TestWordKernel:
    def test_known_merge_sequences(self):
        # hand-checked against the merges table: th+e -> 'the' is one
        # token; 'winter' -> w in t er; unknown alphabet stays chars
        merges = tokenize.DEFAULT_MERGES
        assert tokenize._bpe_word_token_count("the", merges) == 1
        assert tokenize._bpe_word_token_count("winter", merges) == 4
        assert tokenize._bpe_word_token_count("xyz", merges) == 3
        assert tokenize._bpe_word_token_count("query", merges) == 1
        assert tokenize._bpe_word_token_count("table", merges) == 1

    def test_repeated_pair_reaches_fixpoint(self):
        # back-to-back runs merge across iterations (the delimited-
        # replace overlap case): 'aaaa' with merges (a,a),(aa,aa)
        merges = (("a", "a"), ("aa", "aa"))
        assert tokenize._bpe_word_token_count("aaaa", merges) == 1
        assert tokenize._bpe_word_token_count("aaa", merges) == 2

    def test_count_never_below_one(self):
        assert tokenize._bpe_word_token_count("a", (("a", "a"),)) == 1


class TestRankedKernelEquivalence:
    """The production-shaped kernel (rank-dict over the WORD's pairs,
    O(word) per merge) must reach the identical fixpoint as the
    reference table-scan loop — the invariant that lets a 50k-merge
    table drop in without touching the oracle semantics."""

    def test_hand_cases_both_tables(self):
        for merges in (tokenize.DEFAULT_MERGES, tokenize.load_merges_v1()):
            ranks = tokenize._rank_index(merges)
            for w in ("the", "winter", "xyz", "query", "table",
                      "government", "unstopword", "aaa", "a", ""):
                assert (tokenize._bpe_word_token_count_ranked(w, ranks)
                        == tokenize._bpe_word_token_count(w, merges)), w

    def test_overlap_semantics_match(self):
        merges = (("a", "a"), ("aa", "aa"))
        ranks = tokenize._rank_index(merges)
        for w in ("aaaa", "aaa", "aaaaa", "aaaaaaa"):
            assert (tokenize._bpe_word_token_count_ranked(w, ranks)
                    == tokenize._bpe_word_token_count(w, merges)), w

    def test_property_random_words(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        merges = tokenize.load_merges_v1()
        ranks = tokenize._rank_index(merges)

        @settings(max_examples=300, deadline=None)
        @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz",
                       min_size=0, max_size=24))
        def check(w):
            assert (tokenize._bpe_word_token_count_ranked(w, ranks)
                    == tokenize._bpe_word_token_count(w, merges))

        check()

    def test_v1_artifact_loads_and_is_large(self):
        merges = tokenize.load_merges_v1()
        assert len(merges) > 1000          # production-shaped, not demo
        # later ranks build on earlier ones: every non-char symbol a
        # merge references was produced by an EARLIER merge
        produced = set()
        for left, right in merges:
            for s in (left, right):
                assert len(s) == 1 or s in produced, (left, right)
            produced.add(left + right)

    def test_quote_escaping_in_values(self):
        sql = tokenize.merges_sql_values((("'", "a"),))
        assert "''" in sql
        import duckdb
        got = duckdb.connect().execute(
            "SELECT l FROM " + sql).fetchone()[0]
        assert got == "'"


class TestCorpusPaths:
    def test_frame_path_counts_and_null_text(self, spark):
        df = spark.createDataFrame(
            [(1, "the the winter"), (2, None), (3, "  "), (4, "xyz")],
            "doc_id long, text string")
        out = {r.id: r for r in
               tokenize.bpe_token_counts(df, "doc_id", "text").collect()}
        assert out[1].n_words == 3 and out[1].n_tokens == 1 + 1 + 4
        assert out[2].n_words == 0 and out[2].n_tokens == 0
        assert out[3].n_words == 0 and out[3].n_tokens == 0
        assert out[4].n_tokens == 3

    def test_column_path_agrees_with_frame_path(self, spark):
        rows = [(i, f"the table query word{i} mixed case TEXT here")
                for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        frame = {r.id: r.n_tokens for r in
                 tokenize.bpe_token_counts(df, "doc_id", "text").collect()}
        col = {r.id: r.n for r in df.select(
            F.col("doc_id").alias("id"),
            tokenize.bpe_token_count_col(F.col("text")).alias("n"),
        ).collect()}
        assert frame == col

    def test_column_path_null_text_counts_zero(self, spark):
        df = spark.createDataFrame([(1, None), (2, "the")],
                                   "doc_id long, text string")
        got = {r.doc_id: r.n for r in df.select(
            "doc_id",
            tokenize.bpe_token_count_col(F.col("text")).alias("n"),
        ).collect()}
        assert got == {1: 0, 2: 1}


class TestSamplerKnob:
    def _docs(self, spark):
        rows = [(i, "en" if i % 2 else "de",
                 f"the query table word{i} content here") for i in range(40)]
        return spark.createDataFrame(rows, "doc_id long, lang string, "
                                           "text string")

    def test_bpe_mode_equals_explicit_bpe_column(self, spark):
        df = self._docs(spark)
        via_knob = sampling.token_budget_sample(
            df, "doc_id", "lang", "text", budget_tokens=50,
            token_count_mode="bpe").collect()
        via_col = sampling.token_budget_sample(
            df, "doc_id", "lang",
            tokenize.bpe_token_count_col(F.col("text")),
            budget_tokens=50).collect()
        key = lambda r: (r.lang, r.id)   # noqa: E731
        assert sorted(map(tuple, via_knob), key=str) == \
            sorted(map(tuple, via_col), key=str)
        assert sorted(via_knob, key=key) == sorted(via_col, key=key)

    def test_bpe_v1_mode_counts_under_vendored_table(self, spark):
        df = self._docs(spark)
        via_knob = sampling.token_budget_sample(
            df, "doc_id", "lang", "text", budget_tokens=50,
            token_count_mode="bpe_v1").collect()
        via_col = sampling.token_budget_sample(
            df, "doc_id", "lang",
            tokenize.bpe_token_count_col(
                F.col("text"), merges=tokenize.load_merges_v1()),
            budget_tokens=50).collect()
        assert sorted(map(tuple, via_knob), key=str) == \
            sorted(map(tuple, via_col), key=str)
        # the knob genuinely changes the measured budget: the two
        # tables are different vocabularies, so counts must differ
        # (v1's 3,588 merges compress common English much further
        # on THIS corpus; not a theorem — the tables aren't nested)
        demo = {r.id: r.n_tokens for r in sampling.token_budget_sample(
            df, "doc_id", "lang", "text", budget_tokens=10**6,
            token_count_mode="bpe").collect()}
        v1 = {r.id: r.n_tokens for r in sampling.token_budget_sample(
            df, "doc_id", "lang", "text", budget_tokens=10**6,
            token_count_mode="bpe_v1").collect()}
        assert set(v1) == set(demo)
        assert any(v1[i] != demo[i] for i in v1)

    def test_sharded_bpe_mode_and_bad_mode(self, spark):
        df = self._docs(spark)
        out = sampling.token_budget_sample_sharded(
            df, "doc_id", "lang", "text", budget_tokens=80, n_shards=4,
            token_count_mode="bpe").collect()
        assert out and all(r.n_tokens > 0 for r in out)
        with pytest.raises(ValueError):
            sampling.token_budget_sample(
                df, "doc_id", "lang", "text", budget_tokens=10,
                token_count_mode="wordpiece")

    def test_bpe_counts_differ_from_word_counts(self, spark):
        # the knob must actually change the measured budget: BPE token
        # counts exceed word counts on multi-symbol words
        from dativo_ingest_spark.functions import text as text_fns

        df = self._docs(spark)
        words = df.select(F.sum(
            text_fns.word_count(F.col("text"))).alias("s")).collect()[0].s
        bpe = df.select(F.sum(
            tokenize.bpe_token_count_col(F.col("text"))).alias("s")
        ).collect()[0].s
        assert bpe > words


class TestTrainBpeMerges:
    def test_learns_known_sequence(self, spark):
        # vocab: low ×2, lower ×1. Round 1: (l,o)=3 ties (o,w)=3 ->
        # lexicographic smallest left wins. Round 3: count-1 ties
        # resolve to (e,r) < (low,e).
        df = spark.createDataFrame(
            [(1, "low low lower")], "id long, text string")
        got = tokenize.train_bpe_merges(df, "text", n_merges=4)
        assert got == [("l", "o", 3), ("lo", "w", 3),
                       ("e", "r", 1), ("low", "er", 1)]

    def test_stops_when_no_pairs_remain(self, spark):
        df = spark.createDataFrame([(1, "ab ab")], "id long, text string")
        got = tokenize.train_bpe_merges(df, "text", n_merges=10)
        assert got == [("a", "b", 2)]   # 'ab' fully merged after 1 round

    def test_learned_table_feeds_application_kernel(self, spark):
        df = spark.createDataFrame(
            [(1, "the the theme")], "id long, text string")
        learned = tuple((l, r) for l, r, _ in
                        tokenize.train_bpe_merges(df, "text", n_merges=3))
        # 'the' must compress to one token under its own training corpus
        assert tokenize._bpe_word_token_count("the", learned) == 1

    def test_deterministic_across_runs(self, spark):
        from dativo_ingest_spark.queries import load
        from tests.conftest import SF_DIR

        docs = load(spark, SF_DIR, "documents")
        a = tokenize.train_bpe_merges(docs, "text", n_merges=3)
        b = tokenize.train_bpe_merges(docs, "text", n_merges=3)
        assert a == b and len(a) == 3
