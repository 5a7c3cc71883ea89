"""PII scrub + repetition-quality operator tests (real-PII examples the
synthetic corpus can't provide — the oracle queries exercise the same
expressions over decorated corpus text)."""

import pytest

from pyspark.sql import functions as F

from dativo_ingest_spark.operators import pii, textops
from dativo_ingest_spark.queries import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "contact Jo.Smith+spam@example.co.uk or call +1 (415) 555-1234 now"),
        (2, "server at 10.0.255.7 logged ssn 123-45-6789 twice: 123-45-6789"),
        (3, "clean document, nothing sensitive here"),
        (4, ""),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts(pii_docs):
    got = {
        r["id"]: r.asDict()
        for r in pii.pii_features(pii_docs, "doc_id", "text").collect()
    }
    assert got[1]["n_email"] == 1
    assert got[1]["n_phone"] == 1
    assert got[1]["n_pii"] == 2 and got[1]["has_pii"]
    assert got[2]["n_ipv4"] == 1
    assert got[2]["n_ssn"] == 2
    assert got[2]["n_pii"] == 3
    assert got[3]["n_pii"] == 0 and not got[3]["has_pii"]
    assert got[4]["n_pii"] == 0
    # null text propagates null counts, not errors
    assert got[5]["n_email"] is None


def test_redaction_replaces_every_class(pii_docs):
    got = {r["id"]: r["redacted"] for r in pii.scrub(pii_docs, "doc_id", "text").collect()}
    assert got[1] == "contact [EMAIL] or call [PHONE] now"
    assert got[2] == "server at [IP] logged ssn [SSN] twice: [SSN]"
    assert got[3] == "clean document, nothing sensitive here"


def test_redaction_class_arg_order_is_irrelevant(pii_docs):
    # classes apply in PII_PATTERNS order however the caller lists them
    a = pii_docs.select(
        pii.redact(F.col("text"), classes=("ipv4", "ssn", "phone", "email")).alias("r")
    ).collect()
    b = pii_docs.select(
        pii.redact(F.col("text"), classes=("email", "phone", "ssn", "ipv4")).alias("r")
    ).collect()
    assert [r["r"] for r in a] == [r["r"] for r in b]


def test_redact_subset_only_touches_requested_classes(pii_docs):
    out = (
        pii_docs.filter("doc_id = 2")
        .select(pii.redact(F.col("text"), classes=("ssn",)).alias("r"))
        .first()["r"]
    )
    assert "[SSN]" in out and "10.0.255.7" in out


def test_repetition_features(spark):
    rows = [
        (1, "spam spam spam spam spam"),            # 1 distinct word, 1 distinct bigram
        (2, "all words here are fully distinct"),   # no repetition
        (3, "ab"),                                  # single word: no bigrams
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: r.asDict()
        for r in textops.repetition_features(df, "doc_id", "text").collect()
    }
    assert got[1]["dup_word_ratio"] == 0.8
    assert got[1]["dup_bigram_ratio"] == 0.75
    assert not got[1]["repetition_ok"]
    assert got[2]["dup_word_ratio"] == 0.0
    assert got[2]["repetition_ok"]
    assert got[3]["dup_bigram_ratio"] == 0.0  # too short to form bigrams
    assert got[4]["n_words"] == 0 and got[4]["repetition_ok"]


def test_top_word_stats(spark):
    rows = [(1, "a a a b c"), (2, ""), (3, "x y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: r.asDict()
        for r in textops.top_word_stats(df, "doc_id", "text").collect()
    }
    assert got[1]["top_word_count"] == 3
    assert got[1]["top_word_fraction"] == 0.6
    assert got[2]["top_word_count"] == 0 and got[2]["top_word_fraction"] == 0.0
    assert got[3]["top_word_fraction"] == 0.5


def test_repetition_plan_is_scan_stage(spark):
    """No exchange in the repetition-features plan — it must ride the scan."""
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("w w w").alias("text")
    )
    plan = textops.repetition_features(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tfidf_top_terms(spark):
    rows = [
        (1, "apple apple apple common"),
        (2, "banana common common"),
        (3, "cherry common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.tfidf_top_terms(df, "doc_id", "text", k=1)
    got = {r["id"]: r for r in out.collect()}
    # the doc-unique term always outranks 'common' (df = 3 → idf 0)
    assert got[1]["term"] == "apple" and got[1]["tf"] == 3
    assert got[2]["term"] == "banana"
    assert got[3]["term"] == "cherry"
    assert got[1]["df_docs"] == 1
    # ln(3/3) = 0 exactly for the shared term; unique terms positive
    assert got[1]["tfidf"] > 0


def test_boilerplate_stats(spark):
    # 'nav bar' appears in 3 docs → boilerplate at min_df=3; doc 4 clean
    rows = [
        (1, "nav bar home page alpha beta"),
        (2, "nav bar login gamma delta"),
        (3, "nav bar epsilon"),
        (4, "completely original content here"),
        (5, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r.asDict() for r in textops.boilerplate_stats(
        df, "doc_id", "text", n=2, min_df=3, max_fraction=0.4).collect()}
    assert out[1]["n_boilerplate_grams"] == 1          # 'nav bar'
    assert out[3]["n_boilerplate_grams"] == 1
    assert out[3]["boilerplate_fraction"] == 0.5       # 1 of 2 grams
    assert not out[3]["boilerplate_ok"]
    assert out[4]["n_boilerplate_grams"] == 0 and out[4]["boilerplate_ok"]
    assert out[5]["n_distinct_grams"] == 0 and out[5]["boilerplate_ok"]


def test_classifier_score_range_and_threshold(spark):
    docs = load(spark, SF, "documents")
    out = textops.classifier_score(docs, "doc_id", "text")
    assert out.count() == docs.count()
    rows = out.collect()
    assert all(0.0 <= r.score <= 1.0 for r in rows)
    assert all(r.keep == (r.score >= 0.5) for r in rows)
    # the synthetic corpus is prose-like: most docs should clear the bar
    assert sum(r.keep for r in rows) > len(rows) * 0.5


def test_classifier_score_weight_override(spark):
    docs = load(spark, SF, "documents")
    # an all-penalty model must strictly lower every score vs the default
    harsh = textops.classifier_score(
        docs, "doc_id", "text",
        weights={"intercept": -5.0, "words": 0.0, "stopwords": 0.0,
                 "punct": -3.0, "word_len": 0.0},
    )
    assert harsh.filter("keep").count() == 0


class TestGopherRules:
    def test_rule_flags_and_conjunction(self, spark):
        from dativo_ingest_spark.operators import textops

        good = " ".join(
            ["the quick brown fox jumps over that lazy dog have with"] * 6)
        short = "the tiny doc"
        symbols = " ".join(["w#rd### has### symbols###"] * 20)
        bullets = "\n".join(["- item one two three"] * 10)
        nonalpha = " ".join(["123 456 789 000"] * 20)
        df = spark.createDataFrame(
            [("good", good), ("short", short), ("sym", symbols),
             ("bul", bullets), ("num", nonalpha), ("empty", "")],
            "doc_id string, text string")
        got = {r.id: r for r in textops.gopher_rules(
            df, "doc_id", "text").collect()}
        assert got["good"].gopher_ok
        assert not got["short"].ok_word_count
        assert not got["sym"].ok_symbol_ratio
        assert not got["bul"].ok_bullet_lines and not got["bul"].gopher_ok
        assert not got["num"].ok_alpha_words
        assert not got["num"].ok_stopwords
        assert got["empty"].n_words == 0 and not got["empty"].gopher_ok

    def test_ellipsis_lines_and_scan_stage_plan(self, spark):
        from dativo_ingest_spark.inspect_cmd import plan_summary
        from dativo_ingest_spark.operators import textops

        trailing = "\n".join(
            ["the story continues and then..."] * 4 + ["a plain line"])
        df = spark.createDataFrame(
            [("e", trailing)], "doc_id string, text string")
        row = textops.gopher_rules(df, "doc_id", "text").collect()[0]
        assert row.ellipsis_line_frac == 0.8
        assert not row.ok_ellipsis_lines

        from dativo_ingest_spark.queries import load
        big = load(spark, "/root/testdata/sf0.001", "documents")
        plan = plan_summary(textops.gopher_rules(big, "doc_id", "text"))
        assert plan["exchanges"] == 0 and plan["python_evals"] == 0


class TestDropDuplicateLines:
    def test_hot_lines_drop_everywhere_order_preserved(self, spark):
        from dativo_ingest_spark.operators import textops

        rows = [
            (1, "unique prose one\nCOOKIE BANNER\nmore unique text"),
            (2, "different content\nCOOKIE BANNER\n  \nanother line"),
            (3, "third doc body\nCOOKIE BANNER\nclosing words"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.id: r for r in textops.drop_duplicate_lines(
            df, "doc_id", "text", max_line_df=2).collect()}
        assert got[1].text == "unique prose one\nmore unique text"
        assert got[2].text == "different content\nanother line"
        assert (got[2].n_lines, got[2].n_dropped) == (4, 2)  # + blank line
        assert got[3].n_dropped == 1

    def test_all_lines_dropped_yields_empty_doc(self, spark):
        from dativo_ingest_spark.operators import textops

        rows = [(i, "SAME LINE") for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = textops.drop_duplicate_lines(
            df, "doc_id", "text", max_line_df=2).collect()
        assert all(r.text == "" and r.n_dropped == 1 for r in got)
        assert len(got) == 4   # every doc still present

    def test_threshold_and_validation(self, spark):
        import pytest as _pytest

        from dativo_ingest_spark.operators import textops

        rows = [(1, "shared"), (2, "shared"), (3, "solo")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        keep2 = textops.drop_duplicate_lines(
            df, "doc_id", "text", max_line_df=2)
        assert sum(r.n_dropped for r in keep2.collect()) == 0
        keep1 = textops.drop_duplicate_lines(
            df, "doc_id", "text", max_line_df=1)
        assert sorted((r.id, r.n_dropped) for r in keep1.collect()) == \
            [(1, 1), (2, 1), (3, 0)]
        with _pytest.raises(ValueError):
            textops.drop_duplicate_lines(df, "doc_id", "text",
                                         max_line_df=0)

    def test_no_cache_entry_survives_the_call(self, spark):
        """The r7 leak: the exploded line frame stayed cached (and
        referenced by the returned plan) after every call. The operator
        must leave the catalog cache exactly as it found it while still
        returning correct results."""
        from dativo_ingest_spark.operators import textops

        spark.catalog.clearCache()
        rows = [(i, f"unique {i}\nCOOKIE BANNER") for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = textops.drop_duplicate_lines(
            df, "doc_id", "text", max_line_df=2)
        # correctness unaffected by the leak fix
        got = {r.id: r for r in out.collect()}
        assert all(got[i].text == f"unique {i}" for i in range(5))
        # jsparkSession cache manager is empty again
        assert spark._jsparkSession.sharedState() \
            .cacheManager().isEmpty()


def test_gopher_and_line_dedup_null_text_survives(spark):
    """NULL text (the jsonl read path admits malformed lines as all-null
    rows) must behave as the empty document — real False flags, never a
    vanished row or a three-valued NULL conjunction."""
    from dativo_ingest_spark.operators import textops

    df = spark.createDataFrame(
        [(1, None), (2, "the real document with plenty of words here")],
        "doc_id long, text string")
    g = {r.id: r for r in textops.gopher_rules(
        df, "doc_id", "text").collect()}
    assert g[1].gopher_ok is False          # False, not None
    assert g[1].n_words == 0 and g[1].ok_word_count is False

    out = {r.id: r for r in textops.drop_duplicate_lines(
        df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}               # both docs present
    assert out[1].text == "" and out[1].n_lines == 1


class TestStripHtml:
    def test_blocks_tags_entities_whitespace(self, spark):
        from dativo_ingest_spark.operators import textops

        rows = [
            (1, '<html><head><script type="t">var x = "<p>";</script>'
                '<style>.a{color:red}</style></head><body><!-- nav -->'
                '<h1>Title &amp; More</h1><p>Hello&nbsp;world '
                '&lt;tag&gt; &#39;q&#39;</p></body></html>'),
            (2, None),
            (3, 'plain text no markup'),
            (4, '<div><p>a</p><p>b</p></div>'),
        ]
        df = spark.createDataFrame(rows, "doc_id long, html string")
        out = {r.id: r for r in
               textops.strip_html(df, "doc_id", "html").collect()}
        # script/style drop WITH content (the "<p>" inside the script
        # string must not resurrect as a tag boundary)
        assert out[1].text == "Title & More Hello world <tag> 'q'"
        assert out[2].text == "" and out[2].html_len == 0 \
            and out[2].text_ratio == 0.0
        assert out[3].text == "plain text no markup" \
            and out[3].text_ratio == 1.0
        assert out[4].text == "a b"
        # boilerplate signal: chrome-heavy page extracts a low ratio
        assert out[1].text_ratio < 0.25

    def test_multiline_blocks_and_ratio_ordering(self, spark):
        from dativo_ingest_spark.operators import textops

        chrome = ("<script>\nfunction f() {\n  return 1;\n}\n</script>"
                  "<style>\nbody {\n margin: 0;\n}\n</style>")
        rows = [(1, f"<html>{chrome}<p>tiny</p></html>"),
                (2, "<p>" + "word " * 50 + "</p>")]
        df = spark.createDataFrame(rows, "doc_id long, html string")
        out = {r.id: r for r in
               textops.strip_html(df, "doc_id", "html").collect()}
        assert out[1].text == "tiny"          # (?s) spans newlines
        assert out[2].text_ratio > out[1].text_ratio

    def test_plan_is_scan_stage(self, spark):
        from dativo_ingest_spark.operators import textops

        df = spark.createDataFrame([(1, "<p>x</p>")],
                                   "doc_id long, html string")
        plan = textops.strip_html(df, "doc_id", "html") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestPmiCollocations:
    def _df(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string")

    def test_glued_pair_scores_above_independent(self, spark):
        # "new york" always adjacent; "red" and "blue" never adjacent to
        # each other -> PMI(new,york) high, no (red,blue) row at all
        texts = ["new york " * 6 + "red car blue sky " * 3] * 2
        out = {(r.w1, r.w2): (r.n_pair, r.pmi_micro)
               for r in textops.pmi_collocations(
                   self._df(spark, texts), "id", "text", min_count=5)
               .collect()}
        assert ("new", "york") in out
        assert ("red", "blue") not in out
        n, pmi = out[("new", "york")]
        assert n == 12 and pmi > 0
        # every occurrence of "car" is followed by "blue": also glued,
        # but rarer - still positive
        assert out[("car", "blue")][1] > 0

    def test_min_count_thins(self, spark):
        texts = ["alpha beta"] * 4
        out = textops.pmi_collocations(
            self._df(spark, texts), "id", "text", min_count=5)
        assert out.count() == 0
        out2 = textops.pmi_collocations(
            self._df(spark, texts), "id", "text", min_count=4)
        assert out2.count() == 1

    def test_bigrams_never_cross_documents(self, spark):
        # "x" ends doc 0 and "y" starts doc 1: no (x, y) bigram
        texts = ["a a a a a x", "y b b b b b"]
        out = {(r.w1, r.w2) for r in textops.pmi_collocations(
            self._df(spark, texts), "id", "text", min_count=1).collect()}
        assert ("x", "y") not in out
        assert ("a", "x") in out and ("y", "b") in out


class TestBlocklistGate:
    def test_token_exact_never_substring(self, spark):
        df = spark.createDataFrame(
            [(1, "classic prose here"), (2, "lorem ipsum filler"),
             (3, "LOREM shouts"), (4, "")],
            "id long, text string")
        got = {r.id: (r.n_hits, r.blocked) for r in
               textops.blocklist_gate(df, "id", "text").collect()}
        assert got[1] == (0, False)     # 'classic' is not a hit
        assert got[2] == (2, True)
        assert got[3] == (1, True)      # case-folded
        assert got[4] == (0, False)

    def test_max_hits_threshold_and_custom_terms(self, spark):
        df = spark.createDataFrame(
            [(1, "spam word"), (2, "spam spam word")],
            "id long, text string")
        got = {r.id: r.blocked for r in textops.blocklist_gate(
            df, "id", "text", terms=("spam",), max_hits=1).collect()}
        assert got == {1: False, 2: True}
        import pytest as _pytest

        with _pytest.raises(ValueError):
            textops.blocklist_gate(df, "id", "text", terms=())

    def test_phrase_terms_match_as_ngrams(self, spark):
        df = spark.createDataFrame(
            [(1, "the bad phrase appears here"),
             (2, "bad things and a phrase but never adjacent"),
             (3, "BAD   PHRASE with odd spacing")],
            "id long, text string")
        got = {r.id: (r.n_hits, r.blocked) for r in
               textops.blocklist_gate(
                   df, "id", "text", terms=("bad phrase",)).collect()}
        assert got[1] == (1, True)
        assert got[2] == (0, False)     # words present, phrase absent
        assert got[3] == (1, True)      # normalization collapses spaces

    def test_mixed_word_and_phrase_terms_sum(self, spark):
        df = spark.createDataFrame(
            [(1, "spam and bad phrase and spam")], "id long, text string")
        r = textops.blocklist_gate(
            df, "id", "text", terms=("spam", "bad phrase")).first()
        assert (r.n_hits, r.blocked) == (3, True)


class TestCreditCardLuhn:
    def test_luhn_separates_valid_from_lookalike(self, spark):
        # 4532015112830366 is Luhn-valid; 4532015112830367 is not
        df = spark.createDataFrame(
            [(1, "card 4532015112830366 on file"),
             (2, "id 4532015112830367 is just an id"),
             (3, "spaced 4532 0151 1283 0366 works too"),
             (4, "dashed 4532-0151-1283-0366"),
             (5, "short 12345"),
             (6, "")],
            "id long, text string")
        got = {r.id: (r.n_candidates, r.n_valid, r.has_card)
               for r in pii.credit_card_features(df, "id", "text")
               .collect()}
        assert got[1] == (1, 1, True)
        assert got[2] == (1, 0, False)   # candidate, fails checksum
        assert got[3] == (1, 1, True)
        assert got[4] == (1, 1, True)
        assert got[5] == (0, 0, False)
        assert got[6] == (0, 0, False)

    def test_luhn_column_direct(self, spark):
        df = spark.createDataFrame(
            [("4532015112830366",), ("4532 0151 1283 0366",),
             ("79927398713",), (None,)], "s string")
        got = [r.v for r in df.select(
            pii.luhn_valid(F.col("s")).alias("v")).collect()]
        # 79927398713 is Luhn-valid but only 11 digits -> below PAN floor
        assert got == [True, True, False, False]

    def test_luhn_fold_matches_duckdb_on_planted_cards(self, spark):
        # the gate corpus has no PAN-shaped runs, so pin the NON-zero
        # path cross-engine here: same fold, planted data
        import duckdb

        texts = [
            (1, "pay 4532015112830366 now"),
            (2, "fake 4532015112830367 id"),
            (3, "two cards 5555 5555 5555 4444 and 4111-1111-1111-1111"),
            (4, "digits 1234567890123456789 run"),
            (5, "nothing here"),
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = sorted(
            (r.id, r.n_candidates, r.n_valid, r.has_card)
            for r in pii.credit_card_features(df, "doc_id", "text")
            .collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", texts)
        want = sorted(tuple(r) for r in con.execute(r"""
            WITH cand AS (
              SELECT doc_id, unnest(regexp_extract_all(
                text, '\b\d(?:[- ]?\d){12,18}\b')) AS s FROM t),
            d AS (SELECT doc_id, regexp_replace(s, '[^0-9]', '', 'g')
                    AS ds FROM cand),
            lu AS (SELECT doc_id, len(ds) AS nd,
                   list_sum([CASE WHEN (len(ds) - g + 1) % 2 = 0
                     THEN CASE WHEN CAST(ds[g] AS INT)*2 > 9
                          THEN CAST(ds[g] AS INT)*2 - 9
                          ELSE CAST(ds[g] AS INT)*2 END
                     ELSE CAST(ds[g] AS INT) END
                     for g in range(1, len(ds) + 1)]) AS lsum FROM d),
            agg AS (SELECT doc_id,
                    CAST(count(*) AS BIGINT) AS n_candidates,
                    CAST(sum(CASE WHEN nd >= 13 AND lsum % 10 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
                    FROM lu GROUP BY 1)
            SELECT t.doc_id, coalesce(n_candidates, 0),
                   coalesce(n_valid, 0), coalesce(n_valid, 0) > 0
            FROM t LEFT JOIN agg USING (doc_id)""").fetchall())
        assert got == want
        assert got[2][1:] == (2, 2, True)   # both planted cards valid


    def test_luhn_matches_python_reference_on_random_inputs(self, spark):
        import random

        def py_luhn(s):
            ds = [int(c) for c in s if c.isdigit()]
            if len(ds) < 13:
                return False
            total = 0
            for k, d in enumerate(reversed(ds)):
                if k % 2 == 1:
                    d *= 2
                    if d > 9:
                        d -= 9
                total += d
            return total % 10 == 0

        rng = random.Random(42)
        rows = []
        for i in range(300):
            n = rng.randrange(10, 22)
            s = "".join(rng.choice("0123456789") for _ in range(n))
            if rng.random() < 0.3:   # sprinkle separators
                s = " ".join(s[j:j + 4] for j in range(0, len(s), 4))
            rows.append((i, s))
        df = spark.createDataFrame(rows, "id long, s string")
        got = {r.id: r.v for r in df.select(
            "id", pii.luhn_valid(F.col("s")).alias("v")).collect()}
        want = {i: py_luhn(s) for i, s in rows}
        assert got == want


class TestFleschReadingEase:
    def test_counts_and_score(self, spark):
        df = spark.createDataFrame(
            [(1, "The cat sat. The dog ran!"),
             (2, "no terminator here"),
             (3, "")],
            "id long, text string")
        got = {r.id: r for r in textops.flesch_reading_ease(
            df, "id", "text").collect()}
        a = got[1]
        assert (a.n_words, a.n_sentences) == (6, 2)
        # vowel groups: e,a,a,e,o,a -> 6 one-syllable words
        assert a.n_syllables == 6
        expect = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
        assert a.flesch_micro == int(expect * 1_000_000 + 0.5)
        assert got[2].n_sentences == 1      # min-1 sentence floor
        assert got[3].flesch_micro is None  # empty doc -> NULL score

    def test_simple_text_scores_higher_than_polysyllabic(self, spark):
        df = spark.createDataFrame(
            [(1, "I like tea. I like milk. We sit."),
             (2, "Incomprehensibility characterizes internationalization "
                 "methodologies notwithstanding organizational "
                 "considerations.")],
            "id long, text string")
        got = {r.id: r.flesch_micro for r in textops.flesch_reading_ease(
            df, "id", "text").collect()}
        assert got[1] > got[2]
