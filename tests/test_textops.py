"""feature_hash invariants: unsigned counts, signed collision
cancellation, layout invariance (operators/textops.py:feature_hash)."""

class TestFeatureHash:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_counts_unsigned(self, spark):
        from dativo_ingest_spark.operators.textops import feature_hash
        df = self._docs(spark, [(1, "a b a"), (2, "")])
        out = feature_hash(df, "text", "doc_id", n_buckets=64)
        rows = [(r.doc_id, r.weight) for r in out.collect()]
        assert sorted(rows) in ([(1, 1), (1, 2)], [(1, 3)])  # collision ok
        assert out.columns == ["doc_id", "bucket", "weight"]
        assert all(0 <= r.bucket < 64 for r in out.collect())

    def test_signed_cancellation_drops_zero_rows(self, spark):
        from dativo_ingest_spark.operators.textops import feature_hash
        # find two words with the same bucket but opposite signs, then a
        # doc containing both must not emit that bucket
        import hashlib
        words = {}
        pair = None
        for i in range(2000):
            w = f"w{i}"
            h = hashlib.md5(w.encode()).hexdigest()
            b = int(h[:8], 16) % 64
            s = 1 if int(h[8], 16) % 2 == 0 else -1
            if (b, -s) in words:
                pair = (words[(b, -s)], w)
                break
            words[(b, s)] = w
        assert pair, "no cancelling pair found in 2000 candidates"
        df = self._docs(spark, [(1, f"{pair[0]} {pair[1]}")])
        out = feature_hash(df, "text", "doc_id", n_buckets=64, signed=True)
        assert out.count() == 0

    def test_layout_invariant_and_validates(self, spark):
        import pytest as _pytest
        from dativo_ingest_spark.operators.textops import feature_hash
        df = self._docs(spark, [(i, f"tok{i} tok{i+1} shared")
                                for i in range(30)])
        a = {(r.doc_id, r.bucket, r.weight)
             for r in feature_hash(df, "text", "doc_id", 128).collect()}
        b = {(r.doc_id, r.bucket, r.weight)
             for r in feature_hash(df.repartition(7), "text", "doc_id",
                                   128).collect()}
        assert a == b and a
        with _pytest.raises(ValueError):
            feature_hash(df, "text", "doc_id", n_buckets=1)


class TestLearnedClassifierInfer:
    """The learned-model inference seam: vendored artifact load, exact
    int64 matmul in the Arrow UDF, deterministic tie-break."""

    def test_matches_numpy_reference(self, spark):
        import numpy as np

        from dativo_ingest_spark.operators import textops

        model = textops.load_quality_grade_model()
        W = np.asarray(model["weights_milli"], dtype=np.int64)
        docs = spark.createDataFrame(
            [(1, "the cat and the dog sat of the mat to look, it is fine."),
             (2, "word " * 50),
             (3, ""),
             (4, "a b c d e f g h i j k l m n o p q r s t u v w x y z")],
            "doc_id bigint, text string")
        got = {r.id: (r.grade, r.top_logit)
               for r in textops.learned_classifier_infer(
                   docs, "doc_id", "text").collect()}
        feats = {r.id: r.asDict() for r in textops.quality_features(
            docs, "doc_id", "text").collect()}
        for i, f in feats.items():
            x = np.array([
                10000,
                min(f["n_words"], 1000) * 10,
                int(np.floor(f["stopword_ratio"] * 10000 + 0.5)),
                int(np.floor(f["punct_ratio"] * 10000 + 0.5)),
                int(np.floor(min(f["avg_word_len"], 10.0) * 1000 + 0.5)),
            ], dtype=np.int64)
            logits = W @ x
            assert got[i] == (int(logits.argmax()), int(logits.max())), i

    def test_tie_breaks_to_lowest_class(self, spark):
        from dativo_ingest_spark.operators import textops

        # all-equal weight rows force a 4-way tie on every doc: the
        # argmax must deterministically pick class 0
        model = textops.load_quality_grade_model()
        tied = dict(model, weights_milli=[model["weights_milli"][3]] * 4)
        docs = spark.createDataFrame(
            [(1, "the cat sat"), (2, "word soup here")],
            "doc_id bigint, text string")
        out = textops.learned_classifier_infer(
            docs, "doc_id", "text", model=tied).collect()
        assert {r.grade for r in out} == {0}

    def test_malformed_artifact_rejected(self, tmp_path):
        import json as _json

        import pytest as _pytest

        from dativo_ingest_spark.operators import textops

        good = textops.load_quality_grade_model()
        bad = dict(good, weights_milli=[row[:-1]
                                        for row in good["weights_milli"]])
        p = tmp_path / "bad.json"
        p.write_text(_json.dumps(bad))
        with _pytest.raises(ValueError, match="feature_names"):
            textops.load_quality_grade_model(str(p))


class TestBm25TopK:
    """Exact-integer BM25: Spark output must equal a row-by-row Python
    replication of the closed-form integer-quotient scoring."""

    DOCS = [
        (1, "hash join table scan hash hash"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "hash table"),
        (4, "join join join table stream"),
        (5, "scan scan window batch stream stream"),
    ]

    def _reference(self, queries, k):
        import math
        from collections import Counter

        toks = {i: t.split() for i, t in self.DOCS}
        n_docs = len(toks)
        total = sum(len(w) for w in toks.values())
        out = []
        for qid, terms in queries.items():
            scores = {}
            for term in dict.fromkeys(terms):
                df = sum(1 for w in toks.values() if term in w)
                if df == 0:
                    continue
                idf = math.floor(math.log(
                    1.0 + (n_docs - df + 0.5) / (df + 0.5)) * 1e6 + 0.5)
                for i, w in toks.items():
                    f = Counter(w)[term]
                    if not f:
                        continue
                    num = idf * 22 * total * f
                    den = 10 * total * f + 3 * total + 9 * len(w) * n_docs
                    scores[i] = scores.get(i, 0) + num // den
            ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
            out.extend((qid, r + 1, i, s)
                       for r, (i, s) in enumerate(ranked))
        return sorted(out)

    def test_matches_integer_reference(self, spark):
        from dativo_ingest_spark.operators import textops

        queries = {"qa": ["hash", "table"], "qb": ["stream", "scan"],
                   "qc": ["fox"]}
        df = spark.createDataFrame(self.DOCS, "doc_id bigint, text string")
        got = sorted((r.query_id, r.rank, r.id, r.score_micro)
                     for r in textops.bm25_topk(
                         df, "doc_id", "text", queries, k=3).collect())
        assert got == self._reference(queries, 3)
        # every score is a positive exact integer (Lucene IDF > 0)
        assert all(s > 0 for *_ignored, s in got)

    def test_unmatched_query_returns_nothing(self, spark):
        from dativo_ingest_spark.operators import textops

        df = spark.createDataFrame(self.DOCS, "doc_id bigint, text string")
        out = textops.bm25_topk(df, "doc_id", "text",
                                {"qz": ["zebra"]}).collect()
        assert out == []

    def test_empty_queries_rejected(self, spark):
        import pytest as _pytest

        from dativo_ingest_spark.operators import textops

        df = spark.createDataFrame(self.DOCS, "doc_id bigint, text string")
        with _pytest.raises(ValueError, match="non-empty"):
            textops.bm25_topk(df, "doc_id", "text", {"q": []})


class TestUnicodeNormalize:
    """UCD canonicalization: composed and decomposed forms converge,
    accents fold, controls/whitespace collapse."""

    def test_forms_converge_and_fold(self, spark):
        from dativo_ingest_spark.operators import textops

        rows = [
            (1, "Cafe\u0301"),    # decomposed e + combining acute
            (2, "Caf\u00e9"),     # composed \u00e9
            (3, "na\u00efve\tA\u030angstr\u00f6m"),
            (4, "  plain   ascii  "),
            (5, None),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {r.id: (r.norm_text, r.changed, r.n_chars)
               for r in textops.unicode_normalize(
                   df, "doc_id", "text").collect()}
        assert got[1][0] == "Cafe" and got[2][0] == "Cafe"
        assert got[1][0] == got[2][0]          # forms converge
        assert got[3][0] == "naive Angstrom"
        assert got[4] == ("plain ascii", True, 11)
        assert got[5][0] == "" and got[5][2] == 0

    def test_no_fold_keeps_accents_composed(self, spark):
        from dativo_ingest_spark.operators import textops

        df = spark.createDataFrame(
            [(1, "Cafe\u0301"), (2, "Caf\u00e9")],
            "doc_id bigint, text string")
        got = {r.id: r.norm_text for r in textops.unicode_normalize(
            df, "doc_id", "text", accent_fold=False).collect()}
        # both normalize to the COMPOSED form — equal, accents kept
        assert got[1] == got[2] == "Caf\u00e9"

    def test_ascii_identity_unchanged_flag(self, spark):
        from dativo_ingest_spark.operators import textops

        df = spark.createDataFrame([(1, "hello world")],
                                   "doc_id bigint, text string")
        r = textops.unicode_normalize(df, "doc_id", "text").collect()[0]
        assert r.norm_text == "hello world" and r.changed is False


class TestKneserNey:
    """Interpolated KN: hand-replicated integer-quotient scoring and
    the continuation-count ('Francisco') property."""

    def test_matches_hand_computation(self, spark):
        import math

        from dativo_ingest_spark.operators import textops

        # model: "a b a b a c"; scored doc: "a b c x"
        model = spark.createDataFrame([(0, "a b a b a c")],
                                      "doc_id bigint, text string")
        doc = spark.createDataFrame([(1, "a b c x")],
                                    "doc_id bigint, text string")
        r = textops.kneser_ney_logprob(
            doc, "doc_id", "text", model_df=model).collect()[0]
        # model stats: c(a)=3 c(b)=2 c(c)=1 total=6 vocab=3
        # bigrams: (a,b)x2 (b,a)x2 (a,c)x1 -> B=3
        # n1f: a->2, b->1 ; n1p: b->1, a->1, c->1
        def kn(c12, c1, n1f, n1p, B=3):
            return math.floor(math.log(
                (max(4 * c12 - 3, 0) * B + 3 * n1f * n1p)
                / (4 * c1 * B)) * 1e6 + 0.5)
        lp_ab = kn(2, 3, 2, 1)                 # seen bigram (a,b)
        lp_bc = kn(0, 2, 1, 1)                 # unseen (b,c): KN mass
        lp_cx = math.floor(math.log((0 + 1) / (6 + 3)) * 1e6 + 0.5)
        # (c,x): x unknown -> c1 known but n1p(x)=0 and c12=0 -> unk path
        assert r.n_bigrams == 3 and r.n_unk == 1
        expect = round((lp_ab + lp_bc + lp_cx) / 3 / 1e6, 6)
        assert r.avg_logprob == expect

    def test_francisco_property(self, spark):
        from dativo_ingest_spark.operators import textops

        # 'rico' is FREQUENT but only ever follows 'puerto';
        # 'day' is equally frequent with many distinct contexts.
        # After an unseen context 'new', KN must prefer 'day'.
        model_text = ("puerto rico " * 8
                      + "good day nice day long day hot day new york")
        model = spark.createDataFrame([(0, model_text)],
                                      "doc_id bigint, text string")
        docs = spark.createDataFrame(
            [(1, "new rico"), (2, "new day")],
            "doc_id bigint, text string")
        got = {r.id: r.avg_logprob
               for r in textops.kneser_ney_logprob(
                   docs, "doc_id", "text", model_df=model).collect()}
        assert got[2] > got[1]   # day (many contexts) beats rico (one)

    def test_self_trained_has_no_unknowns(self, spark):
        from dativo_ingest_spark.operators import textops
        from dativo_ingest_spark.queries import load
        from tests.conftest import SF_DIR

        docs = load(spark, SF_DIR, "documents")
        out = textops.kneser_ney_logprob(docs, "doc_id", "text")
        assert out.filter("n_unk > 0").count() == 0


class TestCharEntropy:
    def test_hand_computed(self, spark):
        import math

        from dativo_ingest_spark.operators import textops

        df = spark.createDataFrame(
            [(1, "aabb"), (2, "aaaa"), (3, ""), (4, None)],
            "doc_id bigint, text string")
        got = {r.id: (r.n_chars, r.entropy_micro)
               for r in textops.char_entropy(
                   df, "doc_id", "text").collect()}
        # "aabb": p(a)=p(b)=0.5 -> H = ln 2
        t = math.floor(-0.5 * math.log(0.5) * 1e6 + 0.5)
        assert got[1] == (4, 2 * t)
        assert got[2] == (4, 0)          # single char class: H = 0
        assert got[3] == (0, 0) and got[4] == (0, 0)

    def test_gibberish_above_prose_above_padding(self, spark):
        from dativo_ingest_spark.operators import textops

        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "aGVsbG8xMjM0NTY3ODlBQkNERUZHSElKS0xNTk9QUVJT"),  # b64ish
            (3, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {r.id: r.entropy_micro for r in textops.char_entropy(
            df, "doc_id", "text").collect()}
        assert got[2] > got[1] > got[3] == 0

    def test_long_doc_fallback_is_bit_identical(self, spark):
        # ADVICE r13: the one-scan plan holds one sorted codepoint array
        # per row; the opt-in threshold routes oversized docs through an
        # O(1)-per-row-state explode/agg branch. Integer micro-nat terms
        # keep the two branches bit-identical.
        from dativo_ingest_spark.operators import textops

        rows = [
            (1, "short prose doc"),
            (2, "the quick brown fox " * 40),     # above the threshold
            (3, "aGVsbG8xMjM0NTY3ODlBQkNE" * 50),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        default = {r.id: (r.n_chars, r.entropy_micro)
                   for r in textops.char_entropy(
                       df, "doc_id", "text").collect()}
        hybrid = {r.id: (r.n_chars, r.entropy_micro)
                  for r in textops.char_entropy(
                      df, "doc_id", "text",
                      long_doc_threshold=100).collect()}
        assert hybrid == default
        assert len(hybrid) == 4  # both branches contribute rows
