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
