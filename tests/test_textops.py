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
