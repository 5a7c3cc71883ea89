"""DSIR importance weighting: sign/ordering sanity, every-doc-present,
integer determinism, and the Gumbel top-k resampler."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dativo_ingest_spark.operators import dsir


def _corpus(spark):
    rows = (
        [(i, "der die das und ein wort hier") for i in range(5)]
        + [(i, "the quick brown fox jumps again") for i in range(5, 10)]
        + [(10, None), (11, "   ")]
    )
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestImportanceWeights:
    def test_target_like_docs_score_higher(self, spark):
        df = _corpus(spark)
        target = spark.createDataFrame(
            [("der die das und noch ein wort",)], "text string")
        out = {r.id: r for r in dsir.importance_weights(
            df, "doc_id", "text", target).collect()}
        german = [out[i].weight_micro for i in range(5)]
        english = [out[i].weight_micro for i in range(5, 10)]
        assert min(german) > max(english)
        # empty/NULL docs present with zero weight
        assert out[10].weight_micro == 0 and out[10].n_feats == 0
        assert out[11].weight_micro == 0
        assert len(out) == 12

    def test_weights_are_exact_integers_run_to_run(self, spark):
        df = _corpus(spark)
        target = df.filter(F.col("doc_id") < 5).select("text")
        a = sorted(map(tuple, dsir.importance_weights(
            df, "doc_id", "text", target).collect()))
        b = sorted(map(tuple, dsir.importance_weights(
            df.repartition(7), "doc_id", "text", target).collect()))
        assert a == b          # partitioning cannot perturb a bigint sum

    def test_validation(self, spark):
        df = _corpus(spark)
        with pytest.raises(ValueError):
            dsir.importance_weights(df, "doc_id", "text", df,
                                    n_buckets=0)


class TestGumbelTopK:
    def test_temperature_zero_is_exact_topk(self, spark):
        w = spark.createDataFrame(
            [(i, 10 * i) for i in range(20)],
            "id long, weight_micro long")
        got = sorted(r.id for r in dsir.gumbel_topk_sample(
            w, k=5, temperature=0.0).collect())
        assert got == [15, 16, 17, 18, 19]

    def test_sampling_is_deterministic_and_weight_biased(self, spark):
        w = spark.createDataFrame(
            [(i, 2_000_000 if i < 10 else 0) for i in range(100)],
            "id long, weight_micro long")
        a = sorted(r.id for r in dsir.gumbel_topk_sample(
            w, k=20, temperature=1.0).collect())
        b = sorted(r.id for r in dsir.gumbel_topk_sample(
            w.repartition(5), k=20, temperature=1.0).collect())
        assert a == b                       # salted md5, not rand()
        # the +2-nat group must be clearly over-represented: a uniform
        # draw would put ~2 of the 10 hot docs in the top 20 (this
        # fixed salt draws 5; the mean over salts is ~6.9)
        assert sum(1 for i in a if i < 10) >= 4
        c = sorted(r.id for r in dsir.gumbel_topk_sample(
            w, k=20, temperature=1.0, salt="other").collect())
        assert a != c                       # salt changes the draw

    def test_validation(self, spark):
        w = spark.createDataFrame([(1, 0)], "id long, weight_micro long")
        with pytest.raises(ValueError):
            dsir.gumbel_topk_sample(w, k=0)
        with pytest.raises(ValueError):
            dsir.gumbel_topk_sample(w, k=1, temperature=-1.0)
