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


class TestDoremiRounds:
    def test_uniform_loss_keeps_uniform_weights(self):
        from dativo_ingest_spark.operators.dsir import _doremi_rounds

        w = _doremi_rounds([("a", 5_000_000), ("b", 5_000_000),
                            ("c", 5_000_000)], n_rounds=10,
                           eta_milli=500)
        # equal NLL => excess 0 every round => shares stay 1/3
        assert set(w.values()) == {333_333}

    def test_hard_domain_upweights_toward_equilibrium(self):
        from dativo_ingest_spark.operators.dsir import _doremi_rounds

        stats = [("easy", 4_000_000), ("hard", 8_000_000)]
        prev = 500_000
        last = None
        for k in (1, 3, 6, 12):
            w = _doremi_rounds(stats, n_rounds=k, eta_milli=500)
            assert w["hard"] > w["easy"]
            assert w["hard"] >= prev          # monotone in rounds
            prev = w["hard"]
            last = w
        # weights remain normalized micro shares
        assert abs(sum(last.values()) - 1_000_000) <= len(last)

    def test_one_round_hand_computed(self):
        from dativo_ingest_spark.operators.dsir import _doremi_rounds

        stats = [("a", 2_000_000), ("b", 6_000_000)]
        # round 1 by hand: W=1e6 each, tot=2e6, s=500000 each,
        # ref = (500000*2e6 + 500000*6e6)//1e6 = 4_000_000
        # exc_a = 0, exc_b = 2_000_000
        # W_a = 1e6; W_b = (1e6 * (1e6 + (200*2e6)//1000)) // 1e6
        #          = 1e6 + 400_000 = 1_400_000
        # renorm: tot2 = 2_400_000
        # W_a = 1e12 // 2.4e6 = 416_666 ; W_b = 1.4e12//2.4e6 = 583_333
        w = _doremi_rounds(stats, n_rounds=1, eta_milli=200)
        assert w == {"a": 416_666, "b": 583_333}

    def test_eta_zero_is_identity(self):
        from dativo_ingest_spark.operators.dsir import _doremi_rounds

        w = _doremi_rounds([("a", 1_000_000), ("b", 9_000_000)],
                           n_rounds=7, eta_milli=0)
        assert w == {"a": 500_000, "b": 500_000}

    def test_validation(self):
        import pytest as _pytest

        from dativo_ingest_spark.operators.dsir import _doremi_rounds

        with _pytest.raises(ValueError, match="n_rounds"):
            _doremi_rounds([("a", 1)], n_rounds=-1, eta_milli=1)
        with _pytest.raises(ValueError, match="eta_milli"):
            _doremi_rounds([("a", 1)], n_rounds=1, eta_milli=-1)


class TestDoremiDomainWeights:
    def test_hard_domain_wins_corpus_weights(self, spark):
        from dativo_ingest_spark.operators.dsir import (
            doremi_domain_weights)

        # "common" docs reuse high-frequency words (high unigram prob,
        # low NLL); "rare" docs use singleton words (high NLL)
        rows = ([(i, "web", "the cat sat on the mat the end") 
                 for i in range(40)]
                + [(100 + i, "code", f"zx{i}q qq{i}z xq{i}v vv{i}w")
                   for i in range(10)]
                + [(200, "empty", "   ")])
        df = spark.createDataFrame(rows,
                                   "doc_id bigint, src string, t string")
        out = {r.domain: r for r in doremi_domain_weights(
            df, "src", "t", n_rounds=5,
            eta_milli=500).collect()}
        assert "empty" not in out            # zero-token docs don't score
        assert out["code"].nll_micro > out["web"].nll_micro
        assert out["code"].weight_micro > out["code"].baseline_micro
        assert out["web"].weight_micro < out["web"].baseline_micro
        assert out["web"].n_docs == 40 and out["code"].n_docs == 10
        total = sum(r.weight_micro for r in out.values())
        assert abs(total - 1_000_000) <= 2


class TestDoremiRoundAveraging:
    def test_average_smooths_the_transient(self):
        # the paper's published mixture is the MEAN of per-step weights:
        # it sits between the uniform start and the final-round
        # equilibrium for a monotone trajectory
        from dativo_ingest_spark.operators.dsir import _doremi_rounds

        stats = [("easy", 4_000_000), ("hard", 8_000_000)]
        final = _doremi_rounds(stats, n_rounds=8, eta_milli=500)
        avg = _doremi_rounds(stats, n_rounds=8, eta_milli=500,
                             average_rounds=True)
        assert 500_000 < avg["hard"] < final["hard"]
        assert abs(sum(avg.values()) - 1_000_000) <= len(avg)

    def test_average_of_one_round_equals_final(self):
        from dativo_ingest_spark.operators.dsir import _doremi_rounds

        stats = [("a", 2_000_000), ("b", 6_000_000)]
        f = _doremi_rounds(stats, n_rounds=1, eta_milli=200)
        a = _doremi_rounds(stats, n_rounds=1, eta_milli=200,
                           average_rounds=True)
        assert a == f

    def test_zero_rounds_average_is_uniform(self):
        from dativo_ingest_spark.operators.dsir import _doremi_rounds

        a = _doremi_rounds([("a", 1), ("b", 2)], n_rounds=0,
                           eta_milli=100, average_rounds=True)
        assert a == {"a": 1_000_000, "b": 1_000_000}
