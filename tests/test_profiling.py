"""profile_table invariants: stat correctness vs hand counts, null
accounting, native-type min/max ordering, exact-vs-approx distinct modes,
column selection/validation, and the top-values drill-down
(operators/profiling.py docstring)."""

import pytest
from pyspark.sql import functions as F

from dativo_ingest_spark.operators import profiling


def _sample(spark):
    return spark.createDataFrame(
        [(1, "b", 10.5), (2, "a", None), (2, None, 2.0), (9, "a", 100.0)],
        "id bigint, tag string, x double")


def test_profile_exact_stats(spark):
    prof = {r["column"]: r for r in profiling.profile_table(
        _sample(spark), distinct_mode="exact").collect()}
    assert set(prof) == {"id", "tag", "x"}
    r = prof["id"]
    assert (r.n_rows, r.n_null, r.n_distinct) == (4, 0, 3)
    assert (r.min_value, r.max_value) == ("1", "9")
    r = prof["tag"]
    assert (r.n_rows, r.n_null, r.n_distinct) == (4, 1, 2)
    assert (r.min_value, r.max_value) == ("a", "b")
    r = prof["x"]
    assert (r.n_rows, r.n_null, r.n_distinct) == (4, 1, 3)
    # numeric ordering: 2.0 < 10.5 even though "10.5" < "2.0" as strings
    assert (r.min_value, r.max_value) == ("2.0", "100.0")


def test_profile_approx_mode_close_and_cheap_shape(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 97).alias("mod"))
    prof = {r["column"]: r for r in profiling.profile_table(
        df, distinct_mode="approx", rsd=0.01).collect()}
    assert abs(prof["id"].n_distinct - 1000) <= 30
    assert abs(prof["mod"].n_distinct - 97) <= 5
    # approx mode must not plan an Expand (the exact-distinct row
    # multiplier); the plan stays a plain partial/final aggregate
    plan = profiling.profile_table(
        df, distinct_mode="approx")._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_profile_column_subset_and_validation(spark):
    df = _sample(spark)
    out = profiling.profile_table(df, ["id"], distinct_mode="exact")
    assert [r["column"] for r in out.collect()] == ["id"]
    with pytest.raises(ValueError, match="unknown columns"):
        profiling.profile_table(df, ["nope"])
    with pytest.raises(ValueError, match="distinct_mode"):
        profiling.profile_table(df, ["id"], distinct_mode="bogus")


def test_profile_empty_frame(spark):
    df = spark.createDataFrame([], "id bigint, tag string")
    prof = {r["column"]: r for r in profiling.profile_table(
        df, distinct_mode="exact").collect()}
    r = prof["tag"]
    assert (r.n_rows, r.n_null, r.n_distinct) == (0, 0, 0)
    assert r.min_value is None and r.max_value is None


def test_column_top_values(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",), ("c",)], "tag string")
    top = [(r.value, r.n) for r in
           profiling.column_top_values(df, "tag", k=2).collect()]
    # count desc, value asc on ties
    assert top == [("a", 2), ("b", 2)]


def test_fd_violations_detects_and_clears(spark):
    from dativo_ingest_spark.operators.profiling import fd_violations
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "b", "y"), (4, "b", "z")],
        "id bigint, det string, dep string")
    out = {(r.determinant, r.dependent):
           (r.n_det, r.n_pairs, r.violations, r.is_fd)
           for r in fd_violations(
               df, [("id", "det"), ("det", "dep")]).collect()}
    assert out[("id", "det")] == (4, 4, 0, True)    # key determines all
    assert out[("det", "dep")] == (2, 3, 1, False)  # b -> {y, z}


def test_fd_violations_single_pass_plan_and_validation(spark):
    import pytest as _pytest
    from dativo_ingest_spark.operators.profiling import fd_violations
    df = spark.createDataFrame([(1, "a", "x")],
                               "id bigint, det string, dep string")
    plan = fd_violations(df, [("id", "det"), ("det", "dep")])\
        ._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan  # one widened pass, not per-pair scans
    with _pytest.raises(ValueError):
        fd_violations(df, [])
    with _pytest.raises(ValueError, match="unknown column"):
        fd_violations(df, [("id", "nope")])


class TestPsiDrift:
    def _df(self, spark, vals):
        return spark.createDataFrame([(float(v),) for v in vals],
                                     "v double")

    def test_identical_distributions_score_zero(self, spark):
        from dativo_ingest_spark.operators.profiling import psi_drift

        vals = list(range(1, 101))
        out = psi_drift(self._df(spark, vals), self._df(spark, vals),
                        "v", n_bins=4).collect()
        assert len(out) == 4
        assert all(r.psi_micro == 0 for r in out)
        assert sum(r.n_ref for r in out) == 100

    def test_shifted_distribution_scores_high(self, spark):
        from dativo_ingest_spark.operators.profiling import psi_drift

        ref = self._df(spark, range(1, 101))
        cur = self._df(spark, range(900, 1000))   # all above ref's max
        out = psi_drift(ref, cur, "v", n_bins=4).collect()
        total = sum(r.psi_micro for r in out) / 1e6
        assert total > 0.25   # conventional "shifted" threshold
        by_bin = {r.bin: r for r in out}
        # everything lands in the top bin on the current side
        assert by_bin[3].n_cur == 100
        assert all(by_bin[b].n_cur == 0 for b in (0, 1, 2))

    def test_empty_bins_well_defined(self, spark):
        from dativo_ingest_spark.operators.profiling import psi_drift

        ref = self._df(spark, [1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4])
        cur = self._df(spark, [1, 1])
        out = psi_drift(ref, cur, "v", n_bins=4).collect()
        assert len(out) == 4   # full domain emitted, Laplace-smoothed
        assert all(r.psi_micro is not None for r in out)

    def test_nulls_excluded(self, spark):
        from dativo_ingest_spark.operators.profiling import psi_drift

        ref = spark.createDataFrame(
            [(1.0,), (2.0,), (3.0,), (4.0,), (None,)], "v double")
        out = psi_drift(ref, ref, "v", n_bins=2).collect()
        assert sum(r.n_ref for r in out) == 4
        assert all(r.psi_micro == 0 for r in out)


class TestKsDrift:
    """Exact two-sample KS: Spark must equal a row-by-row Python
    replication of the integer ECDF-gap formula and the IEEE critical
    value."""

    def _reference(self, ref_vals, cur_vals, c_milli=1358):
        import math

        rc = {v: 0 for v in set(ref_vals) | set(cur_vals)}
        cc = dict(rc)
        for v in ref_vals:
            rc[v] += 1
        for v in cur_vals:
            cc[v] += 1
        n, m = len(ref_vals), len(cur_vals)
        cum_r = cum_c = 0
        d_int = 0
        for v in sorted(rc):
            cum_r += rc[v]
            cum_c += cc[v]
            d_int = max(d_int, abs(cum_r * m - cum_c * n))
        d_stat = (d_int * 1000000) // (n * m)
        crit = math.floor(c_milli * 1000.0 * math.sqrt((n + m) / (n * m))
                          + 0.5)
        return n, m, d_stat, crit, d_stat > crit

    def test_matches_integer_reference(self, spark):
        from dativo_ingest_spark.operators.profiling import ks_drift

        ref_vals = [round(0.07 * i, 2) for i in range(200)]
        cur_vals = [round(0.07 * i + 3.0, 2) for i in range(180)]  # shifted
        ref = spark.createDataFrame([("k", v) for v in ref_vals],
                                    "key string, value double")
        cur = spark.createDataFrame([("k", v) for v in cur_vals],
                                    "key string, value double")
        row = ks_drift(ref, cur, ["key"], "value").collect()[0]
        exp = self._reference([round(v * 100) for v in ref_vals],
                              [round(v * 100) for v in cur_vals])
        assert (row.n_ref, row.n_cur, row.d_stat_micro,
                row.crit_micro, row.drift) == exp
        assert row.drift is True

    def test_identical_distributions_not_flagged(self, spark):
        from dativo_ingest_spark.operators.profiling import ks_drift

        vals = [("g", float(i % 50)) for i in range(500)]
        df = spark.createDataFrame(vals, "key string, value double")
        row = ks_drift(df, df, ["key"], "value").collect()[0]
        assert row.d_stat_micro == 0 and row.drift is False

    def test_requires_keys(self, spark):
        import pytest as _pytest

        from dativo_ingest_spark.operators.profiling import ks_drift

        df = spark.createDataFrame([("g", 1.0)], "key string, value double")
        with _pytest.raises(ValueError, match="key_cols"):
            ks_drift(df, df, [], "value")


class TestDatasetCard:
    def test_hand_computed_card(self, spark):
        from dativo_ingest_spark.operators.profiling import dataset_card

        rows = [
            (1, "the cat sat", "en"),
            (2, "the cat sat", "en"),          # exact dup of 1
            (3, "reach me at bob@example.com ok", "en"),
            (4, "hola mundo", "es"),
            (5, None, "en"),                   # null text -> 0 words
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string, "
                                         "lang string")
        got = {r.metric: r.value for r in dataset_card(
            df, "doc_id", "text", lang_col="lang").collect()}
        assert got["n_docs"] == 5
        assert got["total_words"] == 3 + 3 + 5 + 2 + 0
        assert got["vocab_size"] == len(
            {"the", "cat", "sat", "reach", "me", "at",
             "bob@example.com", "ok", "hola", "mundo"})
        assert got["dup_docs"] == 2          # docs 1 and 2 share content
        assert got["docs_with_email"] == 1
        assert got["n_langs"] == 2
        # words per doc: [3,3,5,2,0] -> median 3 -> x2 = 6
        assert got["median_words_x2"] == 6

    def test_without_lang(self, spark):
        from dativo_ingest_spark.operators.profiling import dataset_card

        df = spark.createDataFrame([(1, "a b")], "doc_id bigint, "
                                                 "text string")
        got = {r.metric for r in dataset_card(
            df, "doc_id", "text").collect()}
        assert "n_langs" not in got and "n_docs" in got


class TestBenfordCheck:
    def test_benford_series_conforms(self, spark):
        from dativo_ingest_spark.operators.profiling import benford_check

        # powers of a multiplicative process follow Benford closely
        vals = [(1.05 ** i,) for i in range(600)]
        df = spark.createDataFrame(vals, "v double")
        out = {r.digit: r for r in benford_check(df, "v").collect()}
        assert set(out) == set(range(1, 10))
        assert sum(r.n_obs for r in out.values()) == 600
        # digit 1 leads and observed shares sit near expected
        assert out[1].n_obs == max(r.n_obs for r in out.values())
        assert all(r.dev_micro < 40000 for r in out.values())

    def test_uniform_data_deviates(self, spark):
        from dativo_ingest_spark.operators.profiling import benford_check

        # uniform 100..999 cents: every first digit ~equally likely —
        # digit 1's observed share must fall far below Benford's 30.1%
        df = spark.createDataFrame([(float(v) / 100,)
                                    for v in range(100, 1000)],
                                   "v double")
        out = {r.digit: r for r in benford_check(df, "v").collect()}
        assert out[1].dev_micro > 150000
        # exact share check: 100 of 900 values lead with each digit
        assert out[1].obs_micro == (100 * 1000000) // 900

    def test_missing_digits_still_report(self, spark):
        from dativo_ingest_spark.operators.profiling import benford_check

        # values leading only with 1 and 2: digits 3..9 never occur —
        # the strongest possible Benford anomaly. They must appear as
        # n_obs = 0 with dev_micro = expected_micro, not vanish.
        df = spark.createDataFrame(
            [(1.0,)] * 30 + [(2.5,)] * 10, "v double")
        out = {r.digit: r for r in benford_check(df, "v").collect()}
        assert set(out) == set(range(1, 10))
        for d in range(3, 10):
            assert out[d].n_obs == 0
            assert out[d].obs_micro == 0
            assert out[d].dev_micro == out[d].expected_micro
        assert out[1].n_obs == 30 and out[2].n_obs == 10
        assert out[1].obs_micro == (30 * 1000000) // 40


class TestGiniConcentration:
    def test_even_and_concentrated(self, spark):
        from dativo_ingest_spark.operators.profiling import (
            gini_concentration)

        even = spark.createDataFrame(
            [(f"s{i}", 100) for i in range(10)], "src string, w bigint")
        r = gini_concentration(even, "src", "w").collect()[0]
        assert (r.n_groups, r.total_weight, r.gini_micro) == (10, 1000, 0)

        # one group holds ~everything: Gini -> (n-1)/n
        conc = spark.createDataFrame(
            [("big", 10_000)] + [(f"s{i}", 1) for i in range(9)],
            "src string, w bigint")
        r2 = gini_concentration(conc, "src", "w").collect()[0]
        assert r2.gini_micro > 880_000

    def test_hand_computed(self, spark):
        from dativo_ingest_spark.operators.profiling import (
            gini_concentration)

        # weights sorted ascending: [1, 2, 3, 4]; S=10, W=1+4+9+16=30
        # gini = (60 - 5*10) / 40 = 0.25
        df = spark.createDataFrame(
            [("a", 4), ("b", 1), ("c", 3), ("d", 2)],
            "src string, w bigint")
        r = gini_concentration(df, "src", "w").collect()[0]
        assert r.gini_micro == 250000
        # zero total weight: NULL gini, not a crash
        z = spark.createDataFrame([("a", 0), ("b", 0)],
                                  "src string, w bigint")
        rz = gini_concentration(z, "src", "w").collect()[0]
        assert rz.gini_micro is None
