"""Data-quality expectations engine (operators/quality.py): single-pass
evaluation semantics + the runner gate the reference never built (it parses
data_quality, config.py:137-142, and drops it)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from dativo_ingest_spark import runner
from dativo_ingest_spark.config.contracts import ConfigError, JobConfig
from dativo_ingest_spark.operators import quality
from dativo_ingest_spark.queries import load

from tests.test_runner import job_dict

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def frame(spark):
    rows = [
        (1, "alice", "a@x.com", 10.0),
        (2, "bob", "b@x.com", 20.0),
        (3, None, "c@x.com", 999.0),
        (3, "dora", "not-an-email", -5.0),
    ]
    return spark.createDataFrame(
        rows, "id long, name string, email string, score double")


def _by_name(results):
    return {r.name: r for r in results}


def test_every_kind_in_one_pass(frame):
    got = _by_name(quality.run_expectations(frame, [
        {"type": "not_null", "column": "name"},
        {"type": "unique", "column": "id"},
        {"type": "accepted_values", "column": "name",
         "values": ["alice", "bob", "carol"]},
        {"type": "range", "column": "score", "min": 0, "max": 100},
        {"type": "regex", "column": "email", "pattern": r"^[^@]+@[^@]+$"},
        {"type": "row_count_min", "min": 10},
        {"type": "expression", "expression": "score >= 0 OR name IS NULL",
         "name": "score_or_anon"},
    ]))
    assert got["not_null_name"].failed == 1
    assert got["unique_id"].failed == 1          # one duplicated id
    assert got["accepted_values_name"].failed == 1   # dora (NULL not counted)
    assert got["range_score"].failed == 2        # 999 and -5
    assert got["regex_email"].failed == 1
    assert got["row_count_min_5"].failed == 6    # 10 - 4 rows
    assert got["score_or_anon"].failed == 1      # dora: -5 and named
    assert all(r.total == 4 for r in got.values())


def test_passing_set_and_report_df(spark, frame):
    results = quality.run_expectations(frame, [
        {"type": "range", "column": "id", "min": 0},
        {"type": "row_count_min", "min": 2},
    ])
    assert all(r.passed for r in results)
    rep = quality.report_df(spark, results)
    assert rep.count() == 2
    assert {r["passed"] for r in rep.collect()} == {True}


def test_malformed_expectations_raise(frame):
    for bad in (
        {"type": "not_null"},                       # no column
        {"type": "accepted_values", "column": "x", "values": []},
        {"type": "range", "column": "x"},           # no bounds
        {"type": "regex", "column": "x"},           # no pattern
        {"type": "expression"},                     # no expression
        {"type": "no_such_kind", "column": "x"},
    ):
        with pytest.raises(ConfigError):
            quality.run_expectations(frame, [bad])


def test_approx_unique_path(frame):
    exact = quality.run_expectations(
        frame, [{"type": "unique", "column": "id"}])
    approx = quality.run_expectations(
        frame, [{"type": "unique", "column": "id"}], approx_unique=True)
    assert exact[0].failed == 1
    # tiny frame: HLL is exact here; the point is the path runs
    assert approx[0].failed == 1


# --- runner integration -----------------------------------------------------

def _with_dq(doc, expectations):
    doc["asset"]["data_quality"] = {"expectations": expectations}
    return doc


def test_runner_warn_mode_downgrades_to_partial(spark, tmp_path):
    p = tmp_path / "ok.csv"
    p.write_text("id,name,active\n1,alice,true\n2,alice,false\n")
    out = str(tmp_path / "out")
    doc = _with_dq(job_dict(str(p), out, mode="warn"),
                   [{"type": "unique", "column": "name"}])
    res = runner.run_job(spark, JobConfig.from_dict(doc))
    assert res.exit_code == runner.EXIT_PARTIAL
    assert res.records_invalid == 0              # rows were all valid...
    assert res.dq_report and not res.dq_report[0]["passed"]  # ...dq failed
    assert os.path.exists(out)                   # warn mode still writes


def test_runner_strict_mode_aborts_before_publish(spark, tmp_path):
    p = tmp_path / "ok.csv"
    p.write_text("id,name,active\n1,alice,true\n2,alice,false\n")
    out = str(tmp_path / "out")
    doc = _with_dq(job_dict(str(p), out),
                   [{"type": "unique", "column": "name"},
                    {"type": "not_null", "column": "name"}])
    res = runner.run_job(spark, JobConfig.from_dict(doc))
    assert res.exit_code == runner.EXIT_FAILURE
    assert not os.path.exists(os.path.join(out, "_dativo_properties.json"))
    # report carries the failing expectation; the passing one is green
    rep = {e["name"]: e for e in res.dq_report}
    assert not rep["unique_name"]["passed"]
    assert rep["not_null_name"]["passed"]
    assert res.error_sample and res.error_sample[0]["name"] == "unique_name"


def test_runner_green_expectations_stay_success(spark, tmp_path):
    p = tmp_path / "ok.csv"
    p.write_text("id,name,active\n1,alice,true\n2,bob,false\n")
    out = str(tmp_path / "out")
    doc = _with_dq(job_dict(str(p), out),
                   [{"type": "unique", "column": "id"},
                    {"type": "not_null", "column": "name"},
                    {"type": "row_count_min", "min": 1}])
    res = runner.run_job(spark, JobConfig.from_dict(doc))
    assert res.exit_code == runner.EXIT_SUCCESS
    assert all(e["passed"] for e in res.dq_report)


def test_mostly_tolerance(frame):
    strictr = quality.run_expectations(
        frame, [{"type": "not_null", "column": "name"}])
    tolerant = quality.run_expectations(
        frame, [{"type": "not_null", "column": "name", "mostly": 0.7}])
    assert not strictr[0].passed           # 1 of 4 null
    assert tolerant[0].passed              # 25% <= 30% allowed
    tight = quality.run_expectations(
        frame, [{"type": "not_null", "column": "name", "mostly": 0.8}])
    assert not tight[0].passed             # 25% > 20% allowed


def test_freshness_against_literal_as_of(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-01 23:00:00",)],
        "ts string").selectExpr("CAST(ts AS TIMESTAMP) AS ts")
    fresh = quality.run_expectations(df, [
        {"type": "freshness", "column": "ts", "max_age": "2 hours",
         "as_of": "2024-01-02T00:00:00"}])
    assert fresh[0].passed                 # newest is 1h before as_of
    stale = quality.run_expectations(df, [
        {"type": "freshness", "column": "ts", "max_age": "30 minutes",
         "as_of": "2024-01-02T00:00:00"}])
    assert not stale[0].passed
    with pytest.raises(ConfigError):
        quality.run_expectations(df, [
            {"type": "freshness", "column": "ts", "max_age": "soon",
             "as_of": "2024-01-02T00:00:00"}])
    with pytest.raises(ConfigError):       # as_of required: no wall clock
        quality.run_expectations(df, [
            {"type": "freshness", "column": "ts", "max_age": "2 hours"}])


def test_expression_null_is_violation(spark):
    # score IS NULL makes `score > 0` evaluate to NULL — three-valued
    # logic must count that as a violation, not a silent pass
    df = spark.createDataFrame([(1, 5.0), (2, None)], "id long, score double")
    got = quality.run_expectations(
        df, [{"type": "expression", "expression": "score > 0"}])
    assert got[0].failed == 1


# --- quantile clipping ---------------------------------------------------

def test_quantile_bounds_match_exact_quantiles(spark):
    import duckdb

    docs = load(spark, SF, "documents")
    lens = docs.select(F.length("text").alias("n"))
    got = quality.quantile_bounds(lens, ["n"], 0.05, 0.95, accuracy=100_000)
    lo, hi = got["n"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exact_lo, exact_hi = con.execute(
        "SELECT quantile_disc(length(text), 0.05), "
        "quantile_disc(length(text), 0.95) FROM documents").fetchone()
    # percentile_approx at high accuracy lands on (or next to) the exact
    # discrete quantile for a 500-row frame
    span = exact_hi - exact_lo
    assert abs(lo - exact_lo) <= 0.02 * span
    assert abs(hi - exact_hi) <= 0.02 * span


def test_quantile_clip_filters_tails_and_keeps_nulls(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)] + [(None,)], "x double")
    clipped, bounds = quality.quantile_clip(
        df, ["x"], 0.10, 0.90, accuracy=100_000)
    lo, hi = bounds["x"]
    assert 5 <= lo <= 15 and 85 <= hi <= 95
    vals = [r.x for r in clipped.collect()]
    assert None in vals  # keep_nulls default
    assert all(lo <= v <= hi for v in vals if v is not None)
    dropped, _ = quality.quantile_clip(
        df, ["x"], 0.10, 0.90, accuracy=100_000, keep_nulls=False)
    assert all(r.x is not None for r in dropped.collect())


def test_apply_bounds_is_reusable_and_literal(spark):
    docs = load(spark, SF, "documents")
    lens = docs.select("doc_id", F.length("text").alias("n"))
    bounds = quality.quantile_bounds(lens, ["n"], 0.1, 0.9)
    a = {r.doc_id for r in quality.apply_bounds(lens, bounds).collect()}
    # re-applying the SAME persisted bounds to a differently-laid-out frame
    # admits the identical row set (train/serve consistency)
    b = {r.doc_id for r in
         quality.apply_bounds(lens.repartition(7), bounds).collect()}
    assert a == b and a
    # all-NULL column at fit time -> None bound -> no filtering on it
    nulls = lens.withColumn("z", F.lit(None).cast("double"))
    nb = quality.quantile_bounds(nulls, ["z"])
    assert nb["z"] is None
    assert quality.apply_bounds(nulls, nb).count() == nulls.count()


def test_quantile_bounds_validation():
    import pytest
    from dativo_ingest_spark.config.contracts import ConfigError

    with pytest.raises(ConfigError):
        quality.quantile_bounds(None, [])
    with pytest.raises(ConfigError):
        quality.quantile_bounds(None, ["x"], lower=0.9, upper=0.1)


class TestMadOutliers:
    def test_planted_outlier_flagged(self, spark):
        from dativo_ingest_spark.operators.quality import mad_outliers

        rows = [("a", v) for v in [10, 11, 12, 13, 14]] + [("a", 1000)] \
            + [("b", v) for v in [5, 5, 5, 6, 6]]
        df = spark.createDataFrame(rows, "k string, x long")
        out = mad_outliers(df, "x", keys=["k"], k=3.0)
        flagged = {(r.k, r.x) for r in out.collect() if r._is_outlier}
        # group b is the documented MAD=0 degeneracy: a majority sits ON
        # the median, so any deviating value exceeds k*0 and flags
        assert flagged == {("a", 1000), ("b", 6)}
        stats = {(r.k): (r._med, r._mad) for r in out.collect()}
        assert stats["a"] == (12.5, 1.5)   # median of 6 values interpolates
        assert stats["b"] == (5.0, 0.0)

    def test_keyless_global_median(self, spark):
        from dativo_ingest_spark.operators.quality import mad_outliers

        df = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 100]],
                                   "x long")
        out = mad_outliers(df, "x", k=3.0).collect()
        assert sum(r._is_outlier for r in out) == 1
        assert all(r._med == 3.0 for r in out)

    def test_approx_path_same_shape(self, spark):
        from dativo_ingest_spark.operators.quality import mad_outliers

        df = spark.createDataFrame(
            [("a", float(v)) for v in range(100)] + [("a", 1e6)],
            "k string, x double")
        out = mad_outliers(df, "x", keys=["k"], k=3.0, exact=False)
        flagged = [r.x for r in out.collect() if r._is_outlier]
        assert flagged == [1e6]


class TestRollingZscore:
    def _scored(self, spark, values, lookback=4, min_n=3):
        rows = [(1, i, int(v)) for i, v in enumerate(values)]
        df = spark.createDataFrame(rows, "uid bigint, t bigint, x bigint")
        return quality.rolling_zscore(
            df, "x", keys=["uid"], order_cols=["t"],
            lookback=lookback, min_n=min_n).orderBy("t").collect()

    def test_spike_scores_against_past_only(self, spark):
        # stable baseline then a spike: the spike's own value must not
        # contaminate its baseline (frame ends at 1 PRECEDING)
        out = self._scored(spark, [10, 12, 11, 13, 1000])
        spike = out[-1]
        assert spike._win_n == 4
        # mean=11.5, std~1.29 -> z ~ 765; micro-units
        assert spike.z_micro > 100_000_000

    def test_short_and_zero_variance_frames_are_null(self, spark):
        out = self._scored(spark, [5, 5, 5, 5, 7])
        # first min_n rows: frame too short -> NULL
        assert all(r.z_micro is None for r in out[:3])
        # frame full but zero variance -> NULL, not inf/nan
        assert out[4]._win_n == 4 and out[4].z_micro is None

    def test_matches_closed_form(self, spark):
        vals = [3, 9, 4, 8, 6]
        out = self._scored(spark, vals)
        import statistics
        s = vals[:4]
        z = (vals[4] - statistics.mean(s)) / statistics.stdev(s)
        import math
        assert out[4].z_micro == math.floor(1e6 * z + 0.5)

    def test_key_isolation_and_layout_invariance(self, spark):
        rows = [(u, i, (u + 1) * i) for u in (1, 2) for i in range(8)]
        df = spark.createDataFrame(rows, "uid bigint, t bigint, x bigint")
        a = {(r.uid, r.t): r.z_micro for r in quality.rolling_zscore(
            df, "x", ["uid"], ["t"], lookback=4, min_n=3).collect()}
        b = {(r.uid, r.t): r.z_micro for r in quality.rolling_zscore(
            df.repartition(7), "x", ["uid"], ["t"],
            lookback=4, min_n=3).collect()}
        assert a == b

    def test_validates_params(self, spark):
        df = spark.createDataFrame([(1, 1, 1)],
                                   "uid bigint, t bigint, x bigint")
        with pytest.raises(ValueError):
            quality.rolling_zscore(df, "x", ["uid"], ["t"], lookback=1)


class TestEquiDepthBins:
    def test_fit_and_apply_quartiles(self, spark):
        df = spark.createDataFrame([(v,) for v in range(1, 9)], "x bigint")
        edges = quality.equi_depth_edges(df, "x", n_bins=4)
        # 1..8 quartiles: interpolated exact [2.75, 4.5, 6.25]
        assert edges == [2.75, 4.5, 6.25]
        out = {r.x: r.bin for r in
               quality.apply_equi_depth_bins(df, "x", edges).collect()}
        assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 3, 8: 3}

    def test_edges_reusable_on_new_batch_and_nulls(self, spark):
        df = spark.createDataFrame([(v,) for v in range(1, 9)], "x bigint")
        edges = quality.equi_depth_edges(df, "x", n_bins=4)
        batch = spark.createDataFrame([(0,), (100,), (None,)], "x bigint")
        out = [r.bin for r in
               quality.apply_equi_depth_bins(batch, "x", edges)
               .orderBy(F.col("x").asc_nulls_last()).collect()]
        assert out == [0, 3, None]

    def test_validates(self, spark):
        df = spark.createDataFrame([(1,)], "x bigint")
        with pytest.raises(ValueError):
            quality.equi_depth_edges(df, "x", n_bins=1)


class TestWeightedMedian:
    def test_length_biased_vs_plain_median(self, spark):
        from dativo_ingest_spark.operators.quality import weighted_median

        # 9 short docs (len 10) + 1 book (len 910): plain median 10,
        # weighted median = the book (half the bytes live in it)
        rows = [("en", 10, 10)] * 9 + [("en", 910, 910)]
        df = spark.createDataFrame(rows, "lang string, v long, w long")
        out = weighted_median(df, "lang", "v", "w").collect()
        assert len(out) == 1
        assert out[0].weighted_median == 910
        assert out[0].total_weight == 1000

    def test_exact_half_boundary_takes_lower_value(self, spark):
        from dativo_ingest_spark.operators.quality import weighted_median

        df = spark.createDataFrame(
            [("a", 1, 5), ("a", 2, 5)], "k string, v long, w long")
        out = weighted_median(df, "k", "v", "w").collect()
        assert out[0].weighted_median == 1   # 2*5 >= 10 at v=1

    def test_nonpositive_and_null_weights_excluded(self, spark):
        from dativo_ingest_spark.operators.quality import weighted_median

        df = spark.createDataFrame(
            [("a", 1, None), ("a", 2, 0), ("a", 3, -4), ("a", 4, 7),
             ("b", 9, None)],
            "k string, v long, w long")
        out = {r.key: r.weighted_median
               for r in weighted_median(df, "k", "v", "w").collect()}
        assert out == {"a": 4}   # key b omitted entirely

    def test_weighted_median_matches_python_reference_randomized(
            self, spark):
        import random

        def py_wmedian(pairs):
            agg = {}
            for v, w in pairs:
                if w and w > 0:
                    agg[v] = agg.get(v, 0) + w
            if not agg:
                return None
            total = sum(agg.values())
            cum = 0
            for v in sorted(agg):
                cum += agg[v]
                if 2 * cum >= total:
                    return v

        rng = random.Random(99)
        rows, want = [], {}
        for g in range(25):
            pairs = [(rng.randrange(0, 50),
                      rng.choice([None, 0, -2] + list(range(1, 9))))
                     for _ in range(rng.randrange(1, 40))]
            rows += [(f"g{g}", v, w) for v, w in pairs]
            m = py_wmedian(pairs)
            if m is not None:
                want[f"g{g}"] = m
        from dativo_ingest_spark.operators.quality import weighted_median

        df = spark.createDataFrame(rows, "k string, v long, w long")
        got = {r.key: r.weighted_median
               for r in weighted_median(df, "k", "v", "w").collect()}
        assert got == want


class TestJoinFanoutCheck:
    def test_contracts_and_violations(self, spark):
        from dativo_ingest_spark.operators.quality import join_fanout_check

        dim = spark.createDataFrame(
            [(1, "a"), (2, "b"), (2, "b2"), (3, "c")], "k bigint, v string")
        fact = spark.createDataFrame(
            [(1, 10), (1, 11), (2, 20), (9, 90)], "k bigint, x bigint")
        # one_to_many: dim key 2 is duplicated AND joins facts -> flagged;
        # key 3 is duplicated-free; key 9 has no dim row (not this check's
        # concern — referential integrity is a different contract)
        out = join_fanout_check(dim, fact, ["k"]).collect()
        assert [(r.k, r.left_rows, r.right_rows, r.violation)
                for r in out] == [(2, 2, 1, "left")]
        # one_to_one flags the fact side too
        o2o = {(r.k, r.violation) for r in join_fanout_check(
            dim, fact, ["k"], expect="one_to_one").collect()}
        assert o2o == {(1, "right"), (2, "left")}
        # many_to_one with a clean right side: empty
        assert join_fanout_check(
            fact, dim.dropDuplicates(["k"]), ["k"],
            expect="many_to_one").count() == 0

    def test_validation(self, spark):
        import pytest as _pytest

        from dativo_ingest_spark.operators.quality import join_fanout_check

        df = spark.createDataFrame([(1,)], "k bigint")
        with _pytest.raises(ValueError, match="expect"):
            join_fanout_check(df, df, ["k"], expect="whatever")
        with _pytest.raises(ValueError, match="keys"):
            join_fanout_check(df, df, [])


class TestReferentialCheck:
    def test_orphans_and_null_keys(self, spark):
        from dativo_ingest_spark.operators.quality import referential_check

        dim = spark.createDataFrame([(1,), (2,)], "k bigint")
        fact = spark.createDataFrame(
            [(1, "a"), (1, "b"), (9, "x"), (9, "y"), (9, "z"),
             (None, "n")], "k bigint, v string")
        out = {(r.k, r.orphan_rows) for r in
               referential_check(fact, dim, ["k"]).collect()}
        assert out == {(9, 3), (None, 1)}
        # clean fact: empty
        clean = fact.filter("k = 1")
        assert referential_check(clean, dim, ["k"]).count() == 0
        import pytest as _pytest
        with _pytest.raises(ValueError, match="keys"):
            referential_check(fact, dim, [])
