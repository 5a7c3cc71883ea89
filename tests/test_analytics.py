"""Product-analytics operators: funnel ordering/deadline semantics and
cohort retention bucketing."""

from __future__ import annotations

import datetime as dt

import pytest

from dativo_ingest_spark.operators import analytics


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, h), t) for u, d, h, t in rows],
        "user_id long, ts timestamp, event_type string")


class TestFunnel:
    def test_ordering_is_enforced(self, spark):
        rows = [
            (1, 1, 0, "view"), (1, 2, 0, "click"), (1, 3, 0, "purchase"),
            # user 2 clicks BEFORE viewing: counts for view only
            (2, 5, 0, "click"), (2, 6, 0, "view"),
            # user 3 never views
            (3, 1, 0, "purchase"),
        ]
        out = {r.step: r.n_users for r in analytics.funnel_steps(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"]).collect()}
        assert out == {"view": 2, "click": 1, "purchase": 1}

    def test_deadline_window(self, spark):
        rows = [
            (1, 1, 0, "view"), (1, 2, 0, "click"),      # in time
            (2, 1, 0, "view"), (2, 20, 0, "click"),     # 19 days later
        ]
        out = {r.step: r.n_users for r in analytics.funnel_steps(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click"], within_days=7).collect()}
        assert out == {"view": 2, "click": 1}
        loose = {r.step: r.n_users for r in analytics.funnel_steps(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click"]).collect()}
        assert loose == {"view": 2, "click": 2}

    def test_first_occurrence_anchor(self, spark):
        # the FIRST view anchors the chain: a click before it does not
        # count, a later second view cannot resurrect the user
        rows = [
            (1, 2, 0, "click"), (1, 3, 0, "view"), (1, 5, 0, "view"),
        ]
        out = {r.step: r.n_users for r in analytics.funnel_steps(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click"]).collect()}
        assert out == {"view": 1, "click": 0}

    def test_counts_non_increasing_and_validation(self, spark):
        rows = [(u, d, 0, t) for u in range(1, 6)
                for d, t in [(1, "view"), (2, "click"), (3, "purchase")]
                if not (u == 3 and t == "purchase")]
        res = sorted(analytics.funnel_steps(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"]).collect(),
            key=lambda r: r.step_index)
        counts = [r.n_users for r in res]
        assert counts == sorted(counts, reverse=True) == [5, 5, 4]
        with pytest.raises(ValueError):
            analytics.funnel_steps(_ev(spark, rows), "user_id", "ts",
                                   "event_type", ["view"])
        with pytest.raises(ValueError):
            analytics.funnel_steps(_ev(spark, rows), "user_id", "ts",
                                   "event_type", ["view", "click"],
                                   within_days=0)


class TestCohortRetention:
    def test_offsets_and_cohort_sizes(self, spark):
        # week buckets of Jan 2024: the 1st..4th are one UTC week bucket,
        # 8th..10th the next. user 1 active weeks 0 and 1; user 2 only
        # week 0; user 3 first seen week 1.
        rows = [
            (1, 1, 0, "view"), (1, 8, 0, "view"),
            (2, 2, 0, "view"),
            (3, 9, 0, "view"), (3, 10, 0, "view"),
        ]
        out = {(r.cohort_bucket, r.offset): r.n_users
               for r in analytics.cohort_retention(
                   _ev(spark, rows), "user_id", "ts",
                   bucket_days=7).collect()}
        w0 = dt.datetime(2024, 1, 1).timestamp() * 1e6 // (7 * 86400e6)
        w0 = int(w0)
        assert out[(w0, 0)] == 2          # cohort week 0 size
        assert out[(w0, 1)] == 1          # user 1 retained
        assert out[(w0 + 1, 0)] == 1      # user 3's cohort
        assert len(out) == 3
        with pytest.raises(ValueError):
            analytics.cohort_retention(_ev(spark, rows), "user_id", "ts",
                                       bucket_days=0)

    def test_multiple_events_one_bucket_count_once(self, spark):
        rows = [(1, 1, h, "view") for h in range(5)]
        out = analytics.cohort_retention(
            _ev(spark, rows), "user_id", "ts", bucket_days=7).collect()
        assert len(out) == 1 and out[0].n_users == 1 and out[0].offset == 0


def _ev_val(spark, rows):
    # (user, day, hour, type, value)
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, h), t, float(v))
         for u, d, h, t, v in rows],
        "user_id long, ts timestamp, event_type string, value double")


class TestLastTouchAttribution:
    def _run(self, spark, rows, within="72 hours"):
        out = analytics.attribute_last_touch(
            _ev_val(spark, rows), "user_id", "ts", "event_type", "value",
            conversion="purchase", touch_types=["view", "click"],
            within=within)
        return {(r.user, r.ts): (r.touch_type, r.touch_ts)
                for r in out.collect()}

    def test_most_recent_preceding_touch_wins(self, spark):
        rows = [
            (1, 1, 0, "view", 0), (1, 1, 6, "click", 0),
            (1, 2, 0, "purchase", 10),
        ]
        got = self._run(spark, rows)
        assert got[(1, dt.datetime(2024, 1, 2))] == (
            "click", dt.datetime(2024, 1, 1, 6))

    def test_no_touch_goes_to_none_channel(self, spark):
        rows = [(1, 2, 0, "purchase", 10)]
        got = self._run(spark, rows)
        assert got[(1, dt.datetime(2024, 1, 2))] == ("none", None)

    def test_tolerance_expires_old_touches(self, spark):
        rows = [
            (1, 1, 0, "view", 0), (1, 10, 0, "purchase", 10),
            (2, 9, 0, "view", 0), (2, 10, 0, "purchase", 10),
        ]
        got = self._run(spark, rows)
        assert got[(1, dt.datetime(2024, 1, 10))][0] == "none"
        assert got[(2, dt.datetime(2024, 1, 10))][0] == "view"

    def test_later_touch_never_attributes(self, spark):
        rows = [(1, 2, 0, "purchase", 10), (1, 3, 0, "click", 0)]
        got = self._run(spark, rows)
        assert got[(1, dt.datetime(2024, 1, 2))][0] == "none"

    def test_same_timestamp_touch_collapses_deterministically(self, spark):
        # view and click at the same instant as each other: the
        # lexicographically greatest type (view) is credited — and a
        # touch AT the conversion instant attributes (inclusive as-of)
        rows = [
            (1, 1, 0, "view", 0), (1, 1, 0, "click", 0),
            (1, 1, 0, "purchase", 5),
        ]
        got = self._run(spark, rows)
        assert got[(1, dt.datetime(2024, 1, 1))][0] == "view"

    def test_conversion_type_cannot_be_touch(self, spark):
        with pytest.raises(ValueError):
            analytics.attribute_last_touch(
                _ev_val(spark, [(1, 1, 0, "purchase", 1)]),
                "user_id", "ts", "event_type", "value",
                conversion="purchase", touch_types=["purchase"])


class TestCusumChangepoints:
    def _run(self, spark, rows):
        import datetime as dt

        df = spark.createDataFrame(
            [(k, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), v)
             for k, d, v in rows],
            "event_type string, ts timestamp, value double")
        out = analytics.cusum_changepoints(
            df, "event_type", "ts", "value")
        return {(r.key, r.bucket): (r.cents, r.cusum_pos, r.cusum_neg,
                                    r.flagged)
                for r in out.collect()}

    def test_flat_series_never_flags(self, spark):
        got = self._run(spark, [("a", d, 10.0) for d in range(10)])
        assert all(v == (1000, 0, 0, False) for v in got.values())

    def test_level_shift_raises_positive_cusum(self, spark):
        rows = [("a", d, 10.0) for d in range(10)] + [
            ("a", 10 + d, 100.0) for d in range(10)]
        got = self._run(spark, rows)
        buckets = sorted(b for (_, b) in got)
        pos = [got[("a", b)][1] for b in buckets]
        # cusum climbs monotonically through the post-shift regime
        assert pos[-1] > pos[12] > pos[10] >= 0
        assert got[("a", buckets[-1])][3]  # flagged at the tail

    def test_matches_reference_recursion(self, spark):
        # the closed form must equal the textbook max(0, S + dev) fold
        vals = [5.0, 5.0, 30.0, 5.0, 5.0, 50.0, 5.0, 1.0]
        got = self._run(spark, [("a", d, v) for d, v in enumerate(vals)])
        cents = [int(v * 100) for v in vals]
        n, t = len(cents), sum(cents)
        s_pos = s_neg = 0
        for d, x in enumerate(cents):
            dev = x * n - t
            s_pos = max(0, s_pos + dev)
            s_neg = max(0, s_neg - dev)
            b = sorted(bb for (_, bb) in got)[d]
            assert got[("a", b)][1] == s_pos
            assert got[("a", b)][2] == s_neg

    def test_first_bucket_positive_deviation_counts(self, spark):
        # regression: the running min must include the empty-prefix 0
        got = self._run(spark, [("a", 0, 100.0), ("a", 1, 1.0),
                                ("a", 2, 1.0)])
        first = min(b for (_, b) in got)
        assert got[("a", first)][1] > 0

    def test_keys_independent(self, spark):
        rows = ([("a", d, 10.0) for d in range(5)]
                + [("b", d, float(d * d)) for d in range(5)])
        got = self._run(spark, rows)
        a_vals = [got[("a", b)] for (k, b) in got if k == "a"]
        assert all(v[1] == 0 and v[2] == 0 for v in a_vals)


class TestParetoClasses:
    def test_classic_80_15_5(self, spark):
        # one dominant key (80), one mid (15), three tail (5 total)
        rows = [("big", 80), ("mid", 15), ("t1", 2), ("t2", 2), ("t3", 1)]
        df = spark.createDataFrame(rows, "k string, v long")
        got = {r.key: (r.rank, r.abc_class) for r in
               analytics.pareto_classes(df, "k", "v").collect()}
        assert got["big"] == (1, "A")
        assert got["mid"] == (2, "B")
        assert got["t1"][1] == "C" and got["t3"][1] == "C"

    def test_boundary_crosser_completes_the_class(self, spark):
        # cumulative before key2 is 50% < 80 -> key2 (reaching 100%) is A?
        # no: before key2 = 50 < 80 -> A; before key3 would be 100 -> C
        df = spark.createDataFrame(
            [("k1", 50), ("k2", 50)], "k string, v long")
        got = {r.key: r.abc_class for r in
               analytics.pareto_classes(df, "k", "v").collect()}
        assert got == {"k1": "A", "k2": "A"}

    def test_pre_aggregates_duplicate_keys_and_validates(self, spark):
        df = spark.createDataFrame(
            [("a", 10), ("a", 10), ("b", 1)], "k string, v long")
        got = {r.key: r.value for r in
               analytics.pareto_classes(df, "k", "v").collect()}
        assert got == {"a": 20, "b": 1}
        import pytest as _pytest

        with _pytest.raises(ValueError):
            analytics.pareto_classes(df, "k", "v", bounds=(95, 80))


class TestGroupedTopk:
    def test_matches_window_formulation(self, spark):
        import random

        rng = random.Random(5)
        rows = [(f"k{rng.randrange(4)}", rng.randrange(1000), i)
                for i in range(500)]
        df = spark.createDataFrame(rows, "key string, v long, pid long")
        got = sorted(
            (r.key, r.rank, r.v, r.pid)
            for r in analytics.grouped_topk(
                df, "key", "v", ["pid"], k=5).collect())
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        w = Window.partitionBy("key").orderBy(
            F.col("v").desc(), F.col("pid"))
        want = sorted(
            (r.key, r.rn, r.v, r.pid)
            for r in df.withColumn("rn", F.row_number().over(w))
            .filter("rn <= 5").selectExpr(
                "key", "CAST(rn AS LONG) AS rn", "v", "pid").collect())
        assert got == want

    def test_shard_count_invariant(self, spark):
        rows = [("a", i % 7, i) for i in range(100)]
        df = spark.createDataFrame(rows, "key string, v long, pid long")
        base = sorted(tuple(r) for r in analytics.grouped_topk(
            df, "key", "v", ["pid"], k=3, n_shards=1).collect())
        for ns in (4, 64):
            got = sorted(tuple(r) for r in analytics.grouped_topk(
                df, "key", "v", ["pid"], k=3, n_shards=ns).collect())
            assert got == base

    def test_ascending_and_validation(self, spark):
        df = spark.createDataFrame(
            [("a", 5, 1), ("a", 1, 2), ("a", 3, 3)],
            "key string, v long, pid long")
        got = [(r.rank, r.v) for r in analytics.grouped_topk(
            df, "key", "v", ["pid"], k=2, ascending=True)
            .orderBy("rank").collect()]
        assert got == [(1, 1), (2, 3)]
        import pytest as _pytest

        for bad in (dict(k=0), dict(k=1, n_shards=0),
                    dict(k=1, payload_cols=[])):
            with _pytest.raises(ValueError):
                analytics.grouped_topk(
                    df, "key", "v",
                    bad.pop("payload_cols", ["pid"]), **bad)


class TestAbProportionTest:
    def test_matches_hand_computation(self, spark):
        import math

        from dativo_ingest_spark.operators.analytics import (
            ab_proportion_test)

        # A: 30/100 convert; B: 45/100 convert -> clearly significant
        rows = ([("A", 1)] * 30 + [("A", 0)] * 70
                + [("B", 1)] * 45 + [("B", 0)] * 55)
        df = spark.createDataFrame(rows, "variant string, success int")
        r = ab_proportion_test(df, "variant", "success").collect()[0]
        p = 75 / 200
        se = math.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
        z = (0.30 - 0.45) / se
        assert (r.n_a, r.s_a, r.n_b, r.s_b) == (100, 30, 100, 45)
        assert r.z_micro == math.floor(z * 1e6 + 0.5)
        assert r.significant is True and r.z_micro < 0

    def test_identical_rates_not_significant(self, spark):
        from dativo_ingest_spark.operators.analytics import (
            ab_proportion_test)

        rows = [(v, int(i % 5 == 0)) for v in ("A", "B")
                for i in range(200)]
        df = spark.createDataFrame(rows, "variant string, success int")
        r = ab_proportion_test(df, "variant", "success").collect()[0]
        assert r.z_micro == 0 and r.significant is False

    def test_zero_variance_emits_null(self, spark):
        from dativo_ingest_spark.operators.analytics import (
            ab_proportion_test)

        df = spark.createDataFrame(
            [("A", 0)] * 10 + [("B", 0)] * 10,
            "variant string, success int")
        r = ab_proportion_test(df, "variant", "success").collect()[0]
        assert r.z_micro is None and r.significant is False

    def test_three_variants_three_pairs(self, spark):
        from dativo_ingest_spark.operators.analytics import (
            ab_proportion_test)

        rows = [(v, i % 2) for v in ("A", "B", "C") for i in range(20)]
        df = spark.createDataFrame(rows, "variant string, success int")
        out = ab_proportion_test(df, "variant", "success").collect()
        assert {(r.variant_a, r.variant_b) for r in out} == \
            {("A", "B"), ("A", "C"), ("B", "C")}


class TestMannWhitneyU:
    def test_matches_hand_computation_with_ties(self, spark):
        import math

        from dativo_ingest_spark.operators.analytics import mann_whitney_u

        # A: [1, 2, 2, 5]; B: [2, 3, 4, 6] (cents after x100)
        rows = ([("A", v) for v in (0.01, 0.02, 0.02, 0.05)]
                + [("B", v) for v in (0.02, 0.03, 0.04, 0.06)])
        df = spark.createDataFrame(rows, "variant string, value double")
        r = mann_whitney_u(df, "variant", "value").collect()[0]
        # pooled sorted: 1,2,2,2,3,4,5,6; avg rank of the three 2s = 3
        # R_A = 1 + 3 + 3 + 7 = 14 -> R2_A = 28
        # U_A = n_a*n_b + n_a(n_a+1)/2 - R_A = 16 + 10 - 14 = 12
        assert (r.n_a, r.n_b, r.u2_a) == (4, 4, 24)
        se = math.sqrt(16 * 9 / 12.0)
        z = (24 - 16) / (2.0 * se)
        assert r.z_micro == math.floor(z * 1e6 + 0.5)
        assert r.significant is False

    def test_clear_shift_significant(self, spark):
        from dativo_ingest_spark.operators.analytics import mann_whitney_u

        rows = ([("A", float(i)) for i in range(100)]
                + [("B", float(i + 200)) for i in range(100)])
        df = spark.createDataFrame(rows, "variant string, value double")
        r = mann_whitney_u(df, "variant", "value").collect()[0]
        assert r.u2_a == 2 * 100 * 100  # A uniformly below B: U_A = n1*n2
        assert r.significant is True

    def test_requires_two_variants(self, spark):
        import pytest as _pytest

        from dativo_ingest_spark.operators.analytics import mann_whitney_u

        df = spark.createDataFrame([("A", 1.0)], "variant string, value double")
        with _pytest.raises(ValueError, match="two variants"):
            mann_whitney_u(df, "variant", "value")


class TestChiSquareIndependence:
    def test_matches_hand_computation(self, spark):
        import math

        from dativo_ingest_spark.operators.analytics import (
            chi_square_independence)

        # 2x2: A=(30 yes, 70 no), B=(50 yes, 50 no)
        rows = ([("A", "y")] * 30 + [("A", "n")] * 70
                + [("B", "y")] * 50 + [("B", "n")] * 50)
        df = spark.createDataFrame(rows, "variant string, cat string")
        r = chi_square_independence(df, "variant", "cat",
                                    chi2_critical_milli=3841).collect()[0]
        exp = 0
        for o, rt, ct in ((30, 100, 80), (70, 100, 120),
                          (50, 100, 80), (50, 100, 120)):
            e = rt * ct / 200.0
            exp += math.floor((o - e) * (o - e) / e * 1e6 + 0.5)
        assert (r.n_variants, r.n_categories, r.dof) == (2, 2, 1)
        assert r.chi2_micro == exp
        assert r.significant is True   # chi2 ~ 8.33 > 3.841

    def test_independent_not_significant(self, spark):
        from dativo_ingest_spark.operators.analytics import (
            chi_square_independence)

        rows = [(v, c) for v in ("A", "B") for c in ("x", "y", "z")
                for _ in range(40)]
        df = spark.createDataFrame(rows, "variant string, cat string")
        r = chi_square_independence(df, "variant", "cat",
                                    chi2_critical_milli=5991).collect()[0]
        assert r.chi2_micro == 0 and r.significant is False
        assert r.dof == 2

    def test_sparse_table_empty_cells_contribute(self, spark):
        # A never produces 'z' and B never produces 'x': the full 2x3
        # grid has two EMPTY cells, each contributing (0-E)^2/E = E.
        # An observed-cells-only fold drops both terms and understates
        # chi2 — the textbook statistic sums over all r*c cells.
        import math

        from dativo_ingest_spark.operators.analytics import (
            chi_square_independence)

        rows = ([("A", "x")] * 30 + [("A", "y")] * 30
                + [("B", "y")] * 30 + [("B", "z")] * 30)
        df = spark.createDataFrame(rows, "variant string, cat string")
        r = chi_square_independence(df, "variant", "cat",
                                    chi2_critical_milli=5991).collect()[0]
        assert (r.n_variants, r.n_categories, r.dof) == (2, 3, 2)
        exp = 0
        # all six cells of the grid, zeros included
        for o, rt, ct in ((30, 60, 30), (30, 60, 60), (0, 60, 30),
                          (0, 60, 30), (30, 60, 60), (30, 60, 30)):
            e = rt * ct / 120.0
            exp += math.floor((o - e) * (o - e) / e * 1e6 + 0.5)
        assert r.chi2_micro == exp
        # hand value: 2*(15 + 0 + 15) = 60 => 60e6 micro — far above
        # what the observed-cells-only fold (30e6) would report
        assert r.chi2_micro == 60_000_000
        assert r.significant is True


class TestSprtBinary:
    def test_first_crossing_sticks(self, spark):
        import math

        from dativo_ingest_spark.operators.analytics import sprt_binary

        # 20 successes then 20 failures: the run crosses the H1 bound
        # early; the later failures must NOT un-decide it
        rows = ([("A", f"2024-01-01 00:{i:02d}:00", 1) for i in range(20)]
                + [("A", f"2024-01-01 01:{i:02d}:00", 0)
                   for i in range(20)])
        from pyspark.sql import functions as F
        df = (spark.createDataFrame(rows, "variant string, ts string, "
                                          "succ int")
              .select("variant", F.col("ts").cast("timestamp").alias("ts"),
                      "succ"))
        r = sprt_binary(df, "variant", "ts", "succ",
                        p0=0.2, p1=0.6).collect()[0]
        l1 = math.floor(math.log(0.6 / 0.2) * 1e6 + 0.5)
        hi = math.floor(math.log(0.8 / 0.05) * 1e6 + 0.5)
        import math as _m
        need = _m.ceil(hi / l1)
        assert r.decision == "accept_h1"
        assert r.decided_at_n == need          # crossed mid-successes
        assert r.n == 40 and r.s == 20

    def test_continue_when_inconclusive(self, spark):
        from pyspark.sql import functions as F

        from dativo_ingest_spark.operators.analytics import sprt_binary

        rows = [("B", f"2024-01-01 00:00:{i:02d}", i % 2)
                for i in range(10)]
        df = (spark.createDataFrame(rows, "variant string, ts string, "
                                          "succ int")
              .select("variant", F.col("ts").cast("timestamp").alias("ts"),
                      "succ"))
        r = sprt_binary(df, "variant", "ts", "succ",
                        p0=0.45, p1=0.55).collect()[0]
        assert r.decision == "continue" and r.decided_at_n is None

    def test_validation(self, spark):
        import pytest as _pytest

        from dativo_ingest_spark.operators.analytics import sprt_binary

        df = spark.createDataFrame([("A", "2024-01-01", 1)],
                                   "variant string, ts string, succ int")
        with _pytest.raises(ValueError, match="probabilities"):
            sprt_binary(df, "variant", "ts", "succ", p0=0.5, p1=0.5)

    def test_bucketed_scan_matches_sequential_replay(self, spark):
        # events spread across buckets (n_buckets=8 over 4000 events):
        # the two-level scan must land the SAME first-crossing ordinal
        # a driver-side sequential replay computes, across bucket
        # boundaries
        import math

        from pyspark.sql import functions as F

        from dativo_ingest_spark.operators.analytics import sprt_binary

        def seq(i):
            # oscillate inside the bounds for a while, then drift up
            if i < 3000:
                return 1 if i % 2 == 0 else 0
            return 1 if i % 4 != 3 else 0

        rows = [("A", 1_700_000_000 + i * 60, seq(i)) for i in range(4000)]
        df = (spark.createDataFrame(rows,
                                    "variant string, sec long, succ int")
              .select("variant",
                      F.timestamp_seconds("sec").alias("ts"), "succ"))
        # symmetric increments (l0 = -l1): the alternating prefix nets
        # to zero, so the crossing genuinely happens in the drift phase
        out = sprt_binary(df, "variant", "ts", "succ", p0=0.45, p1=0.55,
                          n_buckets=8).collect()[0]

        l1 = math.floor(math.log(0.55 / 0.45) * 1e6 + 0.5)
        l0 = math.floor(math.log(0.45 / 0.55) * 1e6 + 0.5)
        lo = math.floor(math.log(0.2 / 0.95) * 1e6 + 0.5)
        hi = math.floor(math.log(0.8 / 0.05) * 1e6 + 0.5)
        llr, first = 0, None
        for i in range(4000):
            llr += l1 if seq(i) else l0
            if first is None and (llr >= hi or llr <= lo):
                first = i + 1
                first_dec = "accept_h1" if llr >= hi else "accept_h0"
        assert first is not None and first > 3000   # crosses late
        assert out.decided_at_n == first
        assert out.decision == first_dec
        assert out.llr_micro == llr
        assert out.n == 4000

    def test_rate_drop_hypotheses_p1_below_p0(self, spark):
        # p1 < p0 (testing for a rate DROP) flips both increment
        # signs: l1 < 0, l0 > 0. The all-success/all-failure envelope
        # (p_run + s*l1 >= hi or p_run + f*l0 <= lo) flags NOTHING in
        # that regime — the signed-extrema bracket must still find the
        # crossing instead of silently reporting 'continue'.
        import math

        from pyspark.sql import functions as F

        from dativo_ingest_spark.operators.analytics import sprt_binary

        def seq(i):
            return 1 if i % 10 == 9 else 0      # ~10% observed rate

        rows = [("A", 1_700_000_000 + i * 60, seq(i)) for i in range(400)]
        df = (spark.createDataFrame(rows,
                                    "variant string, sec long, succ int")
              .select("variant",
                      F.timestamp_seconds("sec").alias("ts"), "succ"))
        # H0: p=0.5, H1: p=0.1 — the 10% stream should accept H1
        out = sprt_binary(df, "variant", "ts", "succ", p0=0.5, p1=0.1,
                          n_buckets=8).collect()[0]
        l1 = math.floor(math.log(0.1 / 0.5) * 1e6 + 0.5)
        l0 = math.floor(math.log(0.9 / 0.5) * 1e6 + 0.5)
        assert l1 < 0 < l0                       # the flipped regime
        lo = math.floor(math.log(0.2 / 0.95) * 1e6 + 0.5)
        hi = math.floor(math.log(0.8 / 0.05) * 1e6 + 0.5)
        llr, first, first_dec = 0, None, None
        for i in range(400):
            llr += l1 if seq(i) else l0
            if first is None and (llr >= hi or llr <= lo):
                first = i + 1
                first_dec = "accept_h1" if llr >= hi else "accept_h0"
        assert first is not None
        assert out.decision == first_dec == "accept_h1"
        assert out.decided_at_n == first
        assert out.llr_micro == llr

    def test_integer_variant_column(self, spark):
        # non-string variant ids must survive the candidate broadcast
        # join (the candidate frame schema derives from the source
        # column type, never a hardcoded string)
        from pyspark.sql import functions as F

        from dativo_ingest_spark.operators.analytics import sprt_binary

        rows = [(7, 1_700_000_000 + i * 60, 1) for i in range(120)]
        df = (spark.createDataFrame(rows,
                                    "variant bigint, sec long, succ int")
              .select("variant",
                      F.timestamp_seconds("sec").alias("ts"), "succ"))
        out = sprt_binary(df, "variant", "ts", "succ", p0=0.2, p1=0.6,
                          n_buckets=4).collect()
        assert len(out) == 1 and out[0].variant == 7
        assert out[0].decision == "accept_h1"
        assert out[0].decided_at_n is not None

    def test_no_whole_arm_window_in_plan(self, spark):
        # the scale contract: NO Window partitioned by variant alone —
        # an entire experiment arm in one task is the 100x killer. The
        # only window runs per (variant, bucket).
        from pyspark.sql import functions as F

        from dativo_ingest_spark.operators.analytics import sprt_binary

        rows = [("A", 1_700_000_000 + i * 60, 1) for i in range(200)]
        df = (spark.createDataFrame(rows,
                                    "variant string, sec long, succ int")
              .select("variant",
                      F.timestamp_seconds("sec").alias("ts"), "succ"))
        out = sprt_binary(df, "variant", "ts", "succ", p0=0.2, p1=0.6,
                          n_buckets=16)
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            assert "bkt" in spec, f"whole-arm window found: {spec}"


class TestBasketLift:
    def test_hand_computed_lift(self, spark):
        from dativo_ingest_spark.operators.analytics import basket_lift

        # baskets: u1={x,y}, u2={x,y}, u3={x}, u4={z} -> N=4
        rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (2, "y"),
                (3, "x"), (4, "z")]
        df = spark.createDataFrame(rows, "u bigint, item string")
        got = {(r.item_a, r.item_b):
               (r.n_a, r.n_b, r.n_both, r.lift_micro)
               for r in basket_lift(df, "u", "item").collect()}
        # lift(x,y) = (2*4)/(3*2) = 4/3 -> 1333333 micro (floor)
        assert got[("x", "y")] == (3, 2, 2, (2 * 4 * 1000000) // (3 * 2))
        assert ("x", "z") not in got      # never co-occur
        assert ("y", "z") not in got

    def test_min_both_filters(self, spark):
        from dativo_ingest_spark.operators.analytics import basket_lift

        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "c")]
        df = spark.createDataFrame(rows, "u bigint, item string")
        out = basket_lift(df, "u", "item", min_both=2).collect()
        assert out == []
