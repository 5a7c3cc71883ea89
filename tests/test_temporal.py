"""as-of join semantics: inclusive backward match, per-key isolation,
unmatched nulls, tolerance null-out."""

import datetime as dt

from pyspark.sql import functions as F

from dativo_ingest_spark.operators import temporal
from dativo_ingest_spark.operators.temporal import asof_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(10)), (2, "a", _ts(30)), (3, "b", _ts(10)),
         (4, "c", _ts(50))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", _ts(5), 1.0), ("a", _ts(10), 2.0), ("a", _ts(29), 3.0),
         ("b", _ts(11), 9.0)],
        "k string, ts timestamp, v double",
    )
    return left, right


def test_backward_inclusive_match_per_key(spark):
    left, right = _frames(spark)
    out = {r.id: (r.ts_r, r.v_r)
           for r in asof_join(left, right, on="ts", by=["k"]).collect()}
    assert out[1] == (_ts(10), 2.0)   # tie: right.ts == left.ts matches
    assert out[2] == (_ts(29), 3.0)   # latest at-or-before, not first
    assert out[3] == (None, None)     # only later right rows for key b
    assert out[4] == (None, None)     # key c absent from right
    assert len(out) == 4              # left rows preserved exactly


def test_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {r.id: r.v_r
           for r in asof_join(left, right, on="ts", by=["k"],
                              tolerance="1 MINUTE").collect()}
    assert out[1] == 2.0              # exact-time match survives
    assert out[2] == 3.0              # 1 minute back survives
    assert out[3] is None


def test_nullable_right_payload_never_tears_rows(spark):
    """A NULL payload column in the matched right row must stay NULL — not
    forward-fill from an older right row (the torn-row bug: per-column fill
    mixed values from different right rows)."""
    left = spark.createDataFrame(
        [(1, "a", _ts(20))], "id int, k string, ts timestamp")
    right = spark.createDataFrame(
        [("a", _ts(5), 7.0, "old"), ("a", _ts(15), None, "new")],
        "k string, ts timestamp, v double, tag string",
    )
    row = asof_join(left, right, on="ts", by=["k"]).collect()[0]
    assert row.ts_r == _ts(15) and row.tag_r == "new"
    assert row.v_r is None        # from the matched row, not filled from 7.0


def test_tolerance_nulls_all_matched_columns_together(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(30))], "id int, k string, ts timestamp")
    right = spark.createDataFrame(
        [("a", _ts(5), 7.0, "old")], "k string, ts timestamp, v double, tag string")
    row = asof_join(left, right, on="ts", by=["k"],
                    tolerance="1 MINUTE").collect()[0]
    assert row.ts_r is None and row.v_r is None and row.tag_r is None


def test_right_rows_never_leak(spark):
    left, right = _frames(spark)
    got = asof_join(left, right, on="ts", by=["k"])
    assert got.count() == left.count()
    assert set(got.columns) == {"k", "id", "ts", "ts_r", "v_r"}


def test_forward_direction(spark):
    left, right = _frames(spark)
    out = {r.id: (r.ts_r, r.v_r)
           for r in asof_join(left, right, on="ts", by=["k"],
                              direction="forward").collect()}
    assert out[1] == (_ts(10), 2.0)   # inclusive at equal ts
    assert out[2] == (None, None)     # nothing at/after :30 for key a
    assert out[3] == (_ts(11), 9.0)   # next b row
    assert out[4] == (None, None)


def test_nearest_direction_ties_go_backward(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(20)), (2, "a", _ts(27))],
        "id int, k string, ts timestamp")
    right = spark.createDataFrame(
        [("a", _ts(10), 1.0), ("a", _ts(30), 2.0)],
        "k string, ts timestamp, v double")
    out = {r.id: (r.ts_r, r.v_r)
           for r in asof_join(left, right, on="ts", by=["k"],
                              direction="nearest").collect()}
    assert out[1] == (_ts(10), 1.0)   # exact tie (10 apart both ways) -> backward
    assert out[2] == (_ts(30), 2.0)   # 3 < 17 -> forward wins


def test_nearest_matches_pandas_merge_asof(spark):
    import pandas as pd

    left = spark.createDataFrame(
        [(i, "a", _ts(m)) for i, m in enumerate([1, 8, 22, 31, 44, 59])],
        "id int, k string, ts timestamp")
    right = spark.createDataFrame(
        [("a", _ts(m), float(m)) for m in [5, 20, 40]],
        "k string, ts timestamp, v double")
    got = {r.id: r.v_r for r in asof_join(
        left, right, on="ts", by=["k"], direction="nearest").collect()}
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    want = pd.merge_asof(lp, rp, on="ts", by="k", direction="nearest",
                         suffixes=("", "_r"))
    want_map = dict(zip(want["id"], want["v"]))
    assert got == want_map


def test_forward_tolerance(spark):
    left, right = _frames(spark)
    out = {r.id: r.v_r
           for r in asof_join(left, right, on="ts", by=["k"],
                              direction="forward",
                              tolerance="30 seconds").collect()}
    assert out[1] == 2.0              # exact-ts match survives any tolerance
    assert out[3] is None             # :11 match is 60s after :10 — too far


def test_bad_direction_raises(spark):
    left, right = _frames(spark)
    import pytest

    with pytest.raises(ValueError):
        asof_join(left, right, on="ts", by=["k"], direction="sideways")


# --------------------------------------------------------------------------
# range_join: bucketed keyless/keyed time-proximity join
# --------------------------------------------------------------------------

def _range_frames(spark):
    left = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", _ts(i)) for i in range(12)],
        "lid int, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [(100 + i, "a" if i % 3 else "b", dt.datetime(2024, 1, 1, 0, i, 30))
         for i in range(12)],
        "rid int, k string, rts timestamp",
    )
    return left, right


def _naive(left, right, lower_s, upper_s, keys=()):
    from pyspark.sql import functions as F
    cond = (
        (F.col("rts") >= F.col("lts") + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (F.col("rts") <= F.col("lts") + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    for k in keys:
        cond = (left[k] == right[k]) & cond
    rcols = [c for c in right.columns if c not in keys]
    return {tuple(r) for r in
            left.join(right, cond).select("lid", *[right[c] for c in rcols
                                                   if c == "rid"]).collect()}


def test_range_join_matches_naive_keyless(spark):
    from dativo_ingest_spark.operators.temporal import range_join
    left, right = _range_frames(spark)
    got = {(r.lid, r.rid) for r in
           range_join(left.drop("k"), right.drop("k"), "lts", "rts",
                      lower_s=-90, upper_s=120).collect()}
    want = _naive(left.drop("k"), right.drop("k"), -90, 120)
    assert got == want and len(got) > 0


def test_range_join_matches_naive_keyed_narrow_buckets(spark):
    # bucket narrower than the span: each left row explodes onto several
    # buckets; every true pair must still appear exactly once
    from dativo_ingest_spark.operators.temporal import range_join
    left, right = _range_frames(spark)
    out = range_join(left, right, "lts", "rts",
                     lower_s=-90, upper_s=120, keys=["k"],
                     bucket_s=30).collect()
    got = [(r.lid, r.rid) for r in out]
    assert len(got) == len(set(got)), "duplicate pairs from bucket overlap"
    assert set(got) == _naive(left, right, -90, 120, keys=["k"])


def test_range_join_validates_inputs(spark):
    import pytest
    from dativo_ingest_spark.operators.temporal import range_join
    left, right = _range_frames(spark)
    with pytest.raises(ValueError, match="inner"):
        range_join(left, right, "lts", "rts", -1, 1, how="left")
    with pytest.raises(ValueError, match="empty range"):
        range_join(left, right, "lts", "rts", 10, 10)
    with pytest.raises(ValueError, match="bucket"):
        range_join(left, right, "lts", "rts", -1, 1, bucket_s=0)


def test_range_join_plan_is_equi_join_not_nested_loop(spark):
    # the whole point: the naive theta-join plans as BNLJ/cartesian, the
    # bucketed rewrite must plan as an ordinary equi-join
    from pyspark.sql import functions as F
    from dativo_ingest_spark.operators.temporal import range_join
    left, right = _range_frames(spark)
    l2, r2 = left.drop("k"), right.drop("k")
    naive_plan = (
        l2.join(r2, (F.col("rts") >= F.col("lts") - F.expr("INTERVAL 90 SECONDS"))
                & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 120 SECONDS")))
        ._jdf.queryExecution().executedPlan().toString())
    assert ("BroadcastNestedLoopJoin" in naive_plan
            or "CartesianProduct" in naive_plan)
    plan = range_join(l2, r2, "lts", "rts", -90, 120)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# --- time_bucket_gapfill -------------------------------------------------

def _gapfill_frame(spark):
    from pyspark.sql import functions as F  # noqa: F401
    rows = [
        # key A: buckets 0 and 2 observed, gap at 1
        ("A", dt.datetime(2024, 1, 1, 0, 0, 30), 10.0),
        ("A", dt.datetime(2024, 1, 1, 0, 0, 45), 20.0),
        ("A", dt.datetime(2024, 1, 1, 0, 2, 10), 40.0),
        # key B: buckets 5 and 6 (different range than A)
        ("B", dt.datetime(2024, 1, 1, 0, 5, 5), 5.0),
        ("B", dt.datetime(2024, 1, 1, 0, 6, 59), 7.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_gapfill_emits_every_bucket_with_null_fill(spark):
    from pyspark.sql import functions as F
    from dativo_ingest_spark.operators.temporal import time_bucket_gapfill

    out = time_bucket_gapfill(
        _gapfill_frame(spark), "ts", 60.0,
        {"n": F.count("*"), "sum_v": F.sum("v")}, keys=["k"],
    ).orderBy("k", "bucket_ts").collect()
    a = [r for r in out if r.k == "A"]
    b = [r for r in out if r.k == "B"]
    assert [r.bucket_ts.minute for r in a] == [0, 1, 2]
    assert [r.bucket_ts.minute for r in b] == [5, 6]
    assert (a[0].n, a[0].sum_v) == (2, 30.0)
    assert (a[1].n, a[1].sum_v) == (None, None)  # the gap
    assert (a[2].n, a[2].sum_v) == (1, 40.0)
    assert (b[0].n, b[1].n) == (1, 1)


def test_gapfill_zero_and_locf(spark):
    from pyspark.sql import functions as F
    from dativo_ingest_spark.operators.temporal import time_bucket_gapfill

    frame = _gapfill_frame(spark)
    zero = time_bucket_gapfill(
        frame, "ts", 60.0, {"n": F.count("*")}, keys=["k"], fill="zero",
    ).orderBy("k", "bucket_ts").collect()
    assert [r.n for r in zero if r.k == "A"] == [2, 0, 1]

    locf = time_bucket_gapfill(
        frame, "ts", 60.0, {"sum_v": F.sum("v")}, keys=["k"], fill="locf",
    ).orderBy("k", "bucket_ts").collect()
    assert [r.sum_v for r in locf if r.k == "A"] == [30.0, 30.0, 40.0]


def test_gapfill_locf_observed_null_overwrites(spark):
    from pyspark.sql import functions as F
    from dativo_ingest_spark.operators.temporal import time_bucket_gapfill

    rows = [
        ("A", dt.datetime(2024, 1, 1, 0, 0, 10), 10.0),
        ("A", dt.datetime(2024, 1, 1, 0, 1, 10), None),  # observed NULL
        ("A", dt.datetime(2024, 1, 1, 0, 3, 10), 9.0),
    ]
    frame = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = time_bucket_gapfill(
        frame, "ts", 60.0, {"mx": F.max("v")}, keys=["k"], fill="locf",
    ).orderBy("bucket_ts").collect()
    # bucket 1 is OBSERVED with a NULL aggregate -> overwrites (stays NULL);
    # bucket 2 is a GAP -> inherits bucket 1's NULL, not bucket 0's 10.0
    assert [r.mx for r in out] == [10.0, None, None, 9.0]


def test_gapfill_explicit_range_and_validation(spark):
    import pytest
    from pyspark.sql import functions as F
    from dativo_ingest_spark.operators.temporal import time_bucket_gapfill

    frame = _gapfill_frame(spark)
    out = time_bucket_gapfill(
        frame, "ts", 60.0, {"n": F.count("*")}, keys=["k"],
        start="2024-01-01 00:00:00", end="2024-01-01 00:07:00",
    ).collect()
    # common 8-bucket grid (0..7 inclusive) for BOTH keys
    assert len(out) == 16
    with pytest.raises(ValueError):
        time_bucket_gapfill(frame, "ts", 0, {"n": F.count("*")})
    with pytest.raises(ValueError):
        time_bucket_gapfill(frame, "ts", 60, {})
    with pytest.raises(ValueError):
        time_bucket_gapfill(frame, "ts", 60, {"n": F.count("*")},
                            fill="interpolate")
    with pytest.raises(ValueError):
        time_bucket_gapfill(frame, "ts", 60, {"n": F.count("*")},
                            start="2024-01-01")


def test_gapfill_zero_fill_rejects_non_numeric_aggs(spark):
    import pytest
    from pyspark.sql import functions as F
    from dativo_ingest_spark.operators.temporal import time_bucket_gapfill

    frame = _gapfill_frame(spark).withColumn(
        "tag", (F.col("v") > 10).cast("string"))
    with pytest.raises(ValueError, match="numeric"):
        time_bucket_gapfill(
            frame, "ts", 60.0, {"last_tag": F.max("tag")}, keys=["k"],
            fill="zero")
    # numeric aggregates still zero-fill, typed to the aggregate column
    out = time_bucket_gapfill(
        frame, "ts", 60.0, {"mx": F.max("v")}, keys=["k"], fill="zero",
    ).orderBy("k", "bucket_ts").collect()
    assert [r.mx for r in out if r.k == "A"] == [20.0, 0.0, 40.0]


class TestSlidingDayMembership:
    def test_membership_and_distinct(self, spark):
        from dativo_ingest_spark.operators.temporal import (
            sliding_day_membership)
        day = 86_400_000_000
        df = spark.createDataFrame(
            [(1, 0), (2, 2 * day)], "uid bigint, us bigint"
        ).withColumn("ts", F.timestamp_micros("us"))
        m = sliding_day_membership(df, "ts", window_days=3)
        got = {(r.uid, r.window_day) for r in m.collect()}
        assert got == {(1, 0), (1, 1), (1, 2), (2, 2), (2, 3), (2, 4)}
        acts = {r.window_day: r.n for r in
                m.groupBy("window_day")
                .agg(F.countDistinct("uid").alias("n")).collect()}
        assert acts == {0: 1, 1: 1, 2: 2, 3: 1, 4: 1}

    def test_validates(self, spark):
        import pytest as _pytest
        from dativo_ingest_spark.operators.temporal import (
            sliding_day_membership)
        df = spark.createDataFrame([(1,)], "us bigint").withColumn(
            "ts", F.timestamp_micros("us"))
        with _pytest.raises(ValueError):
            sliding_day_membership(df, "ts", window_days=0)


class TestSessionize:
    def _ev(self, spark, rows):
        import datetime as dt

        return spark.createDataFrame(
            [(u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
             for u, s in rows],
            "user_id long, ts timestamp")

    def test_gap_splits_sessions(self, spark):
        rows = [(1, 0), (1, 60), (1, 120),      # session 1: 3 events
                (1, 120 + 1801),                # session 2 (gap > 30min)
                (2, 0)]                         # user 2: one session
        out = {(r.user, r.n_events) for r in temporal.sessionize(
            self._ev(spark, rows), "user_id", "ts").collect()}
        assert out == {(1, 3), (1, 1), (2, 1)}

    def test_boundary_gap_exactly_equal_stays_same_session(self, spark):
        rows = [(1, 0), (1, 1800)]   # gap == threshold: NOT a new session
        out = temporal.sessionize(
            self._ev(spark, rows), "user_id", "ts").collect()
        assert len(out) == 1 and out[0].n_events == 2

    def test_incremental_path_equals_full(self, spark):
        import random

        rng = random.Random(7)
        rows = sorted(
            ((rng.randrange(5), rng.randrange(0, 50_000)))
            for _ in range(300))
        # split by time: every batch event later than state events
        b1 = [r for r in rows if r[1] < 20_000]
        b2 = [r for r in rows if 20_000 <= r[1] < 35_000]
        b3 = [r for r in rows if r[1] >= 35_000]
        closed_all = []
        state = None
        for b in (b1, b2, b3):
            closed, state = temporal.sessionize_incremental(
                state, self._ev(spark, b), "user_id", "ts")
            closed_all.extend(
                (r.user, r.session_start, r.session_end, r.n_events)
                for r in closed.collect())
            state = spark.createDataFrame(   # materialize state rows
                state.collect(), state.schema)
        final = closed_all + [
            (r.user, r.session_start, r.session_end, r.n_events)
            for r in state.collect()]
        full = [(r.user, r.session_start, r.session_end, r.n_events)
                for r in temporal.sessionize(
                    self._ev(spark, rows), "user_id", "ts").collect()]
        assert sorted(final) == sorted(full)

    def test_merge_across_batch_boundary(self, spark):
        # one user whose session straddles the split: must merge
        closed, state = temporal.sessionize_incremental(
            None, self._ev(spark, [(1, 0), (1, 100)]), "user_id", "ts")
        state = spark.createDataFrame(state.collect(), state.schema)
        assert closed.count() == 0
        closed, state = temporal.sessionize_incremental(
            state, self._ev(spark, [(1, 1000), (1, 2500)]),
            "user_id", "ts")
        assert closed.count() == 0
        rows = state.collect()
        assert len(rows) == 1 and rows[0].n_events == 4
        assert rows[0].session_start == dt.datetime(2024, 1, 1)

    def test_idle_user_state_survives(self, spark):
        closed, state = temporal.sessionize_incremental(
            None, self._ev(spark, [(1, 0), (2, 0)]), "user_id", "ts")
        state = spark.createDataFrame(state.collect(), state.schema)
        closed, state = temporal.sessionize_incremental(
            state, self._ev(spark, [(1, 10_000)]), "user_id", "ts")
        # user 1's old session closed (gap exceeded); user 2 still open
        assert [(r.user, r.n_events) for r in closed.collect()] == [(1, 1)]
        assert {r.user for r in state.collect()} == {1, 2}


class TestSlidingDistinctHll:
    def test_range_frame_handles_day_gaps(self, spark):
        from pyspark.sql import functions as F

        from dativo_ingest_spark.operators.temporal import (
            sliding_distinct_hll)

        # users on day 0 and day 20: a ROWS frame would merge them into
        # one 2-row window; the RANGE frame must keep them apart
        rows = ([(u, "2024-01-01 00:00:00") for u in range(50)]
                + [(u + 1000, "2024-01-21 00:00:00") for u in range(30)])
        df = spark.createDataFrame(rows, "user_id bigint, ts string") \
            .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        got = {r.window_day: r.approx_distinct
               for r in sliding_distinct_hll(
                   df, "user_id", "ts", window_days=7).collect()}
        assert len(got) == 2
        days = sorted(got)
        assert abs(got[days[0]] - 50) <= 3   # HLL ~2% rsd
        assert abs(got[days[1]] - 30) <= 3   # gap > window: no merge

    def test_trailing_union(self, spark):
        from pyspark.sql import functions as F

        from dativo_ingest_spark.operators.temporal import (
            sliding_distinct_hll)

        # 40 users/day, 10 new per day: trailing-2-day distinct = 50
        rows = [(d * 10 + u, f"2024-01-0{d + 1} 00:00:00")
                for d in range(3) for u in range(40)]
        df = spark.createDataFrame(rows, "user_id bigint, ts string") \
            .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        got = sorted(
            (r.window_day, r.approx_distinct)
            for r in sliding_distinct_hll(
                df, "user_id", "ts", window_days=2).collect())
        assert abs(got[0][1] - 40) <= 2
        assert abs(got[1][1] - 50) <= 3 and abs(got[2][1] - 50) <= 3

    def test_validation(self, spark):
        import pytest as _pytest

        from dativo_ingest_spark.operators.temporal import (
            sliding_distinct_hll)

        df = spark.createDataFrame([(1, "2024-01-01 00:00:00")],
                                   "user_id bigint, ts string")
        with _pytest.raises(ValueError, match="window_days"):
            sliding_distinct_hll(df, "user_id", "ts", window_days=0)
