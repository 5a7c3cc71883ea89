"""as-of join semantics: inclusive backward match, per-key isolation,
unmatched nulls, tolerance null-out."""

import datetime as dt

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
