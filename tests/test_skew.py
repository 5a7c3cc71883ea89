"""Bucketed co-located joins and skew-salting operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dativo_ingest_spark.operators import skew


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free(spark, no_broadcast):
    """Two tables bucketed to the same spec on the join key sort-merge
    join with ZERO Exchange — the write-side shuffle is reused."""
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(0, 1000, 3).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("b"))
    try:
        skew.write_bucketed(left, "bk_left", ["k"], num_buckets=8,
                            sort_cols=["k"])
        skew.write_bucketed(right, "bk_right", ["k"], num_buckets=8,
                            sort_cols=["k"])
        l2 = skew.bucketed_table(spark, "bk_left")
        r2 = skew.bucketed_table(spark, "bk_right")
        joined = l2.join(r2, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:800]
        expected = left.join(right, "k")
        assert sorted(map(tuple, joined.collect())) == \
            sorted(map(tuple, expected.collect()))
        # aggregation on the bucket key is exchange-free too
        agg_plan = l2.groupBy("k").count()._jdf.queryExecution()\
            .executedPlan().toString()
        assert "Exchange" not in agg_plan, agg_plan[:800]
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_salted_join_matches_plain_join(spark, no_broadcast):
    # skewed left: one hot key (0) with 500 rows, a long tail
    hot = spark.range(500).select(F.lit(0).alias("k"),
                                  F.col("id").alias("v"))
    tail = spark.range(1, 50).select(F.col("id").alias("k"),
                                     (F.col("id") * 10).alias("v"))
    left = hot.union(tail)
    right = spark.range(0, 50).select(F.col("id").alias("k"),
                                      (F.col("id") + 100).alias("w"))
    got = skew.salted_join(left, right, ["k"], n_salts=8)
    expected = left.join(right, "k")
    assert sorted(map(tuple, got.select("k", "v", "w").collect())) == \
        sorted(map(tuple, expected.select("k", "v", "w").collect()))
    assert got.columns == ["k", "v", "w"]  # salt/replica never leak


def test_salted_join_left_outer(spark, no_broadcast):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")],
                                 "k long, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    got = skew.salted_join(left, right, ["k"], n_salts=4, how="left")
    rows = {(r.k, r.v, r.w) for r in got.collect()}
    assert rows == {(1, "a", "x"), (2, "b", "y"), (99, "c", None)}


def test_salted_join_rejects_right_and_full_outer(spark):
    """Replicating the small side per salt would emit each unmatched
    right row n_salts times under right/full semantics — hard error, not
    silent duplicates."""
    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(1, "x"), (7, "z")], "k long, w string")
    for how in ("right", "rightouter", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="n_salts"):
            skew.salted_join(left, right, ["k"], n_salts=4, how=how)
    # the documented workaround still covers every unmatched-right need
    got = skew.salted_join(right, left, ["k"], n_salts=4, how="left")
    assert {(r.k, r.w, r.v) for r in got.collect()} == \
        {(1, "x", "a"), (7, "z", None)}


def test_salt_column_spreads_hot_key(spark):
    """Rows sharing one join key still spread across salts (the salt
    derives from the whole row, not the key)."""
    df = spark.range(1000).select(F.lit(0).alias("k"),
                                  F.col("id").alias("v"))
    row_key = F.concat_ws("|", F.col("k").cast("string"),
                          F.col("v").cast("string"))
    n = df.select(skew.salt_column(row_key, 16).alias("s"))\
        .select(F.countDistinct("s")).first()[0]
    assert n == 16


def test_two_phase_count_matches_group_count(spark):
    hot = spark.range(800).select(F.lit("x").alias("k"))
    tail = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    df = hot.union(tail)
    got = {(r.k, r.n) for r in
           skew.two_phase_count(df, ["k"], n_salts=8).collect()}
    assert got == {("x", 800), ("a", 2), ("b", 1)}


class TestKeySkewReport:
    def test_exact_report(self, spark):
        from dativo_ingest_spark.operators.skew import key_skew_report
        rows = [("hot",)] * 6 + [("a",)] * 2 + [("b",)] * 2
        df = spark.createDataFrame(rows, "k string")
        r = key_skew_report(df, "k").collect()[0]
        assert (r.n_rows, r.n_keys, r.max_count) == (10, 3, 6)
        assert r.top_key == "hot"
        assert r.p50 == 2.0  # counts [2, 2, 6] -> median 2
        assert r.top_share_micro == 600_000

    def test_tie_breaks_to_smallest_key(self, spark):
        from dativo_ingest_spark.operators.skew import key_skew_report
        df = spark.createDataFrame(
            [("z",), ("z",), ("a",), ("a",)], "k string")
        assert key_skew_report(df, "k").collect()[0].top_key == "a"

    def test_approx_mode_same_shape(self, spark):
        from dativo_ingest_spark.operators.skew import key_skew_report
        df = spark.createDataFrame([(i % 5,) for i in range(50)], "k int")
        r = key_skew_report(df, "k", exact=False).collect()[0]
        assert (r.n_rows, r.n_keys, r.max_count) == (50, 5, 10)
