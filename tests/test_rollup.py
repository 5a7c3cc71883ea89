"""Incremental rollup maintenance: any batch split/fold order must finalize
byte-identically to a single-shot aggregation over the union — the
materialized-view-maintenance exactness contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dativo_ingest_spark.operators import rollup

KEYS = ["k"]
MEASURES = {
    "n": ("count", "v"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
    "mean": ("avg", "v"),
}


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _frame(spark):
    data = [(i, "a" if i % 3 else "b", float(i * 7 % 13)) for i in range(40)]
    data += [(100, "c", None), (101, "c", 5.0)]  # null measure values
    return spark.createDataFrame(data, "id int, k string, v double")


def _single_shot(df):
    return df.groupBy("k").agg(
        F.count("v").alias("n"), F.sum("v").alias("total"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.avg("v").alias("mean"),
    )


@pytest.mark.parametrize("splits", [1, 2, 5])
def test_fold_equals_single_shot(spark, splits):
    df = _frame(spark)
    state = None
    for i in range(splits):
        batch = df.filter(F.col("id") % splits == i)
        state = rollup.maintain_rollup(state, batch, KEYS, MEASURES)
    got = _rows(rollup.finalize(state, KEYS, MEASURES))
    assert got == _rows(_single_shot(df))


def test_fold_order_free(spark):
    # merging states in reverse order yields the same result
    df = _frame(spark)
    states = [rollup.partial_state(df.filter(F.col("id") % 3 == i),
                                   KEYS, MEASURES) for i in range(3)]
    fwd = rollup.finalize(rollup.merge_states(states, KEYS), KEYS, MEASURES)
    rev = rollup.finalize(rollup.merge_states(states[::-1], KEYS),
                          KEYS, MEASURES)
    assert _rows(fwd) == _rows(rev)


def test_count_ignores_null_measure_values(spark):
    df = _frame(spark)
    state = rollup.partial_state(df, KEYS, MEASURES)
    out = {r.k: (r.n, r.mean)
           for r in rollup.finalize(state, KEYS, MEASURES).collect()}
    assert out["c"] == (1, 5.0)  # the NULL v row is not counted/averaged


def test_avg_and_sum_share_state_columns(spark):
    # avg is derived from (sum, count): asking for all three over the same
    # source column must not duplicate state
    df = _frame(spark)
    state = rollup.partial_state(df, KEYS, MEASURES)
    sum_cols = [c for c in state.columns if c.endswith("__sum")]
    assert len(sum_cols) == len(set(sum_cols))


def test_validation(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="unsupported measure"):
        rollup.partial_state(df, KEYS, {"m": ("median", "v")})
    with pytest.raises(ValueError, match="at least one"):
        rollup.merge_states([], KEYS)


def test_partial_state_is_map_side_combined(spark):
    # one exchange, with a partial aggregation below it: the batch shuffle
    # carries pre-combined state rows, not raw rows
    df = _frame(spark)
    plan = rollup.partial_state(df, KEYS, MEASURES)\
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_" in plan.split("Exchange", 1)[1]
