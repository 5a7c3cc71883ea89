"""r14 optimization guards: driver-local result frames (local_df) and
the connected-components in-pass convergence flag.

local_df replaces bare ``spark.createDataFrame(rows, schema)`` for
collected/fixture rows: the bare call pickles rows into
``defaultParallelism`` slices and every later evaluation sets up one
Python runner per slice (serially under a ``coalesce(1)``). These tests
pin (a) value/schema fidelity against createDataFrame across the type
zoo the queries use, (b) the partition-count contract, and (c) that the
rewritten connected-components loop still converges to the same labels
without its old per-round changed-check join.
"""
import datetime

import pytest
from pyspark.sql import functions as F

from dativo_ingest_spark.operators.util import local_df


@pytest.mark.parametrize(
    "rows, schema",
    [
        ([], "a int, b string"),
        ([(1, "x"), (2, None)], "a int, b string"),
        ([(datetime.datetime(2020, 1, 2, 3, 4, 5),
           datetime.date(2021, 2, 3))], "ts timestamp, d date"),
        ([(b"\x00\xffbin",)], "blob binary"),
        ([(1.5, [1, 2, 3])], "f double, arr array<bigint>"),
        ([("s", {"k": 1})], "s string, m map<string,bigint>"),
        ([(None, None)], "a bigint, b double"),
    ],
)
def test_local_df_matches_createdataframe(spark, rows, schema):
    a = spark.createDataFrame(rows, schema)
    b = local_df(spark, rows, schema)
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_local_df_partition_contract(spark):
    tiny = local_df(spark, [(i,) for i in range(8)], "i bigint")
    assert tiny.rdd.getNumPartitions() == 1
    empty = local_df(spark, [], "i bigint")
    assert empty.rdd.getNumPartitions() == 1
    assert empty.count() == 0
    big = local_df(spark, [(i,) for i in range(25_000)], "i bigint")
    n = big.rdd.getNumPartitions()
    assert 1 < n <= spark.sparkContext.defaultParallelism
    assert big.count() == 25_000


def test_local_df_accepts_generators(spark):
    out = local_df(spark, ((i, str(i)) for i in range(3)), "a bigint, b string")
    assert sorted(map(tuple, out.collect())) == [(0, "0"), (1, "1"), (2, "2")]


def test_connected_components_flagged_convergence(spark):
    """The in-pass _chg flag must reproduce the old join-check labels:
    chain + clique + singleton-free edge set, known min-label result."""
    from dativo_ingest_spark.operators.dedup import connected_components

    pairs = local_df(
        spark,
        # chain 1-2-3-4 (diameter forces >1 round), clique 10-11-12,
        # isolated pair 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "id_a bigint, id_b bigint",
    )
    got = {(r.id, r.component)
           for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10), (12, 10), (20, 20), (21, 20)}
    # schema contract: exactly (id, component) — no leaked _chg column
    assert connected_components(pairs).columns == ["id", "component"]
