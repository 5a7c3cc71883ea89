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


@pytest.mark.parametrize("x", [0.0, -0.0, 1.5, -2.25, 1e-05, -1e-05, 0.1,
                               12345.6789, 1e300, 5e-324,
                               3.141592653589793])
def test_expr_double_literal_bit_identical(spark, x):
    """r14: expression builders now emit `{x!r}D` SQL literals instead of
    per-element F.lit py4j loops — pin bit-identity across the repr zoo
    (subnormals, huge, negative zero)."""
    import struct

    r = spark.range(1).select(
        F.lit(float(x)).alias("l"),
        F.expr(f"{float(x)!r}D").alias("e")).collect()[0]
    assert struct.pack("<d", r["l"]) == struct.pack("<d", r["e"])


def test_sign_band_keys_matches_column_construction(spark):
    """The SQL-string sign_band_keys must reproduce the old Column-API
    keys exactly (the committed dedup indexes depend on key stability)."""
    from dativo_ingest_spark.operators.similarity import sign_band_keys

    df = spark.range(50).select(
        F.transform(F.sequence(F.lit(0), F.lit(17)),
                    lambda i: F.sin(F.col("id") * (i + 1)))
        .alias("_vec"))

    def legacy(vec, bands, band_width):
        keys = []
        for t in range(bands):
            bits = []
            for i in range(band_width):
                ia = F.lit(2 * t * band_width + 2 * i)
                ib = F.lit(2 * t * band_width + 2 * i + 1 + t)
                a = F.element_at(vec, (ia % F.size(vec)) + 1)
                b = F.element_at(vec, (ib % F.size(vec)) + 1)
                bits.append(F.when(a > b, F.lit("1")).otherwise(F.lit("0")))
            keys.append(F.concat(F.lit(f"{t}:"), *bits))
        return F.array(*keys)

    got = df.select(
        sign_band_keys(F.col("_vec"), 4, 8).alias("n"),
        legacy(F.col("_vec"), 4, 8).alias("o")).collect()
    assert all(r["n"] == r["o"] for r in got)


def test_assign_inline_matches_legacy_argmin(spark):
    """The SQL-string struct-argmin must reproduce the old Column
    construction (codes feed committed PQ indexes)."""
    from dativo_ingest_spark.operators.quantization import _assign_inline

    cents = [[1.0, -2.5, 0.125, 7.75], [0.0, 0.0, 0.0, 0.0],
             [1e-05, 3.5, -4.25, 2.0]]
    df = spark.range(40).select(
        F.transform(F.sequence(F.lit(0), F.lit(3)),
                    lambda i: F.round(F.sin(F.col("id") * (i + 1)) * 8, 0)
                    .cast("long")).alias("qvec"))

    def legacy_sqdist(qvec, centroid):
        clit = F.array(*[F.lit(float(c)) for c in centroid])
        return F.aggregate(
            F.zip_with(F.col(qvec), clit, lambda x, c: (x - c) * (x - c)),
            F.lit(0.0), lambda acc, x: acc + x)

    def legacy(sub_col, centroids):
        entries = [
            F.struct(
                F.round(legacy_sqdist(sub_col, cvec), 9).alias("a"),
                F.lit(int(code)).cast("long").alias("i"))
            for code, cvec in enumerate(centroids)]
        return F.array_min(F.array(*entries))["i"]

    got = df.select(_assign_inline("qvec", cents).alias("n"),
                    legacy("qvec", cents).alias("o")).collect()
    assert all(r["n"] == r["o"] for r in got)


def test_catalyst_fixture_synthesis_byte_identical(spark):
    """r14: the image/audio fixture payloads are built in Catalyst (JVM
    md5 + hex assembly) instead of mapInPandas Python loops — pin byte
    identity against the original Python builders."""
    import hashlib
    import io
    import struct
    import wave

    ids = spark.range(20).select(
        F.col("id").alias("src"),
        (F.col("id") % 3).cast("int").alias("shift"),
        ((F.col("id") % 2) + 1).cast("int").alias("gain"))
    img = ids.select("src", "shift", F.expr(
        "concat(X'50350A31362031360A3235350A', unhex(concat_ws('', "
        "transform(sequence(0, 255), i -> lpad(hex(least("
        "CAST(conv(substring(md5(concat('px_', CAST(src AS STRING), '_', "
        "CAST(i AS STRING))), 1, 2), 16, 10) AS INT) + shift, 255)), 2, "
        "'0')))))").alias("media")).collect()
    for r in img:
        pix = bytes(
            min(int(hashlib.md5(f"px_{r.src}_{i}".encode())
                    .hexdigest()[:2], 16) + int(r.shift), 255)
            for i in range(256))
        assert r.media == b"P5\n16 16\n255\n" + pix

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<330h", *([0] * 330)))
    hdr_hex = buf.getvalue()[:44].hex()
    samp_sql = (
        "transform(sequence(0, 329), i -> pmod(((CAST(conv(substring("
        "md5(concat('au_', CAST(src AS STRING), '_', CAST(i AS STRING))), "
        "1, 4), 16, 10) AS INT) % 2000) - 1000) * gain, 65536))")
    wav = ids.select("src", "gain", F.expr(
        f"concat(X'{hdr_hex}', unhex(concat_ws('', "
        f"transform({samp_sql}, v -> concat(lpad(hex(v % 256), 2, '0'), "
        f"lpad(hex(CAST(v / 256 AS INT) % 256), 2, '0'))))))"
    ).alias("media")).collect()
    for r in wav:
        samples = [((int(hashlib.md5(f"au_{r.src}_{i}".encode())
                         .hexdigest()[:4], 16) % 2000) - 1000) * int(r.gain)
                   for i in range(330)]
        b2 = io.BytesIO()
        with wave.open(b2, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(struct.pack("<330h", *samples))
        assert r.media == b2.getvalue()


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
