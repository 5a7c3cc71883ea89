"""Similarity search: IVF vs brute-force recall, zero-norm guards."""

from __future__ import annotations

from pyspark.sql import functions as F

from dativo_ingest_spark.operators import similarity
from dativo_ingest_spark.queries import load
from tests.conftest import SF_DIR


def test_ivf_recall_vs_bruteforce(spark):
    emb = load(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in
             similarity.brute_force_topk(emb, q, "vec_id", "embedding",
                                         k=10).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in
              similarity.ivf_topk(emb, q, "vec_id", "embedding", k=10,
                                  n_centroids=8, n_probe=2).collect()}
    # IVF is approximate; with 2/8 cells probed demand recall >= 0.5 and a
    # correctly bounded result size
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    per_query = {}
    for qid, _ in approx:
        per_query[qid] = per_query.get(qid, 0) + 1
    assert all(n <= 10 for n in per_query.values())


def test_ivf_more_probes_more_recall(spark):
    emb = load(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in
             similarity.brute_force_topk(emb, q, "vec_id", "embedding",
                                         k=10).collect()}

    def recall(n_probe):
        approx = {(r.query_id, r.neighbor_id) for r in
                  similarity.ivf_topk(emb, q, "vec_id", "embedding", k=10,
                                      n_centroids=8, n_probe=n_probe).collect()}
        return len(exact & approx) / len(exact)

    r1, r8 = recall(1), recall(8)
    assert r8 >= r1
    assert r8 == 1.0  # probing every cell degenerates to exact search


def test_zero_norm_vectors_null_cosine(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.0, 2.0])],
        "vec_id bigint, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") == 0)
    rows = {r.neighbor_id: r.cosine for r in
            similarity.brute_force_topk(df, q, "vec_id", "embedding",
                                        k=5).collect()}
    assert rows[1] is None  # zero-norm → NULL, not division error
    assert rows[2] == 0.0


def test_quantized_recall_vs_bruteforce(spark):
    emb = load(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in
             similarity.brute_force_topk(emb, q, "vec_id", "embedding",
                                         k=10).collect()}
    quant = {(r.query_id, r.neighbor_id) for r in
             similarity.quantized_topk(emb, q, "vec_id", "embedding",
                                       k=10).collect()}
    # int8 quantization distorts scores only slightly: demand recall >= 0.9
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, f"int8 recall too low: {recall}"


def test_quantize_codes_bounded_and_zero_guarded(spark):
    from dativo_ingest_spark.functions import vectors

    df = spark.createDataFrame(
        [(1, [3.0, -1.5, 0.75]), (2, [0.0, 0.0, 0.0])],
        "id long, v array<double>")
    out = {r["id"]: r for r in df.select(
        "id",
        vectors.quantize_int8(F.col("v")).alias("q"),
        vectors.int_dot(vectors.quantize_int8(F.col("v")),
                        vectors.quantize_int8(F.col("v"))).alias("qq"),
    ).collect()}
    assert out[1]["q"] == [127, -64, 32]   # max |x| maps to ±127
    assert out[2]["q"] == [0, 0, 0] and out[2]["qq"] == 0
    assert all(-127 <= c <= 127 for c in out[1]["q"])


def test_ivf_udf_path_matches_literal_path(spark):
    """Forcing the pandas-UDF centroid scorer (inline_centroid_limit=0)
    reproduces the inlined-literal path's results exactly — same 9dp
    rounding, same tie-to-higher-cell-id ordering."""
    emb = load(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    lit_rows = {(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in
                similarity.ivf_topk(emb, q, "vec_id", "embedding", k=10,
                                    n_centroids=8, n_probe=2).collect()}
    udf_rows = {(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in
                similarity.ivf_topk(emb, q, "vec_id", "embedding", k=10,
                                    n_centroids=8, n_probe=2,
                                    inline_centroid_limit=0).collect()}
    assert lit_rows == udf_rows


def test_ivf_scales_past_inline_limit(spark):
    """n_centroids above IVF_INLINE_CENTROID_LIMIT switches to the
    pandas-UDF scorer: recall holds and the plan stays O(1) in the
    centroid count (no literal explosion)."""
    emb = load(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in
             similarity.brute_force_topk(emb, q, "vec_id", "embedding",
                                         k=10).collect()}
    df = similarity.ivf_topk(emb, q, "vec_id", "embedding", k=10,
                             n_centroids=128, n_probe=32)
    approx = {(r.query_id, r.neighbor_id) for r in df.collect()}
    assert len(exact & approx) / len(exact) >= 0.5
    # plan-size bound: 128 centroids x 64 dims inlined would be ~8k+
    # literals; the UDF plan must not carry them
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 50_000, f"plan blew up: {len(plan)} chars"


def test_broadcast_guard_warn_and_error(spark, caplog):
    import logging

    import pytest

    emb = load(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try:
        with pytest.raises(ValueError, match="exceeds"):
            similarity.brute_force_topk(emb, q, "vec_id", "embedding",
                                        k=5, broadcast_guard="error")
        with pytest.raises(ValueError, match="exceeds"):
            similarity.quantized_topk(emb, q, "vec_id", "embedding",
                                      k=5, broadcast_guard="error")
        with caplog.at_level(logging.WARNING,
                             logger="dativo_ingest_spark.operators.similarity"):
            similarity.brute_force_topk(emb, q, "vec_id", "embedding", k=5)
        assert any("exceeds" in r.message for r in caplog.records)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # guard off / within threshold: no exception, query still correct
    rows = similarity.brute_force_topk(
        emb, q.limit(2), "vec_id", "embedding", k=3,
        broadcast_guard="off").collect()
    assert len(rows) == 6
