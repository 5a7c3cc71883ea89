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
