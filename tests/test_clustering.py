"""Fixed-point k-means invariants: the whole point of the operator is that
results are a pure function of the data — independent of partition layout
(speculation/retry-stable) — and that every row lands in exactly one
cluster seeded by the k lowest ids (operators/clustering.py docstring)."""

import pytest

from pyspark.sql import functions as F

from dativo_ingest_spark.operators import clustering
from dativo_ingest_spark.queries import load

SF = "/root/testdata/sf0.001"


def _assignments(df):
    return {(r.id, r.cluster) for r in df.collect()}


def test_partition_layout_invariant(spark):
    emb = load(spark, SF, "embeddings")
    a = clustering.fixed_point_kmeans(emb, "vec_id", "embedding", k=4, n_iter=2)
    b = clustering.fixed_point_kmeans(
        emb.repartition(13), "vec_id", "embedding", k=4, n_iter=2
    )
    assert _assignments(a) == _assignments(b)


def test_covers_every_row_with_seed_labels(spark):
    emb = load(spark, SF, "embeddings")
    out = clustering.fixed_point_kmeans(emb, "vec_id", "embedding", k=4, n_iter=1)
    assert out.count() == emb.count()
    clusters = {r.cluster for r in out.select("cluster").distinct().collect()}
    # cluster labels are the seed ids (4 lowest vec_ids)
    assert clusters <= {0, 1, 2, 3}
    assert dict(out.dtypes)["cluster"] == "bigint"


def test_iterations_refine_assignment(spark):
    # with zero iterations the assignment is nearest-seed; more iterations
    # must still produce a full partition of the data (and usually differ).
    emb = load(spark, SF, "embeddings")
    zero = clustering.fixed_point_kmeans(emb, "vec_id", "embedding", k=4, n_iter=0)
    two = clustering.fixed_point_kmeans(emb, "vec_id", "embedding", k=4, n_iter=2)
    assert zero.count() == two.count() == emb.count()
    assert _assignments(zero) != _assignments(two)  # data is not degenerate


def test_rejects_bad_params(spark):
    emb = load(spark, SF, "embeddings")
    with pytest.raises(ValueError):
        clustering.fixed_point_kmeans(emb, "vec_id", "embedding", k=0)
    with pytest.raises(NotImplementedError):
        clustering.fixed_point_kmeans(
            emb, "vec_id", "embedding", k=100, inline_centroid_limit=64
        )
    with pytest.raises(ValueError):
        clustering.fixed_point_kmeans(
            emb.filter(F.lit(False)), "vec_id", "embedding", k=2
        )


def test_empty_cluster_keeps_centroid(spark):
    # two far-apart groups + a seed that immediately loses all members:
    # k=3 over data where seeds 0 and 1 are identical points — one of them
    # empties after the first update and must keep (not NaN) its centroid.
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [10.0, 10.0]),
            (3, [10.0, 10.0]), (4, [10.0, 10.1]), (5, [0.0, 0.1])]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    out = clustering.fixed_point_kmeans(df, "id", "vec", k=3, n_iter=2)
    got = _assignments(out)
    assert len(got) == 6  # every row assigned exactly once
    assert all(c in (0, 1, 2) for _, c in got)
