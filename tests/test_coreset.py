"""Greedy k-center invariants: cluster coverage before densification,
exact-integer determinism under layout changes, early stop on duplicate
collapse, and the coverage-map assignment (operators/coreset.py)."""

from pyspark.sql import functions as F

from dativo_ingest_spark.operators import coreset


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, emb array<float>")


def test_covers_clusters_before_densifying(spark):
    # three tight clusters far apart: the first three selections must
    # land one in each cluster (farthest-point property)
    rows = []
    for cid, base in enumerate([0.0, 10.0, -10.0]):
        for j in range(5):
            rows.append((cid * 10 + j, [base + j * 0.01, base - j * 0.01]))
    sel = coreset.kcenter_select(_emb(spark, rows), "emb", "vec_id", k=3)
    clusters = {vid // 10 for _, vid, _ in sel}
    assert clusters == {0, 1, 2}
    # seed is the smallest id; radii are non-increasing after round 1
    assert sel[0] == (0, 0, 0)
    assert sel[1][2] >= sel[2][2] > 0


def test_layout_invariant_and_deterministic(spark):
    rows = [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(40)]
    a = coreset.kcenter_select(_emb(spark, rows), "emb", "vec_id", k=5)
    b = coreset.kcenter_select(
        _emb(spark, rows).repartition(9), "emb", "vec_id", k=5)
    assert a == b and len(a) == 5


def test_early_stop_when_points_collapse(spark):
    rows = [(i, [1.0, 2.0]) for i in range(10)] + [(99, [5.0, 5.0])]
    sel = coreset.kcenter_select(_emb(spark, rows), "emb", "vec_id", k=4)
    # only two distinct locations exist: selection stops at 2
    assert [vid for _, vid, _ in sel] == [0, 99]


def test_zero_length_vectors_excluded(spark):
    rows = [(1, [1.0, 1.0]), (2, []), (3, [3.0, 3.0])]
    sel = coreset.kcenter_select(_emb(spark, rows), "emb", "vec_id", k=3)
    assert [vid for _, vid, _ in sel] == [1, 3]


def test_assign_to_centers_nearest_and_exact(spark):
    rows = [(1, [0.0, 0.0]), (2, [10.0, 0.0]), (3, [9.0, 0.0])]
    df = _emb(spark, rows)
    centers = [[0, 0], [10_000_000, 0]]  # micro codes of (0,0), (10,0)
    out = {r.vec_id: (r._center, r._dist2)
           for r in coreset.assign_to_centers(df, "emb", centers).collect()}
    assert out[1] == (0, 0)
    assert out[2] == (1, 0)
    # 9.0 -> 1e6*9 = 9_000_000; dist to center1 = 1_000_000^2
    assert out[3] == (1, 1_000_000 ** 2)


def test_df_wrapper_schema(spark):
    rows = [(i, [float(i), 0.0]) for i in range(4)]
    out = coreset.kcenter_select_df(spark, _emb(spark, rows),
                                    "emb", "vec_id", k=2)
    assert out.columns == ["sel_round", "vec_id", "dist2"]
    got = [(r.sel_round, r.vec_id) for r in out.orderBy("sel_round").collect()]
    assert got == [(0, 0), (1, 3)]
