"""Deterministic fixed-point k-means over embedding columns, UDF-free.

Corpus clustering is a standard curation primitive (topic balancing,
mixture analysis, cluster-based filtering a la SemDeDup). Plain Lloyd's
iterations on floating-point sums are NOT reproducible on a cluster: the
centroid update sums doubles in partition order, speculative execution or a
retry reorders the sum, and a row sitting near a cell boundary flips
clusters between runs. For a training-data pipeline that must be re-runnable
(and oracle-checkable), that is a correctness bug, not a nit.

This implementation makes every reduction exact:

* vectors are scaled to fixed-point longs once at scan stage
  (``round(x * scale)`` — half-away-from-zero in both Spark and DuckDB);
* the centroid update is ``sum(long) / count`` — integer partial
  aggregation is associative and commutative, so ANY partitioning,
  speculative rerun, or AQE re-plan produces the same centroid bits;
* the assignment distance is a sequential index-order fold (Catalyst
  higher-order functions, JVM-side) of ``(x_i - c_i)^2`` doubles derived
  from exact integers — bit-identical across engines that fold in the
  same order (DuckDB ``list_reduce``).

Scale shape (100 TB): per iteration one scan-stage assignment (centroids
inlined as codegen literals for small k — the same O(k x d) plan-size
gating as similarity.ivf_topk — and an Arrow-batched argmin past
``inline_centroid_limit``, bit-identical semantics, plan size O(1) in k:
the SemDeDup regime where k scales with the corpus) plus one shuffle
keyed on (cluster, position) whose map-side partial aggregation collapses
each task to at most k*d rows. Driver state is O(k·d) independent of N
(the seed fetch and the per-iteration (sum, count) cell collect) — at
k=50k, d=768 that is ~300 MB of longs per iteration, the practical
driver-memory bound; shard the centroid update into a joined frame
before going past that. Reference parity: the reference ships no
clustering operator (beyond-reference, same tier as the dedup/ANN
stack).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dativo_ingest_spark.functions import vectors

#: above this many centroids the inlined-literal assignment would bloat the
#: plan O(k x d); the Arrow-batched argmin takes over.
INLINE_CENTROID_LIMIT = 64

#: the plan-size gate that actually matters is TOTAL literals (k x d), not
#: k alone: at d=64 even k=32 inlines 2048 struct literals and the
#: whole-stage-codegen COMPILE dominates the job (measured 5-6 s vs 0.8 s
#: for the Arrow argmin on the same data). Inline only below this budget.
INLINE_LITERAL_BUDGET = 1024


def _sqdist_to_literal(qvec: str, centroid: Sequence[float]) -> F.Column:
    """Sequential-fold squared L2 distance from a long-vector column to an
    inlined double centroid — deterministic index-order fold.

    Built as ONE ``F.expr`` SQL string: the Column-API construction cost
    ~dim py4j roundtrips per centroid (~0.5 s per inline argmin at
    dim=64, measured r14) of pure driver time. ``{x!r}D`` double
    literals are bit-identical to ``F.lit(float(x))`` (pinned in
    tests/test_local_df.py's expr-parity suite)."""
    return F.expr(_sqdist_to_literal_sql(qvec, centroid))


def _sqdist_to_literal_sql(qvec: str, centroid: Sequence[float]) -> str:
    """The SQL fragment behind :func:`_sqdist_to_literal` — shared so
    argmin builders can compose it into one parsed expression."""
    arr = ", ".join(f"{float(c)!r}D" for c in centroid)
    return (f"aggregate(zip_with({qvec}, array({arr}), "
            f"(x, c) -> (x - c) * (x - c)), 0.0D, (acc, x) -> acc + x)")


def _spark_round9(x: float) -> float:
    """Replicate Spark's ``round(double, 9)``: BigDecimal HALF_UP on the
    double's SHORTEST decimal representation (``Double.toString`` ==
    Python ``repr`` in value — both emit the shortest round-tripping
    decimal). ``np.round`` is half-to-even on the scaled binary value and
    disagrees exactly at decimal half boundaries (round(5e-10, 9): Spark
    1e-9, numpy 0.0)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(Decimal("1e-9"),
                                         rounding=ROUND_HALF_UP))


def _assign_argmin_udf(centroid_items):
    """Arrow-batched nearest-centroid assignment for large ``k``: the
    centroid matrix rides in the UDF closure (one serialized copy per
    executor — the pandas-UDF analog of a broadcast variable), so plan
    size stays O(1) in the centroid count. Semantics-identical to the
    inlined-literal path: the distance accumulates as the SAME sequential
    index-order fold of IEEE doubles (``acc = acc + (x_j - c_j)^2``, one
    correctly-rounded multiply and add per dimension — numpy elementwise
    ops and the JVM round identically), and the rounded-9dp argmin with
    lower-cid ties is resolved in two tiers: when the margin between the
    two nearest distances exceeds 2e-9, no 9dp rounding can reorder or
    tie them, so the raw argmin is exact; ambiguous rows (exact ties —
    duplicate points — or sub-grid margins) fall to a per-row exact
    replication of Spark's HALF_UP decimal rounding
    (:func:`_spark_round9`) with first-minimum = lowest cid. The
    vectorized fast path covers essentially every row; the slow path
    guarantees the contract instead of assuming ``np.round`` == Spark
    ``round`` at half boundaries.

    ``centroid_items``: sorted list of (cid, centroid vector)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    ids = np.array([int(c) for c, _ in centroid_items], dtype=np.int64)
    mat = np.array([v for _, v in centroid_items],
                   dtype=np.float64)          # k x d

    @pandas_udf("long")
    def assign(vecs: pd.Series) -> pd.Series:
        V = np.stack(vecs.to_numpy()).astype(np.float64)   # B x d, exact
        acc = np.zeros((len(V), mat.shape[0]))
        # explicit per-dimension fold (NOT einsum/matmul/np.sum, whose
        # pairwise accumulation would drift a ulp from the Catalyst fold)
        for j in range(mat.shape[1]):
            diff = V[:, j, None] - mat[None, :, j]
            acc += diff * diff
        if mat.shape[0] == 1:
            return pd.Series(np.full(len(V), ids[0], dtype=np.int64))
        two = np.argpartition(acc, 1, axis=1)[:, :2]
        d_two = np.take_along_axis(acc, two, axis=1)
        swap = d_two[:, 0] > d_two[:, 1]
        best = np.where(swap, two[:, 1], two[:, 0])
        margin = np.abs(d_two[:, 1] - d_two[:, 0])
        out = ids[best]
        for i in np.nonzero(margin <= 2e-9)[0]:
            rounded = [_spark_round9(x) for x in acc[i]]
            m = min(rounded)
            out[i] = ids[next(j for j, x in enumerate(rounded) if x == m)]
        return pd.Series(out)

    return assign


def fixed_point_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 2,
    scale: int = 10_000,
    inline_centroid_limit: int = INLINE_CENTROID_LIMIT,
) -> DataFrame:
    """Lloyd's k-means over fixed-point vectors; returns (id, cluster).

    * init: the ``k`` lowest-``id_col`` rows seed the centroids (their ids
      become the cluster labels) — a deterministic stand-in for k-means||
      seeding; the iteration/shuffle shape is what matters and is identical.
    * ``n_iter`` update rounds, each: assign to nearest centroid (squared
      L2 on the fixed-point grid, rounded 9dp, ties to the lower cluster
      id) then recompute centroids as exact integer means. A cluster that
      loses all members keeps its previous centroid.
    * returns the assignment under the FINAL centroids, with ``cluster``
      as a long column.

    Fixed-point contract: element sums stay exact while
    ``n_rows * max|x| * scale < 2^53`` — at scale=1e4 and |x|<=8 that is
    ~1e14 rows, comfortably past a 100 TB corpus; raise ``scale`` only
    with that budget in mind.

    The quantized (id, qvec) frame is cached for the iteration passes and
    stays referenced by the returned assignment plan — call
    ``spark.catalog.clearCache()`` (or unpersist after materializing the
    result) in long-lived sessions; identical re-invocations reuse the
    same cache entry (CacheManager keys on the logical plan).
    """
    if k <= 0 or n_iter < 0:
        raise ValueError("k must be positive and n_iter non-negative")

    quantized = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            vectors.as_double_array(F.col(vec_col)),
            lambda x: F.round(x * scale).cast("long"),
        ).alias("qvec"),
    ).cache()

    seeds = quantized.orderBy("id").limit(k).collect()
    if not seeds:
        raise ValueError("empty input — no centroid seeds")
    # cluster label = seed row id; centroid starts at the seed vector.
    centroids: dict[int, list[float]] = {
        int(r["id"]): [float(x) for x in r["qvec"]] for r in seeds
    }

    def assign(frame: DataFrame) -> DataFrame:
        items = sorted(centroids.items())
        dim = len(items[0][1]) if items else 0
        if (len(items) > inline_centroid_limit
                or len(items) * dim > INLINE_LITERAL_BUDGET):
            # large k (the SemDeDup regime: k scales with the corpus):
            # Arrow-batched argmin keeps the plan O(1) in k — the inlined
            # path below would carry O(k x d) literals and choke the
            # optimizer long before the data moved. Same distance fold,
            # rounding and tie semantics (see _assign_argmin_udf).
            udf = _assign_argmin_udf(items)
            return frame.withColumn("cluster", udf(F.col("qvec")))
        entries = [
            F.struct(
                F.round(_sqdist_to_literal("qvec", cvec), 9).alias("a"),
                F.lit(int(cid)).cast("long").alias("i"),
            )
            for cid, cvec in items
        ]
        # struct min is lexicographic: nearest first, ties to lower cid.
        return frame.withColumn("cluster", F.array_min(F.array(*entries))["i"])

    for _ in range(n_iter):
        cells = (
            assign(quantized)
            .select("cluster", F.posexplode("qvec").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        updated: dict[int, list[float]] = {}
        for r in cells:
            vec = updated.setdefault(
                int(r["cluster"]), [0.0] * len(next(iter(centroids.values())))
            )
            # float/float division == DuckDB double division (both exact
            # inputs below 2^53, one correctly-rounded IEEE op).
            vec[int(r["pos"])] = float(r["s"]) / float(r["n"])
        for cid in centroids:  # empty cluster keeps its previous centroid
            if cid in updated:
                centroids[cid] = updated[cid]

    return assign(quantized).select("id", "cluster")
