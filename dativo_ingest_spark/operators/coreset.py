"""Diversity-maximizing coreset selection: greedy k-center over an
embedding column (farthest-point traversal).

Training-data curation wants a small subset that *covers* the embedding
space — prototypes for labeling, seed sets for active learning, diverse
eval panels — which is the metric k-center problem. The greedy
farthest-point rule (pick the point farthest from everything selected so
far) is the classic 2-approximation (Gonzalez 1985) and needs no fitted
state: each round is one full pass computing every point's distance to
its NEAREST selected center, then an argmax.

Spark shape per round: the selected centers ride the plan as inline
integer literals (k * d longs — tiny), the per-row min-distance is a
Catalyst higher-order fold (`functions/vectors.py:int_sqdist` over
micro-unit codes — exact BIGINTs, so the argmax is engine-portable with
no float tie ambiguity), and the argmax itself is a
``max(struct(dist, -id))`` single-row aggregate. Total cost: k scans, the
irreducible price of exact greedy k-center; the driver holds only the
k selected rows (control plane, not data).

At 100 TB: k passes over the corpus is the real cost model — use this
for modest k (10s-100s). Beyond that, compose with IVF/k-means
(operators/clustering.py) to pre-partition and run greedy selection per
cell, or sample-then-select (the standard coreset-of-coreset cascade).
The inline-literal plan grows O(k*d); past the shared
``INLINE_LITERAL_BUDGET`` discipline (clustering.py) an Arrow argmin
kernel is the swap — documented, not needed at selection-scale k.

No reference analog; standard technique (Gonzalez's farthest-point
traversal; used for SemDeDup-style curation seeds and active-learning
coresets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dativo_ingest_spark.functions import vectors


def _sqdist_to_literal(codes_col, center: list[int]):
    lit = F.array(*[F.lit(int(v)).cast("long") for v in center])
    return vectors.int_sqdist(codes_col, lit)


def kcenter_select(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
) -> list[tuple[int, object, int]]:
    """Greedy k-center selection. Returns ``[(sel_round, id, dist2)]`` —
    ``dist2`` is the squared micro-unit L2 distance from the selected
    point to the nearest PREVIOUS center at selection time (0 for the
    seed), i.e. the coverage radius achieved as each center lands.

    Seed = smallest id (deterministic, layout-independent); each
    subsequent round picks max (min-distance-to-selected, tie -> smallest
    id). Zero-length/null vectors are excluded up front (they carry no
    geometry — same policy as the ANN operators' zero-norm guard).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    base = (
        df.select(F.col(id_col).alias("_id"),
                  vectors.micro_codes(F.col(vec_col)).alias("_codes"))
        .filter(F.col("_codes").isNotNull() & (F.size("_codes") > 0))
    )
    seed = base.orderBy("_id").limit(1).collect()
    if not seed:
        return []
    selections: list[tuple[int, object, int]] = [(0, seed[0]._id, 0)]
    centers = [list(seed[0]._codes)]
    for rnd in range(1, k):
        dmin = _sqdist_to_literal(F.col("_codes"), centers[0])
        for c in centers[1:]:
            dmin = F.least(dmin, _sqdist_to_literal(F.col("_codes"), c))
        far = (
            base.select("_id", "_codes", dmin.alias("_d"))
            .orderBy(F.desc("_d"), F.asc("_id"))
            .limit(1)
            .collect()
        )
        if not far or far[0]._d == 0:
            break  # fewer than k distinct points — selection is complete
        selections.append((rnd, far[0]._id, far[0]._d))
        centers.append(list(far[0]._codes))
    return selections


def kcenter_select_df(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """DataFrame wrapper over :func:`kcenter_select`:
    ``[sel_round bigint, id, dist2 bigint]`` (id column keeps its name)."""
    sel = kcenter_select(df, vec_col, id_col, k)
    return spark.createDataFrame(
        [(int(r), i, int(d)) for r, i, d in sel],
        f"sel_round bigint, {id_col} bigint, dist2 bigint")


def assign_to_centers(
    df: DataFrame,
    vec_col: str,
    centers: list[list[int]],
) -> DataFrame:
    """Tag every row with the index of (and exact distance to) its
    nearest selected center — the coverage map that turns a selection
    into strata for sampling/eval. One scan, inline literals, no
    shuffle."""
    if not centers:
        raise ValueError("centers must be non-empty")
    codes = vectors.micro_codes(F.col(vec_col))
    best = F.struct(
        _sqdist_to_literal(codes, centers[0]).alias("d"),
        F.lit(0).alias("c"))
    for i, c in enumerate(centers[1:], start=1):
        cand = F.struct(
            _sqdist_to_literal(codes, c).alias("d"), F.lit(i).alias("c"))
        best = F.least(best, cand)
    return df.withColumn("_center", best["c"]).withColumn(
        "_dist2", best["d"])
