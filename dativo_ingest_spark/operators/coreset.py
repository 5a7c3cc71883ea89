"""Diversity-maximizing coreset selection: greedy k-center over an
embedding column (farthest-point traversal).

Training-data curation wants a small subset that *covers* the embedding
space — prototypes for labeling, seed sets for active learning, diverse
eval panels — which is the metric k-center problem. The greedy
farthest-point rule (pick the point farthest from everything selected so
far) is the classic 2-approximation (Gonzalez 1985) and needs no fitted
state: each round is one full pass computing every point's distance to
its NEAREST selected center, then an argmax.

Spark shape per round (INCREMENTAL since r12): the frame carries a
running ``_d`` = exact squared distance to the nearest selected
center; each round folds in ONLY the newest center
(``least(_d, int_sqdist(codes, new_center))`` — one O(d) Catalyst
higher-order fold over exact BIGINT micro-unit codes) and takes the
argmax with a per-partition top-1 (``TakeOrderedAndProject``, no
shuffle). ``least`` over exact integers is associative, so the
running minimum is BIT-IDENTICAL to re-evaluating all centers (the
pre-r12 form — which cost O(n·k²) distance folds and an O(k·d) plan
per round; pinned by tests). Total cost: k cached scans with O(d)
plan size per round — the irreducible price of exact greedy
k-center; the driver holds only the k selected rows (control plane,
not data). The working frame persists between rounds
(MEMORY_AND_DISK; each round's frame unpersists one round late so
the update never recomputes lineage).

At 100 TB: k cached passes over the corpus is the real cost model —
use this for modest k (10s-100s). Beyond that, compose with
IVF/k-means (operators/clustering.py) to pre-partition and run
greedy selection per cell, or sample-then-select (the standard
coreset-of-coreset cascade).

No reference analog; standard technique (Gonzalez's farthest-point
traversal; used for SemDeDup-style curation seeds and active-learning
coresets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dativo_ingest_spark.functions import vectors
from dativo_ingest_spark.operators.util import local_df


def _sqdist_to_literal(codes_col, center: list[int]):
    # one parsed literal (the per-element F.lit loop cost dim py4j
    # roundtrips of driver build time per selection round)
    lit = F.expr("array(" + ", ".join(
        f"CAST({int(v)} AS BIGINT)" for v in center) + ")")
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
    # incremental farthest-point: cur carries _d = min distance to all
    # selected centers; each round folds in only the NEWEST center.
    # cur materializes via the round's argmax collect; the superseded
    # frame unpersists one round late so the update reads the cache,
    # never recomputed lineage.
    cur = base.select(
        "_id", "_codes",
        _sqdist_to_literal(F.col("_codes"), centers[0]).alias("_d"),
    ).persist()
    stale = None
    try:
        for rnd in range(1, k):
            far = (
                cur.orderBy(F.desc("_d"), F.asc("_id"))
                .limit(1)
                .collect()
            )
            if stale is not None:
                stale.unpersist()
                stale = None
            if not far or far[0]._d == 0:
                break  # fewer than k distinct points — selection done
            selections.append((rnd, far[0]._id, far[0]._d))
            centers.append(list(far[0]._codes))
            if rnd < k - 1:
                nxt = cur.select(
                    "_id", "_codes",
                    F.least(
                        F.col("_d"),
                        _sqdist_to_literal(F.col("_codes"), centers[-1]),
                    ).alias("_d"),
                ).persist()
                stale, cur = cur, nxt
    finally:
        cur.unpersist()
        if stale is not None:
            stale.unpersist()
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
    return local_df(spark, 
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
