"""Sketch-based approximate aggregation with accuracy contracts.

At 100 TB an exact ``count(DISTINCT user)`` over a high-cardinality key is
a full shuffle of every distinct value; the HyperLogLog++ sketch replaces
it with a fixed-size (≤ a few KB) mergeable state per group — partial
sketches combine map-side, so the exchange moves kilobytes per group
regardless of corpus size. The price is a relative error ~1.04/sqrt(2^p);
this module makes that contract *checkable* by computing the sketch and
the exact count side by side and emitting a per-group pass/fail.

In production the exact column is dropped and only the sketch runs; the
paired form exists so the accuracy claim is a regression-testable output
(and a driver-provable query) rather than folklore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_check(
    df: DataFrame,
    group_col: str,
    key_col: str,
    rsd: float = 0.02,
    tolerance: float = 0.05,
) -> DataFrame:
    """(group, exact, approx_ok): HLL++ count-distinct vs the exact count.

    ``approx_ok`` is true when the sketch lands within ``tolerance``
    relative error of the exact count. The sketch estimate itself is
    deterministic for a given dataset (hash-based, seed-free) but NOT
    portable across engines, so the boolean — not the estimate — is the
    comparable output.
    """
    return (
        df.groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count_distinct(F.col(key_col)).alias("exact"),
            F.approx_count_distinct(F.col(key_col), rsd).alias("_approx"),
        )
        .select(
            "group",
            "exact",
            (
                F.abs(F.col("_approx") - F.col("exact"))
                <= F.lit(float(tolerance)) * F.col("exact")
            ).alias("approx_ok"),
        )
    )


def approx_quantile_rank_check(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q: float = 0.5,
    accuracy: int = 10000,
    rank_tolerance: float = 0.05,
) -> DataFrame:
    """(group, n, rank_ok): percentile_approx honored as a RANK contract.

    Quantile sketches (Spark's Greenwald-Khanna variant, t-digest, KLL)
    guarantee rank error — the returned value sits within ``eps·n`` ranks
    of the true q-quantile — not value error, so the checkable contract is
    rank-based: the fraction of values <= the sketch's answer must lie
    within ``rank_tolerance`` of ``q``.  Computed as a second aggregate
    over the same grouping key with the (group, quantile) frame broadcast
    back — two shuffles total, both on the group key; state per group is
    O(1/eps), so the exchange moves KB per group at any corpus size.
    """
    # percentile_approx ignores nulls, so the rank fraction must count
    # only non-null values too — otherwise a group with nulls spuriously
    # fails the contract even when the sketch met its guarantee
    vals = df.select(
        F.col(group_col).alias("group"), F.col(value_col).alias("_v")
    ).filter(F.col("_v").isNotNull())
    qv = (
        vals.groupBy("group")
        .agg(F.percentile_approx(F.col("_v"), q, accuracy).alias("_qv"))
    )
    return (
        vals.join(F.broadcast(qv), "group")
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.abs(
                    F.sum((F.col("_v") <= F.col("_qv")).cast("long"))
                    .cast("double") / F.count(F.lit(1)) - F.lit(float(q))
                ) <= F.lit(float(rank_tolerance))
            ).alias("rank_ok"),
        )
    )


def spacesaving_candidates(
    items: DataFrame,
    item_col: str,
    capacity: int = 1000,
) -> DataFrame:
    """Per-partition SpaceSaving (Metwally et al. 2005) heavy-hitter
    candidate generation: each partition keeps at most ``capacity``
    counters, evicting the minimum; the union of all partitions'
    surviving items is returned (≤ capacity × partitions rows).

    The guarantee that makes this composable: a partition's counter
    error is at most ``N_p / capacity``, so an item whose GLOBAL count
    exceeds ``N / capacity`` must survive in at least one partition —
    the candidate set is a superset of every item at or above that
    frequency. Items below it may or may not appear; the exact-recount
    pass in :func:`frequent_items` makes the final answer exact either
    way.

    Scale shape: one Arrow-batched scan (state = ``capacity`` dict
    entries per partition, O(1) memory), no shuffle at all — the
    vocabulary-sized exchange an exact top-k would pay never happens
    here.
    """
    import pandas as pd

    def sketch(batches):
        counters: dict = {}
        for pdf in batches:
            # value_counts folds the row loop into a unique-items loop
            # (Zipf: far smaller); bulk-increment/evict is equivalent to
            # a reordered per-item stream, and SpaceSaving's bounds hold
            # for ANY stream order
            for it, c in pdf[item_col].value_counts().items():
                c = int(c)
                if it in counters:
                    counters[it] += c
                elif len(counters) < capacity:
                    counters[it] = c
                else:
                    m_key = min(counters, key=counters.get)
                    m = counters.pop(m_key)
                    counters[it] = m + c
        yield pd.DataFrame({item_col: list(counters.keys())})

    # Output schema mirrors the input column's type: a hardcoded
    # `string` would make non-string keys fail Arrow conversion (or
    # silently coerce, turning the downstream semi-join into an
    # implicit-cast comparison against the original typed column).
    projected = items.select(item_col)
    out_type = projected.schema[item_col].dataType.simpleString()
    return (projected
            .mapInPandas(sketch, schema=f"{item_col} {out_type}")
            .dropDuplicates([item_col]))


def frequent_items(
    items: DataFrame,
    item_col: str,
    threshold_fraction: float = 0.001,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT frequent-items above a frequency threshold, at sketch cost:
    SpaceSaving candidates (superset-guaranteed, zero shuffle) → exact
    recount of the candidates only (broadcast semi-join, candidate-sized
    aggregate) → filter ``count >= ceil(N * threshold_fraction)``.

    Correct whenever ``capacity >= 1 / threshold_fraction`` (then the
    candidate guarantee covers every item at the threshold) — enforced
    here. The output is therefore EXACT and deterministic: identical to
    the naive full GROUP BY, but the exchange moves candidate rows
    (≤ capacity × partitions), never the vocabulary. The classic
    two-pass heavy-hitter recipe (Cormode & Hadjieleftheriou 2008
    survey) expressed Spark-first.

    Returns (item, n) for items with exact count ≥ the threshold.
    """
    cap = capacity or max(int(2.0 / threshold_fraction), 100)
    if cap * threshold_fraction < 1.0:
        raise ValueError(
            f"capacity {cap} cannot guarantee completeness at "
            f"threshold_fraction {threshold_fraction}: need capacity >= "
            f"{1.0 / threshold_fraction:.0f}")
    items = items.select(F.col(item_col).alias("item")).persist()
    try:
        n_total = items.count()
        cands = spacesaving_candidates(items, "item", capacity=cap)
        thresh = int(n_total * threshold_fraction)
        if n_total * threshold_fraction > thresh:
            thresh += 1                      # ceil
        exact = (items.join(F.broadcast(cands), "item", "left_semi")
                 .groupBy("item")
                 .agg(F.count(F.lit(1)).alias("n"))
                 .filter(F.col("n") >= F.lit(max(thresh, 1))))
        return exact.localCheckpoint(eager=True)
    finally:
        items.unpersist()


def cm_sketch(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over a key
    column: ``depth`` hash rows × ``width`` counters, each counter the
    summed weight of keys hashing into it. The point-query complement
    of the other sketches here (HLL answers "how many distinct",
    SpaceSaving "which are the heaviest"; CM answers "about how often
    does THIS key occur" for ANY key in O(depth) lookups from KBs of
    state — per-key counts without a vocabulary-sized table).

    Returns (row, col, count) — only non-zero cells, ``depth*width``
    rows at most, mergeable across batches/partitions by plain cell
    summation (pin in tests). Hashing is the engine-portable md5-chunk
    scheme (functions/hashing.py), so the sketch is bit-identical
    across engines and a DuckDB oracle can rebuild it exactly.

    Scale: one partial-aggregable shuffle keyed on (row, col) —
    ~``depth*width`` distinct keys regardless of input size; the
    estimate (:func:`cm_estimate`) reads the driver-collected cells.
    Estimates OVERCOUNT only (collisions add, never subtract):
    E[error] <= 2N/width per row, min over depth rows.
    """
    if width < 2 or depth < 1:
        raise ValueError("width must be >= 2 and depth >= 1")
    from dativo_ingest_spark.functions import hashing

    h = hashing.chunked_gram_hashes(
        F.col(key_col).cast("string"), depth)
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    rows = []
    for r in range(depth):
        rows.append(F.struct(
            F.lit(r).alias("row"),
            (F.conv(F.substring(h, r * 8 + 1, 8), 16, 10).cast("long")
             % width).alias("col"),
            w.alias("w"),
        ))
    return (
        df.select(F.explode(F.array(*rows)).alias("_c"))
        .groupBy(F.col("_c.row").alias("row"),
                 F.col("_c.col").alias("col"))
        .agg(F.sum("_c.w").alias("count"))
    )


def cm_estimate(cells, key: str, width: int = 1024,
                depth: int = 4) -> int:
    """Point-query a collected Count-Min sketch: min over the key's
    ``depth`` counters. ``cells`` = iterable of (row, col, count) (the
    collected :func:`cm_sketch` output). Pure driver-side Python —
    replays the identical md5-chunk bucket arithmetic."""
    import hashlib

    table = {(int(r), int(c)): int(n) for r, c, n in cells}
    n_md5 = -(-depth // 4)
    hexes = ""
    for i in range(n_md5):
        hexes += hashlib.md5(
            (("x" * i) + str(key)).encode()).hexdigest()
    best = None
    for r in range(depth):
        col = int(hexes[r * 8:(r + 1) * 8], 16) % width
        v = table.get((r, col), 0)
        best = v if best is None else min(best, v)
    return int(best)


def build_sketch_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    out_dir: str,
) -> None:
    """Materialize a (day, key) sketch rollup table: one row per day and
    key holding an HLL sketch of the value column (Apache DataSketches
    binary — MERGEABLE) plus the exact row count. The Druid/Pinot
    serving-layer pattern: the rollup is day-grain KBs instead of
    corpus-grain rows, persists as plain parquet (binary column), and
    any later query answers count-distinct over ARBITRARY day ranges
    and regroupings by unioning sketches — the raw data never re-scans.

    Scale: one (day, key)-grain partial-agg shuffle to build; serving
    reads touch only the rollup (days x keys rows).
    """
    day = F.expr(
        f"unix_micros(CAST(`{ts_col}` AS TIMESTAMP)) div 86400000000")
    (df.select(day.alias("day"), F.col(key_col).alias("key"),
               F.col(value_col).alias("v"))
     .groupBy("day", "key")
     .agg(F.hll_sketch_agg("v").alias("sk"),
          F.count(F.lit(1)).alias("n_rows"))
     .write.mode("overwrite").parquet(out_dir))


def serve_distinct(
    spark,
    rollup_dir: str,
    group_expr: str,
    where: str | None = None,
) -> DataFrame:
    """Answer approximate count-distinct from a persisted sketch rollup
    (see :func:`build_sketch_rollup`) — (group, approx_distinct) —
    grouping by any expression over (day, key) and optionally filtering
    days: the re-aggregation happens by sketch UNION through storage,
    proving the mergeability contract end to end (sketch bytes survive
    parquet and recombine across different groupings than they were
    built under)."""
    roll = spark.read.parquet(rollup_dir)
    if where:
        roll = roll.filter(where)
    return (roll.select(F.expr(group_expr).alias("group"), "sk")
            .groupBy("group")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                 .cast("long").alias("approx_distinct")))
