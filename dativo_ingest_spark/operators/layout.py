"""Z-order data layout: multi-column clustering for file skipping.

A table sorted on one column prunes predicates on THAT column only — the
min/max ranges of every other column span the whole domain in every file.
Interleaving the bits of several columns into one sort key (a Morton /
Z-order curve) keeps rows that are close in ALL dimensions close on disk,
so each file covers a small hyper-rectangle and per-file [min, max] stats
(sinks/table_commit.py:_footer_stats + file_excluded) prune range
predicates on ANY of the curve columns. This is the standard lakehouse
OPTIMIZE ZORDER BY move, built here from Catalyst bit expressions — no
UDF, no shuffle beyond the one range-repartition the rewrite needs anyway.

Scale shape (100 TB): one pass — compute the key at scan stage,
``repartitionByRange`` on it (range exchange with sampled bounds), sort
within partitions, write. The curve quantizes each column to ``bits``
levels between fixed [lo, hi] bounds; pass literal bounds for
reproducibility (data-derived bounds change as data arrives and would
re-deal the curve — compute them once and pin them, like a dictionary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: per-column quantization levels; bits * n_cols must stay < 63 (long key)
DEFAULT_BITS = 12


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Rank a value into [0, 2^bits) between literal bounds (clamped)."""
    levels = (1 << bits) - 1
    span = float(hi) - float(lo)
    if span <= 0:
        raise ValueError(f"invalid range [{lo}, {hi}]")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(levels)
    ).cast("long")
    return F.greatest(F.lit(0).cast("long"),
                      F.least(F.lit(levels).cast("long"), scaled))


def zorder_key(cols: dict[str, tuple[float, float]],
               bits: int = DEFAULT_BITS) -> Column:
    """Morton key interleaving the quantized bits of ``cols``
    (name -> (lo, hi) literal bounds). Column j contributes its bit i at
    output position ``i * n_cols + j`` — the canonical round-robin
    interleave. Pure integer Catalyst expressions; NULLs quantize to 0
    (they cluster at the curve origin rather than poisoning the sort).
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 62:
        raise ValueError(f"bits*cols = {bits * n} exceeds the long key")
    parts = [
        F.coalesce(_quantize(F.col(name), lo, hi, bits),
                   F.lit(0).cast("long"))
        for name, (lo, hi) in cols.items()
    ]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, p in enumerate(parts):
            bit = F.shiftright(p, i).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def zorder_by(
    df: DataFrame,
    cols: dict[str, tuple[float, float]],
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
    key_col: str = "_zkey",
) -> DataFrame:
    """Cluster ``df`` along the Z-curve of ``cols`` into ``n_files``
    range partitions (each becoming one tight-hyper-rectangle file on
    write). The key column is kept so callers can inspect or re-sort;
    drop it before persisting if the sink schema is fixed."""
    keyed = df.withColumn(key_col, zorder_key(cols, bits))
    return keyed.repartitionByRange(n_files, key_col)\
                .sortWithinPartitions(key_col)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: dict[str, tuple[float, float]],
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write a Z-ordered parquet layout (one file per range partition).
    Pair with FsTable.add_files(stats_columns=list(cols)) so the manifest
    carries the tight per-file ranges the curve creates."""
    zorder_by(df, cols, n_files, bits).drop("_zkey")\
        .write.mode("overwrite").parquet(path)
