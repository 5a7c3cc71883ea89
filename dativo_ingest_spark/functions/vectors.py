"""Vector math over ``array<float|double>`` columns, UDF-free.

``zip_with`` + ``aggregate`` compile to Catalyst higher-order functions that
run JVM-side with a sequential left fold — the fold order is deterministic
(index order), so results are bit-reproducible and oracle-comparable against
an engine folding in the same order (DuckDB ``list_reduce``). For large-scale
similarity search this keeps the O(n·d) inner loop out of Python entirely;
when d is large and batch throughput matters more than plan fusion, a
vectorized pandas-UDF path can replace these per-pair expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(None).cast("double")).otherwise(
        d / (na * nb)
    )


def int8_scale(a: Column) -> Column:
    """Symmetric per-vector int8 scale: max(|x|) / 127 (0.0 for the zero
    vector)."""
    return F.array_max(F.transform(a, F.abs)) / F.lit(127.0)


def quantize_int8(a: Column) -> Column:
    """Per-vector symmetric int8 quantization: round(x / scale) as long.

    The zero vector quantizes to zeros (guarded — no division by zero).
    round() is half-away-from-zero in both Spark and DuckDB, so quantized
    codes are engine-portable; all downstream integer arithmetic is then
    exact.
    """
    s = int8_scale(a)
    return F.when(
        s == 0, F.transform(a, lambda x: F.lit(0).cast("long"))
    ).otherwise(F.transform(a, lambda x: F.round(x / s).cast("long")))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two code arrays (long fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def micro_codes(a: Column) -> Column:
    """Fixed-point micro-unit codes: floor(1e6 * x + 0.5) per component
    as long, float32 widened to DOUBLE before the multiply (the engines
    round float->double identically; float*const does not distribute the
    same way). All downstream distance arithmetic is then exact integer —
    the quantization contract the JL projection and k-center selection
    share."""
    return F.transform(
        as_double_array(a),
        lambda x: F.floor(F.lit(1_000_000.0) * x + F.lit(0.5)).cast("long"),
    )


def int_sqdist(a: Column, b: Column) -> Column:
    """Exact squared L2 distance between two long-code arrays (sequential
    long fold — engine-portable, overflow-safe to |code| ~ 1e8 at 1k
    dims)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
