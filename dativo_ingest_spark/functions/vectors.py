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
