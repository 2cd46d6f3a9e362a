"""Array/vector functions: dot product, norm, cosine — pure JVM lambdas.

Embedding similarity stays inside Catalyst (``zip_with`` + ``aggregate``
higher-order functions) instead of a Python UDF: no Arrow boundary, and
WholeStageCodegen keeps the whole scan+score pipeline in one stage.
At 100 TB this is a shuffle-free scan per query vector (broadcast the
query side), which is the right brute-force baseline; see
operators/similarity.py for the LSH-bucketed scale path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> Column:
    """Sum of elementwise products, computed JVM-side in double."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * y),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> Column:
    return F.expr(
        f"sqrt(aggregate(transform({a}, x -> cast(x as double) * x),"
        " cast(0.0 as double), (acc, v) -> acc + v))"
    )


def cosine_expr(a: str, b: str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_expr(a, b) / denom)
