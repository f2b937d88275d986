"""Dense-vector column expressions over ``array<float>`` embeddings.

All JVM-side higher-order functions (``transform``/``zip_with``/
``aggregate``): the dot products run inside codegen, not Python. The
float→double cast is explicit so Spark's left-fold summation matches
DuckDB's ``list_dot_product`` on ``DOUBLE[]`` element-for-element.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    """Cast array<float> → array<double> for stable arithmetic."""
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity dot/(|a|·|b|) over array<double> columns."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
