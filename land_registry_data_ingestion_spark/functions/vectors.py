"""Vector math over ``array<float>`` embedding columns — JVM-side.

``zip_with`` + ``aggregate`` keep the arithmetic inside codegen with a
deterministic left-to-right fold, so the same bits come out on every run
(and match an oracle computing the identical double-precision fold).
For very high dimensions or huge batches, a vectorized Pandas UDF over
Arrow batches is the alternative; for 64-1024 dims the native fold wins
by avoiding serialization entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """NULL for a degenerate side (cosine undefined), never an error or
    a NaN: dead/padded all-zero and NaN-poisoned embeddings occur in
    real corpora. Under ANSI mode (Spark 4 default) a plain ``/`` fails
    the whole query with DIVIDE_BY_ZERO on the first zero-norm vector
    (hence try_divide), and a NaN result would rank FIRST under ``desc``
    ordering (Spark sorts NaN above every double), handing a garbage
    vector rank 1 in every top-k (hence nanvl → NULL). NULL ranks last
    and fails every ``>= threshold`` filter, so degenerate vectors drop
    out of top-k/pair results instead of crashing or winning them."""
    cos = F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))
    return F.nanvl(cos, F.lit(None).cast("double"))
