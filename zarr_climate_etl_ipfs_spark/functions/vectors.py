"""Vector math over ``array<float>`` embedding columns.

All JVM-side via higher-order functions (``zip_with`` + ``aggregate``) — no
Python/Arrow round-trip in the hot path. Used by operators/similarity.py and
operators/dedup.py (embedding near-dup).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as a single codegen'd expression (double accumulator)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    v = _c(a)
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """NULL when either vector has zero norm (cosine is undefined there):
    try_divide keeps the expression ANSI-safe — a plain ``/`` raises
    DIVIDE_BY_ZERO under Spark 4's default ANSI mode the moment a corpus
    contains a zero embedding (round-8 adversarial-corpus catch). NULL
    composes correctly downstream: threshold filters drop it and desc
    ordering ranks it last, matching the DuckDB oracle's treatment of
    zero vectors (LIST_COSINE_SIMILARITY yields -1.0, also dropped by
    thresholds and ranked last)."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
