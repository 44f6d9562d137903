"""Vector math over ``array<float/double>`` columns using built-in
higher-order functions (``zip_with`` / ``aggregate``) — executed JVM-side
inside whole-stage codegen, no Python round-trip.

These are the building blocks for similarity search (SURVEY.md §2.B X9) and
embedding near-dup detection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise product then sum — double precision."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = dot/(|a||b|); 0-vector guard returns NULL via division."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
