"""Reusable column-level helpers (all JVM-side built-ins — no Python UDFs
in any hot path)."""

from .vectors import cosine_similarity, dot, l2_norm
from .stable import dsum, davg

__all__ = ["cosine_similarity", "dot", "l2_norm", "dsum", "davg"]
