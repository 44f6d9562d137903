"""Reusable column-level helpers (all JVM-side built-ins — no Python UDFs
in any hot path)."""

from .vectors import cosine_similarity, dot, l2_norm
from .stable import dsum, davg, dstd
from .oracle_sql import sql_dsum, sql_davg, sql_dstd

__all__ = [
    "cosine_similarity", "dot", "l2_norm",
    "dsum", "davg", "dstd",
    "sql_dsum", "sql_davg", "sql_dstd",
]
