"""Central query registry: every implemented operator from SURVEY.md §2
exposed as ``(spark, sf_dir) -> DataFrame`` plus its DuckDB oracle SQL.

``__spark_entry__.py`` (the driver contract) is a thin shim over this.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import events as _events
from .operators import multimodal as _multimodal
from .operators import relational as _relational
from .operators import similarity as _similarity
from .operators import text as _text
from .streaming import events as _streaming_events

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [_relational, _events, _text, _similarity, _multimodal, _streaming_events]


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in _MODULES:
        for attr in dir(mod):
            if attr.startswith("q_"):
                name = attr[2:]
                queries[name] = getattr(mod, attr)
        for name, sql in getattr(mod, "ORACLES", {}).items():
            oracles[name] = sql
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    """Oracle SQL for every query that has one (rows-only checks omitted)."""
    queries, oracles = _collect()
    return {k: v for k, v in oracles.items() if k in queries}
