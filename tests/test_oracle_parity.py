"""Local replica of the driver's correctness gate: run every ``queries()``
entry and its ``oracle_sql()`` twin on the same parquet tables and compare
row count + schema + order-insensitive values.

This is the primary self-check — if this passes at sf0.001/sf0.01, the
driver's CORRECTNESS gate should too.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for comparison (mirrors an order-insensitive
    value-hash: exact on ints/strings, exact-bits on floats)."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _rows_to_multiset(columns, rows):
    """Sort columns by name, normalize cells, return sorted tuple list."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


QUERY_NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    rel = duck.sql(entry_mod.oracle_sql()[name])
    duck_rows = [tuple(r) for r in rel.fetchall()]
    duck_cols = list(rel.columns)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    s = _rows_to_multiset(spark_cols, spark_rows)
    d = _rows_to_multiset(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )


def test_every_query_has_coverage():
    """Every declared query must run; oracle-less entries get a smoke run."""
    queries = entry_mod.queries()
    assert queries, "no queries declared"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns
