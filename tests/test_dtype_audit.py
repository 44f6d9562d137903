"""In-suite cross-engine dtype audit (VERDICT r7 next-round #2).

``scripts/dtype_audit.py`` has existed since round 2 and catches exactly
the failure class behind the r5-r7 ``char_lm_perplexity`` hash-red
(DuckDB ``SUM(BIGINT)`` -> HUGEINT -> arrow decimal128, while Spark emits
BIGINT; the driver's value hash is type-sensitive but the local parity
test compares Python values and is structurally blind to it) — yet
nothing ever ran the audit, and the red cost two full contract redesigns
before round 7's bisect found the cause.  This test makes a red dtype
audit fail ``pytest tests/`` so the class cannot recur silently.

Runs at sf0.001: the Spark side is schema-only (plan analysis, no job);
each oracle executes once in DuckDB via arrow.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def audit_mod():
    return _load_script("dtype_audit")


QUERY_NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_dtypes_match_oracle(spark, duck, audit_mod, name):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    bad = audit_mod.audit_query(spark, duck, qfn, sql, SF_DIR)
    assert not bad, (
        f"{name}: dtype mismatches (column, spark, duckdb-arrow): {bad} — "
        "the driver's value hash distinguishes these even when values are "
        "identical; cast the oracle (or the Spark column) so both agree"
    )
