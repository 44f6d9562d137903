"""Local replica of the driver's correctness gate: run every ``queries()``
entry and its ``oracle_sql()`` twin on the same parquet tables and compare
row count + schema + order-insensitive values.

This is the primary self-check.  By DEFAULT the sweep runs at BOTH
sf0.001 and sf0.01 — the latter is the driver gate's exact scale factor;
round 5's one red row was a query whose failure class was invisible at
the old sf0.001-only default.  The sf0.1 sweep (slow) is opt-in via
``SPARK_GRAFT_PARITY_SF01=1``; setting ``SPARK_GRAFT_ORACLE_SF_DIR``
pins a single explicit directory instead.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

_ENV_SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR")
if _ENV_SF:
    SF_PARAMS = [pytest.param(_ENV_SF, id=os.path.basename(_ENV_SF.rstrip("/")))]
else:
    SF_PARAMS = [
        pytest.param("/root/testdata/sf0.001", id="sf0.001"),
        pytest.param("/root/testdata/sf0.01", id="sf0.01"),
        pytest.param(
            "/root/testdata/sf0.1",
            id="sf0.1",
            marks=pytest.mark.skipif(
                not os.environ.get("SPARK_GRAFT_PARITY_SF01"),
                reason="slow full-scale sweep; set SPARK_GRAFT_PARITY_SF01=1",
            ),
        ),
    ]

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module", params=SF_PARAMS)
def oracle_env(request):
    sf_dir = request.param
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con, sf_dir
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
def test_query_matches_oracle(spark, oracle_env, name):
    duck, sf_dir = oracle_env
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, sf_dir)
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


# Queries allowed to return an empty result at the driver's sf0.01.
# Currently NONE: round 7 found four "green" records that were hashes
# over empty result sets (tpch_q8 with a nonexistent region constant,
# embedding_near_dup/_lsh with an unreachable cosine threshold,
# idle_rich_customers/payload_dedup with constants only sf0.1 could
# satisfy) — a hash over zero rows proves nothing.  Any legitimately
# empty contract must be listed here EXPLICITLY with a reason.
VACUITY_ALLOWLIST: dict[str, str] = {}

_VACUITY_SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def vacuity_duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{_VACUITY_SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_oracle_nonempty_at_driver_sf(vacuity_duck, name):
    """Vacuity tripwire (VERDICT r7 #2/#4): every oracle must return at
    least one row at the driver's scale factor, else its green is an
    empty-set hash that verifies nothing.  DuckDB-only — fast, and the
    parity test above already proves Spark matches the oracle row set."""
    if name in VACUITY_ALLOWLIST:
        pytest.skip(f"legitimately empty: {VACUITY_ALLOWLIST[name]}")
    sql = entry_mod.oracle_sql()[name]
    n = len(vacuity_duck.sql(f"SELECT 1 FROM ({sql}) LIMIT 1").fetchall())
    assert n >= 1, (
        f"{name}: oracle returns ZERO rows at sf0.01 — the driver green "
        "would be vacuous; tighten the query's constants or add an "
        "explicit VACUITY_ALLOWLIST entry with a reason"
    )


def test_dominant_part_suppliers_share_test_is_selective(vacuity_duck):
    """Non-degeneracy for the Q20 adaptation (r11 ADVICE): at sf0.001 the
    query returns 0 rows, so the smallest-SF parity green is trivial.  At
    the driver's sf0.01 the result must be non-empty (vacuity test above)
    AND the dominance share test must actually EXCLUDE suppliers — i.e.
    dominating suppliers are a proper subset of all suppliers that shipped
    a 'small %' part in 1997.  DuckDB-only; built on the oracle SQL so a
    constant change re-guards automatically."""
    from self_healing_data_pipeline_agent_spark.operators.relational import (
        DOMINANT_SHARE_PCT,
    )

    base = """
    SELECT l_partkey, l_suppkey,
           SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT)) AS q_units
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small %'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2
    """
    n_all, n_dom = vacuity_duck.sql(
        f"""
        WITH ps AS ({base}),
        shared AS (
          SELECT *, SUM(q_units) OVER (PARTITION BY l_partkey) AS total_units
          FROM ps
        )
        SELECT COUNT(DISTINCT l_suppkey),
               COUNT(DISTINCT CASE WHEN q_units * 100
                                        > total_units * {DOMINANT_SHARE_PCT}
                                   THEN l_suppkey END)
        FROM shared
        """
    ).fetchone()
    assert n_dom >= 1, "share test matched no supplier at sf0.01"
    assert n_dom < n_all, (
        f"share test excluded nobody ({n_dom}/{n_all}) — the dominance "
        "predicate is degenerate at sf0.01; lower DOMINANT_SHARE_PCT"
    )


def test_every_query_has_coverage():
    """Every declared query must run; oracle-less entries get a smoke run."""
    queries = entry_mod.queries()
    assert queries, "no queries declared"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns


def test_edit_distance_threshold_is_selective(vacuity_duck):
    """Non-vacuity for the edit-distance verify (the r7 threshold
    lesson): at the driver's sf0.01 the EDIT_DUP_PER_10K filter must
    EXCLUDE at least one banded-LSH candidate pair — a threshold no
    candidate ever fails is dead code and its green checks nothing.
    DuckDB-only; built on the shared candidate CTEs so a constant change
    re-guards automatically."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        _DUCK_LSH_CTES,
        EDIT_DUP_PER_10K,
    )

    sql = f"""WITH {_DUCK_LSH_CTES},
scored AS (
  SELECT CAST(levenshtein(da.text, db.text) AS BIGINT) AS ed,
         CAST(greatest(len(da.text), len(db.text)) AS BIGINT) AS ml
  FROM candidates c
  JOIN documents da ON da.doc_id = c.doc_a
  JOIN documents db ON db.doc_id = c.doc_b)
SELECT COUNT(*),
       SUM(CASE WHEN ed * 10000 // ml <= {EDIT_DUP_PER_10K} THEN 1 ELSE 0 END)
FROM scored"""
    n_cand, n_keep = vacuity_duck.sql(sql).fetchall()[0]
    assert n_keep >= 1, "verify keeps nothing — threshold too tight"
    assert n_keep < n_cand, (
        "every candidate passes the edit threshold — the verify is "
        "vacuous; tighten EDIT_DUP_PER_10K"
    )


def test_image_hash_banding_guard_is_load_bearing(vacuity_duck):
    """Two guards on the image near-dup blocking at the driver's sf0.01,
    DuckDB-only over the oracle's own CTE chain (a constant change
    re-guards automatically):

    1. The informative-band rule must be LOAD-BEARING: counting
       candidates WITH zero bands kept must blow up toward all-pairs
       (this corpus pins the padding bands to zero for most docs — the
       LSH hot bucket the rule exists to drop).  If this stops being
       true the guard is dead code and should go.
    2. The Hamming verify must bite: kept pairs strictly fewer than
       candidates (the r7 vacuous-threshold lesson).
    """
    from self_healing_data_pipeline_agent_spark.operators.multimodal import (
        IMG_HAM_MAX,
        ORACLES as MM_ORACLES,
    )

    base = MM_ORACLES["image_near_dup"]
    prefix = base[: base.rindex("SELECT")]
    n_cand, n_keep = vacuity_duck.sql(
        prefix
        + f"""SELECT COUNT(*),
       SUM(CASE WHEN hamming <= {IMG_HAM_MAX} THEN 1 ELSE 0 END)
FROM verified"""
    ).fetchall()[0]
    n_docs = vacuity_duck.sql("SELECT COUNT(*) FROM documents").fetchall()[0][0]
    all_pairs = n_docs * (n_docs - 1) // 2
    # guard 1: with the zero-band filter ON, candidates are sub-quadratic
    assert n_cand < all_pairs // 10, (
        f"banded blocking is near-all-pairs ({n_cand}/{all_pairs}) even "
        "with the informative-band rule — blocking is broken"
    )
    unguarded = vacuity_duck.sql(
        prefix.replace(") WHERE v <> 0", ")")
        + "SELECT COUNT(*) FROM cand"
    ).fetchall()[0][0]
    assert unguarded > n_cand * 10, (
        "dropping zero bands no longer changes candidate volume — the "
        "informative-band guard is dead code; remove it"
    )
    # guard 2: the Hamming verify is non-vacuous
    assert n_keep >= 1, "verify keeps nothing — threshold too tight"
    assert n_keep < n_cand, (
        "every candidate passes the Hamming threshold — the verify is "
        "vacuous; lower IMG_HAM_MAX"
    )
