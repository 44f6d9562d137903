"""In-suite whole-surface plan audit (the r8 lesson, twice over: both
``scripts/dtype_audit.py`` and ``scripts/plan_audit.py`` existed as
round tooling but were executed by NOBODY, so their findings rotted —
the dtype audit sat on the char-LM red's root cause for three rounds,
and the plan audit's allowlist was missing every r6/r7 operator).

One test runs the full sweep: every registered query's physical plan is
checked for cartesian products, nested-loop joins and heavy shuffle
counts, and any flag without a documented reason in
``scripts/plan_audit.py::EXPECTED`` fails the suite.  Adding an operator
whose right plan legitimately flags (1-row broadcast crossJoins,
multi-stage corpus pipelines) requires writing down WHY, next to the
other reasons, where the next round reads it.
"""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_unexplained_plan_flags(spark):
    pa = _load_script("plan_audit")
    unexplained = pa.audit(spark, "/root/testdata/sf0.01")
    assert unexplained == [], (
        "queries with undocumented scale red flags (add the plan's "
        f"justification to scripts/plan_audit.py::EXPECTED): {unexplained}"
    )


def test_expected_reasons_reference_real_queries():
    """The allowlist must not rot in the other direction: every EXPECTED
    key must still be a registered query (a renamed/deleted operator
    leaves a dangling reason that silently allowlists nothing)."""
    import sys

    sys.path.insert(0, REPO)
    from self_healing_data_pipeline_agent_spark.registry import all_queries

    pa = _load_script("plan_audit")
    unknown = sorted(set(pa.EXPECTED) - set(all_queries()))
    assert unknown == [], f"EXPECTED entries for nonexistent queries: {unknown}"
