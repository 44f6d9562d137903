"""Rule-based self-healing: rewrite the pipeline contract in response to a
failed DQ report, then let the runner re-run.

The healing strategies and their exact formulas are the observable behavior
of the reference (``/root/reference/src/self_healing_agent.py``) and are kept
verbatim — this is pure-Python control plane, no Spark involved:

- H1 lower ``row_count_min``: if a ``row_count`` check failed and the
  observed count is below the previous minimum, set
  ``row_count_min = max(0, observed)`` (``:60-75``).
- H2 raise null tolerance: ``new = min(0.8, max(prev + 0.2, observed + 0.05))``
  (cap/step defaults at ``:32-33``, formula at ``:93``).
- H3 soften required flag: a ``missing_column`` failure on a
  ``required: true`` column sets ``required: false`` (``:106-117``).
- H4 conditional write: only persist the YAML when something changed; return
  ``{changes, updated_config}`` (``:119-125``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from .contract import Contract, load_contract, save_contract

NULL_TOLERANCE_STEP = 0.2
NULL_TOLERANCE_CAP = 0.8
NULL_TOLERANCE_MARGIN = 0.05


def group_checks_by_column(
    failed_checks: list[dict[str, Any]],
) -> dict[str, list[dict[str, Any]]]:
    """H0: bucket failures per column; global checks under ``_global``
    (reference ``:21-26``)."""
    grouped: dict[str, list[dict[str, Any]]] = {}
    for check in failed_checks:
        key = check.get("column") or "_global"
        grouped.setdefault(key, []).append(check)
    return grouped


def heal_contract(
    contract: Contract, dq_report: dict[str, Any]
) -> tuple[Contract, list[dict[str, Any]]]:
    """Apply H1-H3 to a copy of the contract; return (healed, changes)."""
    healed = contract.copy()
    changes: list[dict[str, Any]] = []
    grouped = group_checks_by_column(dq_report.get("failed_checks", []))

    for column, checks in grouped.items():
        for check in checks:
            kind = check.get("check")
            if kind == "row_count":
                observed = int(check.get("observed") or 0)
                quality = healed.raw.setdefault("quality", {})
                # default 1 mirrors the reference (self_healing_agent.py:64)
                prev = int(quality.get("row_count_min", 1))
                if observed < prev:
                    new_min = max(0, observed)
                    quality["row_count_min"] = new_min
                    changes.append(
                        {
                            "action": "lower_row_count_min",
                            "column": None,
                            "from": prev,
                            "to": new_min,
                        }
                    )
            elif kind in ("max_null_fraction", "required_nulls"):
                cols = healed.raw.setdefault("columns", {})
                spec = cols.setdefault(column, {})
                if kind == "required_nulls":
                    # A required column with nulls cannot be healed by a
                    # tolerance bump alone; the reference handles only the
                    # tolerance rule (H2) and missing-column (H3).  We follow
                    # H2 for max_null_fraction failures only.
                    continue
                prev_tol = float(spec.get("max_null_fraction", 0.0))
                observed = float(check.get("observed") or 0.0)
                new_tol = min(
                    NULL_TOLERANCE_CAP,
                    max(prev_tol + NULL_TOLERANCE_STEP, observed + NULL_TOLERANCE_MARGIN),
                )
                if new_tol != prev_tol:
                    spec["max_null_fraction"] = new_tol
                    changes.append(
                        {
                            "action": "raise_null_tolerance",
                            "column": column,
                            "from": prev_tol,
                            "to": new_tol,
                        }
                    )
            elif kind == "missing_column":
                cols = healed.raw.setdefault("columns", {})
                spec = cols.setdefault(column, {})
                if spec.get("required", False):
                    spec["required"] = False
                    changes.append(
                        {
                            "action": "soften_required",
                            "column": column,
                            "from": True,
                            "to": False,
                        }
                    )
    return healed, changes


def apply_self_healing(
    dq_report: dict[str, Any], config_path: str | Path
) -> dict[str, Any]:
    """H4: load -> heal -> conditionally write back; return the change set
    (reference ``:119-125``)."""
    contract = load_contract(config_path)
    healed, changes = heal_contract(contract, dq_report)
    if changes:
        save_contract(healed, config_path)
    return {"changes": changes, "updated_config": healed.raw}
