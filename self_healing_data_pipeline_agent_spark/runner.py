"""Pipeline orchestration: the composable single run and the 4-stage
self-healing demo state machine.

Reference (``/root/reference/src/pipeline_runner.py``):
- ``run_single_pipeline`` (``:48-61``): load config fresh -> ETL (writes the
  warehouse BEFORE DQ) -> DQ gate (raises ``DataQualityError`` on bad data)
  -> drift detect (never raises) -> return both reports.
- ``main`` (``:69-223``): reset env -> STEP 1 baseline on clean data
  (``success``) -> STEP 2 broken data (expected ``failed`` with
  ``DataQualityError``) -> STEP 3 heal the contract
  (``healing_actions_applied``) -> STEP 4 re-run (``healed_success`` /
  ``failed_after_healing``).  Config is reloaded from disk each stage so the
  re-run picks up the healed YAML.  Exactly one heal iteration — no loop.
"""

from __future__ import annotations

import shutil
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

from pyspark.sql import SparkSession

from .contract import load_contract
from .drift import detect_and_update_drift
from .errors import DataQualityError
from .etl import run_etl
from .healing import apply_self_healing
from .incidents import log_incident
from .quality import enforce_data_quality

PIPELINE_NAME = "self_healing_pipeline"


def make_run_id(label: str) -> str:
    """O4 (reference ``:64-66``)."""
    ts = datetime.now(timezone.utc).replace(tzinfo=None).isoformat(timespec="seconds")
    return f"{label}-{ts}Z"


def reset_environment(base_dir: str | Path, contract_path: str | Path) -> None:
    """O3 (reference ``:31-45``): clear warehouse + drift profile; the
    incident log intentionally survives resets."""
    base = Path(base_dir)
    contract = load_contract(contract_path)
    shutil.rmtree(base / contract.warehouse_path, ignore_errors=True)
    profile = base / contract.drift_profile_path
    if profile.exists():
        profile.unlink()


def run_single_pipeline(
    spark: SparkSession,
    contract_path: str | Path,
    base_dir: str | Path,
    description: str = "",
) -> dict[str, Any]:
    """O1 (reference ``:48-61``): one pipeline run.  Raises
    ``DataQualityError`` on DQ failure (after the warehouse write)."""
    contract = load_contract(contract_path)  # reloaded fresh every run (:50)
    df = run_etl(spark, contract, base_dir)
    dq_report = enforce_data_quality(df, contract)  # raises on failure
    drift_report = detect_and_update_drift(df, contract, base_dir)
    return {"dq_report": dq_report, "drift_report": drift_report}


def run_demo(
    spark: SparkSession,
    base_dir: str | Path,
    contract_path: str | Path,
    clean_source: str,
    broken_source: str,
) -> list[dict[str, Any]]:
    """O2 (reference ``:69-223``): the 4-stage golden scenario.

    Returns the list of stage outcomes (mirrors the incident rows written).
    """
    outcomes: list[dict[str, Any]] = []

    def record(stage: str, status: str, **kw: Any) -> None:
        run_id = make_run_id(stage)
        log_incident(
            spark,
            base_dir,
            run_id=run_id,
            pipeline_name=PIPELINE_NAME,
            description=kw.get("description", ""),
            stage=stage,
            status=status,
            error_type=kw.get("error_type"),
            error_message=kw.get("error_message"),
            issues=kw.get("issues"),
            healing_actions=kw.get("healing_actions"),
        )
        outcomes.append({"stage": stage, "status": status, **kw})

    reset_environment(base_dir, contract_path)

    # STEP 1: baseline on clean data (reference :73-107)
    contract = load_contract(contract_path)
    contract.source_path = clean_source
    from .contract import save_contract

    save_contract(contract, contract_path)
    try:
        reports = run_single_pipeline(spark, contract_path, base_dir, "baseline")
        record("baseline", "success", description="baseline run on clean data",
               issues=reports["dq_report"])
    except Exception as exc:  # noqa: BLE001 — any failure aborts the demo
        record("baseline", "failed", error_type=type(exc).__name__,
               error_message=str(exc))
        return outcomes

    # STEP 2: broken data — DQ failure expected (reference :109-164)
    contract = load_contract(contract_path)
    contract.source_path = broken_source
    save_contract(contract, contract_path)
    issue_report: dict[str, Any] | None = None
    try:
        run_single_pipeline(spark, contract_path, base_dir, "broken")
        record("drifted", "success", description="broken data unexpectedly passed")
        return outcomes
    except DataQualityError as dq_err:
        issue_report = dq_err.report
        record("drifted", "failed", error_type="DataQualityError",
               error_message=str(dq_err), issues=issue_report)
    except Exception as exc:  # noqa: BLE001
        record("drifted", "failed", error_type=type(exc).__name__,
               error_message=str(exc))
        return outcomes

    # STEP 3: heal the contract (reference :171-189)
    healing = apply_self_healing(issue_report, contract_path)
    if healing["changes"]:
        record("healing", "healing_actions_applied",
               healing_actions={"changes": healing["changes"]})
    else:
        record("healing", "no_changes")
        return outcomes

    # STEP 4: re-run with the healed contract (reference :191-223)
    try:
        reports = run_single_pipeline(spark, contract_path, base_dir, "post_healing")
        record("post_healing", "healed_success", issues=reports["dq_report"])
    except Exception as exc:  # noqa: BLE001
        record("post_healing", "failed_after_healing",
               error_type=type(exc).__name__, error_message=str(exc))
    return outcomes
