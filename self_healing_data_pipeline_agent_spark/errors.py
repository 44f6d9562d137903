"""Engine exceptions."""

from __future__ import annotations

from typing import Any


class DataQualityError(Exception):
    """Raised when any DQ check fails; carries the full report so the
    healing agent can act on it (reference:
    ``src/data_quality_checks.py:10-13,85-89``)."""

    def __init__(self, report: dict[str, Any]):
        self.report = report
        failed = report.get("failed_checks", [])
        super().__init__(
            f"Data quality failed: {len(failed)} check(s): "
            + "; ".join(str(c.get("check")) for c in failed)
        )
