"""Append-only incident event log.

Reference (``/root/reference/src/incident_logger.py:17-66``): a 9-column CSV
rewritten wholesale per append (O(n) per event).  Here it is an append-mode
parquet table — O(1) per append, and at scale a proper event-log table that
the dashboard queries as a DataFrame.  The two JSON payload columns keep the
reference's dict->JSON-string encoding.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

INCIDENT_SCHEMA = StructType(
    [
        StructField(name, StringType(), True)
        for name in (
            "run_id",
            "pipeline_name",
            "description",
            "stage",
            "status",
            "error_type",
            "error_message",
            "issues_json",
            "healing_actions_json",
        )
    ]
)


def incidents_path(base_dir: str | Path) -> str:
    return str(Path(base_dir) / "data" / "metadata" / "incidents")


def log_incident(
    spark: SparkSession,
    base_dir: str | Path,
    *,
    run_id: str,
    pipeline_name: str,
    description: str,
    stage: str,
    status: str,
    error_type: str | None = None,
    error_message: str | None = None,
    issues: dict[str, Any] | None = None,
    healing_actions: dict[str, Any] | None = None,
) -> None:
    """Append one incident record (reference ``:33-66``; dict payloads are
    JSON-serialized into string columns, ``:49-50``)."""
    record = (
        run_id,
        pipeline_name,
        description,
        stage,
        status,
        error_type or "",
        error_message or "",
        json.dumps(issues or {}, default=str),
        json.dumps(healing_actions or {}, default=str),
    )
    df = spark.createDataFrame([record], schema=INCIDENT_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(incidents_path(base_dir))


def load_incidents(spark: SparkSession, base_dir: str | Path) -> DataFrame | None:
    """Read the incident log as a DataFrame; None if nothing logged yet."""
    path = incidents_path(base_dir)
    if not Path(path).exists():
        return None
    return spark.read.schema(INCIDENT_SCHEMA).parquet(path)
