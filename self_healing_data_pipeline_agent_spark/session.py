"""SparkSession factory with scale-appropriate defaults.

Local tests run on ``local[N]``; the same settings are what we would ship to
a 1000-executor cluster: AQE on (runtime re-planning, skew-join handling,
partition coalescing), Arrow enabled for the few pandas-UDF paths, and a
shuffle-partition count that AQE is free to shrink.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "self-healing-pipeline",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    At cluster scale the same confs apply; only ``master`` changes.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        # UTC everywhere: keeps timestamp semantics identical across engines
        # and executors regardless of host timezone.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas UDF / toPandas boundaries.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Broadcast joins for dimension tables (default 10MB is fine; make
        # the intent explicit so a cluster deploy reviews it consciously).
        .config("spark.sql.autoBroadcastJoinThreshold", "10485760")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        # Local mode hosts all 32 executor threads in the driver JVM —
        # size the heap so cached shingle sets / broadcast builds never
        # trigger GC churn mid-query (measurably stabilizes bench times).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
