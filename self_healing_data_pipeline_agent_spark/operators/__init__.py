"""Analytic operator surface: each module exposes query builders
``(spark, sf_dir) -> DataFrame`` plus a module-level ``ORACLES`` dict with
the equivalent ANSI SQL for the DuckDB differential oracle."""
