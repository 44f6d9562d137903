"""PySpark-native self-healing data-pipeline engine.

A from-scratch re-expression of the capability surface of
``OMKARDESHM/self-healing-data-pipeline-agent`` (a single-node pandas+DuckDB
self-healing ETL agent) on Apache Spark, plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed for
100 TB scale.

Layout:
- ``contract``   — the YAML pipeline contract (types, DQ rules, drift config)
- ``etl``        — contract-driven ingest: scan -> project -> try_cast -> sink
- ``quality``    — data-quality rule engine (single-pass Spark aggregation)
- ``drift``      — statistical profile + drift comparison
- ``healing``    — rule-based contract-rewrite healing strategies
- ``incidents``  — append-only incident event log (parquet table)
- ``runner``     — pipeline orchestration + 4-stage self-healing demo
- ``dashboard``  — observability queries over the incident log
- ``operators/`` — relational / text / dedup / similarity / timeseries ops
- ``streaming/`` — Structured Streaming pipelines (event-time, watermarks)
- ``sources/``   — readers and sinks
- ``functions/`` — reusable column-level helpers (vector math, hashing)
- ``plans/``     — plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
