"""Incidents dashboard skin — the visible counterpart of the reference's
Streamlit app (/root/reference/app/dashboard.py:18-76).

The *capability* is the five observability queries in
``self_healing_data_pipeline_agent_spark.dashboard`` (I2-I6, driver-checked); this file is
presentation only.  Two render paths:

- **Streamlit** (when installed): `streamlit run app.py [-- workspace_dir]`
  — summary metrics, run history, stage/status filters, single-run
  inspector, mirroring the reference section-for-section.
- **Static HTML fallback** (this container has no streamlit):
  `python app.py [workspace_dir] [-o report.html]` renders the same
  sections to one self-contained HTML file.

Both paths read the append-only incident log written by the pipeline
runner (``python -m self_healing_data_pipeline_agent_spark.runner``).
"""

from __future__ import annotations

import html
import json
import sys
from pathlib import Path

from self_healing_data_pipeline_agent_spark.dashboard import (
    distinct_values,
    filter_incidents,
    run_history,
    status_metrics,
)
from self_healing_data_pipeline_agent_spark.incidents import load_incidents
from self_healing_data_pipeline_agent_spark.session import get_spark

NO_INCIDENTS_MSG = (
    "No incidents logged yet. Run the pipeline first: "
    "`python -m self_healing_data_pipeline_agent_spark.runner`"
)


def _rows(df) -> list[dict]:
    return [r.asDict() for r in df.collect()]


def _table_html(rows: list[dict], columns: list[str]) -> str:
    head = "".join(f"<th>{html.escape(c)}</th>" for c in columns)
    body = "".join(
        "<tr>"
        + "".join(f"<td>{html.escape(str(r.get(c, '')))}</td>" for c in columns)
        + "</tr>"
        for r in rows
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"


def render_html(base_dir: str | Path, out_path: str | Path) -> bool:
    """Render the dashboard to a static HTML file.  Returns False (and
    writes nothing) when no incident log exists yet."""
    spark = get_spark(app_name="dashboard")
    incidents = load_incidents(spark, base_dir)
    if incidents is None or not incidents.take(1):
        print(NO_INCIDENTS_MSG)
        return False

    metrics = status_metrics(incidents)
    history = _rows(run_history(incidents))
    columns = [
        "run_id", "pipeline_name", "stage", "status",
        "error_type", "error_message", "created_at",
    ]
    stages = distinct_values(incidents, "stage")
    statuses = distinct_values(incidents, "status")

    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        "<title>Self-Healing Data Pipeline — Incidents</title>",
        "<style>body{font-family:sans-serif;margin:2rem;max-width:1100px}"
        "table{border-collapse:collapse;width:100%;margin:0.5rem 0}"
        "td,th{border:1px solid #ccc;padding:4px 8px;font-size:13px;text-align:left}"
        ".metrics{display:flex;gap:2rem}.metric{padding:1rem;border:1px solid #ccc;"
        "border-radius:8px;text-align:center}.metric .v{font-size:28px;font-weight:bold}"
        "pre{background:#f6f6f6;padding:8px;overflow-x:auto}</style></head><body>",
        "<h1>Self-Healing Data Pipeline — Incidents Dashboard</h1>",
        "<h2>Summary</h2><div class='metrics'>",
    ]
    for label, key in (
        ("Total Runs", "total"), ("Success", "successes"),
        ("Failures", "failures"), ("Healed Success", "healed"),
    ):
        parts.append(
            f"<div class='metric'><div class='v'>{metrics[key]}</div>"
            f"<div>{label}</div></div>"
        )
    parts.append("</div><h2>Run History</h2>")
    parts.append(_table_html(history, columns))

    parts.append("<h2>By Stage / Status</h2>")
    for stage in stages:
        for status in statuses:
            rows = _rows(filter_incidents(incidents, stage=stage, status=status))
            if rows:
                parts.append(
                    f"<h3>stage={html.escape(stage)} / status={html.escape(status)}"
                    f" ({len(rows)})</h3>"
                )
                parts.append(_table_html(rows, columns))

    parts.append("<h2>Run Details</h2>")
    for r in history:
        parts.append(f"<h3>Run <code>{html.escape(str(r['run_id']))}</code></h3><ul>")
        for k in ("pipeline_name", "stage", "status", "error_type", "error_message"):
            if r.get(k):
                parts.append(f"<li>{k}: <code>{html.escape(str(r[k]))}</code></li>")
        parts.append("</ul>")
        for k, title in (
            ("issues_json", "Issues"), ("healing_actions_json", "Healing Actions"),
        ):
            payload = r.get(k)
            if payload:
                try:
                    pretty = json.dumps(json.loads(payload), indent=2)
                except (TypeError, ValueError):
                    pretty = str(payload)
                parts.append(f"<p><b>{title}:</b></p><pre>{html.escape(pretty)}</pre>")
    parts.append("</body></html>")

    Path(out_path).write_text("".join(parts))
    print(f"dashboard written to {out_path}")
    return True


def streamlit_main(base_dir: str | Path) -> None:
    import streamlit as st

    st.title("Self-Healing Data Pipeline — Incidents Dashboard")
    spark = get_spark(app_name="dashboard")
    incidents = load_incidents(spark, base_dir)
    if incidents is None or not incidents.take(1):
        st.info(NO_INCIDENTS_MSG)
        return

    st.subheader("Summary")
    metrics = status_metrics(incidents)
    c1, c2, c3, c4 = st.columns(4)
    c1.metric("Total Runs", metrics["total"])
    c2.metric("Success", metrics["successes"])
    c3.metric("Failures", metrics["failures"])
    c4.metric("Healed Success", metrics["healed"])

    st.subheader("Run History")
    history = run_history(incidents).toPandas()
    st.dataframe(history, use_container_width=True)

    st.subheader("Filter by Stage / Status")
    f1, f2 = st.columns(2)
    stage = f1.selectbox("Stage", ["All"] + distinct_values(incidents, "stage"))
    status = f2.selectbox("Status", ["All"] + distinct_values(incidents, "status"))
    filtered = filter_incidents(
        incidents,
        stage=None if stage == "All" else stage,
        status=None if status == "All" else status,
    )
    st.dataframe(filtered.toPandas(), use_container_width=True)

    st.subheader("Inspect a Single Run")
    run_id = st.selectbox("Select run_id", history["run_id"].tolist())
    row = history[history["run_id"] == run_id].iloc[0]
    st.write(f"### Run: `{row['run_id']}`")
    st.write(f"- Pipeline: `{row['pipeline_name']}`")
    st.write(f"- Stage: `{row['stage']}`")
    st.write(f"- Status: `{row['status']}`")
    if row.get("error_type"):
        st.write(f"- Error: `{row['error_type']}` — {row['error_message']}")
    st.markdown("**Issues (JSON):**")
    st.code(str(row.get("issues_json") or "{}"), language="json")
    st.markdown("**Healing Actions (JSON):**")
    st.code(str(row.get("healing_actions_json") or "{}"), language="json")


def _parse_args(argv: list[str]) -> tuple[str, str]:
    base_dir, out = ".", "incidents_dashboard.html"
    pos = [a for a in argv if not a.startswith("-")]
    if pos:
        base_dir = pos[0]
    if "-o" in argv:
        out = argv[argv.index("-o") + 1]
    return base_dir, out


if __name__ == "__main__":
    try:
        import streamlit  # noqa: F401

        in_streamlit = streamlit.runtime.exists()
    except ImportError:
        in_streamlit = False
    base_dir, out = _parse_args(sys.argv[1:])
    if in_streamlit:
        streamlit_main(base_dir)
    else:
        render_html(base_dir, out)
