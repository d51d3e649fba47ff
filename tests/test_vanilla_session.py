"""Vanilla-session coupling guard (round-5 verdict item 2/8).

The external driver runs gates on a conf-less SparkSession; the repo's
session factory (session.py) sets non-default confs, so a gate that
silently relies on one passes pytest but ERRs in the round window
(round 5: ingest_excel_datasource vs
spark.sql.python.filterPushdown.enabled). This test executes the
sweep in a SUBPROCESS — builder confs stick to the in-process
SparkContext, so a fresh interpreter is the only honest "vanilla".

Full-registry sweep (scripts/vanilla_smoke.py with no name filter) is
run per-round before rotation; here a targeted set keeps suite time
bounded while covering every known conf/version-sensitive surface:
  - ingest_excel_datasource  (Python DataSource filter pushdown conf)
  - events_variant_extract   (Spark 4 VARIANT / parse_json)
  - events_session_window    (native session_window, Spark 3.2+)
  - events_sessionize        (applyInPandasWithState; Arrow conf unset)
  - multimodal_decode_real   (mapInPandas without repo Arrow confs)
  - q1_pricing_summary       (plain aggregate control row)
"""

from __future__ import annotations

import os
import subprocess
import sys

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "vanilla_smoke.py",
)

SENSITIVE_GATES = [
    "ingest_excel_datasource",
    "events_variant_extract",
    "events_session_window",
    "events_sessionize",
    "multimodal_decode_real",
    "q1_pricing_summary",
]


def test_conf_sensitive_gates_run_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, SCRIPT, "/root/testdata/sf0.001", *SENSITIVE_GATES],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        "vanilla-session smoke failed:\n" + proc.stdout[-4000:] + proc.stderr[-4000:]
    )
    ok = {l.split()[1] for l in proc.stdout.splitlines() if l.startswith("OK ")}
    assert set(SENSITIVE_GATES) <= ok, f"missing gates in sweep output: {set(SENSITIVE_GATES) - ok}"
