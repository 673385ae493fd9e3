"""The examples/ scripts are part of the product surface (the composed
"how a user runs a refresh" recipes) — run each end-to-end at sf0.001 so
operator-signature changes can't silently rot them.

Subprocess isolation is deliberate: each example builds its own
SparkSession (that IS the user experience being tested), and a crash in
one must not poison the session-scoped fixture the rest of the suite
shares.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
# curation_pipeline.py is excluded here because
# tests/test_corpus.py::test_curation_example_runs_end_to_end already runs
# it with STRONGER assertions (explicit args + output-key checks) — running
# the same ~80 s subprocess twice bought nothing (suite-budget, VERDICT r7
# task 8)
EXAMPLES = sorted(
    p.name
    for p in (REPO / "examples").glob("*.py")
    if p.name != "curation_pipeline.py"
)


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs_clean(script, tmp_path):
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / script)],
        cwd=str(tmp_path),  # scratch cwd: examples must not write into the repo
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    assert proc.stdout.strip(), f"{script} printed nothing"
