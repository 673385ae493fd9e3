"""The bench total-time regression gate (VERDICT r7 task 7): bench.py
compares each full sf0.1 run against the last tracked line in
BENCH_LOCAL.json and flags >1.3x growth that carries no cause annotation.
These tests pin the history-selection rules the gate depends on — no Spark
session needed."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _write_history(path, lines):
    with open(path, "w") as fh:
        for obj in lines:
            fh.write(json.dumps(obj) + "\n")


def _line(value, sf=0.1, runs=5, n_queries=None):
    n = len(bench.BENCH_QUERIES) if n_queries is None else n_queries
    return {
        "value": value,
        "sf": sf,
        "runs": runs,
        "queries": {f"q{i}": 1.0 for i in range(n)},
    }


def test_prev_total_picks_newest_full_sf01_line(tmp_path):
    p = tmp_path / "BENCH_LOCAL.json"
    _write_history(p, [_line(80.0), _line(75.0), _line(72.5)])
    assert bench._prev_tracked_total(str(p)) == 72.5


def test_prev_total_skips_other_sfs_and_partial_runs(tmp_path):
    p = tmp_path / "BENCH_LOCAL.json"
    _write_history(
        p,
        [
            _line(70.0),                      # comparable
            _line(9.0, sf=0.01),              # different SF
            _line(30.0, runs=1),              # not min-of-5
            _line(12.0, n_queries=3),         # partial query set
        ],
    )
    assert bench._prev_tracked_total(str(p)) == 70.0


def test_prev_total_missing_or_malformed_history(tmp_path):
    assert bench._prev_tracked_total(str(tmp_path / "nope.json")) is None
    p = tmp_path / "BENCH_LOCAL.json"
    p.write_text("not json\n")
    assert bench._prev_tracked_total(str(p)) is None


def test_tracked_history_has_a_comparable_line():
    # the real history file must yield a baseline for the gate — otherwise
    # the gate silently never fires on real runs
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "BENCH_LOCAL.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("no tracked bench history yet")
    assert bench._prev_tracked_total(path) is not None


def test_gate_threshold_is_pinned():
    assert bench.REGRESSION_GATE_RATIO == 1.3
