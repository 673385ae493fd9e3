"""Guards for the driver-facing contract surfaces.

These catch drift that the per-query tests can't: a query silently losing
its oracle (degrading the correctness gate to rows-only), documentation
pointing at queries that no longer exist, or bench.py breaking its one-line
JSON output protocol that the driver parses per round.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_has_an_oracle():
    from kinesis_data_counter_spark.plans.registry import QUERIES

    missing = [n for n, q in QUERIES.items() if not q.oracle]
    assert missing == [], f"queries degraded to rows-only checks: {missing}"


def test_coverage_doc_names_resolve():
    from kinesis_data_counter_spark.plans.registry import QUERIES

    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    referenced = set(re.findall(r"`([a-z0-9_]+)`", text))
    known = set(QUERIES)
    # only check tokens that look like query names (exist-or-near-miss set:
    # anything with a family prefix used by the registry)
    prefixes = tuple(
        {n.split("_", 1)[0] for n in known}
    )
    candidates = {
        t for t in referenced
        if t.startswith(prefixes) and "_" in t and not t.endswith((".py", ".md"))
    }
    # a candidate that matches no registry entry but is clearly meant to be
    # one (appears in a queries() column) would be doc drift; allow
    # non-query identifiers by requiring at least the known ones to resolve
    ghosts = {
        t for t in candidates
        if t not in known
        and not any(t in n or n in t for n in known)
        and t not in {
            # legitimate non-query identifiers mentioned in COVERAGE.md
            "counter_value_column", "merge_partials", "partial_counter",
            "build_counter", "union_counter_results", "assemble_counters",
            "finalize_counter", "tumbling_window", "counter_test",
            "stateful_running_counts", "write_curated", "upsert_partitions",
            "hll_sketch_agg", "hll_union_agg", "approx_count_distinct",
            "arn_test", "session_window", "transformWithState",
            "applyInPandasWithState", "batchItemFailures", "config_pipeline",
        }
    }
    assert ghosts == set(), f"COVERAGE.md references unknown queries: {ghosts}"


def test_bench_emits_one_json_line_at_tiny_sf():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_BENCH_RUNS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [
        ln for ln in out.stdout.replace("\r", "\n").splitlines()
        if ln.startswith("{")
    ]
    assert len(json_lines) >= 1, out.stdout[-2000:]
    d = json.loads(json_lines[-1])
    assert d["metric"] == "total_bench_seconds"
    assert d["unit"] == "sec"
    assert isinstance(d["value"], (int, float)) and d["value"] > 0
    assert d["sf"] == 0.001
    assert len(d["queries"]) >= 20
    assert all(isinstance(v, (int, float)) for v in d["queries"].values())
