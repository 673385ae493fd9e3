"""Differential test: the jq-subset → projection translator vs real jq.

The reference runs its output transform through gojq; our subset compiles to
a JVM-side projection. For every supported program shape, the projection's
result must equal what the actual jq binary produces on the same rows —
the strongest available check that the subset's semantics are jq's, not a
lookalike. Skipped when no jq binary is present.
"""

from __future__ import annotations

import json
import shutil
import subprocess

import pytest

from kinesis_data_counter_spark.jq import JqUnsupported, apply_jq

JQ = shutil.which("jq")

ROWS = [
    {
        "event_source_arn": "arn:aws:kinesis:us-east-1:1:stream/events",
        "window_start": 1638357540000,
        "window_end": 1638357600000,
        "counter_id": "req_count",
        "counter_type": "count",
        "value": 42,
    },
    {
        "event_source_arn": "arn:aws:kinesis:us-east-1:1:stream/events",
        "window_start": 1638357600000,
        "window_end": 1638357660000,
        "counter_id": "user_count",
        "counter_type": "approx_count_distinct",
        "value": 7,
    },
]

SCHEMA = (
    "event_source_arn string, window_start long, window_end long, "
    "counter_id string, counter_type string, value long"
)

PROGRAMS = [
    '{"time": .window_start, "name": "access_log.request_count", "value": .value}',
    '{"id": .counter_id, "kind": .counter_type}',
    '{time: .window_start, value: .value}',  # bare keys are valid jq too
    '{"constant": 5, "flag": true, "label": "x", "value": .value}',
    '{"start": .window_start, "end": .window_end, "span": "1m"}',
]


def _real_jq(program: str, row: dict) -> dict:
    out = subprocess.run(
        [JQ, "-c", program],
        input=json.dumps(row),
        capture_output=True,
        text=True,
        timeout=30,
    )
    assert out.returncode == 0, out.stderr
    return json.loads(out.stdout)


@pytest.mark.skipif(JQ is None, reason="jq binary not available")
@pytest.mark.parametrize("program", PROGRAMS)
def test_subset_matches_real_jq(spark, program):
    df = spark.createDataFrame([tuple(r.values()) for r in ROWS], SCHEMA)
    got = [r.asDict() for r in apply_jq(df, program).collect()]
    want = [_real_jq(program, r) for r in ROWS]
    assert got == want


@pytest.mark.skipif(JQ is None, reason="jq binary not available")
def test_identity_program_is_passthrough(spark):
    df = spark.createDataFrame([tuple(r.values()) for r in ROWS], SCHEMA)
    got = [r.asDict() for r in apply_jq(df, ".").collect()]
    want = [_real_jq(".", r) for r in ROWS]
    assert got == want


def test_out_of_subset_programs_raise(spark):
    df = spark.createDataFrame([tuple(r.values()) for r in ROWS], SCHEMA)
    for prog in [".value + 1", "{\"a\": (.value * 2)}", ".[] | .value", "map(.)"]:
        with pytest.raises(JqUnsupported):
            apply_jq(df, prog)


def test_generic_fallback_is_import_gated(spark):
    # the container bundles no jq Python binding: the full-generality path
    # must fail loudly with guidance, never silently degrade
    import pytest

    from kinesis_data_counter_spark.jq import apply_jq_generic

    df = spark.createDataFrame([(1,)], "a long")
    try:
        import jq  # noqa: F401

        has_jq = True
    except ImportError:
        has_jq = False
    if has_jq:  # pragma: no cover - not in this container
        out = apply_jq_generic(df, ".a").collect()
        assert [r["value"] for r in out] == ["1"]
    else:
        with pytest.raises(ImportError, match="apply_jq subset"):
            apply_jq_generic(df, ".a")
