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
    # --- widened subset (round 3): arithmetic / pipes / select / interp ---
    '{"a": (.value * 2)}',
    '{v: (.value * 100 + 7), neg: -.value, id: .counter_id}',
    '{sec: (.window_start / 1000), rem: (.value % 5)}',
    'select(.value > 10) | {id: .counter_id, v: .value}',
    '{id: .counter_id, v: .value} | select(.v < 40)',
    'select(.counter_type == "count") | {id: .counter_id}',
    'select(.counter_type != "count" and .value >= 7) | {id: .counter_id}',
    'select(.value > 100 or .counter_type == "count") | {id: .counter_id}',
    '{msg: "\\(.counter_id)=\\(.value)", t: .window_start}',
    'select(.value > 1) | {name: "ct.\\(.counter_id)", ok: true} | select(.ok)',
    '. | {id: .counter_id}',
    '{w: (.window_end - .window_start), mid: ((.window_start + .window_end) / 2)}',
]


def _real_jq(program: str, row: dict) -> list[dict]:
    """All outputs jq emits for one input (0 when select filters it out)."""
    out = subprocess.run(
        [JQ, "-c", program],
        input=json.dumps(row),
        capture_output=True,
        text=True,
        timeout=30,
    )
    assert out.returncode == 0, out.stderr
    return [json.loads(line) for line in out.stdout.splitlines() if line.strip()]


@pytest.mark.skipif(JQ is None, reason="jq binary not available")
@pytest.mark.parametrize("program", PROGRAMS)
def test_subset_matches_real_jq(spark, program):
    df = spark.createDataFrame([tuple(r.values()) for r in ROWS], SCHEMA).coalesce(1)
    got = [r.asDict() for r in apply_jq(df, program).collect()]
    want = [o for r in ROWS for o in _real_jq(program, r)]
    assert got == want


@pytest.mark.skipif(JQ is None, reason="jq binary not available")
@pytest.mark.parametrize("program", PROGRAMS)
def test_dict_evaluator_matches_real_jq(program):
    # the Lambda-handler per-record path must agree with jq (and therefore
    # with the compiled Column path) on every supported program
    from kinesis_data_counter_spark.jq import eval_jq_object

    for row in ROWS:
        got = eval_jq_object(program, dict(row))
        want = _real_jq(program, row)
        if got is None:
            assert want == []
        else:
            assert [got] == want


@pytest.mark.skipif(JQ is None, reason="jq binary not available")
def test_identity_program_is_passthrough(spark):
    df = spark.createDataFrame([tuple(r.values()) for r in ROWS], SCHEMA).coalesce(1)
    got = [r.asDict() for r in apply_jq(df, ".").collect()]
    want = [o for r in ROWS for o in _real_jq(".", r)]
    assert got == want


def test_out_of_subset_programs_raise(spark):
    df = spark.createDataFrame([tuple(r.values()) for r in ROWS], SCHEMA)
    for prog in [
        ".value + 1",       # scalar pipeline: arithmetic is not a stage
        ".[] | .value",     # iteration
        "map(.)",           # functions beyond select
        ".value",           # scalar path stage (struct re-root only)
        '{"k": [1, 2]}',    # array literals left the subset in round 3
        'select(.value > 1',  # unbalanced
        '{msg: "\\(.value"}',  # unterminated interpolation
    ]:
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


# --- round-3 widening: multi-output '.path[]' iteration --------------------

NROWS = [
    {"order_id": 1, "value": 42,
     "items": [{"sku": "a", "qty": 1}, {"sku": "b", "qty": 3}]},
    {"order_id": 2, "value": 7, "items": []},
    {"order_id": 3, "value": 12, "items": [{"sku": "c", "qty": 2}]},
]
NSCHEMA = "order_id long, value long, items array<struct<sku string, qty long>>"

ITER_PROGRAMS = [
    ".items[]",
    ".items[] | {s: .sku, q: (.qty * 2)}",
    "select(.value > 10) | .items[] | {s: .sku}",
    ".items[] | select(.qty >= 2) | {s: .sku, q: .qty}",
    "{v: .value, items: .items} | .items[]",
    ".items[]? | {s: .sku}",  # '?' spelling — identical compiled semantics
]


def _ntuples():
    return [(r["order_id"], r["value"],
             [(i["sku"], i["qty"]) for i in r["items"]]) for r in NROWS]


@pytest.mark.skipif(JQ is None, reason="jq binary not available")
@pytest.mark.parametrize("program", ITER_PROGRAMS)
def test_iteration_matches_real_jq(spark, program):
    df = spark.createDataFrame(_ntuples(), NSCHEMA).coalesce(1)
    got = [r.asDict() for r in apply_jq(df, program).collect()]
    want = [o for r in NROWS for o in _real_jq(program, r)]
    assert got == want


@pytest.mark.skipif(JQ is None, reason="jq binary not available")
@pytest.mark.parametrize("program", ITER_PROGRAMS)
def test_stream_evaluator_matches_real_jq(program):
    from kinesis_data_counter_spark.jq import eval_jq_stream

    for row in NROWS:
        assert eval_jq_stream(program, dict(row)) == _real_jq(program, row)


def test_iterate_null_array_is_empty_like_jq_optional(spark):
    # strict jq errors on 'null | .[]'; the distributed form has no per-row
    # error channel, so NULL iterates to nothing — jq's '.items[]?' form
    from kinesis_data_counter_spark.jq import eval_jq_stream

    df = spark.createDataFrame(
        [(1, None)], "order_id long, items array<struct<sku string>>"
    )
    assert apply_jq(df, ".items[]").count() == 0
    assert eval_jq_stream(".items[]", {"order_id": 1, "items": None}) == []


def test_iterate_rejects_scalar_elements_and_bare_dot(spark):
    df = spark.createDataFrame(
        [(1, ["x", "y"])], "order_id long, tags array<string>"
    )
    with pytest.raises(JqUnsupported):
        apply_jq(df, ".tags[]")
    with pytest.raises(JqUnsupported):
        apply_jq(df, ".[]")


def test_eval_jq_object_refuses_multi_output():
    from kinesis_data_counter_spark.jq import JqUnsupported as JU
    from kinesis_data_counter_spark.jq import eval_jq_object

    with pytest.raises(JU, match="multi-output"):
        eval_jq_object(".items[]", dict(NROWS[0]))
