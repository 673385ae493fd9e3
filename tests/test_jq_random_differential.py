"""Randomized differential: the mini-jq interpreter vs /usr/bin/jq on
hypothesis-generated JSON values.

The fixed-case suite (test_jq_differential.py) pins known semantics; this
one searches for divergence the fixed cases missed — jq's total order,
arithmetic coercions, path machinery, regex flags, and the prelude-derived
builtins all run against arbitrary nested values. Deterministic:
``derandomize=True`` so CI never flakes on a fresh example.
"""

from __future__ import annotations

import json
import shutil
import subprocess

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

JQ = shutil.which("jq")

# JSON scalars: ints kept small (jq prints big doubles in its own style),
# floats excluded (repr-shortest vs jq's %.17g differs on SOME doubles —
# the fixed suite covers representative float cases)
_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**6), max_value=10**6),
    st.text(
        alphabet=st.characters(
            codec="utf-8", blacklist_categories=("Cs", "Cc")
        ),
        max_size=8,
    ),
)
_json = st.recursive(
    _scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(max_size=5), inner, max_size=4),
    ),
    max_leaves=12,
)

# programs chosen to exercise machinery, not to be robust: each is
# wrapped in try/catch with a FIXED fallback so error-NESS compares
# (both engines must error on the same inputs) without pinning the
# exact message text, which jq formats with embedded values
PROGRAMS = [
    ".",
    "[paths]",
    "[leaf_paths]",
    "[.. ] | length",
    "[tostream] as $s | fromstream($s[]) // null",
    'try (to_entries | from_entries) catch "ERR"',
    'try sort catch "ERR"',
    'try (sort_by(tostring)) catch "ERR"',
    'try unique catch "ERR"',
    'try add catch "ERR"',
    'try flatten catch "ERR"',
    'try (walk(if type == "string" then length else . end)) catch "ERR"',
    'try length catch "ERR"',
    'try reverse catch "ERR"',
    'try keys catch "ERR"',
    "[.[]?] | length",
    'try tojson catch "ERR"',
    'try (tojson | fromjson) catch "ERR"',
    'try (. < [1]) catch "ERR"',      # total order vs an array pivot
    'try (. == {}) catch "ERR"',
    'try min catch "ERR", try max catch "ERR"',
    'try (getpath(["a", 0])) catch "ERR"',
    'try (setpath(["x"]; 1) | del(.x)) catch "ERR"',
    'try (if . then 1 else 0 end) catch "ERR"',
    'try ascii_downcase catch "ERR"',
    'try (tostring | test("a.")) catch false',
    'try (tostring | gsub("[aeiou]"; "*")) catch "ERR"',
]


def _real(program: str, value) -> "tuple[int, list[str]]":
    out = subprocess.run(
        [JQ, "-c", program],
        input=json.dumps(value, ensure_ascii=False),
        capture_output=True,
        text=True,
        timeout=30,
    )
    # split on \n ONLY: Python's splitlines also splits on NEL/\u2028/...,
    # which jq legitimately emits RAW inside JSON strings
    return out.returncode, [
        line for line in out.stdout.split("\n") if line.strip()
    ]


@pytest.mark.skipif(JQ is None, reason="jq binary not available")
@pytest.mark.parametrize("program", PROGRAMS, ids=[p[:40] for p in PROGRAMS])
@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(value=_json)
def test_random_values_match_real_jq(program, value):
    from kinesis_data_counter_spark.jq_eval import (
        JqRuntimeError,
        compile_program,
    )

    rc, want = _real(program, value)
    try:
        got = compile_program(program).lines(value)
        ok = rc == 0
    except JqRuntimeError:
        got = None
        ok = rc != 0  # both engines errored — messages may differ, fine
    if got is not None:
        assert rc == 0, (program, value, got, want)
        assert got == want, (program, value)
    else:
        assert ok, (program, value, "mine errored, jq did not", want)


@pytest.mark.skipif(JQ is None, reason="jq binary not available")
@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    a=st.lists(st.integers(-50, 50), max_size=5),
    b=st.lists(st.integers(-50, 50), max_size=5),
)
def test_random_array_algebra_matches(a, b):
    # +, -, comparisons and the total order on random int arrays
    from kinesis_data_counter_spark.jq_eval import compile_program

    prog = "[(.[0] + .[1]), (.[0] - .[1]), (.[0] < .[1]), (.[0] == .[1])]"
    rc, want = _real(prog, [a, b])
    assert rc == 0
    assert compile_program(prog).lines([a, b]) == want, (a, b)


STREAM_PROGRAMS = [
    ('reduce inputs as $x (0; . + ($x | if type == "object" '
     "then (.a // 0) else . end))"),
    "[inputs] | length",
    "[limit(3; inputs)]",
    "[inputs | tostring] | sort",
]


@pytest.mark.skipif(JQ is None, reason="jq binary not available")
@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    records=st.lists(
        st.one_of(
            st.integers(-100, 100),
            st.dictionaries(
                st.sampled_from(["a", "b"]), st.integers(0, 9), max_size=2
            ),
        ),
        max_size=6,
    )
)
def test_random_streams_match_real_jq(records):
    # the INPUT-STREAM model on random record streams (jq -n)
    from kinesis_data_counter_spark.jq_eval import compile_program

    for prog in STREAM_PROGRAMS:
        out = subprocess.run(
            [JQ, "-cn", prog],
            input="\n".join(json.dumps(r) for r in records),
            capture_output=True,
            text=True,
            timeout=30,
        )
        assert out.returncode == 0, out.stderr
        want = [l for l in out.stdout.split("\n") if l.strip()]
        got = compile_program(prog, allow_inputs=True).stream_lines(records)
        assert got == want, (prog, records)
