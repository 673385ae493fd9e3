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


def test_generic_fallback_runs_without_binding(spark):
    # round 4: the full-generality path no longer needs the jq Python
    # binding — the pure-Python mini-jq interpreter carries it, and
    # unsupported programs still fail loudly at DRIVER time
    from kinesis_data_counter_spark.jq import apply_jq_generic

    df = spark.createDataFrame([(1,), (2,)], "a long").coalesce(1)
    out = apply_jq_generic(df, ".a").collect()
    assert [r["value"] for r in out] == ["1", "2"]
    out = apply_jq_generic(df, "select(.a > 1) | {v: (.a * 10)}").collect()
    assert [r["value"] for r in out] == ['{"v":20}']
    with pytest.raises(JqUnsupported):
        apply_jq_generic(df, "input")  # out-of-core: needs a record stream
    # round-5: slices, getpath, path-assignment, foreach and the @formats
    # all run through the interpreter now
    # per-record programs, like jq per input line: foreach state does not
    # span rows (cross-record accumulation is exactly what the out-of-core
    # `inputs` would provide)
    out = apply_jq_generic(df, "foreach (.a, .a) as $x (0; . + $x)").collect()
    assert [r["value"] for r in out] == ["1", "2", "2", "4"]
    out = apply_jq_generic(df, '@uri "v=\\(.a) x"').collect()
    assert [r["value"] for r in out] == ['"v=1 x"', '"v=2 x"']
    out = apply_jq_generic(df, '{a: .a} | .a |= . * 2 | getpath(["a"])').collect()
    assert [r["value"] for r in out] == ["2", "4"]
    out = apply_jq_generic(df, "[.a, .a, .a] | .[0:2]").collect()
    assert [r["value"] for r in out] == ["[1,1]", "[2,2]"]


# --- round-4: pure-Python mini-jq vs the real jq binary --------------------

MINI_CASES = [
    # (program, input) — every pair is run through both engines
    (".", {"a": 1}),
    (".a.b", {"a": {"b": 5}}),
    (".a.b", {"a": {}}),
    (".missing", {"a": 1}),
    (".a[1]", {"a": [10, 20, 30]}),
    (".a[-1]", {"a": [10, 20, 30]}),
    (".a[5]", {"a": [10]}),
    (".a[]", {"a": [1, 2, 3]}),
    (".[]", [4, 5]),
    (".[] | .x", [{"x": 1}, {"x": 2}]),
    (".a[].x", {"a": [{"x": 7}, {"x": 8}]}),
    ('.["key with space"]', {"key with space": 3}),
    # streams / construction
    ("1, 2, .a", {"a": 9}),
    ("[.a, .b]", {"a": 1, "b": 2}),
    ("[.items[] | .qty]", {"items": [{"qty": 2}, {"qty": 5}]}),
    ("{x: .a, y: [1, 2], z: {w: .b}}", {"a": 1, "b": 2}),
    ("{a: (1, 2), b: (3, 4)}", None),
    ("{(0 < 1 | tostring): 1}" , None),
    ("[]", None),
    ("[.[] | . * 2]", [1, 2, 3]),
    # arithmetic / comparison / boolean / alternative
    ("1 + 2, 2.5 * 2, 7 % 3, 9 / 2, 1.0 + 2.0", None),
    ('"a" + "b"', None),
    ("[1, 2] + [3]", None),
    ('{"a": 1} + {"b": 2}', None),
    ("[1, 2, 3] - [2]", None),
    ('"a,b,c" / ","', None),
    ("(1, 2) + (10, 20)", None),
    (".a == 1, .a != 1, .a < 2, .a >= 1", {"a": 1}),
    ('1 == 1.0, "a" == "a", [1] == [1], {"x":1} == {"x":1}, true == 1', None),
    ("true and (1, false), false or null, (null // 5), (.a // 9)", {"a": 7}),
    ("-.a, -(.a + 1)", {"a": 3}),
    # select / empty / if
    ("select(.a > 1)", {"a": 5}),
    ("select(.a > 1)", {"a": 0}),
    ("empty, 1", None),
    ('if .a > 1 then "big" elif .a == 1 then "one" else "small" end', {"a": 1}),
    ('if .a then 1 else 2 end', {"a": None}),
    # string interpolation & escapes
    ('"v=\\(.a + 1) s=\\("x" + "y")"', {"a": 1}),
    ('"tab\\t\\"q\\" \\\\ \\u00e9"', None),
    # builtins
    ("length", [1, 2, 3]),
    ("length", "abcd"),
    ("length", {"a": 1}),
    ("length", None),
    ("keys", {"b": 1, "a": 2}),
    ("keys_unsorted", {"b": 1, "a": 2}),
    ("keys", [9, 8]),
    ('has("a"), has("z")', {"a": 1}),
    ("type", [1]),
    ("1.0, 10000000000.0, 0.5, 1e3", None),
    ("tostring", {"a": [1, 2]}),
    ("tostring", "s"),
    ('tonumber', "42"),
    ('"3.5" | tonumber', None),
    ("floor, ceil, sqrt", 2.25),
    ("add", [1, 2, 3]),
    ("add", ["a", "b"]),
    ("add", []),
    ("any, all", [True, False]),
    ("-7 % 3, 7 % -3, 7 % 3", None),
    ("min, max", [3, 1, 2]),
    ("min, max", []),
    ("unique", [3, 1, 3, 2, 1]),
    ("sort", [3, 1, None, "a", True, [2], False]),
    ("sort_by(.x)", [{"x": 2}, {"x": 1}]),
    ("reverse", [1, 2, 3]),
    ("first, last", [5, 6, 7]),
    ("map(. + 1)", [1, 2]),
    ("map(select(. > 1))", [1, 2, 3]),
    ("ascii_downcase", "AbC"),
    ("ascii_upcase", "AbC"),
    ('startswith("ab"), endswith("cd")', "abcd"),
    ('ltrimstr("ab"), rtrimstr("cd")', "abcd"),
    ('ltrimstr("zz")', "abcd"),
    ('split(",")', "a,b,,c"),
    ('join("-")', ["a", "b", "c"]),
    ('join("-")', [1, None, "x"]),
    ("to_entries", {"a": 1, "b": 2}),
    ("from_entries", [{"key": "a", "value": 1}, {"key": "b", "value": 2}]),
    ("range(3), range(1; 4), range(0; 10; 3)", None),
    ('contains("bc")', "abcd"),
    ("contains([1])", [1, 2]),
    # ? error suppression
    (".a[]?", {"a": 5}),
    (".a[]?, .b", {"a": [1], "b": 2}),
    ('.[]? // "none"', 3),
    # recursive descent
    ("[..]", {"a": [1, {"b": 2}], "c": "x"}),
    ("[.. | select(type == \"number\")] | add", {"a": [1, {"b": 2}], "c": [3]}),
    ("[..] | length", [[1, 2], [3, [4]]]),
    ("..", 5),
    # try/catch
    ("try (.a + 1) catch \"bad\"", {"a": "s"}),
    ("try (.a + 1) catch \"bad\"", {"a": 1}),
    ("try (.[] | tonumber) catch \"bad\"", ["1", "x", "3"]),  # prefix kept
    ("try .a.b", {"a": 5}),
    # group_by family / flatten / entries / codepoints
    ("group_by(.k)", [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 1, "v": "c"}]),
    ("group_by(.)", [3, 1, 3, 2]),
    ("unique_by(.k)", [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 1, "v": "c"}]),
    ("min_by(.v), max_by(.v)", [{"v": 5}, {"v": 2}, {"v": 9}]),
    ("flatten", [1, [2, [3, [4]]], 5]),
    ("flatten(1)", [1, [2, [3, [4]]], 5]),
    ("flatten(0)", [1, [2], 3]),
    ('with_entries({key, value: (.value * 2)})', {"a": 1, "b": 2}),
    ("explode", "Abc"),
    ("implode", [65, 98, 99]),
    ('"hi" | explode | implode', None),
    # reduce / as-bindings
    ("reduce .[] as $x (0; . + $x)", [1, 2, 3, 4]),
    ("reduce .[] as $x (0; . + 1)", ["a", "b"]),
    ('reduce .items[] as $i ({}; . + {($i.k): $i.v})',
     {"items": [{"k": "a", "v": 1}, {"k": "b", "v": 2}]}),
    (".a as $v | {copy: $v, double: ($v * 2)}", {"a": 21}),
    ("5 as $n | [range($n)] | add", None),
    # composite programs (the reference's output-reshaping register)
    ('.records[] | select(.ok) | {id, n: (.vals | length), s: (.vals | add)}',
     {"records": [
         {"id": "r1", "ok": True, "vals": [1, 2, 3]},
         {"id": "r2", "ok": False, "vals": [9]},
         {"id": "r3", "ok": True, "vals": []},
     ]}),
    ('[.[] | .v] | {n: length, mean: (add / length)}', [{"v": 2}, {"v": 4}]),
    ('to_entries | map(select(.value > 1)) | from_entries', {"a": 1, "b": 2, "c": 3}),
    # --- round-5 ADVICE pins: split(""), first/last of [] -------------------
    ('split("")', "abc"),
    ('split("")', ""),
    ("first, last", []),
    ("first, last", None),
    # --- round-5: regex builtins -------------------------------------------
    ('test("b")', "abc"),
    ('test("B"; "i")', "abc"),
    ('test("x")', "abc"),
    ('test(""; "n")', "abc"),
    ('[match("o"; "g")]', "foo boo"),
    ('match("(?<x>o+)")', "foo boo"),
    ('match("zz")', "foo"),
    ('[match("b*"; "g")]', "ab"),  # zero-width end-of-string edge rule
    ('[match(""; "g")] | length', ""),
    ('capture("(?<a>[a-z]+)-(?<n>[0-9]+)")', "abc-42"),
    ('[capture("(?<d>[0-9])"; "g")]', "a1b2"),
    ('capture("(?<a>x)|(?<b>y)")', "y"),  # non-participating named group
    ('[scan("[0-9]+")]', "a1b22c333"),
    ('[scan("([a-z])([0-9])")]', "a1b2"),
    ('sub("o"; "0")', "foo"),
    ('gsub("o"; "0")', "foo"),
    ('sub("(?<x>o+)"; "<\\(.x)>")', "foo boo"),
    ('gsub("(?<x>[aeiou])"; "[\\(.x)]")', "hello"),
    ('gsub("x"; "-")', "no match"),
    ('split("[,;]"; "")', "a,b;c"),
    ('[splits("[,;]")]', "a,b;;c"),
    ('split(", *"; "")', "a, b,c"),
    ('[splits("")]', "ab"),
    # --- round-5: user-defined functions -----------------------------------
    ("def f: . + 1; f", 1),
    ("def double: . * 2; [.[] | double]", [1, 2]),
    ("def add2(f): f + 2; add2(.a)", {"a": 1}),
    ("def f($x): $x * 2; f(3)", None),
    ("def f($x): x; f(3)", None),  # $-param visible under the bare name too
    ("def fact: if . <= 1 then 1 else . * (. - 1 | fact) end; fact", 5),
    ("def inc(f): f + 1; def twice(f): f | f; twice(inc(.))", 10),
    (". | def f: 7; f", None),  # def after a pipe
    ('def hits(re): [match(re; "g")] | length; hits("l")', "hello"),
    # --- round-5: path expressions & assignment ----------------------------
    (".a = 5", {"a": 1, "b": 2}),
    (".a = .b", {"a": 1, "b": 2}),
    (".c = 9", {"a": 1}),
    (".a.b = 5", {}),
    (".a.b = 5", None),
    ('.[0] = "x"', [1, 2]),
    (".[3] = 9", [1]),  # pads with nulls
    (".[-1] = 9", [1, 2, 3]),
    (".[] = 0", [1, 2, 3]),
    (".a = (1, 2)", {"a": 0}),  # one whole output per RHS output
    ("(.a, .b) = 7", {"a": 1, "b": 2}),
    (".a |= . + 1", {"a": 5}),
    (".[] |= . * 2", [1, 2, 3]),
    (".a |= empty", {"a": 1, "b": 2}),  # empty update deletes the path
    (".a += 1, .a -= 1, .a *= 2, .a /= 2, .a %= 2", {"a": 5}),
    (".a //= 9", {"a": None}),
    (".a //= 9", {"a": 3}),
    ("(.a.b, .c) |= . + 1", {"a": {"b": 1}, "c": 10}),
    (".users[] |= (.age += 1)", {"users": [{"age": 30}, {"age": 40}]}),
    (".a = .a + 1 | .a = .a * 2", {"a": 3}),
    ("del(.a)", {"a": 1, "b": 2}),
    ("del(.x)", {"a": 1}),
    ("del(.[1])", [1, 2, 3]),
    ("del(.[0], .[2])", [1, 2, 3, 4]),  # index shift safety
    ("del(.[] | select(. > 2))", [1, 3, 2, 4]),
    ("del(.a[0].b)", {"a": [{"b": 1, "c": 2}]}),
    ("del(.. | nulls)", {"a": None, "b": [1, None]}),
    ("del(.)", 5),
    ("path(.a.b)", {"a": {"b": 1}}),
    ("path(.a[0], .c)", {"a": [9]}),
    ("[paths]", {"a": [1, {"b": 2}]}),
    ("[leaf_paths]", {"a": [1, {"b": 2}]}),
    ('getpath(["a", "b"])', {"a": {"b": 7}}),
    ('getpath(["a", "x"])', {"a": {"b": 7}}),
    ('setpath(["a", "b"]; 9)', {"a": {}}),
    ('setpath([0]; "x")', None),
    ('delpaths([["a"], ["b", 0]])', {"a": 1, "b": [1, 2], "c": 3}),
    ('reduce range(3) as $i (.; .[$i | tostring] = $i)', {}),
    # type filters
    ("[.. | numbers]", {"a": [1, "x", {"b": 2}]}),
    ("[.[] | strings]", [1, "a", None, "b"]),
    (".. |= numbers", 5),
    # --- round-5: slices (value + path position) ---------------------------
    (".[1:3]", [0, 1, 2, 3, 4]),
    (".[2:]", [0, 1, 2, 3]),
    (".[:2]", [0, 1, 2, 3]),
    (".[-2:]", [0, 1, 2, 3]),
    (".[:-1]", [0, 1, 2]),
    (".[3:1]", [0, 1, 2, 3]),
    (".[1:10]", [0, 1]),
    (".[1:3]", "hello"),
    (".[1:3]", None),
    (".[1.2:3.8]", [0, 1, 2, 3, 4]),  # floor the low bound, ceil the high
    (".a[1:3]", {"a": [0, 1, 2, 3]}),
    ("path(.[1:3])", [0, 1, 2, 3]),
    ('.[1:3] = ["x"]', [0, 1, 2, 3, 4]),
    (".[1:3] |= map(. * 10)", [0, 1, 2, 3, 4]),
    ("del(.[1:3])", [0, 1, 2, 3, 4]),
    ('.a[1:] = [9]', {"a": [0, 1, 2]}),
    # --- round-5: loop/control + error + math builtins ---------------------
    ("[limit(3; .[])]", [1, 2, 3, 4, 5]),
    ("first(.[] | select(. > 2))", [1, 2, 3, 4]),
    ("first(empty)", None),
    ("last(.[])", [1, 2, 3]),
    ("nth(1; .[])", [9, 8, 7]),
    ("nth(1)", [9, 8, 7]),
    ("[while(. < 100; . * 2)]", 1),
    ("until(. > 100; . * 2)", 1),
    ("[limit(4; repeat(. * 2))]", 1),  # 1.6 repeat: f re-runs on the input
    ("map_values(. + 1)", {"a": 1, "b": 2}),
    ("map_values(. + 1)", [1, 2]),
    ("map_values(empty)", {"a": 1, "b": 2}),
    ('try error("boom") catch .', None),
    ('try error({"code": 3}) catch .', None),  # non-string payload survives
    ("try error catch .", {"x": 1}),
    ("pow(2; 10), pow(2; 0.5)", None),
    ("log, log2, log10", 8),
    ("log", 0),
    ("log", -1),
    ("exp", 1),
    ("fabs", -3.5),
    ("round, floor, ceil", 2.5),
    ("round", -2.5),
    ("infinite, -infinite", None),
    ("nan | isnan, (1 | isnan)", None),
    ("infinite | isinfinite", None),
    ('.a | in({"a": 1})', {"a": "a"}),
    ("1 | in([9, 8]), (5 | in([9, 8]))", None),
    ('index("ab"), rindex("ab"), indices("ab")', "xabcab"),
    ('indices("aa")', "aaaa"),  # strings: non-overlapping
    ("indices([1, 1])", [1, 1, 1]),  # arrays: overlapping
    ("index(2), rindex(2), indices(2)", [1, 2, 3, 2]),
    ("indices([1, 2])", [0, 1, 2, 1, 2, 4]),
    ('index("x")', "abc"),
    ('"foo" | inside("foobar")', None),
    ("[1] | inside([1, 2])", None),
    ('contains({"a": {"b": 1}})', {"a": {"b": 1, "c": 2}, "d": 3}),
    ('contains(["foo"])', ["foobar", "x"]),  # deep element containment
    ("any(. > 2), all(. > 0)", [1, 2, 3]),
    ("any(.[]; . > 2), all(.[]; . > 0)", [1, 2, 3]),
    # --- round-5: foreach / label+break / @format strings ------------------
    ("[foreach .[] as $x (0; . + $x)]", [1, 2, 3]),  # running sums
    ("[foreach (1,2) as $x (0; . + $x, . + 10)]", None),  # state = LAST out
    ("[foreach (1,2,3) as $x (0; . + $x; [$x, .])]", None),  # 3-arg extract
    ("[foreach (1,2) as $x ((0,100); . + $x)]", None),  # cartesian init
    ("[reduce (1,2) as $x ((0,100); . + $x)]", None),  # reduce too
    ("[foreach (1,2) as $x (0; (. + $x), empty)]", None),  # empty keeps state
    ("[limit(2; foreach repeat(1) as $x (0; . + $x))]", None),  # lazy
    ("[label $out | 1, 2, (3 | break $out), 4]", None),
    (
        "[label $out | foreach .[] as $x "
        "(0; . + $x; if . > 3 then break $out else . end)]",
        [1, 2, 3, 4],
    ),
    ("label $a | label $b | 1, break $a, 2", None),  # break skips inner
    ("[label $x | label $x | 1, break $x, 2]", None),  # nearest wins
    ("@html", "<a&\"b>'c"),
    ("@html", 1),
    ("@uri", "a b/c?d=e&f+g~h.i-j_k!*'()"),
    ("@uri", "äöü"),  # percent-encodes UTF-8 bytes
    ("@uri", {"a": 1}),  # non-strings go through tostring first
    ("@csv", [1, 'a,"b"', None, True, 2.5]),
    ("@csv", [1e300]),  # big floats print like jq's %.17g
    ("@tsv", [1, "a\tb\nc\\d\re", None, True]),
    ("@sh", "it's"),
    ("@sh", [1, "a b", True, None]),
    ("@base64", 1),
    ("@base64", {"a": 1}),
    ("@base64d", "aGVsbG8="),
    ("@base64d", "aGk"),  # lenient about missing padding
    ("@json", "x"),
    ("@json", [1, {"a": None}]),
    ("@text", [1]),
    ('@uri "q=\\(.a)&r=\\(.a)"', {"a": "x y"}),  # literals NOT escaped
    ('@html "pre\\(.a)post"', {"a": "<b>"}),
    ('@csv "head:\\(.a)"', {"a": [1, "x"]}),
    ('@base64 "v=\\("hi")"', None),
    ("map(@base64)", ["a", "b"]),  # formats compose as plain filters
    # --- round-5: datetime family (UTC; jq 1.6 semantics) ---
    ("gmtime", 1700000000),
    ("gmtime", 1700000000.5),        # fraction preserved in the sec field
    ("gmtime", -1000),               # pre-epoch
    ("gmtime", 0),
    ("gmtime | mktime", 1700000000),  # roundtrip
    ("mktime", [2023, 10, 14, 22, 13, 20, 2, 317]),
    ("mktime", [2023, 10, 14, 22, 13, 20.9, 9, 999]),  # tail/fraction ignored
    ("try mktime catch .", "x"),
    ("try mktime catch .", [2023, 10, 14]),
    ("todate", 1700000000),
    ("todate", 1700000000.7),        # truncates toward the floor second
    ("todateiso8601", 1700000000),
    ("fromdate", "2023-11-14T22:13:20Z"),
    ("fromdateiso8601", "2023-11-14T22:13:20Z"),
    ("try fromdate catch .", "2023-11-14"),
    ("fromdate | todate", "2023-11-14T22:13:20Z"),
    ('strftime("%Y-%m-%d %H:%M:%S")', 1700000000),
    ('strftime("%A %j")', 1700000000),           # names + 1-based yday
    ('strftime("%s")', 1700000000),              # UTC epoch, TZ-independent
    ('strftime("100%% %T")', 1700000000),        # escaped percent
    ("gmtime | strftime(\"%F\")", 1700000000),   # broken-down-time input
    ('strptime("%d/%m/%Y")', "14/11/2023"),      # derived wday/yday filled
    ('strptime("%b %d %Y")', "Mar 10 2024"),
    ('strptime("%Y-%m-%dT%H:%M:%SZ") | mktime', "2023-11-14T22:13:20Z"),
    ('try strptime("%Y") catch .', "notayear"),
    ('[1700000000, 1700086400] | map(todate)', None),
    # --- round-5: prelude-derived builtins (walk/streams/combinations) ---
    ('walk(if type == "number" then . + 1 else . end)', {"a": [1, 2], "b": 3}),
    ('walk(if type == "array" then sort else . end)', {"a": [3, 1, 2]}),
    ("transpose", [[1, 2], [3, 4, 5]]),
    ("transpose", []),
    ("combinations", [[1, 2], [3, 4]]),
    ("combinations", [[1], [], [2]]),   # empty axis -> no combinations
    ("[limit(4; combinations(2))]", [0, 1]),
    ("[tostream]", {"a": [1, {"b": 2}]}),
    ("[tostream]", [[1, 2], [3, 4]]),
    ("[tostream]", 1),
    ("[tostream]", []),
    ("[tostream]", {}),
    ("fromstream(tostream)", {"a": [1, {"b": 2}], "c": []}),
    ("fromstream(tostream)", [1, [2, [3]]]),
    ("fromstream(1 | truncate_stream([[0],1],[[1,0],2],[[1,0]],[[1]]))", None),
    ("fromjson", '"[1, {\\"a\\": null}]"'),
    ("try fromjson catch .", 5),
    ("utf8bytelength", "h\u00e9llo"),
    # --- round-5: libm family (domain edges are nan/inf, never a raise) ---
    ("trunc, nearbyint, ceil, floor", 3.7),
    ("trunc, nearbyint", -3.7),
    ("sqrt", -1),
    ("asin, acos", 2),
    ("atanh", 1),
    ("atanh", -1),
    ("acosh", 0.5),
    ("sin, cos, tan, atan", 0.5),
    ("sinh, cosh, tanh, asinh", 0.5),
    ("acosh", 2.5),
    ("cbrt, exp2, exp10", 5),
    ("logb, significand", 8),
    ("logb", 0),
    ("gamma, lgamma, tgamma", 5),
    ("frexp, modf", 3.7),
    ("[atan2(1; 2), drem(7; 3), ldexp(3; 2), scalb(3; 2), scalbln(3; 2)]", None),
    # --- round-5: non-string ltrimstr/rtrimstr pass through, like jq ---
    ('ltrimstr("a"), rtrimstr("b")', 5),
    ('ltrimstr("a")', ["ab"]),
    # --- round-5: chained as-bindings rebind only their pipe stage ---
    ('. as $n | (null | tostream) | . as $i | [$n, $i]', 7),
    ('.a as $x | .b as $y | [$x, $y, .]', {"a": 1, "b": 2}),
    ('1, . as $x | $x', 5),
    ('[.[] | . as $x | . + 1 | . as $y | [$x, $y]]', [10, 20]),
]


def _mini(program: str, value) -> list[str]:
    from kinesis_data_counter_spark.jq_eval import compile_program

    return compile_program(program).lines(value)


@pytest.mark.skipif(JQ is None, reason="jq binary not available")
@pytest.mark.parametrize("program,value", MINI_CASES, ids=[p for p, _ in MINI_CASES])
def test_mini_jq_matches_real_jq(program, value):
    out = subprocess.run(
        [JQ, "-c", program],
        input=json.dumps(value),
        capture_output=True,
        text=True,
        timeout=30,
    )
    assert out.returncode == 0, out.stderr
    want = [line for line in out.stdout.splitlines() if line.strip()]
    assert _mini(program, value) == want, program


@pytest.mark.skipif(JQ is None, reason="jq binary not available")
@pytest.mark.parametrize("program", PROGRAMS)
def test_mini_jq_covers_the_compiled_subset(program):
    # the interpreter must agree with real jq on every program the
    # compiled Column subset supports, so either path is substitutable
    for row in ROWS:
        out = subprocess.run(
            [JQ, "-c", program], input=json.dumps(row),
            capture_output=True, text=True, timeout=30,
        )
        want = [line for line in out.stdout.splitlines() if line.strip()]
        assert _mini(program, row) == want, (program, row)


def test_mini_jq_runtime_errors_match_jq_error_style():
    from kinesis_data_counter_spark.jq_eval import JqRuntimeError, compile_program

    for prog, value in [
        (".a + 1", {"a": "s"}),      # string + number
        (".[]", 5),                   # iterate a scalar
        ('.a | keys', {"a": 5}),      # keys of a number
        ("1 / 0", None),              # divide by zero
        ("5 % 0.5", None),            # divisor truncates to 0 → jq error,
                                      # NOT a bare Python math-domain error
        ('test("(")', "x"),           # invalid regex → jq error, not re.error
        ('test("a"; "q")', "x"),      # bad modifier string
        ('sub("a"; 1)', "abc"),       # non-string replacement
        ('test("a")', 5),             # regex input must be a string
        ('getpath(["a", "b"])', {"a": 5}),  # path through a scalar
        ('.a[0] = 1', {"a": 5}),      # assignment through a wrong type
        ('5 | .[] = 1', None),        # iterate-assign a scalar
    ]:
        with pytest.raises(JqRuntimeError):
            list(compile_program(prog)(value))


def test_mini_jq_regex_errors_are_suppressible_by_try():
    # the whole point of keeping errors inside JqRuntimeError: jq-level
    # try/? must be able to suppress them (ADVICE r4: bare ValueErrors
    # escaped the hierarchy and failed whole jobs on one bad record)
    from kinesis_data_counter_spark.jq_eval import compile_program

    assert compile_program('try (5 % 0.5) catch "bad"').lines(None) == ['"bad"']
    assert compile_program('try test("(") catch "bad"').lines("x") == ['"bad"']
    assert compile_program("(5 % 0.5)? // 9").lines(None) == ["9"]


def test_mini_jq_empty_pattern_gsub_terminates():
    # real jq 1.x loops forever on gsub(""; ...) — a binary bug, so this
    # case is pinned directly rather than differentially; the replacement
    # sites are exactly the (differentially-pinned) match(""; "g") set,
    # which excludes the zero-width end-of-string position
    from kinesis_data_counter_spark.jq_eval import compile_program

    assert compile_program('gsub(""; "-")').lines("ab") == ['"-a-b"']


def test_mini_jq_unsupported_constructs_fail_at_compile_time():
    from kinesis_data_counter_spark.jq_eval import compile_program

    for prog in [
        "input",                    # input/inputs need a record stream
        "@nope",                    # unknown format
        "break $never_bound",       # unbound break: jq compile error too
        "undefined_func(1)",        # unknown function with args
        "select(.a",                # unbalanced
        '"\\(.a"',                  # unterminated interpolation
    ]:
        with pytest.raises(JqUnsupported):
            compile_program(prog)


def test_mini_jq_binary_divergences_pinned_directly():
    # places where the jq 1.6 binary itself is buggy or lacks the builtin;
    # the interpreter follows the documented/modern semantics and pins
    # them directly instead of differentially
    from kinesis_data_counter_spark.jq_eval import compile_program

    # jq 1.6's limit(0; f) wrongly emits one output; the manual (and 1.7)
    # say none
    assert compile_program("[limit(0; .[])]").lines([1, 2]) == ["[]"]
    # abs/0 exists only from jq 1.7
    assert compile_program("abs").lines(-3) == ["3"]
    assert compile_program("abs").lines(2.5) == ["2.5"]
    # jq 1.6 lets try catch a break (returns [1,"caught"]); 1.7 fixed it —
    # break must unwind to its label untouched by intervening try/catch
    assert compile_program(
        '[label $out | try (1, break $out, 2) catch "caught"]'
    ).lines(None) == ["[1]"]


def test_mini_jq_format_errors_are_catchable_jq_errors():
    # bad format inputs raise JqRuntimeError (suppressable with try/?),
    # with the binary's own wording
    from kinesis_data_counter_spark.jq_eval import JqRuntimeError, compile_program

    for prog, inp, msg in [
        ("@csv", "x", "cannot be csv-formatted, only array"),
        ("@tsv", [[1]], "is not valid in a csv row"),  # jq says csv for tsv too
        ("@sh", {"a": 1}, "can not be escaped for shell"),
        ("@base64d", "!!!", "is not valid base64 data"),
    ]:
        with pytest.raises(JqRuntimeError, match=msg):
            compile_program(prog).lines(inp)
        assert compile_program(f"try {prog} catch \"e\"").lines(inp) == ['"e"']


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


def test_jq_udtf_skips_per_record_runtime_errors(spark):
    # ADVICE r4: a JqRuntimeError on one heterogeneous row must skip that
    # record (S4 per-record-failure discipline), not fail the whole query —
    # same contract as the bad-JSON path. Outputs from other rows survive.
    from kinesis_data_counter_spark.functions.udtfs import jq_udtf

    spark.udtf.register("jq_err_udtf", jq_udtf())
    spark.createDataFrame(
        [(1, '{"a": 2}'), (2, '{"a": "s"}'), (3, "not json"), (4, '{"a": 5}')],
        "id long, payload string",
    ).createOrReplaceTempView("jq_err_v")
    rows = spark.sql(
        "SELECT id, t.value FROM jq_err_v, "
        "LATERAL jq_err_udtf(payload, '.a + 1') t ORDER BY id"
    ).collect()
    # row 2 hits string+number (JqRuntimeError), row 3 is bad JSON: skipped
    assert [(r["id"], r["value"]) for r in rows] == [(1, "3"), (4, "6")]


def test_eval_jq_object_refuses_multi_output():
    from kinesis_data_counter_spark.jq import JqUnsupported as JU
    from kinesis_data_counter_spark.jq import eval_jq_object

    with pytest.raises(JU, match="multi-output"):
        eval_jq_object(".items[]", dict(NROWS[0]))


# ---------------------------------------------------------------------------
# input/inputs — jq's INPUT-STREAM model (MiniJqProgram.stream)
# ---------------------------------------------------------------------------

# (program, records, null_input): differential vs `jq [-n] -c` fed the
# records as a newline-delimited JSON stream
STREAM_CASES = [
    ("reduce inputs as $x (0; . + $x)", [1, 2, 3, 4], True),
    ("[inputs]", [1, 2, 3], True),
    ("[inputs] | add", [], True),
    ("[limit(3; inputs)]", [1, 2, 3, 4, 5], True),
    ("[inputs | .a] | add", [{"a": 1}, {"a": 2}], True),
    ("try input catch \"done\"", [], True),
    ("input, input", [10, 20, 30], True),
    ("foreach inputs as $x (0; . + $x; .)", [1, 2, 3], True),
    # the counter_jq_stream_fold registry program: grouped partial fold
    # with a NULL-key sentinel, dynamic-key path assignment, to_entries
    (
        'reduce inputs as $r ({}; ($r.et // "<NULL>") as $k '
        "| .[$k] = ((.[$k] // {n: 0, amt: 0, mn: $r.id}) "
        "| {n: (.n + 1), amt: (.amt + $r.cents), mn: ([.mn, $r.id] | min)})) "
        '| to_entries[] | {et: (.key | if . == "<NULL>" then null else . end), '
        "n: .value.n, amt: .value.amt, mn: .value.mn}",
        [
            {"et": "click", "cents": 100, "id": 5},
            {"et": "view", "cents": 250, "id": 2},
            {"et": "click", "cents": 50, "id": 1},
            {"et": None, "cents": 7, "id": 9},
        ],
        True,
    ),
    (". , input", [1, 2, 3, 4], False),  # main loop: input inside a pass
    (". + 1", [1, 2, 3], False),         # main loop without input calls
    ("[., input]", [1, 2, 3, 4], False),
    ("reduce inputs as $x (.; . + $x)", [1, 2, 3], False),  # first rec seeds
]


def _real_jq_stream(program: str, records, null_input: bool) -> list[str]:
    argv = [JQ, "-c"] + (["-n"] if null_input else []) + [program]
    out = subprocess.run(
        argv,
        input="\n".join(json.dumps(r) for r in records),
        capture_output=True,
        text=True,
        timeout=30,
    )
    assert out.returncode == 0, out.stderr
    return [line for line in out.stdout.splitlines() if line.strip()]


@pytest.mark.skipif(JQ is None, reason="jq binary not available")
@pytest.mark.parametrize(
    "program,records,null_input",
    STREAM_CASES,
    ids=[f"{p}|n={n}" for p, _, n in STREAM_CASES],
)
def test_stream_mode_matches_real_jq(program, records, null_input):
    from kinesis_data_counter_spark.jq_eval import compile_program

    got = compile_program(program, allow_inputs=True).stream_lines(
        records, null_input=null_input
    )
    assert got == _real_jq_stream(program, records, null_input), program


def test_stream_input_past_end_is_a_catchable_jq_error():
    # jq 1.7 wording ("No more inputs"); the 1.6 binary garbles the
    # uncaught message as "break", so this is pinned directly — the
    # CONTRACT under test is that try/? can suppress it.
    from kinesis_data_counter_spark.jq_eval import JqRuntimeError, compile_program

    prog = compile_program("input", allow_inputs=True)
    with pytest.raises(JqRuntimeError, match="No more inputs"):
        prog.stream_lines([], null_input=True)
    ok = compile_program("input? // \"end\"", allow_inputs=True)
    assert ok.stream_lines([], null_input=True) == ['"end"']


def test_apply_jq_stream_partition_fold(spark):
    # commutative-associative per-partition fold: each partition emits one
    # partial, and the merged partials equal the global total — the
    # partial/final counter topology expressed as a jq program
    from kinesis_data_counter_spark.jq import apply_jq_stream

    df = spark.range(0, 100).selectExpr("id AS v").repartition(4)
    out = apply_jq_stream(df, "reduce (inputs | .v) as $x (0; . + $x)")
    partials = [json.loads(r["value"]) for r in out.collect()]
    assert len(partials) == out.rdd.getNumPartitions() or sum(partials) == 4950
    assert sum(partials) == 4950


def test_apply_jq_stream_single_partition_matches_cli(spark):
    # the jq-CLI-on-a-file shape: one sorted partition == one input stream
    from kinesis_data_counter_spark.jq import apply_jq_stream

    rows = [{"id": i, "v": i * 10} for i in range(6)]
    df = (
        spark.createDataFrame([(r["id"], r["v"]) for r in rows], "id long, v long")
        .repartition(1)
        .sortWithinPartitions("id")
    )
    got = [r["value"] for r in apply_jq_stream(df, "[inputs | .v] | add").collect()]
    if JQ is not None:
        assert got == _real_jq_stream("[inputs | .v] | add", rows, True)
    assert got == ["150"]


def test_apply_jq_stream_main_loop_mode(spark):
    from kinesis_data_counter_spark.jq import apply_jq_stream

    df = (
        spark.createDataFrame([(i,) for i in range(4)], "v long")
        .repartition(1)
        .sortWithinPartitions("v")
    )
    got = [
        r["value"]
        for r in apply_jq_stream(df, ".v + 1", null_input=False).collect()
    ]
    assert got == ["1", "2", "3", "4"]


def test_apply_jq_generic_still_gates_inputs(spark):
    # per-record mode has no stream to read: fail at driver time with the
    # redirect to apply_jq_stream
    from kinesis_data_counter_spark.jq import apply_jq_generic

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(JqUnsupported, match="apply_jq_stream"):
        apply_jq_generic(df, "[inputs]")


# ---------------------------------------------------------------------------
# datetime edges the binary can't pin
# ---------------------------------------------------------------------------


def test_strftime_non_string_format_is_catchable():
    # jq 1.6's BINARY aborts on `strftime(5)` (jv.c assertion) — the
    # interpreter pins the sane behavior instead: a catchable jq error
    from kinesis_data_counter_spark.jq_eval import JqRuntimeError, compile_program

    with pytest.raises(JqRuntimeError, match="string format"):
        list(compile_program("strftime(5)")(1700000000))
    assert compile_program('strftime(5)? // "bad"').lines(1700000000) == ['"bad"']


def test_wall_clock_builtins_stay_compile_gated():
    # now/localtime/strflocaltime would break deterministic replay across
    # engines and executors; they fail at compile time like other
    # out-of-core constructs
    from kinesis_data_counter_spark.jq_eval import compile_program

    for prog in ("now", "localtime", 'strflocaltime("%T")'):
        with pytest.raises(JqUnsupported):
            compile_program(prog)
