"""Third-engine pinning for the target_expr translator (VERDICT r6 task 6).

The reference compiles ``target_expr`` with ``mashiike/evaluator``
(config.go:93-99) and its own testdata configs exercise the grammar
end-to-end (testdata/target_expr.yaml, target_expr_count.yaml,
counter_test.go:116-148). Two-engine twins (Spark + DuckDB) share blind
spots because both translations come from the same mental model — so this
file adds a THIRD, translation-free implementation: a tiny pure-Python
recursive evaluator of the grammar subset, written directly against the
documented semantics, never against expr.py.

Semantic stance (documented divergence from the Go package): where
``mashiike/evaluator`` hard-errors on a nil operand, the counter skips the
record (counter.go:262-266); our engine yields SQL NULL and the F3
nil/false rule then skips it — the same observable counting outcome. The
mini-evaluator therefore implements SQL three-valued logic.

A falsifier class proves the table discriminates: deliberately-wrong
evaluator variants (eager/swapped ``if``, equality-as-contains, two-valued
AND) must diverge from Spark on at least one table case each.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from kinesis_data_counter_spark.expr import (
    translate_target_expr,
    translate_target_expr_duckdb,
)

# ---------------------------------------------------------------------------
# engine 3: direct recursive-descent evaluation of the evaluator grammar
# ---------------------------------------------------------------------------


class _MiniEval:
    """Pure-Python evaluator for the target_expr subset.

    Grammar (precedence low->high): ``||``, ``&&``, ``!``, comparisons
    (== != < <= > >=), additive (+ -), multiplicative (* /), unary minus,
    atoms (numbers, double-quoted strings, nil, identifiers, function
    calls, parens). Three-valued logic on NULL (None).
    """

    def __init__(self, expr: str, record: dict):
        self.s = expr
        self.i = 0
        self.rec = record

    # --- lexing helpers ---
    def _ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def _peek(self, tok: str) -> bool:
        self._ws()
        return self.s.startswith(tok, self.i)

    def _eat(self, tok: str) -> bool:
        if self._peek(tok):
            self.i += len(tok)
            return True
        return False

    # --- grammar ---
    def parse(self):
        v = self._or()
        self._ws()
        if self.i != len(self.s):
            raise ValueError(f"trailing input at {self.i}: {self.s!r}")
        return v

    def _or(self):
        v = self._and()
        while True:
            self._ws()
            if self._eat("||"):
                r = self._and()
                v = self._lor(v, r)
            else:
                return v

    def _and(self):
        v = self._not()
        while True:
            self._ws()
            if self._eat("&&"):
                r = self._not()
                v = self._land(v, r)
            else:
                return v

    def _not(self):
        self._ws()
        if self._peek("!") and not self._peek("!="):
            self._eat("!")
            v = self._not()
            return None if v is None else (not self._truthy(v))
        return self._cmp()

    def _cmp(self):
        v = self._add()
        self._ws()
        for op in ("==", "!=", "<=", ">=", "<", ">"):
            if self._eat(op):
                r = self._add()
                if v is None or r is None:
                    return None
                if op == "==":
                    return v == r
                if op == "!=":
                    return v != r
                if op == "<=":
                    return v <= r
                if op == ">=":
                    return v >= r
                if op == "<":
                    return v < r
                return v > r
        return v

    def _add(self):
        v = self._mul()
        while True:
            self._ws()
            if self._eat("+"):
                r = self._mul()
                v = None if v is None or r is None else v + r
            elif self._peek("-") and not self._peek("->"):
                self._eat("-")
                r = self._mul()
                v = None if v is None or r is None else v - r
            else:
                return v

    def _mul(self):
        v = self._unary()
        while True:
            self._ws()
            if self._eat("*"):
                r = self._unary()
                v = None if v is None or r is None else v * r
            elif self._eat("/"):
                r = self._unary()
                v = None if v is None or r is None else v / r
            else:
                return v

    def _unary(self):
        self._ws()
        if self._eat("-"):
            v = self._unary()
            return None if v is None else -v
        return self._atom()

    def _atom(self):
        self._ws()
        c = self.s[self.i]
        if c == "(":
            self.i += 1
            v = self._or()
            self._ws()
            assert self._eat(")"), "unbalanced ("
            return v
        if c in "\"'":
            j = self.i + 1
            out = []
            while self.s[j] != c:
                if self.s[j] == "\\":
                    j += 1
                out.append(self.s[j])
                j += 1
            self.i = j + 1
            return "".join(out)
        if c.isdigit():
            j = self.i
            while j < len(self.s) and (self.s[j].isdigit() or self.s[j] == "."):
                j += 1
            tok = self.s[self.i : j]
            self.i = j
            return float(tok) if "." in tok else int(tok)
        # identifier / keyword / function
        j = self.i
        while j < len(self.s) and (self.s[j].isalnum() or self.s[j] == "_"):
            j += 1
        name = self.s[self.i : j]
        self.i = j
        self._ws()
        if self.i < len(self.s) and self.s[self.i] == "(":
            self.i += 1
            args_thunks = self._lazy_args()
            return self._call(name, args_thunks)
        if name == "nil":
            return None
        if name == "true":
            return True
        if name == "false":
            return False
        if name not in self.rec:
            raise KeyError(name)
        return self.rec[name]

    def _lazy_args(self):
        # capture each argument's SOURCE span; evaluate on demand (if() is
        # lazy in every engine: Spark's CASE WHEN does not eval the dead arm)
        spans = []
        depth = 1
        start = self.i
        in_str = None
        while depth > 0:
            ch = self.s[self.i]
            if in_str:
                if ch == "\\":
                    self.i += 1
                elif ch == in_str:
                    in_str = None
            elif ch in "\"'":
                in_str = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    spans.append(self.s[start : self.i])
            elif ch == "," and depth == 1:
                spans.append(self.s[start : self.i])
                start = self.i + 1
            self.i += 1
        if spans == [""]:
            spans = []
        rec = self.rec
        return [
            (lambda src=src: _MiniEval(src.strip(), rec).parse()) for src in spans
        ]

    def _call(self, name, thunks):
        if name == "if":
            assert len(thunks) == 3, "if() needs 3 arguments"
            c = thunks[0]()
            return thunks[1]() if self._truthy(c) else thunks[2]()
        if name == "coalesce":
            for t in thunks:
                v = t()
                if v is not None:
                    return v
            return None
        if name == "string_contains":
            assert len(thunks) == 2
            s, sub = thunks[0](), thunks[1]()
            if s is None or sub is None:
                return None
            return str(s).find(str(sub)) >= 0
        if name == "as_string":
            (t,) = thunks
            v = t()
            if v is None:
                return None
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, float) and v.is_integer():
                return str(v)  # keep the .0 — Spark string(double) does
            return str(v)
        raise ValueError(f"unknown function {name}")

    @staticmethod
    def _truthy(v) -> bool:
        return v is True

    @staticmethod
    def _land(a, b):
        # Kleene AND
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return bool(a and b)

    @staticmethod
    def _lor(a, b):
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return bool(a or b)


def mini_eval(expr: str, record: dict):
    return _MiniEval(expr.strip(), record).parse()


# ---------------------------------------------------------------------------
# the semantics table: the reference's own config expressions + edge cases
# ---------------------------------------------------------------------------

# reference testdata/target_expr.yaml and target_expr_count.yaml verbatim
REF_EXPR_LOGIN = 'if(string_contains(path,"my_page"), user_id, nil)'
REF_EXPR_ONE = "1"

# (expr, record, expected) — expected derived by hand from the evaluator
# semantics the reference's counter_test.go outcomes imply (distinct of
# the login expr over the fixture = users on /my_page; count of `1` = n)
TABLE = [
    (REF_EXPR_LOGIN, {"path": "/my_page", "user_id": 1007}, 1007),
    (REF_EXPR_LOGIN, {"path": "/", "user_id": 1007}, None),
    (REF_EXPR_LOGIN, {"path": None, "user_id": 1007}, None),
    (REF_EXPR_ONE, {"path": "/", "user_id": 1}, 1),
    # §2.6.1 falsy-but-countable values and the nil/false skip rule
    ("user_id > 1005", {"path": "/", "user_id": 1007}, True),
    ("user_id > 1005", {"path": "/", "user_id": 1001}, False),
    ("user_id > 1005", {"path": "/", "user_id": None}, None),
    # literal containing syntax-lookalikes must stay opaque
    ('string_contains(path, "if(a,b,c)")', {"path": "xif(a,b,c)y", "user_id": 0}, True),
    ('string_contains(path, "nil")', {"path": "vanilla", "user_id": 0}, True),
    # nested if + coalesce + as_string
    (
        'if(user_id > 1005, as_string(user_id), coalesce(path, "none"))',
        {"path": None, "user_id": 1001},
        "none",
    ),
    (
        'if(user_id > 1005, as_string(user_id), coalesce(path, "none"))',
        {"path": "/p", "user_id": 1007},
        "1007",
    ),
    ('coalesce(nil, nil, "z")', {"path": "/", "user_id": 0}, "z"),
    # three-valued logic through the Go-style operators
    ("user_id > 0 && string_contains(path, \"my\")", {"path": None, "user_id": 3}, None),
    ("user_id > 0 || string_contains(path, \"my\")", {"path": None, "user_id": 3}, True),
    ("!(user_id > 0)", {"path": "/", "user_id": 3}, False),
    # arithmetic mix
    ("user_id * 2 + 1", {"path": "/", "user_id": 10}, 21),
    ("if(user_id != 0, user_id / 2, nil)", {"path": "/", "user_id": 7}, 3.5),
]


def _duck_eval(expr: str, record: dict):
    sql = translate_target_expr_duckdb(expr)
    con = duckdb.connect()
    cols, vals = [], []
    for k, v in record.items():
        cols.append(k)
        vals.append(v)
    # typed projection so NULLs keep sane types
    sel = ", ".join(
        f"? AS {c}" if record[c] is None or not isinstance(record[c], str)
        else f"CAST(? AS VARCHAR) AS {c}"
        for c in cols
    )
    return con.execute(f"SELECT {sql} FROM (SELECT {sel}) r", vals).fetchone()[0]


def _spark_eval_batch(spark, expr: str, records: list[dict]):
    from pyspark.sql import functions as F

    rows = [(i, r.get("path"), r.get("user_id")) for i, r in enumerate(records)]
    df = spark.createDataFrame(rows, "i long, path string, user_id long")
    out = df.select("i", F.expr(translate_target_expr(expr)).alias("v"))
    return {r["i"]: r["v"] for r in out.collect()}


def _norm(v):
    # cross-engine numeric normalization: int-valued floats == ints
    if isinstance(v, bool) or v is None or isinstance(v, str):
        return v
    f = float(v)
    return int(f) if f.is_integer() else f


@pytest.mark.parametrize("expr", sorted({e for e, _, _ in TABLE}))
def test_table_three_engine_agreement(spark, expr):
    cases = [(rec, exp) for e, rec, exp in TABLE if e == expr]
    spark_vals = _spark_eval_batch(spark, expr, [rec for rec, _ in cases])
    for i, (rec, expected) in enumerate(cases):
        m = mini_eval(expr, rec)
        d = _duck_eval(expr, rec)
        s = spark_vals[i]
        assert _norm(m) == _norm(expected), (expr, rec, m, expected)
        assert _norm(d) == _norm(expected), (expr, rec, d, expected)
        assert _norm(s) == _norm(expected), (expr, rec, s, expected)


def test_reference_fixture_contract_end_to_end(spark):
    # the counter_test.go contract re-derived through all three engines:
    # distinct(login expr) == users below herfPoint; count(`1`) == n
    m, n = 10, 100
    user_ids, cur = [], 1000
    rng = random.Random(42)
    for _ in range(m):
        cur += rng.randint(1, 3)
        user_ids.append(cur)
    herf = user_ids[m // 2]
    records = [
        {
            "path": "/my_page" if user_ids[i % m] < herf else "/",
            "user_id": user_ids[i % m],
        }
        for i in range(n)
    ]
    expected_distinct = len({u for u in user_ids if u < herf})
    mini_vals = [mini_eval(REF_EXPR_LOGIN, r) for r in records]
    assert len({v for v in mini_vals if v is not None}) == expected_distinct
    spark_vals = _spark_eval_batch(spark, REF_EXPR_LOGIN, records)
    assert len({v for v in spark_vals.values() if v is not None}) == expected_distinct
    assert sum(1 for r in records if mini_eval(REF_EXPR_ONE, r) not in (None, False)) == n


def test_randomized_three_engine_differential(spark):
    # random records through every table expression: mini-evaluator,
    # DuckDB, and Spark must agree value-for-value
    rng = random.Random(7)
    records = []
    for _ in range(40):
        records.append(
            {
                "path": rng.choice(
                    [None, "/", "/my_page", "/my_page/x", "if(a,b,c)", "nil", ""]
                ),
                "user_id": rng.choice([None, 0, 1, 1001, 1007, -3]),
            }
        )
    exprs = sorted({e for e, _, _ in TABLE})
    for expr in exprs:
        spark_vals = _spark_eval_batch(spark, expr, records)
        for i, rec in enumerate(records):
            m = _norm(mini_eval(expr, rec))
            d = _norm(_duck_eval(expr, rec))
            s = _norm(spark_vals[i])
            assert m == d == s, (expr, rec, m, d, s)


def test_table_discriminates_wrong_semantics():
    # falsifiers: each deliberately-broken evaluator variant must FAIL the
    # table — proving the table pins real semantics, not tautologies
    def eager_swapped_if(expr, rec):
        v = mini_eval(expr, rec)
        if expr.startswith("if("):
            # swapped branches: my_page users map to nil
            inner = _MiniEval(expr, rec)
            return None if v is not None else rec.get("user_id")
        return v

    def contains_as_equality(expr, rec):
        if "string_contains" in expr:
            path = rec.get("path")
            return path == "my_page" if path is not None else None
        return mini_eval(expr, rec)

    def two_valued_and(expr, rec):
        if "&&" in expr:
            v = mini_eval(expr, rec)
            return False if v is None else v  # NULL collapsed to False
        return mini_eval(expr, rec)

    for broken in (eager_swapped_if, contains_as_equality, two_valued_and):
        diverged = any(
            _norm(broken(e, r)) != _norm(exp) for e, r, exp in TABLE
        )
        assert diverged, f"{broken.__name__} survived the table"


# ---------------------------------------------------------------------------
# generated-tree three-engine differential: random well-typed expression
# TREES (not just the fixed table) through mini-evaluator + Spark + DuckDB.
# Numeric leaves are integer-only here — float-to-string formatting inside
# as_string() is engine-repr territory the two-engine random differential
# already pins; this test adds the translation-free third opinion on the
# grammar's logic, 3VL, and laziness.
# ---------------------------------------------------------------------------

_3E_ROWS = [
    {"user_id": 8, "event_type": "error"},
    {"user_id": 46, "event_type": "click"},
    {"user_id": 7, "event_type": "view"},
    {"user_id": None, "event_type": "click"},
    {"user_id": 0, "event_type": None},
    {"user_id": -3, "event_type": "signup"},
    {"user_id": None, "event_type": None},
]


def _gen_num(rng, d):
    if d <= 0:
        return rng.choice(["user_id", str(rng.randint(-5, 99)), "nil"])
    c = rng.randint(0, 4)
    if c <= 2:
        op = "+-*"[c]
        return f"({_gen_num(rng, d - 1)} {op} {_gen_num(rng, d - 1)})"
    if c == 3:
        return f"coalesce({_gen_num(rng, d - 1)}, {_gen_num(rng, d - 1)})"
    return f"if({_gen_bool(rng, d - 1)}, {_gen_num(rng, d - 1)}, {_gen_num(rng, d - 1)})"


def _gen_str(rng, d):
    if d <= 0:
        return rng.choice(["event_type", "'click'", '"er ror"', "'x'", "nil"])
    c = rng.randint(0, 2)
    if c == 0:
        return f"coalesce({_gen_str(rng, d - 1)}, {_gen_str(rng, d - 1)})"
    if c == 1:
        return f"as_string({_gen_num(rng, d - 1)})"
    return f"if({_gen_bool(rng, d - 1)}, {_gen_str(rng, d - 1)}, {_gen_str(rng, d - 1)})"


def _gen_bool(rng, d):
    if d <= 0:
        op = rng.choice(["<", "<=", ">", ">=", "==", "!="])
        if rng.random() < 0.5:
            return f"({_gen_num(rng, 0)} {op} {_gen_num(rng, 0)})"
        return f"({_gen_str(rng, 0)} {op} {_gen_str(rng, 0)})"
    c = rng.randint(0, 4)
    if c == 0:
        return f"({_gen_bool(rng, d - 1)} && {_gen_bool(rng, d - 1)})"
    if c == 1:
        return f"({_gen_bool(rng, d - 1)} || {_gen_bool(rng, d - 1)})"
    if c == 2:
        return f"(!{_gen_bool(rng, d - 1)})"
    if c == 3:
        return f"string_contains({_gen_str(rng, d - 1)}, {_gen_str(rng, 0)})"
    op = rng.choice(["<", ">", "==", "!="])
    return f"({_gen_num(rng, d - 1)} {op} {_gen_num(rng, d - 1)})"


@pytest.mark.parametrize("seed", [20260815, 31])
def test_generated_trees_three_engine_agreement(spark, seed):
    from pyspark.sql import functions as F

    rng = random.Random(seed)
    exprs = (
        [_gen_bool(rng, rng.randint(1, 3)) for _ in range(15)]
        + [_gen_num(rng, rng.randint(1, 3)) for _ in range(8)]
        + [_gen_str(rng, rng.randint(1, 3)) for _ in range(8)]
    )
    rows = [(r["user_id"], r["event_type"]) for r in _3E_ROWS]
    df = spark.createDataFrame(rows, "user_id long, event_type string").coalesce(1)
    spark_cols = [
        F.expr(translate_target_expr(e)).alias(f"e{i}") for i, e in enumerate(exprs)
    ]
    got = df.select(*spark_cols).collect()

    con = duckdb.connect()
    con.execute("CREATE TABLE t (user_id BIGINT, event_type VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck_cols = ", ".join(
        f"({translate_target_expr_duckdb(e)}) AS e{i}" for i, e in enumerate(exprs)
    )
    want = con.execute(f"SELECT {duck_cols} FROM t").fetchall()

    for r, rec in enumerate(_3E_ROWS):
        for i, e in enumerate(exprs):
            m = _norm(mini_eval(e, rec))
            s = _norm(got[r][f"e{i}"])
            d = _norm(want[r][i])
            assert m == s == d, (e, rec, m, s, d)
