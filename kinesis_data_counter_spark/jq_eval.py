"""Pure-Python mini-jq evaluator — the dependency-free generic fallback.

The reference applies an ARBITRARY gojq program to each output record
(counter.go:439-466); the compiled subset in :mod:`jq.py` covers every
program shape the reference's fixtures and README exercise as JVM-side
projections, but user programs beyond it previously needed an unbundled
``jq`` Python binding. This module removes that dependency: a small
recursive-descent parser plus a generator-based evaluator over plain
Python JSON values, implementing the jq core —

  identity / field / index / slice-free paths, ``.foo[]`` / ``.[]``
  iteration, ``..`` recursive descent, optional ``?``, pipes, comma streams, object and array
  construction, string interpolation, arithmetic (+ - * / %), comparisons,
  ``and`` / ``or`` / ``not``, alternative ``//``, ``select`` / ``empty`` /
  ``if-elif-else-end``, ``try``/``catch`` (and the ``?`` shorthand),
  ``reduce`` / ``as $x``-bindings, and a library of the common builtins
  (length, keys, has, type, tostring, tonumber, add, map, join, split,
  sort, sort_by, group_by, unique_by, min_by/max_by, flatten, range,
  to_entries, from_entries, with_entries, explode/implode, …), the regex
  builtins (``test`` / ``match`` / ``capture`` / ``scan`` / ``sub`` /
  ``gsub`` / ``splits`` / ``split/2`` with the g i x s m n flags), and
  user-defined functions (``def f: ...;`` / ``def f(x; $y): ...;`` with
  call-by-name filter params, ``$``-value params, and recursion), path
  expressions and assignment (``= |= += -= *= /= %= //=``, ``del``,
  ``path`` / ``paths`` / ``leaf_paths`` / ``getpath`` / ``setpath`` /
  ``delpaths``), and the type filters (``numbers`` / ``strings`` / …).

Semantics are pinned against the real /usr/bin/jq binary by
tests/test_jq_differential.py (evaluation order of binary operators is
right-operand-outer, integral doubles print as integers, the jq total
order null < false < true < numbers < strings < arrays < objects, missing
object fields read as null). Slices work in value AND path position
(slice assignment/deletion splice), and the loop builtins (``limit`` /
``first(f)`` / ``last(f)`` / ``nth`` / ``until`` / ``while`` /
``repeat``), ``foreach`` (2- and 3-arg), ``label``/``break``, the
``@format`` strings (``@csv @tsv @sh @html @uri @json @text @base64
@base64d``, both as filters and as string prefixes), ``error`` with
non-string payloads, the math builtins (including the libm family —
trig/hyperbolic, cbrt/exp2/exp10/logb/significand/frexp/modf/trunc/
nearbyint, gamma≡lgamma/tgamma, atan2/drem/ldexp/scalb — with libm's
domain-edge contract: nan/±inf, never a raised error), the
prelude-derived builtins shipped as jq SOURCE exactly like builtin.jq
(``walk``, ``fromstream``, ``truncate_stream`` with 1.6's null-input
rebind, ``combinations``/0+1) plus native ``tostream`` / ``fromjson`` /
``utf8bytelength`` / ``transpose``, and the UTC datetime family
(``gmtime``/``mktime``/``strftime``/``strptime``/``todate``/``fromdate``
and the iso8601 aliases; ``now``/``localtime``/``strflocaltime`` stay
compile-gated — wall-clock and executor-TZ dependence would break
deterministic replay) are covered.
``input``/``inputs`` (jq's INPUT-STREAM model) run via
:meth:`MiniJqProgram.stream` / ``jq.apply_jq_stream`` — per-partition
record streams, both the ``-n`` shape and the default main loop — and
raise :class:`~kinesis_data_counter_spark.jq.JqUnsupported` at COMPILE
time on the default per-record path (``compile_program`` without
``allow_inputs``), so callers fail before any executor work is scheduled. Regex dialect note:
patterns run on Python ``re`` with ``(?<name>…)`` translated to
``(?P<name>…)``; jq's Oniguruma and Python agree on the common dialect
the differential suite pins, but exotic Oniguruma extensions differ.

This is a per-record interpreter: the right engine for the output-shaping
role it plays (counter outputs are tiny, already-aggregated rows). Hot
data paths should stay on the compiled subset / built-in columns.
"""

from __future__ import annotations

import base64
import calendar
import functools
import json
import math
import re
import time
from collections.abc import Iterator

__all__ = ["MiniJqProgram", "compile_program", "JqRuntimeError"]


_NO_PAYLOAD = object()


class JqRuntimeError(ValueError):
    """A jq runtime error (type mismatch etc.) — suppressed under ``?``.

    ``payload`` carries the value passed to jq's ``error(v)`` builtin, so
    a ``catch`` handler receives the original value (object, array, …)
    rather than its stringification; engine-raised errors have no payload
    and the handler gets the message string, like jq."""

    def __init__(self, msg: str, payload=_NO_PAYLOAD):
        super().__init__(msg)
        self.payload = payload


class _JqBreak(Exception):
    """Control-flow carrier for ``break $label`` — caught only by the
    matching ``label``. Deliberately NOT a JqRuntimeError: ``try`` must
    not intercept a break (jq ≥1.7 semantics; 1.6's try-catches-break is
    a since-fixed binary bug, pinned directly in the tests)."""

    def __init__(self, token):
        self.token = token


def _unsupported(msg: str):
    from kinesis_data_counter_spark.jq import JqUnsupported

    return JqUnsupported(msg)


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_PUNCT = (
    "|",
    ",",
    ";",
    ":",
    "(",
    ")",
    "[",
    "]",
    "{",
    "}",
    "?",
    ".",
    "$",
)
_OPS3 = ("//=",)
_OPS2 = ("==", "!=", "<=", ">=", "//", "|=", "+=", "-=", "*=", "/=", "%=")
_OPS1 = ("<", ">", "+", "-", "*", "/", "%", "=")
_ASSIGN_OPS = ("=", "|=", "+=", "-=", "*=", "/=", "%=", "//=")
_KEYWORDS = {
    "and",
    "or",
    "if",
    "then",
    "elif",
    "else",
    "end",
    "as",
    "reduce",
    "foreach",
    "label",
    "break",
    "try",
    "catch",
    "def",
    "true",
    "false",
    "null",
}


def _is_ident_start(c: str) -> bool:
    return c.isalpha() or c == "_"


def _is_ident(c: str) -> bool:
    return c.isalnum() or c == "_"


def _tokenize(src: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c.isspace():
            i += 1
            continue
        if src[i : i + 3] in _OPS3:
            toks.append(("op", src[i : i + 3]))
            i += 3
            continue
        two = src[i : i + 2]
        if two == "..":
            toks.append(("punct", ".."))
            i += 2
            continue
        if two in _OPS2:
            toks.append(("op", two))
            i += 2
            continue
        if c == '"':
            parts, i = _scan_string(src, i)
            toks.append(("str", parts))
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            while j < n and (src[j].isdigit() or src[j] in ".eE" or (src[j] in "+-" and src[j - 1] in "eE")):
                j += 1
            lit = src[i:j]
            try:
                num = json.loads(lit)
            except ValueError as e:
                raise _unsupported(f"bad number literal: {lit!r}") from e
            toks.append(("num", num))
            i = j
            continue
        if _is_ident_start(c):
            j = i
            while j < n and _is_ident(src[j]):
                j += 1
            word = src[i:j]
            if word in _KEYWORDS:
                toks.append(("kw", word))
            else:
                toks.append(("ident", word))
            i = j
            continue
        if c == "@" and i + 1 < n and _is_ident_start(src[i + 1]):
            j = i + 1
            while j < n and _is_ident(src[j]):
                j += 1
            toks.append(("format", src[i + 1 : j]))
            i = j
            continue
        if c in _OPS1:
            toks.append(("op", c))
            i += 1
            continue
        if c in _PUNCT:
            toks.append(("punct", c))
            i += 1
            continue
        raise _unsupported(f"cannot tokenize at: {src[i:]!r}")
    toks.append(("end", None))
    return toks


def _scan_string(src: str, i: int) -> tuple[list, int]:
    """Parse a double-quoted string with ``\\(...)`` interpolation.

    Returns (parts, next_index): parts is a list of literal ``str`` pieces
    and ``("interp", ast)`` tuples.
    """
    assert src[i] == '"'
    i += 1
    parts: list = []
    buf: list[str] = []
    n = len(src)
    while i < n:
        c = src[i]
        if c == '"':
            if buf:
                parts.append("".join(buf))
            return parts, i + 1
        if c == "\\":
            if i + 1 >= n:
                break
            nxt = src[i + 1]
            if nxt == "(":
                # find the matching close paren, respecting nesting/strings
                depth, j = 1, i + 2
                while j < n and depth:
                    if src[j] == '"':
                        _, j = _scan_string(src, j)
                        continue
                    if src[j] == "(":
                        depth += 1
                    elif src[j] == ")":
                        depth -= 1
                    j += 1
                if depth:
                    raise _unsupported(f"unterminated interpolation: {src[i:]!r}")
                inner = src[i + 2 : j - 1]
                if buf:
                    parts.append("".join(buf))
                    buf = []
                parts.append(("interp", _parse(inner)))
                i = j
                continue
            simple = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "/": "/"}
            if nxt in simple:
                buf.append(simple[nxt])
                i += 2
                continue
            if nxt == "u":
                buf.append(chr(int(src[i + 2 : i + 6], 16)))
                i += 6
                continue
            raise _unsupported(f"unsupported escape: \\{nxt}")
        buf.append(c)
        i += 1
    raise _unsupported("unterminated string literal")


# ---------------------------------------------------------------------------
# Parser — AST is nested tuples: (kind, *payload)
# ---------------------------------------------------------------------------

_ZERO_ARG_BUILTINS = {
    "length",
    "keys",
    "keys_unsorted",
    "type",
    "tostring",
    "tonumber",
    "tojson",
    "floor",
    "ceil",
    "sqrt",
    "fabs",
    "add",
    "any",
    "all",
    "min",
    "max",
    "unique",
    "reverse",
    "sort",
    "first",
    "last",
    "not",
    "empty",
    "ascii_downcase",
    "ascii_upcase",
    "to_entries",
    "from_entries",
    "values",
    "flatten",
    "explode",
    "implode",
    "paths",
    "leaf_paths",
    "error",
    "input",
    "inputs",
    "abs",
    "fromjson",
    "tojson",
    "utf8bytelength",
    "transpose",
    "tostream",
    # datetime family (UTC-only: gmtime/mktime and the ISO8601 pair;
    # `now`, `localtime` and `strflocaltime` stay unregistered — wall-clock
    # and executor-TZ dependence would break deterministic replay, so they
    # fail at compile time like other out-of-core constructs)
    "gmtime",
    "mktime",
    "todate",
    "fromdate",
    "todateiso8601",
    "fromdateiso8601",
    "log",
    "log2",
    "log10",
    "exp",
    "isnan",
    "isinfinite",
    "infinite",
    "nan",
    "round",
    # libm family (domain edges follow libm/jq: nan, ±inf — never a raise)
    "trunc",
    "nearbyint",
    "significand",
    "logb",
    "cbrt",
    "exp2",
    "exp10",
    "gamma",
    "lgamma",
    "tgamma",
    "frexp",
    "modf",
    "sin",
    "cos",
    "tan",
    "asin",
    "acos",
    "atan",
    "sinh",
    "cosh",
    "tanh",
    "asinh",
    "acosh",
    "atanh",
    # type filters: select the input by its type
    "numbers",
    "strings",
    "booleans",
    "nulls",
    "arrays",
    "objects",
    "iterables",
    "scalars",
}

_TYPE_FILTERS = {
    "numbers": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "strings": lambda v: isinstance(v, str),
    "booleans": lambda v: isinstance(v, bool),
    "nulls": lambda v: v is None,
    "arrays": lambda v: isinstance(v, list),
    "objects": lambda v: isinstance(v, dict),
    "iterables": lambda v: isinstance(v, (list, dict)),
    "scalars": lambda v: not isinstance(v, (list, dict)),
}
_ARG_BUILTINS = {
    "select": 1,
    "map": 1,
    "sort_by": 1,
    "has": 1,
    "contains": 1,
    "startswith": 1,
    "endswith": 1,
    "ltrimstr": 1,
    "rtrimstr": 1,
    "split": (1, 2),  # split/2 is the regex form
    "join": 1,
    "range": (1, 3),
    "group_by": 1,
    "unique_by": 1,
    "min_by": 1,
    "max_by": 1,
    "with_entries": 1,
    "flatten": 1,
    # regex builtins (flags arg optional; sub/gsub take the replacement)
    "test": (1, 2),
    "match": (1, 2),
    "capture": (1, 2),
    "scan": (1, 2),
    "splits": (1, 2),
    "sub": (2, 3),
    "gsub": (2, 3),
    # datetime formatting (UTC; see the zero-arg datetime note)
    "strftime": 1,
    "strptime": 1,
    # path machinery
    "del": 1,
    "path": 1,
    "getpath": 1,
    "setpath": 2,
    "delpaths": 1,
    # loop / control builtins
    "limit": 2,
    "first": 1,
    "last": 1,
    "nth": (1, 2),
    "until": 2,
    "while": 2,
    "repeat": 1,
    "map_values": 1,
    "error": 1,
    "pow": 2,
    "atan2": 2,
    "drem": 2,
    "ldexp": 2,
    "scalb": 2,
    "scalbln": 2,
    "in": 1,
    "index": 1,
    "rindex": 1,
    "indices": 1,
    "inside": 1,
    "any": (1, 2),
    "all": (1, 2),
}


class _P:
    def __init__(self, toks: list[tuple[str, object]]):
        self.toks = toks
        self.pos = 0
        # (name, arity) of user `def`s seen so far. An over-approximation:
        # a name stays "known" past its lexical scope, where a reference
        # then fails at eval instead of compile — acceptable slack for a
        # single-pass parser; in-scope programs resolve exactly.
        self.defs: set[tuple[str, int]] = set()
        # label names in (over-approximated) scope; `break $x` on a name
        # never labeled is jq's "$*label-x is not defined" compile error
        self.labels: set[str] = set()

    def peek(self):
        return self.toks[self.pos]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def accept(self, kind, val=None) -> bool:
        k, v = self.peek()
        if k == kind and (val is None or v == val):
            self.pos += 1
            return True
        return False

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise _unsupported(f"expected {val or kind}, got {v!r}")
        return v

    # precedence: pipe < comma < // < or < and < cmp < add < mul < unary
    def parse_pipe(self):
        if self.peek() == ("kw", "def"):
            return self.parse_def()
        if self.peek() == ("kw", "label"):
            return self.parse_label()
        # `done` holds the folded pipe of COMPLETED stages; `cur` is the
        # rightmost stage, kept unfolded because an `as` binds ONLY it:
        # `X | E as $v | B` is `X | (E as $v | B)` — B's input is X's
        # output, not the whole pipe's input (chained-as bug, pinned by
        # the tostream/truncate_stream differential cases)
        done = None
        cur = self.parse_comma()

        def fold(a, b):
            return b if a is None else ("pipe", a, b)

        while True:
            # `EXPR as $x | BODY` binding
            if self.accept("kw", "as"):
                self.expect("punct", "$")
                var = self.expect("ident")
                self.expect("punct", "|")
                body = self.parse_pipe()
                return fold(done, ("bind", cur, var, body))
            if self.accept("punct", "|"):
                if self.peek() == ("kw", "def"):
                    # a def scopes over the rest of the pipeline
                    return fold(fold(done, cur), self.parse_def())
                if self.peek() == ("kw", "label"):
                    # so does a label: its body is the rest of the pipe
                    return fold(fold(done, cur), self.parse_label())
                done = fold(done, cur)
                cur = self.parse_comma()
            else:
                return fold(done, cur)

    def parse_label(self):
        """``label $name | body`` — ``break $name`` in body exits it."""
        self.expect("kw", "label")
        self.expect("punct", "$")
        name = self.expect("ident")
        self.expect("punct", "|")
        self.labels.add(name)
        return ("label", name, self.parse_pipe())

    def parse_def(self):
        """``def name(p; $q): body; rest`` — scope is the rest of the pipe."""
        self.expect("kw", "def")
        name = self.expect("ident")
        params: list[str] = []
        if self.accept("punct", "("):
            while True:
                if self.accept("punct", "$"):
                    params.append("$" + self.expect("ident"))
                else:
                    params.append(self.expect("ident"))
                if self.accept("punct", ")"):
                    break
                self.expect("punct", ";")
        self.expect("punct", ":")
        self.defs.add((name, len(params)))  # visible in body: recursion
        for p in params:
            # filter params call like 0-arg functions; jq also exposes a
            # $-param's value under the bare name (def f($x) ≡ x as $x)
            self.defs.add((p.lstrip("$"), 0))
        body = self.parse_pipe()
        self.expect("punct", ";")
        rest = self.parse_pipe()
        return ("def", name, params, body, rest)

    def parse_comma(self):
        items = [self.parse_alt()]
        while self.accept("punct", ","):
            items.append(self.parse_alt())
        return items[0] if len(items) == 1 else ("comma", items)

    def parse_alt(self):
        left = self.parse_assign()
        while self.accept("op", "//"):
            left = ("alt", left, self.parse_assign())
        return left

    def parse_assign(self):
        # jq precedence: assignment sits between '//' and 'or'; nonassoc
        left = self.parse_or()
        k, op = self.peek()
        if k == "op" and op in _ASSIGN_OPS:
            self.next()
            right = self.parse_or()
            return ("setop", op, left, right)
        return left

    def parse_or(self):
        left = self.parse_and()
        while self.accept("kw", "or"):
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_cmp()
        while self.accept("kw", "and"):
            left = ("and", left, self.parse_cmp())
        return left

    def parse_cmp(self):
        left = self.parse_add()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            return ("cmp", v, left, self.parse_add())
        return left

    def parse_add(self):
        left = self.parse_mul()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-"):
                self.next()
                left = ("arith", v, left, self.parse_mul())
            else:
                return left

    def parse_mul(self):
        left = self.parse_unary()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("*", "/", "%"):
                self.next()
                left = ("arith", v, left, self.parse_unary())
            else:
                return left

    def parse_unary(self):
        if self.accept("op", "-"):
            return ("neg", self.parse_postfix())
        return self.parse_postfix()

    def parse_postfix(self):
        node = self.parse_primary()
        while True:
            k, v = self.peek()
            if k == "punct" and v == ".":
                # .foo suffix after an expression (e.g. $x.foo)
                nxt_k, _nxt_v = self.toks[self.pos + 1]
                if nxt_k in ("ident", "str"):
                    self.next()
                    node = self._path_step(node)
                    continue
                break
            if k == "punct" and v == "[":
                self.next()
                if self.accept("punct", "]"):
                    node = ("iterate", node)
                elif self.accept("punct", ":"):  # .[:hi]
                    hi = self.parse_pipe()
                    self.expect("punct", "]")
                    node = ("slice", node, None, hi)
                else:
                    idx = self.parse_pipe()
                    if self.accept("punct", ":"):
                        if self.accept("punct", "]"):  # .[lo:]
                            node = ("slice", node, idx, None)
                        else:
                            hi = self.parse_pipe()
                            self.expect("punct", "]")
                            node = ("slice", node, idx, hi)
                    else:
                        self.expect("punct", "]")
                        node = ("index", node, idx)
                continue
            if k == "punct" and v == "?":
                self.next()
                node = ("try", node)
                continue
            break
        return node

    def _path_step(self, node):
        k, v = self.next()
        if k == "ident":
            return ("field", node, v)
        if k == "str":
            if len(v) == 1 and isinstance(v[0], str):
                return ("field", node, v[0])
            raise _unsupported("interpolated field names are not supported")
        raise _unsupported(f"bad field access: {v!r}")

    def parse_primary(self):
        k, v = self.peek()
        if k == "punct" and v == "..":
            self.next()
            return ("recurse",)
        if k == "punct" and v == ".":
            self.next()
            nk, _nv = self.peek()
            if nk in ("ident", "str"):
                return self._path_step(("identity",))
            return ("identity",)
        if k == "punct" and v == "$":
            self.next()
            return ("var", self.expect("ident"))
        if k == "num":
            self.next()
            return ("lit", v)
        if k == "str":
            self.next()
            return ("strlit", v)
        if k == "kw" and v in ("true", "false", "null"):
            self.next()
            return ("lit", {"true": True, "false": False, "null": None}[v])
        if k == "punct" and v == "(":
            self.next()
            inner = self.parse_pipe()
            self.expect("punct", ")")
            return inner
        if k == "punct" and v == "[":
            self.next()
            if self.accept("punct", "]"):
                return ("array", None)
            inner = self.parse_pipe()
            self.expect("punct", "]")
            return ("array", inner)
        if k == "punct" and v == "{":
            self.next()
            return self.parse_object()
        if k == "kw" and v == "if":
            return self.parse_if()
        if k == "kw" and v in ("reduce", "foreach"):
            return self.parse_reduce()
        if k == "kw" and v == "break":
            self.next()
            self.expect("punct", "$")
            name = self.expect("ident")
            if name not in self.labels:
                raise _unsupported(f"$*label-{name} is not defined")
            return ("break", name)
        if k == "format":
            self.next()
            if v not in _FORMATS:
                raise _unsupported(f"@{v} is not a valid format")
            if self.peek()[0] == "str":
                # @fmt "..." : interpolations are formatted, literals kept
                return ("strlit_fmt", v, self.next()[1])
            return ("format", v)
        if k == "kw" and v == "try":
            self.next()
            body = self.parse_postfix()
            handler = None
            if self.accept("kw", "catch"):
                handler = self.parse_postfix()
            return ("trycatch", body, handler)
        if k == "ident":
            return self.parse_funcall()
        raise _unsupported(f"unexpected token: {v!r}")

    def parse_object(self):
        pairs = []
        if not self.accept("punct", "}"):
            while True:
                pairs.append(self.parse_pair())
                if self.accept("punct", "}"):
                    break
                self.expect("punct", ",")
        return ("object", pairs)

    def parse_pair(self):
        k, v = self.next()
        if k == "punct" and v == "(":
            key_ast = self.parse_pipe()
            self.expect("punct", ")")
            self.expect("punct", ":")
            return (("expr", key_ast), self.parse_alt())
        if k == "ident" or (k == "kw" and v not in ("if", "reduce")):
            key = v
            if self.accept("punct", ":"):
                return (key, self.parse_alt())
            return (key, ("field", ("identity",), key))  # {foo} shorthand
        if k == "str":
            if len(v) == 1 and isinstance(v[0], str):
                key = v[0]
            elif len(v) == 0:
                key = ""
            else:
                raise _unsupported("interpolated object keys are not supported")
            self.expect("punct", ":")
            return (key, self.parse_alt())
        if k == "punct" and v == "$":
            name = self.expect("ident")
            return (name, ("var", name))
        raise _unsupported(f"bad object key: {v!r}")

    def parse_if(self):
        self.expect("kw", "if")
        cond = self.parse_pipe()
        self.expect("kw", "then")
        then = self.parse_pipe()
        elifs = []
        while self.accept("kw", "elif"):
            c = self.parse_pipe()
            self.expect("kw", "then")
            elifs.append((c, self.parse_pipe()))
        els = ("identity",)
        if self.accept("kw", "else"):
            els = self.parse_pipe()
        self.expect("kw", "end")
        return ("if", [(cond, then), *elifs], els)

    def parse_reduce(self):
        """``reduce SRC as $x (INIT; UPD)`` and the 2/3-arg ``foreach``."""
        kw = self.next()[1]
        src = self.parse_postfix()
        self.expect("kw", "as")
        self.expect("punct", "$")
        var = self.expect("ident")
        self.expect("punct", "(")
        init = self.parse_pipe()
        self.expect("punct", ";")
        update = self.parse_pipe()
        extract = None
        if kw == "foreach" and self.accept("punct", ";"):
            extract = self.parse_pipe()
        self.expect("punct", ")")
        if kw == "reduce":
            return ("reduce", src, var, init, update)
        return ("foreach", src, var, init, update, extract)

    def parse_funcall(self):
        name = self.expect("ident")
        if self.accept("punct", "("):
            args = [self.parse_pipe()]
            while self.accept("punct", ";"):
                args.append(self.parse_pipe())
            self.expect("punct", ")")
            if (name, len(args)) in self.defs:  # user defs shadow builtins
                return ("ucall", name, args)
            spec = _ARG_BUILTINS.get(name)
            if spec is None:
                raise _unsupported(f"unknown function: {name}/{len(args)}")
            lo, hi = (spec, spec) if isinstance(spec, int) else spec
            if not lo <= len(args) <= hi:
                raise _unsupported(f"{name} takes {spec} args, got {len(args)}")
            return ("call", name, args)
        if (name, 0) in self.defs:
            return ("ucall", name, [])
        if name in _ZERO_ARG_BUILTINS:
            return ("call", name, [])
        raise _unsupported(f"unknown function: {name}/0")


# Derived builtins defined in jq SOURCE and prepended to every program —
# exactly how jq itself ships them (builtin.jq). The interpreter's core
# (def/reduce/foreach/setpath/slices/computed keys) is enough to host the
# canonical jq 1.6 definitions verbatim, so their semantics are inherited
# rather than re-derived; user `def`s of the same names shadow them, like
# real jq. truncate_stream's `null |` input rebind is 1.6's (1.7 changed
# it) — the differential suite pins against the installed 1.6 binary.
_PRELUDE_SRC = """
def walk(f): . as $in
  | if type == "object"
    then reduce keys_unsorted[] as $key
           ({}; . + {($key): ($in[$key] | walk(f))}) | f
    elif type == "array" then map(walk(f)) | f
    else f end;
def fromstream(f): {x: null, e: false} as $init
  | foreach f as $i ($init;
      if .e then $init else . end
      | if $i | length == 2
        then setpath(["e"]; $i[0] | length == 0)
             | setpath(["x"] + $i[0]; $i[1])
        else setpath(["e"]; $i[0] | length == 1) end;
      if .e then .x else empty end);
def truncate_stream(stream): . as $n | null | stream | . as $input
  | if (.[0] | length) > $n then setpath([0]; .[0][$n:]) else empty end;
def combinations: if length == 0 then [] else
    .[0][] as $x | (.[1:] | combinations) as $rest | [$x] + $rest end;
def combinations(n): . as $dot | [range(n)] | map($dot) | combinations;
"""


@functools.lru_cache(maxsize=512)
def _parse(src: str):
    # memoized: the prelude re-parses per compile otherwise (~0.5 ms), and
    # the per-record Lambda-handler path compiles per call. ASTs are
    # treated as immutable by the evaluator, so sharing is safe.
    p = _P(_tokenize(_PRELUDE_SRC + "(" + src + "\n)"))
    ast = p.parse_pipe()
    if p.peek()[0] != "end":
        raise _unsupported(f"trailing tokens: {p.toks[p.pos:]!r}")
    return ast


# ---------------------------------------------------------------------------
# jq value helpers: total order, truthiness, printing
# ---------------------------------------------------------------------------

def _type_rank(v) -> int:
    if v is None:
        return 0
    if v is False:
        return 1
    if v is True:
        return 2
    if isinstance(v, (int, float)):
        return 3
    if isinstance(v, str):
        return 4
    if isinstance(v, list):
        return 5
    return 6


def _cmp(a, b) -> int:
    ra, rb = _type_rank(a), _type_rank(b)
    if ra != rb:
        return -1 if ra < rb else 1
    if ra in (0, 1, 2):
        return 0
    if ra == 3:
        return -1 if a < b else (1 if a > b else 0)
    if ra == 4:
        return -1 if a < b else (1 if a > b else 0)
    if ra == 5:
        for x, y in zip(a, b):
            c = _cmp(x, y)
            if c:
                return c
        return (len(a) > len(b)) - (len(a) < len(b))
    ka, kb = sorted(a), sorted(b)
    c = _cmp(ka, kb)
    if c:
        return c
    for k in ka:
        c = _cmp(a[k], b[k])
        if c:
            return c
    return 0


_SORT_KEY = functools.cmp_to_key(_cmp)


def _truthy(v) -> bool:
    return v is not None and v is not False


def _jq_type(v) -> str:
    return (
        "null" if v is None
        else "boolean" if isinstance(v, bool)
        else "number" if isinstance(v, (int, float))
        else "string" if isinstance(v, str)
        else "array" if isinstance(v, list)
        else "object"
    )


def _canon_num(v):
    """jq prints integral doubles as integers (1.0 → 1), clamps infinities
    to ±DBL_MAX, and prints NaN as null."""
    if isinstance(v, float) and not isinstance(v, bool):
        if math.isnan(v):
            return None
        if math.isinf(v):
            return math.copysign(1.7976931348623157e308, v)
        if v == int(v) and abs(v) < (1 << 53):
            return int(v)
    return v


def _canonical(v):
    if isinstance(v, float):
        return _canon_num(v)
    if isinstance(v, list):
        return [_canonical(x) for x in v]
    if isinstance(v, dict):
        return {k: _canonical(x) for k, x in v.items()}
    return v


def dumps(v) -> str:
    """Compact JSON with jq's number canonicalization."""
    return json.dumps(_canonical(v), separators=(",", ":"), ensure_ascii=False)


def _tostring(v) -> str:
    return v if isinstance(v, str) else dumps(v)


# --- @format strings (jq's format-and-escape filters) ----------------------

_FORMATS = frozenset(
    {"text", "json", "html", "uri", "csv", "tsv", "sh", "base64", "base64d"}
)
# jq's @uri keeps RFC 2396 unreserved + mark characters verbatim
_URI_SAFE = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_.~!*'()"
)


def _format_cell(x, *, tsv: bool) -> str:
    """One element of a @csv/@tsv row (jq calls both a \"csv row\")."""
    if x is None:
        return ""
    if isinstance(x, bool):
        return "true" if x else "false"
    if isinstance(x, (int, float)):
        return dumps(_canon_num(x))
    if isinstance(x, str):
        if tsv:
            return (
                x.replace("\\", "\\\\")
                .replace("\t", "\\t")
                .replace("\n", "\\n")
                .replace("\r", "\\r")
            )
        return '"' + x.replace('"', '""') + '"'
    raise JqRuntimeError(f"{_jq_type(x)} ({dumps(x)}) is not valid in a csv row")


def _format_shword(x) -> str:
    if isinstance(x, str):
        return "'" + x.replace("'", "'\\''") + "'"
    if isinstance(x, (dict, list)):
        raise JqRuntimeError(
            f"{_jq_type(x)} ({dumps(x)}) can not be escaped for shell"
        )
    return dumps(_canon_num(x))  # null / true / false / numbers go bare


def _format(name: str, v) -> str:
    if name == "text":
        return _tostring(v)
    if name == "json":
        return dumps(v)
    if name == "html":
        s = _tostring(v)
        for ch, ent in (
            ("&", "&amp;"),
            ("<", "&lt;"),
            (">", "&gt;"),
            ("'", "&apos;"),
            ('"', "&quot;"),
        ):
            s = s.replace(ch, ent)
        return s
    if name == "uri":
        return "".join(
            c if c in _URI_SAFE else "".join(f"%{b:02X}" for b in c.encode("utf-8"))
            for c in _tostring(v)
        )
    if name in ("csv", "tsv"):
        if not isinstance(v, list):
            raise JqRuntimeError(
                f"{_jq_type(v)} ({dumps(v)}) cannot be {name}-formatted, only array"
            )
        sep = "\t" if name == "tsv" else ","
        return sep.join(_format_cell(x, tsv=name == "tsv") for x in v)
    if name == "sh":
        if isinstance(v, list):
            return " ".join(_format_shword(x) for x in v)
        return _format_shword(v)
    if name == "base64":
        return base64.b64encode(_tostring(v).encode("utf-8")).decode("ascii")
    # base64d — lenient about missing padding (jq decodes "aGk"), strict
    # about non-alphabet bytes; invalid UTF-8 decodes with replacement
    s = _tostring(v)
    try:
        raw = base64.b64decode(s + "=" * (-len(s) % 4), validate=True)
    except Exception as e:
        raise JqRuntimeError(
            f"string ({dumps(s)}) is not valid base64 data"
        ) from e
    return raw.decode("utf-8", "replace")


# ---------------------------------------------------------------------------
# Evaluator — eval(ast, input, env) yields a stream of values
# ---------------------------------------------------------------------------

def _ev(ast, v, env) -> Iterator:
    kind = ast[0]
    if kind == "identity":
        yield v
    elif kind == "lit":
        yield ast[1]
    elif kind == "strlit":
        yield from _ev_interp(ast[1], v, env)
    elif kind == "var":
        try:
            yield env[ast[1]]
        except KeyError:
            raise _unsupported(f"undefined variable: ${ast[1]}") from None
    elif kind == "field":
        for base in _ev(ast[1], v, env):
            yield _get_field(base, ast[2])
    elif kind == "index":
        for idx in _ev(ast[2], v, env):
            for base in _ev(ast[1], v, env):
                yield _get_index(base, idx)
    elif kind == "iterate":
        for base in _ev(ast[1], v, env):
            if isinstance(base, list):
                yield from base
            elif isinstance(base, dict):
                yield from base.values()
            else:
                raise JqRuntimeError(f"cannot iterate over {_jq_type(base)}")
    elif kind == "slice":
        for hi in (_ev(ast[3], v, env) if ast[3] is not None else [None]):
            for lo in (_ev(ast[2], v, env) if ast[2] is not None else [None]):
                for base in _ev(ast[1], v, env):
                    yield _slice_value(base, lo, hi)
    elif kind in ("try", "trycatch"):
        # jq streams the pre-error prefix: outputs already produced before
        # the error are kept, then the handler (if any) runs on the error
        # message — so the generator must be drained lazily, not listed
        gen = _ev(ast[1], v, env)
        while True:
            try:
                out = next(gen)
            except StopIteration:
                break
            except JqRuntimeError as e:
                if kind == "trycatch" and ast[2] is not None:
                    caught = str(e) if e.payload is _NO_PAYLOAD else e.payload
                    yield from _ev(ast[2], caught, env)
                break
            yield out
    elif kind == "pipe":
        for mid in _ev(ast[1], v, env):
            yield from _ev(ast[2], mid, env)
    elif kind == "recurse":
        # jq's ``..`` ≡ recurse: the value itself, then every descendant,
        # depth-first in document order
        def _walk(x):
            yield x
            if isinstance(x, list):
                for e in x:
                    yield from _walk(e)
            elif isinstance(x, dict):
                for e in x.values():
                    yield from _walk(e)

        yield from _walk(v)
    elif kind == "comma":
        for item in ast[1]:
            yield from _ev(item, v, env)
    elif kind == "alt":
        got = False
        try:
            for out in _ev(ast[1], v, env):
                if _truthy(out):
                    got = True
                    yield out
        except JqRuntimeError:
            pass
        if not got:
            yield from _ev(ast[2], v, env)
    elif kind == "or":
        for a in _ev(ast[1], v, env):
            if _truthy(a):
                yield True
            else:
                for b in _ev(ast[2], v, env):
                    yield _truthy(b)
    elif kind == "and":
        for a in _ev(ast[1], v, env):
            if not _truthy(a):
                yield False
            else:
                for b in _ev(ast[2], v, env):
                    yield _truthy(b)
    elif kind == "cmp":
        op = ast[1]
        for b in _ev(ast[3], v, env):
            for a in _ev(ast[2], v, env):
                c = _cmp(a, b)
                yield {
                    "==": c == 0,
                    "!=": c != 0,
                    "<": c < 0,
                    "<=": c <= 0,
                    ">": c > 0,
                    ">=": c >= 0,
                }[op]
    elif kind == "arith":
        op = ast[1]
        for b in _ev(ast[3], v, env):
            for a in _ev(ast[2], v, env):
                yield _arith(op, a, b)
    elif kind == "neg":
        for a in _ev(ast[1], v, env):
            if isinstance(a, bool) or not isinstance(a, (int, float)):
                raise JqRuntimeError(f"{_jq_type(a)} cannot be negated")
            yield -a
    elif kind == "object":
        yield from _ev_object(ast[1], v, env)
    elif kind == "array":
        yield [] if ast[1] is None else list(_ev(ast[1], v, env))
    elif kind == "if":
        yield from _ev_if(ast[1], ast[2], v, env)
    elif kind == "bind":
        for bound in _ev(ast[1], v, env):
            yield from _ev(ast[3], v, {**env, ast[2]: bound})
    elif kind == "reduce":
        # jq folds once per INIT output (cartesian), not just the last
        for init in _ev(ast[3], v, env):
            acc = init
            for item in _ev(ast[1], v, env):
                nxt = None  # empty update → state becomes null, like jq
                for out in _ev(ast[4], acc, {**env, ast[2]: item}):
                    nxt = out
                acc = nxt
            yield acc
    elif kind == "foreach":
        # emits every UPDATE output (via EXTRACT if given); the running
        # state is the LAST output the update actually produced — an
        # empty update leaves it unchanged. Fully lazy: foreach over an
        # infinite generator works under limit().
        _src, _var, _init, _upd, _ext = ast[1:]
        for init in _ev(_init, v, env):
            acc = init
            for item in _ev(_src, v, env):
                env2 = {**env, _var: item}
                for out in _ev(_upd, acc, env2):
                    acc = out
                    if _ext is None:
                        yield out
                    else:
                        yield from _ev(_ext, out, env2)
    elif kind == "label":
        token = object()
        gen = _ev(ast[2], v, {**env, ("label", ast[1]): token})
        while True:
            try:
                out = next(gen)
            except StopIteration:
                break
            except _JqBreak as e:
                if e.token is token:
                    break
                raise
            yield out
    elif kind == "break":
        tok = env.get(("label", ast[1]))
        if tok is None:
            # parsed under the over-approximated label scope; real jq
            # rejects this at compile time
            raise _unsupported(f"$*label-{ast[1]} is not defined")
        raise _JqBreak(tok)
    elif kind == "format":
        yield _format(ast[1], v)
    elif kind == "strlit_fmt":
        yield from _ev_interp(ast[2], v, env, fmt=ast[1])
    elif kind == "call":
        yield from _ev_call(ast[1], ast[2], v, env)
    elif kind == "setop":
        yield from _ev_setop(ast[1], ast[2], ast[3], v, env)
    elif kind == "def":
        # ("def", name, params, body, rest): bind a closure whose env
        # contains itself (recursion), then run the rest of the pipeline
        fobj = {"params": ast[2], "body": ast[3], "env": None}
        env2 = {**env, ("def", ast[1], len(ast[2])): fobj}
        fobj["env"] = env2
        yield from _ev(ast[4], v, env2)
    elif kind == "ucall":
        name, cargs = ast[1], ast[2]
        fobj = env.get(("def", name, len(cargs)))
        if fobj is None:
            # parsed under an over-approximated scope; see _P.defs
            raise _unsupported(f"undefined function: {name}/{len(cargs)}")
        yield from _ev_ucall(fobj, cargs, v, env)
    else:  # pragma: no cover - parser emits only the kinds above
        raise _unsupported(f"unsupported AST node: {kind}")


def _ev_ucall(fobj, cargs, v, env) -> Iterator:
    """Invoke a user ``def``. Filter params are call-by-name: the argument
    AST + the CALL-SITE env become a 0-arg closure, re-evaluated against
    whatever input it is applied to inside the body (jq semantics).
    ``$``-params evaluate the argument at the call site and bind each
    output (cartesian over multi-output args, jq's order)."""
    params, body = fobj["params"], fobj["body"]

    def bind(i: int, benv) -> Iterator:
        if i == len(params):
            yield from _ev(body, v, benv)
            return
        p = params[i]
        if p.startswith("$"):
            pname = p[1:]
            for out in _ev(cargs[i], v, env):
                # def f($x) ≡ def f(x): x as $x — expose both spellings
                cl = {"params": [], "body": ("lit", out), "env": benv}
                yield from bind(i + 1, {**benv, pname: out, ("def", pname, 0): cl})
        else:
            cl = {"params": [], "body": cargs[i], "env": env}
            yield from bind(i + 1, {**benv, ("def", p, 0): cl})

    yield from bind(0, fobj["env"])


def _ev_interp(parts, v, env, fmt: "str | None" = None) -> Iterator[str]:
    def rec(i: int, acc: str) -> Iterator[str]:
        if i == len(parts):
            yield acc
            return
        p = parts[i]
        if isinstance(p, str):
            # literal pieces are NOT formatted, only interpolations (jq)
            yield from rec(i + 1, acc + p)
        else:
            for out in _ev(p[1], v, env):
                piece = (
                    _format(fmt, _canonical(out))
                    if fmt is not None
                    else _tostring(_canonical(out))
                )
                yield from rec(i + 1, acc + piece)

    yield from rec(0, "")


def _ev_object(pairs, v, env) -> Iterator[dict]:
    def rec(i: int, acc: dict) -> Iterator[dict]:
        if i == len(pairs):
            yield dict(acc)
            return
        key, expr = pairs[i]
        keys: Iterator
        if isinstance(key, tuple) and key[0] == "expr":
            keys = _ev(key[1], v, env)
        else:
            keys = iter((key,))
        for k in keys:
            if not isinstance(k, str):
                raise JqRuntimeError(f"object key must be a string, got {_jq_type(k)}")
            for out in _ev(expr, v, env):
                acc2 = dict(acc)
                acc2[k] = out
                yield from rec(i + 1, acc2)

    yield from rec(0, {})


def _ev_if(branches, els, v, env) -> Iterator:
    def rec(i: int):
        if i == len(branches):
            yield from _ev(els, v, env)
            return
        cond, then = branches[i]
        for c in _ev(cond, v, env):
            if _truthy(c):
                yield from _ev(then, v, env)
            else:
                yield from rec(i + 1)

    yield from rec(0)


def _get_field(base, name: str):
    if base is None:
        return None
    if isinstance(base, dict):
        return base.get(name)
    raise JqRuntimeError(f'cannot index {_jq_type(base)} with "{name}"')


def _get_index(base, idx):
    if isinstance(idx, str):
        return _get_field(base, idx)
    if isinstance(idx, bool) or not isinstance(idx, (int, float)):
        raise JqRuntimeError(f"cannot index with {_jq_type(idx)}")
    if base is None:
        return None
    if not isinstance(base, list):
        raise JqRuntimeError(f"cannot index {_jq_type(base)} with number")
    i = int(idx)
    if i < 0:
        i += len(base)
    return base[i] if 0 <= i < len(base) else None


def _slice_bound(x, n: int, default: int, *, is_hi: bool = False) -> int:
    if x is None:
        return default
    if isinstance(x, bool) or not isinstance(x, (int, float)):
        raise JqRuntimeError(f"cannot slice with {_jq_type(x)}")
    # jq widens fractional bounds outward: floor the low, ceil the high
    i = math.ceil(x) if is_hi else math.floor(x)
    if i < 0:
        i += n
    return max(0, min(n, i))


def _slice_value(base, lo, hi):
    if base is None:
        return None
    if not isinstance(base, (list, str)):
        raise JqRuntimeError(f"cannot slice {_jq_type(base)}")
    n = len(base)
    return base[_slice_bound(lo, n, 0):_slice_bound(hi, n, n, is_hi=True)]


def _arith(op: str, a, b):
    ta, tb = _jq_type(a), _jq_type(b)
    if op == "+":
        if a is None:
            return b
        if b is None:
            return a
        if ta == tb == "number":
            return a + b
        if ta == tb == "string":
            return a + b
        if ta == tb == "array":
            return a + b
        if ta == tb == "object":
            return {**a, **b}
        raise JqRuntimeError(f"{ta} and {tb} cannot be added")
    if op == "-":
        if ta == tb == "number":
            return a - b
        if ta == tb == "array":
            return [x for x in a if not any(_cmp(x, y) == 0 for y in b)]
        raise JqRuntimeError(f"{ta} and {tb} cannot be subtracted")
    if ta == tb == "number":
        if op == "*":
            return a * b
        if op == "/":
            if b == 0:
                raise JqRuntimeError(
                    f"{ta} and {tb} cannot be divided because the divisor is zero"
                )
            return a / b
        # jq's % is C-style truncation toward zero (gojq/jq: -7 % 3 == -1);
        # operands truncate FIRST, so a fractional divisor like 0.5 is a
        # divide-by-zero jq error, not a bare Python math-domain ValueError
        ib = int(b)
        if ib == 0:
            raise JqRuntimeError(
                f"{ta} and {tb} cannot be divided because the divisor is zero"
            )
        return int(math.fmod(int(a), ib))
    if op == "/" and ta == tb == "string":
        return b and a.split(b) or list(a)
    if op == "*" and {ta, tb} == {"string", "number"}:
        s, n = (a, b) if ta == "string" else (b, a)
        return s * int(n) if n > 0 else None
    raise JqRuntimeError(f"{ta} and {tb} cannot be {op!r}-combined")


def _ev_call(name: str, args, v, env) -> Iterator:
    if name == "empty":
        return
    if name == "select":
        for c in _ev(args[0], v, env):
            if _truthy(c):
                yield v
        return
    if name == "map":
        if not isinstance(v, list):
            raise JqRuntimeError(f"cannot map over {_jq_type(v)}")
        yield [out for item in v for out in _ev(args[0], item, env)]
        return
    if name in ("sort_by", "group_by", "unique_by", "min_by", "max_by"):
        if not isinstance(v, list):
            raise JqRuntimeError(f"cannot {name} over {_jq_type(v)}")
        keyed = [([o for o in _ev(args[0], item, env)], item) for item in v]
        if name in ("min_by", "max_by"):
            if not v:
                yield None
                return
            pick = min if name == "min_by" else max
            yield pick(keyed, key=lambda p: _SORT_KEY(p[0]))[1]
            return
        skeyed = sorted(keyed, key=lambda p: _SORT_KEY(p[0]))
        if name == "sort_by":
            yield [item for _k, item in skeyed]
            return
        groups: list[list] = []
        last_key: object = object()
        for kk, item in skeyed:
            if not groups or _cmp_keylist(kk, last_key) != 0:
                groups.append([])
                last_key = kk
            groups[-1].append(item)
        if name == "group_by":
            yield groups
        else:  # unique_by: first element of each key group
            yield [g[0] for g in groups]
        return
    if name == "with_entries":
        # sugar for: to_entries | map(f) | from_entries
        entries = list(_builtin0("to_entries", v))[0]
        mapped = [out for e in entries for out in _ev(args[0], e, env)]
        yield from _builtin0("from_entries", mapped)
        return
    if name == "flatten" and args:
        for depth in _ev(args[0], v, env):
            if not isinstance(depth, (int, float)) or isinstance(depth, bool) or depth < 0:
                raise JqRuntimeError("flatten depth must be a non-negative number")
            yield _flatten(v, int(depth))
        return
    if name == "range":
        streams = [list(_ev(a, v, env)) for a in args]
        if len(streams) == 1:
            streams = [[0], streams[0], [1]]
        elif len(streams) == 2:
            streams = [streams[0], streams[1], [1]]
        for lo in streams[0]:
            for hi in streams[1]:
                for step in streams[2]:
                    x = lo
                    while (step > 0 and x < hi) or (step < 0 and x > hi):
                        yield x
                        x += step
        return
    if name in ("test", "match", "capture", "scan", "splits", "sub", "gsub") or (
        name == "split" and len(args) == 2
    ):
        yield from _ev_regex(name, args, v, env)
        return
    if name == "path":
        for p in _paths_of(args[0], v, env):
            yield list(p)
        return
    if name == "del":
        yield _delpaths(v, list(_paths_of(args[0], v, env)))
        return
    if name == "getpath":
        for p in _ev(args[0], v, env):
            if not isinstance(p, list):
                raise JqRuntimeError("getpath path must be an array")
            yield _getpath(v, p)  # wrong-type steps error, like real jq
        return
    if name == "setpath":
        for val in _ev(args[1], v, env):
            for p in _ev(args[0], v, env):
                if not isinstance(p, list):
                    raise JqRuntimeError("setpath path must be an array")
                yield _setpath(v, p, val)
        return
    if name == "delpaths":
        for ps in _ev(args[0], v, env):
            if not isinstance(ps, list):
                raise JqRuntimeError("delpaths paths must be an array")
            yield _delpaths(v, ps)
        return
    if name in ("input", "inputs") and not args:
        # the record stream bound by MiniJqProgram.stream(); outside
        # stream mode the compile gate rejects these at driver time
        it = env.get(("inputs",))
        if name == "inputs":
            if it is not None:
                yield from it
            return
        if it is not None:
            for nxt in it:
                yield nxt
                return
        raise JqRuntimeError("No more inputs")
    if args and name in (
        "limit", "first", "last", "nth", "until", "while", "repeat",
        "map_values", "error", "pow", "any", "all",
        "atan2", "drem", "ldexp", "scalb", "scalbln",
    ):
        yield from _ev_control(name, args, v, env)
        return
    if name in _ARG_BUILTINS and args:
        for arg in _ev(args[0], v, env):
            yield _builtin1(name, v, arg)
        return
    yield from _builtin0(name, v)


def _ev_control(name: str, args, v, env) -> Iterator:
    """Loop/control builtins — each defined by its jq-manual equation."""
    if name == "limit":
        for n in _ev(args[0], v, env):
            if isinstance(n, bool) or not isinstance(n, (int, float)):
                raise JqRuntimeError("limit count must be a number")
            n = int(n)
            if n <= 0:
                continue
            emitted = 0
            for out in _ev(args[1], v, env):  # lazily: works on repeat()
                yield out
                emitted += 1
                if emitted >= n:
                    break
        return
    if name == "first":  # first(f) ≡ limit(1; f)
        for out in _ev(args[0], v, env):
            yield out
            return
        return
    if name == "last":
        got, found = None, False
        for out in _ev(args[0], v, env):
            got, found = out, True
        if found:
            yield got
        return
    if name == "nth":
        if len(args) == 1:  # nth(n) ≡ .[n]
            for n in _ev(args[0], v, env):
                yield _get_index(v, n)
            return
        for n in _ev(args[0], v, env):
            if isinstance(n, bool) or not isinstance(n, (int, float)):
                raise JqRuntimeError("nth index must be a number")
            n = int(n)
            if n < 0:
                raise JqRuntimeError("Out of bounds negative array index")
            for i, out in enumerate(_ev(args[1], v, env)):
                if i == n:
                    yield out
                    break
        return
    if name == "until":
        def _until(x) -> Iterator:
            for c in _ev(args[0], x, env):
                if _truthy(c):
                    yield x
                else:
                    for nx in _ev(args[1], x, env):
                        yield from _until(nx)

        yield from _until(v)
        return
    if name == "while":
        def _while(x) -> Iterator:
            for c in _ev(args[0], x, env):
                if _truthy(c):
                    yield x
                    for nx in _ev(args[1], x, env):
                        yield from _while(nx)

        yield from _while(v)
        return
    if name == "repeat":
        # jq 1.6's builtin is `def _repeat: f, _repeat;` — f re-runs on
        # the SAME input forever (comma keeps the input), so repeat(.*2)
        # on 1 is 2,2,2,… not 2,4,8,…; infinite, meaningful under limit
        while True:
            yield from _ev(args[0], v, env)
    if name == "map_values":  # ≡ .[] |= f
        yield from _ev_setop("|=", ("iterate", ("identity",)), args[0], v, env)
        return
    if name == "error":
        for m in _ev(args[0], v, env):
            raise JqRuntimeError(
                m if isinstance(m, str) else dumps(m), payload=m
            )
        return
    if name in ("atan2", "drem", "ldexp", "scalb", "scalbln"):
        for b in _ev(args[1], v, env):
            for a in _ev(args[0], v, env):
                for x in (a, b):
                    if isinstance(x, bool) or not isinstance(x, (int, float)):
                        raise JqRuntimeError(f"{name} needs numbers, got {_jq_type(x)}")
                try:
                    if name == "atan2":
                        yield math.atan2(a, b)
                    elif name == "drem":
                        yield math.remainder(a, b)
                    else:  # ldexp / scalb / scalbln: a · 2^b
                        yield math.ldexp(a, int(b))
                except (OverflowError, ZeroDivisionError):
                    yield float("inf")
                except ValueError:
                    yield float("nan")
        return
    if name == "pow":
        for b in _ev(args[1], v, env):
            for a in _ev(args[0], v, env):
                for x in (a, b):
                    if isinstance(x, bool) or not isinstance(x, (int, float)):
                        raise JqRuntimeError(f"pow needs numbers, got {_jq_type(x)}")
                try:
                    yield float(a) ** float(b)
                except (OverflowError, ZeroDivisionError):
                    yield float("inf")
                except ValueError:
                    yield float("nan")
        return
    # any(f) / all(f) / any(gen; cond) / all(gen; cond)
    pick = any if name == "any" else all
    if len(args) == 1:
        if not isinstance(v, list):
            raise JqRuntimeError(f"{name} needs an array")
        yield pick(
            _truthy(o) for x in v for o in _ev(args[0], x, env)
        )
        return
    yield pick(
        _truthy(o)
        for g in _ev(args[0], v, env)
        for o in _ev(args[1], g, env)
    )


# ---------------------------------------------------------------------------
# Path machinery — path()/getpath/setpath/delpaths/del and the assignment
# operators (= |= += -= *= /= %= //=), jq's `path expressions` chapter
# ---------------------------------------------------------------------------

def _paths_of(ast, v, env) -> Iterator[list]:
    """Concrete paths (lists of string keys / int indices) denoted by a
    path expression evaluated against ``v`` — jq's ``path()`` semantics.
    Raises JqRuntimeError on non-path constructs so callers fail like jq
    ("Invalid path expression")."""
    kind = ast[0]
    if kind == "identity":
        yield []
    elif kind == "recurse":
        def walk(x, p):
            yield list(p)
            if isinstance(x, list):
                for i, e in enumerate(x):
                    yield from walk(e, p + [i])
            elif isinstance(x, dict):
                for k2, e in x.items():
                    yield from walk(e, p + [k2])

        yield from walk(v, [])
    elif kind == "field":
        for p in _paths_of(ast[1], v, env):
            base = _getpath(v, p)
            if base is not None and not isinstance(base, dict):
                raise JqRuntimeError(
                    f'cannot index {_jq_type(base)} with "{ast[2]}"'
                )
            yield p + [ast[2]]
    elif kind == "index":
        for idx in _ev(ast[2], v, env):
            for p in _paths_of(ast[1], v, env):
                base = _getpath(v, p)
                if isinstance(idx, str):
                    if base is not None and not isinstance(base, dict):
                        raise JqRuntimeError(
                            f'cannot index {_jq_type(base)} with "{idx}"'
                        )
                    yield p + [idx]
                elif isinstance(idx, bool) or not isinstance(idx, (int, float)):
                    raise JqRuntimeError(f"cannot index with {_jq_type(idx)}")
                else:
                    if base is not None and not isinstance(base, list):
                        raise JqRuntimeError(
                            f"cannot index {_jq_type(base)} with number"
                        )
                    i = int(idx)
                    if i < 0:
                        n = len(base) if isinstance(base, list) else 0
                        i += n
                        if i < 0:
                            raise JqRuntimeError(
                                "Out of bounds negative array index"
                            )
                    yield p + [i]
    elif kind == "slice":
        for hi in (_ev(ast[3], v, env) if ast[3] is not None else [None]):
            for lo in (_ev(ast[2], v, env) if ast[2] is not None else [None]):
                for p in _paths_of(ast[1], v, env):
                    base = _getpath(v, p)
                    if base is not None and not isinstance(base, list):
                        raise JqRuntimeError(
                            f"cannot slice {_jq_type(base)} in a path"
                        )
                    yield p + [{"start": lo, "end": hi}]
    elif kind == "iterate":
        for p in _paths_of(ast[1], v, env):
            base = _getpath(v, p)
            if isinstance(base, list):
                for i in range(len(base)):
                    yield p + [i]
            elif isinstance(base, dict):
                for k2 in base:
                    yield p + [k2]
            elif base is None:
                continue  # jq: null iterates to nothing in path context
            else:
                raise JqRuntimeError(f"cannot iterate over {_jq_type(base)}")
    elif kind == "pipe":
        for p1 in _paths_of(ast[1], v, env):
            sub = _getpath(v, p1)
            for p2 in _paths_of(ast[2], sub, env):
                yield p1 + p2
    elif kind == "comma":
        for item in ast[1]:
            yield from _paths_of(item, v, env)
    elif kind in ("try", "trycatch"):
        gen = _paths_of(ast[1], v, env)
        while True:
            try:
                p = next(gen)
            except StopIteration:
                break
            except JqRuntimeError:
                break
            yield p
    elif kind == "call" and ast[1] == "select":
        for c in _ev(ast[2][0], v, env):
            if _truthy(c):
                yield []
    elif kind == "call" and ast[1] in _TYPE_FILTERS:
        if _TYPE_FILTERS[ast[1]](v):
            yield []
    elif kind == "call" and ast[1] == "empty":
        return
    elif kind == "call" and ast[1] == "getpath":
        for p in _ev(ast[2][0], v, env):
            if not isinstance(p, list):
                raise JqRuntimeError("getpath path must be an array")
            yield list(p)
    elif kind == "if":
        yield from _ev_if_paths(ast[1], ast[2], v, env)
    else:
        raise JqRuntimeError(f"invalid path expression: {kind}")


def _ev_if_paths(branches, els, v, env) -> Iterator[list]:
    def rec(i: int):
        if i == len(branches):
            yield from _paths_of(els, v, env)
            return
        cond, then = branches[i]
        for c in _ev(cond, v, env):
            if _truthy(c):
                yield from _paths_of(then, v, env)
            else:
                yield from rec(i + 1)

    yield from rec(0)


def _getpath(v, path: list):
    """Walk a concrete path; missing keys read as null, wrong types error
    (the .foo / .[i] access rules applied stepwise). A dict component
    {"start","end"} is a slice step (jq's slice path representation)."""
    cur = v
    for k in path:
        if isinstance(k, str):
            cur = _get_field(cur, k)
        elif isinstance(k, dict):
            cur = _slice_value(cur, k.get("start"), k.get("end"))
        else:
            cur = _get_index(cur, k)
    return cur


def _setpath(v, path: list, val):
    """Immutable deep-set: copies only the spine, creates objects/arrays
    under null, pads arrays with nulls, resolves negative indices."""
    if not path:
        return val
    k, rest = path[0], path[1:]
    if isinstance(k, str):
        if v is None:
            base: dict = {}
        elif isinstance(v, dict):
            base = dict(v)
        else:
            raise JqRuntimeError(f'cannot index {_jq_type(v)} with "{k}"')
        base[k] = _setpath(base.get(k), rest, val)
        return base
    if isinstance(k, dict):  # slice component: splice the sub-array
        arr = [] if v is None else v
        if not isinstance(arr, list):
            raise JqRuntimeError(f"cannot slice {_jq_type(v)} in a path")
        n = len(arr)
        lo = _slice_bound(k.get("start"), n, 0)
        hi = max(lo, _slice_bound(k.get("end"), n, n, is_hi=True))
        new_sub = _setpath(arr[lo:hi], rest, val)
        if not isinstance(new_sub, list):
            raise JqRuntimeError(
                "A slice of an array can only be assigned another array"
            )
        return arr[:lo] + new_sub + arr[hi:]
    if isinstance(k, bool) or not isinstance(k, (int, float)):
        raise JqRuntimeError(f"cannot index with {_jq_type(k)}")
    i = int(k)
    if v is None:
        arr: list = []
    elif isinstance(v, list):
        arr = list(v)
    else:
        raise JqRuntimeError(f"cannot index {_jq_type(v)} with number")
    if i < 0:
        i += len(arr)
        if i < 0:
            raise JqRuntimeError("Out of bounds negative array index")
    while len(arr) <= i:
        arr.append(None)
    arr[i] = _setpath(arr[i], rest, val)
    return arr


def _delpath(v, path: list):
    if not path:
        return None  # del(.) yields null, like jq
    k, rest = path[0], path[1:]
    if v is None:
        return None
    if isinstance(k, dict):  # slice component: drop (or recurse into) it
        if not isinstance(v, list):
            raise JqRuntimeError(f"cannot slice {_jq_type(v)} in a path")
        n = len(v)
        lo = _slice_bound(k.get("start"), n, 0)
        hi = max(lo, _slice_bound(k.get("end"), n, n, is_hi=True))
        if rest:
            sub = _delpath(v[lo:hi], rest)
            if not isinstance(sub, list):  # pragma: no cover - defensive
                raise JqRuntimeError("slice delete must produce an array")
            return v[:lo] + sub + v[hi:]
        return v[:lo] + v[hi:]
    if isinstance(k, str):
        if not isinstance(v, dict):
            raise JqRuntimeError(f'cannot delete field of {_jq_type(v)}')
        if k not in v:
            return v
        base = dict(v)
        if rest:
            base[k] = _delpath(base[k], rest)
        else:
            del base[k]
        return base
    if not isinstance(v, list):
        raise JqRuntimeError(f"cannot delete element of {_jq_type(v)}")
    i = int(k)
    if i < 0:
        i += len(v)
    if not (0 <= i < len(v)):
        return v
    arr = list(v)
    if rest:
        arr[i] = _delpath(arr[i], rest)
    else:
        del arr[i]
    return arr


def _delpaths(v, paths: list):
    # delete deepest/highest-sorted first so earlier deletions cannot
    # shift the indices of later ones — jq's delpaths contract
    for p in sorted(paths, key=_SORT_KEY, reverse=True):
        if not isinstance(p, list):
            raise JqRuntimeError("delpaths paths must be arrays")
        v = _delpath(v, p)
    return v


def _ev_setop(op: str, path_ast, val_ast, v, env) -> Iterator:
    if op == "=":
        # plain assignment: RHS evaluated against the ORIGINAL input, one
        # whole-document output per RHS output
        for val in _ev(val_ast, v, env):
            out = v
            for p in _paths_of(path_ast, v, env):
                out = _setpath(out, p, val)
            yield out
        return
    if op == "|=":
        # update: the filter sees the old leaf; its FIRST output replaces
        # it, and an empty output DELETES the path (jq 1.7 _modify)
        out = v
        dels = []
        for p in _paths_of(path_ast, v, env):
            old = _getpath(out, p)
            it = _ev(val_ast, old, env)
            try:
                out = _setpath(out, p, next(it))
            except StopIteration:
                dels.append(p)
        yield _delpaths(out, dels) if dels else out
        return
    # arithmetic updates: RHS against the ORIGINAL input, then the leaf op
    for val in _ev(val_ast, v, env):
        out = v
        for p in _paths_of(path_ast, v, env):
            old = _getpath(out, p)
            if op == "//=":
                new = old if _truthy(old) else val
            else:
                new = _arith(op[0], old, val)
            out = _setpath(out, p, new)
        yield out


# ---------------------------------------------------------------------------
# Regex builtins — jq's test/match/capture/scan/sub/gsub/splits/split(re;f)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=256)
def _compile_cached(pat: str, pyflags: int):
    return re.compile(pat, pyflags)


def _regex_compile(re_s, flags_s: str):
    """(compiled, global?, skip_empty?) with jq flag-string semantics."""
    if not isinstance(re_s, str):
        raise JqRuntimeError(f"{_jq_type(re_s)} cannot be matched, as it is not a string")
    g = skip_empty = False
    pyflags = 0
    for c in flags_s:
        if c == "g":
            g = True
        elif c == "i":
            pyflags |= re.IGNORECASE
        elif c == "x":
            pyflags |= re.VERBOSE
        elif c == "s":
            pyflags |= re.DOTALL
        elif c == "m":
            pyflags |= re.MULTILINE
        elif c == "n":
            skip_empty = True
        else:
            raise JqRuntimeError(f"{flags_s} is not a valid modifier string")
    # Oniguruma named groups (?<name>…) → Python (?P<name>…); the
    # lookbehind forms (?<= and (?<! must pass through untouched
    pat = re.sub(r"\(\?<(?![=!])", "(?P<", re_s)
    try:
        return _compile_cached(pat, pyflags), g, skip_empty
    except re.error as e:
        raise JqRuntimeError(f"{re_s} is not a valid regex: {e}") from e


def _match_obj(m: "re.Match", cre: "re.Pattern") -> dict:
    """jq's match object. Offsets are codepoint offsets — Python string
    indices already are codepoints, so they transfer directly."""
    names = {idx: nm for nm, idx in cre.groupindex.items()}
    caps = []
    for gi in range(1, cre.groups + 1):
        s = m.group(gi)
        if s is None:  # non-participating group
            caps.append({"offset": -1, "length": 0, "string": None,
                         "name": names.get(gi)})
        else:
            caps.append({"offset": m.start(gi), "length": m.end(gi) - m.start(gi),
                         "string": s, "name": names.get(gi)})
    return {"offset": m.start(), "length": m.end() - m.start(),
            "string": m.group(0), "captures": caps}


def _capture_obj(m: "re.Match", cre: "re.Pattern") -> dict:
    """jq's capture object: named groups only (null when unmatched)."""
    return {nm: m.group(nm) for nm in cre.groupindex}


def _finditer(cre: "re.Pattern", v: str) -> Iterator["re.Match"]:
    """Global scan with jq/Oniguruma's edge rule: a zero-width match at
    end-of-string is not attempted (Python's finditer emits it) — except
    on the empty string, where position 0 IS attempted and kept."""
    for m in cre.finditer(v):
        if v and m.start() == len(v) and not m.group(0):
            continue
        yield m


def _ev_regex(name: str, args, v, env) -> Iterator:
    if not isinstance(v, str):
        raise JqRuntimeError(f"{_jq_type(v)} cannot be matched, as it is not a string")
    fi = 2 if name in ("sub", "gsub") else 1  # flags arg position
    flag_vals = list(_ev(args[fi], v, env)) if len(args) > fi else [""]
    for flags_v in flag_vals:
        if flags_v is None:
            flags_v = ""
        if not isinstance(flags_v, str):
            raise JqRuntimeError(f"{_jq_type(flags_v)} is not a valid modifier string")
        for re_v in _ev(args[0], v, env):
            cre, g, skip_empty = _regex_compile(re_v, flags_v)
            if name == "gsub":
                g = True

            def matches():
                out = list(_finditer(cre, v))
                if skip_empty:
                    out = [m for m in out if m.group(0)]
                return out if g else out[:1]

            if name == "test":
                yield bool(matches())
            elif name == "match":
                for m in matches():
                    yield _match_obj(m, cre)
            elif name == "capture":
                for m in matches():
                    yield _capture_obj(m, cre)
            elif name == "scan":  # always global by definition
                for m in _finditer(cre, v):
                    if cre.groups == 0:
                        yield m.group(0)
                    else:
                        yield [m.group(gi) for gi in range(1, cre.groups + 1)]
            elif name in ("splits", "split"):
                parts, pos = [], 0
                for m in _finditer(cre, v):
                    if skip_empty and not m.group(0):
                        continue
                    parts.append(v[pos:m.start()])
                    pos = m.end()
                parts.append(v[pos:])
                if name == "split":
                    yield parts
                else:
                    yield from parts
            else:  # sub / gsub
                yield from _regex_sub(cre, matches(), args[1], v, env)


def _regex_sub(cre, ms: list, repl_ast, v: str, env) -> Iterator[str]:
    """sub/gsub: the replacement is a jq filter evaluated with the NAMED
    capture object as its input (so "\\(.name)" interpolation works); a
    multi-output replacement yields one whole result per combination."""

    def rec(i: int, pos: int, acc: str) -> Iterator[str]:
        if i == len(ms):
            yield acc + v[pos:]
            return
        m = ms[i]
        for r in _ev(repl_ast, _capture_obj(m, cre), env):
            if not isinstance(r, str):
                raise JqRuntimeError(
                    f"{_jq_type(r)} cannot be used as a sub replacement"
                )
            yield from rec(i + 1, m.end(), acc + v[pos:m.start()] + r)

    yield from rec(0, 0, "")


# ---------------------------------------------------------------------------
# Datetime family — jq 1.6 semantics, UTC only, differential-pinned.
# jq's broken-down time is [year, month(0-based), mday, hour, min,
# sec(fraction preserved by gmtime), wday(0=Sunday), yday(0-based)].
# ---------------------------------------------------------------------------

_ISO_FMT = "%Y-%m-%dT%H:%M:%SZ"


def _tm_to_jq(t: "time.struct_time", frac: float = 0.0) -> list:
    return [t.tm_year, t.tm_mon - 1, t.tm_mday, t.tm_hour, t.tm_min,
            t.tm_sec + frac if frac else t.tm_sec,
            (t.tm_wday + 1) % 7, t.tm_yday - 1]


def _epoch_gmtime(v) -> "time.struct_time":
    try:
        return time.gmtime(math.floor(v))
    except (OverflowError, OSError, ValueError):
        raise JqRuntimeError(f"timestamp out of range: {v}") from None


def _jq_mktime(v) -> int:
    # jq ignores the wday/yday tail and truncates fractional seconds
    if not isinstance(v, list):
        raise JqRuntimeError("mktime requires array inputs")
    head = v[:6]
    if len(head) < 6 or any(
        isinstance(x, bool) or not isinstance(x, (int, float)) for x in head
    ):
        raise JqRuntimeError("mktime requires parsed datetime inputs")
    y, mo, d, h, mi, s = (int(x) for x in head)
    try:
        return calendar.timegm((y, mo + 1, d, h, mi, s, 0, 0, 0))
    except (ValueError, IndexError, OverflowError):
        raise JqRuntimeError("mktime requires parsed datetime inputs") from None


def _jq_strptime(v, fmt: str, as_epoch: bool):
    if not isinstance(v, str):
        raise JqRuntimeError(f"{_jq_type(v)} cannot be parsed as a date")
    try:
        t = time.strptime(v, fmt)
    except ValueError:
        raise JqRuntimeError(
            f'date "{v}" does not match format "{fmt}"'
        ) from None
    return calendar.timegm(t) if as_epoch else _tm_to_jq(t)


def _jq_strftime_struct(fmt: str, t: "time.struct_time", epoch: int) -> str:
    # %s is TZ-dependent in C strftime (it mktime()s the tm in LOCAL time);
    # jq's %s is the UTC epoch — substitute before the strftime call so the
    # output never depends on the executor's TZ. '%%' pieces are split out
    # first so an escaped '%%s' stays literal.
    parts = [p.replace("%s", str(int(epoch))) for p in fmt.split("%%")]
    try:
        return time.strftime("%%".join(parts), t)
    except ValueError as e:
        raise JqRuntimeError(f"strftime format error: {e}") from None


def _jq_strftime(v, fmt: str) -> str:
    # jq 1.6's binary ABORTS on a non-string format (jv.c assertion); the
    # interpreter pins the sane catchable error instead
    if not isinstance(fmt, str):
        raise JqRuntimeError("strftime/1 requires a string format")
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        sec = math.floor(v)
        return _jq_strftime_struct(fmt, _epoch_gmtime(v), sec)
    if isinstance(v, list):
        head = v[:6]
        if len(v) < 6 or any(
            isinstance(x, bool) or not isinstance(x, (int, float)) for x in head
        ):
            raise JqRuntimeError("strftime/1 requires parsed datetime inputs")
        y, mo, d, h, mi, s = (int(x) for x in head)
        wday = int(v[6]) if len(v) > 6 and isinstance(v[6], (int, float)) else 0
        yday = int(v[7]) if len(v) > 7 and isinstance(v[7], (int, float)) else 0
        t = time.struct_time((y, mo + 1, d, h, mi, s, (wday + 6) % 7, yday + 1, 0))
        return _jq_strftime_struct(fmt, t, _jq_mktime(v))
    raise JqRuntimeError("strftime/1 requires parsed datetime inputs")


def _builtin1(name: str, v, arg):
    if name == "strftime":
        return _jq_strftime(v, arg)
    if name == "strptime":
        if not isinstance(arg, str):
            raise JqRuntimeError("strptime/1 requires a string format")
        return _jq_strptime(v, arg, as_epoch=False)
    if name == "has":
        if isinstance(v, dict) and isinstance(arg, str):
            return arg in v
        if isinstance(v, list) and isinstance(arg, (int, float)):
            return 0 <= int(arg) < len(v)
        raise JqRuntimeError(f"cannot check {_jq_type(v)} has {_jq_type(arg)}")
    if name == "in":
        if isinstance(arg, dict):
            if not isinstance(v, str):
                raise JqRuntimeError(f"cannot check {_jq_type(v)} in object")
            return v in arg
        if isinstance(arg, list):
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise JqRuntimeError(f"cannot check {_jq_type(v)} in array")
            return 0 <= int(v) < len(arg)
        raise JqRuntimeError(f"cannot check membership in {_jq_type(arg)}")
    if name in ("index", "rindex", "indices"):
        pos = _positions(v, arg)
        if name == "indices":
            return pos
        if pos is None or not pos:
            return None
        return pos[0] if name == "index" else pos[-1]
    if name == "inside":
        return _jq_contains(arg, v)
    if name in ("startswith", "endswith", "ltrimstr", "rtrimstr", "split", "contains"):
        if name == "contains":
            return _jq_contains(v, arg)
        if name in ("ltrimstr", "rtrimstr"):
            # jq passes non-string input OR argument through UNCHANGED
            # (pinned vs the binary) — never an error
            if not isinstance(v, str) or not isinstance(arg, str):
                return v
            if name == "ltrimstr":
                return v[len(arg):] if v.startswith(arg) else v
            return v[: -len(arg)] if arg and v.endswith(arg) else v
        if not isinstance(v, str) or not isinstance(arg, str):
            raise JqRuntimeError(f"{name} needs strings, got {_jq_type(v)}/{_jq_type(arg)}")
        if name == "startswith":
            return v.startswith(arg)
        if name == "endswith":
            return v.endswith(arg)
        # jq's split("") yields the char list; Python raises ValueError,
        # which would escape the JqRuntimeError hierarchy and defeat try/?
        return v.split(arg) if arg else list(v)
    if name == "join":
        if not isinstance(v, list):
            raise JqRuntimeError(f"cannot join {_jq_type(v)}")
        return str(arg).join(
            "" if x is None else (x if isinstance(x, str) else _tostring(_canonical(x)))
            for x in v
        )
    raise _unsupported(f"unknown function: {name}/1")  # pragma: no cover


def _jq_contains(a, b) -> bool:
    """jq's contains: substring for strings, per-element containment for
    arrays, recursive key containment for objects, equality for scalars."""
    if isinstance(a, dict) and isinstance(b, dict):
        return all(k in a and _jq_contains(a[k], b[k]) for k in b)
    if isinstance(a, list) and isinstance(b, list):
        return all(any(_jq_contains(x, y) for x in a) for y in b)
    if isinstance(a, str) and isinstance(b, str):
        return b in a
    if isinstance(a, (dict, list, str)) or isinstance(b, (dict, list, str)):
        raise JqRuntimeError(f"{_jq_type(a)} cannot contain {_jq_type(b)}")
    return _cmp(a, b) == 0


def _positions(v, arg) -> "list | None":
    """All match positions for index/rindex/indices (null input → null)."""
    if v is None:
        return None
    if isinstance(v, str):
        if not isinstance(arg, str):
            raise JqRuntimeError(f"cannot search string for {_jq_type(arg)}")
        if not arg:
            return []
        out, start = [], 0
        while True:
            i = v.find(arg, start)
            if i < 0:
                return out
            out.append(i)
            start = i + len(arg)  # strings: NON-overlapping, like jq
            # (array subarray matches below DO overlap, also like jq)
    if isinstance(v, list):
        if isinstance(arg, list):
            if not arg:
                return []
            return [
                i
                for i in range(len(v) - len(arg) + 1)
                if all(_cmp(v[i + j], arg[j]) == 0 for j in range(len(arg)))
            ]
        return [i for i, x in enumerate(v) if _cmp(x, arg) == 0]
    raise JqRuntimeError(f"cannot search {_jq_type(v)}")


# libm one-arg functions with jq/libm domain-edge semantics: out-of-domain
# is nan (atanh(±1) is ±inf), overflow is inf — NEVER a raised Python error
# (a bare ValueError would escape jq's try/? and fail the whole job).
_LIBM_1 = {
    "trunc": math.trunc,
    "nearbyint": lambda x: round(x),  # round-half-even, like libm
    "cbrt": lambda x: math.copysign(abs(x) ** (1.0 / 3.0), x),
    "exp2": lambda x: 2.0 ** x,
    "exp10": lambda x: 10.0 ** x,
    # jq's gamma IS lgamma (ln|Γ|), like glibc's. Route through
    # log(Γ(x)) when Γ is finite and positive: both log and gamma are
    # correctly rounded there, matching glibc's lgamma bit-for-bit where
    # Python's own math.lgamma sits 1 ulp off (pinned at x=5)
    "gamma": lambda x: _lgamma(x),
    "lgamma": lambda x: _lgamma(x),
    "tgamma": math.gamma,
    "frexp": lambda x: list(math.frexp(x)),
    "modf": lambda x: list(math.modf(x)),
    "sin": math.sin, "cos": math.cos, "tan": math.tan,
    "asin": math.asin, "acos": math.acos, "atan": math.atan,
    "sinh": math.sinh, "cosh": math.cosh, "tanh": math.tanh,
    "asinh": math.asinh, "acosh": math.acosh, "atanh": math.atanh,
    "significand": lambda x: math.frexp(x)[0] * 2.0 if x else 0.0,
    "logb": lambda x: (
        float("-inf") if x == 0
        else float("inf") if math.isinf(x)
        else float("nan") if math.isnan(x)
        else float(math.frexp(x)[1] - 1)
    ),
}


def _lgamma(x):
    try:
        g = math.gamma(x)
    except (ValueError, OverflowError):
        return math.lgamma(x)
    if g > 0 and math.isfinite(g):
        return math.log(g)
    return math.lgamma(x)


def _libm(name: str, v):
    if name == "atanh" and abs(v) == 1:
        return math.copysign(float("inf"), v)
    try:
        return _LIBM_1[name](v)
    except OverflowError:
        return float("inf")
    except ValueError:
        return float("nan")


def _tostream(v) -> Iterator:
    """jq's tostream events: [path, leaf] per leaf, [path-of-last-child]
    after each non-empty container closes (pinned against the binary)."""

    def rec(x, path):
        if isinstance(x, list) and x:
            for i, c in enumerate(x):
                yield from rec(c, path + [i])
            yield [path + [len(x) - 1]]
        elif isinstance(x, dict) and x:
            ks = list(x.keys())
            for k in ks:
                yield from rec(x[k], path + [k])
            yield [path + [ks[-1]]]
        else:  # scalars and EMPTY containers are stream leaves
            yield [path, x]

    yield from rec(v, [])


def _builtin0(name: str, v) -> Iterator:
    if name in _TYPE_FILTERS:
        if _TYPE_FILTERS[name](v):
            yield v
    elif name == "not":
        yield not _truthy(v)
    elif name == "length":
        if v is None:
            yield 0
        elif isinstance(v, bool):
            raise JqRuntimeError("boolean has no length")
        elif isinstance(v, (int, float)):
            yield abs(v)
        else:
            yield len(v)
    elif name in ("keys", "keys_unsorted"):
        if isinstance(v, dict):
            yield sorted(v) if name == "keys" else list(v)
        elif isinstance(v, list):
            yield list(range(len(v)))
        else:
            raise JqRuntimeError(f"{_jq_type(v)} has no keys")
    elif name == "values":
        if v is not None:
            yield v
    elif name == "type":
        yield _jq_type(v)
    elif name == "tostring":
        yield _tostring(_canonical(v))
    elif name == "tojson":
        yield dumps(v)
    elif name == "tonumber":
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            yield v
        elif isinstance(v, str):
            try:
                yield json.loads(v)
            except ValueError as e:
                raise JqRuntimeError(f"cannot parse {v!r} as number") from e
        else:
            raise JqRuntimeError(f"cannot convert {_jq_type(v)} to number")
    elif name in ("floor", "ceil", "sqrt", "fabs", "abs", "round",
                  "log", "log2", "log10", "exp", "isnan", "isinfinite",
                  "trunc", "nearbyint", "significand", "logb", "cbrt",
                  "exp2", "exp10", "gamma", "lgamma", "tgamma", "frexp",
                  "modf", "sin", "cos", "tan", "asin", "acos", "atan",
                  "sinh", "cosh", "tanh", "asinh", "acosh", "atanh"):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise JqRuntimeError(f"{_jq_type(v)} number required")
        if name in _LIBM_1:
            yield _libm(name, v)
        elif name in ("floor", "ceil", "sqrt"):
            if name == "sqrt" and v < 0:
                yield float("nan")  # libm: domain edge is nan, not a raise
            else:
                yield {"floor": math.floor, "ceil": math.ceil, "sqrt": math.sqrt}[name](v)
        elif name in ("fabs", "abs"):
            yield abs(v)
        elif name == "round":  # libm round: half away from zero
            yield math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
        elif name == "isnan":
            yield isinstance(v, float) and math.isnan(v)
        elif name == "isinfinite":
            yield isinstance(v, float) and math.isinf(v)
        elif name == "exp":
            try:
                yield math.exp(v)
            except OverflowError:
                yield float("inf")
        else:  # log / log2 / log10: jq maps the domain edges to -inf / nan
            if v == 0:
                yield float("-inf")
            elif v < 0:
                yield float("nan")
            else:
                yield {"log": math.log, "log2": math.log2, "log10": math.log10}[name](v)
    elif name == "gmtime":
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise JqRuntimeError("gmtime requires a number")
        sec = math.floor(v)
        yield _tm_to_jq(_epoch_gmtime(v), v - sec)
    elif name == "mktime":
        yield _jq_mktime(v)
    elif name in ("todate", "todateiso8601"):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise JqRuntimeError(f"{name} requires a number")
        yield _jq_strftime_struct(_ISO_FMT, _epoch_gmtime(v), math.floor(v))
    elif name in ("fromdate", "fromdateiso8601"):
        yield _jq_strptime(v, _ISO_FMT, as_epoch=True)
    elif name == "fromjson":
        if not isinstance(v, str):
            raise JqRuntimeError(
                f"{_jq_type(v)} ({dumps(_canonical(v))}) only strings can be parsed"
            )
        try:
            yield json.loads(v)
        except ValueError:
            raise JqRuntimeError(f"{v} cannot be parsed as JSON") from None
    elif name == "utf8bytelength":
        if not isinstance(v, str):
            raise JqRuntimeError(
                f"{_jq_type(v)} ({dumps(_canonical(v))}) only strings have "
                "UTF-8 byte length"
            )
        yield len(v.encode("utf-8"))
    elif name == "transpose":
        if not isinstance(v, list) or any(not isinstance(r, list) for r in v):
            raise JqRuntimeError("transpose needs an array of arrays")
        width = max((len(r) for r in v), default=0)
        yield [[r[i] if i < len(r) else None for r in v] for i in range(width)]
    elif name == "tostream":
        yield from _tostream(v)
    elif name == "infinite":
        yield float("inf")
    elif name == "nan":
        yield float("nan")
    elif name == "error":
        raise JqRuntimeError(
            v if isinstance(v, str) else dumps(v), payload=v
        )
    elif name == "add":
        # jq's add folds .[] — objects sum their VALUES ({} adds to null)
        if not isinstance(v, (list, dict)):
            raise JqRuntimeError(f"cannot add {_jq_type(v)}")
        acc = None
        for x in (v.values() if isinstance(v, dict) else v):
            acc = _arith("+", acc, x)
        yield acc
    elif name in ("any", "all"):
        if not isinstance(v, list):
            raise JqRuntimeError(f"{name} needs an array")
        yield any(_truthy(x) for x in v) if name == "any" else all(_truthy(x) for x in v)
    elif name in ("min", "max"):
        if not isinstance(v, list):
            raise JqRuntimeError(f"{name} needs an array")
        if not v:
            yield None
        else:
            yield (min if name == "min" else max)(v, key=_SORT_KEY)
    elif name == "unique":
        if not isinstance(v, list):
            raise JqRuntimeError("unique needs an array")
        out: list = []
        for x in sorted(v, key=_SORT_KEY):
            if not out or _cmp(out[-1], x) != 0:
                out.append(x)
        yield out
    elif name == "sort":
        if not isinstance(v, list):
            raise JqRuntimeError("sort needs an array")
        yield sorted(v, key=_SORT_KEY)
    elif name == "reverse":
        # jq 1.6 defines reverse via length+indexing: any zero-length
        # value (null, 0, "", {}) reverses to [], everything non-array
        # with length > 0 errors (1.7 added string reverse — not 1.6)
        if isinstance(v, list):
            yield list(reversed(v))
        else:
            n = (
                0 if v is None
                else abs(v) if isinstance(v, (int, float)) and not isinstance(v, bool)
                else len(v) if isinstance(v, (str, dict))
                else 1
            )
            if n == 0:
                yield []
            else:
                raise JqRuntimeError(
                    f"Cannot index {_jq_type(v)} with number"
                )
    elif name in ("first", "last"):
        # jq defines first ≡ .[0] and last ≡ .[-1]: out-of-range (empty
        # array) and null input yield null; non-array input is a jq error
        yield _get_index(v, 0 if name == "first" else -1)
    elif name in ("ascii_downcase", "ascii_upcase"):
        if not isinstance(v, str):
            raise JqRuntimeError(f"{name} needs a string")
        yield v.lower() if name == "ascii_downcase" else v.upper()
    elif name == "flatten":
        yield _flatten(v, None)
    elif name == "explode":
        if not isinstance(v, str):
            raise JqRuntimeError("explode needs a string")
        yield [ord(c) for c in v]
    elif name == "implode":
        if not isinstance(v, list):
            raise JqRuntimeError("implode needs an array")
        yield "".join(chr(int(c)) for c in v)
    elif name in ("paths", "leaf_paths"):
        def walk(x, p):
            if p:  # the root's empty path is excluded
                # leaf_paths ≡ paths(scalars), and select() tests the
                # TRUTHINESS of the scalar itself — so null and false
                # leaves are dropped (pinned vs the binary)
                if name == "paths" or (
                    not isinstance(x, (list, dict))
                    and x is not None
                    and x is not False
                ):
                    yield list(p)
            if isinstance(x, list):
                for i, e in enumerate(x):
                    yield from walk(e, p + [i])
            elif isinstance(x, dict):
                for k2, e in x.items():
                    yield from walk(e, p + [k2])

        yield from walk(v, [])
    elif name == "to_entries":
        # arrays entry-ize by index (jq defines to_entries via keys)
        if isinstance(v, list):
            yield [{"key": i, "value": x} for i, x in enumerate(v)]
        elif isinstance(v, dict):
            yield [{"key": k, "value": x} for k, x in v.items()]
        else:
            raise JqRuntimeError("to_entries needs an object")
    elif name == "from_entries":
        if not isinstance(v, list):
            raise JqRuntimeError("from_entries needs an array")
        # jq 1.6: key = .key // .name // .Name (the // skips null AND
        # false); a non-string winner is an ERROR, not stringified
        out = {}
        for e in v:
            if not isinstance(e, dict):
                raise JqRuntimeError("from_entries entry must be an object")
            key = None
            for kk in ("key", "name", "Name"):
                kv = e.get(kk)
                if kv is not None and kv is not False:
                    key = kv
                    break
            if not isinstance(key, str):
                raise JqRuntimeError(
                    f"Cannot use {_jq_type(key)} ({dumps(_canonical(key))}) "
                    "as object key"
                )
            out[key] = e.get("value")
        yield out
    else:  # pragma: no cover - parser rejects unknown names
        raise _unsupported(f"unknown function: {name}/0")


def _cmp_keylist(a, b) -> int:
    if not isinstance(b, list):
        return 1
    return _cmp(a, b)


def _flatten(v, depth: "int | None"):
    # jq's flatten reduces over .[] — an OBJECT flattens its values (only
    # nested ARRAYS recurse, per the builtin.jq definition)
    if isinstance(v, dict):
        v = list(v.values())
    if not isinstance(v, list):
        raise JqRuntimeError(f"cannot flatten {_jq_type(v)}")
    out: list = []
    for x in v:
        if isinstance(x, list) and (depth is None or depth > 0):
            out.extend(_flatten(x, None if depth is None else depth - 1))
        else:
            out.append(x)
    return out


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _ast_calls(ast, names: frozenset) -> bool:
    """Whether any ``("call", name, ...)`` for a name in ``names`` appears."""
    if isinstance(ast, tuple) and len(ast) >= 2 and ast[0] == "call" and ast[1] in names:
        return True
    if isinstance(ast, (tuple, list)):
        return any(_ast_calls(x, names) for x in ast)
    return False


class MiniJqProgram:
    """A compiled mini-jq program: ``prog(value)`` yields jq's outputs.

    ``stream(values)`` runs jq's INPUT-STREAM model over an iterable of
    records: with ``null_input=True`` (jq -n) the program runs once on
    ``null`` and reads records via ``input``/``inputs``; otherwise (jq's
    default main loop) each unconsumed record becomes ``.`` for one
    program run, which may consume further records itself. ``input`` past
    the end raises the catchable jq error "No more inputs" (the 1.7
    wording; 1.6's binary garbles it as "break"); ``inputs`` just ends.
    """

    def __init__(self, source: str):
        self.source = source
        self._ast = _parse(source)

    @property
    def uses_inputs(self) -> bool:
        return _ast_calls(self._ast, frozenset({"input", "inputs"}))

    def __call__(self, value) -> Iterator:
        return (_canonical(o) for o in _ev(self._ast, value, {}))

    def lines(self, value) -> list[str]:
        """All outputs as compact JSON lines (the -c CLI contract)."""
        return [dumps(o) for o in _ev(self._ast, value, {})]

    def stream(self, values, null_input: bool = True) -> Iterator:
        it = iter(values)
        env = {("inputs",): it}
        if null_input:
            yield from (_canonical(o) for o in _ev(self._ast, None, env))
            return
        for v in it:  # records the program body didn't consume
            yield from (_canonical(o) for o in _ev(self._ast, v, env))

    def stream_lines(self, values, null_input: bool = True) -> list[str]:
        return [dumps(o) for o in self.stream(values, null_input)]


def compile_program(source: str, allow_inputs: bool = False) -> MiniJqProgram:
    """Parse ``source``; raises JqUnsupported on out-of-core constructs.

    ``input``/``inputs`` compile only with ``allow_inputs=True`` (callers
    that will run via :meth:`MiniJqProgram.stream`); in the default
    per-record mode there is no record stream to read, so they fail at
    compile time like the other out-of-core constructs."""
    prog = MiniJqProgram(source)
    if not allow_inputs and prog.uses_inputs:
        raise _unsupported(
            "input/inputs need a record stream - run via apply_jq_stream"
        )
    return prog
