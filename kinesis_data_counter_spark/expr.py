"""`target_expr` mini-language → Spark SQL translation.

The reference compiles ``target_expr`` with the external ``mashiike/evaluator``
package (reference config.go:93-99) and evaluates it per record
(counter.go:261, 298). The grammar its configs/tests exercise (SURVEY.md §2
F5) is a strict subset of Spark SQL once a handful of names are mapped:

=================  ====================  =====================
evaluator          Spark SQL             DuckDB (oracle)
=================  ====================  =====================
``nil``            ``NULL``              ``NULL``
``as_string(x)``   ``string(x)``         ``CAST(x AS VARCHAR)``
``string_contains``  ``contains``        ``contains``
``coalesce``       ``coalesce``          ``coalesce``
``if(c,a,b)``      ``if(c,a,b)``         ``CASE WHEN c THEN a ELSE b END``
``!=`` etc.        identical             identical
=================  ====================  =====================

Everything is done token-level on a tiny lexer (string literals are opaque),
so any expression that is *already* valid Spark SQL passes through unchanged —
the new engine's ``target_expr`` is simply Spark SQL with a compatibility
shim for the reference's function names. No custom Catalyst expression is
needed; the translated string goes through ``F.expr`` and participates in
whole-stage codegen like any built-in.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# token-level renames applied outside string literals
_SPARK_RENAMES = {
    "nil": "NULL",
    "as_string": "string",
    "string_contains": "contains",
}

_DUCKDB_RENAMES = {
    "nil": "NULL",
    "string_contains": "contains",
}

# identifiers / string literals / C-style logical operators / everything else
_TOKEN_RX = re.compile(
    r"""
    (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')   # quoted string literal
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)              # identifier / function name
  | (?P<op>&&|\|\||!(?!=))                         # Go-style and/or/not
  | (?P<other>.)                                   # any other single char
    """,
    re.VERBOSE | re.DOTALL,
)

# the evaluator grammar is Go-flavored; SQL engines want keywords. `||`
# MUST be rewritten for the DuckDB oracle, where it means string concat.
_OP_RENAMES = {"&&": " AND ", "||": " OR ", "!": " NOT "}


def _rename_tokens(expr: str, renames: dict[str, str]) -> str:
    out: list[str] = []
    for m in _TOKEN_RX.finditer(expr):
        if m.lastgroup == "ident":
            out.append(renames.get(m.group("ident"), m.group("ident")))
        elif m.lastgroup == "op":
            out.append(_OP_RENAMES[m.group("op")])
        else:
            out.append(m.group(0))
    return "".join(out)


def translate_target_expr(expr: str) -> str:
    """evaluator-grammar string → Spark SQL expression string."""
    return _rename_tokens(expr.strip(), _SPARK_RENAMES)


def compile_target_expr(expr: str) -> Column:
    """evaluator-grammar string → Spark Column (JVM-side, codegen-eligible)."""
    return F.expr(translate_target_expr(expr))


def _rewrite_if_to_case(expr: str) -> str:
    """Rewrite top-level ``if(c, a, b)`` calls to ``CASE WHEN`` for engines
    without an ``if`` function. Handles nesting via balanced-paren scanning."""
    lowered = expr
    while True:
        m = re.search(r"\bif\s*\(", lowered)
        if not m:
            return lowered
        start = m.end()  # position just after '('
        depth = 1
        args: list[str] = []
        buf: list[str] = []
        i = start
        in_str: str | None = None
        while i < len(lowered) and depth > 0:
            ch = lowered[i]
            if in_str:
                buf.append(ch)
                if ch == in_str and lowered[i - 1] != "\\":
                    in_str = None
            elif ch in "\"'":
                in_str = ch
                buf.append(ch)
            elif ch == "(":
                depth += 1
                buf.append(ch)
            elif ch == ")":
                depth -= 1
                if depth > 0:
                    buf.append(ch)
            elif ch == "," and depth == 1:
                args.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
            i += 1
        args.append("".join(buf))
        if len(args) != 3:
            raise ValueError(f"if() needs 3 arguments, got {len(args)}: {expr!r}")
        c, a, b = (s.strip() for s in args)
        repl = f"(CASE WHEN {c} THEN {a} ELSE {b} END)"
        lowered = lowered[: m.start()] + repl + lowered[i:]


def _requote_string_literals(expr: str) -> str:
    """Convert the grammar's double-quoted string literals to SQL single
    quotes. In (Duck)SQL ``"x"`` is an *identifier*, so leaving the
    evaluator-style literal untouched would resolve ``"click"`` as a column
    reference (or fail on ``""``). Backslash escapes inside the literal are
    unescaped; embedded single quotes are SQL-doubled."""
    out: list[str] = []
    for m in _TOKEN_RX.finditer(expr):
        tok = m.group(0)
        if m.lastgroup == "str" and tok.startswith('"'):
            inner = tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
            tok = "'" + inner.replace("'", "''") + "'"
        out.append(tok)
    return "".join(out)


_SQL_LITERAL_RX = re.compile(r"'(?:[^']|'')*'")


def _shelter_literals(expr: str) -> tuple[str, list[str]]:
    """Replace single-quoted SQL literals with opaque sentinels.

    The structural rewrites (if→CASE, as_string→CAST) scan for parens,
    commas, and keywords; a literal CONTAINING ``if(`` or ``as_string(``
    (or ending in a backslash) must never be rewritten or treated as
    syntax. Sentinels contain no scannable characters, so every later pass
    is literal-safe by construction; the caller restores them at the end.
    """
    shelf: list[str] = []

    def stash(m: re.Match[str]) -> str:
        shelf.append(m.group(0))
        return f"\x00{len(shelf) - 1}\x00"

    return _SQL_LITERAL_RX.sub(stash, expr), shelf


def translate_target_expr_duckdb(expr: str) -> str:
    """evaluator-grammar string → DuckDB SQL (for the oracle harness).

    ``as_string(x)`` needs a structural rewrite (DuckDB has no ``string()``
    cast function), done with the same balanced-paren scanner as ``if``;
    double-quoted string literals become single-quoted SQL literals and
    are sheltered behind sentinels while the structural passes run, so
    literal CONTENT can never be mistaken for syntax.
    """
    s = _requote_string_literals(expr.strip())
    s, shelf = _shelter_literals(s)
    s = _rename_tokens(s, _DUCKDB_RENAMES)
    s = _rewrite_if_to_case(s)
    # as_string(x) -> CAST(x AS VARCHAR): reuse the scanner by temporary alias
    while True:
        m = re.search(r"\bas_string\s*\(", s)
        if not m:
            break
        depth, i = 1, m.end()
        while i < len(s) and depth > 0:
            if s[i] == "(":
                depth += 1
            elif s[i] == ")":
                depth -= 1
            i += 1
        inner = s[m.end() : i - 1]
        s = s[: m.start()] + f"CAST({inner} AS VARCHAR)" + s[i:]
    for idx, lit in enumerate(shelf):
        s = s.replace(f"\x00{idx}\x00", lit)
    return s
