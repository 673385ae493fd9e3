"""jq-subset output transform → DataFrame projection.

The reference pipes every output object through an optional jq program
(reference config.go:112-118 compile; counter.go:439-466 run). The shapes its
fixtures and README actually use (testdata/jq_expr.yaml:9, README.md:98-99)
are object construction with literal keys and ``.field`` / literal values:

    {"time": .window_start, "name": "access_log.user_count", "value": .value}

That subset maps 1:1 onto ``df.select(...)`` — which keeps the transform
JVM-side and codegen-eligible instead of a per-row Python jq interpreter.
Programs outside the subset raise :class:`JqUnsupported`; callers may fall
back to a ``mapInPandas`` UDF wrapping a Python jq library if one is
available (none is bundled — the built-in subset covers the reference's
entire observed usage).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class JqUnsupported(ValueError):
    """jq program outside the supported object-construction subset."""


@dataclass(frozen=True)
class JqField:
    name: str  # output field name
    path: tuple[str, ...] | None  # .a.b.c access path, None for literal
    literal: object | None = None


_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_KEY_RX = re.compile(rf'\s*(?:"(?P<q>[^"]*)"|(?P<bare>{_IDENT}))\s*:\s*')
_PATH_RX = re.compile(rf"\.(?:{_IDENT})(?:\.(?:{_IDENT}))*")


def parse_jq_projection(program: str) -> list[JqField]:
    """Parse the object-construction subset; raise JqUnsupported otherwise."""
    src = program.strip()
    if src == ".":
        return []  # identity
    if not (src.startswith("{") and src.endswith("}")):
        raise JqUnsupported(f"only object construction is supported: {program!r}")
    body = src[1:-1]
    fields: list[JqField] = []
    pos = 0
    while pos < len(body):
        m = _KEY_RX.match(body, pos)
        if not m:
            if body[pos:].strip() == "":
                break
            raise JqUnsupported(f"cannot parse key at: {body[pos:]!r}")
        key = m.group("q") if m.group("q") is not None else m.group("bare")
        pos = m.end()
        # value: .path | JSON literal (string/number/true/false/null)
        rest = body[pos:]
        pm = _PATH_RX.match(rest.strip())
        stripped_offset = len(rest) - len(rest.lstrip())
        if pm and pm.start() == 0:
            path = tuple(p for p in pm.group(0).split(".") if p)
            fields.append(JqField(key, path))
            pos += stripped_offset + pm.end()
        else:
            # try a JSON literal up to the next top-level comma
            end = _find_value_end(rest)
            lit_src = rest[:end].strip()
            try:
                lit = json.loads(lit_src)
            except json.JSONDecodeError as e:
                raise JqUnsupported(f"unsupported jq value: {lit_src!r}") from e
            fields.append(JqField(key, None, lit))
            pos += end
        # skip separator
        sep = body[pos:].lstrip()
        if sep.startswith(","):
            pos = len(body) - len(sep) + 1
        else:
            pos = len(body) - len(sep)
            if sep.strip():
                raise JqUnsupported(f"expected ',' at: {sep!r}")
    return fields


def _find_value_end(s: str) -> int:
    """Index of the first top-level comma (or end) in a jq value string."""
    depth = 0
    in_str = False
    for i, ch in enumerate(s):
        if in_str:
            if ch == '"' and s[i - 1] != "\\":
                in_str = False
        elif ch == '"':
            in_str = True
        elif ch in "{[(":
            depth += 1
        elif ch in "}])":
            depth -= 1
        elif ch == "," and depth == 0:
            return i
    return len(s)


def jq_field_to_column(f: JqField) -> Column:
    if f.path is None:
        return F.lit(f.literal).alias(f.name)
    col = F.col(".".join(f.path))
    return col.alias(f.name)


def apply_jq(df: DataFrame, program: str | None) -> DataFrame:
    """Apply a jq-subset program as a projection; identity when None/'.'."""
    if not program:
        return df
    fields = parse_jq_projection(program)
    if not fields:
        return df
    return df.select(*[jq_field_to_column(f) for f in fields])


def apply_jq_generic(df: DataFrame, program: str) -> DataFrame:
    """Full-generality jq fallback: run a real jq program per row.

    For programs outside the projection subset (pipes, filters, iteration —
    ``apply_jq`` raises :class:`JqUnsupported` on them). Each row is
    serialized to a JSON object, run through the jq program, and every
    emitted output becomes one row of JSON text (jq programs may emit
    0..n outputs per input, mirroring the reference's iterator loop,
    counter.go:439-466). Output schema is a single ``value: STRING``
    column — jq output is dynamically typed, so downstream code re-parses
    with ``from_json`` under whatever schema it expects.

    Gated on the optional ``jq`` Python binding (Arrow-batched via
    ``mapInPandas``; the program compiles ONCE per executor, not per row).
    Not bundled in this container — raises ImportError with guidance; the
    built-in subset covers the reference's entire observed usage, so this
    path exists for user programs beyond it.
    """
    try:
        import jq as _jq  # type: ignore
    except ImportError as e:  # pragma: no cover - exercised by the gate test
        raise ImportError(
            "apply_jq_generic needs the 'jq' Python binding; the built-in "
            "apply_jq subset covers object-construction programs without it"
        ) from e

    from collections.abc import Iterator

    import pandas as pd

    cols = df.columns
    compiled_src = program

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        prog = _jq.compile(compiled_src)  # once per executor/partition set
        for pdf in batches:
            out: list[str] = []
            for rec in pdf[cols].to_dict("records"):
                for emitted in prog.input(rec):
                    out.append(json.dumps(emitted, separators=(",", ":")))
            yield pd.DataFrame({"value": pd.array(out, dtype=object)})

    return df.mapInPandas(_batches, "value string")
