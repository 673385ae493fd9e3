"""Differential property test for the target_expr mini-language.

Seeded random expression trees (typed, so they are valid in both engines)
are translated by BOTH shims — ``compile_target_expr`` → Spark and
``translate_target_expr_duckdb`` → DuckDB — and evaluated over the same
events fixture. Any semantic drift between the two translators (rename
leakage inside string literals, if→CASE rewrite bugs, precedence changes)
shows up as a column mismatch. Float *formatting* is excluded by
construction (as_string only over ints/strings); float comparisons are fine
because both engines read identical parquet doubles.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd

from kinesis_data_counter_spark.expr import (
    compile_target_expr,
    translate_target_expr_duckdb,
)

N_EXPRS = 60
MAX_DEPTH = 4


def _gen(rng: random.Random):
    """Return (expr_string, type) with type in {'num','str','bool'}."""

    def num(d):
        if d <= 0 or rng.random() < 0.35:
            return rng.choice(["value", "user_id", str(rng.randint(-5, 120))])
        return rng.choice(
            [
                lambda: f"coalesce({num(d - 1)}, {num(d - 1)})",
                lambda: f"if({boolean(d - 1)}, {num(d - 1)}, {num(d - 1)})",
                lambda: f"if({boolean(d - 1)}, {num(d - 1)}, nil)",
            ]
        )()

    def intish(d):
        # integer-valued (safe for as_string: no float formatting)
        if d <= 0 or rng.random() < 0.5:
            return rng.choice(["user_id", str(rng.randint(0, 99))])
        return f"if({boolean(d - 1)}, {intish(d - 1)}, {intish(d - 1)})"

    def string(d):
        if d <= 0 or rng.random() < 0.4:
            lit = rng.choice(["click", "view", "pur", "x", ""])
            return rng.choice(["event_type", f'"{lit}"'])
        return rng.choice(
            [
                lambda: f"coalesce({string(d - 1)}, {string(d - 1)})",
                lambda: f"if({boolean(d - 1)}, {string(d - 1)}, {string(d - 1)})",
                lambda: f"as_string({intish(d - 1)})",
            ]
        )()

    def boolean(d):
        if d <= 0 or rng.random() < 0.3:
            op = rng.choice([">", "<", ">=", "<=", "==", "!="])
            return f"({num(d - 1)} {op} {num(d - 1)})"
        return rng.choice(
            [
                lambda: f"string_contains({string(d - 1)}, {string(d - 1)})",
                lambda: f"if({boolean(d - 1)}, {boolean(d - 1)}, {boolean(d - 1)})",
                lambda: f"({boolean(d - 1)} == {boolean(d - 1)})",
            ]
        )()

    kind = rng.choice(["num", "str", "bool"])
    return {"num": num, "str": string, "bool": boolean}[kind](MAX_DEPTH), kind


def test_translators_agree_on_random_expressions(spark, sf_dir):
    rng = random.Random(20260813)
    exprs = [_gen(rng) for _ in range(N_EXPRS)]

    from kinesis_data_counter_spark.session import load_tables

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cols = [
        compile_target_expr(e).cast("string").alias(f"e{i}")
        for i, (e, _k) in enumerate(exprs)
    ]
    sdf = ev.select(*cols).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    sel = ", ".join(
        f"CAST({translate_target_expr_duckdb(e)} AS VARCHAR) AS e{i}"
        for i, (e, _k) in enumerate(exprs)
    )
    odf = con.execute(f"SELECT {sel} FROM events").df()

    for i, (e, kind) in enumerate(exprs):
        c = f"e{i}"
        s = sdf[c]
        o = odf[c]
        if kind == "bool":
            # spark renders booleans 'true'; duckdb .df() may give objects —
            # normalize case
            s = s.str.lower()
            o = o.map(lambda v: None if v is None else str(v).lower())
        sv = sorted(s.fillna("<null>"))
        ov = sorted(o.fillna("<null>"))
        assert sv == ov, f"expr {e!r} ({kind}) diverges: {sv[:3]} vs {ov[:3]}"
