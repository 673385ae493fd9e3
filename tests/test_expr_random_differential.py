"""Randomized differential for the `target_expr` mini-language: the Spark
translation vs the DuckDB oracle twin on generated expression trees.

The fixed expr tests pin the grammar the reference's configs exercise;
this one generates ~120 random well-typed expressions (seeded — fully
deterministic) over all three types and every grammar construct
(&&/||/!/comparisons/arithmetic/coalesce/if/as_string/string_contains/nil
and both literal styles), evaluates them in ONE Spark select and ONE
DuckDB query over the same NULL-sprinkled rows, and compares cell by
cell. Divergence here would mean an oracle that silently disagrees with
the engine — the exact failure mode the driver's hash-compare exists to
catch.

Numeric ops stay in {+, -, *} so both engines do identical IEEE double
arithmetic (division introduces rounding-display questions the fixed
tests cover); string literals stay ASCII so collation can't differ.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

ROWS = [
    # value double, user_id bigint, event_type string, props string
    (6.55, 8, "error", '{"k": 69}'),
    (12.31, 46, "click", '{"k": 89}'),
    (None, 7, "view", None),
    (1.63, None, "click", '{"k": 29}'),
    (0.0, 0, None, '{"k": 1}'),
    (-3.5, 12, "signup", '{"k": 50}'),
    (100.25, 99, "purchase", '{"k": 13}'),
    (None, None, None, None),
]
SCHEMA = "value double, user_id bigint, event_type string, props string"


def _g_num(rng: random.Random, d: int) -> str:
    if d <= 0:
        return rng.choice(
            ["value", "user_id", str(rng.randint(-5, 99)),
             f"{rng.randint(0, 20)}.{rng.randint(0, 9)}", "nil"]
        )
    c = rng.randint(0, 4)
    if c == 0:
        return f"({_g_num(rng, d - 1)} + {_g_num(rng, d - 1)})"
    if c == 1:
        return f"({_g_num(rng, d - 1)} - {_g_num(rng, d - 1)})"
    if c == 2:
        return f"({_g_num(rng, d - 1)} * {_g_num(rng, d - 1)})"
    if c == 3:
        return f"coalesce({_g_num(rng, d - 1)}, {_g_num(rng, d - 1)})"
    return f"if({_g_bool(rng, d - 1)}, {_g_num(rng, d - 1)}, {_g_num(rng, d - 1)})"


def _g_str(rng: random.Random, d: int) -> str:
    if d <= 0:
        return rng.choice(
            ["event_type", "props", "'click'", '"er ror"', "'x'", "nil"]
        )
    c = rng.randint(0, 2)
    if c == 0:
        return f"coalesce({_g_str(rng, d - 1)}, {_g_str(rng, d - 1)})"
    if c == 1:
        return f"as_string({_g_num(rng, d - 1)})"
    return f"if({_g_bool(rng, d - 1)}, {_g_str(rng, d - 1)}, {_g_str(rng, d - 1)})"


def _g_bool(rng: random.Random, d: int) -> str:
    if d <= 0:
        op = rng.choice(["<", "<=", ">", ">=", "==", "!="])
        if rng.random() < 0.5:
            return f"({_g_num(rng, 0)} {op} {_g_num(rng, 0)})"
        return f"({_g_str(rng, 0)} {op} {_g_str(rng, 0)})"
    c = rng.randint(0, 4)
    if c == 0:
        return f"({_g_bool(rng, d - 1)} && {_g_bool(rng, d - 1)})"
    if c == 1:
        return f"({_g_bool(rng, d - 1)} || {_g_bool(rng, d - 1)})"
    if c == 2:
        return f"(!{_g_bool(rng, d - 1)})"
    if c == 3:
        return f"string_contains({_g_str(rng, d - 1)}, {_g_str(rng, 0)})"
    op = rng.choice(["<", ">", "==", "!="])
    return f"({_g_num(rng, d - 1)} {op} {_g_num(rng, d - 1)})"


def _same(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and math.isnan(a):
        return isinstance(b, float) and math.isnan(b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    return a == b


@pytest.mark.parametrize("seed", [20260814, 7, 99])
def test_random_target_exprs_match_duckdb(spark, seed):
    from kinesis_data_counter_spark.expr import (
        translate_target_expr,
        translate_target_expr_duckdb,
    )

    rng = random.Random(seed)
    exprs = (
        [_g_bool(rng, rng.randint(1, 3)) for _ in range(20)]
        + [_g_num(rng, rng.randint(1, 3)) for _ in range(10)]
        + [_g_str(rng, rng.randint(1, 3)) for _ in range(10)]
    )

    df = spark.createDataFrame(ROWS, SCHEMA).coalesce(1)
    spark_cols = [
        f"({translate_target_expr(e)}) AS e{i}" for i, e in enumerate(exprs)
    ]
    got = df.selectExpr(*spark_cols).toPandas()

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (value DOUBLE, user_id BIGINT, "
        "event_type VARCHAR, props VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", ROWS)
    duck_cols = ", ".join(
        f"({translate_target_expr_duckdb(e)}) AS e{i}"
        for i, e in enumerate(exprs)
    )
    want = con.execute(f"SELECT {duck_cols} FROM t").df()

    assert len(got) == len(want) == len(ROWS)
    for i, e in enumerate(exprs):
        col = f"e{i}"
        for r in range(len(ROWS)):
            a = got[col].iloc[r]
            b = want[col].iloc[r]
            a = None if a is None or (isinstance(a, float) and pd_isna(a)) else a
            b = None if b is None or (isinstance(b, float) and pd_isna(b)) else b
            assert _same(a, b), (e, ROWS[r], a, b)


def pd_isna(x) -> bool:
    import pandas as pd

    return bool(pd.isna(x))
