"""Third-engine pin for the Morton (Z-order) interleave (VERDICT r9 task 3).

``io.zorder_key`` builds the key from Catalyst shiftleft/or terms; its
DuckDB-free nature means the registry entry (layout_zorder_prune) can only
oracle the LOSSLESSNESS of the layout, not the key itself. This file pins
the bit-interleave convention against an INDEPENDENT plain-integer
implementation and hand-derived vectors:

  convention: bit i of column j lands at key bit (i * n_cols + j)
  (io.py::zorder_key docstring) — so for cols (a, b):
      a=1, b=0           -> key 0b01 = 1
      a=0, b=1           -> key 0b10 = 2
      a=3, b=0 (0b11)    -> a0->bit0, a1->bit2 -> 0b101 = 5
      a=0b1010, b=0b0110 -> a: bits 1,3 -> key bits 2,6
                            b: bits 1,2 -> key bits 3,5
                            -> 0b01101100 = 108

Falsifier: the transposed convention (bit i of column j at key bit
(i * n_cols + (n-1-j)) — i.e. swapped column significance) produces a
DIFFERENT key on (a=1, b=0), proving the pin discriminates the only free
choice in the interleave (which column owns the least-significant bit).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kinesis_data_counter_spark.io import zorder_key


def morton_independent(vals: list[int], bits: int) -> int:
    """Plain-integer Morton interleave — no Spark, no shared code."""
    n = len(vals)
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * n + j)
    return out


def morton_transposed(vals: list[int], bits: int) -> int:
    """Deliberately divergent variant: column significance reversed."""
    n = len(vals)
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * n + (n - 1 - j))
    return out


HAND_VECTORS = [
    # ((a, b), bits, expected key) — expected derived BY HAND above
    ((1, 0), 4, 1),
    ((0, 1), 4, 2),
    ((3, 0), 4, 5),
    ((0b1010, 0b0110), 4, 108),
    ((0, 0), 16, 0),
    ((0xFFFF, 0xFFFF), 16, (1 << 32) - 1),  # all 32 low bits set
]


def test_hand_vectors_match_independent_loop():
    for vals, bits, want in HAND_VECTORS:
        assert morton_independent(list(vals), bits) == want, (vals, bits)


def _spark_keys(spark, rows, bits, ncols=2):
    cols = [f"c{j}" for j in range(ncols)]
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "rid int, " + ", ".join(f"{c} long" for c in cols),
    )
    out = (
        df.select("rid", zorder_key(cols, bits=bits).alias("z"))
        .orderBy("rid")
        .collect()
    )
    return [r["z"] for r in out]


def test_production_expression_matches_hand_vectors(spark):
    for bits in sorted({b for _, b, _ in HAND_VECTORS}):
        rows = [v for v, b, _ in HAND_VECTORS if b == bits]
        want = [w for v, b, w in HAND_VECTORS if b == bits]
        assert _spark_keys(spark, rows, bits) == want, bits


def test_random_vectors_match_independent_loop(spark):
    rng = random.Random(1006)
    for bits, ncols in ((16, 2), (8, 3), (10, 4)):
        rows = [
            tuple(rng.randrange(0, 1 << bits) for _ in range(ncols))
            for _ in range(50)
        ]
        # include the edge values the normalizer can produce
        rows += [
            tuple([0] * ncols),
            tuple([(1 << bits) - 1] * ncols),
            tuple([(1 << bits) - 1] + [0] * (ncols - 1)),
        ]
        got = _spark_keys(spark, rows, bits, ncols)
        want = [morton_independent(list(r), bits) for r in rows]
        assert got == want, (bits, ncols)


def test_falsifier_transposed_convention_differs():
    # the transposed interleave is a VALID Morton curve with the opposite
    # column significance; it must disagree on (1, 0) — so the random
    # differential above genuinely pins the shipped convention.
    assert morton_independent([1, 0], 4) != morton_transposed([1, 0], 4)
    assert morton_transposed([1, 0], 4) == 2
    # and the locality claim both conventions share: incrementing the
    # low bit of the LSB-owning column moves the key by exactly 1
    assert morton_independent([1, 0], 4) - morton_independent([0, 0], 4) == 1


def test_single_column_is_identity():
    # n=1 degenerates to the value itself — any interleave defect that
    # shifts bits shows up here immediately
    for v in (0, 1, 5, 0xFFFF):
        assert morton_independent([v], 16) == v


def test_single_column_is_identity_spark(spark):
    vals = [0, 1, 5, 0xFFFF]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "rid int, c0 long")
    got = [
        r["z"]
        for r in df.select("rid", zorder_key(["c0"], bits=16).alias("z"))
        .orderBy("rid")
        .collect()
    ]
    assert got == vals


def test_overflow_guard():
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)  # 64 > 63
