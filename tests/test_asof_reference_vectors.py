"""Third-engine pin for the as-of join (VERDICT r8 task 3 model).

asof_join's Spark/DuckDB twins (asof_forward_order + the ASOF JOIN oracle)
share one mental model; this file pins the operator against
``pandas.merge_asof`` — an INDEPENDENT, widely-deployed reference
implementation of the same semantics (sorted merge, per-key, backward /
forward, exact matches allowed) — on randomized keyed timelines, covering
both the single-window path and the ``split_every`` hot-key path.

Falsifier: ``allow_exact_matches=False`` (strict inequality — the one free
semantic choice in an as-of join besides direction) produces a DIFFERENT
match on a crafted exact-tie vector, proving the differential
discriminates tie-semantics defects; a direction swap is shown to differ
on the same data as well.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from kinesis_data_counter_spark.operators.joins import asof_join


def _random_frames(seed: int, n_left: int = 300, n_right: int = 120):
    rng = random.Random(seed)
    keys = ["k%d" % i for i in range(8)]
    left = pd.DataFrame({
        "lid": range(n_left),
        "key": [rng.choice(keys) for _ in range(n_left)],
        "lt": [rng.randrange(0, 10_000) for _ in range(n_left)],
    })
    # unique right times per key: with duplicate (key, time) right rows the
    # winner is input-order-defined in pandas and unordered in a window —
    # both engines are deterministic only up to that choice, so the pin
    # (like the DuckDB oracle) keeps right timelines duplicate-free.
    seen, rows = set(), []
    while len(rows) < n_right:
        k, t = rng.choice(keys), rng.randrange(0, 10_000)
        if (k, t) in seen:
            continue
        seen.add((k, t))
        rows.append((k, t, len(rows)))
    right = pd.DataFrame(rows, columns=["key", "rt", "rid"])
    return left, right


def _pandas_asof(left: pd.DataFrame, right: pd.DataFrame, direction: str,
                 allow_exact: bool = True) -> dict[int, tuple]:
    m = pd.merge_asof(
        left.sort_values(["lt", "lid"], kind="mergesort"),
        right.sort_values("rt", kind="mergesort"),
        left_on="lt",
        right_on="rt",
        by="key",
        direction=direction,
        allow_exact_matches=allow_exact,
    )
    out = {}
    for r in m.itertuples(index=False):
        rid = None if pd.isna(r.rid) else int(r.rid)
        rt = None if pd.isna(r.rt) else int(r.rt)
        out[int(r.lid)] = (rid, rt)
    return out


def _spark_asof(spark, left, right, direction, split_every=None):
    ldf = spark.createDataFrame(left, "lid int, key string, lt int")
    rdf = spark.createDataFrame(right, "key string, rt int, rid int")
    got = asof_join(
        ldf, rdf, "key", "key", "lt", "rt",
        direction=direction, split_every=split_every,
    ).collect()
    return {r["lid"]: (r["r_rid"], r["r_rt"]) for r in got}


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("split_every", [None, 500.0])
def test_random_timelines_match_merge_asof(spark, direction, split_every):
    left, right = _random_frames(71)
    expected = _pandas_asof(left, right, direction)
    got = _spark_asof(spark, left, right, direction, split_every)
    assert got == expected


def test_exact_match_tie_is_inclusive(spark):
    # left event exactly at a right version's time must match it (ties
    # match — DuckDB ASOF and pandas allow_exact_matches=True semantics)
    left = pd.DataFrame({"lid": [0], "key": ["a"], "lt": [100]})
    right = pd.DataFrame({"key": ["a", "a"], "rt": [100, 50], "rid": [1, 2]})
    got = _spark_asof(spark, left, right, "backward")
    assert got == {0: (1, 100)}
    assert _pandas_asof(left, right, "backward")[0] == (1, 100)


def test_falsifier_strict_inequality_differs(spark):
    # the pin CAN fail: under allow_exact_matches=False pandas matches the
    # EARLIER version (rid 2), so an off-by-one boundary defect in the
    # window order (left sorting before right at equal time) would surface.
    left = pd.DataFrame({"lid": [0], "key": ["a"], "lt": [100]})
    right = pd.DataFrame({"key": ["a", "a"], "rt": [100, 50], "rid": [1, 2]})
    strict = _pandas_asof(left, right, "backward", allow_exact=False)
    inclusive = _pandas_asof(left, right, "backward", allow_exact=True)
    assert strict[0] == (2, 50)
    assert inclusive[0] == (1, 100)
    assert strict != inclusive
    assert _spark_asof(spark, left, right, "backward") == inclusive


def test_falsifier_direction_swap_differs(spark):
    left, right = _random_frames(72)
    back = _pandas_asof(left, right, "backward")
    fwd = _pandas_asof(left, right, "forward")
    assert back != fwd  # the data genuinely discriminates direction
    assert _spark_asof(spark, left, right, "backward") == back
    assert _spark_asof(spark, left, right, "forward") == fwd
