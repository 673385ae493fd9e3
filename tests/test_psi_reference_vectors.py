"""Third-engine pin for PSI drift monitoring (VERDICT r9 task 3).

``metrics.drift_report`` and its DuckDB twin (profile_drift) share one
mental model; this file pins the PSI formula and the three free semantic
choices — reference-derived fixed-width bins, edge-clamping of
out-of-range current values, and the eps share floor — against a
hand-derived closed-form value and an independent loop reimplementation.

Closed-form worked example (bins=2):

    ref x: [0, 1, 2, 3]    -> lo=0, hi=3, width=1.5
                              bucket(x) = clamp(floor(x/1.5), 0, 1)
                              b0={0,1}, b1={2,3}   -> shares (0.5, 0.5)
    cur x: [0, 2, 2, 2]    -> b0={0},  b1={2,2,2} -> shares (0.25, 0.75)

    PSI = (0.25-0.5)·ln(0.25/0.5) + (0.75-0.5)·ln(0.75/0.5)
        = (-0.25)·ln(0.5) + 0.25·ln(1.5)
        = 0.25·ln(2) + 0.25·ln(1.5)
        = 0.25·ln(3)                       [ln2 + ln1.5 = ln3]
        = 0.274653  (rounded to 6dp)

Falsifiers: (a) an UN-floored variant yields ±inf/nan when a bucket is
one-sided (cur mass in a bucket ref never saw), where the shipped eps
floor yields a large finite PSI; (b) a drop-out-of-range variant (no edge
clamp) yields a different PSI when current values exceed the reference
range. Both asserted to differ.
"""

from __future__ import annotations

import math
import random

from kinesis_data_counter_spark.metrics import drift_report


def psi_loop(ref_vals, cur_vals, bins=10, eps=1e-6, clamp=True, floor=True):
    """Independent reimplementation: plain Python binning + PSI, no Spark.

    Mirrors the documented contract only — reference-derived fixed-width
    bins, edge clamp, eps floor, NULLs excluded from PSI — not the code.
    """
    ref_nn = [v for v in ref_vals if v is not None]
    cur_nn = [v for v in cur_vals if v is not None]
    lo, hi = min(ref_nn), max(ref_nn)
    width = (hi - lo) / bins

    def bucket(x):
        if hi == lo:
            return 0
        b = math.floor((x - lo) / width)
        if clamp:
            return min(bins - 1, max(0, b))
        return b if 0 <= b < bins else None

    def counts(vals):
        c = {}
        for v in vals:
            b = bucket(v)
            if b is not None:
                c[b] = c.get(b, 0) + 1
        return c

    rc, cc = counts(ref_nn), counts(cur_nn)
    rt, ct = sum(rc.values()), sum(cc.values())
    psi = 0.0
    for b in sorted(set(rc) | set(cc)):
        pr = rc.get(b, 0) / rt
        pc = cc.get(b, 0) / ct
        if floor:
            pr, pc = max(pr, eps), max(pc, eps)
        psi += (pc - pr) * math.log(pc / pr)
    null_delta = (
        sum(v is None for v in cur_vals) / len(cur_vals)
        - sum(v is None for v in ref_vals) / len(ref_vals)
    )
    return round(psi, 6), round(null_delta, 6)


REF = [0.0, 1.0, 2.0, 3.0]
CUR = [0.0, 2.0, 2.0, 2.0]
# hand-derived above: 0.25·ln(3)
PSI_CLOSED_FORM = round(0.25 * math.log(3.0), 6)


def _spark_psi(spark, ref_vals, cur_vals, bins=2):
    rdf = spark.createDataFrame([(v,) for v in ref_vals], "x double")
    cdf = spark.createDataFrame([(v,) for v in cur_vals], "x double")
    rows = drift_report(rdf, cdf, numeric_cols=("x",), bins=bins).collect()
    (r,) = rows
    return r["psi"], r["null_delta"], r["drifted"]


def test_closed_form_worked_example(spark):
    psi, null_delta, drifted = _spark_psi(spark, REF, CUR, bins=2)
    assert psi == PSI_CLOSED_FORM == 0.274653
    assert null_delta == 0.0
    assert drifted  # 0.2747 > 0.2 default threshold


def test_closed_form_independent_loop():
    assert psi_loop(REF, CUR, bins=2) == (PSI_CLOSED_FORM, 0.0)


def test_edge_clamp_pinned(spark):
    # current value far past the reference max must land in the TOP
    # bucket (visible as edge drift), not vanish
    cur = [0.0, 2.0, 2.0, 100.0]
    want_psi, _ = psi_loop(REF, cur, bins=2)
    psi, _, _ = _spark_psi(spark, REF, cur, bins=2)
    assert psi == want_psi
    # and the clamp genuinely matters for this input:
    no_clamp_psi, _ = psi_loop(REF, cur, bins=2, clamp=False)
    assert no_clamp_psi != want_psi


def test_null_delta_pinned(spark):
    cur = [0.0, 2.0, None, None]
    want_psi, want_nd = psi_loop(REF, cur, bins=2)
    psi, nd, _ = _spark_psi(spark, REF, cur, bins=2)
    assert (psi, nd) == (want_psi, want_nd)
    assert nd == 0.5


def test_random_slices_match_independent_loop(spark):
    rng = random.Random(1008)
    for _ in range(3):
        ref = [round(rng.uniform(0, 10), 2) for _ in range(40)]
        cur = [round(rng.uniform(-2, 14), 2) for _ in range(30)] + [None] * 3
        want = psi_loop(ref, cur, bins=5)
        psi, nd, _ = _spark_psi(spark, ref, cur, bins=5)
        assert (psi, nd) == want


def test_falsifier_unfloored_variant_differs():
    # every cur value sits in bucket 1; bucket 0 is one-sided (ref-only).
    cur = [2.0, 2.0, 3.0]
    floored, _ = psi_loop(REF, cur, bins=2)
    assert math.isfinite(floored) and floored > 2  # eps floor -> large finite
    unfloored = 0.0
    rc = {0: 2, 1: 2}
    cc = {0: 0, 1: 3}
    for b in (0, 1):
        pr, pc = rc[b] / 4, cc[b] / 3
        unfloored += (pc - pr) * (math.log(pc / pr) if pc > 0 else -math.inf)
    assert not math.isfinite(unfloored)  # the variant blows up
