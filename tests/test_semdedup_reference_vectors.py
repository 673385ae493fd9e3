"""Third-engine pin for SemDeDup's deterministic k-means pass (VERDICT r9
task 3).

``similarity.semdedup`` (Abbas et al. 2023) has four free semantic
choices its Spark/DuckDB differential cannot discriminate on its own:
md5-seed selection, the assignment tie-break (lower cluster id wins),
centroid ROUNDING before reassignment, and the lowest-id-wins ε-ball
flag. This file pins all four against a hand-derived 2-D worked example
and an independent numpy loop reimplementation, with discriminating
falsifiers.

Worked example (dim=2, k=2, threshold=0.9):

    id: vector        md5(str(id)) prefix -> seed rank
    0:  [1.0, 0.0]    cfcd…  (4th)
    1:  [0.0, 1.0]    c4ca…  (2nd)
    2:  [1.0, 0.0]    c81e…  (3rd)
    3:  [0.8, 0.6]    eccb…  (5th)
    4:  [-1.0, 0.0]   a87f…  (1st)

    seeds (k=2 lowest md5): ids 4 and 1 -> clusters cl=4, cl=1.
    pass 1: 0,1,2,3 -> cl1 (cos 0, 1, 0, 0.6 beat cl4's -1, 0, -1, -0.8);
            4 -> cl4.
    Lloyd:  cl1 centroid = mean([1,0],[0,1],[1,0],[.8,.6]) = [0.7, 0.4]
            (exact at 6dp); cl4 centroid = [-1, 0].
    pass 2: cos to [0.7,0.4] (norm=.806226): id0 .868243, id1 .496139,
            id2 .868243, id3 .992278 -> all cl1; id4 -> cl4.
    flags (threshold .9, lowest id wins): cos(id0,id2)=1.0 >= .9 flags
            id2; cos(id0,id3)=0.8, cos(id1,id3)=0.6 < .9 keep id3.

    expected: (0,1,T) (1,1,T) (2,1,F) (3,1,T) (4,4,T)

Falsifiers: (a) higher-cluster-id tie-break reassigns EVERYTHING on a
crafted identical-seed-vector input; (b) a 5dp rounding variant flips a
keep flag on a crafted cosine of 0.8999996. Both asserted to differ.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np

from kinesis_data_counter_spark.operators.similarity import semdedup


def semdedup_loop(vecs, k, threshold, tie="low", round_digits=6):
    """Independent reimplementation: hashlib + numpy loops, no Spark."""
    ids = sorted(vecs)
    seeds = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:k]
    cents = {s: np.asarray(vecs[s], dtype=np.float64) for s in seeds}

    def cos(a, b):
        return round(
            float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))),
            round_digits,
        )

    def assign(cents):
        out = {}
        for i in ids:
            v = np.asarray(vecs[i], dtype=np.float64)
            sims = {cl: cos(v, cv) for cl, cv in cents.items()}
            best = max(sims.values())
            tied = [cl for cl, s in sims.items() if s == best]
            out[i] = min(tied) if tie == "low" else max(tied)
        return out

    a1 = assign(cents)
    new_cents = {}
    for cl in set(a1.values()):
        members = np.array([vecs[i] for i in ids if a1[i] == cl], dtype=np.float64)
        new_cents[cl] = np.round(members.mean(axis=0), round_digits)
    a2 = assign(new_cents)

    keep = {}
    for cl in set(a2.values()):
        members = sorted(i for i in ids if a2[i] == cl)
        for pos, i in enumerate(members):
            vi = np.asarray(vecs[i], dtype=np.float64)
            keep[i] = not any(
                cos(vi, np.asarray(vecs[j], dtype=np.float64)) >= threshold
                for j in members[:pos]
            )
    return sorted((i, a2[i], keep[i]) for i in ids)


WORKED = {
    0: [1.0, 0.0],
    1: [0.0, 1.0],
    2: [1.0, 0.0],
    3: [0.8, 0.6],
    4: [-1.0, 0.0],
}
WORKED_EXPECTED = [(0, 1, True), (1, 1, True), (2, 1, False), (3, 1, True), (4, 4, True)]


def _spark_semdedup(spark, vecs, k, threshold):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())],
        "vec_id long, embedding array<double>",
    )
    dim = len(next(iter(vecs.values())))
    rows = semdedup(df, dim=dim, k=k, threshold=threshold).collect()
    return sorted((r["id"], r["cluster_id"], r["keep"]) for r in rows)


def test_worked_example_hand_derived(spark):
    assert _spark_semdedup(spark, WORKED, k=2, threshold=0.9) == WORKED_EXPECTED


def test_worked_example_independent_loop():
    assert semdedup_loop(WORKED, k=2, threshold=0.9) == WORKED_EXPECTED


def test_seed_order_is_md5_not_id():
    # md5("4") = a87f… sorts FIRST although 4 is the largest id — any
    # accidental order-by-id seeding diverges on the worked example
    order = sorted(WORKED, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    assert order[:2] == [4, 1]


def test_random_vectors_match_independent_loop(spark):
    rng = random.Random(1009)
    for trial in range(2):
        vecs = {
            i: [float(rng.randrange(-2, 3)) or 1.0, float(rng.randrange(-2, 3))]
            for i in range(12)
        }
        got = _spark_semdedup(spark, vecs, k=3, threshold=0.8)
        want = semdedup_loop(vecs, k=3, threshold=0.8)
        assert got == want, (trial, vecs)


def test_assignment_tiebreak_pinned(spark):
    # identical seed vectors -> every cosine ties -> EVERY doc must land
    # in the LOWER cluster id; the losing seed's cluster empties and
    # vanishes after the Lloyd pass (empty-cluster handling pinned too)
    vecs = {0: [0.5, 0.5], 1: [1.0, 0.0], 2: [1.0, 0.0], 3: [0.0, 1.0]}
    # seeds for k=2 are ids 1 and 2 (md5 order: c4ca"1" < c81e"2") — both
    # [1, 0], so assignment is a pure tie for every doc
    order = sorted(vecs, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    assert order[:2] == [1, 2]
    got = _spark_semdedup(spark, vecs, k=2, threshold=0.99)
    assert all(cl == 1 for _, cl, _ in got)
    assert got == semdedup_loop(vecs, k=2, threshold=0.99)


def test_falsifier_high_tiebreak_differs():
    vecs = {0: [0.5, 0.5], 1: [1.0, 0.0], 2: [1.0, 0.0], 3: [0.0, 1.0]}
    low = semdedup_loop(vecs, k=2, threshold=0.99, tie="low")
    high = semdedup_loop(vecs, k=2, threshold=0.99, tie="high")
    assert low != high
    assert all(cl == 2 for _, cl, _ in high)


def test_falsifier_5dp_rounding_differs():
    # cos = 0.8999994: 6dp rounds to 0.899999 — below threshold 0.9
    # (keep=True); a 5dp variant rounds to 0.9 and flags the doc.
    # cos([1,0],[a,b]) = a/sqrt(a²+b²) — pick b=sqrt(1-a²) so cos IS a.
    a = 0.8999994
    b = float(np.sqrt(1 - a * a))
    vecs = {0: [1.0, 0.0], 1: [a, b]}
    six = semdedup_loop(vecs, k=1, threshold=0.9, round_digits=6)
    five = semdedup_loop(vecs, k=1, threshold=0.9, round_digits=5)
    assert six != five
    assert six[1][2] is True and five[1][2] is False
