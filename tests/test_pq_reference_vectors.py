"""Third-engine pin for PQ code assignment + ADC distance tables
(VERDICT r10 task 5).

``similarity.pq_encode`` / ``pq_topk`` (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011) have free
semantic choices their Spark/DuckDB recall differential cannot
discriminate on its own: the subspace SLICING convention (subspace j
covers dims [j·dsub, (j+1)·dsub) — transposing or swapping subspace
order still "works" but assigns different codes), the L2-normalize-
before-quantize step, the squared-L2 assignment metric, the
lowest-code-wins argmin tie-break, and the ADC score as the SUM of
per-subspace lookup-table entries lut[j][code_j] with
lut[j] = books[j] @ q_sub_j. This file pins all of them against a
hand-derived dim=4 / m=2 / ksub=2 worked example and an independent
plain-Python loop reimplementation, with a discriminating falsifier.

Worked example (codebooks chosen by hand):

    books[0] = [[1, 0], [0, 1]]        (subspace 0 = dims 0..1)
    books[1] = [[0.6, 0.8], [1, 0]]    (subspace 1 = dims 2..3)

    v0 = [1, 0, 0, 1] -> /sqrt2 -> [.7071, 0, 0, .7071]
         sub0 [.7071, 0]:  d2(c0)=.0858  d2(c1)=1.5    -> 0
         sub1 [0, .7071]:  d2(c0)=.3686  d2(c1)=1.5    -> 0   codes [0,0]
    v1 = [0, 2, 2, 0] -> /2.8284 -> [0, .7071, .7071, 0]
         sub0 [0, .7071]:  d2(c0)=1.5    d2(c1)=.0858  -> 1
         sub1 [.7071, 0]:  d2(c0)=.6515  d2(c1)=.0858  -> 1   codes [1,1]
    v2 = [1, 1, 0, 0] -> /sqrt2 -> [.7071, .7071, 0, 0]
         sub0: d2(c0)=d2(c1)=.5858 TIE  -> 0 (lowest code wins)
         sub1 [0, 0]:  d2(c0)=1.0 d2(c1)=1.0 TIE -> 0         codes [0,0]

    ADC for q=[1,0,0,0]: lut[0]=books[0]@[1,0]=[1,0];
    lut[1]=books[1]@[0,0]=[0,0]; score(v0)=lut[0][0]+lut[1][0]=1.0,
    score(v1)=lut[0][1]+lut[1][1]=0.0, score(v2)=1.0.

Falsifier: a swapped-subspace-order variant (subspace j scored with
books[m-1-j]) assigns v1's sub0 to code 0 instead of 1 — asserted to
differ from both the Spark codes and the worked example.
"""

from __future__ import annotations

import math

import numpy as np
import pytest


BOOKS = np.array(
    [
        [[1.0, 0.0], [0.0, 1.0]],
        [[0.6, 0.8], [1.0, 0.0]],
    ]
)
VECS = {
    0: [1.0, 0.0, 0.0, 1.0],
    1: [0.0, 2.0, 2.0, 0.0],
    2: [1.0, 1.0, 0.0, 0.0],
}
EXPECTED_CODES = {0: [0, 0], 1: [1, 1], 2: [0, 0]}


def encode_loop(vec, books, swap_subspaces=False):
    """Independent reimplementation: plain-Python loops, no vectorizing.

    Normalize the FULL vector, then per subspace pick the centroid with
    the smallest squared L2 distance; on ties the lowest code wins.
    """
    norm = math.sqrt(sum(x * x for x in vec))
    x = [v / norm if norm > 0 else v for v in vec]
    m = len(books)
    dsub = len(books[0][0])
    codes = []
    for j in range(m):
        sub = x[j * dsub : (j + 1) * dsub]
        book = books[m - 1 - j] if swap_subspaces else books[j]
        best_code, best_d2 = None, None
        for c, cent in enumerate(book):
            d2 = sum((a - b) ** 2 for a, b in zip(sub, cent))
            if best_d2 is None or d2 < best_d2:  # strict < = lowest code wins
                best_code, best_d2 = c, d2
        codes.append(best_code)
    return codes


def adc_score_loop(query, codes, books):
    """Independent ADC: build the (m, ksub) lookup table per subspace as
    plain dot products of the normalized query slice against each
    centroid, then sum the looked-up entries."""
    norm = math.sqrt(sum(x * x for x in query))
    q = [v / norm if norm > 0 else v for v in query]
    m = len(books)
    dsub = len(books[0][0])
    score = 0.0
    for j in range(m):
        qs = q[j * dsub : (j + 1) * dsub]
        lut_j = [sum(a * b for a, b in zip(cent, qs)) for cent in books[j]]
        score += lut_j[codes[j]]
    return score


def test_worked_example_codes_hand_derived():
    for i, v in VECS.items():
        assert encode_loop(v, BOOKS) == EXPECTED_CODES[i], i


def test_spark_pq_encode_matches_worked_example_and_loop(spark):
    from kinesis_data_counter_spark.operators.similarity import pq_encode

    df = spark.createDataFrame(
        [(i, v) for i, v in VECS.items()], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: [c & 0xFF for c in r["codes"]]
        for r in pq_encode(df, BOOKS).collect()
    }
    assert got == EXPECTED_CODES
    assert got == {i: encode_loop(v, BOOKS) for i, v in VECS.items()}


def test_spark_pq_encode_matches_loop_on_seeded_corpus(spark):
    # 24 deterministic vectors, dim=4, m=2, ksub=4 — the loop and the
    # Arrow-batched operator must agree code-for-code
    from kinesis_data_counter_spark.operators.similarity import pq_encode

    rng = np.random.RandomState(7)
    books = rng.randn(2, 4, 2)
    vecs = {i: rng.randn(4).tolist() for i in range(24)}
    df = spark.createDataFrame(
        list(vecs.items()), "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: [c & 0xFF for c in r["codes"]]
        for r in pq_encode(df, books).collect()
    }
    want = {i: encode_loop(v, books) for i, v in vecs.items()}
    assert got == want


def test_adc_scores_match_worked_example():
    q = [1.0, 0.0, 0.0, 0.0]
    scores = {
        i: adc_score_loop(q, EXPECTED_CODES[i], BOOKS) for i in VECS
    }
    assert scores[0] == pytest.approx(1.0)
    assert scores[1] == pytest.approx(0.0)
    assert scores[2] == pytest.approx(1.0)


def test_spark_pq_topk_matches_independent_adc_refine_loop(spark):
    # end-to-end: ADC candidate scan + exact-cosine refine vs a plain
    # loop that replays BOTH stages independently (k*refine shortlist by
    # ADC desc / id asc, then exact cosine desc / id asc)
    from kinesis_data_counter_spark.operators.similarity import pq_topk

    rng = np.random.RandomState(11)
    books = rng.randn(2, 4, 2)
    vecs = {i: rng.randn(4).tolist() for i in range(16)}
    df = spark.createDataFrame(
        list(vecs.items()), "vec_id long, embedding array<double>"
    )
    k, refine = 3, 2
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in pq_topk(
            df, df.filter("vec_id < 3"), dim=4, k=k, m=2, ksub=4,
            refine=refine, codebooks=books,
        ).collect()
    }

    codes = {i: encode_loop(v, books) for i, v in vecs.items()}

    def cosine(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    want = {}
    for qid in (0, 1, 2):
        adc = [
            (-adc_score_loop(vecs[qid], codes[i], books), i)
            for i in vecs
            if i != qid
        ]
        shortlist = [i for _, i in sorted(adc)[: k * refine]]
        exact = sorted(
            ((-round(cosine(vecs[qid], vecs[i]), 6), i) for i in shortlist)
        )[:k]
        for rank, (_, i) in enumerate(exact, start=1):
            want[(qid, rank)] = i
    assert got == want


def test_falsifier_swapped_subspace_order_differs():
    # scoring subspace j with books[m-1-j] still produces codes in range,
    # but assigns v1's sub0 to centroid 0 instead of 1 — the variant is
    # discriminated by the worked example
    swapped = {i: encode_loop(v, BOOKS, swap_subspaces=True) for i, v in VECS.items()}
    assert swapped != EXPECTED_CODES
    assert swapped[1][0] == 0 and EXPECTED_CODES[1][0] == 1
