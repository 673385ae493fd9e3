"""Third-engine pin for multinomial Naive Bayes train/score (VERDICT r8
task 3).

The Spark-vs-DuckDB twin for the NB entries shares one mental model by
construction; this file pins ``operators.classify.nb_train`` /
``nb_score`` / ``nb_score_margins`` against two INDEPENDENT references:

1. The published worked example from Manning, Raghavan & Schütze,
   "Introduction to Information Retrieval" (2008), Example 13.1 — the
   China/Japan classification exercise. Training set (label, text):

       c: "Chinese Beijing Chinese"
       c: "Chinese Chinese Shanghai"
       c: "Chinese Macao"
       j: "Tokyo Japan Chinese"

   Vocabulary V = 6 {beijing, chinese, japan, macao, shanghai, tokyo};
   class token totals tot(c)=8, tot(j)=3. The book's published add-1
   conditional probabilities:

       P(chinese|c) = (5+1)/(8+6) = 6/14 = 3/7
       P(tokyo|c) = P(japan|c)    = 1/14
       P(chinese|j) = P(tokyo|j) = P(japan|j) = (1+1)/(3+6) = 2/9
       priors: P(c) = 3/4, P(j) = 1/4

   and its published outcome: the test document
   "Chinese Chinese Chinese Tokyo Japan" classifies as c, with
   P(c|d) ~ 0.0003 vs P(j|d) ~ 0.0001. The engine's log-space scores
   hand-derive to

       score(c) = round(round(ln 3/4, 6) + 3*round(ln 6/14, 6)
                        + 2*round(ln 1/14, 6), 4)
                = round(-0.287682 - 3*0.847298 - 2*2.639057, 4) = -8.1077
       score(j) = round(-1.386294 - 5*1.504077, 4)              = -8.9067

   (exp(-8.1077) = 0.000301 and exp(-8.9067) = 0.000135 — the book's
   probabilities, closing the loop on the derivation.)

2. A structurally independent pure-Python reimplementation using EXACT
   Fraction arithmetic over Counter token counts (no DataFrame, no float
   accumulation), run differentially on seeded random corpora: the model
   grid must match round(ln(Fraction), 6) term for term, and the argmax
   must agree wherever the decision margin is not float-thin.

Falsifier: an UNSMOOTHED (add-0) variant must classify the book's test
document as j — P(tokyo|c) = 0 zeroes class c regardless of its three
"chinese" tokens — proving the differential discriminates the smoothing
term, the only free semantic choice in the trainer.
"""

from __future__ import annotations

import math
import random
from collections import Counter
from fractions import Fraction

import pytest

from kinesis_data_counter_spark.operators.classify import (
    nb_score,
    nb_score_margins,
    nb_train,
)

TRAIN = [
    (1, "c", "Chinese Beijing Chinese"),
    (2, "c", "Chinese Chinese Shanghai"),
    (3, "c", "Chinese Macao"),
    (4, "j", "Tokyo Japan Chinese"),
]
TEST_DOC = [(5, "Chinese Chinese Chinese Tokyo Japan")]

# round(ln(p), 6) of the book's published conditionals
EXPECT_LOGP = {
    ("c", "chinese"): -0.847298,   # ln(6/14)
    ("c", "beijing"): -1.94591,    # ln(2/14) = ln(1/7)
    ("c", "shanghai"): -1.94591,
    ("c", "macao"): -1.94591,
    ("c", "tokyo"): -2.639057,     # ln(1/14)
    ("c", "japan"): -2.639057,
    ("j", "chinese"): -1.504077,   # ln(2/9)
    ("j", "tokyo"): -1.504077,
    ("j", "japan"): -1.504077,
    ("j", "beijing"): -2.197225,   # ln(1/9)
    ("j", "shanghai"): -2.197225,
    ("j", "macao"): -2.197225,
}
EXPECT_PRIORS = {"c": -0.287682, "j": -1.386294}  # round(ln(3/4|1/4), 6)


def _model(spark):
    df = spark.createDataFrame(TRAIN, "doc_id long, label string, text string")
    return nb_train(df, label_col="label", text_col="text", vocab_size=16)


def test_model_grid_matches_published_example(spark):
    m = _model(spark)
    got = {(r["label"], r["term"]): r["logp"] for r in m.table.collect()}
    assert got == EXPECT_LOGP
    priors = {r["label"]: r["logprior"] for r in m.priors.collect()}
    assert priors == EXPECT_PRIORS


def test_test_document_classifies_as_c_with_book_score(spark):
    m = _model(spark)
    sdf = spark.createDataFrame(TEST_DOC, "doc_id long, text string")
    row = nb_score(sdf, m, text_col="text", id_col="doc_id").collect()[0]
    assert row["predicted"] == "c"
    assert row["score"] == -8.1077
    mrow = nb_score_margins(sdf, m, text_col="text", id_col="doc_id").collect()[0]
    # margin = score(c) - score(j) = -8.1077 - (-8.9067)
    assert mrow["margin"] == pytest.approx(0.799, abs=1e-9)


# ---------------------------------------------------------------------------
# independent reimplementation (exact Fraction arithmetic)
# ---------------------------------------------------------------------------


def _nb_ref(train, smoothing=1):
    """Counter/Fraction NB trainer: returns (logp grid, priors grid) with
    the engine's round-6 discipline. ``smoothing=0`` is the FALSIFIER
    (unsmoothed) variant."""
    by_label: dict[str, Counter] = {}
    docs_per_label: Counter = Counter()
    for _i, lab, text in train:
        docs_per_label[lab] += 1
        by_label.setdefault(lab, Counter()).update(
            t for t in text.lower().split() if t
        )
    vocab = sorted({t for c in by_label.values() for t in c})
    v = len(vocab)
    logp = {}
    for lab, cnt in by_label.items():
        tot = sum(cnt[t] for t in vocab)
        for t in vocab:
            p = Fraction(cnt[t] + smoothing, tot + smoothing * v)
            logp[(lab, t)] = round(math.log(p), 6) if p > 0 else float("-inf")
    n = sum(docs_per_label.values())
    priors = {
        lab: round(math.log(Fraction(k, n)), 6) for lab, k in docs_per_label.items()
    }
    return logp, priors


def _ref_predict(logp, priors, text):
    scores = {}
    for lab, lp in priors.items():
        s = lp + sum(
            logp.get((lab, t), 0.0) for t in text.lower().split() if t
        )
        scores[lab] = round(s, 4)
    # engine tie-break: max score, then label ascending
    return min(scores, key=lambda L: (-scores[L], L)), scores


def test_reference_reproduces_published_grid():
    logp, priors = _nb_ref(TRAIN)
    assert logp == EXPECT_LOGP and priors == EXPECT_PRIORS
    pred, scores = _ref_predict(logp, priors, TEST_DOC[0][1])
    assert pred == "c" and scores == {"c": -8.1077, "j": -8.9067}


def test_differential_on_random_corpora(spark):
    rng = random.Random(20260815)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    for trial in range(3):
        train = [
            (
                i,
                rng.choice(["x", "y"]),
                " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8))),
            )
            for i in range(rng.randint(4, 10))
        ]
        # both classes must appear or priors degenerate
        if len({lab for _, lab, _ in train}) < 2:
            continue
        df = spark.createDataFrame(train, "doc_id long, label string, text string")
        m = nb_train(df, label_col="label", text_col="text", vocab_size=16)
        got_logp = {(r["label"], r["term"]): r["logp"] for r in m.table.collect()}
        got_priors = {r["label"]: r["logprior"] for r in m.priors.collect()}
        ref_logp, ref_priors = _nb_ref(train)
        assert got_logp == ref_logp, trial
        assert got_priors == ref_priors, trial
        # argmax agreement wherever the margin is not float-thin
        score_df = spark.createDataFrame(
            [(i, t) for i, _l, t in train], "doc_id long, text string"
        )
        preds = {
            r["doc_id"]: (r["predicted"], r["score"])
            for r in nb_score(score_df, m, text_col="text", id_col="doc_id").collect()
        }
        for i, _lab, text in train:
            ref_pred, ref_scores = _ref_predict(ref_logp, ref_priors, text)
            top, runner = sorted(ref_scores.values(), reverse=True)[:2]
            if top - runner > 1e-3:
                assert preds[i][0] == ref_pred, (trial, i)
            assert preds[i][1] == pytest.approx(
                ref_scores[preds[i][0]], abs=2e-4
            ), (trial, i)


def test_falsifier_unsmoothed_flips_the_book_outcome():
    logp, priors = _nb_ref(TRAIN, smoothing=0)
    pred, scores = _ref_predict(logp, priors, TEST_DOC[0][1])
    # P(tokyo|c) = 0 -> class c collapses to -inf despite three "chinese"
    assert scores["c"] == float("-inf")
    assert pred == "j"  # the opposite of the published (and engine) answer
