"""Third-engine pin for the CCNet-style unigram-LM quality score (VERDICT
r8 task 3 model).

lm_quality_score's Spark/DuckDB twins share the count-join-average mental
model; this file pins the operator against a structurally INDEPENDENT
reimplementation (collections.Counter + a per-occurrence loop) on
randomized corpora, plus a hand-derived closed-form vector: the corpus is docs "a a a" and
"a b" together (c(a)=4, c(b)=1, T=5), so doc "a a a" scores log10(4/5)
exactly and doc "a b" scores (log10(4/5)+log10(1/5))/2.

Falsifiers (the two free semantic choices):
- per-TYPE averaging (mean over a doc's distinct terms instead of its
  token occurrences) differs on any doc with repeated words;
- natural-log scoring differs on every doc (the threshold is calibrated
  in log10 space).
"""

from __future__ import annotations

import collections
import math
import random

from kinesis_data_counter_spark.operators.text import lm_quality_score


def _scores_loop(texts, per_type=False, base10=True):
    """Independent reimplementation: {doc_id: (n_tokens, avg_logprob)}."""
    counts = collections.Counter()
    total = 0
    toks_by_doc = {}
    for doc_id, t in texts:
        toks = [w for w in t.lower().split() if w]
        toks_by_doc[doc_id] = toks
        counts.update(toks)
        total += len(toks)
    log = math.log10 if base10 else math.log
    out = {}
    for doc_id, toks in toks_by_doc.items():
        if not toks:
            continue
        terms = sorted(set(toks)) if per_type else toks
        avg = sum(log(counts[w] / total) for w in terms) / len(terms)
        out[doc_id] = (len(toks), round(avg, 6))
    return out


def _spark_scores(spark, texts):
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = lm_quality_score(df).collect()
    return {r["doc_id"]: (r["n_tokens"], r["avg_logprob"]) for r in got}


def test_hand_derived_closed_form(spark):
    texts = [(1, "a a a"), (2, "a b")]
    got = _spark_scores(spark, texts)
    assert got[1] == (3, round(math.log10(4 / 5), 6))
    assert got[2] == (2, round((math.log10(4 / 5) + math.log10(1 / 5)) / 2, 6))
    assert got == _scores_loop(texts)


def test_random_corpora_match_counter_loop(spark):
    rng = random.Random(640)
    vocab = ["w%d" % i for i in range(40)]
    texts = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 50))))
        for i in range(80)
    ]
    assert _spark_scores(spark, texts) == _scores_loop(texts)


def test_falsifier_per_type_average_differs(spark):
    # doc 1 repeats its common word: occurrence-weighting pulls the score
    # toward p(a), type-weighting gives a and b equal say — different value,
    # so a distinct-before-average defect in the join/groupBy would surface.
    texts = [(1, "a a a a b"), (2, "a b c")]
    occ = _scores_loop(texts, per_type=False)
    typ = _scores_loop(texts, per_type=True)
    assert occ[1] != typ[1]
    assert _spark_scores(spark, texts) == occ


def test_falsifier_natural_log_differs():
    texts = [(1, "a a a"), (2, "a b")]
    assert _scores_loop(texts, base10=True) != _scores_loop(texts, base10=False)
