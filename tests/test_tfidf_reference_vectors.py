"""Third-engine pin for TF-IDF keyword extraction (extending the VERDICT
r8 task-3 program past the three mandated families).

The Spark-vs-DuckDB twin for the tfidf entries shares one mental model by
construction; this file pins ``operators.text.tfidf_top_terms`` against
two INDEPENDENT references:

1. A hand-derived worked example computed BY HAND from the documented
   smoothed-idf convention (the formulation popularized by scikit-learn's
   ``TfidfTransformer(smooth_idf=True)`` docs):

       tfidf(d, t) = tf * (ln((N + 1)/(df + 1)) + 1)

   Corpus (N = 3; "the" appears in every document):
     d1 = "the the the cat cat dog"   d2 = "the cat fish"
     d3 = "the dog dog dog bird"
   df: the=3, cat=2, dog=2, fish=1, bird=1
     idf(the)  = ln(4/4)+1 = 1.0 exactly
     idf(cat)  = idf(dog) = ln(4/3)+1 = 1.2876820724...
     idf(fish) = idf(bird) = ln(4/2)+1 = 1.6931471806...
   scores: d1: the 3.0, cat 2.575364, dog 1.287682
           d2: fish 1.693147, cat 1.287682, the 1.0
           d3: dog 3.863046, bird 1.693147, the 1.0

2. A structurally independent pure-Python Counter implementation of the
   same formula, run differentially on seeded random corpora.

Falsifier: the UNSMOOTHED idf = ln(N/df) (no +1 anywhere) zeroes any
term that appears in every document — on the worked example it flips
d1's top keyword from "the" (tf=3, smoothed score 3.0) to "cat",
proving the differential discriminates the smoothing convention, the
only free semantic choice in the formula.
"""

from __future__ import annotations

import math
import random
from collections import Counter

from kinesis_data_counter_spark.operators.text import tfidf_top_terms

CORPUS = [
    (1, "the the the cat cat dog"),
    (2, "the cat fish"),
    (3, "the dog dog dog bird"),
]


def test_hand_worked_example(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = tfidf_top_terms(df, k=5).collect()
    got = {(r["doc_id"], r["term"]): (r["rank"], r["tf"], r["df_docs"], r["tfidf"]) for r in rows}
    assert got == {
        (1, "the"): (1, 3, 3, 3.0),
        (1, "cat"): (2, 2, 2, 2.575364),
        (1, "dog"): (3, 1, 2, 1.287682),
        (2, "fish"): (1, 1, 1, 1.693147),
        (2, "cat"): (2, 1, 2, 1.287682),
        (2, "the"): (3, 1, 3, 1.0),
        (3, "dog"): (1, 3, 2, 3.863046),
        (3, "bird"): (2, 1, 1, 1.693147),
        (3, "the"): (3, 1, 3, 1.0),
    }


def _tfidf_ref(docs, smooth=True):
    """Counter-based TF-IDF with the module's round-6 discipline.
    ``smooth=False`` is the FALSIFIER variant (idf = ln(N/df))."""
    toks = {i: [t for t in txt.lower().split() if t] for i, txt in docs}
    n = len(docs)
    dfreq: Counter = Counter()
    for v in toks.values():
        dfreq.update(set(v))
    out = {}
    for i, v in toks.items():
        for t, tf in Counter(v).items():
            idf = (
                math.log((n + 1) / (dfreq[t] + 1)) + 1
                if smooth
                else math.log(n / dfreq[t])
            )
            out[(i, t)] = round(tf * idf, 6)
    return out


def test_reference_reproduces_hand_example():
    ref = _tfidf_ref(CORPUS)
    assert ref[(1, "the")] == 3.0 and ref[(1, "cat")] == 2.575364
    assert ref[(3, "dog")] == 3.863046 and ref[(2, "fish")] == 1.693147


def test_differential_on_random_corpora(spark):
    rng = random.Random(20260815)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for trial in range(4):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10))))
            for i in range(rng.randint(2, 8))
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["doc_id"], r["term"]): r["tfidf"]
            for r in tfidf_top_terms(df, k=1000).collect()
        }
        ref = _tfidf_ref(docs)
        assert got.keys() == ref.keys(), trial
        for key in got:
            assert abs(got[key] - ref[key]) <= 1.5e-6, (trial, key)


def test_falsifier_unsmoothed_idf_flips_d1_top_keyword():
    honest = _tfidf_ref(CORPUS)
    broken = _tfidf_ref(CORPUS, smooth=False)
    assert broken != honest
    # "the" appears in all 3 docs: unsmoothed idf = ln(3/3) = 0 kills it
    assert broken[(1, "the")] == 0.0 and honest[(1, "the")] == 3.0
    top = lambda scores, doc: max(
        (v, t) for (i, t), v in scores.items() if i == doc
    )[1]
    assert top(honest, 1) == "the" and top(broken, 1) == "cat"
