"""Third-engine pin for BM25 ranked retrieval (VERDICT r8 task 3).

The Spark-vs-DuckDB twin for text_bm25 shares one mental model by
construction; this file pins ``operators.text.bm25_scores`` against two
INDEPENDENT references:

1. A hand-derived worked example computed BY HAND from the published
   Okapi BM25 formula (Robertson & Zaragoza 2009, "The Probabilistic
   Relevance Framework: BM25 and Beyond", eq. 3.15, with the +1-inside-
   the-log idf variant the module documents):

       idf(t)  = ln(1 + (N - df + 0.5)/(df + 0.5))
       s(d, t) = idf(t) * tf * (k1 + 1) / (tf + k1*(1 - b + b*dl/avgdl))

   Corpus (k1=1.2, b=0.75; tokens are whitespace-split lowercase):
     d1 = "cat dog"                        dl=2
     d2 = "cat cat mouse bird"             dl=4
     d3 = "dog bird fish lion wolf bear"   dl=6
   N=3, avgdl=4; query ("cat", "dog"): df(cat)=2, df(dog)=2, so
   idf = ln(1 + 1.5/2.5) = ln(1.6) = 0.4700036292...

     d1, cat: denom = 1 + 1.2*(0.25 + 0.75*2/4) = 1.75
              c = ln(1.6)*2.2/1.75   = 0.5908617053.. -> 0.590862
     d1, dog: identical               -> 0.590862   score(d1) = 1.181724
     d2, cat: denom = 2 + 1.2*(0.25 + 0.75)      = 3.2
              c = ln(1.6)*2*2.2/3.2  = 0.6462549902.. -> 0.646255
     d3, dog: denom = 1 + 1.2*(0.25 + 0.75*6/4)  = 2.65
              c = ln(1.6)*2.2/2.65   = 0.3901916921.. -> 0.390192

   Every per-term contribution sits >= 4e-8 from its 6-digit rounding
   boundary, so the pins carry no rounding ambiguity.

2. A structurally independent pure-Python dict implementation of the same
   formula (per-document token Counter, no DataFrame machinery), run
   differentially on seeded random corpora.

Falsifier: the classic Robertson idf WITHOUT the +1 (ln((N-df+0.5)/
(df+0.5)) — the variant that goes negative for df > N/2 and that Lucene
added the +1 to avoid) must produce different scores on the worked
example, proving the differential discriminates the idf variant — the
only free semantic choice in the formula.
"""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from kinesis_data_counter_spark.operators.text import bm25_scores

DOCS = [
    (1, "cat dog"),
    (2, "cat cat mouse bird"),
    (3, "dog bird fish lion wolf bear"),
]
QUERY = ("cat", "dog")


def test_hand_worked_example(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_scores(df, QUERY, k=10).collect()
    got = [(r["rank"], r["doc_id"], r["score"]) for r in rows]
    assert got == [
        (1, 1, 1.181724),  # 0.590862 + 0.590862
        (2, 2, 0.646255),
        (3, 3, 0.390192),
    ]


# ---------------------------------------------------------------------------
# independent reimplementation (pure Python, Counter-based)
# ---------------------------------------------------------------------------


def _bm25_ref(docs, terms, k1=1.2, b=0.75, plus_one_idf=True):
    """Dict/Counter BM25 with the module's rounding discipline (per-term
    round 6, doc-sum re-round 6). ``plus_one_idf=False`` is the FALSIFIER
    variant (classic Robertson idf without the +1)."""
    toks = {i: [t for t in txt.lower().split() if t] for i, txt in docs if txt is not None}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scores = {}
    for i, v in toks.items():
        tf = Counter(v)
        s = 0.0
        for t in terms:
            if tf[t] == 0 or dfreq[t] == 0:
                continue
            ratio = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            idf = math.log(1.0 + ratio) if plus_one_idf else math.log(ratio)
            denom = tf[t] + k1 * (1.0 - b + b * len(v) / avgdl)
            s += round(idf * tf[t] * (k1 + 1.0) / denom, 6)
        if s:
            scores[i] = round(s, 6)
    return scores


def test_reference_reproduces_hand_example():
    assert _bm25_ref(DOCS, QUERY) == {1: 1.181724, 2: 0.646255, 3: 0.390192}


def test_differential_on_random_corpora(spark):
    rng = random.Random(20260815)
    vocab = ["cat", "dog", "bird", "fish", "run", "jump", "red", "blue"]
    for trial in range(4):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
            for i in range(rng.randint(3, 10))
        ]
        terms = tuple(rng.sample(vocab, rng.randint(1, 3)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: r["score"] for r in bm25_scores(df, terms, k=100).collect()}
        ref = _bm25_ref(docs, terms)
        assert got.keys() == ref.keys(), (trial, terms)
        for i in got:
            # both round per-term then re-round the sum; allow one
            # final-digit ulp where an unrounded value sits on a boundary
            assert abs(got[i] - ref[i]) <= 1.5e-6, (trial, i, got[i], ref[i])


def test_falsifier_classic_idf_differs():
    broken = _bm25_ref(DOCS, QUERY, plus_one_idf=False)
    honest = _bm25_ref(DOCS, QUERY)
    assert broken != honest
    # with df=2 of N=3 (df > N/2) the classic idf goes NEGATIVE —
    # the defect class the +1 exists to prevent
    assert all(v < 0 for v in broken.values())
    assert all(v > 0 for v in honest.values())
