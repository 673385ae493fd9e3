"""Third-engine pin for PMI collocation detection (extending the VERDICT
r8 task-3 program past the three mandated families).

The Spark-vs-DuckDB twin for text_pmi_collocations shares one mental
model by construction; this file pins ``operators.text.pmi_collocations``
against two INDEPENDENT references:

1. A hand-derived worked example computed BY HAND from the published
   definition (Church & Hanks 1990, "Word Association Norms, Mutual
   Information, and Lexicography"):

       pmi(a, b) = ln( p(ab) / (p(a) p(b)) )

   with p(ab) = c_ab / total_bigrams and p(x) = c_x / total_unigrams
   (the module's documented convention). Corpus = one document
   "new york new york new york is big": 8 unigram tokens
   (new 3, york 3, is 1, big 1), 7 bigrams
   (new york x3, york new x2, york is x1, is big x1).
   With min_count=2 only two pairs survive:

       pmi(new york) = ln( (3/7) / ((3/8)(3/8)) ) = ln(64/21)
                     = 1.1143606... -> 1.114361
       pmi(york new) = ln( (2/7) / ((3/8)(3/8)) ) = ln(128/63)
                     = 0.7088955... -> 0.708896

   Both values sit >= 3e-8 from their 6-digit rounding boundaries.

2. A structurally independent pure-Python Counter implementation of the
   same definition, run differentially on seeded random corpora.

Falsifier: the classic denominator confusion — normalizing p(ab) by the
UNIGRAM total instead of the bigram total (the two totals differ by one
per document, so the defect is invisible on intuition alone) — must
produce different scores on the worked example, proving the differential
discriminates the normalization choice.
"""

from __future__ import annotations

import math
import random
from collections import Counter

from kinesis_data_counter_spark.operators.text import pmi_collocations

CORPUS = [(1, "new york new york new york is big")]


def test_hand_worked_example(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = pmi_collocations(df, min_count=2, k=10).collect()
    got = [(r["bigram"], r["c_ab"], r["pmi"]) for r in rows]
    assert got == [
        ("new york", 3, 1.114361),  # ln(64/21)
        ("york new", 2, 0.708896),  # ln(128/63)
    ]


def _pmi_ref(docs, min_count, unigram_denominator_for_pairs=False):
    """Counter-based PMI with the module's round-6 discipline.
    ``unigram_denominator_for_pairs=True`` is the FALSIFIER variant:
    p(ab) normalized by the unigram total instead of the bigram total."""
    uni: Counter = Counter()
    bi: Counter = Counter()
    for _i, text in docs:
        toks = [t for t in text.lower().split() if t]
        uni.update(toks)
        bi.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    t1, t2 = sum(uni.values()), sum(bi.values())
    denom_pairs = t1 if unigram_denominator_for_pairs else t2
    out = {}
    for bg, c_ab in bi.items():
        if c_ab < min_count:
            continue
        a, b = bg.split(" ", 1)
        out[bg] = round(
            math.log((c_ab / denom_pairs) / ((uni[a] / t1) * (uni[b] / t1))), 6
        )
    return out


def test_reference_reproduces_hand_example():
    assert _pmi_ref(CORPUS, 2) == {"new york": 1.114361, "york new": 0.708896}


def test_differential_on_random_corpora(spark):
    rng = random.Random(20260815)
    vocab = ["aa", "bb", "cc", "dd"]
    for trial in range(4):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 20))))
            for i in range(rng.randint(2, 6))
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["bigram"]: r["pmi"]
            for r in pmi_collocations(df, min_count=2, k=1000).collect()
        }
        ref = _pmi_ref(docs, 2)
        assert got.keys() == ref.keys(), trial
        for bg in got:
            # both round to 6; allow one final-digit ulp on boundary values
            assert abs(got[bg] - ref[bg]) <= 1.5e-6, (trial, bg, got[bg], ref[bg])


def test_falsifier_unigram_denominator_differs():
    honest = _pmi_ref(CORPUS, 2)
    broken = _pmi_ref(CORPUS, 2, unigram_denominator_for_pairs=True)
    assert broken != honest
    # the defect shifts every score by exactly ln(t2/t1) = ln(7/8) < 0
    shift = round(math.log(7 / 8), 6)
    for bg in honest:
        assert abs((broken[bg] - honest[bg]) - shift) <= 2e-6
