"""Third-engine pin for the Gopher-style repetition features (extending
the VERDICT r8 task-3 program).

The Spark-vs-DuckDB twin for text_repetition shares one mental model by
construction; this file pins ``operators.text.repetition_features``
against two INDEPENDENT references:

1. Hand-derived vectors computed BY HAND from the published rule family
   (Rae et al. 2021, "Scaling Language Models: ... Gopher", Appendix A1.1
   repetition filters — duplicate-word fraction over TOKENS, and the
   fraction of characters covered by ALL occurrences of the most frequent
   n-gram). Document "the cat sat on the mat the cat ran":

     9 tokens; counts the=3, cat=2, rest 1
       dup_word_frac      = (3+2)/9 = 5/9      -> 0.555556
     bigrams: "the cat" x2, six singletons
       top_bigram         = "the cat", cnt 2
       top_bigram_char_frac = 2*len("the cat")/34 = 14/34 -> 0.411765

   Tie-break vector "a b a b b a": bigrams "a b" x2, "b a" x2, "b b" x1 —
   the documented DESCENDING-lexicographic tie-break picks "b a";
   dup_word_frac = 6/6 = 1.0; char_frac = 2*3/11 -> 0.545455.

2. A structurally independent pure-Python Counter implementation, run
   differentially on seeded random corpora.

Falsifiers, one per free semantic choice:
  - TYPE-based duplicate fraction (distinct duplicated words / distinct
    words) instead of token-based — 2/6 vs 5/9 on the worked example;
  - ALL-BUT-FIRST character coverage ((c-1)*len) instead of all
    occurrences — 7/34 vs 14/34 on the worked example.
"""

from __future__ import annotations

import random
from collections import Counter

from kinesis_data_counter_spark.operators.text import repetition_features

DOC = "the cat sat on the mat the cat ran"
TIE_DOC = "a b a b b a"


def _run(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: r for r in repetition_features(df).collect()}


def test_hand_worked_example(spark):
    r = _run(spark, [(1, DOC)])[1]
    assert r["n_words"] == 9
    assert r["dup_word_frac"] == 0.555556          # 5/9
    assert r["top_bigram"] == "the cat" and r["top_bigram_cnt"] == 2
    assert r["top_bigram_char_frac"] == 0.411765   # 14/34


def test_tiebreak_and_degenerate_vectors(spark):
    rows = _run(spark, [(1, TIE_DOC), (2, "solo"), (3, None)])
    tie = rows[1]
    assert tie["dup_word_frac"] == 1.0
    assert tie["top_bigram"] == "b a"              # desc-lex tie-break
    assert tie["top_bigram_char_frac"] == 0.545455  # 6/11
    solo = rows[2]
    assert solo["n_words"] == 1 and solo["dup_word_frac"] == 0.0
    assert solo["top_bigram"] is None and solo["top_bigram_char_frac"] == 0.0


def _rep_ref(text, dup_by_types=False, char_all_but_first=False):
    """Counter-based reference with the module's round-6 discipline.
    The two keyword flags are the FALSIFIER variants."""
    toks = [t for t in text.lower().split() if t]
    n = len(toks)
    wc = Counter(toks)
    if dup_by_types:
        dup = round(
            sum(1 for c in wc.values() if c > 1) / max(len(wc), 1), 6
        )
    else:
        dup = round(sum(c for c in wc.values() if c > 1) / max(n, 1), 6)
    bc = Counter(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    if not bc:
        return {"n_words": n, "dup_word_frac": dup, "top_bigram": None,
                "top_bigram_cnt": 0, "top_bigram_char_frac": 0.0}
    top = max(bc, key=lambda b: (bc[b], b))  # max count, then DESC lex
    c = bc[top]
    occ = c - 1 if char_all_but_first else c
    frac = round(occ * len(top) / max(len(text.strip()), 1), 6)
    return {"n_words": n, "dup_word_frac": dup, "top_bigram": top,
            "top_bigram_cnt": c, "top_bigram_char_frac": frac}


def test_reference_reproduces_hand_vectors():
    r = _rep_ref(DOC)
    assert (r["dup_word_frac"], r["top_bigram"], r["top_bigram_char_frac"]) == (
        0.555556, "the cat", 0.411765
    )
    t = _rep_ref(TIE_DOC)
    assert t["top_bigram"] == "b a" and t["top_bigram_char_frac"] == 0.545455


def test_differential_on_random_corpora(spark):
    rng = random.Random(20260816)
    vocab = ["aa", "bb", "cc", "dd"]
    for trial in range(3):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15))))
            for i in range(rng.randint(2, 8))
        ]
        got = _run(spark, docs)
        for i, text in docs:
            ref = _rep_ref(text)
            g = got[i]
            assert g["n_words"] == ref["n_words"], (trial, i)
            assert abs(g["dup_word_frac"] - ref["dup_word_frac"]) <= 1.5e-6
            assert g["top_bigram"] == ref["top_bigram"], (trial, i)
            assert g["top_bigram_cnt"] == ref["top_bigram_cnt"], (trial, i)
            assert abs(
                g["top_bigram_char_frac"] - ref["top_bigram_char_frac"]
            ) <= 1.5e-6, (trial, i)


def test_falsifiers_differ_on_worked_example():
    honest = _rep_ref(DOC)
    by_types = _rep_ref(DOC, dup_by_types=True)
    assert by_types["dup_word_frac"] == 0.333333   # 2 dup types / 6 types
    assert by_types["dup_word_frac"] != honest["dup_word_frac"]
    all_but_first = _rep_ref(DOC, char_all_but_first=True)
    assert all_but_first["top_bigram_char_frac"] == 0.205882  # 7/34
    assert all_but_first["top_bigram_char_frac"] != honest["top_bigram_char_frac"]
