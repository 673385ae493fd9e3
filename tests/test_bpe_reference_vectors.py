"""Third-engine pin for the BPE merge-table trainer (VERDICT r7 task 5).

The two-engine Spark/DuckDB differential for text_bpe_roundtrip shares one
mental model by construction; this file pins bpe_train_merges against two
INDEPENDENT references:

1. The hand-derived merge trace of the worked example from Sennrich et al.
   2016 ("Neural Machine Translation of Rare Words with Subword Units",
   §3.2 / Figure 1): vocabulary {low:5, lower:2, newest:6, widest:3}. The
   full 15-merge trace below was computed BY HAND from the paper's
   algorithm (pair frequencies recomputed per round; documented tie-break:
   max frequency, then lexicographically smallest pair) — not by running
   the code under test. The first five merges — (e,s), (es,t), (est,</w>),
   (l,o), (lo,w) — are tie-free from merge 4 onward and merge 1 matches
   the paper's own published first merge; the paper's figure then picks a
   different member of later frequency ties (its tie order is unspecified),
   so everything past the shared prefix pins OUR documented tie-break
   against the hand derivation.
2. A structurally independent reimplementation of the paper's Algorithm 1
   (space-joined symbol strings + regex replacement, the paper's own
   presentation) run differentially on randomized corpora.

Falsifier: a deliberately divergent trainer using the subword-nmt-style
"lexicographically LARGEST pair" tie-break must produce a different merge
sequence on the paper corpus — proving the differential discriminates
tie-break defects, the only free semantic choice in the algorithm.
"""

from __future__ import annotations

import collections
import random
import re

import pytest

from kinesis_data_counter_spark.operators.text import (
    _bpe_word_encoder,
    bpe_train_merges,
)

# the paper's worked-example vocabulary (Sennrich et al. 2016, §3.2)
PAPER_VOCAB = {"low": 5, "lower": 2, "newest": 6, "widest": 3}

# hand-derived full merge trace (documented tie-break: max freq, then
# lexicographically smallest pair; </w> appended as its own symbol)
PAPER_TRACE = [
    ("e", "s"),            # 9 (newest 6 + widest 3)
    ("es", "t"),           # 9
    ("est", "</w>"),       # 9
    ("l", "o"),            # 7 (low 5 + lower 2)
    ("lo", "w"),           # 7
    ("e", "w"),            # 6 — tie with (n,e), (w,est</w>); 'e' smallest
    ("ew", "est</w>"),     # 6 — tie with (n,ew); 'ew' < 'n'
    ("n", "ewest</w>"),    # 6
    ("low", "</w>"),       # 5
    ("d", "est</w>"),      # 3 — tie with (i,d), (w,i); 'd' smallest
    ("i", "dest</w>"),     # 3 — tie with (w,i); 'i' < 'w'
    ("w", "idest</w>"),    # 3
    ("e", "r"),            # 2 — tie with (low,e), (r,</w>); 'e' smallest
    ("er", "</w>"),        # 2 — tie with (low,er); 'er' < 'low'
    ("low", "er</w>"),     # 2
]


def _df_from_vocab(spark, vocab: dict):
    # one document containing every word occurrence; word order is
    # irrelevant to the trainer's word-frequency table
    words = []
    for w, f in vocab.items():
        words.extend([w] * f)
    return spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")


def _paper_algorithm1(vocab: dict, num_merges: int) -> list:
    """Independent reference: the paper's Algorithm 1 presentation —
    space-joined symbol strings mutated by whitespace-boundary regex
    replacement (the structure subword-nmt's learn_bpe publishes), with the
    repo's documented tie-break."""
    v = {" ".join(list(w)) + " </w>": f for w, f in vocab.items()}
    merges = []
    for _ in range(num_merges):
        pairs: collections.Counter = collections.Counter()
        for word, freq in v.items():
            syms = word.split()
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p in pairs if pairs[p] == top)
        merges.append(best)
        pat = re.compile(r"(?<!\S)" + re.escape(" ".join(best)) + r"(?!\S)")
        v = {pat.sub("".join(best), word): f for word, f in v.items()}
    return merges


def _divergent_tiebreak_trainer(vocab: dict, num_merges: int) -> list:
    """FALSIFIER: identical except ties break to the lexicographically
    LARGEST pair (the subword-nmt max(stats, key=(freq, pair)) rule)."""
    v = {" ".join(list(w)) + " </w>": f for w, f in vocab.items()}
    merges = []
    for _ in range(num_merges):
        pairs: collections.Counter = collections.Counter()
        for word, freq in v.items():
            syms = word.split()
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = max(pairs, key=lambda p: (pairs[p], p))
        merges.append(best)
        pat = re.compile(r"(?<!\S)" + re.escape(" ".join(best)) + r"(?!\S)")
        v = {pat.sub("".join(best), word): f for word, f in v.items()}
    return merges


def test_trainer_matches_hand_derived_paper_trace(spark):
    got = bpe_train_merges(_df_from_vocab(spark, PAPER_VOCAB), num_merges=50)
    assert got == PAPER_TRACE


def test_paper_published_prefix():
    # the tie-free shared prefix with the paper's Figure 1 sequence
    assert PAPER_TRACE[:5] == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")
    ]


def test_algorithm1_reference_matches_hand_trace():
    # the independent regex-based reference reproduces the hand derivation
    assert _paper_algorithm1(PAPER_VOCAB, 50) == PAPER_TRACE


def test_encoder_segments_unseen_word_like_the_paper():
    # the paper's showcase: an UNSEEN word segments into learned subwords —
    # 'lowest' was never in the training vocabulary, yet encodes as
    # low + est</w>
    enc = _bpe_word_encoder(PAPER_TRACE)
    assert enc("lowest") == ("low", "est</w>")
    # seen words collapse to single learned tokens
    assert enc("low") == ("low</w>",)
    assert enc("newest") == ("newest</w>",)
    # fully out-of-vocabulary material degrades to characters + </w>
    assert enc("xyz") == ("x", "y", "z", "</w>")


def test_divergent_tiebreak_falsifier():
    # the falsifier must diverge at the VERY FIRST merge: round 1 has a
    # 3-way tie at frequency 9 — (e,s), (s,t), (t,</w>) — whose smallest
    # member is (e,s) and largest is (t,</w>)
    wrong = _divergent_tiebreak_trainer(PAPER_VOCAB, 50)
    assert wrong[0] == ("t", "</w>")
    assert wrong != PAPER_TRACE


@pytest.mark.parametrize("seed", [7, 41, 1009])
def test_randomized_corpus_differential(spark, seed):
    # generated corpora: random short words over a 5-letter alphabet with
    # random frequencies — the spark trainer and the independent
    # Algorithm 1 reference must produce the IDENTICAL full merge list
    rng = random.Random(seed)
    vocab = {}
    for _ in range(30):
        w = "".join(rng.choice("abcde") for _ in range(rng.randint(1, 7)))
        vocab[w] = rng.randint(1, 9)
    got = bpe_train_merges(_df_from_vocab(spark, vocab), num_merges=60)
    ref = _paper_algorithm1(vocab, 60)
    assert got == ref
    assert len(got) > 10  # non-degenerate corpus
