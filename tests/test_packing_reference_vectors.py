"""Third-engine pin for sequence packing (VERDICT r8 task 3 model).

pack_sequences' Spark/DuckDB twins share the cumulative-sum mental model;
this file pins the operator against a structurally INDEPENDENT sequential
packer — a plain loop that walks each group's documents in id order,
appending tokens to an infinite tape and cutting it into budget-sized
blocks (the way a data-loader would actually materialize batches) — on
randomized corpora, plus a hand-derived vector.

Falsifier: the NO-STRADDLE variant (a document that does not fit the
current sequence starts a fresh one — pad-and-place packing, the other
published packing discipline) places documents differently on a crafted
vector, proving the differential discriminates the one free semantic
choice (GPT-style concat-then-chunk straddling vs padded placement).
"""

from __future__ import annotations

import random

from kinesis_data_counter_spark.operators.corpus import pack_sequences


def _pack_loop(docs, budget):
    """Independent tape-walk packer for ONE group: docs = [(doc_id,
    n_tokens)] in id order → {doc_id: (start_seq, start_offset, end_seq)}."""
    out, tape = {}, 0
    for doc_id, n in docs:
        start = tape
        end = tape + n
        out[doc_id] = (
            start // budget,
            start % budget,
            start // budget if n == 0 else (end - 1) // budget,
        )
        tape = end
    return out


def _pack_no_straddle(docs, budget):
    """Deliberately divergent pad-and-place packer: a doc that would cross
    a sequence boundary starts the next sequence instead."""
    out, seq, off = {}, 0, 0
    for doc_id, n in docs:
        if off + n > budget and off > 0:
            seq, off = seq + 1, 0
        out[doc_id] = (seq, off, seq if n == 0 else seq + (off + n - 1) // budget)
        off += n
        seq, off = seq + off // budget, off % budget
    return out


def _spark_pack(spark, rows, budget, n_groups):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = pack_sequences(df, budget=budget, n_groups=n_groups).collect()
    return {
        r["doc_id"]: (r["start_seq"], r["start_offset"], r["end_seq"])
        for r in got
    }


def _texts(rng, n):
    return [(i, " ".join("t%d" % j for j in range(rng.randrange(0, 40))))
            for i in range(n)]


def test_random_corpora_match_tape_walk(spark):
    rng = random.Random(77)
    rows = _texts(rng, 120)
    n_groups, budget = 4, 32
    got = _spark_pack(spark, rows, budget, n_groups)
    for g in range(n_groups):
        docs = [(i, 0 if not t else len(t.split())) for i, t in rows
                if i % n_groups == g]
        expected = _pack_loop(sorted(docs), budget)
        for doc_id, placement in expected.items():
            assert got[doc_id] == placement, (g, doc_id)


def test_hand_derived_straddle_vector(spark):
    # group 0, budget 10: docs of 4, 8, 6 tokens -> the 8-token doc
    # straddles sequences 0/1 (starts at offset 4), the 6-token doc
    # straddles 1/2 (starts at offset 2 of seq 1)
    rows = [
        (0, "a b c d"),
        (4, "e f g h i j k l"),
        (8, "m n o p q r"),
    ]
    got = _spark_pack(spark, rows, budget=10, n_groups=4)
    assert got == {0: (0, 0, 0), 4: (0, 4, 1), 8: (1, 2, 1)}


def test_falsifier_no_straddle_variant_differs(spark):
    # the pin CAN fail: pad-and-place packing puts the 8-token doc at the
    # START of sequence 1 — a straddling defect in the cumulative-sum
    # arithmetic would surface as exactly this difference.
    docs = [(0, 4), (4, 8), (8, 6)]
    straddle = _pack_loop(docs, 10)
    padded = _pack_no_straddle(docs, 10)
    assert straddle != padded
    assert straddle[4] == (0, 4, 1)
    assert padded[4] == (1, 0, 1)
    got = _spark_pack(
        spark, [(0, "a b c d"), (4, "e f g h i j k l"), (8, "m n o p q r")],
        budget=10, n_groups=4,
    )
    assert got[4] == straddle[4]


def test_nothing_dropped_and_tokens_conserved(spark):
    # packing must place every document and conserve token counts — the
    # invariant that makes concat-then-chunk lossless (docs straddle,
    # nothing truncated)
    rng = random.Random(78)
    rows = _texts(rng, 60)
    got = _spark_pack(spark, rows, budget=16, n_groups=3)
    assert set(got) == {i for i, _ in rows}
    for i, t in rows:
        n = 0 if not t else len(t.split())
        s_seq, s_off, e_seq = got[i]
        covered = (e_seq - s_seq + 1) * 16 - s_off - (16 - ((s_off + n - 1) % 16 + 1) if n else 0)
        if n:
            assert covered == n, (i, n, got[i])
