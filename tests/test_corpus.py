"""Unit tests for corpus-pipeline operators (packing; the cleaning funnel
and decontamination are covered end-to-end by their registry oracles)."""

from __future__ import annotations

import random

from kinesis_data_counter_spark.operators.corpus import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_pinned_example(spark):
    # token counts [4, 3, 8, 10, 0, 2], budget 10, single group:
    # concatenation offsets 0,4,7,15,25,25 — doc2 and doc3 straddle chunks
    rows = [
        (0, "a b c d"),
        (1, "a b c"),
        (2, "a b c d e f g h"),
        (3, "a b c d e f g h i j"),
        (4, ""),
        (5, "a b"),
    ]
    out = {
        r["doc_id"]: r
        for r in pack_sequences(_docs(spark, rows), budget=10, n_groups=1).collect()
    }
    expect = {
        0: (0, 0, 0),
        1: (0, 4, 0),
        2: (0, 7, 1),   # straddles 0 → 1
        3: (1, 5, 2),   # straddles 1 → 2
        4: (2, 5, 2),   # zero tokens: degenerate placement, drops nothing
        5: (2, 5, 2),
    }
    for doc_id, (sseq, soff, eseq) in expect.items():
        r = out[doc_id]
        assert (r["start_seq"], r["start_offset"], r["end_seq"]) == (sseq, soff, eseq), doc_id


def test_pack_sequences_is_contiguous_and_lossless(spark):
    # within every group, each doc starts exactly where the previous one
    # ended (concat-then-chunk drops and duplicates nothing)
    rng = random.Random(7)
    rows = [
        (i, " ".join("w" for _ in range(rng.randint(0, 50)))) for i in range(200)
    ]
    out = pack_sequences(_docs(spark, rows), budget=64, n_groups=4).collect()
    by_grp: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["grp"], r["doc_id"])):
        by_grp.setdefault(r["grp"], []).append(r)
    total = 0
    for grp, rs in by_grp.items():
        pos = 0
        for r in rs:
            assert r["start_seq"] * 64 + r["start_offset"] == pos, (grp, r)
            pos += r["n_tokens"]
            if r["n_tokens"] > 0:
                assert r["end_seq"] == (pos - 1) // 64
        total += pos
    assert total == sum(len(t.split()) for _, t in rows if t.strip())


def test_curation_example_runs_end_to_end(tmp_path):
    # the worked example must keep running as the operator APIs evolve
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "examples", "curation_pipeline.py"),
            "/root/testdata/sf0.001",
            str(tmp_path / "curated"),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "'n_written':" in out.stdout and "'n_total':" in out.stdout


def test_erase_subjects_null_keys_are_retained_and_counted(spark):
    # a NULL subject key can never match an erasure request: the row must
    # survive AND be counted in n_retained (n_retained ≡ n_total - n_purged,
    # so no filtered-count oracle can disagree over NULL semantics)
    from kinesis_data_counter_spark.operators.corpus import erase_subjects

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (None, 30), (None, 40)], "user_id long, x long"
    )
    subjects = spark.createDataFrame([(2,)], "user_id long")
    retained, audit = erase_subjects(df, subjects, "user_id", "t")
    assert {r.x for r in retained.collect()} == {10, 30, 40}
    a = audit.collect()[0]
    assert (a.n_total, a.n_purged, a.n_retained, a.n_subjects_hit) == (4, 1, 3, 1)


def test_erase_subjects_purges_and_audits(spark):
    from kinesis_data_counter_spark.operators.corpus import erase_subjects

    df = spark.createDataFrame(
        [(u, i) for u in range(10) for i in range(u + 1)], "user_id long, x long"
    )
    subjects = spark.createDataFrame([(2,), (5,), (99,)], "user_id long")
    retained, audit = erase_subjects(df, subjects, "user_id", "t")
    got = retained.select("user_id").distinct().collect()
    assert {r.user_id for r in got} == set(range(10)) - {2, 5}
    a = audit.collect()[0]
    assert a.table_name == "t"
    assert a.n_total == df.count()
    assert a.n_purged == 3 + 6  # user 2 has 3 rows, user 5 has 6
    assert a.n_retained == a.n_total - a.n_purged
    assert a.n_subjects_hit == 2  # 99 never appears in the table


# ---------------------------------------------------------------------------
# segment_dedup
# ---------------------------------------------------------------------------

def test_segment_dedup_first_occurrence_survives(spark):
    from kinesis_data_counter_spark.operators.corpus import segment_dedup

    # chunk_words=2: doc 0 = [a b][c d], doc 1 repeats [a b] then adds [e f],
    # doc 2 repeats both of doc 1's chunks
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b e f"), (2, "a b e f")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text_out"], r["n_kept"], r["n_dropped"])
        for r in segment_dedup(docs, chunk_words=2).collect()
    }
    assert got[0] == ("a b c d", 2, 0)
    assert got[1] == ("e f", 1, 1)
    assert got[2] == ("", 0, 2)


def test_segment_dedup_within_doc_repeats_collapse(spark):
    from kinesis_data_counter_spark.operators.corpus import segment_dedup

    docs = spark.createDataFrame([(7, "x y x y x y")], "doc_id long, text string")
    got = segment_dedup(docs, chunk_words=2).collect()[0]
    assert (got["text_out"], got["n_kept"], got["n_dropped"]) == ("x y", 1, 2)


def test_segment_dedup_ragged_tail_and_order_preserved(spark):
    from kinesis_data_counter_spark.operators.corpus import segment_dedup

    # 5 words with chunk_words=2 → chunks [p q][r s][t]; doc 11 starts with
    # a chunk doc 10 already owns, its remaining chunks keep their order
    docs = spark.createDataFrame(
        [(10, "p q r s t"), (11, "p q z w k m")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["text_out"] for r in segment_dedup(docs, chunk_words=2).collect()}
    assert got[10] == "p q r s t"
    assert got[11] == "z w k m"


def test_segment_dedup_total_chunks_conserved(spark):
    import random

    from kinesis_data_counter_spark.operators.corpus import segment_dedup

    rng = random.Random(2)
    vocab = [f"w{i}" for i in range(12)]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 40))))
         for i in range(60)],
        "doc_id long, text string",
    )
    out = segment_dedup(docs, chunk_words=4).collect()
    assert len(out) == 60
    total = sum(r["n_kept"] + r["n_dropped"] for r in out)
    import math
    want = sum(
        math.ceil(len(r["text"].split(" ")) / 4) for r in docs.collect()
    )
    assert total == want
    # every kept chunk is globally unique: re-chunk each surviving text
    # at the same width and assert no chunk string repeats anywhere
    kept_chunks = []
    for r in out:
        if not r["text_out"]:
            continue
        words = r["text_out"].split(" ")
        kept_chunks.extend(
            " ".join(words[i : i + 4]) for i in range(0, len(words), 4)
        )
    assert len(kept_chunks) == len(set(kept_chunks))
    assert sum(r["n_kept"] for r in out) == len(kept_chunks)


# ---------------------------------------------------------------------------
# quality_tiers
# ---------------------------------------------------------------------------

def test_quality_tiers_exact_thirds(spark):
    from kinesis_data_counter_spark.operators.corpus import quality_tiers

    # 9 docs: tier sizes must be exactly 3/3/3; common-word docs tier high
    rng = random.Random(9)
    common = "the cat sat on the mat " * 3
    docs = [(i, common.strip()) for i in range(3)]
    docs += [(i, common.strip() + f" extra{i} word{i}") for i in range(3, 6)]
    docs += [(i, " ".join(f"rare{i}x{j}" for j in range(10))) for i in range(6, 9)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["tier"] for r in quality_tiers(sdf, mode="exact").collect()}
    from collections import Counter

    assert Counter(got.values()) == {"high": 3, "mid": 3, "low": 3}
    # the rare-token docs are the low tier
    assert {got[i] for i in (6, 7, 8)} == {"low"}


def test_quality_tiers_sketch_agrees_with_exact(spark):
    from kinesis_data_counter_spark.operators.corpus import quality_tiers

    rng = random.Random(4)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 60))))
        for i in range(120)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    exact = {r["doc_id"]: r["tier"] for r in quality_tiers(sdf, mode="exact").collect()}
    sketch = {r["doc_id"]: r["tier"] for r in quality_tiers(sdf, mode="sketch").collect()}
    agree = sum(exact[i] == sketch[i] for i in exact) / len(exact)
    # KLL k=200 holds every value exactly at this size; disagreement can
    # only come from cutoff-boundary tie handling
    assert agree >= 0.9, agree


def test_boilerplate_removal_threshold_drops_everywhere(spark):
    from kinesis_data_counter_spark.operators.corpus import boilerplate_removal

    # chunk_words=2, max_docs=2: [a b] appears in 3 distinct docs → dropped
    # from ALL of them (including the first, which segment_dedup keeps);
    # [c d] appears in exactly 2 docs → at the threshold, kept in both
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c d"), (2, "a b e f")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text_out"], r["n_kept"], r["n_dropped"])
        for r in boilerplate_removal(docs, chunk_words=2, max_docs=2).collect()
    }
    assert got[0] == ("c d", 1, 1)
    assert got[1] == ("c d", 1, 1)
    assert got[2] == ("e f", 1, 1)


def test_boilerplate_removal_keeps_within_doc_repeats(spark):
    from kinesis_data_counter_spark.operators.corpus import boilerplate_removal

    # [x y] repeats 3 times inside ONE doc: document frequency is 1, so
    # every occurrence survives — within-doc repetition is not boilerplate
    docs = spark.createDataFrame([(5, "x y x y x y")], "doc_id long, text string")
    got = boilerplate_removal(docs, chunk_words=2, max_docs=1).collect()[0]
    assert (got["text_out"], got["n_kept"], got["n_dropped"]) == ("x y x y x y", 3, 0)


def test_boilerplate_removal_preserves_null_and_empty_docs(spark):
    from kinesis_data_counter_spark.operators.corpus import boilerplate_removal

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "k m")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text_out"], r["n_kept"], r["n_dropped"])
        for r in boilerplate_removal(docs, chunk_words=2, max_docs=1).collect()
    }
    assert got[1] == ("", 0, 0)
    assert got[2] == ("", 0, 0)
    assert got[3] == ("k m", 1, 0)


def test_chunk_overlap_windows_and_ragged_tail(spark):
    from kinesis_data_counter_spark.operators.corpus import chunk_overlap

    # 7 words, size=4, stride=2 → starts 0,2,4,6: the last two windows are
    # short; consecutive chunks share size-stride=2 words
    docs = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    got = sorted(
        (r["chunk_id"], r["chunk"], r["n_words"])
        for r in chunk_overlap(docs, size=4, stride=2).collect()
    )
    assert got == [
        (0, "a b c d", 4),
        (1, "c d e f", 4),
        (2, "e f g", 3),
        (3, "g", 1),
    ]


def test_chunk_overlap_no_overlap_when_stride_equals_size(spark):
    from kinesis_data_counter_spark.operators.corpus import chunk_overlap

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    got = sorted(
        (r["chunk_id"], r["chunk"]) for r in chunk_overlap(docs, size=2, stride=2).collect()
    )
    assert got == [(0, "a b"), (1, "c d")]


def test_chunk_overlap_rejects_bad_stride_and_skips_empty(spark):
    import pytest

    from kinesis_data_counter_spark.operators.corpus import chunk_overlap

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "solo")], "doc_id long, text string"
    )
    with pytest.raises(ValueError):
        chunk_overlap(docs, size=2, stride=3)
    with pytest.raises(ValueError):
        chunk_overlap(docs, size=2, stride=0)
    got = chunk_overlap(docs, size=2, stride=1).collect()
    assert [(r["doc_id"], r["chunk_id"], r["chunk"]) for r in got] == [(3, 0, "solo")]


# ---------------------------------------------------------------------------
# duplicated_spans: every-offset cross-document substring spans
# ---------------------------------------------------------------------------

def _spans(spark, texts, k=3, min_doc_df=2):
    from kinesis_data_counter_spark.operators.corpus import duplicated_spans

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = duplicated_spans(df, k=k, min_doc_df=min_doc_df).collect()
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"], r["span_tokens"])
        for r in got
    )


def test_dup_spans_catches_misaligned_copy(spark):
    # the copied run sits at offset 1 in doc 0 and offset 3 in doc 1 — an
    # aligned chunker (segment_dedup) would never match these; every-offset
    # grams do. Copied run: "x y z w" (4 tokens) -> with k=3 the duplicated
    # gram starts are 2..3 in doc 0 and 4..5 in doc 1, islands of 2 grams,
    # span_tokens = 4.
    spans = _spans(spark, [
        "a x y z w b c",
        "p q r x y z w s",
    ])
    assert spans == [
        (0, 2, 5, 2, 4),
        (1, 4, 7, 2, 4),
    ]


def test_dup_spans_within_doc_repeat_excluded(spark):
    # "m n o" repeats twice INSIDE doc 0 but nowhere else -> doc_df = 1 ->
    # no span (within-doc repetition is repetition_features' concern)
    assert _spans(spark, ["m n o u v m n o", "unrelated words here entirely"]) == []


def test_dup_spans_merge_overlapping_grams_into_maximal_span(spark):
    # identical docs: every gram duplicated, islands merge to ONE maximal
    # span covering the whole text
    t = "a b c d e f"
    spans = _spans(spark, [t, t])
    assert spans == [(0, 1, 6, 4, 6), (1, 1, 6, 4, 6)]


def test_dup_spans_short_docs_and_nulls_skip(spark):
    # docs shorter than k tokens contribute no grams and never crash
    assert _spans(spark, ["a b", "a b", "xyz"], k=3) == []


def test_dup_spans_min_doc_df_threshold(spark):
    # the shared run appears in exactly 2 docs: present at min_doc_df=2,
    # gone at 3 — and reappears when a third doc carries it
    two = ["s t u v 1", "2 s t u v", "other text here now"]
    assert _spans(spark, two, min_doc_df=3) == []
    three = ["s t u v 1", "2 s t u v", "3 4 s t u v"]
    got = _spans(spark, three, min_doc_df=3)
    assert [(d, s, e) for d, s, e, _, _ in got] == [(0, 1, 4), (1, 2, 5), (2, 3, 6)]


def test_dup_spans_match_bruteforce_on_random_corpora(spark):
    # structurally independent reference: a plain dict-of-grams loop over
    # small random corpora with planted copies — positions, merging, and
    # doc-frequency thresholding all re-derived without Spark
    import collections
    import random

    from kinesis_data_counter_spark.operators.corpus import duplicated_spans

    rng = random.Random(472)
    vocab = ["w%d" % i for i in range(25)]
    texts = {}
    for i in range(40):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(3, 25))]
        texts[i] = toks
        if rng.random() < 0.4:  # plant a copied run at a random offset
            donor = texts[rng.randrange(0, i + 1)]
            if len(donor) >= 5:
                s = rng.randrange(0, len(donor) - 4)
                run = donor[s:s + 5]
                at = rng.randrange(0, len(toks) + 1)
                texts[1000 + i] = toks[:at] + run + toks[at:]

    k, min_df = 4, 2
    gram_docs = collections.defaultdict(set)
    gram_pos = collections.defaultdict(list)
    for d, toks in texts.items():
        for p in range(len(toks) - k + 1):
            g = " ".join(toks[p:p + k])
            gram_docs[g].add(d)
            gram_pos[d].append((p + 1, g))
    expected = set()
    for d, plist in gram_pos.items():
        dup_pos = sorted(p for p, g in plist if len(gram_docs[g]) >= min_df)
        runs, prev = [], None
        for p in dup_pos:
            if prev is not None and p == prev + 1:
                runs[-1].append(p)
            else:
                runs.append([p])
            prev = p
        for r in runs:
            expected.add((d, r[0], r[-1] + k - 1, len(r), r[-1] + k - 1 - r[0] + 1))

    df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"], r["span_tokens"])
        for r in duplicated_spans(df, k=k, min_doc_df=min_df).collect()
    }
    assert got == expected
    assert expected  # the planted copies guarantee a non-vacuous check
