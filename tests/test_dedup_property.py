"""Differential property test: MinHash-LSH + exact verify vs a pure-Python
exact-Jaccard oracle on randomized near-dup clusters.

The LSH pair set is supposed to EQUAL the brute-force pair set at the
operating threshold (verification removes false positives; banding recall at
j ≥ 0.8 with 96 hashes / 24 bands is ≈ 1 - 3e-6 per pair). Randomized
corpora probe the whole pipeline — shingling edge cases (short docs,
repeated words), signature arithmetic, banding, and the flat
array_intersect verify — against an implementation that shares no code
with it.
"""

from __future__ import annotations

import random

import kinesis_data_counter_spark.operators.dedup as DD

N = 4  # shingle width
THRESHOLD = 0.8
VOCAB = [f"w{i}" for i in range(50)]


def _python_shingles(text: str, n: int = N) -> frozenset[str]:
    w = text.split(" ")
    k = max(len(w) - n + 1, 1)
    return frozenset(" ".join(w[i : i + n]) for i in range(k))


def _python_pairs(docs: dict[int, str]) -> dict[tuple[int, int], float]:
    sh = {i: _python_shingles(t) for i, t in docs.items()}
    out = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            if j >= THRESHOLD:
                out[(a, b)] = round(j, 9)
    return out


def _random_corpus(rng: random.Random) -> dict[int, str]:
    """Clusters of perturbed copies — the only way random text produces
    high-Jaccard pairs (independent random docs almost never do)."""
    docs = {}
    doc_id = 0
    for _cluster in range(10):
        base = [rng.choice(VOCAB) for _ in range(rng.randint(6, 60))]
        for _member in range(rng.randint(1, 4)):
            words = list(base)
            # light perturbation: delete/replace up to ~8% of words
            for _ in range(rng.randint(0, max(1, len(words) // 12))):
                op = rng.random()
                pos = rng.randrange(len(words))
                if op < 0.5 and len(words) > 2:
                    del words[pos]
                else:
                    words[pos] = rng.choice(VOCAB)
            docs[doc_id] = " ".join(words)
            doc_id += 1
    # plus isolated noise docs that must never pair up
    for _ in range(15):
        docs[doc_id] = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 40)))
        doc_id += 1
    return docs


def test_minhash_lsh_equals_bruteforce_on_random_clusters(spark):
    rng = random.Random(20260813)
    for trial in range(3):
        docs = _random_corpus(rng)
        expected = _python_pairs(docs)
        df = spark.createDataFrame(
            [(i, t) for i, t in docs.items()], "doc_id long, text string"
        )
        got = {
            (r.a_id, r.b_id): round(r.jaccard, 9)
            for r in DD.minhash_lsh_pairs(
                df, threshold=THRESHOLD, num_hashes=96, bands=24, n=N
            ).collect()
        }
        assert got == expected, (
            f"trial {trial}: missing={set(expected) - set(got)} "
            f"extra={set(got) - set(expected)}"
        )


def test_ngram_jaccard_equals_bruteforce_on_random_clusters(spark):
    # the inverted-index exact join must agree with the same oracle —
    # no probabilistic step at all here
    rng = random.Random(424242)
    docs = _random_corpus(rng)
    expected = _python_pairs(docs)
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in DD.ngram_jaccard_pairs(df, threshold=THRESHOLD, n=N).collect()
    }
    assert got == expected


def test_incremental_equals_full_minus_history_pairs(spark):
    # pairs(increment vs all) must equal the full pair set minus pairs
    # internal to history — and the precomputed-band-table path must give
    # byte-identical results (the steady-state deployment never re-hashes
    # history)
    rng = random.Random(99)
    docs = _random_corpus(rng)
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    inc = df.filter("doc_id % 3 = 0")
    hist = df.filter("doc_id % 3 != 0")

    full = _python_pairs(docs)
    expected = {
        pair: j
        for pair, j in full.items()
        if not (pair[0] % 3 != 0 and pair[1] % 3 != 0)
    }
    got = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in DD.incremental_minhash_pairs(
            inc, hist, threshold=THRESHOLD, num_hashes=96, bands=24, n=N
        ).collect()
    }
    assert got == expected

    bands = DD.minhash_band_table(hist, num_hashes=96, bands=24, n=N)
    got_precomputed = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in DD.incremental_minhash_pairs(
            inc, hist, threshold=THRESHOLD, num_hashes=96, bands=24, n=N,
            history_bands=bands,
        ).collect()
    }
    assert got_precomputed == expected


# ---------------------------------------------------------------------------
# segment_dedup differential property: pure-Python first-occurrence oracle
# ---------------------------------------------------------------------------


def _python_segment_dedup(docs: dict[int, str], cw: int) -> dict[int, tuple[str, int, int]]:
    seen: set[str] = set()
    out: dict[int, tuple[str, int, int]] = {}
    for i in sorted(docs):
        w = docs[i].split(" ")
        chunks = [" ".join(w[p : p + cw]) for p in range(0, len(w), cw)]
        kept = []
        for c in chunks:
            if c in seen:
                continue
            seen.add(c)
            kept.append(c)
        out[i] = (" ".join(kept), len(kept), len(chunks) - len(kept))
    return out


def test_segment_dedup_differential_vs_python(spark):
    from kinesis_data_counter_spark.operators.corpus import segment_dedup

    rng = random.Random(17)
    for trial in range(3):
        base = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(6, 40)))
        docs: dict[int, str] = {}
        for i in range(20):
            if rng.random() < 0.5:
                docs[i] = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 40)))
            else:  # near-copy: shares long chunk runs with base
                w = base.split(" ")
                if rng.random() < 0.5 and len(w) > 3:
                    w[rng.randrange(len(w))] = rng.choice(VOCAB)
                docs[i] = " ".join(w)
        cw = rng.choice([2, 3, 8])
        sdf = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text_out"], r["n_kept"], r["n_dropped"])
            for r in segment_dedup(sdf, chunk_words=cw).collect()
        }
        want = _python_segment_dedup(docs, cw)
        assert got == want, f"trial={trial} cw={cw}"


def test_cms_differential_vs_python(spark):
    import hashlib

    from kinesis_data_counter_spark.operators import sketches as SK

    rng = random.Random(23)
    items = [f"it{rng.randint(0, 60)}" for _ in range(2500)]
    df = spark.createDataFrame([(i,) for i in items], "item string")
    merged = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in SK.cms_merge(SK.cms_partials(df, "item", depth=4, hex_chars=2)).collect()
    }
    # independent Python CMS with the same md5-bucket rule
    want: dict[tuple[int, str], int] = {}
    for it in items:
        for d in range(4):
            b = hashlib.md5(f"cms{d}:{it}".encode()).hexdigest()[:2]
            want[(d, b)] = want.get((d, b), 0) + 1
    assert merged == want
    mdf = SK.cms_merge(SK.cms_partials(df, "item"))
    est = {
        r["item"]: r["est"]
        for r in SK.cms_point_estimates(mdf, df, "item").collect()
    }
    from collections import Counter

    exact = Counter(items)
    for k, n in exact.items():
        py_est = min(want[(d, hashlib.md5(f"cms{d}:{k}".encode()).hexdigest()[:2])] for d in range(4))
        assert est[k] == py_est >= n


# ---------------------------------------------------------------------------
# round-4: pathological-input robustness (the skew shapes a 100 TB corpus
# will eventually contain)
# ---------------------------------------------------------------------------

def test_minhash_all_identical_corpus_mega_bucket(spark):
    # every doc identical: every band bucket holds the whole corpus — the
    # worst-case candidate explosion. The pipeline must stay correct
    # (all C(n,2) pairs at jaccard 1.0), and the stop-shingle knob must
    # empty the postings (shared shingles exceed any freq cap) without
    # crashing.
    n = 40
    docs = spark.createDataFrame(
        [(i, "the same exact words repeated here every time") for i in range(n)],
        "doc_id long, text string",
    )
    pairs = DD.minhash_lsh_pairs(docs, threshold=0.8, num_hashes=48, bands=12, n=3)
    got = [(r["a_id"], r["b_id"], r["jaccard"]) for r in pairs.collect()]
    assert len(got) == n * (n - 1) // 2
    assert all(j == 1.0 for _a, _b, j in got)
    pruned = DD.minhash_lsh_pairs(
        docs, threshold=0.8, num_hashes=48, bands=12, n=3, max_shingle_freq=5
    )
    assert pruned.count() == 0  # every shingle pruned -> no candidates


def test_segment_dedup_all_identical_docs_keep_first_only(spark):
    from kinesis_data_counter_spark.operators.corpus import segment_dedup

    n = 30
    docs = spark.createDataFrame(
        [(i, "a b c d e f") for i in range(n)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in segment_dedup(docs, chunk_words=3).collect()}
    assert len(out) == n
    assert out[0]["text_out"] == "a b c d e f" and out[0]["n_kept"] == 2
    for i in range(1, n):
        assert out[i] == (i, "", 0, 2) or (
            out[i]["text_out"], out[i]["n_kept"], out[i]["n_dropped"]
        ) == ("", 0, 2)


def test_connected_components_long_chain_converges(spark):
    # a single path graph has diameter = n: the worst case for min-label
    # propagation round counts. max_iter must bound it and the labels must
    # still be correct when the chain fits the iteration budget.
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id long, b_id long"
    )
    out = {r["doc_id"]: r["cluster_id"]
           for r in DD.connected_components(pairs, max_iter=n).collect()}
    assert out == {i: 0 for i in range(n)}
