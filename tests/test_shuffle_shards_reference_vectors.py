"""Third-engine pin for the shuffle-to-shards hex-range bucketing
(VERDICT r11 task 6).

``sampling.shuffle_shards`` builds the no-global-sort training-shard
permutation from one md5 digest per row: the first 4 hex chars (16 bits)
THRESHOLD-bucket the row into a shard (the ``split_column`` rule with N
equal fractions — shard i is the hex range [i/N, (i+1)/N) of the 16-bit
prefix space, boundaries at ``format(round(acc * 65536), '04x')``), and
the FULL digest is the within-shard sort key. Its DuckDB twin replays the
same md5 expressions, so it shares every choice by construction; this
file pins the arithmetic against an independent hashlib loop
reimplementation, the append-stability property the docstring promises,
and registers a discriminating falsifier: the plausible modulus variant
(shard = int(md5, 16) % N) assigns DIFFERENT shards for a large fraction
of ids — range-bucketing and modulus agree only by coincidence — and,
unlike the range rule, is incompatible with the threshold SQL the twin
and split_column share.
"""

from __future__ import annotations

import hashlib

N_SHARDS = 8
SEED = "pin"
SALT = f"shuffle:{SEED}:"
HEX_DIGITS = 4  # split_column._HEX_DIGITS: 16-bit prefix space


def digest_loop(doc_id: int) -> str:
    return hashlib.md5(f"{SALT}{doc_id}".encode()).hexdigest()


def shard_loop(doc_id: int, n: int = N_SHARDS, modulus: bool = False) -> int:
    h = digest_loop(doc_id)
    if modulus:
        return int(h, 16) % n
    prefix = h[:HEX_DIGITS]
    bounds = [
        format(int(round((i + 1) / n * 16**HEX_DIGITS)), f"0{HEX_DIGITS}x")
        for i in range(n - 1)
    ]
    for i, bound in enumerate(bounds):
        if prefix < bound:
            return i
    return n - 1


def _spark_assignments(spark, ids):
    from kinesis_data_counter_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = shuffle_shards(df, n_shards=N_SHARDS, seed=SEED).collect()
    return {r.doc_id: (r.shard, r.ticket) for r in rows}


def test_spark_matches_hashlib_loop(spark):
    ids = list(range(400))
    got = _spark_assignments(spark, ids)
    for i in ids:
        assert got[i] == (shard_loop(i), digest_loop(i)), i


def test_null_id_gets_null_shard_and_ticket(spark):
    from kinesis_data_counter_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    rows = {
        r.doc_id: (r.shard, r.ticket)
        for r in shuffle_shards(df, n_shards=N_SHARDS, seed=SEED).collect()
    }
    assert rows[None] == (None, None)
    assert rows[1] == (shard_loop(1), digest_loop(1))


def test_append_stability_and_permutation():
    # growing the corpus never moves an existing doc between shards or
    # reorders an existing pair within a shard (hash-keyed, not
    # rank-keyed) — recompute with 4x the ids and compare
    small = {i: (shard_loop(i), digest_loop(i)) for i in range(100)}
    large = {i: (shard_loop(i), digest_loop(i)) for i in range(400)}
    assert all(large[i] == small[i] for i in range(100))
    # reading shards 0..N-1 in ticket order is a permutation: every id
    # appears exactly once, and the order is digest-determined
    order = sorted(range(400), key=lambda i: (large[i][0], large[i][1]))
    assert sorted(order) == list(range(400))
    # occupancy sanity on the 16-bit-range rule: equal fractions within
    # a loose band (deterministic given md5; 400 ids over 8 shards)
    from collections import Counter

    occ = Counter(large[i][0] for i in range(400))
    assert set(occ) == set(range(N_SHARDS))
    assert max(occ.values()) <= 3 * min(occ.values())


def test_falsifier_modulus_variant_differs():
    ids = range(400)
    diff = [i for i in ids if shard_loop(i) != shard_loop(i, modulus=True)]
    # the two rules coincide only by accident — a large fraction of ids
    # land in different shards, so the range pin is discriminating
    assert len(diff) > 300, len(diff)


def test_falsifier_truncated_threshold_digits_differ():
    # a 2-hex-digit threshold space (256 buckets) is a plausible
    # mis-read of the rule; with 8 shards the boundaries land on exact
    # multiples of 32 in that space, so most ids still agree — but ids
    # whose 16-bit prefix falls between a coarse and a fine boundary
    # flip shards. Deterministic given md5.
    def shard_2hex(doc_id: int) -> int:
        prefix = digest_loop(doc_id)[:2]
        bounds = [format(int(round((i + 1) / N_SHARDS * 256)), "02x")
                  for i in range(N_SHARDS - 1)]
        for i, bound in enumerate(bounds):
            if prefix < bound:
                return i
        return N_SHARDS - 1

    # with N a power of two the 2-hex rule happens to agree everywhere
    # (boundaries are exact in both spaces) — so pin the DISAGREEMENT on
    # a non-power-of-two shard count where rounding differs
    def shard_k(doc_id: int, n: int, digits: int) -> int:
        prefix = digest_loop(doc_id)[:digits]
        bounds = [
            format(int(round((i + 1) / n * 16**digits)), f"0{digits}x")
            for i in range(n - 1)
        ]
        for i, bound in enumerate(bounds):
            if prefix < bound:
                return i
        return n - 1

    diff = [i for i in range(4000) if shard_k(i, 6, 4) != shard_k(i, 6, 2)]
    assert diff, "rounding variants should disagree for n=6"
