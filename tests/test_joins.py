"""As-of join tests on hand-built data, cross-checked against pandas
``merge_asof`` (an independent reference implementation)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from kinesis_data_counter_spark.operators.joins import asof_join

UTC = dt.timezone.utc


def _t(minute: int):
    return dt.datetime(2021, 6, 1, 12, minute, tzinfo=UTC)


@pytest.fixture(scope="module")
def frames(spark):
    # key 1: quotes straddle trades incl. an exact-tie timestamp
    # key 2: trade before any quote (no backward match)
    # key 3: trades but no quotes at all
    trades = spark.createDataFrame(
        [
            (1, _t(5), "T1"),
            (1, _t(10), "T2"),  # tie with quote at minute 10
            (2, _t(1), "T3"),
            (2, _t(30), "T4"),
            (3, _t(7), "T5"),
        ],
        "key int, ts timestamp, trade_id string",
    )
    quotes = spark.createDataFrame(
        [
            (1, _t(4), 100.0),
            (1, _t(10), 101.0),
            (1, _t(20), 102.0),
            (2, _t(2), 200.0),
        ],
        "key int, qts timestamp, px double",
    )
    return trades, quotes


def _spark_result(trades, quotes, direction):
    out = asof_join(
        trades, quotes,
        left_on="key", right_on="key",
        left_time="ts", right_time="qts",
        direction=direction,
    )
    return (
        out.select("trade_id", "r_qts", "r_px")
        .toPandas()
        .sort_values("trade_id")
        .reset_index(drop=True)
    )


def _pandas_result(trades, quotes, direction):
    tp = trades.toPandas().sort_values("ts")
    qp = quotes.toPandas().sort_values("qts")
    m = pd.merge_asof(
        tp, qp, left_on="ts", right_on="qts", by="key", direction=direction
    )
    return (
        m.rename(columns={"qts": "r_qts", "px": "r_px"})[
            ["trade_id", "r_qts", "r_px"]
        ]
        .sort_values("trade_id")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, frames, direction):
    trades, quotes = frames
    got = _spark_result(trades, quotes, direction)
    want = _pandas_result(trades, quotes, direction)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_tie_matches(spark, frames):
    trades, quotes = frames
    got = _spark_result(trades, quotes, "backward").set_index("trade_id")
    # exact-tie timestamp matches the right row at the same instant
    assert got.loc["T2", "r_px"] == 101.0
    # no quote at or before -> nulls, row still present (left join)
    assert pd.isna(got.loc["T3", "r_px"])
    assert pd.isna(got.loc["T5", "r_px"])


def test_asof_rejects_bad_direction(spark, frames):
    trades, quotes = frames
    with pytest.raises(ValueError):
        asof_join(
            trades, quotes,
            left_on="key", right_on="key",
            left_time="ts", right_time="qts",
            direction="nearest",
        )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_random_bulk_matches_pandas(spark, direction):
    # seeded bulk-random check: many keys, clustered + missing matches,
    # unique (key, time) on the right so both engines are deterministic
    import numpy as np

    rng = np.random.default_rng(42)
    base = dt.datetime(2022, 1, 1, tzinfo=UTC)
    n_l, n_keys = 2000, 40
    lk = rng.integers(0, n_keys, n_l)
    lt = [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 50_000, n_l)]
    left = spark.createDataFrame(
        [(int(k), t, i) for i, (k, t) in enumerate(zip(lk, lt))],
        "key int, ts timestamp, lid long",
    )
    # keys 30+ have no right rows at all; unique (key, sec) pairs
    pairs = {(int(k), int(s)) for k, s in
             zip(rng.integers(0, 30, 1500), rng.integers(0, 50_000, 1500))}
    right = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=s), float(k * 100000 + s))
         for k, s in sorted(pairs)],
        "key int, qts timestamp, px double",
    )
    got = (
        asof_join(left, right, left_on="key", right_on="key",
                  left_time="ts", right_time="qts", direction=direction)
        .select("lid", "r_qts", "r_px")
        .toPandas().sort_values("lid").reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.toPandas().sort_values("ts"),
        right.toPandas().sort_values("qts"),
        left_on="ts", right_on="qts", by="key", direction=direction,
    ).rename(columns={"qts": "r_qts", "px": "r_px"})[["lid", "r_qts", "r_px"]]
    want = want.sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_skew_split_matches_unsplit(spark, direction):
    # hot-key regime: one key carries ~50% of both sides. The split path
    # (operators/joins.py:_asof_split) must return exactly what the
    # single-window path returns, across several bucket widths including
    # one so narrow that most buckets need the cross-bucket carry.
    import numpy as np

    rng = np.random.default_rng(7)
    base = dt.datetime(2022, 1, 1, tzinfo=UTC)
    n = 3000
    # 50% of left rows on key 0, remainder spread over 29 keys
    lk = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 30, n))
    lt = rng.integers(0, 50_000, n)
    left = spark.createDataFrame(
        [(int(k), base + dt.timedelta(seconds=int(s)), i)
         for i, (k, s) in enumerate(zip(lk, lt))],
        "key int, ts timestamp, lid long",
    )
    rk = np.where(rng.random(1200) < 0.5, 0, rng.integers(1, 25, 1200))
    rs = rng.integers(0, 50_000, 1200)
    pairs = sorted({(int(k), int(s)) for k, s in zip(rk, rs)})
    right = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=s), float(k * 100000 + s))
         for k, s in pairs],
        "key int, qts timestamp, px double",
    )

    def run(**kw):
        return (
            asof_join(left, right, left_on="key", right_on="key",
                      left_time="ts", right_time="qts",
                      direction=direction, **kw)
            .select("lid", "r_qts", "r_px")
            .toPandas().sort_values("lid").reset_index(drop=True)
        )

    want = run()
    for split in (100_000.0, 5_000.0, 97.0):  # 1 bucket / ~10 / ~500
        got = run(split_every=split)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_split_plan_is_bucketed(spark):
    # the split path must window per (key, bucket) — never per key alone —
    # so the hottest key's rows are spread across span/split_every tasks
    left = spark.createDataFrame([(1, _t(5), "T1")], "key int, ts timestamp, trade_id string")
    right = spark.createDataFrame([(1, _t(4), 1.0)], "key int, qts timestamp, px double")
    plan = asof_join(
        left, right, left_on="key", right_on="key",
        left_time="ts", right_time="qts", split_every=60.0,
    )._jdf.queryExecution().executedPlan().toString()
    # pass-1 window partitions on the bucket column
    assert "__bkt" in plan
    first_window = plan[plan.index("Window"):]
    assert "__bkt" in first_window.split("\n")[0]


def test_asof_rejects_bad_split(spark):
    left = spark.createDataFrame([(1, _t(5), "x")], "key int, ts timestamp, v string")
    with pytest.raises(ValueError):
        asof_join(left, left, left_on="key", right_on="key",
                  left_time="ts", right_time="ts", split_every=0)


def test_range_join_binned_containment_exact(spark):
    from kinesis_data_counter_spark.operators.joins import range_join_binned

    points = spark.createDataFrame(
        [(1, 50), (1, 150), (1, 250), (2, 150), (1, 1000)],
        "user_id long, ts_ms long",
    )
    intervals = spark.createDataFrame(
        [(1, 100, 300, "a"), (2, 0, 200, "b"), (1, 400, 500, "c")],
        "user_id long, s long, e long, tag string",
    )
    got = {
        (r["user_id"], r["ts_ms"], r["tag"])
        for r in range_join_binned(
            points, intervals, "ts_ms", "s", "e", keys=("user_id",), bin_width=100
        ).collect()
    }
    # brute-force oracle
    want = {
        (pu, pt, tag)
        for pu, pt in [(1, 50), (1, 150), (1, 250), (2, 150), (1, 1000)]
        for iu, s, e, tag in [(1, 100, 300, "a"), (2, 0, 200, "b"), (1, 400, 500, "c")]
        if pu == iu and s <= pt <= e
    }
    assert got == want
    # boundary points (ts == start, ts == end) included
    assert (1, 250, "a") in got


def test_range_join_binned_boundaries_and_bin_spans(spark):
    from kinesis_data_counter_spark.operators.joins import range_join_binned

    # interval spanning many bins still matches a point in its middle bin
    points = spark.createDataFrame([(1, 5000)], "k long, t long")
    intervals = spark.createDataFrame([(1, 0, 10000)], "k long, s long, e long")
    out = range_join_binned(points, intervals, "t", "s", "e", keys=("k",), bin_width=7)
    assert out.count() == 1
    # exact-boundary point at interval end
    pts2 = spark.createDataFrame([(1, 10000), (1, 10001)], "k long, t long")
    out2 = range_join_binned(pts2, intervals, "t", "s", "e", keys=("k",), bin_width=7)
    assert [r["t"] for r in out2.collect()] == [10000]


def test_range_join_binned_no_keys(spark):
    from kinesis_data_counter_spark.operators.joins import range_join_binned

    points = spark.createDataFrame([(10,), (20,), (35,)], "t long")
    intervals = spark.createDataFrame([(15, 30, "x")], "s long, e long, tag string")
    got = sorted(
        r["t"]
        for r in range_join_binned(points, intervals, "t", "s", "e", bin_width=8).collect()
    )
    assert got == [20]


def test_range_join_binned_random_bulk_matches_bruteforce(spark):
    # seeded bulk-random check across several bin widths, including widths
    # much smaller and much larger than typical interval length
    import numpy as np

    rng = np.random.default_rng(1234)
    n_pts, n_iv, n_keys = 3000, 400, 12
    pk = rng.integers(0, n_keys, n_pts)
    pt = rng.integers(0, 100_000, n_pts)
    ik = rng.integers(0, n_keys, n_iv)
    s = rng.integers(0, 100_000, n_iv)
    ln = rng.integers(0, 5_000, n_iv)
    points = spark.createDataFrame(
        [(int(k), int(t), i) for i, (k, t) in enumerate(zip(pk, pt))],
        "k long, t long, pid long",
    )
    intervals = spark.createDataFrame(
        [(int(k), int(a), int(a + d), j) for j, (k, a, d) in enumerate(zip(ik, s, ln))],
        "k long, s long, e long, iid long",
    )
    want = {
        (i, j)
        for i, (kp, tp) in enumerate(zip(pk, pt))
        for j, (ki, a, d) in enumerate(zip(ik, s, ln))
        if kp == ki and a <= tp <= a + d
    }
    from kinesis_data_counter_spark.operators.joins import range_join_binned

    for bw in (100, 2_500, 50_000):
        got = {
            (r["pid"], r["iid"])
            for r in range_join_binned(
                points, intervals, "t", "s", "e", keys=("k",), bin_width=bw
            ).collect()
        }
        assert got == want, f"bin_width={bw}: {len(got)} vs {len(want)}"


# ---------------------------------------------------------------------------
# bloom_prefilter_join
# ---------------------------------------------------------------------------

def test_bloom_prefilter_join_equals_plain_join(spark):
    import random

    rng = random.Random(5)
    fact = spark.createDataFrame(
        [(rng.randint(0, 999), i) for i in range(5000)], "k long, fid long"
    )
    # selective dim: 40 keys, some outside the fact domain
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in rng.sample(range(0, 1200), 40)], "dk long, payload string"
    )
    from kinesis_data_counter_spark.operators.joins import bloom_prefilter_join

    want = sorted(
        (r["fid"], r["payload"])
        for r in fact.join(dim, fact.k == dim.dk).collect()
    )
    for nh in (1, 2, 3):
        got = sorted(
            (r["fid"], r["payload"])
            for r in bloom_prefilter_join(
                fact, dim, "k", "dk", num_buckets=1 << 12, num_hashes=nh
            ).collect()
        )
        assert got == want, f"num_hashes={nh}"


def test_bloom_prefilter_join_tiny_bucket_space_still_exact(spark):
    # num_buckets=4 makes the prefilter pass nearly everything — the exact
    # join must still remove every collision
    fact = spark.createDataFrame([(i % 50, i) for i in range(500)], "k long, fid long")
    dim = spark.createDataFrame([(3, "a"), (47, "b"), (999, "c")], "dk long, payload string")
    from kinesis_data_counter_spark.operators.joins import bloom_prefilter_join

    got = sorted(
        (r["fid"], r["payload"])
        for r in bloom_prefilter_join(fact, dim, "k", "dk", num_buckets=4).collect()
    )
    want = sorted((r["fid"], r["payload"]) for r in fact.join(dim, fact.k == dim.dk).collect())
    assert got == want and len(want) == 20


def test_bloom_prefilter_join_mismatched_key_types_no_false_negatives(spark):
    # xxhash64 is type-sensitive: hashing an int fact key and a bigint dim
    # key directly would never share buckets and would silently prune every
    # match the coercing equi-join would have kept. The prefilter must hash
    # both sides through a common type so the result equals the plain join.
    from kinesis_data_counter_spark.operators.joins import bloom_prefilter_join

    fact = spark.createDataFrame([(i % 7, i) for i in range(200)], "k int, fid long")
    for dim_schema in ("dk long, payload string", "dk double, payload string"):
        vals = [(3.0, "a"), (5.0, "b")] if "double" in dim_schema else [(3, "a"), (5, "b")]
        dim = spark.createDataFrame(vals, dim_schema)
        want = sorted(
            (r["fid"], r["payload"]) for r in fact.join(dim, fact.k == dim.dk).collect()
        )
        got = sorted(
            (r["fid"], r["payload"])
            for r in bloom_prefilter_join(fact, dim, "k", "dk").collect()
        )
        assert got == want and len(want) > 0, dim_schema
    # string-vs-int mismatch goes through the string path
    dim = spark.createDataFrame([("3", "a")], "dk string, payload string")
    got = sorted(
        (r["fid"], r["payload"])
        for r in bloom_prefilter_join(fact, dim, "k", "dk").collect()
    )
    want = sorted(
        (r["fid"], r["payload"]) for r in fact.join(dim, fact.k == dim.dk).collect()
    )
    assert got == want and len(want) > 0


def test_bloom_prefilter_join_decimal_keys_no_false_negatives(spark):
    # ADVICE r4: decimal(p,s) vs bigint fell into the string branch and
    # hashed '7.00' vs '7' differently — a forbidden false negative. The
    # decimal↔numeric pair must hash through double like the join coerces.
    from pyspark.sql import functions as F

    from kinesis_data_counter_spark.operators.joins import bloom_prefilter_join

    fact = spark.createDataFrame([(i % 7, i) for i in range(200)], "k bigint, fid long")
    dim = spark.createDataFrame([(3, "a"), (5, "b")], "dk bigint, payload string").select(
        F.col("dk").cast("decimal(10,2)").alias("dk"), "payload"
    )
    want = sorted(
        (r["fid"], r["payload"]) for r in fact.join(dim, fact.k == dim.dk).collect()
    )
    got = sorted(
        (r["fid"], r["payload"])
        for r in bloom_prefilter_join(fact, dim, "k", "dk").collect()
    )
    assert got == want and len(want) > 0


def test_bloom_prefilter_join_unhandled_type_pair_skips_prefilter(spark):
    # date↔timestamp is outside the handled coercion set: a wrong common
    # type would false-negative, so the operator must fall back to the
    # plain (always-correct) join and still return every match.
    import datetime

    from kinesis_data_counter_spark.operators.joins import bloom_prefilter_join

    d = datetime.date(2024, 3, 1)
    fact = spark.createDataFrame(
        [(d, 1), (datetime.date(2024, 3, 2), 2)], "k date, fid long"
    )
    dim = spark.createDataFrame(
        [(datetime.datetime(2024, 3, 1, 0, 0, 0), "x")], "dk timestamp, payload string"
    )
    want = sorted(
        (r["fid"], r["payload"]) for r in fact.join(dim, fact.k == dim.dk).collect()
    )
    got = sorted(
        (r["fid"], r["payload"])
        for r in bloom_prefilter_join(fact, dim, "k", "dk").collect()
    )
    assert got == want


def test_bloom_prefilter_join_null_fact_keys_dropped(spark):
    # NULL fact keys can never match; the hash probe must not crash on them
    fact = spark.createDataFrame([(None, 1), (2, 2)], "k long, fid long")
    dim = spark.createDataFrame([(2, "x")], "dk long, payload string")
    from kinesis_data_counter_spark.operators.joins import bloom_prefilter_join

    got = [(r["fid"], r["payload"]) for r in bloom_prefilter_join(fact, dim, "k", "dk").collect()]
    assert got == [(2, "x")]


# ---------------------------------------------------------------------------
# round-4: interval_overlap_join
# ---------------------------------------------------------------------------

def test_interval_overlap_join_exact_vs_nested_loop(spark):
    import random

    from kinesis_data_counter_spark.operators.joins import interval_overlap_join

    rng = random.Random(8)

    def gen(n, tag):
        rows = []
        for i in range(n):
            k = rng.randint(0, 3)
            s = rng.randint(0, 500)
            rows.append((i, k, s, s + rng.randint(0, 80), tag))
        return rows
    a = spark.createDataFrame(gen(60, "a"), "lid long, k long, ls long, le long, tag string")
    b = spark.createDataFrame(gen(60, "b"), "rid long, k long, rs long, re long, tag2 string")
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            a, b, ["k"], "ls", "le", "rs", "re", bin_width=50
        ).collect()
    )
    want = sorted(
        (r["lid"], r["rid"])
        for r in a.join(
            b, (a.k == b.k) & (a.ls <= b.re) & (b.rs <= a.le)
        ).collect()
    )
    assert got == want and len(want) > 50
    # exactly-once without a distinct: no duplicate pairs possible
    assert len(got) == len(set(got))


def test_interval_overlap_join_bin_width_invariance(spark):
    from kinesis_data_counter_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 0, 0, 100), (2, 0, 150, 160), (3, 0, 95, 105)],
        "lid long, k long, ls long, le long",
    )
    b = spark.createDataFrame(
        [(10, 0, 90, 155), (11, 0, 200, 300)],
        "rid long, k long, rs long, re long",
    )
    want = [(1, 10), (2, 10), (3, 10)]
    for bw in (7, 50, 1000):
        got = sorted(
            (r["lid"], r["rid"])
            for r in interval_overlap_join(
                a, b, ["k"], "ls", "le", "rs", "re", bin_width=bw
            ).collect()
        )
        assert got == want, bw
