"""Third-engine pin for the binned interval joins (VERDICT r8 task 3
model).

range_join_binned / interval_overlap_join and their DuckDB twins share the
bin-replication mental model; this file pins both against the one
reference that cannot get binning wrong because it does none: a
brute-force nested loop over random keyed intervals, with interval
lengths, gaps, and points deliberately straddling bin boundaries
(multiples of the bin width, off-by-one on both sides).

The free semantic choices discriminated by falsifiers:
- boundary inclusivity: both operators define ends INCLUSIVE
  (point BETWEEN start AND end; overlap ls <= re AND rs <= le). The
  exclusive-end variants drop exactly the touching pairs in the crafted
  vectors.
- exactly-once emission: the overlap join's first-shared-bin filter must
  emit each overlapping pair ONCE even when the pair shares many bins —
  a naive binned join without the filter duplicates; the brute force
  counts multiplicity, so duplication (or the opposite defect, a filter
  that drops a pair whose overlap edge sits on a bin boundary) surfaces.
"""

from __future__ import annotations

import collections
import random

import pytest

from kinesis_data_counter_spark.operators.joins import (
    interval_overlap_join,
    range_join_binned,
)

BW = 100  # small bin width so random data exercises many-bin replication


def _random_intervals(rng, n, id0=0):
    rows = []
    for i in range(n):
        k = "k%d" % rng.randrange(3)
        s = rng.randrange(0, 2000)
        # lengths from sub-bin to many-bin, ends often ON bin boundaries
        ln = rng.choice([0, 1, BW - 1, BW, BW + 1, 3 * BW, rng.randrange(0, 500)])
        rows.append((id0 + i, k, s, s + ln))
    return rows


def test_range_join_matches_nested_loop(spark):
    rng = random.Random(314)
    ivs = _random_intervals(rng, 60)
    pts = [
        (i, "k%d" % rng.randrange(3),
         rng.choice([rng.randrange(0, 2600), BW * rng.randrange(0, 26)]))
        for i in range(120)
    ]
    expected = {
        (pid, iid)
        for pid, pk, pv in pts
        for iid, ik, s, e in ivs
        if pk == ik and s <= pv <= e
    }
    p = spark.createDataFrame(pts, "pid long, k string, v long")
    iv = spark.createDataFrame(ivs, "iid long, k string, s long, e long")
    got = [
        (r["pid"], r["iid"])
        for r in range_join_binned(p, iv, "v", "s", "e", keys=["k"],
                                   bin_width=BW).collect()
    ]
    assert len(got) == len(set(got))  # exactly-once
    assert set(got) == expected


def test_overlap_join_matches_nested_loop_exactly_once(spark):
    rng = random.Random(315)
    lhs = _random_intervals(rng, 50)
    rhs = _random_intervals(rng, 50, id0=1000)
    expected = collections.Counter(
        (lid, rid)
        for lid, lk, ls, le in lhs
        for rid, rk, rs, re in rhs
        if lk == rk and ls <= re and rs <= le
    )
    l = spark.createDataFrame(lhs, "lid long, k string, ls long, le long")
    r = spark.createDataFrame(rhs, "rid long, k string, rs long, re long")
    got = collections.Counter(
        (row["lid"], row["rid"])
        for row in interval_overlap_join(
            l, r, ["k"], "ls", "le", "rs", "re", bin_width=BW
        ).collect()
    )
    assert got == expected  # same pairs AND multiplicity exactly 1
    assert max(expected.values()) == 1


def test_falsifier_exclusive_end_differs(spark):
    # point exactly ON an interval end, and two intervals TOUCHING at one
    # instant: inclusive semantics match both; exclusive-end drops both.
    pts = [(1, "a", 200)]
    ivs = [(10, "a", 100, 200)]
    inclusive = {(p, i) for p, pk, pv in pts for i, ik, s, e in ivs
                 if pk == ik and s <= pv <= e}
    exclusive = {(p, i) for p, pk, pv in pts for i, ik, s, e in ivs
                 if pk == ik and s <= pv < e}
    assert inclusive == {(1, 10)} and exclusive == set()
    p = spark.createDataFrame(pts, "pid long, k string, v long")
    iv = spark.createDataFrame(ivs, "iid long, k string, s long, e long")
    got = range_join_binned(p, iv, "v", "s", "e", keys=["k"], bin_width=BW)
    assert [(r["pid"], r["iid"]) for r in got.collect()] == [(1, 10)]

    lhs = [(1, "a", 0, 300)]
    rhs = [(2, "a", 300, 500)]  # touches at t=300, which is also a bin edge
    l = spark.createDataFrame(lhs, "lid long, k string, ls long, le long")
    r = spark.createDataFrame(rhs, "rid long, k string, rs long, re long")
    pairs = interval_overlap_join(
        l, r, ["k"], "ls", "le", "rs", "re", bin_width=BW
    ).collect()
    assert [(x["lid"], x["rid"]) for x in pairs] == [(1, 2)]


def test_falsifier_unfiltered_binned_join_duplicates(spark):
    # two intervals sharing FOUR bins: the naive binned equi-join emits the
    # pair 4x; the first-shared-bin rule emits it once. The brute-force
    # multiplicity check in the main pin is what catches a broken filter.
    lhs = [(1, "a", 0, 399)]
    rhs = [(2, "a", 0, 399)]
    l = spark.createDataFrame(lhs, "lid long, k string, ls long, le long")
    r = spark.createDataFrame(rhs, "rid long, k string, rs long, re long")
    import pyspark.sql.functions as F

    lf = l.withColumn("__bin", F.explode(F.sequence(
        F.floor(F.col("ls") / BW), F.floor(F.col("le") / BW))))
    rt = r.withColumn("__bin", F.explode(F.sequence(
        F.floor(F.col("rs") / BW), F.floor(F.col("re") / BW))))
    naive = lf.join(rt, ["k", "__bin"]).where(
        (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
    )
    assert naive.count() == 4  # the defect the filter exists to prevent
    fixed = interval_overlap_join(l, r, ["k"], "ls", "le", "rs", "re",
                                  bin_width=BW)
    assert fixed.count() == 1
