"""Third-engine pin for gap-based sessionization (VERDICT r8 task 3 model).

sessionize's Spark/DuckDB twins share the lag-gap → cumulative-sum mental
model; this file pins the operator against a structurally INDEPENDENT
loop-style reimplementation (a sequential scan per user, the way an
application server would assign sessions) on randomized event streams,
plus hand-derived boundary vectors.

The one free semantic choice is the gap boundary: a new session starts
when the inter-event gap EXCEEDS gap_ms (strict >) — an event arriving at
exactly gap_ms after its predecessor stays in the session. Falsifier: the
>=-boundary variant splits a crafted exact-gap stream differently,
proving the differential discriminates the boundary defect. (This is also
why the operator complements session_window, whose engine semantics are
strict < on the padded window end.)
"""

from __future__ import annotations

import datetime
import random

import pytest

from kinesis_data_counter_spark.operators.windows import sessionize

UTC = datetime.timezone.utc


def _sessions_loop(events_ms, gap_ms, strict=True):
    """Independent sequential sessionizer: events_ms sorted millis for ONE
    key → list of (start_ms, end_ms, n_events)."""
    out = []
    for t in sorted(events_ms):
        gap = None if not out else t - out[-1][1]
        new = gap is None or (gap > gap_ms if strict else gap >= gap_ms)
        if new:
            out.append([t, t, 1])
        else:
            out[-1][1] = t
            out[-1][2] += 1
    return [tuple(s) for s in out]


def _spark_sessions(spark, by_user, gap_ms):
    rows = [
        (u, datetime.datetime.fromtimestamp(ms / 1000.0, tz=UTC))
        for u, times in by_user.items()
        for ms in times
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = sessionize(df, gap_ms=gap_ms).collect()
    by = {}
    for r in got:
        by.setdefault(r["user_id"], []).append(
            (r["session_id"], r["session_start"], r["session_end"], r["n_events"])
        )
    return {
        u: [(s, e, n) for _, s, e, n in sorted(v)] for u, v in by.items()
    }


def test_random_streams_match_sequential_loop(spark):
    rng = random.Random(811)
    by_user = {}
    for u in range(12):
        t, times = rng.randrange(0, 10**6), []
        for _ in range(rng.randrange(1, 60)):
            times.append(t)
            t += rng.randrange(1, 120_000)  # gaps straddle the 30s..90s marks
        by_user["u%d" % u] = times
    gap = 60_000
    got = _spark_sessions(spark, by_user, gap)
    for u, times in by_user.items():
        assert got[u] == _sessions_loop(times, gap), u


def test_exact_gap_boundary_stays_in_session(spark):
    # hand-derived: events at 0, gap, 2*gap, then 2*gap + gap + 1 —
    # the first three chain (gap == gap_ms is NOT a break), the last breaks.
    gap = 10_000
    times = [0, gap, 2 * gap, 3 * gap + 1]
    got = _spark_sessions(spark, {"a": times}, gap)
    assert got["a"] == [(0, 2 * gap, 3), (3 * gap + 1, 3 * gap + 1, 1)]


def test_falsifier_gte_boundary_differs(spark):
    # the pin CAN fail: the >= variant splits the exact-gap chain into
    # three singletons + one, so a boundary defect in the lag-gap predicate
    # would surface on this vector.
    gap = 10_000
    times = [0, gap, 2 * gap, 3 * gap + 1]
    strict = _sessions_loop(times, gap, strict=True)
    gte = _sessions_loop(times, gap, strict=False)
    assert strict != gte
    assert len(strict) == 2 and len(gte) == 4
    assert _spark_sessions(spark, {"a": times}, gap)["a"] == strict
