"""Sliding/session-window and salted-aggregation tests on hand-built data."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kinesis_data_counter_spark.operators.windows import (
    salted_count,
    session_count,
    sliding_count,
)

UTC = dt.timezone.utc


def _ts(minute: int, second: int = 0):
    return dt.datetime(2021, 12, 1, 11, minute, second, tzinfo=UTC)


@pytest.fixture(scope="module")
def small_events(spark):
    rows = [
        (1, _ts(0), 7, "a"),
        (2, _ts(10), 7, "a"),
        (3, _ts(20), 7, "b"),
        (4, _ts(55), 8, "a"),  # second half-hour
        (5, _ts(59, 59), 8, "b"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_sliding_count_overlap(spark, small_events):
    out = {
        (r.window_start, r.window_end): r.value
        for r in sliding_count(small_events, size="1 hour", slide="30 minutes").collect()
    }
    base = int(_ts(0).timestamp() * 1000)
    h, hh = 3_600_000, 1_800_000
    # events at :00-:20 land in windows [10:30,11:30) and [11:00,12:00);
    # events at :55/:59 land in [11:00,12:00) and [11:30,12:30)
    assert out[(base - hh, base - hh + h)] == 3
    assert out[(base, base + h)] == 5
    assert out[(base + hh, base + hh + h)] == 2
    assert len(out) == 3


def test_session_count_gap_semantics(spark):
    rows = [
        (1, _ts(0), 1),
        (2, _ts(29, 59), 1),   # < 30m after previous → same session
        (3, _ts(59, 59), 1),   # < 30m after #2 → still same session
        (4, _ts(0), 2),
        (5, _ts(30), 2),       # exactly the gap after #4 → still SAME session
        (6, dt.datetime(2021, 12, 1, 12, 0, 1, tzinfo=UTC), 2),  # > gap → NEW
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = session_count(df, gap="30 minutes").orderBy("user_id", "session_start").collect()
    assert [(r.user_id, r.n_events) for r in out] == [(1, 3), (2, 2), (2, 1)]
    s1 = out[0]
    assert s1.session_start == int(_ts(0).timestamp() * 1000)
    # session ends gap after the LAST event
    assert s1.session_end == int(_ts(59, 59).timestamp() * 1000) + 1_800_000


def test_salted_count_equals_plain_groupby(spark, small_events):
    salted = salted_count(
        small_events, group_col="event_type", window="1 hour", salt_buckets=4
    )
    plain = (
        small_events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("value"))
        .select(
            F.unix_millis("window.start").alias("window_start"),
            F.unix_millis("window.end").alias("window_end"),
            "event_type",
            "value",
        )
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_count_spreads_hot_key(spark):
    # one pathologically hot key: every salt bucket must receive rows
    rows = [(i, _ts(0, 0), 1, "hot") for i in range(200)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    salt = F.pmod(F.xxhash64(F.col("event_id").cast("string"), F.lit(42)), F.lit(8))
    n_buckets = df.select(salt.alias("s")).distinct().count()
    assert n_buckets == 8
    out = salted_count(df, group_col="event_type", window="1 hour", salt_buckets=8)
    assert [(r.event_type, r.value) for r in out.collect()] == [("hot", 200)]


def test_stateful_running_counts_match_batch(spark, sf_dir):
    from kinesis_data_counter_spark.session import load_tables
    from kinesis_data_counter_spark.streaming.stateful import run_stateful_counts_once

    got = {
        r.user_id: r.n_events
        for r in run_stateful_counts_once(spark, f"{sf_dir}/events.parquet").collect()
    }
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    want = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_rolling_daily_count_range_frame(spark):
    from kinesis_data_counter_spark.operators.windows import rolling_daily_count

    rows = [
        ("u1", "2024-01-01 10:00:00"),
        ("u1", "2024-01-01 11:00:00"),
        ("u1", "2024-01-05 09:00:00"),
        ("u1", "2024-01-09 09:00:00"),  # day 1 falls out of the 7-day frame
        ("u2", "2024-01-03 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {
        (r.user_id, str(r.day)[:10]): (r.n_events, r.rolling_7d)
        for r in rolling_daily_count(df, key_col="user_id").collect()
    }
    assert out[("u1", "2024-01-01")] == (2, 2)
    assert out[("u1", "2024-01-05")] == (1, 3)   # Jan 1+5 within 7 days
    assert out[("u1", "2024-01-09")] == (1, 2)   # Jan 1 aged out, Jan 5 kept
    assert out[("u2", "2024-01-03")] == (1, 1)


def test_sessionize_gap_boundary(spark):
    from kinesis_data_counter_spark.operators.windows import sessionize

    base = "2024-01-01 00:"
    rows = [
        ("u1", base + "00:00"),
        ("u1", base + "30:00"),   # exactly gap → same session (strict >)
        ("u1", "2024-01-01 01:00:01"),  # 30m01s after previous → new session
        ("u2", base + "00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = sessionize(df, key_col="user_id").collect()
    u1 = sorted([r for r in out if r.user_id == "u1"], key=lambda r: r.session_id)
    assert len(u1) == 2
    assert u1[0].n_events == 2 and u1[1].n_events == 1
    # session bounds are event timestamps, no trailing gap padding
    assert u1[0].session_end - u1[0].session_start == 30 * 60 * 1000
    assert len([r for r in out if r.user_id == "u2"]) == 1


def test_sessionize_bulk_random_properties(spark):
    # seeded random stream; verify the session invariants structurally:
    # (a) within a session, consecutive gaps are <= gap_ms
    # (b) between consecutive sessions of one user, the gap is > gap_ms
    # (c) every event lands in exactly one session (counts add up)
    import numpy as np
    import pandas as pd

    from kinesis_data_counter_spark.operators.windows import sessionize

    rng = np.random.default_rng(1234)
    n = 4000
    pdf = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n),
            "ts": pd.to_datetime(
                rng.integers(0, 3 * 24 * 3600, n), unit="s", origin="2024-01-01"
            ),
        }
    )
    df = spark.createDataFrame(pdf)
    gap_ms = 30 * 60 * 1000
    out = sessionize(df, key_col="user_id", ts_col="ts", gap_ms=gap_ms).toPandas()

    assert out["n_events"].sum() == n  # (c)

    # recompute per-user gap structure in pandas and compare boundaries
    pdf = pdf.sort_values(["user_id", "ts"]).reset_index(drop=True)
    pdf["ms"] = pdf["ts"].astype("int64") // 10**6
    for uid, g in pdf.groupby("user_id"):
        gaps = g["ms"].diff()
        expected_sessions = int((gaps > gap_ms).sum()) + 1
        got = out[out.user_id == uid].sort_values("session_start")
        assert len(got) == expected_sessions, uid  # (a)+(b) combined
        # session bounds nest: starts strictly increase and each start is
        # > previous end + gap
        starts = got["session_start"].to_numpy()
        ends = got["session_end"].to_numpy()
        assert (ends >= starts).all()
        assert ((starts[1:] - ends[:-1]) > gap_ms).all()  # (b)


def test_global_ntile_matches_window_ntile_exactly(spark):
    # the scalable formulation must be bit-identical to ntile's bucket
    # membership across remainder cases and the n < tiles degenerate
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from kinesis_data_counter_spark.operators.windows import global_ntile

    rng = random.Random(3)
    for n, tiles in [(1000, 4), (7, 4), (3, 4), (101, 3), (250, 7)]:
        rows = [(i, rng.randint(0, 50)) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, metric long").repartition(8)
        want = {
            r["id"]: r["t"]
            for r in df.select(
                "id",
                F.ntile(tiles).over(Window.orderBy("metric", "id")).alias("t"),
            ).collect()
        }
        got = {
            r["id"]: r["tile"]
            for r in global_ntile(
                df, [F.col("metric").asc(), F.col("id").asc()], n_tiles=tiles
            ).collect()
        }
        assert got == want, (n, tiles)


def test_global_ntile_empty_input(spark):
    from pyspark.sql import functions as F

    from kinesis_data_counter_spark.operators.windows import global_ntile

    df = spark.createDataFrame([], "id long, metric long")
    assert global_ntile(df, [F.col("metric"), F.col("id")]).count() == 0
