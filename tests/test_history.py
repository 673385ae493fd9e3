"""Unit tests for operators/history.py (SCD2 intervals, transition counts)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kinesis_data_counter_spark.operators import history as HS


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2021, 12, 1, 11, minute)


def _log(spark):
    # user 1: a a b a  (runs: a, b, a) — user 2: c (single open run)
    rows = [
        (1, 1, _ts(0), "a"),
        (2, 1, _ts(1), "a"),
        (3, 1, _ts(2), "b"),
        (4, 1, _ts(3), "a"),
        (5, 2, _ts(0), "c"),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")


def test_scd2_collapses_runs_and_closes_intervals(spark):
    out = HS.scd2_intervals(_log(spark)).orderBy("key", "valid_from").collect()
    assert [(r.key, r.state) for r in out] == [(1, "a"), (1, "b"), (1, "a"), (2, "c")]
    u1 = [r for r in out if r.key == 1]
    # each interval closes at the next run's start
    assert u1[0].valid_to == u1[1].valid_from
    assert u1[1].valid_to == u1[2].valid_from
    assert u1[2].valid_to is None and u1[2].is_current
    assert not u1[0].is_current and not u1[1].is_current
    # the run-collapse means the duplicate leading 'a' produced ONE interval
    assert u1[0].valid_from == int(_ts(0).replace(tzinfo=dt.timezone.utc).timestamp() * 1000)


def test_scd2_tie_break_is_deterministic(spark):
    # two events share a timestamp; event_id orders them
    rows = [(2, 1, _ts(0), "b"), (1, 1, _ts(0), "a")]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    out = HS.scd2_intervals(df).orderBy("valid_from", "state").collect()
    assert [r.state for r in out] == ["a", "b"]
    assert out[1].is_current


def test_transition_counts_and_probabilities(spark):
    out = {
        (r.from_state, r.to_state): (r.n, r.p)
        for r in HS.transition_counts(_log(spark)).collect()
    }
    # user 1 contributes a→a, a→b, b→a; user 2 has no transitions
    assert out == {
        ("a", "a"): (1, 0.5),
        ("a", "b"): (1, 0.5),
        ("b", "a"): (1, 1.0),
    }


def test_transitions_never_cross_users(spark):
    rows = [(1, 1, _ts(0), "a"), (2, 2, _ts(1), "b")]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    assert HS.transition_counts(df).count() == 0


def test_snapshot_diff_classifies_all_four_ways(spark):
    from kinesis_data_counter_spark.operators.history import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (4, None, "D")],
        "k long, price double, status string",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 price-changed, 4 NULL→NULL unchanged (null-safe),
        # 5 added; 3 removed
        [(1, 10.0, "A"), (2, 21.0, "B"), (4, None, "D"), (5, 50.0, "E")],
        "k long, price double, status string",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, "k", ["price", "status"]).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",
        5: "added",
    }


def test_snapshot_diff_null_to_value_is_changed(spark):
    from kinesis_data_counter_spark.operators.history import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "x")], "k long, v string")
    got = snapshot_diff(old, new, "k", ["v"]).collect()
    assert [(r["k"], r["change_type"]) for r in got] == [(1, "changed")]
