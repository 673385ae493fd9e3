"""Counter end-to-end tests reproducing the reference's synthetic grid
(counter_test.go:113-199, generator 201-290; see FIXTURES.md §A).

Deterministic stand-in for the reference's random-walk generator: m distinct
user ids, n records spread evenly over the fixed 1-minute window
2021-12-01T11:19:00Z → 11:20:00Z, path="/my_page" for the lower half of
users. Oracles: exact n for counts, m (±5%) for distinct, m/2 (±5%) for the
expr-filtered distinct — the same ε the reference accepts
(counter_test.go:62-66)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kinesis_data_counter_spark.config import CounterSpec
from kinesis_data_counter_spark.operators.counter import (
    build_counter,
    merge_partials,
    partial_counter,
)

WINDOW_START = dt.datetime(2021, 12, 1, 11, 19, 0, tzinfo=dt.timezone.utc)
ARN = "arn:aws:kinesis:ap-northeast-1:111122223333:stream/input-stream"


def access_log(spark, m: int, n: int, shards: int = 1):
    users = [1000 + 3 * i for i in range(m)]  # deterministic walk, step 3
    herf = users[m // 2]
    rows = []
    for i in range(n):
        uid = users[i % m]
        rows.append(
            (
                WINDOW_START + dt.timedelta(seconds=i * 60.0 / n),
                1000 + i,
                uid,
                "/my_page" if uid < herf else "/",
                i % shards,
            )
        )
    return spark.createDataFrame(
        rows, "time timestamp, request_id long, user_id long, path string, shard int"
    )


GRID = [(10, 1000), (100, 2000), (200, 4000)]


@pytest.mark.parametrize("m,n", GRID)
def test_count(spark, m, n):
    df = access_log(spark, m, n)
    spec = CounterSpec(id="request_count", counter_type="count",
                       target_column="request_id", input_stream_arn=ARN).validate()
    rows = build_counter(df, spec, ts_col="time").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.value == n
    assert r.window_start == int(WINDOW_START.timestamp() * 1000)
    assert r.window_end == int(WINDOW_START.timestamp() * 1000) + 60_000
    assert r.counter_id == "request_count"
    assert r.counter_type == "count"
    assert r.event_source_arn == ARN


@pytest.mark.parametrize("m,n", GRID)
def test_approx_distinct(spark, m, n):
    df = access_log(spark, m, n)
    spec = CounterSpec(id="unique_user_count", counter_type="approx_count_distinct",
                       target_column="user_id", input_stream_arn=ARN).validate()
    rows = build_counter(df, spec, ts_col="time").collect()
    assert len(rows) == 1
    assert rows[0].value == pytest.approx(m, rel=0.05)


@pytest.mark.parametrize("m,n", [(100, 2000)])
def test_expr_filtered_distinct(spark, m, n):
    # testdata/target_expr.yaml: distinct of if(string_contains(path,"my_page"), user_id, nil)
    df = access_log(spark, m, n)
    spec = CounterSpec(
        id="unique_user_count", counter_type="approx_count_distinct",
        target_expr='if(string_contains(path,"my_page"), user_id, nil)',
        input_stream_arn=ARN,
    ).validate()
    rows = build_counter(df, spec, ts_col="time").collect()
    assert rows[0].value == pytest.approx(m // 2, rel=0.05)


def test_expr_count_nil_false_rule(spark):
    # count mode: false excluded, 0/"" count (SURVEY.md §2.6.1)
    df = spark.createDataFrame(
        [(WINDOW_START, True), (WINDOW_START, False), (WINDOW_START, None)],
        "time timestamp, flag boolean",
    )
    spec = CounterSpec(id="c", counter_type="count", target_expr="flag",
                       input_stream_arn=ARN).validate()
    assert build_counter(df, spec, ts_col="time").collect()[0].value == 1

    df2 = spark.createDataFrame(
        [(WINDOW_START, 0), (WINDOW_START, 7), (WINDOW_START, None)],
        "time timestamp, v int",
    )
    spec2 = CounterSpec(id="c", counter_type="count", target_expr="v",
                        input_stream_arn=ARN).validate()
    assert build_counter(df2, spec2, ts_col="time").collect()[0].value == 2


def test_jq_output_shape(spark):
    # testdata/jq_expr.yaml reshape
    df = access_log(spark, 10, 100)
    spec = CounterSpec(
        id="unique_user_count", counter_type="approx_count_distinct",
        target_column="user_id", input_stream_arn=ARN,
        jq_expr='{"time":.window_start, "name": "access_log.user_count", "value": .value}',
    ).validate()
    rows = build_counter(df, spec, ts_col="time").collect()
    assert rows[0].asDict() == {
        "time": int(WINDOW_START.timestamp() * 1000),
        "name": "access_log.user_count",
        "value": pytest.approx(10, rel=0.05),
    }


@pytest.mark.parametrize("m,n", [(200, 4000)])
def test_two_level_matches_single_level(spark, m, n):
    # aggregate topology (counter_test.go:69-108): per-shard partials merged
    # across 3 shards must equal the single-level global result
    df = access_log(spark, m, n, shards=3)
    spec = CounterSpec(id="u", counter_type="approx_count_distinct",
                       target_column="user_id", input_stream_arn=ARN).validate()
    partials = partial_counter(df, spec, ts_col="time", shard_col="shard")
    assert partials.count() == 3  # one state row per shard per window
    merged = merge_partials(partials, spec).collect()
    assert len(merged) == 1
    assert merged[0].value == pytest.approx(m, rel=0.05)

    spec_count = CounterSpec(id="r", counter_type="count",
                             target_column="request_id", input_stream_arn=ARN).validate()
    p2 = partial_counter(df, spec_count, ts_col="time", shard_col="shard")
    merged2 = merge_partials(p2, spec_count).collect()
    assert merged2[0].value == n


def test_merge_filters_foreign_counters(spark):
    # F7: mismatched (counter_id, counter_type) rows are dropped on merge
    df = access_log(spark, 10, 100, shards=2)
    spec_a = CounterSpec(id="a", counter_type="count", target_column="request_id",
                         input_stream_arn=ARN).validate()
    spec_b = CounterSpec(id="b", counter_type="count", target_column="request_id",
                         input_stream_arn=ARN).validate()
    mixed = partial_counter(df, spec_a, ts_col="time", shard_col="shard").unionByName(
        partial_counter(df, spec_b, ts_col="time", shard_col="shard")
    )
    assert merge_partials(mixed, spec_a).collect()[0].value == 100


def test_shard_id_column_presence(spark):
    df = access_log(spark, 10, 100, shards=2)
    spec = CounterSpec(id="c", counter_type="count", target_column="request_id",
                       input_stream_arn=ARN).validate()
    with_shard = build_counter(df, spec, ts_col="time", shard_col="shard")
    assert "shard_id" in with_shard.columns and with_shard.count() == 2
    without = build_counter(df, spec, ts_col="time")
    assert "shard_id" not in without.columns  # omitted when empty (§2.6.4)


def test_window_alignment_matches_truncation(spark):
    # run.go:148-159: windowStart = t.Truncate(W) — epoch-aligned
    ts = dt.datetime(2021, 12, 1, 11, 19, 37, tzinfo=dt.timezone.utc)
    df = spark.createDataFrame([(ts, 1)], "time timestamp, request_id long")
    spec = CounterSpec(id="c", counter_type="count", target_column="request_id",
                       input_stream_arn=ARN).validate()
    r = build_counter(df, spec, ts_col="time").collect()[0]
    trunc = ts.replace(second=0, microsecond=0)
    assert r.window_start == int(trunc.timestamp() * 1000)
