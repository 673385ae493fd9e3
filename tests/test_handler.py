"""Lambda time-window handler tests — the reference's own test flow
(counter_test.go:43-108): state threading across invocations, ε-tolerant
distinct estimates, bad-record reporting, jq reshape, and the two-level
aggregate-stream replay."""

from __future__ import annotations

import base64
import json

import pytest

from kinesis_data_counter_spark.config import Config
from kinesis_data_counter_spark.streaming.handler import (
    HandlerResponse,
    TimeWindowEvent,
    handle_time_window_event,
    make_intermediate_event,
)

ARN = "arn:aws:kinesis:ap-northeast-1:111122223333:stream/input-stream"
AGG_ARN = "arn:aws:kinesis:ap-northeast-1:111122223333:stream/agg-stream"
WS, WE = 1638357540000, 1638357600000  # 2021-12-01T11:19:00Z + 1m


def _records(objs, start_seq=0):
    return [
        {
            "sequence_number": str(start_seq + i),
            "data": base64.b64encode(json.dumps(o).encode()).decode(),
        }
        for i, o in enumerate(objs)
    ]


def _cfg(**over):
    base = {
        "id": "request_count",
        "counter_type": "count",
        "target_column": "request_id",
        "input_stream_arn": ARN,
    }
    base.update(over)
    return Config.from_dict({"counters": [base]})


def _event(objs, state=None, final=False, shard="shard-0", arn=ARN, seq0=0):
    return TimeWindowEvent(
        records=_records(objs, seq0),
        window_start_ms=WS,
        window_end_ms=WE,
        event_source_arn=arn,
        shard_id=shard,
        state=state or {},
        is_final_invoke_for_window=final,
    )


def test_count_state_threading(spark):
    # two invocations of the same window; state from the first feeds the
    # second (counter_test.go:47-52), final invoke emits the total
    cfg = _cfg()
    objs1 = [{"request_id": i, "user_id": i % 5} for i in range(40)]
    objs2 = [{"request_id": 100 + i, "user_id": i % 5} for i in range(60)]
    r1 = handle_time_window_event(spark, cfg, _event(objs1))
    assert r1.outputs == [] and r1.batch_item_failures == []
    r2 = handle_time_window_event(
        spark, cfg, _event(objs2, state=r1.state, final=True, seq0=1000)
    )
    assert len(r2.outputs) == 1
    out = r2.outputs[0]
    assert out == {
        "event_source_arn": ARN,
        "window_start": WS,
        "window_end": WE,
        "counter_id": "request_count",
        "counter_type": "count",
        "shard_id": "shard-0",
        "value": 100,
    }


def test_distinct_state_threading(spark):
    cfg = _cfg(id="uu", counter_type="approx_count_distinct", target_column="user_id")
    m = 50
    objs1 = [{"user_id": 1000 + (i % m)} for i in range(200)]
    objs2 = [{"user_id": 1000 + (i % m)} for i in range(200)]
    r1 = handle_time_window_event(spark, cfg, _event(objs1))
    r2 = handle_time_window_event(spark, cfg, _event(objs2, state=r1.state, final=True))
    assert r2.outputs[0]["value"] == pytest.approx(m, rel=0.05)


def test_bad_records_reported_not_fatal(spark):
    cfg = _cfg()
    recs = _records([{"request_id": 1}, {"request_id": 2}])
    recs.append({"sequence_number": "bad-1", "data": base64.b64encode(b"not json").decode()})
    recs.append({"sequence_number": "bad-2", "data": base64.b64encode(b"[1,2]").decode()})
    ev = TimeWindowEvent(
        records=recs, window_start_ms=WS, window_end_ms=WE,
        event_source_arn=ARN, shard_id="s", is_final_invoke_for_window=True,
    )
    r = handle_time_window_event(spark, cfg, ev)
    assert sorted(r.batch_item_failures) == ["bad-1", "bad-2"]
    assert r.outputs[0]["value"] == 2


def test_jq_reshape_output(spark):
    cfg = _cfg(
        jq_expr='{"time": .window_start, "name": "access_log.request_count", "value": .value}'
    )
    r = handle_time_window_event(
        spark, cfg, _event([{"request_id": i} for i in range(7)], final=True)
    )
    assert r.outputs == [
        {"time": WS, "name": "access_log.request_count", "value": 7}
    ]


def test_expr_counter_nil_false_rule(spark):
    cfg = _cfg(
        id="mypage", target_column=None,
        target_expr='string_contains(path, "my_page")',
    )
    objs = [{"path": "/my_page", "request_id": i} for i in range(3)] + [
        {"path": "/", "request_id": 9}
    ]
    r = handle_time_window_event(spark, cfg, _event(objs, final=True))
    assert r.outputs[0]["value"] == 3


@pytest.mark.parametrize("ctype,expected", [("count", 300), ("approx_count_distinct", 60)])
def test_two_level_aggregate_replay(spark, ctype, expected):
    # stage 1: 3 shards publish intermediate records instead of finalizing;
    # stage 2: replay them through the same handler from the aggregate
    # stream → one global output (counter_test.go:69-108)
    target = "request_id" if ctype == "count" else "user_id"
    cfg = _cfg(
        id="global", counter_type=ctype, target_column=target,
        aggregate_stream_arn=AGG_ARN,
    )
    intermediates = []
    for shard in range(3):
        objs = [
            {"request_id": shard * 1000 + i, "user_id": (shard * 20) + (i % 20)}
            for i in range(100)
        ]
        r = handle_time_window_event(
            spark, cfg, _event(objs, final=True, shard=f"shard-{shard}")
        )
        assert r.outputs == []  # two-level: no finalize at level 1
        intermediates.extend(r.intermediate_records)
    assert len(intermediates) == 3

    ev2 = make_intermediate_event(intermediates, AGG_ARN, WS, WE)
    r2 = handle_time_window_event(spark, cfg, ev2)
    assert len(r2.outputs) == 1
    out = r2.outputs[0]
    assert "shard_id" not in out  # global value: shard omitted
    if ctype == "count":
        assert out["value"] == expected
    else:
        assert out["value"] == pytest.approx(expected, rel=0.05)


def test_arn_routing_ignores_other_streams(spark):
    cfg = _cfg()
    other = "arn:aws:kinesis:ap-northeast-1:111122223333:stream/other"
    r = handle_time_window_event(
        spark, cfg, _event([{"request_id": 1}], final=True, arn=other)
    )
    assert r.outputs == [] and r.state == {}
