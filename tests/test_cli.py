"""CLI entry point (python -m kinesis_data_counter_spark)."""

from __future__ import annotations

import io
import json

from kinesis_data_counter_spark.__main__ import main, parse_window, window_minutes


def test_parse_window_go_durations():
    assert parse_window("1m") == "1 minutes"
    assert parse_window("30s") == "30 seconds"
    assert parse_window("2h") == "2 hours"
    assert parse_window("1 hour") == "1 hour"
    assert window_minutes("30 seconds") == 0.5
    assert window_minutes("2 hours") == 120


def test_cli_batch_count(spark, sf_dir):
    buf = io.StringIO()
    rc = main(
        ["--path", f"{sf_dir}/events.parquet", "--window", "1h",
         "--counter-id", "req"],
        out=buf,
    )
    assert rc == 0
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert len(lines) > 0
    assert lines[0]["counter_id"] == "req"
    assert lines[0]["counter_type"] == "count"
    assert sum(l["value"] for l in lines) == spark.read.parquet(
        f"{sf_dir}/events.parquet"
    ).count()


def test_cli_follow_streaming_matches_batch(spark, sf_dir):
    b1, b2 = io.StringIO(), io.StringIO()
    assert main(["--path", f"{sf_dir}/events.parquet", "--window", "10m"], out=b1) == 0
    assert main(
        ["--path", f"{sf_dir}/events.parquet", "--window", "10m", "--follow"], out=b2
    ) == 0
    batch = {(j["window_start"], j["value"]) for j in map(json.loads, b1.getvalue().strip().splitlines())}
    stream = {(j["window_start"], j["value"]) for j in map(json.loads, b2.getvalue().strip().splitlines())}
    assert batch == stream


def test_cli_follow_rejects_reference_window_limit(sf_dir):
    # reference CLI validation (main.go:113-116): streaming windows < 15m
    assert main(
        ["--path", f"{sf_dir}/events.parquet", "--window", "15m", "--follow"],
        out=io.StringIO(),
    ) == 2


def test_cli_expr_counter(spark, sf_dir):
    buf = io.StringIO()
    rc = main(
        ["--path", f"{sf_dir}/events.parquet", "--window", "1d",
         "--target-expr", 'string_contains(event_type, "click")',
         "--counter-id", "clicks"],
        out=buf,
    )
    assert rc == 0
    total = sum(json.loads(l)["value"] for l in buf.getvalue().strip().splitlines())
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").where(
        "event_type LIKE '%click%'"
    ).count()


def test_cli_config_multi_counter_fanout(spark, sf_dir, tmp_path):
    cfg = tmp_path / "counters.yaml"
    cfg.write_text(
        """
counters:
  - id: req_count
    counter_type: count
    target_column: "*"
    window: 1 hour
    input_stream_arn: "*"
  - id: click_count
    counter_type: count
    target_expr: 'string_contains(event_type, "click")'
    window: 1 hour
    input_stream_arn: "*"
  - id: other_stream_only
    counter_type: count
    target_column: "*"
    window: 1 hour
    input_stream_arn: "arn:aws:kinesis:eu-west-1:9:stream/not-this-one"
"""
    )
    buf = io.StringIO()
    rc = main(
        ["--path", f"{sf_dir}/events.parquet", "--config", str(cfg)], out=buf
    )
    assert rc == 0
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    ids = {l["counter_id"] for l in lines}
    # ARN routing: the '*' counters run, the eu-west-1-only one does not
    assert ids == {"req_count", "click_count"}
    req_total = sum(l["value"] for l in lines if l["counter_id"] == "req_count")
    assert req_total == spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_cli_config_follow_runs_multi_counter_stream(spark, sf_dir, tmp_path):
    # streaming fan-out parity: every routed counter drains the stream and
    # the unioned output matches the batch config run
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "counters:\n"
        "  - id: req_count\n    counter_type: count\n    target_column: '*'\n"
        "    window: 1 hour\n"
        "  - id: uniq_users\n    counter_type: approx_count_distinct\n"
        "    target_column: user_id\n    window: 1 hour\n"
    )
    b1, b2 = io.StringIO(), io.StringIO()
    args = ["--path", f"{sf_dir}/events.parquet", "--config", str(cfg)]
    assert main(args, out=b1) == 0
    assert main(args + ["--follow"], out=b2) == 0
    batch = {(j["counter_id"], j["window_start"], j["value"])
             for j in map(json.loads, b1.getvalue().strip().splitlines())}
    stream = {(j["counter_id"], j["window_start"], j["value"])
              for j in map(json.loads, b2.getvalue().strip().splitlines())}
    assert batch == stream
    assert {c for c, _, _ in batch} == {"req_count", "uniq_users"}


def test_cli_window_parse_errors_are_clean(sf_dir):
    import pytest

    # multi-unit intervals are valid and summed
    assert window_minutes("1 hour 30 minutes") == 90
    for bad in ("1 week", "90", "soon"):
        with pytest.raises(ValueError):
            window_minutes(bad)
    # and --follow routes them to exit code 2, not a traceback
    assert main(
        ["--path", f"{sf_dir}/events.parquet", "--window", "1 week", "--follow"],
        out=io.StringIO(),
    ) == 2


def _make_stream_dir(tmp_path):
    import datetime as dt

    from kinesis_data_counter_spark.sources.replay_source import write_shard_files

    d = str(tmp_path / "stream")
    base = int(dt.datetime(2021, 12, 1, 11, 0, tzinfo=dt.timezone.utc).timestamp() * 1000)
    recs = [
        (
            f"u{i % 7}",
            json.dumps(
                {"__pk": f"u{i % 7}", "__arrival_ms": base + i * 1500,
                 "user_id": i % 7, "event_type": "click" if i % 3 else "view"}
            ),
        )
        for i in range(200)
    ]
    write_shard_files(iter(recs), d, num_shards=3)
    return d


def test_cli_counts_a_shard_stream_dir(spark, tmp_path):
    # the reference CLI points at a STREAM; ours accepts a shard dir and
    # windows on arrival time (run.go:107 semantics) without --ts-col games
    d = _make_stream_dir(tmp_path)
    buf = io.StringIO()
    rc = main(["--path", d, "--window", "1m", "--counter-id", "req",
               "--ts-col", "approximate_arrival"], out=buf)
    assert rc == 0
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert sum(l["value"] for l in lines) == 200
    assert len(lines) == 5  # 200 records * 1.5s spacing = 300s = 5 windows


def test_cli_follow_on_shard_stream_matches_batch(spark, tmp_path):
    d = _make_stream_dir(tmp_path)
    b1, b2 = io.StringIO(), io.StringIO()
    args = ["--path", d, "--window", "1m", "--ts-col", "approximate_arrival"]
    assert main(args, out=b1) == 0
    assert main(args + ["--follow"], out=b2) == 0
    batch = {(j["window_start"], j["value"]) for j in map(json.loads, b1.getvalue().strip().splitlines())}
    stream = {(j["window_start"], j["value"]) for j in map(json.loads, b2.getvalue().strip().splitlines())}
    assert batch == stream and len(batch) == 5


def test_cli_target_column_from_stream_json_body(spark, tmp_path):
    # body fields lifted to columns: target_expr filters on event_type
    d = _make_stream_dir(tmp_path)
    buf = io.StringIO()
    rc = main(["--path", d, "--window", "10m", "--counter-id", "clicks",
               "--target-expr", 'string_contains(event_type, "click")',
               "--ts-col", "approximate_arrival"], out=buf)
    assert rc == 0
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    # 2 of every 3 records are clicks
    assert sum(l["value"] for l in lines) == sum(1 for i in range(200) if i % 3)


def test_cli_env_flag_fallback(spark, sf_dir, monkeypatch):
    # envToFlag parity (main.go:129-134): flags fall back to
    # KINESIS_DATA_COUNTER_<NAME>, explicit argv still wins
    monkeypatch.setenv("KINESIS_DATA_COUNTER_PATH", f"{sf_dir}/events.parquet")
    monkeypatch.setenv("KINESIS_DATA_COUNTER_WINDOW", "1h")
    monkeypatch.setenv("KINESIS_DATA_COUNTER_COUNTER_ID", "from_env")
    buf = io.StringIO()
    assert main([], out=buf) == 0
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert lines and lines[0]["counter_id"] == "from_env"
    buf2 = io.StringIO()
    assert main(["--counter-id", "cli_wins"], out=buf2) == 0
    assert json.loads(buf2.getvalue().splitlines()[0])["counter_id"] == "cli_wins"


def test_cli_config_version_gate(spark, sf_dir, tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "required_version: '>=99.0.0'\n"
        "counters:\n  - id: x\n    counter_type: count\n    target_column: '*'\n"
        "    window: 1 hour\n"
    )
    assert main(["--path", f"{sf_dir}/events.parquet", "--config", str(cfg)],
                out=io.StringIO()) == 2
