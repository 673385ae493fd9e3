"""CLI entry point: ``python -m kinesis_data_counter_spark``.

Mirrors the reference CLI's surface (cmd/kinesis-data-counter/main.go):
`-stream` becomes ``--path`` (a parquet file/directory standing in for the
Kinesis stream — the only unbounded source this container can host),
``--window`` accepts Go-style durations (``1m``, ``30s``, ``1h``) or Spark
interval strings, and counters come either from flags (single counter) or
``--config`` YAML (multi-counter fan-out, ≈ the reference's config mode).
Results print as JSON lines on stdout exactly like the reference's default
io.Writer sink (run.go console output).

``--follow`` runs the streaming path (availableNow drain — bounded here,
continuous on a real stream); the reference's <15-minute window limit
(main.go:113-116) is enforced only in this mode, where it originates: it
exists because the CLI buffers per-window state in memory, which Spark's
state store makes unnecessary in batch.
"""

from __future__ import annotations

import argparse
import io
import re
import sys

_GO_DURATION = re.compile(r"^(\d+)(s|m|h|d)$")
_UNIT = {"s": "seconds", "m": "minutes", "h": "hours", "d": "days"}


def parse_window(text: str) -> str:
    """``1m``/``30s``/``2h`` → Spark interval string; pass through others."""
    m = _GO_DURATION.match(text.strip())
    if m:
        return f"{m.group(1)} {_UNIT[m.group(2)]}"
    return text


def window_minutes(window: str) -> float:
    """Total minutes of a (possibly multi-unit) interval string.

    Accepts every form the CLI documents — ``10 minutes``, ``1 hour
    30 minutes`` — and raises ``ValueError`` (not a raw KeyError) on
    anything unparseable so callers can route it to the clean error path.
    """
    scale = {"second": 1 / 60, "minute": 1, "hour": 60, "day": 1440}
    pairs = re.findall(r"(\d+(?:\.\d+)?)\s*([a-zA-Z]+)", window)
    joined = "".join(f"{n} {u} " for n, u in pairs).strip()
    if not pairs or joined.replace(" ", "") != window.replace(" ", ""):
        raise ValueError(f"unparseable window: {window!r}")
    total = 0.0
    for n, unit in pairs:
        u = unit.lower().rstrip("s")
        if u not in scale:
            raise ValueError(f"unknown window unit {unit!r} in {window!r}")
        total += float(n) * scale[u]
    return total


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kinesis_data_counter_spark",
        description="Windowed stream counting on Spark (reference-parity CLI)",
    )
    p.add_argument("--path", required=True, help="parquet file/dir standing in for the stream")
    p.add_argument("--window", default="1m", help="tumbling window (1m, 30s, '1 hour')")
    p.add_argument("--counter-id", default="counter")
    p.add_argument("--counter-type", default="count",
                   choices=["count", "approx_count_distinct"])
    p.add_argument("--target-column", default=None)
    p.add_argument("--target-expr", default=None)
    p.add_argument("--jq-expr", default=None)
    p.add_argument("--config", default=None, help="YAML config for multi-counter mode")
    p.add_argument("--stream-arn",
                   default="arn:aws:kinesis:us-east-1:000000000000:stream/cli-input",
                   help="ARN the input claims to be (drives config routing)")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--follow", action="store_true",
                   help="streaming mode (reference CLI semantics incl. <15m window limit)")
    return p


def _apply_env_defaults(parser) -> None:
    """≈ envToFlag (cmd/kinesis-data-counter/main.go:129-134): every flag
    falls back to KINESIS_DATA_COUNTER_<NAME> (dashes → underscores)."""
    import os

    for action in parser._actions:
        for opt in action.option_strings:
            if not opt.startswith("--"):
                continue
            env = "KINESIS_DATA_COUNTER_" + opt[2:].replace("-", "_").upper()
            if env in os.environ:
                v = os.environ[env]
                if isinstance(action.default, bool) or action.const is True:
                    parser.set_defaults(
                        **{action.dest: v.lower() in ("1", "true", "yes", "on")}
                    )
                else:
                    parser.set_defaults(**{action.dest: v})
                action.required = False  # an env-provided flag is satisfied


def main(argv: list[str] | None = None, out: io.TextIOBase | None = None) -> int:
    parser = build_parser()
    _apply_env_defaults(parser)
    args = parser.parse_args(argv)
    out = out or sys.stdout

    from kinesis_data_counter_spark.config import Config, CounterSpec
    from kinesis_data_counter_spark.operators.counter import (
        assemble_counters,
        build_counter,
        union_counter_results,
    )
    from kinesis_data_counter_spark.session import get_spark
    from kinesis_data_counter_spark.streaming.sinks import console_writer

    window = parse_window(args.window)
    if args.follow:
        try:
            minutes = window_minutes(window)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        if minutes >= 15:
            # reference CLI validation, main.go:113-116
            print("error: streaming window must be < 15 minutes", file=sys.stderr)
            return 2

    spark = get_spark(app_name="kdc-cli")
    spark.sparkContext.setLogLevel("ERROR")

    arn = args.stream_arn
    if args.config:
        from kinesis_data_counter_spark import __version__
        from kinesis_data_counter_spark.config import ConfigError

        cfg = Config.load(args.config)
        try:
            # ≈ main.go:82: the config may pin which engine versions run it
            cfg.validate_version(__version__)
        except ConfigError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        if args.follow:
            # streaming fan-out ≈ the reference's goroutine-per-counter
            # (counter.go:176-196): each matching counter drains the same
            # bounded stream through its own query; results union like
            # resp.MergeInto
            from kinesis_data_counter_spark.streaming.runner import (
                run_counter_stream_once,
            )

            frames = {
                spec.id: run_counter_stream_once(
                    spark, args.path, spec, ts_col=args.ts_col,
                    event_source_arn=arn,
                )
                for spec in cfg.counters_for_source(arn)
            }
        else:
            frames = assemble_counters(
                _load_input(spark, args.path, args.ts_col), cfg, arn, ts_col=args.ts_col
            )
        if not frames:
            print("error: no counter in the config matches "
                  f"--stream-arn {arn}", file=sys.stderr)
            return 2
        result = union_counter_results(frames)
    else:
        if args.target_column is None and args.target_expr is None:
            args.target_column = "*"
        spec = CounterSpec(
            id=args.counter_id,
            counter_type=args.counter_type,
            target_column=args.target_column,
            target_expr=args.target_expr,
            jq_expr=args.jq_expr,
            window=window,
            input_stream_arn=arn,
        ).validate()
        if args.follow:
            from kinesis_data_counter_spark.streaming.runner import (
                run_counter_stream_once,
            )

            result = run_counter_stream_once(spark, args.path, spec, ts_col=args.ts_col)
        else:
            result = build_counter(
                _load_input(spark, args.path, args.ts_col), spec, ts_col=args.ts_col
            )

    console_writer(out)(result.orderBy(*result.columns[:2]), 0)
    return 0


def _load_input(spark, path: str, ts_col: str):
    """Load the input through the same nanos-aware path as the fixtures.

    A directory of ``shard-*.jsonl`` files is read through the
    kinesis_replay data source with the JSON body lifted to columns — the
    CLI then points at a (simulated) stream exactly like the reference's
    ``-stream`` flag, not just at parquet.
    """
    import os

    from kinesis_data_counter_spark.session import load_tables
    from kinesis_data_counter_spark.sources.replay_source import (
        is_shard_dir,
        open_shard_records,
    )

    if is_shard_dir(path):
        return open_shard_records(spark, path, streaming=False, ts_col=ts_col)
    d, base = os.path.dirname(path), os.path.basename(path)
    name = base.removesuffix(".parquet")
    tables = load_tables(spark, d, (name,))
    if name in tables:
        return tables[name]
    return spark.read.parquet(path)


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
