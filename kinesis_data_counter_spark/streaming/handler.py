"""Lambda time-window event handler — SURVEY.md §3 entry point 2.

The reference's second runtime is an AWS Lambda handler consuming
``KinesisTimeWindowEvent`` batches: the Lambda/Kinesis runtime delivers
records plus the state returned by the previous invocation of the same
window, and ``IsFinalInvokeForWindow`` triggers emission
(counter.go:98-106, 150-159, 338-344). Structured Streaming subsumes this
contract in production (streaming/runner.py); THIS module is the
compatibility shim for deployments that genuinely run per-event — it speaks
the same envelope: carried JSON state, batchItemFailures for undecodable
records, intermediate-record publication for the two-level topology, and
final-invoke output emission.

Division of labor: record decode + state threading are driver-side Python
(the reference itself loops ≤1000 records per invoke — this is envelope
handling, not data processing); every aggregation — predicate evaluation,
counting, HLL sketching, sketch union — runs in Spark, so ``target_expr``
semantics and sketch binary format are byte-identical to the batch and
streaming paths. State carries either a partial row count or a base64
Datasketches HLL sketch ≈ ``CounterState{RowCount, Base64HLLPP}``
(counter.go:78-82).
"""

from __future__ import annotations

import base64
import binascii
import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kinesis_data_counter_spark.config import (
    APPROX_COUNT_DISTINCT,
    COUNT,
    Config,
    CounterSpec,
)
from kinesis_data_counter_spark.jq import eval_jq_object


@dataclass
class TimeWindowEvent:
    """≈ KinesisTimeWindowEvent (counter.go:98-106). Times are epoch millis."""

    records: list[dict[str, Any]]  # {"sequence_number": str, "data": base64 str}
    window_start_ms: int
    window_end_ms: int
    event_source_arn: str
    shard_id: str = ""
    state: dict[str, Any] = field(default_factory=dict)
    is_final_invoke_for_window: bool = False


@dataclass
class HandlerResponse:
    """≈ TimeWindowEventResponse: carried state + failures + emitted rows."""

    state: dict[str, Any]
    batch_item_failures: list[str] = field(default_factory=list)
    outputs: list[dict[str, Any]] = field(default_factory=list)
    intermediate_records: list[dict[str, Any]] = field(default_factory=list)


def _decode_records(records: list[dict[str, Any]]) -> tuple[list[str], list[str]]:
    """base64 → JSON-object strings; undecodable → failure sequence numbers.

    Mirrors counter.go:241-252: only records parsing to a JSON *object*
    count; anything else is reported per-record, never a job failure.
    """
    clean: list[str] = []
    failures: list[str] = []
    for rec in records:
        seq = str(rec.get("sequence_number", ""))
        try:
            text = base64.b64decode(rec["data"]).decode("utf-8")
            if not isinstance(json.loads(text), dict):
                raise ValueError("not a JSON object")
            clean.append(text)
        except (KeyError, ValueError, binascii.Error, UnicodeDecodeError):
            failures.append(seq)
    return clean, failures


def _counter_agg_column(df, spec: CounterSpec):
    """The partial-aggregate expression for one counter over parsed records.

    Same type-directed nil/false rule as the batch path (SURVEY.md §2.6.1),
    resolved against the event batch's inferred schema; the distinct path
    produces a mergeable SKETCH (the state row), not an estimate.
    """
    from kinesis_data_counter_spark.operators.counter import _target_column

    if spec.counter_type == COUNT:
        if spec.target_column == "*":
            return F.count(F.lit(1))
        col, is_bool = _target_column(df, spec)
        return F.count_if(col) if is_bool else F.count(col)
    if spec.counter_type == APPROX_COUNT_DISTINCT:
        col, _ = _target_column(df, spec)
        return F.hll_sketch_agg(col, F.lit(spec.hll_precision))
    raise ValueError(spec.counter_type)


def _merge_sketches(spark: SparkSession, sketches: list[bytes]) -> bytes:
    rows = [(s,) for s in sketches if s]
    df = spark.createDataFrame(rows, "sk binary")
    return df.agg(F.hll_union_agg("sk").alias("u")).collect()[0].u


def _sketch_estimate(spark: SparkSession, sketch: bytes) -> int:
    return (
        spark.range(1)
        .select(F.hll_sketch_estimate(F.lit(sketch)).alias("v"))
        .collect()[0]
        .v
    )


def _apply_jq_dict(program: str | None, obj: dict[str, Any]) -> dict[str, Any] | None:
    """jq-subset applied to one output object (same compiled subset as
    jq.apply_jq, via the shared dict evaluator — pipes/select/arithmetic/
    interpolation included). None = a select stage filtered the record."""
    return eval_jq_object(program, obj)


def _state_for(state: dict, spec: CounterSpec, shard_id: str) -> dict[str, Any]:
    return state.setdefault(spec.id, {}).setdefault(
        shard_id,
        {"counter_type": spec.counter_type, "row_count": 0, "base64_hll": None},
    )


def _output_row(spec: CounterSpec, ev: TimeWindowEvent, shard_id: str, value: int):
    row: dict[str, Any] = {
        "event_source_arn": ev.event_source_arn,
        "window_start": ev.window_start_ms,
        "window_end": ev.window_end_ms,
        "counter_id": spec.id,
        "counter_type": spec.counter_type,
        "value": int(value),
    }
    if shard_id:  # omitted when empty (counter.go:423-425)
        row["shard_id"] = shard_id
    return _apply_jq_dict(spec.jq_expr, row)


def handle_time_window_event(
    spark: SparkSession, config: Config, event: TimeWindowEvent
) -> HandlerResponse:
    """One invocation ≈ App.handler (counter.go:161-344).

    Routes the event to every counter whose input (or aggregate) stream ARN
    matches, updates carried state, and on the window's final invoke emits
    output rows — or intermediate records when the counter belongs to a
    two-level topology (aggregate_stream_arn set and this event came from
    the input stream).
    """
    resp = HandlerResponse(state=event.state or {})

    input_counters = [
        c for c in config.counters if c.matches_source(event.event_source_arn)
    ]
    agg_counters = [
        c
        for c in config.counters
        if c.aggregate_stream_arn
        and _arn_match(c.aggregate_stream_arn, event.event_source_arn)
    ]

    if agg_counters:
        _process_aggregate(spark, agg_counters, event, resp)
    if input_counters:
        _process_input(spark, input_counters, event, resp)
    return resp


def _arn_match(pattern: str, source: str) -> bool:
    from kinesis_data_counter_spark.arn import Arn

    return Arn.parse_strict(pattern).match(source)


def _process_input(
    spark: SparkSession,
    counters: list[CounterSpec],
    event: TimeWindowEvent,
    resp: HandlerResponse,
) -> None:
    clean, failures = _decode_records(event.records)
    resp.batch_item_failures.extend(failures)

    if clean:
        # ONE Spark job computes every routed counter's partial aggregate
        df = spark.read.json(spark.sparkContext.parallelize(clean, 1))
        aggs = [
            _counter_agg_column(df, c).alias(f"c{i}") for i, c in enumerate(counters)
        ]
        row = df.agg(*aggs).collect()[0]
    else:
        row = None

    for i, spec in enumerate(counters):
        st = _state_for(resp.state, spec, event.shard_id)
        if row is not None:
            if spec.counter_type == COUNT:
                st["row_count"] = int(st.get("row_count") or 0) + int(row[f"c{i}"])
            else:
                new_sketch: bytes | None = row[f"c{i}"]
                prior = st.get("base64_hll")
                sketches = [s for s in (
                    base64.b64decode(prior) if prior else None, new_sketch
                ) if s]
                if len(sketches) == 2:
                    merged = _merge_sketches(spark, sketches)
                elif sketches:
                    merged = sketches[0]
                else:
                    merged = None
                if merged is not None:
                    st["base64_hll"] = base64.b64encode(bytes(merged)).decode()

        if event.is_final_invoke_for_window:
            if spec.aggregate_stream_arn:
                # two-level topology: publish the partial, don't finalize
                # (≈ putIntermediateRecord, counter.go:493-512)
                resp.intermediate_records.append(
                    {
                        "event_source_arn": event.event_source_arn,
                        "shard_id": event.shard_id,
                        "counter_id": spec.id,
                        "counter_type": spec.counter_type,
                        "window_start": event.window_start_ms,
                        "window_end": event.window_end_ms,
                        "row_count": st.get("row_count"),
                        "base64_hll": st.get("base64_hll"),
                    }
                )
            else:
                value = (
                    st.get("row_count") or 0
                    if spec.counter_type == COUNT
                    else (
                        _sketch_estimate(spark, base64.b64decode(st["base64_hll"]))
                        if st.get("base64_hll")
                        else 0
                    )
                )
                row = _output_row(spec, event, event.shard_id, value)
                if row is not None:  # None = jq select dropped the record
                    resp.outputs.append(row)


def _process_aggregate(
    spark: SparkSession,
    counters: list[CounterSpec],
    event: TimeWindowEvent,
    resp: HandlerResponse,
) -> None:
    """Level-2 merge ≈ aggregateProcess (counter.go:348-412): consume
    intermediate records, keep only matching (counter_id, counter_type)
    rows (F7), merge partial counts / sketches per counter, finalize on the
    window's final invoke with NO shard_id (global value)."""
    clean, failures = _decode_records(event.records)
    resp.batch_item_failures.extend(failures)
    inters = [json.loads(s) for s in clean]

    for spec in counters:
        mine = [
            r
            for r in inters
            if r.get("counter_id") == spec.id
            and r.get("counter_type") == spec.counter_type
        ]
        st = _state_for(resp.state, spec, "")
        if spec.counter_type == COUNT:
            st["row_count"] = int(st.get("row_count") or 0) + sum(
                int(r.get("row_count") or 0) for r in mine
            )
        else:
            sketches = [
                base64.b64decode(r["base64_hll"]) for r in mine if r.get("base64_hll")
            ]
            if st.get("base64_hll"):
                sketches.append(base64.b64decode(st["base64_hll"]))
            if len(sketches) > 1:
                st["base64_hll"] = base64.b64encode(
                    bytes(_merge_sketches(spark, sketches))
                ).decode()
            elif sketches:
                st["base64_hll"] = base64.b64encode(bytes(sketches[0])).decode()

        if event.is_final_invoke_for_window:
            value = (
                st.get("row_count") or 0
                if spec.counter_type == COUNT
                else (
                    _sketch_estimate(spark, base64.b64decode(st["base64_hll"]))
                    if st.get("base64_hll")
                    else 0
                )
            )
            row = _output_row(spec, event, "", value)
            if row is not None:  # None = jq select dropped the record
                resp.outputs.append(row)


def make_intermediate_event(
    intermediate_records: list[dict[str, Any]],
    aggregate_stream_arn: str,
    window_start_ms: int,
    window_end_ms: int,
    prior_state: dict[str, Any] | None = None,
    is_final: bool = True,
) -> TimeWindowEvent:
    """Wrap published intermediate records as the level-2 consumer's event
    (what Kinesis delivery does between the two jobs in the reference)."""
    records = [
        {
            "sequence_number": str(i),
            "data": base64.b64encode(json.dumps(r).encode()).decode(),
        }
        for i, r in enumerate(intermediate_records)
    ]
    return TimeWindowEvent(
        records=records,
        window_start_ms=window_start_ms,
        window_end_ms=window_end_ms,
        event_source_arn=aggregate_stream_arn,
        shard_id="",
        state=prior_state or {},
        is_final_invoke_for_window=is_final,
    )
