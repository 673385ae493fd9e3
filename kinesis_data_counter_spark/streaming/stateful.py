"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's deepest mechanism is hand-carried mergeable state across
micro-batch invocations (CounterState threading, counter.go:78-84, 210-231;
the Lambda runtime persists the returned state and passes it back in,
counter.go:338-344). Structured Streaming's built-in windowed aggregation
already subsumes that for counters (streaming/runner.py); THIS module is the
engine's extension point for aggregation logic the built-ins can't express —
the Spark analog of "write your own CounterState": a user function over
(key, batch iterator, GroupState) where the engine manages state persistence,
recovery, and shuffling by key.

Scale notes: state lives in the state store (RocksDB-capable, spill-safe —
unlike the reference's 1 MB Lambda state cap, counter.go:234-236), keyed by
the group column, so cardinality distributes across executors. Arrow batches
cross the Python boundary per key-group per trigger.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# transformWithStateInPandas ships its state-server protocol over protobuf;
# the runtime needs google.protobuf in the Python worker. This container
# deliberately has no protobuf (hence the pure-Python KPL codec in
# sources/kpl.py), so the TWS path is import-gated like the media codecs:
# the processor and wrapper below are real and schema-complete, but running
# them requires a protobuf-equipped cluster.
try:  # pragma: no cover - absent in this container
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS_RUNTIME = True
except ImportError:
    HAS_TWS_RUNTIME = False


def running_count_fn(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key running event count: state = (total,), emits the new total.

    ≈ the reference's count-mode CounterState.RowCount carry
    (counter.go:253-280) generalized to any key: each micro-batch adds its
    rows to the persisted total and emits the updated value.
    """
    total = state.get[0] if state.exists else 0
    for pdf in pdfs:
        total += len(pdf)
    state.update((total,))
    yield pd.DataFrame({"key": [key[0]], "n_events": [total]})


def stateful_running_counts(
    records: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Streaming DataFrame → per-key running counts with explicit state."""
    return records.groupBy(records[key_col]).applyInPandasWithState(
        running_count_fn,
        outputStructType="key long, n_events long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_counts_once(
    spark: SparkSession,
    path: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    timeout_sec: int = 300,
) -> DataFrame:
    """Drive the stateful operator over a bounded path; return final counts.

    ``availableNow`` drains the files (possibly in several micro-batches);
    update mode emits one row per touched key per batch, so the memory sink
    may hold interim totals — the final total per key is the max (counts are
    monotone). The result therefore equals the batch ``count(*)`` per key,
    which is what makes this oracle-checkable.
    """
    from pyspark.sql import functions as F

    from kinesis_data_counter_spark.streaming.runner import _read_stream

    sdf = _read_stream(spark, path, ts_col)
    out = stateful_running_counts(sdf, key_col)
    name = f"stateful_counts_{uuid.uuid4().hex[:12]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:  # pragma: no cover - defensive
            q.stop()
    return (
        spark.table(name)
        .groupBy("key")
        .agg(F.max("n_events").alias("n_events"))
        .select(F.col("key").alias(key_col), "n_events")
    )


class RunningAggregateProcessor(StatefulProcessor):
    """``transformWithState`` processor: per-key running count + per-type map.

    The modern (Spark 4) successor of ``running_count_fn``: instead of one
    opaque state tuple, the handle exposes typed state primitives — here a
    ValueState for the running total and a MapState keyed by event_type,
    demonstrating state the applyInPandasWithState tuple encoding handles
    poorly (an open-ended map). Emits (key, n_events, n_types) per batch.

    Scale notes: state is per-key in the RocksDB-backed store (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...RocksDBStateStoreProvider``, required by transformWithState), so
    map entries spill to disk instead of inflating executor heaps.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.total = handle.getValueState("total", "n long")
        self.types = handle.getMapState("types", "t string", "c long")

    def handleInputRows(self, key, rows, timer_values):  # noqa: ANN001
        n = self.total.get()[0] if self.total.exists() else 0
        for pdf in rows:
            n += len(pdf)
            for t, c in pdf["event_type"].value_counts().items():
                prev = (
                    self.types.getValue((t,))[0]
                    if self.types.containsKey((t,))
                    else 0
                )
                self.types.updateValue((t,), (prev + int(c),))
        self.total.update((n,))
        n_types = sum(1 for _ in self.types.keys())
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "n_types": [n_types]}
        )

    def close(self) -> None:
        pass


def stateful_running_counts_tws(
    records: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Streaming per-key running (count, distinct-type count) via
    ``transformWithStateInPandas``.

    Requires the protobuf runtime (see HAS_TWS_RUNTIME) and the RocksDB
    state store provider; raises immediately with a clear message when the
    runtime is absent rather than crashing inside the streaming worker.
    """
    if not HAS_TWS_RUNTIME:
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf in the Python "
            "workers (not bundled here); use stateful_running_counts() or "
            "run on a protobuf-equipped cluster"
        )
    return records.groupBy(records[key_col]).transformWithStateInPandas(
        statefulProcessor=RunningAggregateProcessor(),
        outputStructType="key long, n_events long, n_types long",
        outputMode="Update",
        timeMode="None",
    )
