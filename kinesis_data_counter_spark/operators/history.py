"""Event-history operators: CDC-style state tracking over an append log.

The reference processes its stream as stateless per-window counts; these
operators treat the same event log as a change-data-capture feed — the shape
a warehouse ingests from Kinesis/Debezium — and derive versioned state
(SCD type-2 intervals) and behavioral structure (state-transition counts)
from it. Both are pure window-function plans: one shuffle on the entity key,
no self-joins, no driver-side iteration.

Scale notes:
- Both operators shuffle once, keyed by the entity (user) — high-cardinality
  by construction, so 1000 executors partition cleanly. Per-key data is the
  entity's own history, which is small; there is no global sort.
- ``scd2_intervals`` collapses consecutive equal states BEFORE the interval
  build, so the output is proportional to the number of state *changes*,
  not events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an event log.

    Each event sets ``key``'s current state to ``state_col``; the output is
    one row per state *run* with its validity interval:
    (key, state, valid_from, valid_to, is_current) — ``valid_to`` is the
    next run's start, NULL (open) on the current run.

    Plan: one window partitioned by key ordered by (ts, order_col) —
    ``order_col`` breaks timestamp ties deterministically (the reference's
    Kinesis sequence-number role). lag() collapses runs of the same state,
    lead() closes each interval. Epoch-milli bounds match the counter
    output convention (counter.go:418-419).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    runs = (
        df.select(key_col, state_col, ts_col, order_col)
        .withColumn("__prev", F.lag(state_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(state_col)))
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    return (
        runs.withColumn("__next_ts", F.lead(ts_col).over(w2))
        .select(
            F.col(key_col).alias("key"),
            F.col(state_col).alias("state"),
            F.unix_millis(ts_col).alias("valid_from"),
            F.unix_millis("__next_ts").alias("valid_to"),
            F.col("__next_ts").isNull().alias("is_current"),
        )
    )


def transition_counts(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """First-order (Markov) transition matrix of per-key event sequences.

    For each key's events ordered by (ts, order_col), count every adjacent
    (state → next state) pair and the transition probability within the
    source state. The sequence-mining primitive behind funnel discovery and
    next-event prediction features.

    Plan: one window shuffle keyed by the entity for lead(), then a
    partial+final hash agg on the (from, to) pair — both high-cardinality
    keyed, no skew trap. Probabilities use exact integer counts divided
    once at the end and rounded, so engines agree bit-for-bit.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    pairs = (
        df.select(key_col, state_col, ts_col, order_col)
        .withColumn("__to", F.lead(state_col).over(w))
        .filter(F.col("__to").isNotNull())
        .groupBy(
            F.col(state_col).alias("from_state"), F.col("__to").alias("to_state")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), round_digits).alias("p"),
    )
