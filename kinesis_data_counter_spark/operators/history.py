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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two snapshots of the same table (the dataset
    versioning primitive: what changed between yesterday's curated corpus
    and today's?).

    Classifies every key present in either snapshot:
      ``added``     — key only in ``new``
      ``removed``   — key only in ``old``
      ``changed``   — key in both, any compare column differs
      ``unchanged`` — key in both, all compare columns equal

    Column comparison is null-safe per column (``eqNullSafe``), NOT a
    serialized row hash — hashing would couple the diff to one engine's
    float/decimal rendering, while direct column equality is exactly the
    semantics every engine shares (``IS NOT DISTINCT FROM``).

    Plan: ONE full outer shuffle join on the key; the classification is a
    row-local CASE over the joined row. Both sides partition by the same
    key so AQE can coalesce; there is no window, no sort, no second pass.
    At 100 TB the join is the floor cost of any diff — every competing
    formulation (except-based, hash-compare) pays at least the same
    exchange, and except pays it twice.

    Returns (key, change_type string) with one row per distinct key.
    """
    k = key_col
    o = old.select(k, *compare_cols).alias("o")
    n = new.select(k, *compare_cols).alias("n")
    joined = o.join(n, F.col(f"o.{k}") == F.col(f"n.{k}"), "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(F.col(f"o.{k}").isNull(), "added")
        .when(F.col(f"n.{k}").isNull(), "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    return joined.select(
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k),
        change.alias("change_type"),
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
