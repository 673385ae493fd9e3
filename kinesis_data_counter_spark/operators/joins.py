"""As-of (nearest-time) join — a temporal operator the reference lacks but
any event-analytics engine needs (reference's nearest analog is window
state lookup, counter.go:210-231; this generalizes it to point-in-time
enrichment against a versioned dimension).

Spark has no ASOF JOIN primitive (DuckDB/Pandas do), and the naive
formulations both fail at 100 TB:

- range join (``l.key = r.key AND r.t <= l.t`` + window-max post-filter)
  plans as an equi-join whose matches explode quadratically per key before
  the per-row max prunes them;
- per-key ``applyInPandas`` drags every row through Python.

The union-sort formulation here is the one big engines use: tag both
inputs, union them, and carry the most recent right-side payload forward
with ``last(ignorenulls=True)`` over a (key, time)-sorted window. Cost is
ONE hash shuffle on the key plus an in-partition sort — the same exchange
a sort-merge join would pay, with zero match explosion. Skewed keys are
the caveat (a window cannot be salted transparently); for a key carrying
a double-digit percent of the corpus, pre-split by time range instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE_L, _SIDE_R = 1, 0  # right sorts first at equal time: "at or before" ties match


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: attach to each left row the right row with the
    greatest ``right_time`` <= ``left_time`` for the same key (``backward``,
    ties match) or the least ``right_time`` >= ``left_time`` (``forward``).

    All right columns except the key arrive prefixed with ``right_prefix``
    (the matched ``right_time`` included, so callers can compute the gap).
    Left rows with no eligible right row keep nulls — LEFT ASOF semantics,
    matching DuckDB's ``ASOF LEFT JOIN``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    r_payload_cols = [c for c in right.columns if c != right_on]
    r_struct = F.struct(*[F.col(c) for c in r_payload_cols])
    r_tagged = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(_SIDE_R).alias("__side"),
        r_struct.alias("__r"),
    )
    # the left payload rides along as a struct so the union schema is fixed
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_tagged = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(_SIDE_L).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
        l_struct.alias("__l"),
    )
    u = r_tagged.withColumn(
        "__l", F.lit(None).cast(l_tagged.schema["__l"].dataType)
    ).unionByName(l_tagged)

    order = [F.col("__t").asc(), F.col("__side").asc()]
    if direction == "forward":
        order = [F.col("__t").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == _SIDE_L)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in r_payload_cols
    ]
    return matched.select(*out_cols)


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    bin_width: int = 3_600_000,
) -> DataFrame:
    """Interval-containment join (point BETWEEN start AND end) via binning.

    OSS Spark plans a raw range predicate as a broadcast-nested-loop join —
    O(points × intervals) and a non-starter at scale. The standard fix is
    to discretize the range dimension: each interval is replicated onto
    every ``bin_width``-sized bin it overlaps, each point lands in exactly
    one bin, and the planner sees a plain equi-join on (keys…, bin) that it
    hash-partitions like any other; the BETWEEN predicate then refines the
    candidates. Every true match shares a bin, so the result is exact.

    Costs to size consciously at 100 TB:
    - interval replication factor ≈ avg_interval_length / bin_width + 1 —
      pick bin_width near the TYPICAL interval length so the factor stays
      ~2 while bins stay selective;
    - each point joins only its own bin's intervals, so the per-task work
      is local and the shuffle is the same hash exchange a normal join pays.

    ``point_col``/``start_col``/``end_col`` must be numeric in the same
    units (e.g. epoch millis). Returns matched rows with all columns from
    both sides (shared ``keys`` once).
    """
    bw = int(bin_width)
    p = points.withColumn("__bin", F.floor(F.col(point_col) / F.lit(bw)))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bw)),
                F.floor(F.col(end_col) / F.lit(bw)),
            )
        ),
    )
    joined = p.join(iv, [*keys, "__bin"]).where(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("__bin")
