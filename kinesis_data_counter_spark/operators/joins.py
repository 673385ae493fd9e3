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
a double-digit percent of the corpus, pass ``split_every`` to pre-split
each key's timeline into fixed-width buckets: the big window becomes
per-(key, bucket) — bounded task size no matter how hot the key — and
cross-bucket carry-forward is restored by a second, TINY window over one
row per (key, bucket) whose result is joined back. Two cheap exchanges
instead of one unbounded task; results are bit-identical to the unsplit
path (``test_asof_skew_split_matches_unsplit``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
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
    split_every: float | None = None,
) -> DataFrame:
    """Left as-of join: attach to each left row the right row with the
    greatest ``right_time`` <= ``left_time`` for the same key (``backward``,
    ties match) or the least ``right_time`` >= ``left_time`` (``forward``).

    All right columns except the key arrive prefixed with ``right_prefix``
    (the matched ``right_time`` included, so callers can compute the gap).
    Left rows with no eligible right row keep nulls — LEFT ASOF semantics,
    matching DuckDB's ``ASOF LEFT JOIN``.

    ``split_every`` (seconds for timestamp columns, native units for
    numerics) enables the hot-key guard: each key's timeline is cut into
    fixed-width buckets so no window task ever holds more than one
    bucket's rows of the hottest key. Size it so
    ``hot_key_rows × bucket_width / time_span`` fits one task comfortably.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if split_every is not None and not float(split_every) > 0:
        raise ValueError(f"split_every must be > 0, got {split_every!r}")

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

    if split_every is None:
        w = (
            Window.partitionBy("__key")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = (
            u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
            .filter(F.col("__side") == _SIDE_L)
        )
    else:
        matched = _asof_split(u, direction, float(split_every), order)

    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in r_payload_cols
    ]
    return matched.select(*out_cols)


def _asof_split(u: DataFrame, direction: str, split_every: float, order) -> DataFrame:
    """Hot-key-safe as-of matching over the tagged union ``u``.

    Pass 1: the carry-forward window runs per (key, time-bucket), so the
    hottest key's rows are spread over ``span / split_every`` tasks.
    Pass 2: one row per (key, bucket) — the bucket's boundary right-side
    payload (latest for backward, earliest for forward) — flows through a
    second window ordered by bucket to produce each bucket's carry-in:
    the match for rows whose bucket has no earlier (later, for forward)
    right row locally. The carry table is ~|keys|×|buckets| rows, orders
    of magnitude smaller than ``u``, so its shuffle and the join back are
    noise next to pass 1's exchange.
    """
    backward = direction == "backward"
    u = u.withColumn(
        "__bkt",
        F.floor(F.col("__t").cast("double") / F.lit(split_every)).cast("long"),
    )
    w_local = (
        Window.partitionBy("__key", "__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per-bucket boundary: struct max/min orders by __t first, so this is
    # the bucket's last (backward) / first (forward) right-side payload
    edge = F.when(F.col("__side") == _SIDE_R, F.struct("__t", "__r"))
    bstate = u.groupBy("__key", "__bkt").agg(
        (F.max(edge) if backward else F.min(edge)).alias("__b")
    )
    w_carry = (
        Window.partitionBy("__key")
        .orderBy(F.col("__bkt").asc() if backward else F.col("__bkt").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = bstate.select(
        "__key",
        "__bkt",
        F.last(F.col("__b.__r"), ignorenulls=True).over(w_carry).alias("__carry"),
    )
    return (
        u.withColumn("__mloc", F.last("__r", ignorenulls=True).over(w_local))
        .filter(F.col("__side") == _SIDE_L)
        .join(carry, ["__key", "__bkt"], "left")
        .withColumn("__m", F.coalesce("__mloc", "__carry"))
    )


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_buckets: int = 1 << 22,
    num_hashes: int = 2,
) -> DataFrame:
    """Inner join with an explicit Bloom-style runtime filter on the fact side.

    The 100 TB join problem is rarely the join itself — it is scanning and
    shuffling fact rows that cannot possibly match a selective dim side.
    Spark injects this reduction itself when stats allow
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator is
    the explicit, always-on form for when the dim side is known-selective
    (the planner's heuristics don't fire on e.g. a filtered subquery with
    no stats). ``bloom_filter_agg`` is not SQL-registered in OSS Spark, so
    the filter is a *bucket set*: each dim key marks ``num_hashes`` buckets
    (``xxhash64(key, seed) % num_buckets``), the distinct bucket set is
    broadcast, and a fact row survives only if ALL its buckets are present
    — the Bloom membership rule, as chained broadcast LEFT SEMI joins that
    Catalyst executes as in-memory hash probes with zero extra shuffle.
    False positives (collisions) are removed by the exact equi-join that
    follows, so the result is identical to the plain join; false negatives
    are impossible.

    Sizing: the broadcast set is ≤ min(num_buckets, num_hashes × |dim|)
    longs. With the default 4M buckets and a 100k-key dim side, FP rate
    ≈ (2·10^5/4·10^6)^2 ≈ 0.25% — the fact shuffle shrinks to ~the true
    match set. Only worthwhile when the dim side is much smaller than the
    fact side; with a non-selective dim the semi joins are a wasted probe
    pass (they never change the result either way).
    """
    nb, nh = int(num_buckets), int(num_hashes)
    # xxhash64 is type-sensitive (hash(7::int) != hash(7::bigint)) while the
    # exact equi-join below coerces mismatched key types before comparing —
    # hashing the raw columns would silently prune every fact row whose key
    # type differs from the dim's, breaking the no-false-negatives contract.
    # Hash both sides through one common type chosen like Spark's own join
    # coercion: numeric↔numeric widens to double, anything else goes through
    # string.
    ft = dict(fact.dtypes)[fact_key]
    dt = dict(dim.dtypes)[dim_key]

    def _is_numeric(t: str) -> bool:
        # decimal(p,s) is numeric too — hashing it through the string
        # branch would render '7.00' vs '7' and falsely prune matches
        return t in {"tinyint", "smallint", "int", "bigint", "float", "double"} or (
            t.startswith("decimal")
        )

    if ft == dt:
        common = None
    elif _is_numeric(ft) and _is_numeric(dt):
        # Spark's comparison coercion promotes numeric↔numeric through a
        # wider numeric; double hashes identically on both sides.
        common = "double"
    elif "string" in (ft, dt) and (_is_numeric(ft) or _is_numeric(dt)):
        # numeric↔string compares through double in Spark's coercion
        common = "double"
    else:
        # Key-type pair outside the handled coercion set (date↔timestamp,
        # binary↔string, …): a wrong common type would create false
        # negatives, which this function's contract forbids. Skip the
        # prefilter — the exact join alone is always correct.
        return fact.join(dim, fact[fact_key] == dim[dim_key], "inner")

    def _hkey(col: Column) -> Column:
        return col.cast(common) if common else col

    keys = dim.select(_hkey(F.col(dim_key)).alias("__k")).filter(
        F.col("__k").isNotNull()
    )
    pruned = fact
    for i in range(nh):
        buckets = keys.select(
            F.pmod(F.xxhash64("__k", F.lit(i)), F.lit(nb)).alias("__b")
        ).distinct()
        pruned = pruned.withColumn(
            "__b", F.pmod(F.xxhash64(_hkey(F.col(fact_key)), F.lit(i)), F.lit(nb))
        ).join(F.broadcast(buckets), "__b", "left_semi").drop("__b")
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")


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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int = 3_600_000,
) -> DataFrame:
    """Interval×interval OVERLAP join (``ls <= re AND rs <= le``) via
    shared-bin replication — the symmetric sibling of
    :func:`range_join_binned`.

    A raw overlap predicate plans as a nested-loop join; here BOTH sides
    replicate onto every ``bin_width`` bin they touch and meet in one
    equi-join on (keys…, bin). Every overlapping pair shares at least the
    bin containing ``max(ls, rs)`` (the overlap's left edge), and it is
    the ONLY bin where that maximum lies in the bin's own range — so
    keeping exactly the rows where ``floor(max(ls, rs) / bw) == bin``
    emits each pair once with NO distinct/dedup shuffle. That filter is
    the standard trick that makes binned overlap joins exactly-once.

    Sizing is the same calculus as the point-in-interval form: replication
    factor ≈ interval_length/bin_width + 1 per side; the join itself is a
    plain hash exchange on small (keys, bin) tuples. Inputs must share
    ``keys`` and use one numeric unit (e.g. epoch millis). End columns
    are inclusive.
    """
    bw = int(bin_width)
    lf = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / F.lit(bw)),
                F.floor(F.col(left_end) / F.lit(bw)),
            )
        ),
    )
    rt = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / F.lit(bw)),
                F.floor(F.col(right_end) / F.lit(bw)),
            )
        ),
    )
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    first_shared_bin = F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / F.lit(bw)
    )
    return (
        lf.join(rt, [*keys, "__bin"])
        .where(overlap & (F.col("__bin") == first_shared_bin))
        .drop("__bin")
    )
