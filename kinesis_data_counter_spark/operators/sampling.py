"""Deterministic, engine-portable sampling/splitting for training pipelines.

Random `df.sample()` is useless for dataset curation: splits must be
REPRODUCIBLE (same row → same split on every run, every engine, every
partitioning) and STABLE under corpus growth (adding docs never moves an
existing doc between splits). The standard construction is hash-bucketing:
split by a threshold on a cryptographic hash of the row key. md5's hex
form is byte-identical across engines, and hex strings compare
lexicographically like the numbers they encode, so thresholds are plain
string comparisons — no host-specific hash functions, no RNG state, and
the whole rule is expressible in ANSI SQL for the oracle.

Scale: one narrow projection, no shuffle, codegen-eligible; the split
column is a plain string usable as a partition key on write.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_DIGITS = 4  # 16-bit buckets: split fractions resolve to 1/65536


def split_column(
    id_col: Column,
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "",
) -> Column:
    """Split label for a row key: threshold on the first 16 bits of
    md5(salt || key). Fractions must sum to 1 (±1e-9); the last split
    absorbs rounding. ``salt`` derives independent splits from one key.

    NULL keys have no identity to hash, so their label is NULL — made
    EXPLICIT on both engines because the engines' implicit behaviors
    diverge (Spark's NULL-propagating ``concat`` fell through to the last
    split; DuckDB's NULL-skipping ``concat`` hashed the bare salt).
    """
    fracs = [f for _, f in splits]
    if abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {sum(fracs)}")
    h = F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, _HEX_DIGITS)
    expr = F.lit(splits[-1][0])
    acc = 0.0
    # build the CASE from the right so earlier thresholds take precedence
    cases: list[tuple[str, str]] = []
    for name, frac in splits[:-1]:
        acc += frac
        cases.append((name, format(int(round(acc * (16**_HEX_DIGITS))), f"0{_HEX_DIGITS}x")))
    for name, bound in reversed(cases):
        expr = F.when(h < F.lit(bound), F.lit(name)).otherwise(expr)
    return F.when(id_col.isNull(), F.lit(None).cast("string")).otherwise(expr)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Append a deterministic split label keyed on ``id_col``."""
    return df.withColumn(split_col, split_column(F.col(id_col), splits, salt))


def split_sql_case(
    id_expr: str,
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "",
) -> str:
    """The identical rule as ANSI SQL (used by the DuckDB oracle)."""
    h = f"substring(md5(concat('{salt}', CAST({id_expr} AS VARCHAR))), 1, {_HEX_DIGITS})"
    acc = 0.0
    whens = [f"WHEN {id_expr} IS NULL THEN NULL"]
    for name, frac in list(splits)[:-1]:
        acc += frac
        bound = format(int(round(acc * (16**_HEX_DIGITS))), f"0{_HEX_DIGITS}x")
        whens.append(f"WHEN {h} < '{bound}' THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{splits[-1][0]}' END"


def stratified_keep(
    id_col: Column,
    strata_col: Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strat",
) -> Column:
    """Deterministic per-stratum downsampling predicate.

    Each stratum keeps its own fraction of rows, decided by the same
    engine-portable md5-hex threshold as ``split_column`` — reproducible,
    growth-stable, and expressible in ANSI SQL for the oracle. Corpus
    rebalancing (e.g. downsample over-represented languages) in one
    codegen-only projection, no shuffle, no RNG.

    NULL contract (pinned by the NULL-key property tests): a NULL id has
    no identity, so the row is DROPPED — here via Spark's NULL-propagating
    ``concat``/comparison, and explicitly in the SQL twin (DuckDB's
    ``concat`` skips NULLs and would otherwise keep such rows at a
    constant hash). A NULL stratum falls through to ``default_rate`` on
    both engines.
    """
    h = F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, _HEX_DIGITS)

    def bound(rate: float) -> str:
        # rate ≥ 1 → 'g': lexicographically above every hex string (keep all);
        # a 1.0 threshold would otherwise format to 5 digits and sort wrong
        if rate >= 1.0:
            return "g"
        return format(int(round(rate * (16**_HEX_DIGITS))), f"0{_HEX_DIGITS}x")

    expr: Column = h < F.lit(bound(default_rate))
    for stratum, rate in rates.items():
        expr = F.when(strata_col == stratum, h < F.lit(bound(rate))).otherwise(expr)
    return expr


def stratified_sql_predicate(
    id_expr: str,
    strata_expr: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strat",
) -> str:
    """The identical keep-rule as ANSI SQL (used by the DuckDB oracle)."""

    def bound(rate: float) -> str:
        if rate >= 1.0:
            return "g"
        return format(int(round(rate * (16**_HEX_DIGITS))), f"0{_HEX_DIGITS}x")

    h = f"substring(md5(concat('{salt}', CAST({id_expr} AS VARCHAR))), 1, {_HEX_DIGITS})"
    cases = " ".join(
        f"WHEN {strata_expr} = '{s}' THEN {h} < '{bound(r)}'" for s, r in rates.items()
    )
    # NULL ids are dropped on both engines (see stratified_keep docstring)
    return f"({id_expr} IS NOT NULL AND (CASE {cases} ELSE {h} < '{bound(default_rate)}' END))"


def weighted_ticket_sample(
    df: DataFrame,
    weight_col: Column,
    k: int = 20,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "wts1",
) -> DataFrame:
    """Deterministic weighted sampling: top-``k`` per group by lottery ticket.

    Each row gets ``w`` (integer weight, clamped to [1, 16]) tickets —
    ``md5(salt ∥ id ∥ '-' ∥ i)`` — and its priority is the MINIMUM ticket;
    the k smallest priorities per group win. A row with twice the tickets
    has roughly twice the chance its minimum lands in the winning range
    (exactly the weighted-reservoir intuition with integer weights), and
    the whole scheme is engine-portable because priorities are hex STRINGS
    compared lexicographically — no float conversion whose last-ulp
    behavior could differ between engines (see module doc).

    Scale notes: the ticket array is ≤16 elements per row built inside the
    row's task (no shuffle), and the per-group top-k is one window rank —
    at 100 TB prefer grouping into enough strata that each group's rank
    sort stays within a task's memory.
    """
    w = F.least(F.lit(16), F.greatest(F.lit(1), weight_col.cast("int")))
    ticket = lambda i: F.md5(
        F.concat(F.lit(salt), F.col(id_col).cast("string"), F.lit("-"), i.cast("string"))
    )
    pri = F.array_min(F.transform(F.sequence(F.lit(1), w), ticket))
    ranked = df.select(
        F.col(group_col), F.col(id_col), w.alias("w"), pri.alias("pri")
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy("pri", id_col)
        ),
    )
    return ranked.where(F.col("rn") <= k).select(
        group_col, id_col, "w", "pri"
    )


def temperature_mix_rates(
    df: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    budget: int | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group keep rates for temperature-based corpus mixing.

    The standard multilingual rebalancing rule (XLM-R-style temperature
    sampling, public): target share of group g ∝ count_g^alpha — alpha=1
    keeps natural proportions, alpha→0 flattens toward uniform, lifting
    low-resource groups. With a total ``budget`` of rows, the keep rate is
    ``min(1, budget·share/count)`` (a group can't be sampled above 1.0 —
    upsampling is a separate concern); with no budget, rates are
    normalized so the largest group keeps 1.0.

    One aggregate over the corpus plus a broadcast of the (tiny) group
    table back onto itself — no driver-side collect; the result feeds
    ``stratified_keep`` directly. All arithmetic is deterministic given
    (alpha, budget) and emitted rounded, so the oracle replays it exactly.

    Returns (group, n_docs, share, keep_rate, expected_kept).
    """
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    tot = counts.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))).alias("__z")
    )
    scored = counts.crossJoin(F.broadcast(tot)).withColumn(
        "share", w / F.col("__z")
    )
    if budget is not None:
        rate = F.least(
            F.lit(1.0), F.lit(float(budget)) * F.col("share") / F.col("n_docs")
        )
    else:
        # normalize so the most-sampled group (max share/count) keeps 1.0
        m = scored.agg(F.max(F.col("share") / F.col("n_docs")).alias("__m"))
        scored = scored.crossJoin(F.broadcast(m))
        rate = (F.col("share") / F.col("n_docs")) / F.col("__m")
    return scored.select(
        F.col("grp").alias(group_col),
        "n_docs",
        F.round("share", round_digits).alias("share"),
        F.round(rate, round_digits).alias("keep_rate"),
        F.round(rate * F.col("n_docs"), 2).alias("expected_kept"),
    )


def class_balance(
    df: DataFrame,
    label_col: str,
    id_col: str,
    cap: int | None = None,
) -> DataFrame:
    """Downsample every class to the minority class size (or ``cap``).

    The class-imbalance fix for a labeled training set, deterministic and
    engine-portable: within each label, rows rank by md5(id) (a stable
    pseudo-random order — same survivors every run and engine) and only
    the first ``min_class_count`` (or ``cap``) survive.

    Plan: one count aggregate for the minority size (broadcast to every
    row), one window shuffle keyed by the label for the rank. The rank
    window is per-label, so skewed majority classes parallelize only up
    to one partition per label — at extreme scale swap the row_number for
    a threshold on the md5 hex itself (≈ keep_fraction = target/size,
    zero window), traded here for the exact-count guarantee.
    """
    ticket = F.md5(F.col(id_col).cast("string"))
    sizes = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__n"))
    target = sizes.agg(F.min("__n").alias("__target"))
    if cap is not None:
        target = target.select(F.least("__target", F.lit(cap)).alias("__target"))
    w = Window.partitionBy(label_col).orderBy(ticket.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .crossJoin(F.broadcast(target))
        .filter(F.col("__rk") <= F.col("__target"))
        .drop("__rk", "__target")
    )


def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "tbm",
) -> tuple[DataFrame, DataFrame]:
    """Token-budget data mixing with epoch upsampling.

    Training mixes are specified in TOKENS per source, not document
    rates: each source's sampling rate is ``budget / total_tokens``. A
    rate above 1 means the source repeats — ``floor(rate)`` full epochs
    (every doc emitted that many times, ``copy`` = 1..n) plus one
    fractional epoch sampled by the same engine-portable md5 ticket as
    ``split_column``; a rate below 1 is a plain deterministic
    downsample. Sources with no budget are dropped.

    Everything is one totals aggregate (broadcast back — |sources| rows)
    plus a row-local explode: no shuffle of the corpus beyond the
    ``sequence``-explode fan-out itself, and the fractional threshold is
    a runtime 4-hex-digit bound (``lower(lpad(hex(floor(frac·16⁴))))``)
    so DuckDB replays the selection bit-for-bit.

    Returns ``(mixed, report)``: ``mixed`` is the input rows replicated
    with a ``copy`` index (1-based); ``report`` is one row per budgeted
    source — (source, n_docs, total_tokens, budget, n_rows_out,
    tokens_out).
    """
    from kinesis_data_counter_spark.operators.text import token_count

    base = df.withColumn("__tok", token_count(F.col(text_col)).cast("long"))
    totals = base.groupBy(source_col).agg(
        F.sum("__tok").alias("__tot"), F.count(F.lit(1)).alias("__docs")
    )
    budget = F.lit(None).cast("long")
    for src, b in sorted(budgets.items()):
        budget = F.when(F.col(source_col) == src, F.lit(int(b))).otherwise(budget)
    rates = totals.select(
        source_col,
        "__tot",
        "__docs",
        budget.alias("__budget"),
    ).withColumn(
        "__rate",
        F.when(
            F.col("__budget").isNotNull() & (F.col("__tot") > 0),
            F.col("__budget").cast("double") / F.col("__tot").cast("double"),
        ).otherwise(F.lit(0.0)),
    ).withColumn("__full", F.floor("__rate").cast("int")).withColumn(
        "__bound",
        F.lower(
            F.lpad(
                F.hex(
                    F.floor((F.col("__rate") - F.col("__full")) * (16**_HEX_DIGITS))
                    .cast("int")
                ),
                _HEX_DIGITS,
                "0",
            )
        ),
    )
    ticket = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, _HEX_DIGITS
    )
    joined = base.join(F.broadcast(rates), source_col).withColumn(
        "__copies", F.col("__full") + (ticket < F.col("__bound")).cast("int")
    )
    # sequence(1, 0) would DESCEND ([1, 0]); gate on copies > 0 instead so
    # zero-copy docs drop out via the empty-array explode
    mixed = joined.withColumn(
        "copy",
        F.explode(
            F.when(
                F.col("__copies") > 0, F.sequence(F.lit(1), F.col("__copies"))
            ).otherwise(F.array().cast("array<int>"))
        ),
    ).drop("__tot", "__docs", "__budget", "__rate", "__full", "__bound", "__copies")
    report = (
        joined.filter(F.col("__budget").isNotNull())
        .groupBy(source_col)
        .agg(
            F.first("__docs").alias("n_docs"),
            F.first("__tot").alias("total_tokens"),
            F.first("__budget").alias("budget"),
            F.sum("__copies").cast("long").alias("n_rows_out"),
            F.sum(F.col("__tok") * F.col("__copies")).cast("long").alias("tokens_out"),
        )
    )
    return mixed.drop("__tok"), report


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Near-dup-aware train/val/test split: every document in a duplicate
    CLUSTER lands in the same split.

    `hash_split` keyed on the doc id silently leaks evaluation data — a
    near-duplicate of a test doc in the training set is contamination the
    benchmark can't see. Here the split key is the cluster representative
    (min doc id of the near-dup component, from
    ``dedup.connected_components`` over the pair graph); singleton docs
    key on themselves. One component computation over the PAIR graph
    (∝ near-dup population, not the corpus) plus a left join and the same
    md5 threshold rule as ``split_column`` — so the oracle replays the
    assignment exactly, and adding new docs never moves an existing
    CLUSTER between splits.
    """
    from kinesis_data_counter_spark.operators.dedup import connected_components

    cc = connected_components(pairs).withColumnRenamed("doc_id", id_col)
    rep = F.coalesce(F.col("cluster_id"), F.col(id_col))
    return (
        df.join(cc, id_col, "left")
        .withColumn(split_col, split_column(rep, splits, salt))
        .drop("cluster_id")
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "",
) -> DataFrame:
    """Deterministic global shuffle into training shards — WITHOUT a
    global sort.

    Training runs need the corpus in (pseudo)random order, reproducibly:
    the standard layout is N shard files whose concatenation is a seeded
    permutation of the data. A naive ``ORDER BY rand()`` is a full
    distributed sort of 100 TB; this operator shows the sort is never
    needed. md5(seed ∥ id) drives BOTH decisions: its 16-bit prefix
    hex-range-buckets the row into a shard (the same threshold rule as
    ``split_column`` with N equal fractions — no hex→int conversion, no
    modulus), and the full digest is the within-shard sort key. The write
    path is ``repartition(n, shard).sortWithinPartitions(ticket)`` — a
    plain hash exchange plus N independent LOCAL sorts, each 1/N of the
    data; reading shards 0..N−1 in ticket order replays the identical
    permutation on any engine, any cluster size, any partitioning.

    Adding documents never moves an existing doc between shards or
    reorders existing pairs within a shard (hash-keyed, not rank-keyed) —
    the property that makes incremental corpus growth append-cheap.

    NULL ids have no identity to hash: shard NULL, ticket NULL (the
    ``split_column`` rule).

    Returns the input plus (shard int, ticket string).
    """
    n = int(n_shards)
    if n < 1:
        raise ValueError(f"n_shards must be >= 1, got {n}")
    shards = [(str(i), 1.0 / n) for i in range(n)]
    idc = F.col(id_col)
    return df.withColumn(
        "shard",
        split_column(idc, shards, salt=f"shuffle:{seed}:").cast("int"),
    ).withColumn(
        "ticket",
        F.when(idc.isNull(), F.lit(None).cast("string")).otherwise(
            F.md5(F.concat(F.lit(f"shuffle:{seed}:"), idc.cast("string")))
        ),
    )
