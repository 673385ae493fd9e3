"""Curated-dataset write path: partitioned, sorted, size-bounded parquet.

The output contract of a curation pipeline at 100 TB: data laid out so the
NEXT job's scans are cheap. Three levers, all engine-native:

- ``partitionBy(keys)``: one directory per key value → partition PRUNING at
  read time (a reader filtering ``lang = 'en'`` never opens other dirs).
  Keys must be low-cardinality (lang, split, date) — a high-cardinality
  partition key creates a small-file explosion.
- ``sortWithinPartitions(cols)``: rowgroup-level min/max statistics become
  selective → rowgroup SKIPPING for range predicates on the sort column.
- ``maxRecordsPerFile``: bounds file size regardless of task layout, so
  downstream split planning sees uniform work units.

``repartition(keys)`` before the write aligns task boundaries with
directory boundaries — without it every task can write a file into every
partition directory (tasks × partitions small files).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_curated(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    sort_by: Sequence[str] = (),
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a curated parquet dataset (see module doc)."""
    out = df
    if partition_by:
        out = out.repartition(*partition_by)
    if sort_by or partition_by:
        # the parquet writer requires task rows ordered by the partition
        # columns and INSERTS ITS OWN (unstable) sort when they are not —
        # which would destroy sort_by. Sorting by (partition_by ∥ sort_by)
        # satisfies the writer's requirement, so each output file keeps the
        # sort_by order and gets selective rowgroup min/max stats.
        out = out.sortWithinPartitions(*partition_by, *sort_by)
    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def upsert_partitions(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    sort_by: Sequence[str] = (),
    max_records_per_file: int | None = None,
) -> None:
    """Idempotent partition-level upsert: replace exactly the partitions
    present in ``df``, leave all others untouched.

    This is the sink contract a windowed pipeline needs for safe
    reprocessing: re-running window W overwrites W's directory instead of
    appending duplicates (the reference's sink just re-PUTs records and
    relies on downstream dedup, run.go sinks; here the storage layout IS
    the dedup). Implemented with Spark's dynamic partition-overwrite mode —
    overwrite resolves per partition directory at commit time, so a 100 TB
    table with years of history pays only for the partitions being
    replaced, never a full rewrite.

    The session's ``partitionOverwriteMode`` is set to ``dynamic`` for the
    duration of the write and restored after (the default ``static`` mode
    would truncate the whole table first — silently destructive for this
    use case).
    """
    if not partition_by:
        raise ValueError("upsert_partitions requires at least one partition column")
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        write_curated(
            df,
            path,
            partition_by=partition_by,
            sort_by=sort_by,
            max_records_per_file=max_records_per_file,
            mode="overwrite",
        )
    finally:
        spark.conf.set(key, prev)
