"""Curated write path: directory layout, pruning, and roundtrip fidelity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kinesis_data_counter_spark.io import write_curated
from kinesis_data_counter_spark.session import load_tables


def test_write_curated_layout_and_pruned_read(spark, sf_dir, tmp_path):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = str(tmp_path / "curated")
    write_curated(
        docs, out, partition_by=("lang",), sort_by=("n_chars",),
        max_records_per_file=1000,
    )
    # hive-style one-directory-per-value layout
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert dirs == {f"lang={l}" for l in langs}

    back = spark.read.parquet(out)
    # roundtrip fidelity (partition column is restored from the path)
    assert back.count() == docs.count()
    a = {(r.doc_id, r.lang, r.n_chars) for r in back.select("doc_id", "lang", "n_chars").collect()}
    b = {(r.doc_id, r.lang, r.n_chars) for r in docs.select("doc_id", "lang", "n_chars").collect()}
    assert a == b

    # a lang filter must become a PartitionFilter (pruning), not a data filter
    plan = (
        back.filter(F.col("lang") == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(lang" in plan or "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters:", 1)[1][:120]
    assert "lang" in pf


def test_upsert_partitions_replaces_only_touched_windows(spark, tmp_path):
    from kinesis_data_counter_spark.io import upsert_partitions

    path = str(tmp_path / "counters")
    first = spark.createDataFrame(
        [("w1", "a", 10), ("w1", "b", 20), ("w2", "a", 30)],
        "window string, k string, v long",
    )
    upsert_partitions(first, path, partition_by=("window",))

    # reprocess w2 with corrected values and add w3; w1 must be untouched
    second = spark.createDataFrame(
        [("w2", "a", 99), ("w3", "z", 1)], "window string, k string, v long"
    )
    upsert_partitions(second, path, partition_by=("window",))

    got = {
        (r["window"], r["k"]): r["v"] for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("w1", "a"): 10,
        ("w1", "b"): 20,
        ("w2", "a"): 99,  # replaced, not duplicated
        ("w3", "z"): 1,
    }
    # conf restored after the write
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        != "dynamic"
    )


def test_upsert_partitions_requires_partition_cols(spark):
    import pytest

    from kinesis_data_counter_spark.io import upsert_partitions

    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError, match="partition column"):
        upsert_partitions(df, "/tmp/nope", partition_by=())
