"""Deterministic hash-split tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_data_counter_spark.operators.sampling import hash_split


def test_split_stable_under_repartition_and_growth(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(13)).collect()
    }
    assert a == b
    # adding rows never moves an existing row's split
    grown = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    g = {r["doc_id"]: r["split"] for r in hash_split(grown).collect()}
    assert all(g[k] == v for k, v in a.items())


def test_split_fractions_approximate(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    counts = {
        r["split"]: r["n"]
        for r in hash_split(df).groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.02
    assert abs(counts["test"] / 20000 - 0.1) < 0.02


def test_salt_derives_independent_split(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    s = {r["doc_id"]: r["split"] for r in hash_split(df, salt="v2").collect()}
    assert a != s  # different salt, different assignment
    moved = sum(1 for k in a if a[k] != s[k])
    assert moved > 100  # materially different, not a near-copy


def test_split_rejects_bad_fractions(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, splits=(("train", 0.8), ("val", 0.1)))
