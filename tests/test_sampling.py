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


def test_stratified_keep_rates_and_clamp(spark):
    from kinesis_data_counter_spark.operators.sampling import stratified_keep

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    keep = stratified_keep(
        F.col("doc_id"), F.col("lang"), {"en": 1.0, "de": 0.25}, default_rate=0.0
    )
    out = df.filter(keep).groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in out}
    assert got["en"] == 2000          # rate 1.0 keeps EVERY row ('g' clamp)
    assert 350 < got.get("de", 0) < 650   # ~25% of 2000, md5-threshold spread
    # deterministic: same predicate, same rows
    again = {r.lang: r["count"] for r in df.filter(keep).groupBy("lang").count().collect()}
    assert again == got


def test_decontaminate_planted_overlap(spark):
    from kinesis_data_counter_spark.operators.corpus import decontaminate

    phrase = "alpha beta gamma delta epsilon zeta"
    train = spark.createDataFrame(
        [
            (1, f"noise words here {phrase} more noise"),   # contains eval 6-gram
            (2, "completely unrelated text with other words entirely"),
            (3, "alpha beta gamma delta different tail words"),  # only 4-gram overlap
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, f"prefix {phrase} suffix")], "doc_id long, text string")
    got = sorted(r.doc_id for r in decontaminate(train, ev, n=6).collect())
    assert got == [1]
