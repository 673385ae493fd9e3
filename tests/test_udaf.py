"""Edge cases of the GROUPED_AGG weighted-median extension point."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_data_counter_spark.functions.udafs import weighted_median


def _agg(spark, rows):
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = df.groupBy("g").agg(weighted_median("v", "w").alias("m"))
    return {r["g"]: r["m"] for r in out.collect()}


def test_weighted_median_basic_and_skewed_weights(spark):
    got = _agg(
        spark,
        [
            ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 1.0),  # plain median
            ("b", 1.0, 1.0), ("b", 2.0, 10.0), ("b", 100.0, 1.0),  # heavy middle
            ("c", 5.0, 100.0), ("c", 6.0, 1.0),  # heavy first value wins
        ],
    )
    assert got["a"] == 2.0
    assert got["b"] == 2.0
    assert got["c"] == 5.0


def test_weighted_median_nulls_and_single(spark):
    got = _agg(
        spark,
        [
            ("n", None, 1.0), ("n", 4.0, None), ("n", 7.0, 2.0),  # nulls dropped
            ("s", 9.0, 0.5),  # single row
            ("z", None, 1.0),  # all-null group
        ],
    )
    assert got["n"] == 7.0
    assert got["s"] == 9.0
    assert got["z"] is None


def test_weighted_median_duplicate_values_deterministic(spark):
    # runs of equal values: the chosen value is the one whose cumulative
    # weight first reaches half, independent of tie order
    got = _agg(
        spark,
        [("d", 1.0, 1.0), ("d", 1.0, 1.0), ("d", 3.0, 1.0), ("d", 3.0, 1.0)],
    )
    assert got["d"] == 1.0  # cum at value 1.0 run end = 2 >= total/2 = 2
