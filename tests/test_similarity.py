"""Similarity-search operator tests on hand-built vectors."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kinesis_data_counter_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def vectors(spark):
    # 2 tight clusters around orthogonal axes + one diagonal outlier
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),
        (2, [0.98, 0.0, 0.1, 0.0]),
        (10, [0.0, 1.0, 0.0, 0.0]),
        (11, [0.0, 0.99, 0.1, 0.0]),
        (12, [0.0, 0.98, 0.0, 0.1]),
        (99, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(vectors):
    res = SIM.cosine_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=3)
    rows = res.orderBy("rank").collect()
    assert [r.neighbor_id for r in rows] == [1, 2, 99]
    assert rows[0].sim > rows[1].sim > rows[2].sim
    # cosine(e0, v1) = 0.99/|v1|
    assert rows[0].sim == pytest.approx(0.99 / math.sqrt(0.99**2 + 0.1**2), abs=1e-6)


def test_cosine_topk_excludes_self(vectors):
    res = SIM.cosine_topk(vectors, vectors, k=3)
    assert res.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0
    # every query gets exactly k rows with ranks 1..k
    per = res.groupBy("query_id").agg(
        F.count("*").alias("n"), F.collect_set("rank").alias("ranks")
    )
    for r in per.collect():
        assert r.n == 3 and sorted(r.ranks) == [1, 2, 3]


def test_ann_lsh_recall_on_clustered(vectors):
    res = SIM.ann_recall_check(
        vectors, vectors, dim=4, k=2, min_recall=0.5, num_bits=2, num_tables=8
    ).collect()[0]
    assert res.ok


def test_dot_zero_and_orthogonal(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.0, 1.0])],
        "id long, a array<double>, b array<double>",
    )
    r = df.select(SIM.dot(F.col("a"), F.col("b")).alias("d")).collect()[0]
    assert r.d == 0.0
