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


def test_weighted_ticket_sample_bias_and_determinism(spark):
    from kinesis_data_counter_spark.operators.sampling import weighted_ticket_sample

    # 500 light rows (w=1) vs 500 heavy rows (w=10) in one group: heavy rows
    # must win far more of the 50 slots than light ones
    df = spark.createDataFrame(
        [("g", i, 10 if i < 500 else 1) for i in range(1000)],
        "source string, doc_id long, wt long",
    )
    from pyspark.sql import functions as F

    out1 = weighted_ticket_sample(df, F.col("wt"), k=50).collect()
    out2 = weighted_ticket_sample(df, F.col("wt"), k=50).collect()
    assert [r["doc_id"] for r in out1] == [r["doc_id"] for r in out2]  # deterministic
    heavy = sum(1 for r in out1 if r["doc_id"] < 500)
    assert heavy >= 35, heavy  # ≈ 10:1 odds per slot; 35+ of 50 with margin
    assert len(out1) == 50
    # weight clamped into [1, 16]
    assert all(1 <= r["w"] <= 16 for r in out1)


def test_weighted_ticket_sample_small_group_returns_all(spark):
    from pyspark.sql import functions as F

    from kinesis_data_counter_spark.operators.sampling import weighted_ticket_sample

    df = spark.createDataFrame(
        [("a", 1, 3), ("a", 2, 1), ("b", 3, 1)], "source string, doc_id long, wt long"
    )
    out = weighted_ticket_sample(df, F.col("wt"), k=10).collect()
    assert {(r["source"], r["doc_id"]) for r in out} == {("a", 1), ("a", 2), ("b", 3)}


def test_temperature_mix_rates_semantics(spark):
    from kinesis_data_counter_spark.operators.sampling import temperature_mix_rates

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, lang string",
    )
    # alpha=0: uniform shares regardless of size
    out = {r["lang"]: r for r in temperature_mix_rates(df, alpha=0.0, budget=100).collect()}
    assert out["big"]["share"] == out["small"]["share"] == 0.5
    # the small group's keep rate must exceed the big group's (lifted)
    assert out["small"]["keep_rate"] > out["big"]["keep_rate"]
    # alpha=1 + no budget: natural proportions, max group at rate 1.0
    nat = {r["lang"]: r for r in temperature_mix_rates(df, alpha=1.0).collect()}
    assert nat["big"]["keep_rate"] == 1.0 == nat["small"]["keep_rate"]
    # budget respected in expectation
    tot = sum(r["expected_kept"] for r in out.values())
    assert abs(tot - 100) < 1.0


def test_class_balance_downsamples_to_minority(spark):
    from kinesis_data_counter_spark.operators.sampling import class_balance

    df = spark.createDataFrame(
        [(i, "maj") for i in range(100)]
        + [(1000 + i, "mid") for i in range(40)]
        + [(2000 + i, "min") for i in range(7)],
        "id long, label string",
    )
    kept = class_balance(df, "label", "id")
    counts = {r.label: r.n for r in kept.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert counts == {"maj": 7, "mid": 7, "min": 7}
    # deterministic: same survivors on a rerun
    ids1 = sorted(r.id for r in kept.collect())
    ids2 = sorted(r.id for r in class_balance(df, "label", "id").collect())
    assert ids1 == ids2
    # cap overrides the minority size downward
    capped = class_balance(df, "label", "id", cap=3)
    assert capped.count() == 9


# ---------------------------------------------------------------------------
# round-4: token_budget_mix (epoch up/downsampling by token budget)
# ---------------------------------------------------------------------------

def test_token_budget_mix_rates_and_upsampling(spark):
    from kinesis_data_counter_spark.operators.sampling import token_budget_mix

    rows = []
    for i in range(40):
        rows.append((i, "big", "w " * 10))       # 10 tokens each, 400 total
    for i in range(40, 60):
        rows.append((i, "small", "w " * 5))      # 5 tokens each, 100 total
    for i in range(60, 70):
        rows.append((i, "unbudgeted", "w w w"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    mixed, report = token_budget_mix(
        df, {"big": 100, "small": 250}, source_col="source"
    )
    rep = {r["source"]: r for r in report.collect()}
    # big: rate 0.25 -> ~10 docs kept, no copies > 1
    assert rep["big"]["total_tokens"] == 400 and rep["big"]["budget"] == 100
    assert 0 < rep["big"]["n_rows_out"] < 40
    # small: rate 2.5 -> every doc twice, ~half a third time
    assert rep["small"]["total_tokens"] == 100
    assert 40 <= rep["small"]["n_rows_out"] <= 60
    m = mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.max("copy").alias("maxc")
    )
    got = {r["source"]: (r["n"], r["maxc"]) for r in m.collect()}
    assert "unbudgeted" not in got            # no budget -> dropped
    assert got["big"][1] == 1                 # downsample never duplicates
    assert got["small"][1] == 3               # 2 full epochs + fractional
    assert got["big"][0] == rep["big"]["n_rows_out"]
    assert got["small"][0] == rep["small"]["n_rows_out"]
    # rows-out tokens match the report accounting
    assert rep["small"]["tokens_out"] == 5 * rep["small"]["n_rows_out"]


def test_token_budget_mix_deterministic_and_growth_stable(spark):
    from kinesis_data_counter_spark.operators.sampling import token_budget_mix

    rows = [(i, "s", "a b c d") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    m1, _ = token_budget_mix(df, {"s": 100})
    m2, _ = token_budget_mix(df.repartition(7), {"s": 100})
    a = sorted((r["doc_id"], r["copy"]) for r in m1.collect())
    b = sorted((r["doc_id"], r["copy"]) for r in m2.collect())
    assert a == b and a  # deterministic under partitioning


def test_leakage_safe_split_keeps_clusters_together(spark):
    from kinesis_data_counter_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # clusters: chains {0,1,2}, {10,11}, {50,51,52,53}; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (50, 51), (51, 52), (52, 53)],
        "a_id long, b_id long",
    )
    out = {r["doc_id"]: r["split"] for r in leakage_safe_split(docs, pairs).collect()}
    assert len(out) == 200
    for cluster in [(0, 1, 2), (10, 11), (50, 51, 52, 53)]:
        assert len({out[d] for d in cluster}) == 1, cluster
    # singletons follow the plain hash split exactly (same key, same salt)
    plain = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    clustered = {0, 1, 2, 10, 11, 50, 51, 52, 53}
    for d in range(200):
        if d not in clustered:
            assert out[d] == plain[d]
    # cluster members follow their representative's (min id) assignment
    assert out[1] == out[2] == plain[0]
    assert out[53] == plain[50]


def test_shuffle_shards_matches_python_md5_and_is_growth_stable(spark):
    import hashlib

    from kinesis_data_counter_spark.operators.sampling import shuffle_shards

    ids = list(range(200))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["shard"], r["ticket"])
        for r in shuffle_shards(df, n_shards=8, seed="s").collect()
    }

    def expect(i):
        h = hashlib.md5(f"shuffle:s:{i}".encode()).hexdigest()
        # 8 equal 16-bit hex ranges: bucket = number of bounds <= prefix
        bounds = [format(round((k + 1) / 8 * 65536), "04x") for k in range(7)]
        shard = sum(1 for b in bounds if h[:4] >= b)
        return shard, h

    assert got == {i: expect(i) for i in ids}

    # growth stability: doubling the corpus never moves an existing doc
    df2 = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    got2 = {
        r["doc_id"]: (r["shard"], r["ticket"])
        for r in shuffle_shards(df2, n_shards=8, seed="s").collect()
    }
    assert all(got2[i] == got[i] for i in ids)


def test_shuffle_shards_null_id_and_single_shard(spark):
    import pytest

    from kinesis_data_counter_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(None,), (1,)], "doc_id long")
    got = {r["doc_id"]: (r["shard"], r["ticket"]) for r in shuffle_shards(df).collect()}
    assert got[None] == (None, None)
    assert got[1][0] is not None and got[1][1] is not None

    one = shuffle_shards(df, n_shards=1).collect()
    assert {r["shard"] for r in one if r["doc_id"] is not None} == {0}
    with pytest.raises(ValueError):
        shuffle_shards(df, n_shards=0)


def test_shuffle_shards_concatenation_is_a_seeded_permutation(spark):
    from kinesis_data_counter_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    rows = shuffle_shards(df, n_shards=4, seed="p").collect()
    order = [r["doc_id"] for r in sorted(rows, key=lambda r: (r["shard"], r["ticket"]))]
    assert sorted(order) == list(range(300))  # a permutation…
    assert order != list(range(300))  # …that actually shuffles
    # roughly balanced shards (binomial, n=300, p=1/4)
    from collections import Counter

    c = Counter(r["shard"] for r in rows)
    assert set(c) == {0, 1, 2, 3} and all(40 <= v <= 110 for v in c.values())
