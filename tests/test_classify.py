"""Multinomial NB classifier (operators/classify.py).

The registry oracle (tests/test_oracle.py) replays the full
train->score->argmax pipeline against DuckDB; these tests pin the
operator semantics on hand-built corpora where the right answer is
known by construction.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kinesis_data_counter_spark.operators import classify as CL


@pytest.fixture(scope="module")
def tiny(spark):
    # two clearly separable classes: 'cat'-heavy vs 'dog'-heavy docs
    rows = [
        (1, "a", "cat cat purr whiskers"),
        (2, "a", "cat purr cat nap"),
        (3, "a", "whiskers cat purr"),
        (4, "b", "dog bark dog fetch"),
        (5, "b", "dog fetch bark bark"),
        (6, "b", "bark dog fetch dog"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "label", "text"])


def test_train_model_shape(spark, tiny):
    m = CL.nb_train(tiny, label_col="label", vocab_size=100)
    table = m.table.collect()
    vocab = {r.term for r in table}
    # dense grid: every (class, vocab term) pair present exactly once
    assert len(table) == 2 * len(vocab)
    assert {"cat", "dog", "purr", "bark"} <= vocab
    priors = {r.label: r.logprior for r in m.priors.collect()}
    assert priors.keys() == {"a", "b"}
    # balanced classes -> both priors = ln(1/2)
    assert priors["a"] == priors["b"] == pytest.approx(math.log(0.5), abs=1e-6)


def test_score_separable(spark, tiny):
    m = CL.nb_train(tiny, label_col="label", vocab_size=100)
    probe = spark.createDataFrame(
        [(10, "cat purr"), (11, "dog bark bark"), (12, "cat dog")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.predicted for r in CL.nb_score(probe, m).collect()}
    assert out[10] == "a"
    assert out[11] == "b"
    # perfectly symmetric evidence + equal priors -> label-asc tie-break
    assert out[12] == "a"


def test_smoothing_math(spark, tiny):
    # hand-check one cell: logp('cat'|'b') with add-1 over the realized
    # vocabulary (class b never says 'cat')
    m = CL.nb_train(tiny, label_col="label", vocab_size=100)
    vocab_v = m.table.select("term").distinct().count()
    tot_b = 12  # class b token occurrences, all in-vocab here
    want = round(math.log((0 + 1.0) / (tot_b + vocab_v)), 6)
    got = m.table.filter((F.col("label") == "b") & (F.col("term") == "cat")).collect()
    assert got[0].logp == pytest.approx(want, abs=1e-9)


def test_zero_in_vocab_doc_scores_on_priors(spark, tiny):
    # priors made unequal: drop one 'b' doc -> prior argmax is 'a'
    m = CL.nb_train(tiny.filter(F.col("doc_id") != 6), label_col="label")
    probe = spark.createDataFrame(
        [(20, "zebra quux"), (21, None)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in CL.nb_score(probe, m).collect()}
    # OOV-only and NULL-text docs are classified (prior argmax), not lost
    assert rows[20].predicted == "a"
    assert rows[21].predicted == "a"
    assert rows[20].score == rows[21].score  # both are prior-only


def test_vocab_cap_and_tie_break(spark):
    # 3 terms, vocab_size=2: 'z' and 'a' tie on count -> term-asc keeps 'a'
    df = spark.createDataFrame(
        [(1, "x", "common common a"), (2, "y", "common common z")],
        ["doc_id", "label", "text"],
    )
    m = CL.nb_train(df, label_col="label", vocab_size=2)
    vocab = {r.term for r in m.table.select("term").distinct().collect()}
    assert vocab == {"common", "a"}


def test_confusion_counts(spark, tiny):
    m = CL.nb_train(tiny, label_col="label", vocab_size=100)
    scored = CL.nb_score(
        tiny.withColumnRenamed("label", "actual"), m, keep_cols=("actual",)
    )
    conf = {(r.actual, r.predicted): r.n_docs for r in CL.nb_confusion(scored).collect()}
    # training data is separable -> perfect diagonal
    assert conf == {("a", "a"): 3, ("b", "b"): 3}


def test_null_label_rows_excluded_from_training(spark, tiny):
    noisy = tiny.union(
        spark.createDataFrame([(7, None, "cat dog bark purr")], tiny.schema)
    )
    m_clean = CL.nb_train(tiny, label_col="label")
    m_noisy = CL.nb_train(noisy, label_col="label")
    assert sorted(m_clean.table.collect()) == sorted(m_noisy.table.collect())
    assert sorted(m_clean.priors.collect()) == sorted(m_noisy.priors.collect())


def test_partition_invariance(spark, tiny):
    m1 = CL.nb_train(tiny.repartition(7, "doc_id"), label_col="label")
    m2 = CL.nb_train(tiny.coalesce(1), label_col="label")
    assert sorted(m1.table.collect()) == sorted(m2.table.collect())
    probe = tiny.select("doc_id", "text")
    s1 = sorted(CL.nb_score(probe.repartition(5), m1).collect())
    s2 = sorted(CL.nb_score(probe.coalesce(1), m2).collect())
    assert s1 == s2


def test_nb_random_differential_vs_sql_twin(spark):
    # seeded random corpora through BOTH engines: Spark nb_train/nb_score
    # vs the nb_sql_ctes chain on the identical rows. Exercises vocab-
    # cutoff count ties, classes absent from the vocabulary, NULL texts,
    # and skewed priors — the edges a fixed fixture can't cover.
    import random

    import duckdb
    import pandas as pd

    from kinesis_data_counter_spark.operators.classify import (
        nb_score,
        nb_sql_ctes,
        nb_train,
    )

    for seed in (11, 23, 47):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]  # small vocab -> many ties
        labels = ["x", "y", "z"]
        rows = []
        for i in range(120):
            lab = labels[i % 3] if rng.random() > 0.1 else None
            text = (
                None
                if rng.random() < 0.05
                else " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8)))
            )
            rows.append((i, lab, text))
        train_rows = [r for r in rows if r[0] % 2 == 0 and r[1] is not None]
        score_rows = [(r[0], r[2]) for r in rows if r[0] % 2 == 1]

        tdf = spark.createDataFrame(train_rows, "doc_id long, label string, text string")
        sdf = spark.createDataFrame(score_rows, "doc_id long, text string")
        model = nb_train(tdf, label_col="label", vocab_size=8)  # cutoff bites
        got = sorted(
            (r.doc_id, r.predicted, r.score) for r in nb_score(sdf, model).collect()
        )
        got_m = sorted(
            (r.doc_id, r.predicted, r.score, r.margin)
            for r in CL.nb_score_margins(sdf, model).collect()
        )

        con = duckdb.connect()
        con.register("train_pd", pd.DataFrame(
            [(r[1], r[2]) for r in train_rows], columns=["label", "text"]
        ))
        con.register("score_pd", pd.DataFrame(score_rows, columns=["doc_id", "text"]))
        sql = (
            "WITH train AS (SELECT label, text FROM train_pd), "
            "score_in AS (SELECT doc_id, text FROM score_pd), "
            + nb_sql_ctes("train", "score_in", vocab_size=8)
            + " SELECT doc_id, predicted, score FROM nb_pred"
        )
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want, f"seed {seed} diverged"

        # margin path: the sort_array argmax and the SQL window pivot
        # must agree even on exact score TIES between labels (small
        # vocab + short docs make ties common here)
        sql_m = (
            "WITH train AS (SELECT label, text FROM train_pd), "
            "score_in AS (SELECT doc_id, text FROM score_pd), "
            + nb_sql_ctes("train", "score_in", vocab_size=8)
            + """ , mm AS (
                 SELECT doc_id,
                        max(CASE WHEN rn = 1 THEN score END) AS s1,
                        max(CASE WHEN rn = 1 THEN label END) AS predicted,
                        max(CASE WHEN rn = 2 THEN score END) AS s2
                 FROM (SELECT *, row_number() OVER (
                          PARTITION BY doc_id
                          ORDER BY score DESC, label ASC) AS rn
                       FROM nb_scored)
                 WHERE rn <= 2 GROUP BY 1)
               SELECT doc_id, predicted, s1, round(s1 - s2, 4) FROM mm"""
        )
        want_m = sorted(tuple(r) for r in con.execute(sql_m).fetchall())
        assert got_m == want_m, f"seed {seed} margin path diverged"


def test_bad_args_raise_clearly(spark, tiny):
    with pytest.raises(ValueError, match="vocab_size"):
        CL.nb_train(tiny, label_col="label", vocab_size=0)


def test_nb_is_bag_of_words_order_invariant(spark):
    # multinomial NB sees counts, not order: shuffling every document's
    # tokens (train AND score side) must leave the model and every
    # prediction bit-identical — pins that no order-sensitive construct
    # (first/collect_list/positional feature) sneaks into the pipeline
    import random

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(15)]

    def corpus(shuffled: bool):
        rows = []
        for i in range(80):
            r = random.Random(1000 + i)  # same tokens per doc either way
            toks = [r.choice(vocab) for _ in range(r.randint(1, 12))]
            if shuffled:
                rng.shuffle(toks)
            rows.append((i, "x" if i % 3 else "y", " ".join(toks)))
        return spark.createDataFrame(rows, "doc_id long, label string, text string")

    outs = []
    for shuffled in (False, True):
        df = corpus(shuffled)
        m = CL.nb_train(df, label_col="label", vocab_size=10)
        scored = CL.nb_score(df.select("doc_id", "text"), m)
        outs.append(
            (
                sorted(map(tuple, m.table.collect())),
                sorted((r.doc_id, r.predicted, r.score) for r in scored.collect()),
            )
        )
    assert outs[0] == outs[1]


def test_score_margins_separable_vs_ambiguous(spark, tiny):
    m = CL.nb_train(tiny, label_col="label", vocab_size=100)
    probe = spark.createDataFrame(
        [(10, "cat purr cat"), (11, "cat dog")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in CL.nb_score_margins(probe, m).collect()}
    # strong evidence -> wide margin; balanced evidence -> narrow margin
    # (not exactly 0: the class token totals differ slightly, so the
    # smoothed logps are not perfectly mirrored)
    assert rows[10].predicted == "a" and rows[10].margin > 1.0
    assert rows[11].margin < 0.2
    # margin path and plain argmax path must agree on the decision
    plain = {r.doc_id: (r.predicted, r.score)
             for r in CL.nb_score(probe, m).collect()}
    for d, r in rows.items():
        assert plain[d] == (r.predicted, r.score)
