"""Distributed multinomial Naive Bayes text classification.

The classifier tier of the curation stack. The reference engine has no
model-based gate (its filters are expression predicates — counter.go's
target_expr); this is the beyond-reference fastText-style classifier
every large-scale LLM data pipeline runs: train a cheap linear model on
a labeled seed corpus, score the WHOLE corpus with one broadcast join,
keep (or route) what clears the bar. Multinomial NB is chosen because
training is closed-form — one aggregation pass, no iterative solver —
so the 100 TB story is exactly one map-side-combined shuffle and the
model itself is a bounded table that broadcasts.

Scale shape:
- TRAIN: explode train-slice tokens (corpus-sized, ONE pass), aggregate
  per-(label, term) with map-side combine into a persisted cache, then
  top-V vocabulary via TakeOrdered (O(n) keeping V — never a global
  sort) and a ≤|classes|×V counts collect off the same cache. The dense
  grid, totals, and priors are assembled driver-side as literal
  DataFrames — bounded model artifacts whose lineage cannot re-execute
  the corpus pass (the log/round math stays in Spark expressions for
  float parity with the SQL twins).
- SCORE: explode tokens once, broadcast-hash-join the model (OOV terms
  drop at the join — no shuffle), one groupBy(doc) aggregation. A
  zero-in-vocab-token document still scores: priors attach through a
  doc x classes broadcast cross join, so the prediction degrades to the
  prior argmax instead of the document vanishing.

Cross-engine float discipline (the tfidf/bm25 rounding contract): every
log-probability is rounded to 6 digits at the model, per-document sums
re-round to 4, so libm ln() ulp differences and summation-order noise
cannot flip an argmax that the DuckDB oracle replays exactly. Argmax
tie-breaks on the label ascending, and the score grid guarantees one
row per (doc, label), so min(struct(-score, label)) on the Spark side
is decision-identical to the oracle's
row_number() OVER (ORDER BY score DESC, label ASC) = 1.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesis_data_counter_spark.operators.text import clean_tokens

__all__ = ["NBModel", "nb_train", "nb_score", "nb_confusion", "nb_sql_ctes"]


@dataclass(frozen=True)
class NBModel:
    """A trained multinomial NB model as two bounded DataFrames.

    ``table`` — one row per (label, term) over the dense class x vocab
    grid: ``label, term, logp`` (logp rounded to 6).
    ``priors`` — one row per class: ``label, logprior`` (rounded to 6).
    Both are vocab-/class-sized regardless of corpus size, so score-time
    joins always broadcast.
    """

    table: DataFrame
    priors: DataFrame


def _doc_terms(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """One output row per token occurrence: ``*id_cols, term``.

    NULL texts yield no rows here (the tfidf/explode convention) — the
    scoring path re-attaches those documents through the priors cross
    join so they are never lost.
    """
    return df.filter(F.col(text_col).isNotNull()).select(
        *id_cols, F.explode(clean_tokens(F.col(text_col))).alias("term")
    )


def nb_train(
    train: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    vocab_size: int = 2048,
) -> NBModel:
    """Closed-form multinomial NB training — aggregations only.

    add-1 (Laplace) smoothing over the selected vocabulary:
    ``logp(t|c) = ln((cnt_{c,t} + 1) / (tot_c + V))`` where ``tot_c``
    counts the class's IN-VOCAB token occurrences and ``V`` is the
    realized vocabulary size (``<= vocab_size`` when the corpus has
    fewer distinct terms). Priors are document-frequency based:
    ``ln(n_docs_c / n_docs)``.

    Vocabulary = top-``vocab_size`` terms of the train slice by total
    occurrence count, ties broken by term ascending — a deterministic
    TakeOrdered over the term-count aggregate, not a global sort.
    Rows with a NULL label carry no class evidence and are excluded.

    Execution: the corpus is tokenized EXACTLY ONCE — one explode into a
    persisted (label, term) count aggregate; the vocabulary and the
    in-vocab counts are two bounded collects off that cache, and the
    dense class×vocab grid is assembled driver-side into literal
    DataFrames (the bounded-model-artifact rule, the PQ-codebook
    precedent). An earlier all-lazy formulation re-executed the tokenize
    subtree per downstream consumer — the model table's lineage ran the
    corpus explode SEVEN times once the grid/totals/vsize forks
    multiplied. The log/round arithmetic stays in Spark expressions so
    the floats match the lazy form (and the SQL twins) bit for bit.
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    spark = train.sparkSession
    label_type = train.schema[label_col].dataType
    labeled = train.filter(F.col(label_col).isNotNull())
    toks = _doc_terms(labeled, [label_col], text_col)

    counts_all = (
        toks.groupBy(F.col(label_col).alias("label"), "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    try:
        # bounded collect #1: the top-V vocabulary (TakeOrdered, not a
        # global sort); triggers the one corpus-sized job and fills the
        # cache for the second collect
        vocab_terms = [
            r["term"]
            for r in counts_all.groupBy("term")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("term").asc())
            .limit(int(vocab_size))
            .collect()
        ]
        # bounded collect #2: in-vocab per-class counts (≤ classes × V).
        # The vocab filter is a broadcast semi-join against a small literal
        # term table — an isin() literal list grows the plan tree (and its
        # analysis cost) linearly with vocab_size, so at V=2048 the filter
        # expression alone carried 2048 literals
        if vocab_terms:
            vocab_df = spark.createDataFrame(
                [(t,) for t in vocab_terms], "term string"
            )
            in_vocab = counts_all.join(F.broadcast(vocab_df), "term", "semi")
        else:
            in_vocab = counts_all.filter(F.lit(False))
        cnt_map = {
            (r["label"], r["term"]): r["cnt"] for r in in_vocab.collect()
        }
    finally:
        counts_all.unpersist()
    # bounded collect #3: per-class doc counts (doc-level scan, no explode)
    class_rows = sorted(
        (r["label"], r["n"])
        for r in labeled.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n_total = sum(n for _, n in class_rows)
    v = len(vocab_terms)

    # dense grid so absent (class, term) pairs smooth to cnt = 0, and so
    # every (doc, label) score later has exactly one row to argmax over.
    # Literal rows carry the integer counts; log/round run as the same
    # Spark expressions the lazy form used (cross-engine float parity)
    in_vocab_tot = {lab: 0 for lab, _ in class_rows}
    for (lab, _), c in cnt_map.items():
        in_vocab_tot[lab] += c
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    grid_schema = StructType(
        [
            StructField("label", label_type),
            StructField("term", StringType()),
            StructField("cnt", LongType()),
            StructField("tot", LongType()),
        ]
    )
    grid_rows = [
        (lab, t, cnt_map.get((lab, t), 0), in_vocab_tot[lab])
        for lab, _ in class_rows
        for t in vocab_terms
    ]
    table = spark.createDataFrame(grid_rows, grid_schema).select(
        "label",
        "term",
        F.round(
            F.log((F.col("cnt") + F.lit(1.0)) / (F.col("tot") + F.lit(v))), 6
        ).alias("logp"),
    )
    priors_schema = StructType(
        [
            StructField("label", label_type),
            StructField("n_docs_label", LongType()),
            StructField("n", LongType()),
        ]
    )
    priors = spark.createDataFrame(
        [(lab, n, n_total) for lab, n in class_rows], priors_schema
    ).select(
        "label",
        F.round(F.log(F.col("n_docs_label") / F.col("n")), 6).alias("logprior"),
    )
    return NBModel(table=table, priors=priors)


def _nb_scored(
    df: DataFrame,
    model: NBModel,
    text_col: str,
    id_col: str,
    keep_cols: tuple[str, ...],
) -> DataFrame:
    """The per-(doc, label) score grid every consumer argmaxes over:
    exactly one row per input document per class, ``score =
    round(logprior + sum(logp), 4)`` (prior-only when no in-vocab
    token — see nb_score's sentinel formulation)."""
    toks_arr = F.when(
        F.col(text_col).isNotNull(), clean_tokens(F.col(text_col))
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    toks = df.select(
        id_col,
        *keep_cols,
        F.explode(F.concat(toks_arr, F.array(F.lit("")))).alias("term"),
    )
    contrib = toks.crossJoin(F.broadcast(model.priors)).join(
        F.broadcast(model.table), ["label", "term"], "left"
    )
    return (
        contrib.groupBy(id_col, *keep_cols, "label", "logprior")
        .agg(F.sum(F.coalesce(F.col("logp"), F.lit(0.0))).alias("s"))
        .select(
            id_col,
            *keep_cols,
            "label",
            F.round(F.col("logprior") + F.col("s"), 4).alias("score"),
        )
    )


def nb_score(
    df: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score + argmax-classify every document.

    Returns one row per input document: ``id_col, *keep_cols,
    predicted, score`` where ``score`` is the winning class's
    ``round(logprior + sum(logp), 4)``. Documents with no in-vocab
    token (including NULL text) score on priors alone — they are
    classified, not dropped.

    No corpus x corpus join: every document appends one sentinel ''
    "token" (impossible as a real term — ``clean_tokens`` filters empty
    strings), the token stream cross-joins the broadcast priors (the
    |classes|x fan-out), and the model attaches via a broadcast LEFT
    join where sentinel/OOV rows contribute logp 0 — exactly the
    skip-OOV semantics, since add-1 smoothing is defined over the vocab
    only. The whole score is then two doc-keyed aggregations
    (map-side-combined), never a shuffle join of two corpus-sized
    sides just to re-attach zero-token documents.
    """
    scored = _nb_scored(df, model, text_col, id_col, keep_cols)
    # argmax with label-asc tie-break, shuffle-agg not window-sort:
    # min over (-score, label) picks the highest score, then the
    # lexicographically first label
    best = scored.groupBy(id_col, *keep_cols).agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("label").alias("l"))).alias(
            "b"
        )
    )
    return best.select(
        id_col,
        *keep_cols,
        F.col("b.l").alias("predicted"),
        F.round(-F.col("b.ns"), 4).alias("score"),
    )


def nb_score_margins(
    df: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Like :func:`nb_score` but also returns the decision margin —
    ``round(top score - runner-up score, 4)`` — the model's confidence
    proxy that calibration analysis and selective-prediction gates
    (route low-margin docs to a stronger model / human review) consume.

    One aggregation: per doc, the |classes|-bounded score list collects
    and sorts in the agg buffer (classes are bounded, so the buffer is —
    this is NOT a collect over unbounded data). Single-class models
    yield a NULL margin.
    """
    scored = _nb_scored(df, model, text_col, id_col, keep_cols)
    arr = F.sort_array(
        F.collect_list(
            F.struct((-F.col("score")).alias("ns"), F.col("label").alias("l"))
        )
    )
    agg = scored.groupBy(id_col, *keep_cols).agg(arr.alias("a"))
    top = F.col("a")[0]
    second = F.col("a")[1]
    return agg.select(
        id_col,
        *keep_cols,
        top["l"].alias("predicted"),
        F.round(-top["ns"], 4).alias("score"),
        F.when(
            F.size("a") > 1, F.round(second["ns"] - top["ns"], 4)
        ).alias("margin"),
    )


def nb_confusion(
    scored: DataFrame, actual_col: str = "actual", predicted_col: str = "predicted"
) -> DataFrame:
    """Confusion-matrix counts: ``actual, predicted, n_docs``."""
    return scored.groupBy(
        F.col(actual_col).alias("actual"), F.col(predicted_col).alias("predicted")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


def nb_sql_ctes(
    train_cte: str,
    score_cte: str,
    vocab_size: int = 2048,
    prefix: str = "nb_",
) -> str:
    """The nb_train -> nb_score -> argmax pipeline as a reusable ANSI-SQL
    CTE chain (the ``pagerank_sql`` pattern): same top-V vocabulary rule,
    same add-1 smoothed rounded log-probs, same prior-only fallback for
    docs with no in-vocab token, same label-asc argmax tie-break.

    ``train_cte`` must expose (label, text) with label non-NULL;
    ``score_cte`` must expose (doc_id, text). Produces ``{prefix}pred``
    with (doc_id, predicted, score) — splice into a WITH chain and join
    back on doc_id.
    """
    p = prefix
    tok = (
        r"unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),"
        r" x -> x <> ''))"
    )
    return f"""{p}ttoks AS (
  SELECT label, {tok} AS term FROM {train_cte} WHERE text IS NOT NULL
), {p}vocab AS (
  SELECT term FROM (
    SELECT term, count(*) AS c FROM {p}ttoks GROUP BY 1
    ORDER BY c DESC, term ASC LIMIT {vocab_size})
), {p}vsize AS (SELECT count(*) AS v FROM {p}vocab),
{p}counts AS (
  SELECT label, term, count(*) AS cnt
  FROM {p}ttoks JOIN {p}vocab USING (term) GROUP BY 1, 2
), {p}classes AS (
  SELECT label, count(*) AS n_docs_label FROM {train_cte} GROUP BY 1
), {p}grid AS (
  SELECT c.label, v.term, coalesce(k.cnt, 0) AS cnt
  FROM {p}classes c CROSS JOIN {p}vocab v
  LEFT JOIN {p}counts k ON k.label = c.label AND k.term = v.term
), {p}totals AS (SELECT label, sum(cnt) AS tot FROM {p}grid GROUP BY 1),
{p}model AS (
  SELECT g.label, g.term, round(ln((g.cnt + 1.0) / (t.tot + s.v)), 6) AS logp
  FROM {p}grid g JOIN {p}totals t USING (label) CROSS JOIN {p}vsize s
), {p}priors AS (
  SELECT label,
         round(ln(n_docs_label * 1.0 / (SELECT count(*) FROM {train_cte})), 6)
           AS logprior
  FROM {p}classes
), {p}stoks AS (
  SELECT doc_id, {tok} AS term FROM {score_cte} WHERE text IS NOT NULL
), {p}sums AS (
  SELECT s.doc_id, m.label, sum(m.logp) AS s
  FROM {p}stoks s JOIN {p}model m USING (term) GROUP BY 1, 2
), {p}scored AS (
  SELECT te.doc_id, pr.label,
         round(pr.logprior + coalesce(u.s, 0), 4) AS score
  FROM {score_cte} te CROSS JOIN {p}priors pr
  LEFT JOIN {p}sums u ON u.doc_id = te.doc_id AND u.label = pr.label
), {p}pred AS (
  SELECT doc_id, label AS predicted, score FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, label ASC) AS rn
    FROM {p}scored) WHERE rn = 1
)"""
