"""Embedding similarity search: brute-force cosine top-k and LSH-bucketed ANN.

Beyond-reference operators (SURVEY.md §7 Phase 5) over the ``embeddings``
fixture (vec_id, embedding array<float>, label).

Two paths:
- ``cosine_topk``: exact brute force — queries × corpus join with the dot
  product computed by built-in higher-order functions (``zip_with`` +
  ``aggregate``), ranked by a window function. With a small query set the
  join is a broadcast: the corpus is scanned once, never shuffled. This is
  the correctness baseline and is already the right plan for "few queries ×
  huge corpus" at 100 TB.
- ``ann_lsh_topk``: random-hyperplane LSH — sign-bit signatures bucket the
  corpus; each query probes its own bucket (optionally multi-probe with
  hamming-1 neighbors), exact cosine re-ranks within the candidate set.
  Scale path for "many queries × huge corpus": turns the cross join into an
  equi-join on bucket keys.

Determinism: hyperplanes derive from a fixed xorshift seed (no RNG state),
similarities are rounded before ranking, ties break on vec_id — so results
are stable across partitionings and match a DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via built-in higher-order functions (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs cast to double for stable arithmetic."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return dot(ad, bd) / (F.sqrt(dot(ad, ad)) * F.sqrt(dot(bd, bd)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k nearest corpus vectors per query vector by cosine.

    Output: (query_id, rank, neighbor_id, sim). Self-matches excluded.
    ``broadcast(queries)`` keeps the corpus un-shuffled — each task scans its
    corpus partition against the in-memory query block; only the per-query
    top-k survives to the single ranking shuffle (windowed row_number over
    query_id), so the exchange is |queries|×k rows, not the cross product.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    sim = F.round(cosine(F.col("qv"), F.col("cv")), round_digits)
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH ANN
# ---------------------------------------------------------------------------


def _xorshift_floats(count: int, seed: int = 1234567) -> list[float]:
    """Deterministic pseudo-random floats in [-1, 1) without RNG deps."""
    out: list[float] = []
    x = seed
    for _ in range(count):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        out.append((x & 0xFFFFFFFF) / 2**31 - 1.0)
    return out


def _bucket_column(vec_col: str, dim: int, num_bits: int, seed: int):
    """Sign-bit signature under ``num_bits`` random hyperplanes, as a Column.

    The hyperplane matrix is a plan-time literal array (num_bits × dim
    doubles); the signature is built entirely with ``zip_with``/``aggregate``
    so bucketing stays in whole-stage codegen.
    """
    planes = _xorshift_floats(num_bits * dim, seed)
    bucket = F.lit(0)
    for b in range(num_bits):
        plane = F.array(*[F.lit(v) for v in planes[b * dim : (b + 1) * dim]])
        proj = dot(F.transform(F.col(vec_col), lambda x: x.cast("double")), plane)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    num_bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 1234567,
    num_tables: int = 1,
) -> DataFrame:
    """(vec_id, embedding, table, bucket) — one row per LSH table.

    Multi-table LSH: each table hashes with an independent hyperplane set;
    near neighbors missed by one table are caught by another
    (recall = 1-(1-p)^L). The table id is part of the join key, so the
    whole structure stays one equi-join at any scale.
    """
    tables = []
    for t in range(num_tables):
        tables.append(
            F.struct(
                F.lit(t).alias("table"),
                _bucket_column(vec_col, dim, num_bits, seed + 7919 * t).alias("bucket"),
            )
        )
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.explode(F.array(*tables)).alias("tb"),
    ).select("vec_id", "embedding", "tb.table", "tb.bucket")


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_bits: int = 8,
    num_tables: int = 8,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: multi-table LSH equi-join + exact cosine re-rank.

    Recall comes from ``num_tables`` independent hash tables (union of
    candidates); with multiprobe each query additionally probes the
    ``num_bits`` hamming-1 buckets per table. All joins are equi-joins on
    (table, bucket) integer keys — the 100 TB plan shape: the corpus is
    bucketed once (L·n rows), queries fan out to L·(bits+1) probe rows,
    and candidates are re-ranked with exact cosine.
    """
    cb = hyperplane_buckets(corpus, dim, num_bits, id_col, vec_col, num_tables=num_tables)
    qb = hyperplane_buckets(queries, dim, num_bits, id_col, vec_col, num_tables=num_tables)
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(num_bits)],
        )
        qb = qb.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            "table",
            F.explode(probes).alias("bucket"),
        )
    else:
        qb = qb.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            "table",
            "bucket",
        )
    cb = cb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), "table", "bucket"
    )
    sim = F.round(cosine(F.col("qv"), F.col("cv")), round_digits)
    cand = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .distinct()  # multiple tables/probes can surface the same pair
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def ann_recall_check(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    min_recall: float = 0.9,
    **ann_kwargs,
) -> DataFrame:
    """Self-check harness: recall of ANN vs exact brute force, as one row.

    Returns a single-row DataFrame (ok BOOLEAN, recall DOUBLE≈rounded) —
    the oracle-friendly pattern for probabilistic operators: the driver
    compares the *property* (recall ≥ min_recall), not the raw neighbor
    lists, which no independent SQL engine could reproduce.
    """
    exact = cosine_topk(corpus, queries, k).select("query_id", "neighbor_id")
    approx = ann_lsh_topk(corpus, queries, dim, k, **ann_kwargs).select(
        "query_id", "neighbor_id"
    )
    hits = exact.join(approx, ["query_id", "neighbor_id"]).count()
    total = exact.count()
    recall = hits / total if total else 1.0
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(bool(recall >= min_recall), float(round(recall, 2)))], "ok boolean, recall double"
    )
