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


def test_embedding_near_dup_pairs_exact_parity(vectors):
    # LSH+bucket-verify output must equal brute force at this tiny scale
    from pyspark.sql import Window

    exact = (
        vectors.alias("a")
        .join(vectors.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            F.round(
                SIM.batch_cosine(F.col("a.embedding"), F.col("b.embedding")), 6
            ).alias("sim"),
        )
        .filter(F.col("sim") >= 0.9)
    )
    got = SIM.embedding_near_dup_pairs(
        vectors, dim=4, threshold=0.9, num_bits=2, num_tables=16
    )
    e = {(r.a_id, r.b_id): r.sim for r in exact.collect()}
    g = {(r.a_id, r.b_id): r.sim for r in got.collect()}
    assert e == g and len(e) >= 2  # both clusters produce pairs


def test_embedding_near_dup_max_bucket_size_guard(vectors):
    # cap of 1 → every bucket dropped → no pairs survive
    got = SIM.embedding_near_dup_pairs(
        vectors, dim=4, threshold=0.0, num_bits=1, num_tables=2, max_bucket_size=1
    )
    assert got.count() == 0


def test_ann_ivf_topk_matches_exact_on_clusters(vectors):
    # 2 clear clusters; IVF with enough probes must find the same top-2
    exact = SIM.cosine_topk(vectors, vectors, k=2)
    ivf = SIM.ann_ivf_topk(vectors, vectors, dim=4, k=2, num_lists=3, nprobe=3)
    e = {(r.query_id, r.rank): r.neighbor_id for r in exact.collect()}
    i = {(r.query_id, r.rank): r.neighbor_id for r in ivf.collect()}
    assert e == i


def test_ivf_centroids_deterministic(vectors):
    c1 = SIM.ivf_centroids(vectors, num_lists=2, dim=4)
    c2 = SIM.ivf_centroids(vectors, num_lists=2, dim=4)
    assert c1 == c2
    assert all(len(v) == 4 for _, v in c1)


def test_quantize_embeddings_error_bound(spark):
    # dequantized values must be within half a quantization step of the
    # original, and codes within int8 range
    from kinesis_data_counter_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [100.0, -50.0, 0.0, 1.0]), (3, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    orig = {1: [0.5, -1.0, 0.25, 0.0], 2: [100.0, -50.0, 0.0, 1.0], 3: [0.0, 0.0, 0.0, 0.0]}
    for vid, r in rows.items():
        scale = r["qscale"]
        assert all(-127 <= q <= 127 for q in r["qvec"])
        for q, x in zip(r["qvec"], orig[vid]):
            assert abs(q * scale - x) <= scale / 2 + 1e-12


def test_quantized_topk_matches_exact_on_separated_data(spark):
    # well-separated vectors: int8 rounding cannot change the ranking
    from kinesis_data_counter_spark.operators.similarity import (
        cosine_topk,
        quantized_cosine_topk,
    )

    rows = [
        (i, [1.0 if j == i % 4 else 0.05 * ((i + j) % 3) for j in range(4)])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 3")
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(df, q, k=3).collect()
    }
    quant = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in quantized_cosine_topk(df, q, k=3).collect()
    }
    assert exact == quant


def test_knn_classify_majority_vote(spark):
    from kinesis_data_counter_spark.operators.similarity import knn_classify

    # axis-aligned clusters: queries sit nearest their own cluster
    def vec(axis, mag):
        v = [0.0] * 4
        v[axis] = mag
        return v

    labeled = spark.createDataFrame(
        [(i * 10 + a, vec(a, 1.0 + 0.001 * i), a) for a in range(3) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    queries = spark.createDataFrame(
        [(100, vec(0, 2.0)), (101, vec(2, 0.5))],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: (r.predicted_label, r.votes) for r in
           knn_classify(labeled, queries, k=3).collect()}
    assert out[100] == (0, 3) and out[101] == (2, 3)


def test_knn_bucketed_matches_brute_on_clusters(spark):
    # on separable data the candidate-generated path must reproduce the
    # brute path's predictions exactly, for both index methods
    from kinesis_data_counter_spark.operators.similarity import (
        knn_classify,
        knn_classify_bucketed,
    )

    def vec(axis, mag):
        v = [0.0] * 4
        v[axis] = mag
        return v

    labeled = spark.createDataFrame(
        [(i * 10 + a, vec(a, 1.0 + 0.001 * i), a) for a in range(3) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    queries = spark.createDataFrame(
        [(100, vec(0, 2.0)), (101, vec(2, 0.5)), (102, vec(1, 1.0))],
        "vec_id long, embedding array<float>",
    )
    brute = {r.vec_id: (r.predicted_label, r.votes) for r in
             knn_classify(labeled, queries, k=3).collect()}
    for method, kw in [("lsh", {"num_bits": 2, "num_tables": 8}),
                       ("ivf", {"num_lists": 3, "nprobe": 2})]:
        fast = {r.vec_id: (r.predicted_label, r.votes) for r in
                knn_classify_bucketed(
                    labeled, queries, dim=4, k=3, method=method, **kw
                ).collect()}
        assert fast == brute, (method, fast, brute)


def test_knn_bucketed_recall_and_agreement_checks(spark):
    # the property harness itself: perfect recall/agreement on separable
    # data, and the unknown-kwarg guard
    import pytest as _pytest

    from kinesis_data_counter_spark.operators.similarity import (
        knn_agreement_check,
        knn_bucketed_recall_check,
        knn_classify_bucketed,
    )

    def vec(axis, mag):
        v = [0.0] * 4
        v[axis] = mag
        return v

    labeled = spark.createDataFrame(
        [(i * 10 + a, vec(a, 1.0 + 0.001 * i), a) for a in range(3) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    queries = spark.createDataFrame(
        [(100, vec(0, 2.0)), (101, vec(2, 0.5))],
        "vec_id long, embedding array<float>",
    )
    r = knn_bucketed_recall_check(
        labeled, queries, dim=4, k=3, min_recall=0.99,
        method="lsh", num_bits=2, num_tables=8,
    ).collect()[0]
    assert r.ok and r.recall == 1.0
    a = knn_agreement_check(
        labeled, queries, dim=4, k=3, min_agreement=0.99,
        method="ivf", num_lists=3, nprobe=2,
    ).collect()[0]
    assert a.ok and a.agreement == 1.0
    with _pytest.raises(TypeError, match="unknown"):
        knn_classify_bucketed(labeled, queries, dim=4, method="lsh", bogus=1)


def test_mips_augmentation_finds_large_norm_neighbors(spark):
    # the norm-augmented bucketing must surface a LARGE-norm vector at a
    # mediocre angle that angle-only LSH would miss: under raw dot, b
    # (norm 10, 45° off) beats a (norm 1, aligned) for query e0
    from kinesis_data_counter_spark.operators.similarity import (
        knn_bucketed_recall_check,
    )

    labeled = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0], 0),        # aligned, small norm
            (2, [7.1, 7.1, 0.0, 0.0], 1),        # 45° off, norm ≈ 10 → wins on dot
            (3, [0.0, 0.0, 1.0, 0.0], 2),
            (4, [0.0, 0.0, 0.0, 1.0], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    r = knn_bucketed_recall_check(
        labeled, queries, dim=4, k=2, min_recall=0.99,
        method="lsh", num_bits=2, num_tables=12,
    ).collect()[0]
    assert r.ok, r  # top-2 by dot = {2, 1}; buckets must surface both


def test_batch_qdot_is_exact_integers():
    import numpy as np
    import pandas as pd

    from kinesis_data_counter_spark.operators.similarity import batch_qdot

    a = pd.Series([[0.0015, -0.25]])
    b = pd.Series([[1.0, 0.5]])
    # floor(1.5)=1, floor(-250)=-250, floor(1000)=1000, floor(500)=500
    assert batch_qdot(a, b).iloc[0] == 1 * 1000 + (-250) * 500


# ---------------------------------------------------------------------------
# round-4: product quantization (pq_train_codebooks / pq_encode / pq_topk)
# ---------------------------------------------------------------------------

def _random_vectors(spark, n=120, dim=16, seed=7):
    import random

    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_codebooks_shape_and_determinism(spark):
    import numpy as np

    df = _random_vectors(spark, n=100, dim=16)
    b1 = SIM.pq_train_codebooks(df, dim=16, m=4, ksub=8)
    b2 = SIM.pq_train_codebooks(df, dim=16, m=4, ksub=8)
    assert b1.shape == (4, 8, 4)
    assert np.array_equal(b1, b2)  # md5 ticket + seeded init: no RNG state
    with pytest.raises(ValueError):
        SIM.pq_train_codebooks(df, dim=16, m=5)


def test_pq_encode_codes_are_nearest_centroids(spark):
    import numpy as np

    df = _random_vectors(spark, n=60, dim=16)
    books = SIM.pq_train_codebooks(df, dim=16, m=4, ksub=8)
    codes = {r["vec_id"]: list(r["codes"]) for r in SIM.pq_encode(df, books).collect()}
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in df.collect()}
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in codes.values())
    for vid, v in list(vecs.items())[:10]:
        x = v / np.linalg.norm(v)
        for j in range(4):
            sub = x[j * 4 : (j + 1) * 4]
            want = ((books[j] - sub) ** 2).sum(axis=1).argmin()
            assert codes[vid][j] == want, (vid, j)


def test_pq_topk_recall_with_refine(spark):
    # isotropic random vectors are PQ's worst case; the exact-refine stage
    # must still recover >= 0.9 recall@5 vs brute force
    df = _random_vectors(spark, n=150, dim=16, seed=11)
    queries = df.filter(F.col("vec_id") % 29 == 0)
    r = SIM.pq_recall_check(
        df, queries, dim=16, k=5, min_recall=0.9, m=4, ksub=16, refine=6
    ).collect()[0]
    assert r.ok, r


def test_pq_topk_sims_are_exact_cosine(spark):
    # stage-2 refine re-scores with float vectors: every reported sim must
    # equal the brute-force cosine for that (query, neighbor) pair
    df = _random_vectors(spark, n=80, dim=16, seed=3)
    queries = df.filter(F.col("vec_id") < 2)
    pq = SIM.pq_topk(df, queries, dim=16, k=4, m=4, ksub=16, refine=8)
    exact = SIM.cosine_topk(df, queries, k=79)
    es = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact.collect()}
    for r in pq.collect():
        assert r["sim"] == es[(r["query_id"], r["neighbor_id"])]


def test_pq_byte_codes_wrap_correctly_at_ksub_256(spark):
    # classic PQ: ksub=256, one byte per code. Spark tinyint is signed, so
    # codes 128..255 travel as negative two's-complement values; the ADC
    # mask must recover them. Recall at full byte codes should beat the
    # 16-centroid configuration on the same data.
    df = _random_vectors(spark, n=300, dim=16, seed=5)
    queries = df.filter(F.col("vec_id") % 97 == 0)
    books = SIM.pq_train_codebooks(df, dim=16, m=4, ksub=256)
    codes = SIM.pq_encode(df, books).collect()
    raw = [c for r in codes for c in r["codes"]]
    assert min(raw) < 0 <= max(raw)  # both byte halves actually occur
    r = SIM.pq_recall_check(
        df, queries, dim=16, k=5, min_recall=0.9, m=4, ksub=256, refine=4
    ).collect()[0]
    assert r.ok, r
    import numpy as np

    with pytest.raises(ValueError):
        SIM.pq_encode(df, np.zeros((4, 300, 4)))  # >1 byte per code


def test_ivf_pq_recall_and_exact_sims(spark):
    # the composed IVF-PQ path: nprobe lists x byte codes x exact refine.
    # recall compounds both reductions; exact-sim property must still hold
    df = _random_vectors(spark, n=200, dim=16, seed=13)
    queries = df.filter(F.col("vec_id") % 61 == 0)
    r = SIM.ivf_pq_recall_check(
        df, queries, dim=16, k=5, min_recall=0.7,
        num_lists=8, nprobe=4, m=4, ksub=64, refine=6,
    ).collect()[0]
    assert r.ok, r
    pq = SIM.ivf_pq_topk(
        df, queries, dim=16, k=5, num_lists=8, nprobe=4, m=4, ksub=64, refine=6
    )
    exact = SIM.cosine_topk(df, queries, k=199)
    es = {(x["query_id"], x["neighbor_id"]): x["sim"] for x in exact.collect()}
    rows = pq.collect()
    assert rows, "ivf_pq returned nothing"
    for x in rows:
        assert x["sim"] == es[(x["query_id"], x["neighbor_id"])]


def test_property_harnesses_are_not_tautologies(spark):
    # the ok-boolean oracle pattern is only evidence if the harness can
    # FAIL: cripple each index (one sparse LSH table / no refine headroom)
    # on isotropic data and the checks must report ok=False
    df = _random_vectors(spark, n=200, dim=16, seed=31)
    queries = df.filter(F.col("vec_id") % 41 == 0)
    r = SIM.ann_recall_check(
        df, queries, dim=16, k=10, min_recall=0.9,
        method="lsh", num_bits=12, num_tables=1, multiprobe=False,
    ).collect()[0]
    assert not r.ok and r.recall < 0.9, r
    r = SIM.pq_recall_check(
        df, queries, dim=16, k=10, min_recall=0.95, m=2, ksub=2, refine=1
    ).collect()[0]
    assert not r.ok, r
    r = SIM.knn_agreement_check(
        df.withColumn("label", (F.col("vec_id") % 3).cast("int")),
        queries, dim=16, k=5, min_agreement=0.99,
        method="lsh", num_bits=12, num_tables=1,
    ).collect()[0]
    assert not r.ok, r


# ---------------------------------------------------------------------------
# round-4: PCA embedding compression
# ---------------------------------------------------------------------------

def test_pca_matches_numpy_and_is_partition_invariant(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    # anisotropic data: two dominant directions embedded in 8 dims
    base = rng.normal(size=(300, 2)) @ rng.normal(size=(2, 8)) * 3
    noise = rng.normal(size=(300, 8)) * 0.1
    x = base + noise
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    mean, comps = SIM.pca_train(df, dim=8, k=2)
    # float32 storage rounds the inputs: compare against numpy on the
    # SAME float32-rounded matrix
    x32 = x.astype(np.float32).astype(np.float64)
    np.testing.assert_allclose(mean, x32.mean(axis=0), atol=1e-9)
    cov = np.cov(x32.T, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    want = vecs[:, np.argsort(vals)[::-1][:2]].T
    for i in range(2):  # sign-free comparison
        assert min(
            np.abs(comps[i] - want[i]).max(), np.abs(comps[i] + want[i]).max()
        ) < 1e-7
    # across partitionings the float partial sums accumulate in different
    # orders: axes agree to summation tolerance, not bit-for-bit
    m2, c2 = SIM.pca_train(df.repartition(7), dim=8, k=2)
    np.testing.assert_allclose(mean, m2, atol=1e-10)
    np.testing.assert_allclose(comps, c2, atol=1e-7)


def test_pca_check_property_and_negative_control(spark):
    import numpy as np

    rng = np.random.default_rng(9)
    base = rng.normal(size=(200, 2)) @ rng.normal(size=(2, 8)) * 3
    x = base + rng.normal(size=(200, 8)) * 0.05
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    r = SIM.pca_check(df, dim=8, k=2, min_variance_kept=0.95).collect()[0]
    assert r.ok and r.orthonormal_ok and r.variance_kept > 0.95, r
    # isotropic data: 2 of 8 dims cannot hold 95% of the variance
    iso = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in
         enumerate(rng.normal(size=(200, 8)))],
        "vec_id long, embedding array<float>",
    )
    r = SIM.pca_check(iso, dim=8, k=2, min_variance_kept=0.95).collect()[0]
    assert not r.ok and r.variance_kept < 0.5, r


def test_lsh_bits_sizing_rule():
    # bits ≈ log2(n / target_bucket): occupancy pinned, candidate volume
    # linear in corpus size (the sf1 spot-bench's scale lever)
    from kinesis_data_counter_spark.operators.similarity import lsh_bits_for

    assert lsh_bits_for(2_000) == 6          # fixture size: min_bits floor
    assert lsh_bits_for(20_000) == 9
    assert lsh_bits_for(1_000_000) == 14
    assert lsh_bits_for(1_000_000_000) == 24
    assert lsh_bits_for(10) == 6             # degenerate corpus
    # occupancy stays near target across 3 orders of magnitude
    for n in (10**5, 10**7, 10**9):
        occ = n / 2 ** lsh_bits_for(n)
        assert 32 <= occ <= 64, (n, occ)


def test_lsh_scaled_bits_preserve_agreement(spark):
    # the sizing rule must not break the recorded property at a scaled
    # corpus: 10x vectors with log2-scaled bits and more tables still
    # clears the same agreement floor the registry entry records
    from kinesis_data_counter_spark.operators.similarity import lsh_bits_for

    df = _random_vectors(spark, n=1500, dim=16, seed=41).withColumn(
        "label", (F.col("vec_id") % 3).cast("int")
    )
    queries = df.filter(F.col("vec_id") % 5 == 0)
    labeled = df.filter(F.col("vec_id") % 5 != 0)
    bits = lsh_bits_for(1500, target_bucket=64)
    (r,) = SIM.knn_agreement_check(
        labeled, queries, dim=16, k=5, min_agreement=0.9,
        method="lsh", num_bits=bits, num_tables=16, sample_mod=8,
    ).collect()
    assert r.ok, r


def test_lsh_tables_sizing_rule():
    # the companion rule: tables grow geometrically per extra bit so the
    # recall the narrower buckets lose is bought back (sf1-calibrated:
    # 7 bits needs 24 tables, 8 needs 36 — see lsh_tables_for docstring)
    from kinesis_data_counter_spark.operators.similarity import (
        lsh_bits_for,
        lsh_tables_for,
    )

    assert lsh_tables_for(6) == 16           # base point: unchanged
    assert lsh_tables_for(5) == 16           # never below base
    assert lsh_tables_for(7) == 24
    assert lsh_tables_for(8) == 36
    # the paired rules keep per-query candidate volume (L * n/2^b)
    # sublinear in corpus size: growth ~ 1.5^log2(growth_n) = n^0.585,
    # so 1000x vectors costs ~56x per query (fixed bits would cost 1000x)
    def vol(n):
        b = lsh_bits_for(n, target_bucket=128)
        return lsh_tables_for(b) * n / 2**b
    assert vol(16_000_000) / vol(16_000) < 60  # vs 1000x for fixed bits


def test_semdedup_flags_within_cluster_duplicates(spark):
    # two tight direction clusters; 1 duplicates 0 (same direction), 11
    # duplicates 10; the outlier and cluster representatives survive.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0, 0.0]),      # cosine 1.0 with id 0 → flagged
        (2, [0.0, 0.0, 0.0, 1.0]),      # orthogonal: kept
        (10, [0.0, 1.0, 0.0, 0.0]),
        (11, [0.0, 0.99, 0.01, 0.0]),   # near-dup of 10 → flagged
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    res = {r.id: r for r in SIM.semdedup(df, dim=4, k=2, threshold=0.9).collect()}
    assert len(res) == 5  # one row per doc, always
    assert not res[1].keep and not res[11].keep
    assert res[0].keep and res[10].keep and res[2].keep
    # the lowest-id-wins rule: the flagged doc shares its survivor's cluster
    assert res[1].cluster_id == res[0].cluster_id
    assert res[11].cluster_id == res[10].cluster_id


def test_semdedup_negative_control_high_threshold(spark):
    # falsification twin: with an unreachable threshold nothing is flagged,
    # proving the keep column is computed, not constant-false
    rows = [(i, [float(i + 1), float(i % 3), 1.0, 0.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = SIM.semdedup(df, dim=4, k=2, threshold=1.0000001)
    assert out.filter(~F.col("keep")).count() == 0
    assert out.count() == 8


def test_mine_hard_negatives_brute(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0, 0.0], 0),   # same label: never a negative
        (10, [0.9, 0.3, 0.0, 0.0], 1),   # nearest different-label to 0
        (11, [0.0, 1.0, 0.0, 0.0], 1),
        (20, [0.0, 0.0, 1.0, 0.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = SIM.mine_hard_negatives(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    assert [(r.anchor_id, r.negative_id, r.rank) for r in
            sorted(got, key=lambda r: r.rank)] == [(0, 10, 1), (0, 11, 2)]


def test_mine_hard_negatives_all_same_label_is_empty(spark):
    # falsification twin: with one label there is no different-label
    # neighbor, so the miner must produce nothing (not same-label fallback)
    rows = [(i, [float(i + 1), 1.0, 0.0, 0.0], 7) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    assert SIM.mine_hard_negatives(df, df, k=3).count() == 0


def test_mine_hard_negatives_bucketed_matches_brute(spark, sf_dir):
    import kinesis_data_counter_spark as kdc

    emb = kdc.load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    anchors = emb.filter(F.col("vec_id") % 29 == 0)
    brute = {
        (r.anchor_id, r.rank): r.negative_id
        for r in SIM.mine_hard_negatives(emb, anchors, k=1).collect()
    }
    approx = {
        (r.anchor_id, r.rank): r.negative_id
        for r in SIM.mine_hard_negatives_bucketed(
            emb, anchors, dim=64, k=1, num_bits=6, num_tables=16
        ).collect()
    }
    same = sum(1 for k_ in brute if approx.get(k_) == brute[k_])
    assert same / len(brute) >= 0.8, (same, len(brute))


def test_hard_negative_agreement_check_can_fail(spark, sf_dir):
    # the property harness is not a tautology: an unreachable floor must
    # flip ok to false while still reporting the measured agreement
    import kinesis_data_counter_spark as kdc

    emb = kdc.load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    (r,) = SIM.hard_negative_agreement_check(
        emb, emb, dim=64, min_agreement=1.01, sample_mod=31,
        num_bits=6, num_tables=16,
    ).collect()
    assert not r.ok and r.agreement <= 1.0
