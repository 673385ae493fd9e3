"""Third-engine pin for the PCA moment-accumulation / eigh path
(VERDICT r10 task 5).

``similarity.pca_train`` accumulates the covariance DISTRIBUTED as
per-Arrow-batch (count, sum, sum-outer-product) partials and
eigendecomposes on the driver. Its free semantic choices — POPULATION
covariance (/n, not /(n-1)), CENTERED second moment
(E[xxT] − mean·meanT, not raw E[xxT]), descending-eigenvalue component
order, and the largest-|entry|-positive sign convention — cannot be
discriminated by the registry's property oracle (pca_check records
variance-kept/orthonormality booleans precisely because axes have
sign/rotation freedom). This file pins them against a hand-derived 2-D
worked example, ``numpy.cov(bias=True)`` + an independent eigh path on
seeded data (single- AND multi-partition, so the partial-merge
arithmetic is exercised), with a discriminating falsifier.

Worked example (5 points, dim=2, mean exactly [0, 0]):

    x = [1,0], [-1,0], [0,2], [0,-2], [0,0]
    cov = diag(2/5, 8/5) = diag(0.4, 1.6)
    eigh ascending -> (0.4, [1,0]), (1.6, [0,1])
    descending comps (k=2): [[0,1], [1,0]]  (signs already positive)
    variance kept at k=1: 1.6 / (0.4 + 1.6) = 0.8

Falsifier: an UNCENTERED-moment variant (eigh of E[xxT] without
subtracting the mean outer product) on the same points shifted by
[10, 0]: the true top axis stays [0,1] (covariance is shift-invariant)
but the uncentered top axis flips to ~[1,0] — asserted to differ.
"""

from __future__ import annotations

import numpy as np
import pytest


X_HAND = np.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 2.0], [0.0, -2.0], [0.0, 0.0]])


def pca_loop(x, k, centered=True):
    """Independent reimplementation: numpy.cov + eigh + the same
    descending order / sign convention, no shared code with the operator
    (which accumulates raw moment partials, not numpy.cov)."""
    x = np.asarray(x, dtype=np.float64)
    mean = x.mean(axis=0)
    if centered:
        cov = np.cov(x, rowvar=False, bias=True)  # population: /n
    else:
        cov = (x.T @ x) / len(x)  # the falsifier variant: raw moment
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, np.sort(vals)[::-1]


def test_worked_example_hand_derived():
    mean, comps, vals = pca_loop(X_HAND, 2)
    assert mean == pytest.approx([0.0, 0.0])
    assert vals[:2] == pytest.approx([1.6, 0.4])
    assert comps == pytest.approx(np.array([[0.0, 1.0], [1.0, 0.0]]))


def test_spark_pca_train_matches_worked_example(spark):
    from kinesis_data_counter_spark.operators.similarity import pca_train

    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X_HAND)],
        "vec_id long, embedding array<double>",
    )
    mean, comps = pca_train(df, dim=2, k=2)
    assert mean == pytest.approx([0.0, 0.0])
    assert comps == pytest.approx(np.array([[0.0, 1.0], [1.0, 0.0]]))


@pytest.mark.parametrize("nparts", [1, 5])
def test_spark_pca_train_matches_numpy_cov_eigh(spark, nparts):
    # seeded 50×4 matrix: the distributed moment partials must reproduce
    # numpy.cov(bias=True) exactly enough that the eigh axes agree; 5
    # partitions exercises the partial-sum merge
    from kinesis_data_counter_spark.operators.similarity import pca_train

    rng = np.random.RandomState(42)
    # anisotropic data so eigenvalue gaps are wide and axes are stable
    x = rng.randn(50, 4) * np.array([5.0, 3.0, 1.0, 0.2])
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(nparts)
    mean, comps = pca_train(df, dim=4, k=3)
    want_mean, want_comps, _ = pca_loop(x, 3)
    assert mean == pytest.approx(want_mean, abs=1e-9)
    assert comps == pytest.approx(want_comps, abs=1e-6)


def test_spark_pca_check_variance_kept_matches_eigenvalue_share(spark):
    # variance kept at k=1 on the worked example is exactly
    # λ1/(λ1+λ2) = 1.6/2.0 = 0.8 — pca_check computes it via projected
    # squared norms, the loop via the eigenvalue share
    from kinesis_data_counter_spark.operators.similarity import pca_check

    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X_HAND)],
        "vec_id long, embedding array<double>",
    )
    row = pca_check(df, dim=2, k=1, min_variance_kept=0.5).collect()[0]
    assert row["variance_kept"] == pytest.approx(0.8, abs=1e-9)
    assert bool(row["ok"]) and bool(row["orthonormal_ok"])


def test_falsifier_uncentered_moment_differs():
    # shift the worked example by [10, 0]: covariance (and so the true
    # axes) is unchanged, but the raw-moment variant's top axis snaps to
    # the mean direction — the variant is discriminated
    shifted = X_HAND + np.array([10.0, 0.0])
    _, comps_true, _ = pca_loop(shifted, 1)
    _, comps_raw, _ = pca_loop(shifted, 1, centered=False)
    assert comps_true[0] == pytest.approx([0.0, 1.0])
    assert abs(comps_raw[0][0]) > 0.99  # snapped to the shift direction
    assert not np.allclose(comps_true, comps_raw)
