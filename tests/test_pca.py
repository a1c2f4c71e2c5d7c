"""Power-iteration PCA: convergence proof on planted anisotropic data
(the registry fixture is near-isotropic, so the oracle check pins the
distributed kernel; this pins the mathematics)."""

from __future__ import annotations

import numpy as np
import pytest

from biggis_landuse_spark.functions.similarity import power_iteration

DIM = 16


@pytest.fixture(scope="module")
def planted(spark):
    # dominant direction with a 10x spectral gap over isotropic noise
    rng = np.random.RandomState(42)
    direction = rng.randn(DIM)
    direction /= np.linalg.norm(direction)
    n = 400
    coeff = rng.randn(n) * 5.0
    noise = rng.randn(n, DIM) * 0.5
    X = np.outer(coeff, direction) + noise
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, x array<double>",
    )
    return df, X, direction


def test_power_iteration_recovers_planted_direction(spark, planted):
    df, X, direction = planted
    w, lam_df = power_iteration(df, "x", DIM, iters=3)
    w = np.array(w)
    assert abs(np.linalg.norm(w) - 1.0) < 1e-4
    assert abs(float(np.dot(w, direction))) > 0.99
    # Rayleigh quotient matches numpy's top eigenvalue closely
    Xc = X - X.mean(axis=0)
    evals = np.linalg.eigvalsh(Xc.T @ Xc / len(X))
    lam = lam_df.collect()[0]["eigenvalue"]
    assert lam == pytest.approx(evals[-1], rel=0.02)


def test_power_iteration_is_partition_invariant(spark, planted):
    df, _, _ = planted
    w1, _ = power_iteration(df, "x", DIM, iters=2)
    w2, _ = power_iteration(df.repartition(13), "x", DIM, iters=2)
    assert w1 == w2  # 6dp sync points make rounds bit-reproducible
