"""Analytic-vs-Monte-Carlo checks of the orthogonality-constraint closed forms,
mirroring the reference's tests/test_orthogonality.py strategy: sampled
expectations of the base kernel against cov_x_s / var_s, and the constrained
kernel integrating to ~0 under the measure."""

import numpy as np
import pytest

from oak_tpu.kernels import OrthogonalBinary, OrthogonalCategorical, OrthogonalRBF
from oak_tpu.kernels import ortho_binary, ortho_categorical
from oak_tpu.kernels.ortho_rbf import K, cov_x_s, rbf, var_s
from oak_tpu.measures import (
    EmpiricalMeasure,
    GaussianMeasure,
    MOGMeasure,
    UniformMeasure,
)

N_MC = 200_000


def _sample(measure, rng, n):
    if isinstance(measure, GaussianMeasure):
        return rng.normal(float(measure.mu), np.sqrt(float(measure.var)), n)
    if isinstance(measure, UniformMeasure):
        return rng.uniform(float(measure.a), float(measure.b), n)
    if isinstance(measure, EmpiricalMeasure):
        loc = np.asarray(measure.location)[:, 0]
        w = np.asarray(measure.weights)[:, 0]
        return rng.choice(loc, size=n, p=w)
    if isinstance(measure, MOGMeasure):
        comp = rng.choice(len(np.asarray(measure.weights)), size=n,
                          p=np.asarray(measure.weights))
        return rng.normal(np.asarray(measure.means)[comp],
                          np.sqrt(np.asarray(measure.variances)[comp]))
    raise NotImplementedError


MEASURES = [
    GaussianMeasure.create(0.0, 1.0),
    GaussianMeasure.create(0.5, 2.0),
    UniformMeasure.create(-1.0, 2.0),
    EmpiricalMeasure.create(np.linspace(-2, 2, 7).reshape(-1, 1)),
    EmpiricalMeasure.create(
        np.linspace(-2, 2, 5).reshape(-1, 1),
        np.array([0.1, 0.2, 0.4, 0.2, 0.1]).reshape(-1, 1),
    ),
    MOGMeasure.create(np.array([-1.0, 1.5]), np.array([0.5, 1.2]), np.array([0.3, 0.7])),
]


@pytest.mark.parametrize("measure", MEASURES, ids=lambda m: type(m).__name__ + "_" + str(id(m))[-4:])
@pytest.mark.parametrize("lengthscale", [0.7, 1.3])
def test_cov_x_s_matches_monte_carlo(measure, lengthscale, rng):
    k = OrthogonalRBF.create(measure, lengthscale=lengthscale, variance=1.4)
    x = np.linspace(-1.5, 1.5, 9)
    s = _sample(measure, rng, N_MC)
    mc = np.asarray(rbf(k, x, s)).mean(axis=1)
    np.testing.assert_allclose(np.asarray(cov_x_s(k, x)), mc, atol=2e-2)


@pytest.mark.parametrize("measure", MEASURES, ids=lambda m: type(m).__name__ + "_" + str(id(m))[-4:])
def test_var_s_matches_monte_carlo(measure, rng):
    k = OrthogonalRBF.create(measure, lengthscale=0.9, variance=1.1)
    s1 = _sample(measure, rng, N_MC)
    mc = np.asarray(cov_x_s(k, s1)).mean()
    np.testing.assert_allclose(float(var_s(k)), mc, atol=2e-2)


@pytest.mark.parametrize("measure", MEASURES, ids=lambda m: type(m).__name__ + "_" + str(id(m))[-4:])
def test_constrained_kernel_integrates_to_zero(measure, rng):
    """∫ K(x, s) dμ(s) = 0 for every x — the defining property."""
    k = OrthogonalRBF.create(measure, lengthscale=0.8, variance=1.0)
    x = np.linspace(-1.0, 1.0, 5)
    s = _sample(measure, rng, N_MC)
    integral = np.asarray(K(k, x, s)).mean(axis=1)
    np.testing.assert_allclose(integral, np.zeros_like(integral), atol=2e-2)


def test_empirical_measure_exact_orthogonality():
    """Under an empirical measure the integral is a finite sum — exact to fp."""
    loc = np.linspace(-2, 2, 6).reshape(-1, 1)
    w = np.array([0.1, 0.15, 0.25, 0.2, 0.2, 0.1]).reshape(-1, 1)
    m = EmpiricalMeasure.create(loc, w)
    k = OrthogonalRBF.create(m, lengthscale=0.5, variance=2.0)
    x = np.linspace(-1, 1, 4)
    gram = np.asarray(K(k, x, loc[:, 0]))
    np.testing.assert_allclose(gram @ w[:, 0], 0.0, atol=1e-12)


def test_binary_kernel_orthogonal():
    k = OrthogonalBinary.create(p0=0.3, variance=1.7)
    B = np.asarray(ortho_binary.output_covariance(k))
    p = np.array([0.3, 0.7])
    np.testing.assert_allclose(p @ B @ p, 0.0, atol=1e-14)
    # gram equals table lookup
    x = np.array([0.0, 1.0, 1.0, 0.0])
    gram = np.asarray(ortho_binary.K(k, x))
    expect = B[x.astype(int)][:, x.astype(int)]
    np.testing.assert_allclose(gram, expect, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(ortho_binary.K_diag(k, x)), np.diag(expect), atol=1e-14
    )


def test_categorical_kernel_orthogonal():
    p = np.array([0.2, 0.5, 0.3]).reshape(-1, 1)
    k = OrthogonalCategorical.create(p=p, rank=2)
    B = np.asarray(ortho_categorical.output_covariance(k))
    np.testing.assert_allclose(p[:, 0] @ B @ p[:, 0], 0.0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(ortho_categorical.output_variance(k)), np.diag(B), atol=1e-12
    )
    x = np.array([0.0, 2.0, 1.0, 1.0])
    gram = np.asarray(ortho_categorical.K(k, x))
    np.testing.assert_allclose(gram, B[x.astype(int)][:, x.astype(int)], atol=1e-12)


def test_gaussian_sampled_function_mean_zero(rng):
    """Draw GP samples with the constrained kernel; the measure-weighted mean
    of each sample should be ~0 (reference test_orthogonality.py:83-149)."""
    m = GaussianMeasure.create(0.0, 1.0)
    k = OrthogonalRBF.create(m, lengthscale=1.0, variance=1.0)
    s = rng.normal(0.0, 1.0, 3000)
    gram = np.asarray(K(k, s, s)) + 1e-8 * np.eye(len(s))
    L = np.linalg.cholesky(gram)
    f = L @ rng.normal(size=(len(s), 8))
    mean_of_samples = f.mean(axis=0)
    assert np.all(np.abs(mean_of_samples) < 0.1)
