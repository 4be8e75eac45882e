"""predict_f_samples: joint posterior draws match the analytic predictive
moments (mean and marginal variance) and respect cross-point correlation
structure; all three model classes; seeds reproduce."""

import jax.numpy as jnp
import numpy as np

from oak_tpu.kernels import OAKKernel
from oak_tpu.models import GPR, SGPR, SVGP, Bernoulli, Gaussian


def _data(rng, n=30, d=2):
    X = rng.normal(size=(n, d))
    y = (np.sin(X[:, 0]) + 0.3 * X[:, 1]).reshape(-1, 1) \
        + 0.05 * rng.normal(size=(n, 1))
    return X, y


def _check_moments(model, Xs, n_samples=4000):
    mu, var = (np.asarray(a) for a in model.predict_f(jnp.asarray(Xs)))
    draws = np.asarray(model.predict_f_samples(jnp.asarray(Xs),
                                               num_samples=n_samples, seed=3))
    assert draws.shape == (n_samples, Xs.shape[0], mu.shape[1])
    emp_mu = draws.mean(axis=0)
    emp_var = draws.var(axis=0)
    se = np.sqrt(var / n_samples)
    np.testing.assert_allclose(emp_mu, mu, atol=5 * se.max() + 1e-6)
    np.testing.assert_allclose(emp_var, var, rtol=0.15, atol=1e-6)
    # joint structure: empirical covariance of the first two points matches
    # the full predictive covariance entry
    _, cov = model.predict_f(jnp.asarray(Xs), full_cov=True)
    cov = np.asarray(cov)
    c01 = cov[0, 1] if cov.ndim == 2 else cov[0, 0, 1]
    emp_c01 = np.cov(draws[:, 0, 0], draws[:, 1, 0])[0, 1]
    tol = 5 * np.sqrt((cov[0, 0] if cov.ndim == 2 else cov[0, 0, 0])
                      * (cov[1, 1] if cov.ndim == 2 else cov[0, 1, 1])
                      / n_samples) + 0.1 * abs(c01) + 1e-6
    assert abs(emp_c01 - c01) < tol


def test_gpr_samples_match_posterior(rng):
    X, y = _data(rng)
    m = GPR.create(X, y, OAKKernel.create(num_dims=2, max_interaction_depth=2),
                   noise_variance=0.05)
    _check_moments(m, X[:6])


def test_sgpr_samples_match_posterior(rng):
    X, y = _data(rng)
    m = SGPR.create(X, y, OAKKernel.create(num_dims=2, max_interaction_depth=2),
                    X[:8].copy(), noise_variance=0.05)
    _check_moments(m, X[:6])


def test_svgp_samples_match_posterior(rng):
    X, y = _data(rng)
    k = OAKKernel.create(num_dims=2, max_interaction_depth=2)
    for q_diag in (True, False):
        m = SVGP.create(k, Gaussian.create(0.05), X[:8].copy(), q_diag=q_diag,
                        whiten=True, num_data=X.shape[0])
        # move q off the deterministic init so variance is non-trivial
        m = m.replace(q_mu=m.q_mu.assign(rng.normal(size=(8, 1))))
        _check_moments(m, X[:6])


def test_samples_reproducible_and_distinct(rng):
    X, y = _data(rng)
    m = GPR.create(X, y, OAKKernel.create(num_dims=2, max_interaction_depth=2),
                   noise_variance=0.05)
    a = np.asarray(m.predict_f_samples(X[:4], num_samples=2, seed=7))
    b = np.asarray(m.predict_f_samples(X[:4], num_samples=2, seed=7))
    c = np.asarray(m.predict_f_samples(X[:4], num_samples=2, seed=8))
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_oak_model_samples_original_units(rng):
    from oak_tpu.model import oak_model

    X, y = _data(rng, n=40)
    y = y * 7.0 + 3.0  # non-trivial target scale
    oak = oak_model(max_interaction_depth=2)
    oak.fit(X, y, optimise=False)
    oak.optimise(max_iters=40)
    draws = oak.predict_f_samples(X[:8], num_samples=3000, seed=5, clip=True)
    assert draws.shape == (3000, 8)
    pred = oak.predict(X[:8], clip=True)
    # sample mean in original units tracks the predictive mean
    np.testing.assert_allclose(draws.mean(axis=0), pred, atol=0.3)


def test_oak_model_samples_bernoulli_probs(rng):
    from oak_tpu.model import oak_model

    X = rng.normal(size=(40, 2))
    y = (X[:, 0] > 0).astype(float).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=2, likelihood="bernoulli")
    oak.fit(X, y, optimise=False)
    oak.optimise(max_iters=20)
    draws = oak.predict_f_samples(X[:6], num_samples=500, seed=1)
    assert draws.shape == (500, 6)
    assert draws.min() >= 0.0 and draws.max() <= 1.0
    # mean of prob draws approximates the posterior-predictive probability
    np.testing.assert_allclose(draws.mean(axis=0),
                               oak.predict_proba(X[:6]), atol=0.08)
