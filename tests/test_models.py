"""GP model correctness: GPR marginal likelihood vs direct numpy, SGPR bound
properties and Z=X equivalence to exact GP, SVGP prior/posterior consistency,
and posterior_stats reproducing predict_f across all models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oak_tpu.kernels import OAKKernel
from oak_tpu.models import GPR, SGPR, SVGP, Bernoulli, Gaussian


def _make_data(rng, n=25, d=2):
    X = rng.normal(size=(n, d))
    y = np.sin(X[:, 0]) + 0.5 * X[:, 1] ** 2 + 0.1 * rng.normal(size=n)
    return X, y.reshape(-1, 1)


def _kernel(d=2, depth=2):
    return OAKKernel.create(num_dims=d, max_interaction_depth=depth)


def test_gpr_lml_matches_numpy(rng):
    X, y = _make_data(rng)
    m = GPR.create(X, y, _kernel(), noise_variance=0.1)
    K = np.asarray(m.kernel.K(jnp.asarray(X)))
    Ky = K + 0.1 * np.eye(len(X))
    sign, logdet = np.linalg.slogdet(Ky)
    quad = y[:, 0] @ np.linalg.solve(Ky, y[:, 0])
    expected = -0.5 * (quad + logdet + len(X) * np.log(2 * np.pi))
    np.testing.assert_allclose(float(m.log_marginal_likelihood()), expected, rtol=1e-8)


def test_gpr_predict_train_points_interpolates(rng):
    X, y = _make_data(rng)
    m = GPR.create(X, y, _kernel(), noise_variance=1e-5)
    mu, var = m.predict_f(X)
    # near-noiseless GP approximately interpolates the training targets
    resid = np.abs(np.asarray(mu) - y)
    assert np.mean(resid) < 0.02
    assert np.max(resid) < 0.15
    assert np.all(np.asarray(var) >= -1e-9)


def test_gpr_posterior_stats_consistent(rng):
    X, y = _make_data(rng)
    Xs = rng.normal(size=(7, 2))
    m = GPR.create(X, y, _kernel(), noise_variance=0.1)
    mu, var = m.predict_f(Xs)
    alpha, Qinv = m.posterior_stats()
    Kxu = np.asarray(m.kernel.K(jnp.asarray(Xs), jnp.asarray(X)))
    np.testing.assert_allclose(np.asarray(mu), Kxu @ np.asarray(alpha), rtol=1e-7, atol=1e-9)
    var2 = np.asarray(m.kernel.K_diag(jnp.asarray(Xs))) - np.einsum(
        "sm,mn,sn->s", Kxu, np.asarray(Qinv), Kxu
    )
    np.testing.assert_allclose(np.asarray(var)[:, 0], var2, rtol=1e-6, atol=1e-9)


def test_sgpr_bound_respects_analytic_cap_everywhere(rng):
    """The Titsias bound with its exact-math inequalities enforced
    (models/sgpr.py::elbo) is STRUCTURALLY capped by the sigma-only terms:
    every other term is clamped <= 0, so for ANY parameter state — healthy,
    collapsed, or f32-broken — elbo <= -N*R/2*(log 2pi + log sigma^2).
    Round-5 regression: on the depth-8 pumadyn SGPR in f32, the unclamped
    bound reached -5.3e8 of fabricated reward in the interpolation-collapse
    basin and L-BFGS optimized the bug into a NaN-predicting model."""
    from oak_tpu.params import flatten_trainable

    X, y = _make_data(rng, n=40, d=3)
    Z = X[:12]
    m0 = SGPR.create(jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
                     _kernel(d=3), Z=jnp.asarray(Z, jnp.float32),
                     noise_variance=0.01)
    vec0, unflatten = flatten_trainable(m0)
    for scale, seed in ((0.3, 0), (3.0, 1), (10.0, 2), (30.0, 3)):
        r = np.random.default_rng(seed)
        vec = jnp.asarray(
            np.asarray(vec0) + scale * r.standard_normal(vec0.shape),
            vec0.dtype)
        m = unflatten(vec)
        elbo = float(m.elbo())
        if not np.isfinite(elbo):
            continue  # NaN is an honest failure mode; fabricated reward isn't
        sigma2 = float(m.likelihood.variance.value)
        cap = -0.5 * y.size * (np.log(2 * np.pi) + np.log(sigma2))
        assert elbo <= cap + 1e-3 * abs(cap) + 1.0, (scale, seed, elbo, cap)


def test_sgpr_bound_below_lml_and_tight_at_Z_eq_X(rng):
    X, y = _make_data(rng, n=30)
    k = _kernel()
    gpr = GPR.create(X, y, k, noise_variance=0.1)
    lml = float(gpr.log_marginal_likelihood())

    Z = X[rng.choice(30, 10, replace=False)]
    sgpr = SGPR.create(X, y, k, Z, noise_variance=0.1)
    assert float(sgpr.elbo()) < lml + 1e-6

    sgpr_full = SGPR.create(X, y, k, X.copy(), noise_variance=0.1)
    # collapsed bound is tight when Z = X (up to jitter)
    np.testing.assert_allclose(float(sgpr_full.elbo()), lml, rtol=1e-4)


def test_sgpr_predict_matches_gpr_at_Z_eq_X(rng):
    X, y = _make_data(rng, n=20)
    Xs = rng.normal(size=(6, 2))
    k = _kernel()
    gpr = GPR.create(X, y, k, noise_variance=0.1)
    sgpr = SGPR.create(X, y, k, X.copy(), noise_variance=0.1)
    mu1, var1 = gpr.predict_f(Xs)
    mu2, var2 = sgpr.predict_f(Xs)
    # agreement limited by the 1e-6 jitter SGPR adds to Kuu
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=5e-4)
    np.testing.assert_allclose(np.asarray(var1), np.asarray(var2), atol=1e-3)


def test_sgpr_posterior_stats_consistent(rng):
    X, y = _make_data(rng, n=30)
    Xs = rng.normal(size=(5, 2))
    Z = X[:8]
    m = SGPR.create(X, y, _kernel(), Z, noise_variance=0.1)
    mu, var = m.predict_f(Xs)
    alpha, Qinv = m.posterior_stats()
    Kxu = np.asarray(m.kernel.K(jnp.asarray(Xs), jnp.asarray(Z)))
    np.testing.assert_allclose(np.asarray(mu), Kxu @ np.asarray(alpha), rtol=1e-6, atol=1e-8)
    var2 = np.asarray(m.kernel.K_diag(jnp.asarray(Xs))) - np.einsum(
        "sm,mn,sn->s", Kxu, np.asarray(Qinv), Kxu
    )
    np.testing.assert_allclose(np.asarray(var)[:, 0], var2, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("q_diag", [True, False])
def test_svgp_prior_state(rng, q_diag):
    X, y = _make_data(rng, n=15)
    k = _kernel()
    Z = X[:6]
    m = SVGP.create(k, Gaussian.create(0.1), Z, q_diag=q_diag)
    # untrained q: mean 0, prior variance, zero KL
    assert float(m.prior_kl()) == pytest.approx(0.0, abs=1e-10)
    mu, var = m.predict_f(X)
    np.testing.assert_allclose(np.asarray(mu), 0.0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(var)[:, 0], np.asarray(k.K_diag(jnp.asarray(X))), rtol=1e-6
    )


@pytest.mark.parametrize("q_diag", [True, False])
@pytest.mark.parametrize("whiten", [True, False])
def test_svgp_posterior_stats_consistent(rng, q_diag, whiten):
    X, y = _make_data(rng, n=15)
    k = _kernel()
    Z = X[:6]
    m = SVGP.create(k, Gaussian.create(0.1), Z, q_diag=q_diag, whiten=whiten)
    # randomize q
    key = jax.random.PRNGKey(1)
    m = m.replace(q_mu=m.q_mu.assign(jax.random.normal(key, m.q_mu.value.shape)))
    qs = m.q_sqrt.value
    m = m.replace(q_sqrt=m.q_sqrt.assign(qs * 0.7 + 0.1 * jnp.abs(qs)))

    Xs = rng.normal(size=(5, 2))
    mu, var = m.predict_f(Xs)
    alpha, Qinv = m.posterior_stats()
    Kxu = np.asarray(m.kernel.K(jnp.asarray(Xs), jnp.asarray(Z)))
    np.testing.assert_allclose(np.asarray(mu), Kxu @ np.asarray(alpha), rtol=1e-6, atol=1e-8)
    var2 = np.asarray(m.kernel.K_diag(jnp.asarray(Xs))) - np.einsum(
        "sm,mn,sn->s", Kxu, np.asarray(Qinv), Kxu
    )
    np.testing.assert_allclose(np.asarray(var)[:, 0], var2, rtol=1e-5, atol=1e-8)


def test_svgp_gaussian_elbo_below_lml(rng):
    X, y = _make_data(rng, n=20)
    k = _kernel()
    gpr = GPR.create(X, y, k, noise_variance=0.1)
    m = SVGP.create(k, Gaussian.create(0.1), X.copy(), q_diag=False, num_data=20)
    assert float(m.elbo(X, y)) < float(gpr.log_marginal_likelihood())


def test_svgp_bernoulli_elbo_finite_and_differentiable(rng):
    n = 20
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] > 0).astype(float).reshape(-1, 1)
    k = _kernel()
    m = SVGP.create(k, Bernoulli.create("logit"), X[:5].copy(), q_diag=True)

    def loss(model):
        return model.training_loss(X, y)

    val, grads = jax.value_and_grad(loss)(m)
    assert np.isfinite(float(val))
    gl = jax.tree_util.tree_leaves(grads.q_mu)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in gl)


def test_gaussian_vs_bernoulli_predict_log_density_shapes(rng):
    X, y = _make_data(rng, n=12)
    m = GPR.create(X, y, _kernel(), noise_variance=0.1)
    ld = m.predict_log_density(X, y)
    assert ld.shape == (12,)
    assert np.all(np.isfinite(np.asarray(ld)))


def test_gpr_multioutput_columns(rng):
    """Multi-column Y: log marginal sums per-column terms, predictions share
    variance (GPflow semantics the reference relies on)."""
    X = rng.normal(size=(20, 2))
    Y = np.column_stack([np.sin(X[:, 0]), np.cos(X[:, 1])])
    m = GPR.create(X, Y, _kernel(), noise_variance=0.1)
    lml = float(m.log_marginal_likelihood())
    l1 = float(GPR.create(X, Y[:, :1], _kernel(), noise_variance=0.1)
               .log_marginal_likelihood())
    l2 = float(GPR.create(X, Y[:, 1:], _kernel(), noise_variance=0.1)
               .log_marginal_likelihood())
    np.testing.assert_allclose(lml, l1 + l2, rtol=1e-9)
    mu, var = m.predict_f(X[:5])
    assert mu.shape == (5, 2) and var.shape == (5, 2)


def test_bernoulli_predict_log_density_vs_mc(rng):
    """Gauss-Hermite predictive density against Monte Carlo over f."""
    from oak_tpu.models.likelihoods import Bernoulli

    lik = Bernoulli.create("logit")
    fmu = jnp.asarray([[0.3], [-1.2], [2.0]])
    fvar = jnp.asarray([[0.5], [1.5], [0.2]])
    y = jnp.asarray([[1.0], [0.0], [1.0]])
    ld = np.asarray(lik.predict_log_density(fmu, fvar, y))
    f = rng.normal(size=(3, 1, 200_000)) * np.sqrt(np.asarray(fvar))[:, :, None] \
        + np.asarray(fmu)[:, :, None]
    p = np.asarray(lik.invlink(jnp.asarray(f)))
    dens = np.where(np.asarray(y)[:, :, None] > 0.5, p, 1 - p).mean(axis=-1)
    np.testing.assert_allclose(np.exp(ld)[:, 0], dens[:, 0], rtol=5e-3)


def test_bernoulli_gradients_finite_at_extreme_variance():
    """f32 overflow regression (round-4 heart NaN fits): a cold-started
    depth-4 OAK prior has marginal variance O(100), whose Gauss-Hermite
    grid reaches f ~ -100 — the naive 1/(1+exp(-f)) logit link overflows
    f32 there with a finite (clipped) forward but a NaN backward, which
    then poisons every training gradient. inv_logit now uses the stable
    sigmoid; both links must carry finite gradients through variational
    expectations at these magnitudes."""
    import jax

    from oak_tpu.models.likelihoods import Bernoulli

    for link in ("logit", "probit"):
        lik = Bernoulli.create(link)
        fmu = jnp.asarray([[0.0], [30.0], [-30.0]], jnp.float32)
        fvar = jnp.asarray([[188.0], [200.0], [150.0]], jnp.float32)
        y = jnp.asarray([[1.0], [0.0], [1.0]], jnp.float32)

        def ve(args):
            mu, v = args
            return jnp.sum(lik.variational_expectations(mu, v, y))

        val, (gmu, gv) = jax.value_and_grad(ve)((fmu, fvar))
        assert np.isfinite(float(val)), link
        assert np.isfinite(np.asarray(gmu)).all(), link
        assert np.isfinite(np.asarray(gv)).all(), link


def test_quadrature_gradients_finite_at_zero_variance():
    """The OTHER f32 gradient trap on the heart config (round-5 root cause):
    the SVGP predictive variance cancels to <= 0 at points coinciding with
    discrete inducing codes, and sqrt(maximum(var, 0.0)) in the quadrature
    is finite FORWARD but sqrt'(0) = inf BACKWARD — the inf reached every
    parameter feeding fvar (kernel + q_sqrt, not q_mu) and NaNed the first
    L-BFGS update direction of every restart lane while their stored losses
    stayed finite. The quadrature scale now uses a strictly positive floor
    whose clamp routes the cotangent to the floor branch: gradient exactly
    0 at and below var = 0."""
    import jax

    from oak_tpu.models.likelihoods import Bernoulli
    from oak_tpu.ops.quadrature import gauss_hermite

    lik = Bernoulli.create("logit")
    y = jnp.asarray([[1.0], [0.0], [1.0]], jnp.float32)
    fmu = jnp.asarray([[0.3], [-0.2], [1.0]], jnp.float32)
    for bad in (0.0, -1e-6, -3e-8):
        fvar = jnp.asarray([[bad], [0.7], [bad]], jnp.float32)

        def ve(args):
            mu, v = args
            return jnp.sum(lik.variational_expectations(mu, v, y))

        val, (gmu, gv) = jax.value_and_grad(ve)((fmu, fvar))
        assert np.isfinite(float(val)), bad
        assert np.isfinite(np.asarray(gmu)).all(), bad
        assert np.isfinite(np.asarray(gv)).all(), bad
        # and through predict_mean_and_var (the serving path)
        gp = jax.grad(lambda v: jnp.sum(
            gauss_hermite(lik.invlink, fmu, v)))(fvar)
        assert np.isfinite(np.asarray(gp)).all(), bad
