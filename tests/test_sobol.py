"""Sobol-index correctness: closed forms vs Monte Carlo and quadrature,
discrete-kernel L identities, known-answer indices for an analytic function,
per-order totals vs enumeration, and component predictions summing to the
full predictive mean (reference test_sobol.py / test_sobol_oak_kernel.py /
test_utils.py patterns)."""

import jax.numpy as jnp
import numpy as np
import pytest

from oak_tpu.kernels import OAKKernel, OrthogonalBinary, OrthogonalCategorical, OrthogonalRBF
from oak_tpu.kernels import ortho_binary, ortho_categorical, ortho_rbf
from oak_tpu.measures import EmpiricalMeasure, GaussianMeasure, MOGMeasure, UniformMeasure
from oak_tpu.models import GPR, SGPR
from oak_tpu.optim import fit_lbfgs
from oak_tpu import sobol as sb


def test_L_gaussian_matches_monte_carlo(rng):
    delta, mu = 1.0, 0.0
    k = OrthogonalRBF.create(GaussianMeasure.create(mu, delta ** 2),
                             lengthscale=0.8, variance=1.3)
    x = jnp.asarray(np.linspace(-1.5, 1.5, 6))
    L = np.asarray(sb.compute_L_gaussian(x, k.lengthscale.value, k.variance.value,
                                         delta, mu))
    s = rng.normal(mu, delta, 400_000)
    Kxs = np.asarray(ortho_rbf.K(k, x, jnp.asarray(s)))
    L_mc = (Kxs @ Kxs.T) / len(s)
    np.testing.assert_allclose(L, L_mc, atol=5e-3)


@pytest.mark.parametrize("measure", [
    GaussianMeasure.create(0.3, 1.5),
    UniformMeasure.create(-1.0, 2.0),
    MOGMeasure.create(np.array([-1.0, 1.0]), np.array([0.4, 0.9]),
                      np.array([0.4, 0.6])),
])
def test_L_quadrature_matches_monte_carlo(measure, rng):
    from tests.test_orthogonality import _sample

    k = OrthogonalRBF.create(measure, lengthscale=0.9, variance=1.1)
    x = jnp.asarray(np.linspace(-1.0, 1.0, 5))
    L = np.asarray(sb.compute_L_quadrature(k, x))
    s = _sample(measure, rng, 400_000)
    Kxs = np.asarray(ortho_rbf.K(k, x, jnp.asarray(s)))
    L_mc = (Kxs @ Kxs.T) / len(s)
    np.testing.assert_allclose(L, L_mc, atol=5e-3)


def test_L_quadrature_matches_closed_form_gaussian():
    k = OrthogonalRBF.create(GaussianMeasure.create(0.0, 1.0),
                             lengthscale=1.2, variance=0.7)
    x = jnp.asarray(np.linspace(-2, 2, 8))
    L_q = np.asarray(sb.compute_L_quadrature(k, x, num_points=64))
    L_c = np.asarray(sb.compute_L_gaussian(x, k.lengthscale.value,
                                           k.variance.value, 1.0, 0.0))
    np.testing.assert_allclose(L_q, L_c, rtol=1e-8, atol=1e-10)


def test_L_binary_exact_identity():
    """L_ij = sum_c p_c B[x_i, c] B[x_j, c] — exact (reference
    tests/test_sobol.py:187-208 checks this to 1e-16)."""
    k = OrthogonalBinary.create(p0=0.35, variance=1.8)
    x = jnp.asarray(np.array([0.0, 1.0, 1.0, 0.0, 1.0]))
    L = np.asarray(sb.compute_L_binary(k, x))
    B = np.asarray(ortho_binary.output_covariance(k))
    p = np.array([0.35, 0.65])
    xi = np.asarray(x, int)
    expect = np.einsum("c,ic,jc->ij", p, B[xi], B[xi])
    np.testing.assert_allclose(L, expect, atol=1e-14)


def test_L_categorical_exact_identity():
    p = np.array([0.2, 0.5, 0.3]).reshape(-1, 1)
    k = OrthogonalCategorical.create(p=p, rank=2)
    x = jnp.asarray(np.array([0.0, 2.0, 1.0, 1.0]))
    L = np.asarray(sb.compute_L_categorical(k, x))
    B = np.asarray(ortho_categorical.output_covariance(k))
    xi = np.asarray(x, int)
    expect = np.einsum("c,ic,jc->ij", p[:, 0], B[xi], B[xi])
    np.testing.assert_allclose(L, expect, atol=1e-12)


def test_L_empirical_matches_direct():
    loc = np.linspace(-2, 2, 9).reshape(-1, 1)
    w = np.ones((9, 1)) / 9
    k = OrthogonalRBF.create(EmpiricalMeasure.create(loc, w), lengthscale=0.7)
    x = jnp.asarray(np.linspace(-1, 1, 5))
    L = np.asarray(sb.compute_L_empirical(k, x))
    Kxu = np.asarray(ortho_rbf.K(k, jnp.asarray(loc[:, 0]), x))
    expect = Kxu.T @ (w * Kxu)
    np.testing.assert_allclose(L, expect, atol=1e-13)


def _fit_known_model(rng, n=256, sparse=False):
    """y = x0^2 + 2 x1 + x0 x1, x ~ N(0, I): true Sobol [2, 4, 1].

    The exact-GP case runs *without* priors or bounds — a stress test of the
    hybrid L construction under the flat large-lengthscale/large-variance
    direction. The sparse case uses the reference's regularisation defaults
    (Gamma sparsity prior + lengthscale bounds, create_model_oak
    model_utils.py:161-165,199) without which the collapsed bound diverges.
    """
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] ** 2 + 2 * X[:, 1] + X[:, 0] * X[:, 1]).reshape(-1, 1)
    if sparse:
        k = OAKKernel.create(num_dims=2, max_interaction_depth=2,
                             use_sparsity_prior=True,
                             lengthscale_bounds=[1e-3, 1e3])
        Z = X[rng.choice(n, 64, replace=False)]
        m = SGPR.create(X, y, k, Z, noise_variance=0.01)
    else:
        k = OAKKernel.create(num_dims=2, max_interaction_depth=2)
        m = GPR.create(X, y, k, noise_variance=0.01)
    res = fit_lbfgs(m, lambda mm: mm.training_loss(), max_iters=150)
    return res.model


@pytest.mark.parametrize("sparse", [False, True])
def test_known_answer_sobol(rng, sparse):
    m = _fit_known_model(rng, sparse=sparse)
    tuples, vals = sb.compute_sobol_oak(m)
    assert tuples == [[0], [1], [0, 1]]
    normalized = vals / vals.sum()
    np.testing.assert_allclose(normalized, np.array([2, 4, 1]) / 7.0, atol=0.06)


def test_sobol_by_order_matches_enumeration(rng):
    # regularized model: the Newton-Girard by-order route shares the Hadamard
    # quadratic form's conditioning, so compare on a well-conditioned fit
    m = _fit_known_model(rng, n=128, sparse=True)
    tuples, vals = sb.compute_sobol_oak(m)
    by_order = sb.compute_sobol_by_order(m)
    expect = np.zeros(2)
    for t, v in zip(tuples, vals):
        expect[len(t) - 1] += v
    np.testing.assert_allclose(by_order, expect, rtol=1e-6)


def test_prediction_components_sum_to_mean(rng):
    # regularized model: with a near-noiseless unregularized fit |alpha| is
    # ~1e6 and the decomposition identity only holds to ~1e-2 absolute
    # because K(x*, X) alpha cancels at machine precision
    m = _fit_known_model(rng, n=96, sparse=True)
    Xs = rng.normal(size=(20, 2))
    comps = sb.get_prediction_component(m, X=Xs)
    alpha, _ = m.posterior_stats()
    constant = float(np.asarray(alpha).sum() * np.asarray(m.kernel.variances[0].value))
    total = comps.sum(axis=0) + constant
    mu, _ = m.predict_f(Xs)
    np.testing.assert_allclose(total, np.asarray(mu)[:, 0], rtol=1e-6, atol=1e-8)


def test_empirical_sobol_equals_weighted_component_variance(rng):
    """Under an empirical measure, R_c = sum_i w_i f_c(loc_i)^2 exactly
    (reference test_sobol_oak_kernel.py:129-201 pattern)."""
    n = 40
    X = rng.normal(size=(n, 1))
    y = np.sin(X)
    loc, w = np.unique(X[:, 0], return_counts=True)
    loc = loc.reshape(-1, 1)
    w = (w / w.sum()).reshape(-1, 1)
    k = OAKKernel.create(num_dims=1, max_interaction_depth=1,
                         empirical_locations=[loc], empirical_weights=[w])
    m = GPR.create(X, y, k, noise_variance=0.01)
    tuples, vals = sb.compute_sobol_oak(m)
    comps = sb.get_prediction_component(m, X=loc.reshape(-1, 1))
    expect = float((w[:, 0] * comps[0] ** 2).sum())
    np.testing.assert_allclose(vals[0], expect, rtol=1e-8)


def test_mog_sobol_supported(rng):
    """The reference raises NotImplementedError for MOG measures
    (utils.py:413-414); we support them via quadrature."""
    n = 60
    X = rng.normal(size=(n, 1))
    y = np.sin(X)
    mog = MOGMeasure.create(np.array([-0.5, 0.5]), np.array([0.8, 1.2]),
                            np.array([0.5, 0.5]))
    k = OAKKernel.create(num_dims=1, max_interaction_depth=1, gmm_measures=[mog])
    m = GPR.create(X, y, k, noise_variance=0.01)
    tuples, vals = sb.compute_sobol_oak(m)
    assert np.isfinite(vals).all() and vals[0] > 0


def test_known_answer_sobol_unshared_variance(rng):
    """Duvenaud parameterization (share_var_across_orders=False): per-kernel
    base variances are trainable and enter the Sobol values quadratically
    inside each L (reference test_sobol_oak_kernel.py covers both modes)."""
    n = 256
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] ** 2 + 2 * X[:, 1] + X[:, 0] * X[:, 1]).reshape(-1, 1)
    k = OAKKernel.create(num_dims=2, max_interaction_depth=2,
                         share_var_across_orders=False,
                         lengthscale_bounds=[1e-3, 1e2])
    m = GPR.create(X, y, k, noise_variance=0.01)
    m = fit_lbfgs(m, lambda mm: mm.training_loss(), max_iters=150).model
    tuples, vals = sb.compute_sobol_oak(m)
    normalized = vals / vals.sum()
    np.testing.assert_allclose(normalized, np.array([2, 4, 1]) / 7.0, atol=0.08)


# --------------------------------------------------------------------------- #
# Batched high-order component paths (the ladder replacing per-component maps)
# --------------------------------------------------------------------------- #
def _naive_component_sobol(m, depth):
    """Direct per-component Hadamard products in numpy — ground truth for the
    batched ladder (reference semantics utils.py:369-432)."""
    from oak_tpu.kernels import component_index_tuples

    oak = m.kernel
    X = jnp.asarray(sb._model_X(m))
    a = np.asarray(m.posterior_alpha())[:, 0]
    tuples = component_index_tuples(oak.num_dims, depth)[1:]
    Ls = [np.asarray(sb.compute_L_for_kernel(k, X[:, k.active_dim]))
          for k in oak.kernels]
    vals = []
    for t in tuples:
        L = Ls[t[0]].copy()
        for d in t[1:]:
            L = L * Ls[d]
        vals.append(a @ L @ a)
    orders = jnp.asarray([len(t) for t in tuples], jnp.int32)
    scales = np.asarray(sb._order_scales(oak, orders, Ls[0].dtype))
    return tuples, np.asarray(vals) * scales


def _random_model(rng, d=5, depth=4, n=64):
    X = rng.normal(size=(n, d))
    y = np.sin(X.sum(axis=1, keepdims=True))
    k = OAKKernel.create(num_dims=d, max_interaction_depth=depth,
                         lengthscale_bounds=[1e-3, 1e3])
    return GPR.create(X, y, k, noise_variance=0.1)


def test_high_order_sobol_matches_naive(rng):
    """Depth-4 model: orders 3-4 go through the batched matmul ladder; they
    must match the direct per-component Hadamard computation."""
    m = _random_model(rng, d=5, depth=4)
    tuples, vals = sb.compute_sobol_oak(m)
    naive_tuples, naive_vals = _naive_component_sobol(m, 4)
    assert [tuple(t) for t in tuples] == [tuple(t) for t in naive_tuples]
    np.testing.assert_allclose(vals, naive_vals, rtol=1e-6, atol=1e-12)


def test_ladder_chunked_fallback(rng, monkeypatch):
    """With the ladder memory cap forced to zero, higher orders fall back to
    the chunked gather-product map — values must be identical."""
    monkeypatch.setattr(sb, "_LADDER_BYTES_CAP", 1)
    m = _random_model(rng, d=6, depth=4, n=48)
    tuples, vals = sb.compute_sobol_oak(m)
    _, naive_vals = _naive_component_sobol(m, 4)
    np.testing.assert_allclose(vals, naive_vals, rtol=1e-6, atol=1e-12)


def test_nonfactor_routing_all_orders_ladder(rng):
    """A Gaussian-measure dim with a tiny lengthscale disables the factor
    route entirely (quadrature nodes too sparse), sending ALL orders through
    the ladder — including orders 1-2."""
    n, d = 48, 3
    X = rng.normal(size=(n, d))
    y = np.sin(X.sum(axis=1, keepdims=True))
    k = OAKKernel.create(num_dims=d, max_interaction_depth=3)
    # force one dim's lengthscale tiny: raw param for softplus ~ log(expm1(l))
    import dataclasses as dc  # noqa: F401
    ks = list(k.kernels)
    small = ks[0].replace(lengthscale=ks[0].lengthscale.replace(
        raw=jnp.asarray(np.log(np.expm1(0.05)))))
    k = k.replace(kernels=tuple([small] + ks[1:]))
    m = GPR.create(X, y, k, noise_variance=0.1)
    assert not all(sb._usable_factor(kk) for kk in m.kernel.kernels)
    tuples, vals = sb.compute_sobol_oak(m)
    _, naive_vals = _naive_component_sobol(m, 3)
    np.testing.assert_allclose(vals, naive_vals, rtol=1e-6, atol=1e-12)


def test_sobol_measure_override_rejected(rng):
    # delta/mu matching the kernel's own N(0,1) pass; differing ones raise
    import pytest

    from oak_tpu.kernels import OAKKernel
    from oak_tpu.models import GPR
    from oak_tpu.sobol import compute_sobol_oak

    X = rng.normal(size=(12, 2))
    y = X[:, :1]
    m = GPR.create(X, y, OAKKernel.create(num_dims=2, max_interaction_depth=2),
                   noise_variance=0.1)
    compute_sobol_oak(m, delta=1.0, mu=0.0)  # matches N(0,1): fine
    with pytest.raises(NotImplementedError, match="measure"):
        compute_sobol_oak(m, delta=2.0, mu=0.0)
    with pytest.raises(NotImplementedError, match="measure"):
        compute_sobol_oak(m, delta=1.0, mu=1.0)


def test_depth_override_above_model_depth_rejected(rng):
    import pytest

    from oak_tpu.kernels import OAKKernel
    from oak_tpu.models import GPR
    from oak_tpu.sobol import (compute_sobol_by_order, compute_sobol_oak,
                               get_prediction_component)

    X = rng.normal(size=(12, 3))
    y = X[:, :1]
    m = GPR.create(X, y, OAKKernel.create(num_dims=3, max_interaction_depth=2),
                   noise_variance=0.1)
    # truncation below the model depth is fine
    t1, v1 = compute_sobol_oak(m, max_interaction_depth=1)
    assert len(t1) == 3
    with pytest.raises(ValueError, match="exceeds"):
        compute_sobol_oak(m, max_interaction_depth=3)
    with pytest.raises(ValueError, match="exceeds"):
        compute_sobol_by_order(m, max_depth=3)
    with pytest.raises(ValueError, match="exceeds"):
        get_prediction_component(m, X=X, max_interaction_depth=3)


def test_unconstrained_kernel_sobol_clean_error(rng):
    import pytest

    from oak_tpu.kernels import OAKKernel
    from oak_tpu.models import GPR
    from oak_tpu.sobol import compute_sobol_oak

    X = rng.normal(size=(10, 2))
    m = GPR.create(X, X[:, :1],
                   OAKKernel.create(num_dims=2, max_interaction_depth=2,
                                    constrain_orthogonal=False),
                   noise_variance=0.1)
    with pytest.raises(NotImplementedError):
        compute_sobol_oak(m)


def test_depth_override_zero_means_full_depth(rng):
    """ADVICE r1: an explicit 0 must mean 'use the kernel depth' (the
    reference's `depth or model_depth` idiom), never an empty component
    list; negative depths are rejected loudly."""
    import pytest

    from oak_tpu.models import GPR

    X = rng.normal(size=(12, 3))
    m = GPR.create(X, X[:, :1],
                   OAKKernel.create(num_dims=3, max_interaction_depth=2),
                   noise_variance=0.1)
    t_full, v_full = sb.compute_sobol_oak(m)
    t_zero, v_zero = sb.compute_sobol_oak(m, max_interaction_depth=0)
    assert t_zero == t_full and len(t_zero) == 6
    np.testing.assert_allclose(v_zero, v_full)
    np.testing.assert_allclose(sb.compute_sobol_by_order(m, max_depth=0),
                               sb.compute_sobol_by_order(m))
    with pytest.raises(ValueError, match=">= 1"):
        sb.compute_sobol_oak(m, max_interaction_depth=-1)


def test_unknown_measure_routes_to_hadamard(rng):
    """ADVICE r1: an OrthogonalRBF whose measure factor_form does not
    recognize must route to the Hadamard path (clean NotImplementedError
    there), never the all-factor path's None subscript."""

    class _FakeMeasure:
        pass

    oak = OAKKernel.create(num_dims=2, max_interaction_depth=2)
    k0 = oak.kernels[0].replace(measure=_FakeMeasure())
    assert not sb._has_factor_form(k0)
    assert not sb._usable_factor(k0)
    assert sb.factor_form(k0, jnp.zeros((3,))) is None
    oak2 = oak.replace(kernels=(k0, oak.kernels[1]))
    assert sb._factor_routing(oak2) == (False, True)
    # the supported measures all still route to the factor path
    assert sb._factor_routing(oak) == (True, True)


def test_multi_latent_model_rejected(rng):
    """VERDICT r1 item 8: a multi-latent SVGP (or multi-output Y) reaching
    Sobol/plotting must raise cleanly instead of silently using latent 0
    (the reference's behavior, utils.py:174-179)."""
    import pytest

    from oak_tpu.models import SVGP, Gaussian
    from oak_tpu import plotting

    X = rng.normal(size=(14, 2))
    k = OAKKernel.create(num_dims=2, max_interaction_depth=2)
    m = SVGP.create(k, Gaussian.create(0.1), X[:6], num_latent=2)
    with pytest.raises(NotImplementedError, match="latent"):
        sb.compute_sobol_oak(m)
    with pytest.raises(NotImplementedError, match="latent"):
        sb.compute_sobol_by_order(m)
    with pytest.raises(NotImplementedError, match="latent"):
        sb.get_prediction_component(m, X=X)
    with pytest.raises(NotImplementedError, match="latent"):
        plotting._component_posterior(m, [0], [np.linspace(-1, 1, 4)])
    # single-latent passes the guard
    m1 = SVGP.create(k, Gaussian.create(0.1), X[:6])
    sb.check_single_latent(m1)


def test_multi_latent_sobol_by_selection(rng):
    """latent=r on the Sobol APIs (and select_latent for plotting) turns the
    round-1 guard into a capability: per-latent decompositions on a shared-
    kernel multi-latent SVGP, each equal to an independently constructed
    single-latent model with the same q(u) column."""
    from oak_tpu import plotting, select_latent
    from oak_tpu.models import SVGP, Gaussian

    X = rng.normal(size=(16, 2))
    k = OAKKernel.create(num_dims=2, max_interaction_depth=2)
    Z = X[:8]
    for q_diag in (True, False):
        m = SVGP.create(k, Gaussian.create(0.1), Z, num_latent=2,
                        q_diag=q_diag)
        # distinct non-trivial posteriors per latent
        q_mu = jnp.asarray(rng.normal(size=(8, 2)))
        m = m.replace(q_mu=m.q_mu.assign(q_mu))
        if q_diag:
            m = m.replace(q_sqrt=m.q_sqrt.assign(
                jnp.asarray(0.5 + rng.uniform(size=(8, 2)))))

        for r in (0, 1):
            single = SVGP.create(k, Gaussian.create(0.1), Z, num_latent=1,
                                 q_diag=q_diag)
            single = single.replace(
                q_mu=single.q_mu.assign(q_mu[:, r:r + 1]))
            if q_diag:
                single = single.replace(q_sqrt=single.q_sqrt.assign(
                    m.q_sqrt.value[:, r:r + 1]))
            else:
                single = single.replace(q_sqrt=single.q_sqrt.replace(
                    raw=m.q_sqrt.raw[r:r + 1]))

            tup_m, val_m = sb.compute_sobol_oak(m, latent=r)
            tup_s, val_s = sb.compute_sobol_oak(single)
            assert tup_m == tup_s
            np.testing.assert_allclose(val_m, val_s, rtol=1e-12)
            np.testing.assert_allclose(
                sb.compute_sobol_by_order(m, latent=r),
                sb.compute_sobol_by_order(single), rtol=1e-12)
            np.testing.assert_allclose(
                sb.get_prediction_component(m, X=X, latent=r),
                sb.get_prediction_component(single, X=X), rtol=1e-12)
            # plotting path on the selected view
            view = select_latent(m, r)
            mu_v, var_v = plotting._component_posterior(
                view, [0], [np.linspace(-1, 1, 5)])
            mu_s, var_s2 = plotting._component_posterior(
                single, [0], [np.linspace(-1, 1, 5)])
            np.testing.assert_allclose(mu_v, mu_s, rtol=1e-12)
            np.testing.assert_allclose(var_v, var_s2, rtol=1e-12)

    # bounds + unspecified-latent behavior
    m = SVGP.create(k, Gaussian.create(0.1), Z, num_latent=2)
    with pytest.raises(ValueError, match="out of range"):
        sb.compute_sobol_oak(m, latent=2)
    with pytest.raises(NotImplementedError, match="latent"):
        sb.compute_sobol_oak(m)


def test_multi_output_gpr_sobol_by_latent(rng):
    """Multi-output exact GPs (Y with R columns, shared kernel): latent=r
    slices the output column, so each output gets its own decomposition —
    outputs driven by different dims attribute mass to different dims."""
    from oak_tpu.models import GPR

    n = 64
    X = rng.normal(size=(n, 2))
    Y = np.stack([np.sin(2.0 * X[:, 0]),
                  0.8 * X[:, 1] ** 2], axis=1)
    k = OAKKernel.create(num_dims=2, max_interaction_depth=1)
    m = GPR.create(X, Y, k, noise_variance=0.05)

    _, v0 = sb.compute_sobol_oak(m, latent=0)
    _, v1 = sb.compute_sobol_oak(m, latent=1)
    # output 0 is a function of dim 0 only; output 1 of dim 1 only
    assert v0[0] > 5 * v0[1]
    assert v1[1] > 5 * v1[0]


@pytest.mark.parametrize("chunk", [False, True])
def test_depth3_einsum_fast_path(rng, monkeypatch, chunk):
    """The accelerator-only depth-3 triples einsum (all C_3 quadratic forms
    as one rx,lx,dx->rld contraction, r-chunked under the ladder memory cap)
    must be value-identical to the prefix-ladder/gather route. Forced on via
    _DEPTH3_EINSUM since the CPU suite would otherwise never trace it."""
    n, d = 48, 6
    X = rng.normal(size=(n, d))
    y = np.sin(X.sum(axis=1, keepdims=True))
    k = OAKKernel.create(num_dims=d, max_interaction_depth=3)
    # tiny lengthscale on dim 0 disables the factor route so every order
    # goes through the ladder (same trick as the nonfactor-routing test)
    ks = list(k.kernels)
    small = ks[0].replace(lengthscale=ks[0].lengthscale.replace(
        raw=jnp.asarray(np.log(np.expm1(0.05)))))
    k = k.replace(kernels=tuple([small] + ks[1:]))
    m = GPR.create(X, y, k, noise_variance=0.1)
    assert not all(sb._usable_factor(kk) for kk in m.kernel.kernels)
    monkeypatch.setattr(sb, "_DEPTH3_EINSUM", True)
    if chunk:
        # cap sized so R=2 rows per einsum chunk (but above the top-of-
        # function D*X*itemsize divert threshold)
        itemsize = np.dtype(m.data[0].dtype).itemsize
        monkeypatch.setattr(sb, "_LADDER_BYTES_CAP", 2 * d * n * n * itemsize)
    # _sobol_values_jit's cache key is (treedef, avals, statics) — the cap
    # and the einsum toggle are read at TRACE time, so a cached executable
    # from the other parametrization (or any earlier same-structure test)
    # would be reused and the branch under test never traced
    sb._sobol_values_jit.clear_cache()
    tuples, vals = sb.compute_sobol_oak(m)
    naive_tuples, naive_vals = _naive_component_sobol(m, 3)
    assert [tuple(t) for t in tuples] == [tuple(t) for t in naive_tuples]
    np.testing.assert_allclose(vals, naive_vals, rtol=1e-6, atol=1e-12)


# --------------------------------------------------------------------------- #
# Factor/Hadamard routing boundary (VERDICT r3 task 8): the per-dim L
# construction and the Sobol factor routing both switch branches at
# l = 0.5 * sqrt(measure var) (sobol.py compute_L_for_kernel / _usable_factor).
# These pin that the magic 0.5 sits inside a wide window where BOTH branches
# are accurate, so the routed L — and any Sobol index built from it — is
# continuous across the switch.
# --------------------------------------------------------------------------- #
def test_routing_boundary_accurate_both_sides_of_switch(rng):
    """Sweep the lengthscale across the 0.5*sqrt(var) switch (non-unit
    measure scale so the threshold is exercised, not just l=0.5): the ROUTED
    L matches Monte-Carlo ground truth on both sides and at the boundary,
    and so does the quadratic form alpha^T L alpha (the Sobol numerator)."""
    delta = 1.3
    measure = GaussianMeasure.create(0.2, delta ** 2)
    x = jnp.asarray(np.linspace(-1.6, 1.6, 7))
    s = jnp.asarray(rng.normal(0.2, delta, 500_000))
    alpha = rng.normal(size=7)
    for ratio in (0.2, 0.35, 0.49, 0.5, 0.51, 0.8, 1.5, 3.0):
        k = OrthogonalRBF.create(measure, lengthscale=ratio * delta,
                                 variance=1.2)
        L = np.asarray(sb.compute_L_for_kernel(k, x))
        Kxs = np.asarray(ortho_rbf.K(k, x, s))
        L_mc = (Kxs @ Kxs.T) / s.shape[0]
        np.testing.assert_allclose(L, L_mc, atol=5e-3,
                                   err_msg=f"ratio {ratio}")
        q, q_mc = alpha @ L @ alpha, alpha @ L_mc @ alpha
        assert abs(q - q_mc) <= 1e-2 * max(1.0, abs(q_mc)), (ratio, q, q_mc)
        # the factor routing flips exactly at the same threshold
        assert sb._usable_factor(k) == (ratio > 0.5), ratio


def test_routing_boundary_branch_overlap_window(rng):
    """The measured branch-disagreement profile that validates the 0.5
    threshold. Quadrature error falls monotonically with l/sqrt(var)
    (measured: 1.9e-1 at 0.2, 1.1e-2 at 0.3, 2.3e-4 at 0.4, 2.3e-6 at 0.5,
    1.2e-8 at 0.6, 1.7e-15 at 0.9 — the closed form is f64-exact throughout
    this range, so the disagreement IS the quadrature error). Pinned:

    - the jump the jnp.where switch can introduce — the disagreement AT the
      boundary — is <1e-5 relative, 100x under the 1e-3 accuracy budget, so
      the routed L is continuous across the switch for any practical
      purpose;
    - thresholds <=0.35 would be INVALID (disagreement there exceeds the
      1e-3 budget), while everything in [0.45, 0.9] is safely under 1e-4:
      the magic 0.5 sits in the interior of the valid window with ~400x
      margin, not on its edge."""
    delta = 1.3
    measure = GaussianMeasure.create(0.2, delta ** 2)
    x = jnp.asarray(np.linspace(-1.6, 1.6, 7))

    def rel_disagreement(ratio):
        k = OrthogonalRBF.create(measure, lengthscale=ratio * delta,
                                 variance=1.2)
        Lc = np.asarray(sb.compute_L_gaussian(
            x, k.lengthscale.value, k.variance.value, delta, 0.2))
        Lq = np.asarray(sb.compute_L_quadrature(k, x))
        return np.abs(Lq - Lc).max() / max(np.abs(Lc).max(), 1e-12)

    # continuity at the switch: the boundary jump is bounded by the
    # larger branch disagreement in its epsilon-neighbourhood
    assert max(rel_disagreement(0.49), rel_disagreement(0.51)) < 1e-5
    # 0.5 is interior to the valid window, not at its edge
    for ratio in np.linspace(0.45, 0.9, 10):
        assert rel_disagreement(ratio) < 1e-4, ratio
    # ...and a much lower threshold would NOT be valid: quadrature alone
    # blows the 1e-3 budget by ratio 0.35 (this is why the hybrid routes
    # to the closed form below the switch)
    assert rel_disagreement(0.35) > 1e-3
    assert rel_disagreement(0.2) > 1e-1


def test_routing_boundary_justifies_each_branch(rng):
    """Why the hybrid exists (one probe per failure mode, documenting that
    NEITHER branch alone covers the sweep above): quadrature under-resolves a
    lengthscale far below the node spacing; the closed form's f1-f2-f3+f4
    cancels catastrophically in f32 at large lengthscale (the regime a flat
    fit reaches)."""
    delta = 1.0
    measure = GaussianMeasure.create(0.0, delta ** 2)
    x = jnp.asarray(np.linspace(-1.0, 1.0, 5))
    s = jnp.asarray(rng.normal(0.0, delta, 400_000))

    # (a) quadrature fails at l << node spacing where the closed form is exact
    k_small = OrthogonalRBF.create(measure, lengthscale=0.02, variance=1.0)
    Kxs = np.asarray(ortho_rbf.K(k_small, x, s))
    L_mc = (Kxs @ Kxs.T) / s.shape[0]
    Lq = np.asarray(sb.compute_L_quadrature(k_small, x))
    Lc = np.asarray(sb.compute_L_gaussian(x, k_small.lengthscale.value,
                                          k_small.variance.value, delta, 0.0))
    assert np.abs(Lc - L_mc).max() <= 5e-3
    assert np.abs(Lq - L_mc).max() > 10 * np.abs(Lc - L_mc).max()

    # (b) the closed form loses ~all significant digits in f32 at large l:
    # the four terms are each ~sigma^4 and nearly cancel
    k_big = OrthogonalRBF.create(measure, lengthscale=40.0, variance=1.0)
    L64 = np.asarray(sb.compute_L_gaussian(x, k_big.lengthscale.value,
                                           k_big.variance.value, delta, 0.0))
    L32 = np.asarray(sb.compute_L_gaussian(
        jnp.asarray(np.asarray(x), jnp.float32),
        jnp.asarray(float(k_big.lengthscale.value), jnp.float32),
        jnp.asarray(1.0, jnp.float32),
        jnp.asarray(1.0, jnp.float32), jnp.asarray(0.0, jnp.float32)))
    Lq_big = np.asarray(sb.compute_L_quadrature(k_big, x))
    # quadrature stays accurate (vs the f64 closed form)...
    assert np.abs(Lq_big - L64).max() <= 1e-6 * np.abs(L64).max()
    # ...while the f32 closed form's relative error is orders worse
    assert np.abs(L32 - L64).max() > 1e-2 * np.abs(L64).max()
