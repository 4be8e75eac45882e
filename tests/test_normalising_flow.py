"""Flow tests (reference tests/test_normalising_flow.py pattern): training
reduces KL, transformed data passes a KS normality test, inverse round-trips."""

import jax.numpy as jnp
import numpy as np

from oak_tpu.flows import Normalizer, fit_normalizer, kstest


def test_flow_reduces_kl_and_gaussianizes(rng):
    x = np.exp(rng.normal(size=500))  # log-normal data
    n0 = Normalizer.create(x, log=True)
    kl0 = float(n0.kl_objective(jnp.asarray(x)))
    n1 = fit_normalizer(x, log=True)
    kl1 = float(n1.kl_objective(jnp.asarray(x)))
    assert kl1 < kl0
    s, pvalue = kstest(n1, x)
    assert pvalue > 0.05


def test_flow_inverse_roundtrip(rng):
    x = np.abs(rng.normal(size=200)) + 0.5
    n = fit_normalizer(x, log=True)
    y = n.forward(jnp.asarray(x))
    x_back = np.asarray(n.inverse(y))
    np.testing.assert_allclose(x_back, x, rtol=1e-8)


def test_flow_fldj_matches_autodiff(rng):
    import jax

    x = np.abs(rng.normal(size=50)) + 0.3
    n = Normalizer.create(x, log=True)
    fldj = np.asarray(n.forward_log_det_jacobian(jnp.asarray(x)))
    grad = jax.vmap(jax.grad(lambda v: n.forward(v)))(jnp.asarray(x))
    np.testing.assert_allclose(fldj, np.log(np.abs(np.asarray(grad))), rtol=1e-9)


def test_flow_no_log_branch(rng):
    x = rng.normal(size=300) * 3 + 5
    n = fit_normalizer(x, log=False)
    y = np.asarray(n.forward(jnp.asarray(x)))
    assert abs(y.mean()) < 0.2
    assert abs(y.std() - 1.0) < 0.2
