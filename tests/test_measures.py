import numpy as np
import pytest

from oak_tpu.measures import (
    EmpiricalMeasure,
    GaussianMeasure,
    MOGMeasure,
    UniformMeasure,
)


def test_empirical_default_weights_uniform():
    m = EmpiricalMeasure.create(np.arange(5.0).reshape(-1, 1))
    np.testing.assert_allclose(np.asarray(m.weights), np.full((5, 1), 0.2))


def test_empirical_weights_must_normalize():
    with pytest.raises(ValueError):
        EmpiricalMeasure.create(np.arange(3.0), weights=np.array([0.5, 0.2, 0.2]))


def test_mog_weights_must_normalize():
    with pytest.raises(ValueError):
        MOGMeasure.create(np.zeros(2), np.ones(2), np.array([0.9, 0.2]))


def test_mog_shape_mismatch():
    with pytest.raises(ValueError):
        MOGMeasure.create(np.zeros(3), np.ones(2), np.array([0.5, 0.5]))


def test_measures_are_pytrees():
    import jax

    m = GaussianMeasure.create(0.0, 1.0)
    leaves = jax.tree_util.tree_leaves(m)
    assert len(leaves) == 2
    u = UniformMeasure.create(-1.0, 2.0)
    assert len(jax.tree_util.tree_leaves(u)) == 2


def test_gamma_prior_finite_at_tiny_values():
    """Gamma(1, .) must not produce 0*log(0)=NaN as variances shrink to 0
    (the reference's sparsity prior regime)."""
    import jax.numpy as jnp

    from oak_tpu.params import Gamma

    g = Gamma(1.0, 0.2)
    vals = g.log_prob(jnp.asarray([1e-30, 0.0, 1.0]))
    import numpy as np

    assert np.isfinite(np.asarray(vals)).all()
    g2 = Gamma(2.0, 0.5)
    assert np.isfinite(float(g2.log_prob(jnp.asarray(1.0))))
