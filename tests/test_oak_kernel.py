"""Algebraic identities on the OAK combination kernel, mirroring the
reference's tests/test_oak_kernel.py: K == sum of per-component grams,
K_diag == diag(K), PSD-ness, and mixed continuous/binary/categorical dims."""

import jax
import numpy as np
import pytest

from oak_tpu.kernels import OAKKernel, component_index_tuples


def _data(rng, n=12, d=3):
    return rng.normal(size=(n, d))


@pytest.mark.parametrize("depth", [1, 2, 3])
@pytest.mark.parametrize("share_var", [True, False])
def test_K_equals_sum_of_components(depth, share_var, rng):
    X = _data(rng)
    oak = OAKKernel.create(num_dims=3, max_interaction_depth=depth,
                           share_var_across_orders=share_var)
    K = np.asarray(oak.K(X))
    total = np.zeros_like(K)
    for dims in component_index_tuples(3, depth):
        total += np.asarray(oak.component_K(dims, X))
    np.testing.assert_allclose(K, total, rtol=1e-9, atol=1e-11)


def test_K_diag_equals_diag_of_K(rng):
    X = _data(rng)
    oak = OAKKernel.create(num_dims=3, max_interaction_depth=2)
    np.testing.assert_allclose(
        np.asarray(oak.K_diag(X)), np.diag(np.asarray(oak.K(X))), rtol=1e-9
    )


def test_cross_gram_consistency(rng):
    X = _data(rng, n=8)
    X2 = _data(rng, n=5)
    oak = OAKKernel.create(num_dims=3, max_interaction_depth=2)
    K12 = np.asarray(oak.K(X, X2))
    K21 = np.asarray(oak.K(X2, X))
    np.testing.assert_allclose(K12, K21.T, rtol=1e-10)
    assert K12.shape == (8, 5)


def test_psd(rng):
    X = _data(rng, n=20)
    oak = OAKKernel.create(num_dims=3, max_interaction_depth=3)
    K = np.asarray(oak.K(X))
    eigs = np.linalg.eigvalsh(K)
    assert eigs.min() > -1e-8


def test_mixed_feature_types(rng):
    n = 15
    X = np.column_stack([
        rng.normal(size=n),
        rng.integers(0, 2, n).astype(float),
        rng.integers(0, 3, n).astype(float),
    ])
    oak = OAKKernel.create(
        num_dims=3,
        max_interaction_depth=3,
        p0=[None, 0.4, None],
        p=[None, None, np.array([0.3, 0.3, 0.4]).reshape(-1, 1)],
    )
    K = np.asarray(oak.K(X))
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    np.testing.assert_allclose(np.asarray(oak.K_diag(X)), np.diag(K), rtol=1e-9)
    total = np.zeros_like(K)
    for dims in component_index_tuples(3, 3):
        total += np.asarray(oak.component_K(dims, X))
    np.testing.assert_allclose(K, total, rtol=1e-9)


def test_jit_and_grad(rng):
    X = _data(rng)
    oak = OAKKernel.create(num_dims=3, max_interaction_depth=2)

    @jax.jit
    def trace_sum(k, X):
        return k.K(X).sum()

    val = trace_sum(oak, X)
    g = jax.grad(lambda k: trace_sum(k, X))(oak)
    assert np.isfinite(float(val))
    ls_grad = g.kernels[0].lengthscale.raw
    assert np.isfinite(float(ls_grad))


def test_active_dims_validation():
    with pytest.raises(ValueError):
        OAKKernel.create(num_dims=2, active_dims=[[0], [0]])
    with pytest.raises(ValueError):
        OAKKernel.create(num_dims=2, active_dims=[[0], [2]])


def test_unconstrained_variant(rng):
    X = _data(rng)
    oak = OAKKernel.create(num_dims=3, max_interaction_depth=2,
                           constrain_orthogonal=False)
    K = np.asarray(oak.K(X))
    eigs = np.linalg.eigvalsh(K)
    assert eigs.min() > -1e-8


def test_component_tuples_count():
    tuples = component_index_tuples(5, 2)
    assert len(tuples) == 1 + 5 + 10
    assert tuples[0] == []
