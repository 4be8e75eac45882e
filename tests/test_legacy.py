"""Duvenaud-style legacy path + KernelComponent list representation."""

import numpy as np
import jax.numpy as jnp

from oak_tpu.kernels import OAKKernel
from oak_tpu.kernels.oak_kernel import KernelComponenent, get_list_representation
from oak_tpu.legacy import (
    ConstantKernel,
    ProductKernel,
    compute_sobol,
    extract_active_dims,
    grammer_to_kernel,
    model_to_kernel_list,
)
from oak_tpu.measures import GaussianMeasure


def test_get_list_representation_matches_oak(rng):
    X = rng.normal(size=(10, 3))
    oak = OAKKernel.create(num_dims=3, max_interaction_depth=2)
    selected, comps = get_list_representation(oak, 3)
    assert selected[0] == []
    assert len(comps) == 1 + 3 + 3
    total = np.zeros((10, 10))
    for c in comps:
        total += np.asarray(c.K(X))
    np.testing.assert_allclose(total, np.asarray(oak.K(jnp.asarray(X))), rtol=1e-9)
    # typo alias preserved
    assert KernelComponenent is type(comps[0])


def test_grammer_to_kernel_structure():
    ks = grammer_to_kernel([[0], [1], [0, 1]], measure=GaussianMeasure.create(0.0, 1.0))
    assert len(ks) == 4
    assert isinstance(ks[-1], ConstantKernel)
    assert isinstance(ks[2], ProductKernel)
    assert extract_active_dims(ks) == [[0], [1], [0, 1]]
    # non-leading factors have unit fixed variance (reference utils.py:101-103)
    assert not ks[2].kernels[1].variance.trainable
    reordered = model_to_kernel_list(ks, [[0, 1], [0], [1]])
    assert extract_active_dims(reordered) == [[0, 1], [0], [1]]
    assert isinstance(reordered[-1], ConstantKernel)


def test_legacy_product_kernel_gram_psd(rng):
    X = rng.normal(size=(15, 2))
    ks = grammer_to_kernel([[0], [0, 1]], measure=GaussianMeasure.create(0.0, 1.0))
    K = np.asarray(ks[1].K(X))
    assert np.linalg.eigvalsh(K + K.T).min() / 2 > -1e-8
    np.testing.assert_allclose(np.asarray(ks[1].K_diag(X)), np.diag(K), rtol=1e-9)


def test_legacy_compute_sobol_matches_mc(rng):
    """alpha^T L alpha == E_s[(sum_i alpha_i k(x_i, s))^2] by MC."""
    X = rng.normal(size=(12, 1))
    ks = grammer_to_kernel([[0]], measure=GaussianMeasure.create(0.0, 1.0), seed=3)
    alpha = rng.normal(size=12)
    (val,) = compute_sobol(X, ks, alpha)
    from oak_tpu.kernels.oak_kernel import kernel_K

    s = rng.normal(0.0, 1.0, 200_000)
    f = np.asarray(kernel_K(ks[0].kernels[0], jnp.asarray(s), jnp.asarray(X[:, 0]))) @ alpha
    np.testing.assert_allclose(val, np.mean(f ** 2), rtol=0.05)


def test_legacy_compute_sobol_measure_override(rng):
    """ADVICE r1: delta/mu passed to the legacy compute_sobol define the
    Sobol measure (reference utils.py:478 threads them into compute_L) —
    they are honored even when they differ from the kernels' own
    orthogonality-constraint measure."""
    X = rng.normal(size=(12, 1))
    # kernels constrained under N(0, 10) — the reference's grammer_to_kernel
    # default — but Sobol requested under N(0, 1)
    ks = grammer_to_kernel([[0]], measure=GaussianMeasure.create(0.0, 10.0),
                           seed=3)
    alpha = rng.normal(size=12)
    (val,) = compute_sobol(X, ks, alpha, delta=1.0, mu=0.0)
    from oak_tpu.kernels.oak_kernel import kernel_K

    s = rng.normal(0.0, 1.0, 200_000)
    f = np.asarray(kernel_K(ks[0].kernels[0], jnp.asarray(s),
                            jnp.asarray(X[:, 0]))) @ alpha
    np.testing.assert_allclose(val, np.mean(f ** 2), rtol=0.05)
    # and the default (no override) integrates under the kernel's own measure
    (val_own,) = compute_sobol(X, ks, alpha)
    s10 = rng.normal(0.0, np.sqrt(10.0), 200_000)
    f10 = np.asarray(kernel_K(ks[0].kernels[0], jnp.asarray(s10),
                              jnp.asarray(X[:, 0]))) @ alpha
    np.testing.assert_allclose(val_own, np.mean(f10 ** 2), rtol=0.05)
