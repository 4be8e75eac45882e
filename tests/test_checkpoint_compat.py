"""Reference-layout checkpoint compatibility: load the positional
``hyperparams`` npz written by the reference's ``save_model``
(/root/reference/oak/model_utils.py:44-64) onto oak_tpu models.

The files here are synthetically written in the reference's layout (GPflow
2.2 enumeration order — see checkpoint.reference_param_order); they pin the
mapping so a genuinely reference-trained artifact can be imported for output
diffing the day a GPflow environment is available."""

import numpy as np
import pytest

from oak_tpu import checkpoint as ckpt
from oak_tpu.kernels import OAKKernel
from oak_tpu.models import GPR, SGPR, SVGP, Bernoulli


def _write_reference_npz(path, values):
    np.savez(path, hyperparams=np.asarray(values, dtype=object))


def _mixed_kernel(d=4, shared=True):
    """binary dim 0, categorical dim 1, Gaussian RBF dim 2, empirical dim 3."""
    loc = np.linspace(-1, 1, 5).reshape(-1, 1)
    w = np.full((5, 1), 0.2)
    return OAKKernel.create(
        num_dims=d, max_interaction_depth=2,
        p0=[0.4, None, None, None],
        p=[None, np.array([0.5, 0.2, 0.3]), None, None],
        empirical_locations=[None, None, None, loc],
        empirical_weights=[None, None, None, w],
        lengthscale_bounds=[1e-3, 1e3],
        share_var_across_orders=shared,
    )


def test_reference_param_order_gpr_shared(rng):
    X = rng.normal(size=(20, 4))
    X[:, 0] = rng.integers(0, 2, 20)
    X[:, 1] = rng.integers(0, 3, 20)
    y = rng.normal(size=(20, 1))
    m = GPR.create(X, y, _mixed_kernel(), noise_variance=0.01)
    slots = ckpt.reference_param_order(m)
    # binary dim: variance pinned (absent); categorical: W, kappa;
    # Gaussian RBF: lengthscale only; empirical RBF: lengthscale + variance
    # (the reference skips pinning for empirical/GMM dims); then the 3 order
    # variances; then the likelihood variance
    assert slots == [
        "kernels[1].W", "kernels[1].kappa",
        "kernels[2].lengthscale",
        "kernels[3].lengthscale", "kernels[3].variance",
        "variances[0]", "variances[1]", "variances[2]",
        "likelihood.variance",
    ]


def test_load_reference_npz_gpr_roundtrip(rng, tmp_path):
    X = rng.normal(size=(20, 4))
    X[:, 0] = rng.integers(0, 2, 20)
    X[:, 1] = rng.integers(0, 3, 20)
    y = rng.normal(size=(20, 1))
    m = GPR.create(X, y, _mixed_kernel(), noise_variance=0.01)

    vals = [
        rng.uniform(0.1, 1.0, size=(3, 2)),      # W (unconstrained)
        rng.uniform(0.5, 2.0, size=(3,)),        # kappa (positive)
        np.float64(0.77),                        # lengthscale dim 2
        np.float64(1.31),                        # lengthscale dim 3
        np.float64(0.42),                        # base variance dim 3
        np.float64(0.9), np.float64(0.8), np.float64(0.7),  # order variances
        np.float64(0.013),                       # likelihood variance
    ]
    path = tmp_path / "ref_gpr.npz"
    _write_reference_npz(path, vals)
    loaded = ckpt.load_reference_npz(m, path)

    np.testing.assert_allclose(np.asarray(loaded.kernel.kernels[1].W.value), vals[0])
    np.testing.assert_allclose(np.asarray(loaded.kernel.kernels[1].kappa.value),
                               vals[1], rtol=1e-12)
    assert float(loaded.kernel.kernels[2].lengthscale.value) == pytest.approx(0.77)
    assert float(loaded.kernel.kernels[3].lengthscale.value) == pytest.approx(1.31)
    assert float(loaded.kernel.kernels[3].variance.value) == pytest.approx(0.42)
    for j, v in enumerate([0.9, 0.8, 0.7]):
        assert float(loaded.kernel.variances[j].value) == pytest.approx(v)
    assert float(loaded.likelihood.variance.value) == pytest.approx(0.013)
    # untouched slots retain their original values
    assert float(loaded.kernel.kernels[0].variance.value) == pytest.approx(
        float(m.kernel.kernels[0].variance.value))


def test_load_reference_npz_svgp_all_params(rng, tmp_path):
    """SVGP checkpoints save ALL parameters including the fixed Z
    (model_utils.py:54-57) and the variational q_mu/q_sqrt."""
    d, M = 3, 6
    Z0 = rng.normal(size=(M, d))
    k = OAKKernel.create(num_dims=d, max_interaction_depth=2,
                         lengthscale_bounds=[1e-3, 1e3])
    m = SVGP.create(k, Bernoulli.create("logit"), Z0, q_diag=True, whiten=True,
                    num_data=50)

    Znew = rng.normal(size=(M, d))
    ls = [np.float64(v) for v in (0.5, 1.5, 2.5)]
    variances = [np.float64(v) for v in (1.1, 0.6, 0.2)]
    q_mu = rng.normal(size=(M, 1))
    q_sqrt = rng.uniform(0.5, 1.5, size=(M, 1))
    vals = [Znew] + ls + variances + [q_mu, q_sqrt]
    path = tmp_path / "ref_svgp.npz"
    _write_reference_npz(path, vals)

    assert ckpt.reference_param_order(m) == [
        "Z",
        "kernels[0].lengthscale", "kernels[1].lengthscale",
        "kernels[2].lengthscale",
        "variances[0]", "variances[1]", "variances[2]",
        "q_mu", "q_sqrt",
    ]
    loaded = ckpt.load_reference_npz(m, path)
    np.testing.assert_allclose(np.asarray(loaded.Z.value), Znew)
    np.testing.assert_allclose(np.asarray(loaded.q_mu.value), q_mu)
    np.testing.assert_allclose(np.asarray(loaded.q_sqrt.value), q_sqrt,
                               rtol=1e-12)
    for i, v in enumerate(ls):
        assert float(loaded.kernel.kernels[i].lengthscale.value) == pytest.approx(float(v))


def test_load_reference_npz_unshared_variance(rng, tmp_path):
    """Duvenaud mode: per-kernel base variances are trainable Parameters and
    only sigma^2_0 exists at the kernel level."""
    X = rng.normal(size=(15, 2))
    y = rng.normal(size=(15, 1))
    k = OAKKernel.create(num_dims=2, max_interaction_depth=2,
                         share_var_across_orders=False)
    m = GPR.create(X, y, k, noise_variance=0.01)
    slots = ckpt.reference_param_order(m)
    assert slots == [
        "kernels[0].lengthscale", "kernels[0].variance",
        "kernels[1].lengthscale", "kernels[1].variance",
        "variances[0]", "likelihood.variance",
    ]
    vals = [np.float64(v) for v in (0.3, 0.7, 1.4, 2.1, 0.55, 0.02)]
    path = tmp_path / "ref_unshared.npz"
    _write_reference_npz(path, vals)
    loaded = ckpt.load_reference_npz(m, path)
    assert float(loaded.kernel.kernels[0].variance.value) == pytest.approx(0.7)
    assert float(loaded.kernel.variances[0].value) == pytest.approx(0.55)
    assert float(loaded.likelihood.variance.value) == pytest.approx(0.02)


def test_load_reference_npz_count_mismatch(rng, tmp_path):
    X = rng.normal(size=(10, 2))
    y = rng.normal(size=(10, 1))
    k = OAKKernel.create(num_dims=2, max_interaction_depth=1)
    m = GPR.create(X, y, k, noise_variance=0.01)
    path = tmp_path / "bad.npz"
    _write_reference_npz(path, [np.float64(1.0)])
    with pytest.raises(ValueError, match="expects"):
        ckpt.load_reference_npz(m, path)


def test_trainable_sgpr_z_slot(rng, tmp_path):
    """SGPR with trainable Z (zfixed=False): Z leads the trainable list."""
    X = rng.normal(size=(12, 2))
    y = rng.normal(size=(12, 1))
    k = OAKKernel.create(num_dims=2, max_interaction_depth=1)
    m = SGPR.create(X, y, k, X[:4].copy(), noise_variance=0.01,
                    trainable_Z=True)
    slots = ckpt.reference_param_order(m)
    assert slots[0] == "Z"
    Znew = rng.normal(size=(4, 2))
    vals = [Znew, np.float64(1.0), np.float64(1.0),
            np.float64(1.0), np.float64(1.0), np.float64(0.01)]
    path = tmp_path / "ref_sgpr.npz"
    _write_reference_npz(path, vals)
    loaded = ckpt.load_reference_npz(m, path)
    np.testing.assert_allclose(np.asarray(loaded.Z.value), Znew)
