"""Fused Pallas OAK-gram kernel vs the XLA reference and the per-dim kernel
path — run in interpreter mode so it works on the CPU test backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from oak_tpu.kernels import OAKKernel
from oak_tpu.ops import oak_gram_pallas as ogp


def _setup(rng, D=5, N=300, M=130, depth=3):
    X = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    X2 = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    oak = OAKKernel.create(num_dims=D, max_interaction_depth=depth,
                           dtype=jnp.float32)
    return oak, X, X2


def test_supports_detection(rng):
    oak, _, _ = _setup(rng)
    assert ogp.supports_pallas(oak)
    # mixed binary + continuous: supported via the extra-grams input
    oak_bin = OAKKernel.create(num_dims=2, max_interaction_depth=1,
                               p0=[0.5, None], dtype=jnp.float32)
    assert ogp.supports_pallas(oak_bin)
    # all-discrete: no RBF block to fuse -> per-dim XLA path
    oak_all_bin = OAKKernel.create(num_dims=2, max_interaction_depth=1,
                                   p0=[0.5, 0.3], dtype=jnp.float32)
    assert not ogp.supports_pallas(oak_all_bin)


def _mixed_setup(rng, N=150, M=90, depth=3):
    """binary dim 0, categorical dim 1 (3 cats), Gaussian RBF dim 2,
    empirical-measure RBF dim 3, MOG RBF dim 4."""
    import numpy as np

    from oak_tpu.measures import MOGMeasure

    D = 5
    X = rng.normal(size=(N, D)).astype(np.float32)
    X2 = rng.normal(size=(M, D)).astype(np.float32)
    X[:, 0] = rng.integers(0, 2, N)
    X2[:, 0] = rng.integers(0, 2, M)
    X[:, 1] = rng.integers(0, 3, N)
    X2[:, 1] = rng.integers(0, 3, M)
    loc = np.linspace(-2, 2, 9).reshape(-1, 1)
    w = np.full((9, 1), 1 / 9.0)
    mog = MOGMeasure.create(np.array([-0.5, 0.5]), np.array([0.7, 1.3]),
                            np.array([0.4, 0.6]))
    oak = OAKKernel.create(
        num_dims=D, max_interaction_depth=depth,
        p0=[0.4, None, None, None, None],
        p=[None, np.array([0.3, 0.3, 0.4]), None, None, None],
        empirical_locations=[None, None, None, loc, None],
        empirical_weights=[None, None, None, w, None],
        gmm_measures=[None, None, None, None, mog],
        dtype=jnp.float32)
    return oak, jnp.asarray(X), jnp.asarray(X2)


def test_mixed_prep_matches_kernel_path(rng):
    """Generalized prescaling (all measures + discrete extras) must agree
    with the per-dim kernel evaluation."""
    oak, X, X2 = _mixed_setup(rng)
    from oak_tpu.ops.newton_girard import newton_girard

    K_ref = oak._combine(newton_girard(oak.dim_grams(X, X2),
                                       oak.max_interaction_depth))
    K_prep = ogp.oak_gram_xla(oak, X, X2)
    np.testing.assert_allclose(np.asarray(K_prep), np.asarray(K_ref),
                               rtol=2e-5, atol=2e-6)
    assert ogp.supports_pallas(oak)


def test_mixed_pallas_interpret_matches_xla(rng):
    oak, X, X2 = _mixed_setup(rng)
    with _pallas_forward():
        Kp = ogp.oak_gram(oak, X, X2)
    Kx = ogp.oak_gram_xla(oak, X, X2)
    np.testing.assert_allclose(np.asarray(Kp), np.asarray(Kx),
                               rtol=1e-6, atol=1e-7)


def test_mixed_pallas_gradients_match_xla(rng):
    """Gradients through the fused mixed path — including through the
    binary/categorical extra grams back to their table parameters."""
    oak, X, X2 = _mixed_setup(rng, N=64, M=40, depth=2)

    def loss_p(o):
        return ogp.oak_gram(o, X, X2).sum()

    def loss_x(o):
        return ogp.oak_gram_xla(o, X, X2).sum()

    with _pallas_forward():
        gp = jax.grad(loss_p)(oak)
    gx = jax.grad(loss_x)(oak)
    leaves_p = jax.tree_util.tree_leaves(gp)
    leaves_x = jax.tree_util.tree_leaves(gx)
    assert any(np.any(np.asarray(l) != 0) for l in leaves_p)
    for a, b in zip(leaves_p, leaves_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_xla_prep_path_matches_kernel_path(rng):
    """The prescaled-inputs XLA reference must agree with the straightforward
    per-dim kernel evaluation (f64-free, f32 tolerance)."""
    oak, X, X2 = _setup(rng)
    from oak_tpu.ops.newton_girard import newton_girard

    K_ref = oak._combine(newton_girard(oak.dim_grams(X, X2),
                                       oak.max_interaction_depth))
    K_prep = ogp.oak_gram_xla(oak, X, X2)
    np.testing.assert_allclose(np.asarray(K_prep), np.asarray(K_ref),
                               rtol=2e-5, atol=2e-6)


def _pallas_forward():
    """Context forcing the handwritten Pallas forward (the default FORWARD
    is the XLA-generated one; these tests target the kernel itself)."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        old = ogp.FORWARD
        ogp.FORWARD = "pallas"
        try:
            with pltpu.force_tpu_interpret_mode():
                yield
        finally:
            ogp.FORWARD = old

    return ctx()


def test_pallas_interpret_matches_xla(rng):
    oak, X, X2 = _setup(rng)
    with _pallas_forward():
        Kp = ogp.oak_gram(oak, X, X2)
    Kx = ogp.oak_gram_xla(oak, X, X2)
    np.testing.assert_allclose(np.asarray(Kp), np.asarray(Kx),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("backward", ["pallas", "xla"])
def test_pallas_gradients_match_xla(rng, backward):
    oak, X, X2 = _setup(rng, N=64, M=40)

    def loss_p(o):
        return ogp.oak_gram(o, X, X2).sum()

    def loss_x(o):
        return ogp.oak_gram_xla(o, X, X2).sum()

    old = ogp.BACKWARD
    ogp.BACKWARD = backward
    try:
        with _pallas_forward():
            gp = jax.grad(loss_p)(oak)
    finally:
        ogp.BACKWARD = old
    gx = jax.grad(loss_x)(oak)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_pallas_backward_weighted_cotangent(rng):
    """Non-trivial cotangent (not all-ones) through the fused backward."""
    oak, X, X2 = _setup(rng, N=72, M=48, depth=4)
    W = jnp.asarray(rng.normal(size=(72, 48)).astype(np.float32))

    def loss_p(o):
        return (ogp.oak_gram(o, X, X2) * W).sum()

    def loss_x(o):
        return (ogp.oak_gram_xla(o, X, X2) * W).sum()

    with _pallas_forward():
        gp = jax.grad(loss_p)(oak)
    gx = jax.grad(loss_x)(oak)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("residual", ["bf16", "f32"])
def test_residual_backward_matches_recompute(rng, residual):
    """RESIDUAL='bf16'/'f32' store the per-dim gram stack and run the
    algebraic no-exp backward; gradients must match the recompute backward
    (exactly for f32 residuals, to bf16 quantization otherwise)."""
    oak, X, X2 = _setup(rng, N=64, M=40)
    W = jnp.asarray(rng.normal(size=(64, 40)).astype(np.float32))

    def loss(o):
        return (ogp.oak_gram(o, X, X2) * W).sum()

    g_ref = jax.grad(loss)(oak)
    old = ogp.RESIDUAL
    ogp.RESIDUAL = residual
    try:
        g_res = jax.grad(loss)(oak)
    finally:
        ogp.RESIDUAL = old
    # f32 residuals: exact same values, but the algebraic backward uses the
    # elementary-symmetric DOWNDATE recursion (h_k = e_k - g h_{k-1}) — a
    # different summation order than jax.vjp's generated backward, so f32
    # round-off differs (same tolerance as the Pallas backward tests above);
    # bf16 residuals add the gram-quantization error on top.
    tol = dict(rtol=5e-4, atol=1e-5) if residual == "f32" else \
        dict(rtol=3e-2, atol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(g_res),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)


def test_residual_backward_mixed_types(rng):
    """The stored-gram backward covers binary/categorical extra dims too
    (their cotangent is gbar * W straight from the stored stack)."""
    oak, X, X2 = _mixed_setup(rng, N=64, M=40, depth=2)

    def loss(o):
        return ogp.oak_gram(o, X, X2).sum()

    g_ref = jax.grad(loss)(oak)
    old = ogp.RESIDUAL
    ogp.RESIDUAL = "f32"
    try:
        g_res = jax.grad(loss)(oak)
    finally:
        ogp.RESIDUAL = old
    leaves = list(zip(jax.tree_util.tree_leaves(g_res),
                      jax.tree_util.tree_leaves(g_ref)))
    assert any(np.any(np.asarray(a) != 0) for a, _ in leaves)
    for a, b in leaves:
        b = np.asarray(b)
        # f32 summation-order noise scales with the leaf's magnitude, not
        # element-wise (small components of an O(1) gradient leaf carry the
        # full accumulation round-off)
        atol = 5e-4 * max(float(np.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), b, rtol=5e-4, atol=atol)


def test_residual_forward_value_unchanged(rng):
    """The residual policy is a backward-only change: forward values are
    bit-identical across policies."""
    oak, X, X2 = _setup(rng, N=48, M=32)
    old = ogp.RESIDUAL
    try:
        ogp.RESIDUAL = "recompute"
        k0 = np.asarray(ogp.oak_gram(oak, X, X2))
        for pol in ("bf16", "f32"):
            ogp.RESIDUAL = pol
            np.testing.assert_array_equal(
                np.asarray(ogp.oak_gram(oak, X, X2)), k0)
    finally:
        ogp.RESIDUAL = old


def test_default_forward_custom_vjp_matches_autodiff(rng):
    """The default path (XLA forward under the recompute custom VJP) must
    produce the same values and gradients as plain autodiff of the XLA
    reference — the vjp wiring is a residual-policy change only."""
    assert ogp.FORWARD == "xla"
    oak, X, X2 = _setup(rng, N=64, M=40)
    K1 = ogp.oak_gram(oak, X, X2)
    K2 = ogp.oak_gram_xla(oak, X, X2)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), rtol=1e-7)
    g1 = jax.grad(lambda o: ogp.oak_gram(o, X, X2).sum())(oak)
    g2 = jax.grad(lambda o: ogp.oak_gram_xla(o, X, X2).sum())(oak)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_underflowed_variance_gradient_finite(rng):
    """A sparsity-pruned per-dim variance whose f32 softplus underflows to
    exactly 0 must give a FINITE (zero) gradient, not NaN: the folded
    logb = log(variance) prescale is floored at the smallest f32 normal
    (oak_gram_pallas._prep), otherwise the backward's 1/variance chain
    factor times the zero logb-cotangent is 0 * inf = NaN and poisons the
    whole gradient vector."""
    oak = OAKKernel.create(num_dims=3, max_interaction_depth=2,
                           dtype=jnp.float32)
    # crush dim 1's base variance: softplus(-200) == 0.0 in f32
    k1 = oak.kernels[1]
    dead = k1.variance.replace(
        raw=jnp.full_like(k1.variance.raw, -200.0))
    kernels = list(oak.kernels)
    kernels[1] = k1.replace(variance=dead)
    oak = oak.replace(kernels=tuple(kernels))
    assert float(oak.kernels[1].variance.value) == 0.0

    X = jnp.asarray(rng.normal(size=(24, 3)).astype(np.float32))

    def f(k):
        return jnp.sum(ogp.oak_gram(k, X, X))

    val = f(oak)
    g = jax.grad(f)(oak)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # the dead dim's variance gradient is exactly zero (its softplus slope
    # already underflowed), and live dims still get nonzero gradients
    assert float(jnp.sum(jnp.abs(g.kernels[1].variance.raw))) == 0.0
    assert float(jnp.sum(jnp.abs(g.kernels[0].lengthscale.raw))) > 0.0
