"""Diagnostics + safe_cholesky jitter-escalation tests (SURVEY §5 NaN-guard
obligations)."""

import jax.numpy as jnp
import numpy as np
import pytest

from oak_tpu.ops.psd import safe_cholesky
from oak_tpu.utils import Timer, assert_finite, cholesky_health


def test_assert_finite_passes_and_fails():
    assert_finite({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.array([1.0, jnp.nan])}, "bad")


def test_safe_cholesky_escalates_jitter(rng):
    # rank-deficient PSD matrix: plain Cholesky fails, escalation succeeds
    A = rng.normal(size=(10, 3))
    K = jnp.asarray(A @ A.T)
    L, j = safe_cholesky(K, jitter=1e-12, max_tries=8)
    assert np.isfinite(np.asarray(L)).all()
    recon = np.asarray(L @ L.T)
    np.testing.assert_allclose(recon, np.asarray(K), atol=float(j) * 20 + 1e-8)


def test_chol_of_inv_matches_direct_route(rng):
    """chol_of_inv(P) must be a lower-triangular square root of P^-1 — the
    reversal identity replaces chol -> cho_solve -> chol (three serial [M, M]
    ops) with one Cholesky + one triangular solve (natgrad critical path)."""
    from oak_tpu.ops.psd import chol_of_inv

    A = rng.normal(size=(24, 24))
    P = jnp.asarray(A @ A.T + 24 * np.eye(24))
    T = np.asarray(chol_of_inv(P))
    assert np.allclose(T, np.tril(T)), "not lower-triangular"
    assert (np.diag(T) > 0).all()
    np.testing.assert_allclose(T @ T.T, np.linalg.inv(np.asarray(P)),
                               rtol=1e-8, atol=1e-10)
    # jitter lands on P, not on the inverse
    Tj = np.asarray(chol_of_inv(P, 0.5))
    np.testing.assert_allclose(
        Tj @ Tj.T, np.linalg.inv(np.asarray(P) + 0.5 * np.eye(24)),
        rtol=1e-8, atol=1e-10)


def test_cholesky_health_report(rng):
    A = rng.normal(size=(6, 6))
    K = A @ A.T + 6 * np.eye(6)
    h = cholesky_health(jnp.asarray(K))
    assert h["finite"] and h["eig_min"] > 0 and h["n"] == 6


def test_timer_records():
    t = Timer()
    with t("phase"):
        jnp.ones(10).sum()
    assert t.results["phase"] >= 0.0


def test_checked_raises_on_nan():
    """checkify gate: NaN produced inside a jitted function raises on host."""
    import jax
    import jax.numpy as jnp

    from oak_tpu.utils.diagnostics import checked

    f = checked(jax.jit(lambda x: jnp.log(x)))
    assert float(f(jnp.asarray(1.0))) == 0.0
    with pytest.raises(Exception, match="nan"):
        f(jnp.asarray(-1.0))


def test_kernel_shape_gates(rng):
    """OAKKernel.K/K_diag reject malformed inputs at trace time with a clear
    message (the reference's tf.debugging.assert_shapes equivalent)."""
    import jax.numpy as jnp

    from oak_tpu.kernels import OAKKernel

    k = OAKKernel.create(num_dims=3, max_interaction_depth=2)
    X1 = jnp.asarray(rng.normal(size=(10,)))
    with pytest.raises(ValueError, match="2-D"):
        k.K(X1)
    Xnarrow = jnp.asarray(rng.normal(size=(10, 2)))
    with pytest.raises(ValueError, match="columns"):
        k.K_diag(Xnarrow)
