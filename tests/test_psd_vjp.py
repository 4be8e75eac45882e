"""GEMM-built custom VJPs for the factorization ops (ops/psd.py).

XLA's Cholesky / triangular-solve reverse passes lower to full-width
triangular solves that cannot ride the TPU MXU (forward+VJP measured
125.8 ms / 71.4 ms at [8192, 8192] vs 85.5 ms / 35.5 ms for the
closed-form custom VJPs — BASELINE.md round-4 factorization roofline).
These tests pin the closed-form cotangents
(Murray 2016) against jax's reference autodiff of the *plain* XLA ops in
f64, including the vmapped (natgrad full-q) and end-to-end (GPR / SVGP /
natgrad training-loss) paths that consume them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oak_tpu.ops.psd import (_TRI_INV_BLOCK_MIN, _tri_inv_blocked,
                             cholesky_lower, chol_of_inv, tri_inv_lower)


def _spd(rng, n, batch=()):
    B = rng.normal(size=batch + (n, n))
    A = B @ np.swapaxes(B, -1, -2) + 2.0 * np.eye(n)
    return jnp.asarray(A)


def _lower(rng, n, batch=()):
    return jnp.asarray(np.linalg.cholesky(np.asarray(_spd(rng, n, batch))))


@pytest.mark.parametrize("n", [64, 300, 512, 520])
def test_blocked_tri_inv_matches_solve(rng, n):
    """The bottom-up blocked inverse (batched leaf solves + MXU GEMM
    combines) equals XLA's monolithic solve-vs-I, including the
    identity-padding path for n not of the form leaf * 2^k."""
    L = _lower(rng, n)
    W_blk = _tri_inv_blocked(L)
    W_ref = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(n, dtype=L.dtype), lower=True)
    np.testing.assert_allclose(np.asarray(W_blk), np.asarray(W_ref),
                               rtol=1e-9, atol=1e-11)
    # and it is exactly lower-triangular (no pad leakage)
    np.testing.assert_allclose(np.asarray(jnp.triu(W_blk, 1)), 0.0)


def test_tri_inv_dispatch_takes_blocked_route_above_crossover(rng):
    """tri_inv_lower's primal and VJP stay correct through the blocked
    route (n above the crossover)."""
    n = _TRI_INV_BLOCK_MIN + 40
    L = _lower(rng, n)
    W = tri_inv_lower(L)
    np.testing.assert_allclose(np.asarray(W @ L), np.eye(n),
                               rtol=1e-8, atol=1e-8)
    Wt = jnp.asarray(rng.normal(size=(n, n)))

    def ref_tri_inv(L):
        return jax.scipy.linalg.solve_triangular(
            L, jnp.eye(L.shape[-1], dtype=L.dtype), lower=True)

    g_c = jax.grad(lambda L: jnp.sum(Wt * tri_inv_lower(L)))(L)
    g_x = jax.grad(lambda L: jnp.sum(Wt * ref_tri_inv(L)))(L)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_x),
                               rtol=1e-7, atol=1e-7)


@pytest.mark.parametrize("n", [300, 700, 1100])
def test_blocked_cholesky_matches_xla(rng, n):
    """The right-looking blocked forward (panel chols + HIGH-precision
    trailing GEMMs) equals jnp.linalg.cholesky in f64, including the
    ragged-final-panel path (n not a multiple of the panel width), and is
    exactly lower-triangular."""
    from oak_tpu.ops.psd import _cholesky_blocked

    A = _spd(rng, n)
    L_blk = _cholesky_blocked(A)
    L_ref = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L_blk), np.asarray(L_ref),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(jnp.triu(L_blk, 1)), 0.0)


def test_cholesky_dispatch_takes_blocked_route_above_crossover(rng, monkeypatch):
    """cholesky_lower's primal and VJP stay correct with the blocked
    forward engaged (n above the crossover). The crossover is lowered so
    the test runs at a CPU-friendly size — the dispatch reads the module
    constant per call, so this exercises the same route the TPU takes at
    [4096+, 4096+]."""
    from oak_tpu.ops import psd

    monkeypatch.setattr(psd, "_CHOL_BLOCK_MIN", 512)
    n = 552
    A = _spd(rng, n)
    L = cholesky_lower(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(jnp.linalg.cholesky(A)),
                               rtol=1e-9, atol=1e-9)
    Lt = jnp.asarray(rng.normal(size=(n, n)))
    g_c = jax.grad(lambda a: jnp.sum(Lt * cholesky_lower(a)))(A)
    g_x = jax.grad(lambda a: jnp.sum(Lt * jnp.linalg.cholesky(a)))(A)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_x),
                               rtol=1e-6, atol=1e-6)


def test_cholesky_vjp_matches_xla(rng):
    A = _spd(rng, 7)
    # a generic (non-symmetric-aware) downstream consumer, including weights
    # on entries XLA's cholesky zeroes out structurally
    W = jnp.asarray(rng.normal(size=(7, 7)))

    def loss_custom(A):
        return jnp.sum(W * cholesky_lower(A)) + jnp.sum(cholesky_lower(A) ** 3)

    def loss_xla(A):
        return jnp.sum(W * jnp.linalg.cholesky(A)) + jnp.sum(
            jnp.linalg.cholesky(A) ** 3)

    g_c = jax.grad(loss_custom)(A)
    g_x = jax.grad(loss_xla)(A)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_x),
                               rtol=1e-10, atol=1e-10)


def test_cholesky_vjp_vmapped(rng):
    A = _spd(rng, 5, batch=(4,))

    def loss(chol_fn, A):
        return jnp.sum(jax.vmap(chol_fn)(A) ** 2) + jnp.sum(
            jnp.log(jnp.diagonal(jax.vmap(chol_fn)(A), axis1=-2, axis2=-1)))

    g_c = jax.grad(lambda A: loss(cholesky_lower, A))(A)
    g_x = jax.grad(lambda A: loss(jnp.linalg.cholesky, A))(A)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_x),
                               rtol=1e-10, atol=1e-10)


def test_tri_inv_vjp_matches_xla(rng):
    L = _lower(rng, 7)
    W = jnp.asarray(rng.normal(size=(7, 7)))

    def ref_tri_inv(L):
        return jax.scipy.linalg.solve_triangular(
            L, jnp.eye(L.shape[-1], dtype=L.dtype), lower=True)

    g_c = jax.grad(lambda L: jnp.sum(W * tri_inv_lower(L)))(L)
    g_x = jax.grad(lambda L: jnp.sum(W * ref_tri_inv(L)))(L)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_x),
                               rtol=1e-10, atol=1e-10)


def test_tri_inv_vjp_upper_cotangent_annihilated(rng):
    """Cotangent weight on the structurally-zero upper triangle must not
    leak into the input gradient (the primal there is frozen at zero)."""
    L = _lower(rng, 6)
    W_upper = jnp.triu(jnp.ones((6, 6)), 1)
    g = jax.grad(lambda L: jnp.sum(W_upper * tri_inv_lower(L)))(L)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)

    g_chol = jax.grad(
        lambda A: jnp.sum(W_upper * cholesky_lower(A)))(_spd(rng, 6))
    np.testing.assert_allclose(np.asarray(g_chol), 0.0, atol=1e-12)


def test_chol_of_inv_grad_matches_direct(rng):
    """chol_of_inv rides both custom VJPs; its gradient must match the
    direct inv->cholesky composition."""
    P = _spd(rng, 6)

    def loss_fast(P):
        return jnp.sum(chol_of_inv(P) ** 2)

    def loss_direct(P):
        return jnp.sum(jnp.linalg.cholesky(jnp.linalg.inv(P)) ** 2)

    # T and chol(P^-1) differ by column signs at most; squared loss is
    # invariant, so gradients must agree.
    g_f = jax.grad(loss_fast)(P)
    g_d = jax.grad(loss_direct)(P)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_d),
                               rtol=1e-8, atol=1e-9)


def test_gpr_training_grad_unchanged_by_custom_vjp(rng):
    """End to end: the GPR training loss gradient through psd.cholesky
    (custom VJP) matches a plain-XLA reimplementation of the same loss."""
    from oak_tpu.kernels import OAKKernel
    from oak_tpu.models import GPR
    from oak_tpu.params import flatten_trainable

    X = rng.normal(size=(20, 2))
    y = np.sin(X[:, :1]) + 0.1 * rng.normal(size=(20, 1))
    m = GPR.create(X, y, OAKKernel.create(num_dims=2,
                                          max_interaction_depth=2),
                   noise_variance=0.1)
    vec, unflatten = flatten_trainable(m)

    def loss(v):
        return unflatten(v).training_loss()

    g = jax.grad(loss)(vec)

    eps = 1e-6
    for i in range(min(5, vec.shape[0])):
        e = jnp.zeros_like(vec).at[i].set(eps)
        fd = (loss(vec + e) - loss(vec - e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[i]), np.asarray(fd),
                                   rtol=2e-4, atol=1e-6)


def test_natgrad_full_q_step_exact_through_custom_vjps(rng):
    """The natgrad full-q path rides every custom VJP at once (vmapped
    cholesky_lower in _with_eta's rebuild, tri_inv_lower + chol_of_inv in
    the step algebra): the Salimbeni gamma=1 conjugate identity must still
    land the ELBO exactly on the collapsed SGPR bound."""
    from oak_tpu.kernels import OAKKernel
    from oak_tpu.models import SGPR, SVGP, Gaussian
    from oak_tpu.optim.natgrad import _natgrad_update

    X = rng.normal(size=(40, 2))
    y = np.sin(X[:, :1]) + 0.5 * X[:, 1:2] + 0.05 * rng.normal(size=(40, 1))
    k = OAKKernel.create(num_dims=2, max_interaction_depth=2)
    Z = X[:10].copy()
    svgp = SVGP.create(k, Gaussian.create(0.01), Z, q_diag=False,
                       whiten=True, num_data=X.shape[0])
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)

    stepped = _natgrad_update(svgp, lambda m, *a: -m.elbo(Xj, Yj), 1.0, ())
    sgpr = SGPR.create(X, y, k, Z, noise_variance=0.01)
    np.testing.assert_allclose(float(stepped.elbo(Xj, Yj)),
                               float(sgpr.elbo()), rtol=1e-8)


def test_refined_solves_match_direct_f64(rng):
    """At f64 the Newton-refined solves/inverse equal the direct ops (the
    correction is ~machine-epsilon); the refinement exists for TPU bf16
    internals (ops/psd.py mixed-precision refinement note)."""
    from oak_tpu.ops.psd import (solve_lower_refined, solve_upper_refined,
                                 tri_inv_lower_refined)

    n = 300
    L = _lower(rng, n)
    B = jnp.asarray(rng.normal(size=(n, 5)))
    np.testing.assert_allclose(
        np.asarray(solve_lower_refined(L, B)),
        np.asarray(jax.scipy.linalg.solve_triangular(L, B, lower=True)),
        rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(solve_upper_refined(L, B)),
        np.asarray(jax.scipy.linalg.solve_triangular(L.T, B, lower=False)),
        rtol=1e-10, atol=1e-12)
    W = tri_inv_lower_refined(L)
    np.testing.assert_allclose(np.asarray(W @ L), np.eye(n),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(jnp.triu(W, 1)), 0.0)


def test_refine_cholesky_contracts_factor_error(rng):
    """One Newton step against the HIGHEST-precision residual repairs a
    perturbed factor: ||K - L'L'^T|| drops by orders of magnitude (this is
    the mechanism that recovers f32-grade factors from TPU-bf16-internal
    Cholesky; measured 0.24 -> 0.008 prediction error on the pumadyn fit)."""
    from oak_tpu.ops.psd import refine_cholesky

    n = 200
    A = _spd(rng, n)
    L = jnp.linalg.cholesky(A)
    noise = 1e-4 * jnp.tril(jnp.asarray(rng.normal(size=(n, n))))
    L_noisy = L + noise
    err_before = float(jnp.abs(A - L_noisy @ L_noisy.T).max())
    L_ref = refine_cholesky(A, L_noisy)
    err_after = float(jnp.abs(A - L_ref @ L_ref.T).max())
    assert err_after < err_before * 1e-3, (err_before, err_after)
    np.testing.assert_allclose(np.asarray(jnp.triu(L_ref, 1)), 0.0)
