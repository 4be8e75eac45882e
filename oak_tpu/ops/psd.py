"""PSD linear-algebra helpers: jittered Cholesky and solves.

The reference relies on GPflow's default jitter (1e-6, used at
/root/reference/oak/utils.py:185) and simply lets Cholesky failures raise
(caught ad hoc at uci_classification_train.py:146-159). TPU-native policy:

- add dtype-appropriate jitter up front;
- on f32 hardware, matmuls accumulate in f32 via preferred_element_type;
- ``safe_cholesky`` optionally escalates jitter deterministically (x10, up to
  ``max_tries``) using ``lax.while_loop`` — no data-dependent Python control
  flow, so it stays jittable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..config import default_jitter


def add_jitter(K: jnp.ndarray, jitter: float | None = None) -> jnp.ndarray:
    """Default jitter is *relative* to the mean diagonal (floored at the
    absolute value): an OAK Kuu degenerates towards a rank-1 all-ones-like
    matrix as lengthscales grow, and an absolute 1e-5 is then far below the
    f32 noise floor of Cholesky. Explicit ``jitter`` stays absolute."""
    if jitter is None:
        base = default_jitter(K.dtype)
        diag_scale = jnp.maximum(
            jnp.mean(jnp.diagonal(K, axis1=-2, axis2=-1)), 1.0
        )
        return K + (base * diag_scale) * jnp.eye(K.shape[-1], dtype=K.dtype)
    return K + jitter * jnp.eye(K.shape[-1], dtype=K.dtype)


def cholesky(K: jnp.ndarray, jitter: float | None = None) -> jnp.ndarray:
    return jnp.linalg.cholesky(add_jitter(K, jitter))


@partial(jax.jit, static_argnames=("max_tries",))
def safe_cholesky(K: jnp.ndarray, jitter: float | None = None, max_tries: int = 5):
    """Cholesky with deterministic jitter escalation.

    Returns (L, final_jitter). If even the largest jitter fails, L contains
    NaNs (caller can checkify). Escalation is a while_loop on the NaN flag, so
    this compiles to a single XLA computation.
    """
    base = default_jitter(K.dtype) if jitter is None else jitter
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)

    def body(state):
        i, _, _ = state
        j = base * (10.0 ** i)
        L = jnp.linalg.cholesky(K + j * eye)
        return i + 1.0, L, j

    def cond(state):
        i, L, _ = state
        return jnp.logical_and(jnp.any(jnp.isnan(L)), i < max_tries)

    _, L0, j0 = body((jnp.zeros((), K.dtype), K, jnp.zeros((), K.dtype)))
    _, L, j = lax.while_loop(cond, body, (jnp.ones((), K.dtype), L0, j0))
    return L, j


def solve_lower(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return jax.scipy.linalg.solve_triangular(L, B, lower=True)


def tri_inv_lower(L: jnp.ndarray) -> jnp.ndarray:
    """Explicit inverse of a lower-triangular factor (one [M, M] solve
    against I).

    TPU rationale: a triangular solve back-substitutes serially over
    blocked panels and cannot ride the MXU, so for a WIDE right-hand side
    `tri_inv_lower(L) @ B` beats `solve_lower(L, B)` ~2x through
    forward+backward (measured at M=512, N=8192: 0.291 -> 0.131 ms,
    BASELINE.md round-5 probe) — the one fixed-cost [M, M] solve amortizes
    and the per-column work becomes a GEMM. Accuracy loss vs the direct
    solve is O(cond(L) * eps) and is covered by the f32<->f64 parity gates.
    Use for M x M inducing-point factors with many-column RHS; keep direct
    solves for narrow RHS and for N x N data-sized factors (GPR)."""
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return jax.scipy.linalg.solve_triangular(L, eye, lower=True)


def chol_of_inv(P: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Lower-triangular T with T @ T.T = (P + jitter*I)^-1, in ONE Cholesky +
    ONE triangular solve via the reversal identity: with J the exchange
    (flip) matrix and Lr = chol(J P J),

        P^-1 = J (Lr Lr^T)^-1 J = (J Lr^-T J)(J Lr^-1 J) = T T^T,

    and J U J of an upper-triangular U is lower-triangular, so
    T = flip2(tri_inv_lower(Lr).T) is a valid lower-triangular square root
    of the inverse. TPU rationale: the direct route
    chol(P) -> cho_solve(.., I) -> chol(P^-1) is THREE serial [M, M]
    factorization/solve ops (none of which ride the MXU); this is two.
    Used by the natural-gradient update (optim/natgrad.py), where the
    precision-to-covariance round trip sits on the step's critical path."""
    eye = jnp.eye(P.shape[-1], dtype=P.dtype)
    Pr = (P + jitter * eye)[::-1, ::-1]
    Lr = jnp.linalg.cholesky(Pr)
    return tri_inv_lower(Lr).T[::-1, ::-1]


def wide_rhs(n, m) -> bool:
    """True when an [m, m] triangular factor applied to an n-column RHS
    should take the explicit-inverse GEMM route (n >= m; see
    tri_inv_lower). A SYMBOLIC n (jax.export with a polymorphic batch
    dimension) compares inconclusively — fall back to direct solves,
    which are correct for any batch and cheapest for the small-request
    serving case."""
    try:
        return bool(n >= m)
    except Exception:
        return False


def solve_upper(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solves L^T x = B given lower-triangular L."""
    return jax.scipy.linalg.solve_triangular(L.T, B, lower=False)


def cholesky_solve(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """(L L^T)^{-1} B."""
    return solve_upper(L, solve_lower(L, B))


def logdet_from_chol(L: jnp.ndarray) -> jnp.ndarray:
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))
