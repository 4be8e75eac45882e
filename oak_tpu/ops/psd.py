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

# The factorization GEMMs (blocked triangular inverse, Cholesky/tri-inv
# VJPs) run at HIGH precision (bf16_3x): measured on the TPU (BASELINE.md
# round-4 factorization roofline), DEFAULT (single-pass bf16) costs 4e-3
# relative gradient error — most of the 1e-3 end-to-end parity budget —
# while HIGH is 3e-5 at ~1.3x the GEMM time and HIGHEST (full f32) runs
# ~60x slower than DEFAULT on this chip for no accuracy the budget needs.
_HIGH = lax.Precision.HIGH


def _mT(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(x, -1, -2)


def _hmm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_HIGH)


def _phi(P: jnp.ndarray) -> jnp.ndarray:
    """Murray's Phi mask: keep the strictly-lower triangle, halve the
    diagonal, zero the upper triangle (batched over leading dims)."""
    diag = jnp.diagonal(P, axis1=-2, axis2=-1)
    eye = jnp.eye(P.shape[-1], dtype=P.dtype)
    return jnp.tril(P) - 0.5 * (diag[..., :, None] * eye)


# Crossover where the bottom-up blocked inverse overtakes XLA's monolithic
# TriangularSolve-vs-I, and the leaf size where the remaining solves are
# batched into one call (both measured on the TPU — BASELINE.md round-4
# factorization roofline; the blocked route wins from ~[1024, 1024] up).
_TRI_INV_BLOCK_MIN = 1024
_TRI_INV_LEAF = 256


def _tri_inv_blocked(L: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular inverse as batched leaf solves + MXU GEMM combines.

    XLA's TriangularSolve back-substitutes serially over panels and cannot
    ride the MXU: the honest full-width solve-vs-I costs 34.8 ms at
    [8192, 8192] (bench.py --roofline-chol, round-4 run 3 — an earlier
    probe of this op read only out[0, 0] and XLA sliced the solve down to
    ONE column, which is how it was first recorded as 1.6 ms). This
    routine uses the 2x2 block identity

        [[A, 0], [C, D]]^-1 = [[A^-1, 0], [-D^-1 C A^-1, D^-1]]

    bottom-up: ONE batched [n/leaf, leaf, leaf] TriangularSolve inverts all
    diagonal leaf blocks in parallel, then log2(n/leaf) rounds of batched
    GEMMs (precision HIGH) assemble doubling-size inverses. All shapes are
    static; n is padded to leaf * 2^k with an identity block (the inverse
    of a block-diagonal pad is the padded inverse) and sliced back.
    O(n^3/3) FLOPs land on the MXU instead of the serial solve pipeline:
    measured 34.8 -> 18.3 ms at [8192, 8192] and 0.66 -> 0.43 ms at
    [2048, 2048] (HIGH-precision GEMMs; the remaining time is the batched
    leaf solve plus log2(n/256) dependent GEMM rounds)."""
    n = L.shape[-1]
    if n <= _TRI_INV_LEAF:
        return jax.scipy.linalg.solve_triangular(
            L, jnp.eye(n, dtype=L.dtype), lower=True)
    k = max((n - 1).bit_length() - (_TRI_INV_LEAF).bit_length() + 1, 0)
    n_pad = _TRI_INV_LEAF * (1 << k)
    if n_pad != n:
        pad = n_pad - n
        L = jnp.block(
            [[L, jnp.zeros((n, pad), L.dtype)],
             [jnp.zeros((pad, n), L.dtype), jnp.eye(pad, dtype=L.dtype)]])
    m, P = _TRI_INV_LEAF, n_pad // _TRI_INV_LEAF
    # all diagonal leaf blocks, one batched solve: [P, m, m]
    idx = jnp.arange(P)
    diag_blocks = L.reshape(P, m, P, m)[idx, :, idx, :]
    eye = jnp.broadcast_to(jnp.eye(m, dtype=L.dtype), diag_blocks.shape)
    W = jax.scipy.linalg.solve_triangular(diag_blocks, eye, lower=True)
    while m < n_pad:
        half = jnp.arange(P // 2)
        sub = L.reshape(P, m, P, m)[2 * half + 1, :, 2 * half, :]
        WA, WD = W[0::2], W[1::2]
        off = -_hmm(WD, _hmm(sub, WA))
        top = jnp.concatenate([WA, jnp.zeros_like(WA)], axis=-1)
        bot = jnp.concatenate([off, WD], axis=-1)
        W = jnp.concatenate([top, bot], axis=-2)
        m, P = 2 * m, P // 2
    Wfull = W[0]
    return Wfull[:n, :n] if n_pad != n else Wfull


def _tri_inv_dispatch(L: jnp.ndarray) -> jnp.ndarray:
    """Static-shape route: blocked MXU inverse for large 2-D factors,
    XLA's monolithic solve below the crossover and for explicitly-batched
    inputs (a logical 2-D argument under vmap still takes the blocked
    route — vmap batches the blocked ops directly)."""
    if L.ndim == 2 and L.shape[-1] >= _TRI_INV_BLOCK_MIN:
        return _tri_inv_blocked(L)
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return jax.scipy.linalg.solve_triangular(L, eye, lower=True)


# Crossover where the blocked right-looking Cholesky overtakes XLA's
# monolithic CholeskyDecomposition, and the panel width (both measured on
# the TPU — BASELINE.md round-5 factorization roofline: at [8192, 8192]
# blocked 9.62 ms vs XLA 12.71 ms (1.32x), at [4096, 4096] 1.97 vs 2.16 ms
# (1.10x), at [2048, 2048] the serial panel chain loses, 0.69 vs 0.52 ms;
# panel sweep at 8192: 512 -> 9.62, 1024 -> 10.37, 2048 -> 11.77 ms).
_CHOL_BLOCK_MIN = 4096
_CHOL_PANEL = 512


def _cholesky_blocked(A: jnp.ndarray) -> jnp.ndarray:
    """Right-looking blocked Cholesky: panel factorizations serial, trailing
    updates as MXU GEMMs.

    XLA's CholeskyDecomposition back-substitutes serially over narrow
    internal panels and reaches ~8% of the chip's measured GEMM rate
    (12.46 ms at [8192, 8192], bench.py --roofline-chol, BASELINE.md
    round-4). The classical blocked recurrence moves the O(n^3/3) trailing
    work onto the MXU:

        L11 = chol(T11)                (one [P, P] panel, XLA's native op)
        L21 = T21 @ L11^-T             (GEMM against the panel's inverse)
        T   = T22 - L21 @ L21^T        (trailing syrk, the FLOPs bulk)

    The Python loop unrolls over ``n // P`` panels with static shrinking
    shapes, so one compile serves each input size; GEMMs run at HIGH
    precision (see _HIGH above — DEFAULT's single-pass bf16 costs 4e-3
    relative error, most of the parity budget). The panel inverse reuses
    the batched-leaf TriangularSolve (vs I) rather than a full-width solve
    against the trailing columns: the [P, P] solve amortizes across the
    whole column block. NaN behavior matches jnp.linalg.cholesky: an
    indefinite trailing block NaNs its panel and everything after it.
    Reference chain: the [N, N] factor behind
    /root/reference/oak/utils.py:206-211.
    """
    n = A.shape[-1]
    P = _CHOL_PANEL
    cols = []
    T = A
    for k in range(0, n, P):
        b = min(P, n - k)
        T11 = T[:b, :b]
        L11 = jnp.linalg.cholesky(T11)
        rest = T.shape[0] - b
        if rest == 0:
            cols.append(jnp.concatenate(
                [jnp.zeros((k, b), A.dtype), L11], axis=0))
            break
        W = jax.scipy.linalg.solve_triangular(
            L11, jnp.eye(b, dtype=A.dtype), lower=True)
        L21 = _hmm(T[b:, :b], _mT(W))
        T = T[b:, b:] - _hmm(L21, _mT(L21))
        cols.append(jnp.concatenate(
            [jnp.zeros((k, b), A.dtype), L11, L21], axis=0))
    return jnp.concatenate(cols, axis=1)


def _cholesky_dispatch(A: jnp.ndarray) -> jnp.ndarray:
    """Blocked MXU route for large 2-D inputs, XLA's monolithic op below
    the crossover and for explicitly-batched inputs (mirrors
    _tri_inv_dispatch)."""
    if A.ndim == 2 and A.shape[-1] >= _CHOL_BLOCK_MIN:
        return _cholesky_blocked(A)
    return jnp.linalg.cholesky(A)


@jax.custom_vjp
def cholesky_lower(A: jnp.ndarray) -> jnp.ndarray:
    """`jnp.linalg.cholesky` with a GEMM-built reverse pass.

    XLA's Cholesky VJP lowers to two full-width triangular solves, which
    back-substitute serially over panels and cannot ride the MXU: measured
    125.8 ms forward+VJP at [8192, 8192] against a 12.5 ms forward (bench.py
    --roofline-chol, BASELINE.md round-4 run 3). The closed-form cotangent
    (Murray 2016, "Differentiation of the Cholesky decomposition", eq. 8)

        Abar = sym( L^-T Phi(L^T Lbar) L^-1 ),   Phi = tril, half diagonal

    needs one triangular inverse (the blocked MXU route below the forward)
    plus three HIGH-precision GEMMs: 85.5 ms forward+VJP at the same size
    (1.47x), which takes the dense-GPR N=8192 training step from 135.4 to
    94.4 ms and leaves it 90.5% accounted by this chain. Upper-triangle
    cotangent components are annihilated structurally (L^T Lbar_upper is
    strictly upper, so Phi zeroes it) — matching XLA's convention that the
    primal's frozen-zero upper triangle carries no gradient. The returned
    cotangent is symmetrized, matching JAX's symmetric-input convention.
    Forward-mode (jvp) is not defined — training uses reverse mode only.

    Forward: large 2-D inputs take the blocked right-looking MXU route
    (_cholesky_blocked); smaller/batched inputs use XLA's native op.
    """
    return _cholesky_dispatch(A)


def _cholesky_lower_fwd(A):
    L = _cholesky_dispatch(A)
    return L, L


def _cholesky_lower_bwd(L, Lbar):
    Linv = _tri_inv_dispatch(L)
    P = _phi(_hmm(_mT(L), Lbar))
    S = _hmm(_mT(Linv), _hmm(P, Linv))
    return (0.5 * (S + _mT(S)),)


cholesky_lower.defvjp(_cholesky_lower_fwd, _cholesky_lower_bwd)


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
    return cholesky_lower(add_jitter(K, jitter))


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


# ---------------------------------------------------------------------------
# Mixed-precision iterative refinement: f32-faithful factorization on bf16
# hardware. XLA:TPU expands CholeskyDecomposition / TriangularSolve into
# blocked HLO whose internal dots run at the hardware-default single-pass
# bf16 (not controllable from JAX), so a [500, 500] factor of a sharp OAK
# Kuu carries ~4e-3 relative error where CPU f32 carries ~1e-7 — amplified
# by the posterior conditioning, the round-5 pumadyn predictions were off
# the f64 truth by 0.24 (standardized y) while the CPU-f32 legs sat at
# 4e-4. One Newton step against a HIGHEST-precision (true f32) residual
# recovers f32-grade factors and solves at predict-time cost: the residual
# is second-order small, so its own solve noise is negligible.
# ---------------------------------------------------------------------------
_HIGHEST = lax.Precision.HIGHEST


def _xmm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_HIGHEST)


def refine_cholesky(K: jnp.ndarray, L: jnp.ndarray,
                    iters: int = 1) -> jnp.ndarray:
    """Newton-refine a (possibly bf16-internally-computed) Cholesky factor
    of K: with E = K - L L^T evaluated at HIGHEST precision,
    L' = L + L. Phi(L^-1 E L^-T) (the Cholesky differential, Murray eq. 5).
    Error contracts from eps to O(cond . eps^2) per iteration."""
    for _ in range(iters):
        E = K - _xmm(L, _mT(L))
        F = jax.scipy.linalg.solve_triangular(L, E, lower=True)
        G = jax.scipy.linalg.solve_triangular(L, _mT(F), lower=True)
        L = L + _xmm(L, _phi(_mT(G)))
    return L


def solve_lower_refined(L: jnp.ndarray, B: jnp.ndarray,
                        iters: int = 1) -> jnp.ndarray:
    """solve_lower with Newton refinement against the HIGHEST-precision
    residual (TPU TriangularSolve internals are bf16; see module note)."""
    X = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    for _ in range(iters):
        R = B - _xmm(L, X)
        X = X + jax.scipy.linalg.solve_triangular(L, R, lower=True)
    return X


def solve_upper_refined(L: jnp.ndarray, B: jnp.ndarray,
                        iters: int = 1) -> jnp.ndarray:
    """Refined solve of L^T x = B for lower-triangular L."""
    U = _mT(L)
    X = jax.scipy.linalg.solve_triangular(U, B, lower=False)
    for _ in range(iters):
        R = B - _xmm(U, X)
        X = X + jax.scipy.linalg.solve_triangular(U, R, lower=False)
    return X


def tri_inv_lower_refined(L: jnp.ndarray, iters: int = 1) -> jnp.ndarray:
    """Explicit triangular inverse with Newton refinement
    W <- W + W (I - L W): quadratic error contraction, two HIGHEST GEMMs
    per iteration, exact lower-triangular structure preserved by masking."""
    W = _tri_inv_dispatch(L)
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    for _ in range(iters):
        E = eye - _xmm(L, W)
        W = W + jnp.tril(_xmm(W, E))
    return W


@jax.custom_vjp
def tri_inv_lower(L: jnp.ndarray) -> jnp.ndarray:
    """Explicit inverse of a lower-triangular factor (one [M, M] solve
    against I), with a GEMM-built reverse pass.

    TPU rationale (forward): a triangular solve back-substitutes serially
    over blocked panels and cannot ride the MXU, so for a WIDE right-hand
    side `tri_inv_lower(L) @ B` beats `solve_lower(L, B)` ~2x through
    forward+backward (measured at M=512, N=8192: 0.291 -> 0.131 ms,
    BASELINE.md round-5 probe) — the one fixed-cost [M, M] solve amortizes
    and the per-column work becomes a GEMM. Accuracy loss vs the direct
    solve is O(cond(L) * eps) and is covered by the f32<->f64 parity gates.
    Use for M x M inducing-point factors with many-column RHS; keep direct
    solves for narrow RHS and for N x N data-sized factors (GPR).

    Large factors take the blocked MXU route (_tri_inv_blocked) instead of
    XLA's monolithic solve — see _tri_inv_dispatch for the crossover.

    Reverse pass: XLA differentiates a triangular solve into another
    full-width triangular solve (71.4 ms forward+VJP at [8192, 8192],
    bench.py --roofline-chol, round-4 run 3). The closed form for W = L^-1
    is

        Lbar = -tril( W^T Wbar W^T )

    — two HIGH-precision GEMMs on the saved forward result (35.5 ms
    forward+VJP at the same size, 2.0x; 0.69 vs 0.99 ms at [2048, 2048]).
    The tril mask annihilates upper-triangle cotangent components, matching
    the primal's frozen-zero upper triangle."""
    return _tri_inv_dispatch(L)


def _tri_inv_lower_fwd(L):
    W = _tri_inv_dispatch(L)
    return W, W


def _tri_inv_lower_bwd(W, Wbar):
    Wt = _mT(W)
    return (-jnp.tril(_hmm(Wt, _hmm(Wbar, Wt))),)


tri_inv_lower.defvjp(_tri_inv_lower_fwd, _tri_inv_lower_bwd)


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
    Lr = cholesky_lower(Pr)
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
