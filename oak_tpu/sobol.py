"""Analytic Sobol indices and per-component predictions.

Rebuild of the interpretability layer (/root/reference/oak/utils.py:116-530).
For each additive component c with dims S and posterior weights alpha, the
(unnormalized) Sobol index is

    R_c = alpha^T ( prod_{d in S} L_d ) alpha        (Hadamard product)

where L_d[i, j] = ∫ K_d(x_i, s) K_d(x_j, s) dμ_d(s) is the per-dimension
second-moment matrix under dim d's input measure. Closed forms:

- Gaussian measure + RBF: the f1 - f2 - f3 + f4 integrals of the paper's
  App. G.1 eqs (44)-(47) (reference utils.py:116-165, 221-240), vectorized by
  broadcasting on the [N, N] grid instead of numpy repeat/tile.
- Empirical measure: L = Kxu^T diag(w) Kxu (utils.py:312-335) — one matmul.
- Binary / categorical: L = B_x diag(p) B_x^T with B_x the gathered table rows
  (utils.py:243-309) — matmul over C columns.
- MOG measure: NOT supported by the reference (NotImplementedError,
  utils.py:413-414). Here it IS supported via per-component Gauss-Hermite:
  L = G diag(w ⊗ ω) G^T with G = K(x, s_grid) — an MXU matmul, exact to
  quadrature order for the smooth RBF integrand.
- Uniform measure: also beyond the reference — Gauss-Legendre on [a, b].

Everything returns per-dim L matrices once ([D, N, N] worth of work), after
which all C(D, ≤P) components are evaluated by a scanned Hadamard-product
quadratic form on device — replacing the reference's CPU numpy loop (§3.4 of
SURVEY.md). Per-order totals reuse Newton-Girard over the L matrices, giving
O(D·P) totals with no tuple enumeration.

Variance convention: L_d is computed with the kernel's own base variance; in
shared-variance mode the component result is scaled by variances[order]^2
(since Var[f_c] is quadratic in the kernel scale). NOTE the reference scales
binary-kernel components by v^1 (utils.py:418) while scaling Gaussian (σ⁴ in
f1..f4), categorical, and empirical branches by v^2 — an inconsistency we fix
rather than clone (see PARITY_NOTES.md).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .kernels import (
    OAKKernel,
    OrthogonalBinary,
    OrthogonalCategorical,
    OrthogonalRBF,
    component_index_tuples,
)
from .kernels import ortho_binary, ortho_categorical, ortho_rbf

# group-stacking helpers live in kernels.oak_kernel (shared with the fused
# K_diag path); kept under their original names for in-repo users
from .kernels.oak_kernel import per_dim_batched as _kernel_per_dim_batched
from .kernels.oak_kernel import stack_group as _stack_group
from .kernels.oak_kernel import stackable_groups as _stackable_groups
from .measures import (
    EmpiricalMeasure,
    GaussianMeasure,
    MOGMeasure,
    UniformMeasure,
)
from .ops.newton_girard import newton_girard


# --------------------------------------------------------------------------- #
# Closed-form Gaussian-measure integrals (paper App. G.1 eqs 44-47)
# --------------------------------------------------------------------------- #
def f1(x, y, sigma, l, delta, mu):
    return (
        sigma ** 4
        * l
        / jnp.sqrt(l ** 2 + 2 * delta ** 2)
        * jnp.exp(-((x - y) ** 2) / (4 * l ** 2))
        * jnp.exp(-((mu - (x + y) / 2) ** 2) / (2 * delta ** 2 + l ** 2))
    )


def f2(x, y, sigma, l, delta, mu):
    M = 1 / l ** 2 + 1 / (l ** 2 + delta ** 2)
    m = (mu / (l ** 2 + delta ** 2) + x / l ** 2) / M
    C = x ** 2 / l ** 2 + mu ** 2 / (l ** 2 + delta ** 2) - m ** 2 * M
    return (
        sigma ** 4
        * l
        * jnp.sqrt((l ** 2 + 2 * delta ** 2) / (delta ** 2 * M + 1))
        * jnp.exp(-C / 2)
        / (l ** 2 + delta ** 2)
        * jnp.exp(-((y - mu) ** 2) / (2 * (l ** 2 + delta ** 2)))
        * jnp.exp(-((m - mu) ** 2) / (2 * (1 / M + delta ** 2)))
    )


def f3(x, y, sigma, l, delta, mu):
    return f2(y, x, sigma, l, delta, mu)


def f4(x, y, sigma, l, delta, mu):
    return (
        sigma ** 4
        * l ** 2
        * (l ** 2 + 2 * delta ** 2)
        * jnp.sqrt((l ** 2 + delta ** 2) / (l ** 2 + 3 * delta ** 2))
        / ((l ** 2 + delta ** 2) ** 2)
        * jnp.exp(-((x - mu) ** 2 + (y - mu) ** 2) / (2 * (l ** 2 + delta ** 2)))
    )


def compute_L_gaussian(x: jnp.ndarray, lengthscale, variance, delta, mu) -> jnp.ndarray:
    """[N, N] L matrix for an OrthogonalRBF dim under N(mu, delta^2)
    (reference compute_L, utils.py:221-240), by broadcasting."""
    sigma = jnp.sqrt(variance)
    xi = x[:, None]
    yj = x[None, :]
    return (
        f1(xi, yj, sigma, lengthscale, delta, mu)
        - f2(xi, yj, sigma, lengthscale, delta, mu)
        - f3(xi, yj, sigma, lengthscale, delta, mu)
        + f4(xi, yj, sigma, lengthscale, delta, mu)
    )


# --------------------------------------------------------------------------- #
# Quadrature / matmul L matrices
# --------------------------------------------------------------------------- #
def compute_L_empirical(kernel: OrthogonalRBF, x: jnp.ndarray) -> jnp.ndarray:
    """L = Kxu^T diag(w) Kxu over the empirical locations (utils.py:312-335)."""
    m: EmpiricalMeasure = kernel.measure
    loc = m.location[:, 0]
    w = m.weights[:, 0]
    kxu = ortho_rbf.K(kernel, loc, x)  # [E, N]
    return (w[:, None] * kxu).T @ kxu


def compute_L_binary(kernel: OrthogonalBinary, x: jnp.ndarray) -> jnp.ndarray:
    """L = B_x diag(p) B_x^T with the *full-variance* B (fixes the reference's
    v^1 scaling at utils.py:266-269; see module docstring)."""
    B = ortho_binary.output_covariance(kernel)  # [2, 2], includes sigma^2
    p = jnp.stack([kernel.p0, 1.0 - kernel.p0])
    Bx = B[x.astype(jnp.int32)]  # [N, 2]
    return (Bx * p[None, :]) @ Bx.T


def compute_L_categorical(kernel: OrthogonalCategorical, x: jnp.ndarray) -> jnp.ndarray:
    """utils.py:275-309: L = K^T (K * p) with K = B[:, x]."""
    B = ortho_categorical.output_covariance(kernel)  # [C, C]
    Bx = B[x.astype(jnp.int32)]  # [N, C]
    return (Bx * kernel.p[:, 0][None, :]) @ Bx.T


def _gauss_hermite_grid(means, variances, weights, num_points: int, dtype):
    q, w = np.polynomial.hermite_e.hermegauss(num_points)
    w = w / np.sqrt(2.0 * np.pi)
    q = jnp.asarray(q, dtype)
    w = jnp.asarray(w, dtype)
    s = means[:, None] + jnp.sqrt(variances)[:, None] * q[None, :]  # [K, Q]
    wgt = weights[:, None] * w[None, :]
    return s.reshape(-1), wgt.reshape(-1)


def compute_L_quadrature(kernel: OrthogonalRBF, x: jnp.ndarray,
                         num_points: int = 64) -> jnp.ndarray:
    """General-measure L via quadrature: L = G diag(w) G^T, G = K(x, grid).

    Supports MOG (beyond the reference) and Gaussian/Uniform as a
    cross-check of the closed forms.
    """
    fw = factor_form(kernel, x, num_points)
    if fw is None:
        raise NotImplementedError(type(kernel.measure))
    G, w = fw  # one grid definition: factor_form owns the quadrature rules
    return (G * w[None, :]) @ G.T


def compute_L_for_kernel(kernel, x: jnp.ndarray, delta=None, mu=None) -> jnp.ndarray:
    """Dispatch the right L construction for one constituent kernel; ``x`` is
    the sliced column of training inputs / inducing points.

    For Gaussian measures a numerically-robust hybrid is used: the closed form
    f1-f2-f3+f4 suffers catastrophic cancellation once the lengthscale exceeds
    the measure scale (the four terms are each ~sigma^4 and nearly cancel —
    with the unbounded hyperparameters a flat fit can reach, the reference's
    numpy implementation returns garbage there), while Gauss-Hermite
    quadrature of the *constrained* kernel is exact in precisely that regime
    and only loses accuracy when the lengthscale is far below the node
    spacing. Select per-dim at l = 0.5 * measure scale; both branches are
    accurate at the crossover (verified in tests/test_sobol.py).

    ``delta``/``mu`` override the Gaussian Sobol measure (reference API compat);
    by default the kernel's own measure is used — they coincide everywhere in
    the reference (delta=1, mu=0 vs GaussianMeasure(0, 1)).
    """
    if isinstance(kernel, OrthogonalBinary):
        return compute_L_binary(kernel, x)
    if isinstance(kernel, OrthogonalCategorical):
        return compute_L_categorical(kernel, x)
    if isinstance(kernel, OrthogonalRBF):
        m = kernel.measure
        if isinstance(m, EmpiricalMeasure):
            return compute_L_empirical(kernel, x)
        if isinstance(m, GaussianMeasure):
            d = jnp.sqrt(m.var) if delta is None else jnp.asarray(delta, x.dtype)
            mean = m.mu if mu is None else jnp.asarray(mu, x.dtype)
            l = kernel.lengthscale.value
            Lc = compute_L_gaussian(x, l, kernel.variance.value, d, mean)
            if delta is None and mu is None:
                Lq = compute_L_quadrature(kernel, x)
            else:
                # override measure: quadrature grid under N(mu, delta^2), not
                # the kernel's own measure (reference utils.py:478 threads
                # delta/mu into every L construction)
                s, w = _gauss_hermite_grid(
                    jnp.reshape(mean, (1,)), jnp.reshape(d * d, (1,)),
                    jnp.ones((1,), x.dtype), 64, x.dtype)
                G = ortho_rbf.K(kernel, x, s)
                Lq = (G * w[None, :]) @ G.T
            return jnp.where(l > 0.5 * d, Lq, Lc)
        if isinstance(m, (MOGMeasure, UniformMeasure)):
            return compute_L_quadrature(kernel, x)
    raise NotImplementedError(type(kernel))


# --------------------------------------------------------------------------- #
# Factorized second-moment forms: L_d = F diag(w) F^T
# --------------------------------------------------------------------------- #
def factor_form(kernel, x: jnp.ndarray, num_points: int = 64):
    """(F [N, Q], w [Q]) with L = F diag(w) F^T, or None when no
    well-conditioned factorization exists (Gaussian measure with lengthscale
    far below the quadrature node spacing).

    The factor form turns the Sobol quadratic form alpha^T L alpha into
    sum_q w_q (F^T alpha)_q^2 — a sum of non-negative terms. The Hadamard
    route sums O(N^2) signed products that cancel to machine precision when
    alpha is large (near-noiseless fits); the factor route is exact there.
    """
    dtype = x.dtype
    if isinstance(kernel, OrthogonalBinary):
        B = ortho_binary.output_covariance(kernel)
        p = jnp.stack([kernel.p0, 1.0 - kernel.p0])
        return B[x.astype(jnp.int32)], p
    if isinstance(kernel, OrthogonalCategorical):
        B = ortho_categorical.output_covariance(kernel)
        return B[x.astype(jnp.int32)], kernel.p[:, 0]
    if isinstance(kernel, OrthogonalRBF):
        m = kernel.measure
        if isinstance(m, EmpiricalMeasure):
            return ortho_rbf.K(kernel, x, m.location[:, 0]), m.weights[:, 0]
        if isinstance(m, GaussianMeasure):
            s, w = _gauss_hermite_grid(m.mu[None], m.var[None],
                                       jnp.ones((1,), dtype), num_points, dtype)
        elif isinstance(m, MOGMeasure):
            s, w = _gauss_hermite_grid(m.means, m.variances, m.weights,
                                       num_points, dtype)
        elif isinstance(m, UniformMeasure):
            q, w_ = np.polynomial.legendre.leggauss(num_points)
            s = 0.5 * (m.b - m.a) * jnp.asarray(q, dtype) + 0.5 * (m.a + m.b)
            w = jnp.asarray(w_, dtype) * 0.5
        else:
            return None
        return ortho_rbf.K(kernel, x, s), w
    return None


# --------------------------------------------------------------------------- #
# Sobol indices over all components
# --------------------------------------------------------------------------- #
def _per_dim_batched(oak: OAKKernel, X: jnp.ndarray, fn):
    return _kernel_per_dim_batched(oak.kernels, X, fn)


def _dim_L_stack(oak: OAKKernel, X: jnp.ndarray, delta=None, mu=None) -> jnp.ndarray:
    """[D, N, N] per-dim L matrices (the ladder consumes exactly D slices;
    variable-order padding lives in the prediction-component gram stack)."""
    mats = _per_dim_batched(
        oak, X, lambda k, x: compute_L_for_kernel(k, x, delta, mu))
    return jnp.stack(mats, axis=0)


def _order_scales(oak: OAKKernel, orders: jnp.ndarray, dtype) -> jnp.ndarray:
    """Per-component variance scale: variances[order]^2 in shared mode, else 1
    (base variances already inside each L)."""
    if not oak.share_var_across_orders:
        return jnp.ones(orders.shape, dtype)
    vs = jnp.stack([v.value.reshape(()) for v in oak.variances]).astype(dtype)
    return (vs ** 2)[orders]


def _host_constrained(raw: np.ndarray, b) -> np.ndarray:
    """Constrained value computed with numpy from a host-resident raw value —
    evaluating ``p.value`` eagerly dispatches several tiny device ops per
    parameter (~70 ms each through the TPU tunnel; routing over 32 dims cost
    2.4 s)."""
    from .bijectors import Exp, Sigmoid, Softplus

    if isinstance(b, Softplus):
        return np.logaddexp(0.0, raw) + b.low
    if isinstance(b, Sigmoid):
        return b.low + (b.high - b.low) / (1.0 + np.exp(-raw))
    if isinstance(b, Exp):
        return np.exp(raw)
    return raw


def _host_param_value(p) -> np.ndarray:
    return _host_constrained(np.asarray(p.raw), p.bij)


def _factor_routing(oak) -> Tuple[bool, ...]:
    """Per-dim factor-path usability: accurate unless a Gaussian-measure RBF
    lengthscale is far below the quadrature node spacing. All the needed
    device values are pulled in ONE batched device_get — per-parameter
    transfers cost ~1 ms each through the TPU relay (32 dims made this
    routing alone cost more than the whole Sobol computation)."""
    gauss = [(i, k) for i, k in enumerate(oak.kernels)
             if isinstance(k, OrthogonalRBF)
             and isinstance(k.measure, GaussianMeasure)]
    # kernels with no factor form at all (UnconstrainedRBF, unknown types —
    # including an OrthogonalRBF whose measure factor_form does not recognize)
    # must route to the Hadamard path, whose compute_L_for_kernel raises a
    # clean NotImplementedError instead of the factor path's None subscript
    routing = [_has_factor_form(k) for k in oak.kernels]
    if not gauss:
        return tuple(routing)
    host = jax.device_get([(k.lengthscale.raw, k.measure.var) for _, k in gauss])
    for (i, k), (raw, var) in zip(gauss, host):
        l = float(_host_constrained(np.asarray(raw), k.lengthscale.bij))
        routing[i] = l > 0.5 * float(np.sqrt(np.asarray(var)))
    return tuple(routing)


def _has_factor_form(kernel) -> bool:
    """Whether factor_form can return a (F, w) pair for this kernel — the
    same type dispatch factor_form itself performs, checked without building
    anything so routing never subscripts a None."""
    if isinstance(kernel, (OrthogonalBinary, OrthogonalCategorical)):
        return True
    if isinstance(kernel, OrthogonalRBF):
        return isinstance(kernel.measure, (GaussianMeasure, MOGMeasure,
                                           UniformMeasure, EmpiricalMeasure))
    return False


def _usable_factor(kernel) -> bool:
    """Single-kernel form of _factor_routing (kept for tests/direct use)."""
    if not _has_factor_form(kernel):
        return False
    if isinstance(kernel, OrthogonalRBF) and isinstance(kernel.measure, GaussianMeasure):
        l = float(_host_param_value(kernel.lengthscale))
        return l > 0.5 * float(np.sqrt(np.asarray(kernel.measure.var)))
    return True


def _model_X(model):
    X = model.inducing_points
    return model.data[0] if X is None else X


def num_latents(model) -> int:
    """Number of latent functions/outputs (static shape, host-side):
    q(u) columns for SVGP, Y columns for GPR/SGPR."""
    q = getattr(model, "q_mu", None)
    if q is not None:
        return int(q.value.shape[1])
    data = getattr(model, "data", None)
    return int(np.shape(data[1])[1]) if data is not None else 1


def select_latent(model, latent: int):
    """A single-latent VIEW of a multi-latent/multi-output model: q(u)
    (SVGP) or Y (GPR/SGPR) sliced to one column, everything else shared.
    All single-latent machinery (posterior stats, Sobol, effect plots)
    then applies to the selected latent unchanged."""
    R = num_latents(model)
    if not 0 <= latent < R:
        raise ValueError(f"latent={latent} out of range for a model with "
                         f"{R} latent function(s)")
    if R == 1:
        return model
    if getattr(model, "q_mu", None) is not None:
        q_mu = model.q_mu.replace(raw=model.q_mu.raw[:, latent:latent + 1])
        qs_raw = model.q_sqrt.raw
        qs_raw = (qs_raw[:, latent:latent + 1] if model.q_diag
                  else qs_raw[latent:latent + 1])
        return model.replace(q_mu=q_mu,
                             q_sqrt=model.q_sqrt.replace(raw=qs_raw))
    return model.replace(Y=model.Y[:, latent:latent + 1])


def resolve_latent(model, latent=None):
    """The model restricted to one latent. ``latent=None`` requires a
    single-latent model — the reference SILENTLY uses latent 0 on a
    multi-latent SVGP (/root/reference/oak/utils.py:174-179 takes posterior
    Qinv[0]); oak_tpu requires the caller to choose instead."""
    if latent is not None:
        return select_latent(model, int(latent))
    R = num_latents(model)
    if R > 1:
        raise NotImplementedError(
            f"model has {R} latent functions/outputs; Sobol decomposition "
            "and effect plots attribute the variance of ONE latent — pass "
            "latent=r (0..R-1) to the Sobol APIs, or plot/analyze the "
            "single-latent view oak_tpu.sobol.select_latent(model, r)")
    return model


def check_single_latent(model) -> None:
    """Back-compat guard (raises on multi-latent; see resolve_latent)."""
    resolve_latent(model, None)


# --------------------------------------------------------------------------- #
# Mesh sharding of the Sobol computation
# --------------------------------------------------------------------------- #
def _shard_hint(x: jnp.ndarray, mesh, axes: Tuple[Optional[int], ...]):
    """with_sharding_constraint over the mesh's (single) axis, applied to the
    array dimension named in ``axes`` (one entry per array dim; the non-None
    entry is sharded). No-op when mesh is None — the hints cost nothing
    single-device and let GSPMD partition every contraction over the data
    axis when a mesh is supplied (the collectives are XLA-inserted psums of
    the SMALL per-order outputs; the [D, N, N] L stack and the prefix
    matrices stay sharded in place)."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    name = mesh.axis_names[0]
    spec = PartitionSpec(*[name if a is not None else None for a in axes])
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


# Cap on the prefix-product matrix Q_k [C_k, N*N] kept live by the ladder;
# above it the remaining orders fall back to a chunked gather-product map.
# 6 GB covers depth-4 at D=32, M=512 in f32 (C_3 = 4,960 rows -> 5.2 GB, well
# inside a v5e's 16 GB HBM; measured 0.58 s chunked vs 0.16 s ladder) while
# the f64 CPU parity mode (10.4 GB) still falls back.
_LADDER_BYTES_CAP = 6 * 1024 ** 3

# Depth-3 einsum fast-path gate: None = auto (accelerators only — on one
# XLA-CPU core the [D^2, N^2] temp + 2x FLOPs lose to the prefix ladder).
# Tests force True to exercise the branch (incl. its chunked form) on CPU.
_DEPTH3_EINSUM = None


def _ladder_quadforms(Lstack: jnp.ndarray, a: jnp.ndarray, D: int,
                      max_order: int, mesh=None) -> dict:
    """alpha^T (Hadamard-prod of L_d) alpha for EVERY combination of every
    order 1..max_order, batched.

    Replaces the former sequential ``lax.map`` over components (one tiny
    kernel launch per component — ~4 ms each through the TPU tunnel; 4,960
    depth-3 components made full Sobol minutes-slow). Instead: flatten each
    L to a row of Lf [D, N^2], fold alpha in once as A = vec(a a^T), and walk
    a prefix ladder — Q_1 = Lf * A, then for each order the values of ALL
    one-dim extensions are a single MXU matmul ext = Q_{k-1} @ Lf^T
    [C_{k-1}, D], and Q_k is a gather-and-multiply of the surviving
    (prefix, last) rows. O(C_{k-1} * D * N^2) MACs per order, reading Q and
    Lf once instead of gathering k L-matrices per component.

    Returns {order: values}, values in itertools.combinations order (the
    ladder extends prefixes lexicographically, which preserves it).
    Reference semantics: utils.py:338-435 per-component products.
    """
    N = Lstack.shape[1]
    X = N * N
    itemsize = np.dtype(Lstack.dtype).itemsize
    if D * X * itemsize > _LADDER_BYTES_CAP:
        # even the order-1 prefix matrix Q_1 = [D, N^2] is too large (dense
        # large-N GPR): go straight to the memory-bounded chunked route
        return _chunked_quadforms(Lstack, a, D, 1, max_order, mesh)
    Lf = _shard_hint(Lstack[:D].reshape(D, X), mesh, (None, 0))
    A = _shard_hint((a[:, None] * a[None, :]).reshape(X), mesh, (0,))
    Q = _shard_hint(Lf * A[None, :], mesh, (None, 0))  # [D, X]
    vals = {1: jnp.sum(Q, axis=1)}
    prefixes = [(d,) for d in range(D)]

    for k in range(2, max_order + 1):
        ext = Q @ Lf.T  # [C_{k-1}, D]
        rows, lasts, new_prefixes = [], [], []
        for r, t in enumerate(prefixes):
            for last in range(t[-1] + 1, D):
                rows.append(r)
                lasts.append(last)
                new_prefixes.append(t + (last,))
        rows_j = jnp.asarray(np.asarray(rows, np.int32))
        lasts_j = jnp.asarray(np.asarray(lasts, np.int32))
        vals[k] = ext[rows_j, lasts_j]
        if k < max_order:
            use_einsum = (_DEPTH3_EINSUM if _DEPTH3_EINSUM is not None
                          else jax.default_backend() != "cpu")
            if k == 2 and max_order == 3 and use_einsum:
                # depth-3 fast path: all triple quadratic forms as an einsum
                # M3[r,l,d] = sum_x Q1[r] Lf[l] Lf[d] — no [C_2, N^2] prefix
                # materialization and no row gathers (measured 3 ms vs 18 ms
                # device time at D=32, N=512; over-computes the D^3/6
                # redundancy but stays MXU-shaped). The pairwise contraction
                # materializes an [R, D, X] temp, so the r axis is chunked to
                # keep it under the ladder cap (R >= 1 always holds here: the
                # top-of-function check already diverted D*X > cap inputs).
                # Measured at M=2048, D=32 (where the old all-or-nothing cap
                # check fell through to the gather-product route): 1.52 s ->
                # 0.052 s full Sobol, chunked == unchunked bit-exact.
                # TPU/accelerator only: on one XLA-CPU
                # core the [D^2, N^2] temp + 2x FLOPs make the einsum ~3x
                # SLOWER than the prefix ladder (measured 2.7-3.0 s vs
                # 0.935 s full Sobol at the bench config) — backend is
                # static at trace time, so this is a free branch
                import itertools as it

                R = min(D, int(_LADDER_BYTES_CAP // (D * X * itemsize)))
                if R >= D:
                    M3 = jnp.einsum("rx,lx,dx->rld", Q, Lf, Lf)
                else:
                    pad = (-D) % R
                    Qp = jnp.pad(Q, ((0, pad), (0, 0)))
                    M3 = jax.lax.map(
                        lambda Qc: jnp.einsum("rx,lx,dx->rld", Qc, Lf, Lf),
                        Qp.reshape(-1, R, X)).reshape(-1, D, D)[:D]
                trip = np.asarray(list(it.combinations(range(D), 3)), np.int32)
                vals[3] = M3[trip[:, 0], trip[:, 1], trip[:, 2]]
                break
            if len(new_prefixes) * X * itemsize > _LADDER_BYTES_CAP:
                # remaining orders: chunked gather-product (memory-bounded)
                vals.update(_chunked_quadforms(Lstack, a, D, k + 1, max_order,
                                               mesh))
                break
            Q = _shard_hint(Q[rows_j] * Lf[lasts_j], mesh, (None, 0))
            prefixes = new_prefixes
    return vals


def _chunked_quadforms(Lstack: jnp.ndarray, a: jnp.ndarray, D: int,
                       order_from: int, order_to: int, mesh=None) -> dict:
    """Fallback for very large C_k: batched (vmapped-in-chunks) Hadamard
    products + quadratic forms, chunk size picked from the [B, N, N] buffer."""
    import itertools as it

    N = Lstack.shape[1]
    Lstack = _shard_hint(Lstack, mesh, (None, 0, None))
    B = max(1, min(256, int(2 ** 27 // max(N * N, 1))))
    out = {}
    for k in range(order_from, order_to + 1):
        idx = np.asarray(list(it.combinations(range(D), k)), np.int32)
        if idx.size == 0:
            out[k] = jnp.zeros((0,), Lstack.dtype)
            continue

        def one(c_idx):
            L = Lstack[c_idx[0]]
            for j in range(1, k):
                L = L * Lstack[c_idx[j]]
            return a @ L @ a

        out[k] = jax.lax.map(one, jnp.asarray(idx), batch_size=min(B, len(idx)))
    return out


def _sobol_values_impl(model, depth: int, routing: Tuple[bool, ...],
                       mesh=None) -> jnp.ndarray:
    """All component Sobol values (reference component order, constant
    skipped), as one fused computation. Orders 1-2 use the factorized
    cancellation-free quadratic form when every dim factorizes; higher orders
    and non-factorizable dims use the batched Hadamard ladder on the L stack.

    ``mesh`` (optional single-axis jax.sharding.Mesh) shards every O(N^2) /
    O(N*Q) intermediate over the data axis — the per-component quadratic
    forms all contract over it, so the only collectives are psums of the
    tiny per-order value vectors. This is how full-Sobol scales past one
    chip's HBM (the [D, N, N] L stack is the memory hog at large N)."""
    oak: OAKKernel = model.kernel
    X = jnp.asarray(_model_X(model))
    a = model.posterior_alpha()[:, 0]
    tuples = component_index_tuples(oak.num_dims, depth)[1:]
    D = oak.num_dims
    all_factor = all(routing)

    parts = {}
    hadamard_idx: List[int] = []
    if all_factor:
        factors = _per_dim_batched(oak, X, factor_form)
        Qmax = max(f[0].shape[1] for f in factors)

        def pad(F, w):
            q = F.shape[1]
            if q == Qmax:
                return F, w
            return (jnp.pad(F, ((0, 0), (0, Qmax - q))), jnp.pad(w, (0, Qmax - q)))

        padded = [pad(F, w) for F, w in factors]
        Fs = _shard_hint(jnp.stack([p[0] for p in padded]), mesh,
                         (None, 0, None))  # [D, N, Qmax]
        Ws = jnp.stack([p[1] for p in padded])  # [D, Qmax]

        V = jnp.einsum("dnq,n->dq", Fs, a)
        R1 = jnp.sum(Ws * V * V, axis=1)  # [D]
        parts["R1"] = R1

        pair_list = [t for t in tuples if len(t) == 2]
        if pair_list:
            pidx = jnp.asarray(pair_list, jnp.int32)
            # All pairs in one batched contraction (a sequential lax.map costs
            # ~4 ms/pair on TPU in dispatch/gather overhead — 496 pairs made
            # Sobol look 70x slower than it is)
            Fa = Fs * a[None, :, None]  # [D, N, Q]
            Fi = Fa[pidx[:, 0]]  # [C2, N, Q]
            Fj = Fs[pidx[:, 1]]  # [C2, N, Q]
            T = jnp.einsum("cnq,cnp->cqp", Fi, Fj)
            Wi = Ws[pidx[:, 0]]
            Wj = Ws[pidx[:, 1]]
            parts["R2"] = jnp.einsum("cq,cqp,cp->c", Wi, T * T, Wj)
        hadamard_idx = [i for i, t in enumerate(tuples) if len(t) > 2]
    else:
        hadamard_idx = list(range(len(tuples)))

    if hadamard_idx:
        Lstack = _shard_hint(_dim_L_stack(oak, X), mesh, (None, 0, None))
        P = max(len(tuples[i]) for i in hadamard_idx)
        min_order = min(len(tuples[i]) for i in hadamard_idx)
        ladder = _ladder_quadforms(Lstack, a, D, P, mesh)
        # scatter each order's values into RH (hadamard tuple order) with one
        # gather per order, not one per component
        import itertools as it

        RH = jnp.zeros((len(hadamard_idx),), Lstack.dtype)
        order_of = [len(tuples[i]) for i in hadamard_idx]
        for k in range(min_order, P + 1):
            pos_k = {t: i for i, t in enumerate(it.combinations(range(D), k))}
            rows = [j for j, o in enumerate(order_of) if o == k]
            if not rows:
                continue
            p = np.asarray([pos_k[tuple(tuples[hadamard_idx[j]])] for j in rows],
                           np.int32)
            RH = RH.at[np.asarray(rows, np.int32)].set(ladder[k][p])
        parts["RH"] = RH

    # assemble in component order with ONE gather from [R1 | R2 | RH] — a
    # per-tuple Python loop of dynamic slices emits thousands of tiny HLOs
    # (5,488 at D=32 depth 3) that alone cost ~25 ms on-chip and dominate
    # compile time
    blocks, offsets, off = [], {}, 0
    for name in ("R1", "R2", "RH"):
        if name in parts:
            blocks.append(parts[name])
            offsets[name] = off
            off += parts[name].shape[0]
    src = np.empty(len(tuples), np.int32)
    i2 = 0
    ih = 0
    for i, t in enumerate(tuples):
        if all_factor and len(t) == 1:
            src[i] = offsets["R1"] + t[0]
        elif all_factor and len(t) == 2:
            src[i] = offsets["R2"] + i2
            i2 += 1
        else:
            src[i] = offsets["RH"] + ih
            ih += 1
    values = jnp.concatenate(blocks)[jnp.asarray(src)]

    orders = jnp.asarray([len(t) for t in tuples], jnp.int32)
    scales = _order_scales(oak, orders, values.dtype)
    return values * scales


_sobol_values_jit = jax.jit(_sobol_values_impl, static_argnums=(1, 2, 3))


def _check_depth_override(oak: OAKKernel, depth: Optional[int]) -> int:
    """An override above the kernel's own interaction depth would fabricate
    values for orders the model does not contain (the order-variance gather
    would silently clamp to the last real order) — reject it; overrides at or
    below the model depth are legitimate truncations. ``None`` and ``0`` both
    mean "use the kernel's own depth" (the reference's ``depth or model_depth``
    idiom), so an explicit 0 never silently yields an empty component list;
    negative depths are rejected."""
    if depth is None or depth == 0:
        return oak.max_interaction_depth
    if depth < 0:
        raise ValueError(f"max depth override must be >= 1 (got {depth}); "
                         "pass None or 0 for the kernel's own depth")
    if depth > oak.max_interaction_depth:
        raise ValueError(
            f"max depth override {depth} exceeds the kernel's "
            f"max_interaction_depth={oak.max_interaction_depth}; the model "
            "has no higher-order components to attribute variance to")
    return depth


def _check_measure_override(oak: OAKKernel, delta, mu) -> None:
    """The Sobol measure lives inside each kernel (unlike the reference,
    which threads delta/mu through every call); an override that differs
    from the kernels' own measures would silently compute under the wrong
    measure, so reject it loudly. delta is a STDDEV (the reference passes
    delta=1, mu=0 matching its hardcoded N(0, 1), oak_kernel.py:84)."""
    if delta is None and mu is None:
        return
    for k in oak.kernels:
        if isinstance(k, OrthogonalRBF) and isinstance(k.measure, GaussianMeasure):
            m_mu = float(np.asarray(jax.device_get(k.measure.mu)))
            m_sd = float(np.sqrt(np.asarray(jax.device_get(k.measure.var))))
            if ((delta is not None and not np.isclose(float(delta), m_sd))
                    or (mu is not None and not np.isclose(float(mu), m_mu))):
                raise NotImplementedError(
                    f"Sobol measure override N({mu}, {delta}^2) differs from "
                    f"the kernel's own measure N({m_mu}, {m_sd}^2); rebuild "
                    "the kernel with the desired measure instead — oak_tpu "
                    "kernels carry their measure (reference utils.py:338)")


def compute_sobol_oak(model, delta=None, mu=None,
                      max_interaction_depth: Optional[int] = None,
                      latent: Optional[int] = None, mesh=None
                      ) -> Tuple[List[List[int]], np.ndarray]:
    """Sobol index of every additive component (skipping the constant), in the
    reference's component order (utils.py:338-435). Returns (tuples, values).
    One jitted computation; cached per (model structure, depth, routing).

    ``delta``/``mu`` (reference API) are accepted for a measure MATCHING the
    kernels' own (the reference always passes delta=1, mu=0); a differing
    override raises rather than silently computing under the wrong measure.
    ``latent`` selects one latent/output of a multi-latent model (the
    decomposition is per latent; omitting it on a multi-latent model
    raises — see resolve_latent). ``mesh`` (single-axis jax.sharding.Mesh)
    shards all O(N^2) intermediates over its devices — use when the [D, N, N]
    L stack exceeds one chip's HBM (see _sobol_values_impl)."""
    oak: OAKKernel = model.kernel
    model = resolve_latent(model, latent)
    _check_measure_override(oak, delta, mu)
    depth = _check_depth_override(oak, max_interaction_depth)
    tuples = component_index_tuples(oak.num_dims, depth)[1:]
    routing = _factor_routing(oak)
    values = _sobol_values_jit(model, depth, routing, mesh)
    return tuples, np.asarray(values)


def _sobol_by_order_impl(model, depth: int, mesh=None) -> jnp.ndarray:
    oak: OAKKernel = model.kernel
    X = jnp.asarray(_model_X(model))
    a = model.posterior_alpha()[:, 0]
    mats = [_shard_hint(L, mesh, (0, None))
            for L in _per_dim_batched(oak, X, compute_L_for_kernel)]
    e = newton_girard(mats, depth)[1:]  # orders 1..P
    orders = jnp.arange(1, depth + 1)
    scales = _order_scales(oak, orders, mats[0].dtype)
    return jnp.stack([a @ En @ a for En in e]) * scales


_sobol_by_order_jit = jax.jit(_sobol_by_order_impl, static_argnums=(1, 2))


def compute_sobol_by_order(model, delta=None, mu=None,
                           max_depth: Optional[int] = None,
                           latent: Optional[int] = None,
                           mesh=None) -> np.ndarray:
    """Total (unnormalized) Sobol mass per interaction order 1..P in O(D·P)
    via Newton-Girard over the L matrices — no tuple enumeration. TPU-side
    replacement for the reference's post-hoc aggregation loops
    (uci_regression_train.py:157-160). NOTE: shares the Hadamard quadratic
    form's conditioning; prefer compute_sobol_oak sums for pathological
    (near-noiseless, unbounded) fits. ``mesh`` shards the [N, N] L matrices
    over the data axis (see compute_sobol_oak)."""
    model = resolve_latent(model, latent)
    _check_measure_override(model.kernel, delta, mu)
    depth = _check_depth_override(model.kernel, max_depth)
    return np.asarray(_sobol_by_order_jit(model, depth, mesh))


def _prediction_component_impl(model, X, depth: int, mesh=None) -> jnp.ndarray:
    from .kernels.oak_kernel import kernel_K

    oak: OAKKernel = model.kernel
    Xc = jnp.asarray(_model_X(model))
    a = model.posterior_alpha()[:, 0]
    tuples = component_index_tuples(oak.num_dims, depth)[1:]

    grams = [None] * len(oak.kernels)
    for gidx in _stackable_groups(oak.kernels):
        if len(gidx) == 1:
            i = gidx[0]
            k = oak.kernels[i]
            grams[i] = kernel_K(k, X[:, k.active_dim], Xc[:, k.active_dim])
            continue
        c1 = jnp.stack([X[:, oak.kernels[i].active_dim] for i in gidx])
        c2 = jnp.stack([Xc[:, oak.kernels[i].active_dim] for i in gidx])
        kk = _stack_group(oak.kernels, gidx)
        res = jax.vmap(kernel_K)(kk, c1, c2)
        for j, i in enumerate(gidx):
            grams[i] = res[j]
    grams.append(jnp.ones_like(grams[0]))
    # mesh: shard the prediction-rows axis — each component mean's rows are
    # independent, so there is no cross-device communication at all
    G = _shard_hint(jnp.stack(grams, axis=0), mesh, (None, 0, None))

    D = oak.num_dims
    P = max(len(t) for t in tuples)
    idx = np.full((len(tuples), P), D, dtype=np.int32)
    for i, t in enumerate(tuples):
        idx[i, : len(t)] = t
    orders = jnp.asarray([len(t) for t in tuples], jnp.int32)
    if oak.share_var_across_orders:
        vs = jnp.stack([v.value.reshape(()) for v in oak.variances]).astype(G.dtype)
        scales = vs[orders]
    else:
        scales = jnp.ones(orders.shape, G.dtype)

    def one(args):
        c_idx, scale = args
        Kc = G[c_idx[0]]
        for j in range(1, P):
            Kc = Kc * G[c_idx[j]]
        # HIGH precision: the per-component means must sum to the fused
        # predictive mean; at TPU-default single-pass bf16 this matvec
        # carries ~1% relative error per component and the identity broke
        # by 11% of the cancellation mass on the sharp depth-8 pumadyn fit
        # (round 5) — prediction/interpretability paths run at HIGH while
        # training stays at the benchmarked DEFAULT
        return scale * jnp.matmul(Kc, a, precision=jax.lax.Precision.HIGH)

    # vmapped in chunks (lax.map batch_size) instead of a sequential scan:
    # each chunk materializes a [B, N, M] product buffer, so pick B from it
    nm = G.shape[1] * G.shape[2]
    B = max(1, min(len(tuples), int(2 ** 27 // max(nm, 1)) or 1))
    return jax.lax.map(one, (jnp.asarray(idx), scales), batch_size=B)


_prediction_component_jit = jax.jit(_prediction_component_impl,
                                    static_argnums=(2, 3))


def get_prediction_component(model, alpha=None, X=None,
                             max_interaction_depth: Optional[int] = None,
                             latent: Optional[int] = None,
                             mesh=None) -> np.ndarray:
    """Per-component predictive means, [C, N] in the reference's component
    order (utils.py:491-530). Sums (plus the constant term) to the full
    predictive mean. ``alpha`` is accepted for reference API compat but is
    recomputed from the model posterior. ``latent`` selects one
    latent/output of a multi-latent model. ``mesh`` shards the prediction
    rows over its devices (communication-free)."""
    oak: OAKKernel = model.kernel
    model = resolve_latent(model, latent)
    if X is None:
        X = model.data[0]
    depth = _check_depth_override(oak, max_interaction_depth)
    return np.asarray(_prediction_component_jit(model, jnp.asarray(X), depth,
                                                mesh))


def normalize_sobol(sobol: np.ndarray, likelihood_variance: Optional[float] = None
                    ) -> np.ndarray:
    """model_utils.py:516-522 — with a guard the reference lacks: a model in
    the all-noise optimum (every order variance 0) has zero total component
    variance, and 0/0 would propagate NaN into every downstream ranking;
    return exact zeros instead."""
    import warnings

    sobol = np.asarray(sobol)
    denom = np.sum(sobol) + (likelihood_variance or 0.0)
    if not np.isfinite(denom) or denom <= 0.0:
        warnings.warn(
            "total Sobol variance is zero or non-finite (degenerate all-noise "
            "fit?); returning zeros", RuntimeWarning)
        return np.zeros_like(sobol)
    return sobol / denom
