"""Fused Pallas TPU kernel for the OAK gram matrix (mixed-type models).

The OAK hot loop (SURVEY §3.2) evaluates, for inputs X [N, D], X2 [M, D]:

    K = sum_n sigma^2_n e_n(g_1, ..., g_D)
    g_d = b_d exp(-(x_d - x'_d)^2 / (2 l_d^2)) - cov_d(x) cov_d(x') / var_s_d

The XLA version materializes D per-dim [N, M] grams plus P power sums in HBM.
This kernel fuses everything: per (TN, TM) output tile it reads only the
[D, TN] / [D, TM] slivers of the (prescaled) inputs, accumulates the P power
sums in VMEM, runs the Newton-Girard recursion in-register, and writes the
single output tile — HBM traffic is O(N*D + M*D + N*M) instead of
O(P*N*M + D*N*M).

Inputs are *prescaled* so the kernel body is three ALU ops + one exp per
(element, dim) — the measured forward floor is ALU-bound, so every folded
constant shows up in the step time:
    u = x / (l sqrt(2))       (folds the -1/2: the exponent is -(u - u')^2)
    logb = log(b)             (folds the base variance INTO the exponent:
                               b exp(x) = exp(x + logb), one FMA + exp)
    c~ = cov(x) / sqrt(var_s) (so the downdate is one more FMA: g = E - c~ c~')

Differentiation: gradients flow through a custom VJP whose residual policy
is selectable (see RESIDUAL below); the default saves only the prescaled
inputs and recomputes the per-dim grams in the backward.

STATUS (settled round 4 with RTT-free measurements; `bench.py --roofline`):
the XLA-generated forward under the recompute custom VJP is the production
path. It runs at the VPU's serialized op-count floor — 0.40-0.46 ms vs a
~0.43 ms floor from the measured ceilings (exp ~1.25 T/s -> 0.11 ms for the
134M exps, plus ~10 ALU ops/element at ~4.2 TFLOP/s -> 0.32 ms; the op is
ALU-bound around its exps, not transcendental-bound). Neither the
handwritten Pallas kernels below nor residual storage can materially beat
it — both were built, tested, and measured slower (Pallas fwd +0.7 ms vs
XLA; stored-gram backwards +0.9/+2.5 ms vs recompute). They are retained as
regression insurance and as the measured record.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.newton_girard import newton_girard

TILE_N = 256
TILE_M = 256


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# --------------------------------------------------------------------------- #
# Kernel body
# --------------------------------------------------------------------------- #
def _gram_kernel(sig_ref, logb_ref, u1_ref, u2_ref, c1_ref, c2_ref, *rest,
                 depth: int, num_dims: int, num_extra: int):
    """rest = (extra_ref, out_ref) when num_extra > 0 else (out_ref,).
    ``extra_ref`` carries precomputed [E, TN, TM] gram tiles for dims whose
    1-D kernel is not an RBF form (binary / categorical lookups) — they join
    the power-sum accumulation so the Newton-Girard combination still fuses
    into one pass (reference hot loop oak_kernel.py:251-278)."""
    if num_extra:
        extra_ref, out_ref = rest
    else:
        (out_ref,) = rest
    P = depth
    s = [None] * P

    def accumulate(g):
        gp = g
        for p in range(P):
            s[p] = gp if s[p] is None else s[p] + gp
            if p + 1 < P:
                gp = gp * g

    for d in range(num_dims):
        du = u1_ref[d, :][:, None] - u2_ref[d, :][None, :]
        g = jnp.exp(logb_ref[0, d] - du * du) \
            - c1_ref[d, :][:, None] * c2_ref[d, :][None, :]
        accumulate(g)
    for e in range(num_extra):
        accumulate(extra_ref[e, :, :])

    ones = jnp.ones_like(out_ref[:])
    acc = sig_ref[0, 0] * ones
    e = [ones]
    for n in range(1, P + 1):
        term = None
        for k in range(1, n + 1):
            t = e[n - k] * s[k - 1] if n - k > 0 else s[k - 1]
            t = t if k % 2 == 1 else -t
            term = t if term is None else term + t
        en = term / n
        e.append(en)
        acc = acc + sig_ref[0, n] * en
    out_ref[:] = acc


def _pallas_gram(u1, u2, c1, c2, extra, logb, sig2, depth: int) -> jnp.ndarray:
    """u1/c1: [D, Np]; u2/c2: [D, Mp]; extra: [E, Np, Mp] precomputed grams
    for non-RBF dims (E may be 0); logb: [1, D]; sig2: [1, P+1].
    Np, Mp must be multiples of the tile sizes. Returns [Np, Mp] f32."""
    D, Np = u1.shape
    Mp = u2.shape[1]
    E = extra.shape[0]
    grid = (Np // TILE_N, Mp // TILE_M)
    kernel = functools.partial(_gram_kernel, depth=depth, num_dims=D,
                               num_extra=E)
    in_specs = [
        pl.BlockSpec((1, depth + 1), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, D), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((D, TILE_N), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((D, TILE_M), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((D, TILE_N), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((D, TILE_M), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [sig2, logb, u1, u2, c1, c2]
    if E:
        in_specs.append(pl.BlockSpec((E, TILE_N, TILE_M),
                                     lambda i, j: (0, i, j),
                                     memory_space=pltpu.VMEM))
        operands.append(extra)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, Mp), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(grid[0]) * int(grid[1]) * TILE_N * TILE_M
            * (6 * D + 3 * E + 3 * depth * depth),
            bytes_accessed=4 * (Np * D * 2 + Mp * D * 2 + (E + 1) * Np * Mp),
            transcendentals=Np * Mp * D,
        ),
    )(*operands)


# --------------------------------------------------------------------------- #
# Backward kernel
# --------------------------------------------------------------------------- #
def _gram_bwd_kernel(sig_ref, logb_ref, u1_ref, u2_ref, c1_ref, c2_ref, gbar_ref,
                     du1_ref, dc1_ref, du2p_ref, dc2p_ref, dbp_ref, ds2p_ref,
                     *, depth: int, num_dims: int):
    """Per (i, j) tile: recompute the per-dim grams ONCE (kept live in VMEM —
    pass 2 recovers bE = g + c1 c2 algebraically, no second exp sweep),
    form the cotangents of every prescaled input via the elementary-symmetric
    downdate recursion h_k^{(-d)} = e_k - g_d h_{k-1}^{(-d)} (so dOut/dg_d =
    sum_n s2_n h_{n-1}), and accumulate: du1/dc1 in-place across the (fast)
    j grid dim; du2/dc2/db/ds2 into per-i partials summed in XLA afterwards."""
    P = depth
    j = pl.program_id(1)
    gbar = gbar_ref[:]

    # du1/dc1/db/ds2 blocks are revisited across the fast j dim -> accumulate
    # after zero-init; du2p/dc2p blocks are visited exactly once per (i, j)
    # -> plain writes below.
    @pl.when(j == 0)
    def _init():
        du1_ref[:] = jnp.zeros_like(du1_ref)
        dc1_ref[:] = jnp.zeros_like(dc1_ref)
        dbp_ref[:] = jnp.zeros_like(dbp_ref)
        ds2p_ref[:] = jnp.zeros_like(ds2p_ref)

    # pass 1: per-dim grams (kept) + power sums -> e_0..e_P
    gs = []
    s = [None] * P
    for d in range(num_dims):
        du = u1_ref[d, :][:, None] - u2_ref[d, :][None, :]
        g = jnp.exp(logb_ref[0, d] - du * du) \
            - c1_ref[d, :][:, None] * c2_ref[d, :][None, :]
        gs.append(g)
        gp = g
        for p in range(P):
            s[p] = gp if s[p] is None else s[p] + gp
            if p + 1 < P:
                gp = gp * g
    ones = jnp.ones_like(gbar)
    e = [ones]
    for n in range(1, P + 1):
        term = None
        for k in range(1, n + 1):
            t = e[n - k] * s[k - 1] if n - k > 0 else s[k - 1]
            t = t if k % 2 == 1 else -t
            term = t if term is None else term + t
        e.append(term / n)

    # ds2[n] = sum_ij gbar * e_n  (single vector store: Mosaic cannot store
    # scalars to VMEM)
    ds2_vals = [jnp.sum(gbar * e[n]) for n in range(P + 1)]
    ds2p_ref[0, 0, :] += jnp.stack(ds2_vals)

    # pass 2: per-dim cotangents (no exp: E recovered from the stored gram)
    db_vals = []
    for d in range(num_dims):
        u1d = u1_ref[d, :][:, None]
        u2d = u2_ref[d, :][None, :]
        c1d = c1_ref[d, :][:, None]
        c2d = c2_ref[d, :][None, :]
        du = u1d - u2d
        g = gs[d]
        bE = g + c1d * c2d

        # W = sum_{n>=1} s2_n e_{n-1}^{(-d)} via the downdate recursion
        h = ones
        W = sig_ref[0, 1] * ones
        for k in range(1, P):
            h = e[k] - g * h
            W = W + sig_ref[0, k + 1] * h
        T = gbar * W

        # d g/d u1 = bE * (-2 du): the exponent is -(u - u')^2 (the 1/2 is
        # folded into the prescale), so the chain factor is 2du, not du
        TbE = T * bE
        du1_ref[d, :] += -2.0 * jnp.sum(TbE * du, axis=1)
        du2p_ref[0, d, :] = 2.0 * jnp.sum(TbE * du, axis=0)
        dc1_ref[d, :] += -jnp.sum(T * c2d, axis=1)
        dc2p_ref[0, d, :] = -jnp.sum(T * c1d, axis=0)
        # cotangent wrt logb (d g/d logb = bE) — no division
        db_vals.append(jnp.sum(T * bE))
    dbp_ref[0, 0, :] += jnp.stack(db_vals)


# backward tiles are smaller: the kernel keeps all D per-dim gram tiles live
# in VMEM (D * TILE^2 * 4B; 2 MB at D=32, 128x128)
BWD_TILE_N = 128
BWD_TILE_M = 128


def _pallas_gram_bwd(u1, u2, c1, c2, logb, sig2, gbar, depth: int):
    D, Np = u1.shape
    Mp = u2.shape[1]
    TILE_N, TILE_M = BWD_TILE_N, BWD_TILE_M  # noqa: N806 (shadow fwd tiles)
    gi, gj = Np // TILE_N, Mp // TILE_M
    kernel = functools.partial(_gram_bwd_kernel, depth=depth, num_dims=D)
    out_shapes = (
        jax.ShapeDtypeStruct((D, Np), jnp.float32),        # du1
        jax.ShapeDtypeStruct((D, Np), jnp.float32),        # dc1
        jax.ShapeDtypeStruct((gi, D, Mp), jnp.float32),    # du2 partials
        jax.ShapeDtypeStruct((gi, D, Mp), jnp.float32),    # dc2 partials
        jax.ShapeDtypeStruct((gi, 1, D), jnp.float32),     # db partials
        jax.ShapeDtypeStruct((gi, 1, depth + 1), jnp.float32),  # ds2 partials
    )
    du1, dc1, du2p, dc2p, dbp, ds2p = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pl.GridSpec(
            grid=(gi, gj),
            in_specs=[
                pl.BlockSpec((1, depth + 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, D), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((D, TILE_N), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, TILE_M), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, TILE_N), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, TILE_M), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((D, TILE_N), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, TILE_N), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, TILE_M), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, TILE_M), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, D), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, depth + 1), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
    )(sig2, logb, u1, u2, c1, c2, gbar)
    du2 = jnp.sum(du2p, axis=0)
    dc2 = jnp.sum(dc2p, axis=0)
    db = jnp.sum(dbp, axis=(0, 1))[None, :]
    ds2 = jnp.sum(ds2p, axis=(0, 1))[None, :]
    return du1, du2, dc1, dc2, db, ds2


# --------------------------------------------------------------------------- #
# Prep + XLA reference + custom VJP wrapper
# --------------------------------------------------------------------------- #
def _prep(oak, X, X2):
    """Prescaled kernel inputs from an OAKKernel.

    Every RBF-form dim (OrthogonalRBF against ANY measure, or the
    unconstrained plain RBF) reduces to the same three-op kernel-body shape
    g = exp(logb - (u - u')^2) - c c' (see the module docstring's folding) —
    the measure only changes the prescaled downdate vector
    c = cov_X_s(x)/sqrt(var_s), computed here in XLA with the per-measure
    closed forms (ortho_rbf.cov_x_s/var_s; reference
    ortho_rbf_kernel.py:47-152). The unconstrained variant is c = 0. Non-RBF
    dims (binary/categorical table lookups) are evaluated in XLA and
    returned as ``extras`` [E, N, M] gram slices streamed into the fused
    kernel's power-sum accumulation.
    """
    from ..kernels import ortho_rbf
    from ..kernels.oak_kernel import UnconstrainedRBF, kernel_K
    from ..kernels.ortho_rbf import OrthogonalRBF

    dtype = jnp.float32
    sqrt2 = 1.4142135623730951  # python float: weak-typed, keeps f32
    us1, us2, cs1, cs2, logbs, extras = [], [], [], [], [], []
    for k in oak.kernels:
        col1 = X[:, k.active_dim].astype(dtype)
        col2 = X2[:, k.active_dim].astype(dtype)
        if isinstance(k, (OrthogonalRBF, UnconstrainedRBF)):
            ls2 = k.lengthscale.value.astype(dtype) * sqrt2
            us1.append(col1 / ls2)
            us2.append(col2 / ls2)
            if isinstance(k, OrthogonalRBF):
                # floored like the analytic path (ortho_rbf._var_s_floored,
                # incl. the sqrt(tiny)-not-tiny VJP rationale): with a
                # pruned variance, cov and var_s both underflow to 0 and
                # rsqrt(0) = inf would make the downdate 0 * inf = NaN
                rs = jax.lax.rsqrt(jnp.maximum(
                    ortho_rbf.var_s(k).astype(dtype), 1.0842022e-19))
                cs1.append(ortho_rbf.cov_x_s(k, col1).astype(dtype) * rs)
                cs2.append(ortho_rbf.cov_x_s(k, col2).astype(dtype) * rs)
            else:
                cs1.append(jnp.zeros_like(col1))
                cs2.append(jnp.zeros_like(col2))
            # floor at the smallest f32 normal: a sparsity-pruned variance
            # whose softplus underflows to exactly 0 would give
            # logb = -inf, and the backward's (1/variance) chain factor
            # would turn the (zero) logb-cotangent into 0 * inf = NaN —
            # poisoning the whole gradient. With the floor the clamped
            # branch has zero derivative, so the pruned dim's gradient is
            # exactly 0 (matching its already-underflowed softplus slope).
            v = k.variance.value.reshape(()).astype(dtype)
            logbs.append(jnp.log(jnp.maximum(v, 1.1754944e-38)))
        else:
            extras.append(kernel_K(k, col1, col2).astype(dtype))

    if us1:
        u1, u2 = jnp.stack(us1), jnp.stack(us2)
        c1, c2 = jnp.stack(cs1), jnp.stack(cs2)
        logb = jnp.stack(logbs)
    else:
        u1 = jnp.zeros((0, X.shape[0]), dtype)
        u2 = jnp.zeros((0, X2.shape[0]), dtype)
        c1, c2, logb = u1, u2, jnp.zeros((0,), dtype)
    extra = (jnp.stack(extras) if extras
             else jnp.zeros((0, X.shape[0], X2.shape[0]), dtype))

    if oak.share_var_across_orders:
        sig2 = jnp.stack([v.value.reshape(()) for v in oak.variances]).astype(dtype)
    else:
        sig2 = jnp.concatenate([
            oak.variances[0].value.reshape(1).astype(dtype),
            jnp.ones((oak.max_interaction_depth,), dtype),
        ])
    return u1, u2, c1, c2, extra, logb, sig2


def _xla_gram_from_prep(u1, u2, c1, c2, extra, logb, sig2, depth: int) -> jnp.ndarray:
    """Straight-XLA reference of the same computation (backward + fallback)."""
    grams = []
    for d in range(u1.shape[0]):
        du = u1[d, :, None] - u2[d, None, :]
        grams.append(jnp.exp(logb[0, d] - du * du)
                     - c1[d, :, None] * c2[d, None, :])
    for e_ in range(extra.shape[0]):
        grams.append(extra[e_])
    e = newton_girard(grams, depth)
    out = sig2[0, 0] * e[0]
    for n in range(1, depth + 1):
        out = out + sig2[0, n] * e[n]
    return out


def _xla_gram_and_gs(u1, u2, c1, c2, extra, logb, sig2, depth: int,
                     res_dtype=jnp.float32):
    """Forward that also returns the stacked per-dim grams [D+E, N, M]
    (RBF dims first, then the extra/discrete grams) — the residual for the
    store-grams backward below. Each gram is cast to ``res_dtype`` BEFORE
    stacking so the downcast fuses into the per-dim producer (stacking f32
    then converting would write the full f32 stack to HBM first — an extra
    512 MB of traffic at the headline shape)."""
    grams = []
    for d in range(u1.shape[0]):
        du = u1[d, :, None] - u2[d, None, :]
        grams.append(jnp.exp(logb[0, d] - du * du)
                     - c1[d, :, None] * c2[d, None, :])
    for e_ in range(extra.shape[0]):
        grams.append(extra[e_])
    e = newton_girard(grams, depth)
    out = sig2[0, 0] * e[0]
    for n in range(1, depth + 1):
        out = out + sig2[0, n] * e[n]
    return out, jnp.stack([g.astype(res_dtype) for g in grams])


def _res_bwd(depth, res, gbar):
    """Algebraic backward from STORED per-dim grams — no second exp sweep.

    Per-dim cotangents use the elementary-symmetric downdate recursion
    h_k^{(-d)} = e_k - g_d h_{k-1}^{(-d)}, dOut/dg_d = sum_n sig_n h_{n-1};
    the exp factor is recovered as bE = g + c1 c2 (never recomputed).
    Covers extra (binary/categorical) dims too: their cotangent is just
    gbar * W. Written as a per-dim Python loop (not a stacked [D,N,M]
    tensor program) so XLA fuses each dim's T into its own reductions
    instead of materializing a 512 MB T stack.

    MEASURED OUTCOME (see the RESIDUAL selector note below): this path is
    correct and covers all dim types, but on v5e it LOSES to the recompute
    backward — the stored stack's HBM round-trips exceed the exp re-sweep
    cost it avoids. Kept as the measured record; not the default."""
    u1, u2, c1, c2, extra, logb, sig2, gs_lo = res
    P = depth
    D = u1.shape[0]
    E = extra.shape[0]
    gs = [gs_lo[i].astype(jnp.float32) for i in range(D + E)]

    e = newton_girard(gs, P)
    ones = e[0]
    ds2 = jnp.stack([jnp.sum(gbar * e[n]) for n in range(P + 1)])[None, :]

    def dim_W(g):
        h = ones
        W = sig2[0, 1] * ones
        for k in range(1, P):
            h = e[k] - g * h
            W = W + sig2[0, k + 1] * h
        return gbar * W

    du1_rows, du2_rows, dc1_rows, dc2_rows, db_vals = [], [], [], [], []
    for d in range(D):
        g = gs[d]
        T = dim_W(g)
        du = u1[d, :, None] - u2[d, None, :]
        bE = g + c1[d, :, None] * c2[d, None, :]
        # d g/d u1 = bE * (-2 du) (exponent is -(u-u')^2, the 1/2 is folded
        # into the prescale); d g/d logb = bE — no division
        TbE = T * bE
        du1_rows.append(-2.0 * (TbE * du).sum(1))
        du2_rows.append(2.0 * (TbE * du).sum(0))
        dc1_rows.append(-(T * c2[d, None, :]).sum(1))
        dc2_rows.append(-(T * c1[d, :, None]).sum(0))
        db_vals.append(TbE.sum())
    if E:
        dextra = jnp.stack([dim_W(gs[D + j]) for j in range(E)])
    else:
        dextra = jnp.zeros_like(extra)

    return (jnp.stack(du1_rows), jnp.stack(du2_rows),
            jnp.stack(dc1_rows), jnp.stack(dc2_rows), dextra,
            jnp.stack(db_vals)[None, :], ds2)


def _make_res_op(res_dtype):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
    def op(u1, u2, c1, c2, extra, logb, sig2, depth):
        return _xla_gram_from_prep(u1, u2, c1, c2, extra, logb, sig2, depth)

    def fwd(u1, u2, c1, c2, extra, logb, sig2, depth):
        out, gs = _xla_gram_and_gs(u1, u2, c1, c2, extra, logb, sig2, depth,
                                   res_dtype)
        # the barrier stops XLA's algebraic simplifier from eliding the
        # f32->bf16->f32 convert round-trip across the fwd/bwd boundary
        # (measured: without it the bf16 residual is silently kept f32 —
        # bit-identical gradients to the f32 policy)
        gs_lo = jax.lax.optimization_barrier(gs)
        return out, (u1, u2, c1, c2, extra, logb, sig2, gs_lo)

    def bwd(depth, res, g):
        return _res_bwd(depth, res, g)

    op.defvjp(fwd, bwd)
    return op


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _gram_op(u1, u2, c1, c2, extra, logb, sig2, depth):
    return _pallas_gram(u1, u2, c1, c2, extra, logb, sig2, depth)


def _gram_fwd(u1, u2, c1, c2, extra, logb, sig2, depth):
    return (_pallas_gram(u1, u2, c1, c2, extra, logb, sig2, depth),
            (u1, u2, c1, c2, extra, logb, sig2))


# Implementation selectors, measured on v5e at the pumadyn config
# (N=8192, M=512, D=32, P=3):
#
# FORWARD: "xla" (prescaled inputs -> XLA-fused per-dim loop) or "pallas"
# (the handwritten tiled kernel). Both run under the SAME custom VJP whose
# residuals are only the prescaled inputs (recompute backward) — that
# residual policy, not the kernel codegen, is the training win: without it
# XLA saves [D, N, M] per-dim grams for the backward. Step times: 3.98 ms
# (xla fwd + recompute vjp) vs 4.52 ms (pallas fwd) vs 4.72 ms (plain XLA
# autodiff, no custom vjp) — XLA fuses the per-dim loop better than the
# hand-tiled kernel, so "xla" is the default and Pallas stays available
# and tested for when XLA's fusion regresses.
#
# BACKWARD: "xla" (jax.vjp of the XLA reference, recompute) or "pallas"
# (the handwritten two-pass kernel above): 4.52 vs 5.93 ms/step — "xla".
#
# RESIDUAL: what the custom VJP saves for the backward.
#   "recompute" — only the prescaled inputs; the backward re-sweeps the exp.
#   "bf16"      — additionally store the [D+E, N, M] gram stack in bfloat16;
#                 the backward is the algebraic no-exp form below.
#   "f32"       — same with an f32 stack.
# MEASURED at the headline shape (N=8192, D=32, M=512, depth 3; RTT-free
# slope timing, `bench.py --roofline`): gram fwd+bwd = 1.92 ms recompute vs
# 2.86 ms bf16 vs 5.12 ms f32 — STORING LOSES on this chip: the stack's HBM
# round-trips (written once, re-read by the e-pass and the per-dim cotangent
# pass) cost more than the ~0.18 ms exp re-sweep they replace, and the bf16
# variant additionally perturbs gradients by the gram quantization
# (rel l2 ~5e-3). "recompute" is the default; the alternatives stay
# implemented and tested as the measured record of why.
FORWARD = "xla"
BACKWARD = "xla"
RESIDUAL = "recompute"

_gram_op_xla_res_bf16 = None
_gram_op_xla_res_f32 = None


def _res_op(kind):
    global _gram_op_xla_res_bf16, _gram_op_xla_res_f32
    if kind == "bf16":
        if _gram_op_xla_res_bf16 is None:
            _gram_op_xla_res_bf16 = _make_res_op(jnp.bfloat16)
        return _gram_op_xla_res_bf16
    if _gram_op_xla_res_f32 is None:
        _gram_op_xla_res_f32 = _make_res_op(jnp.float32)
    return _gram_op_xla_res_f32


def _gram_bwd(depth, res, g):
    u1, u2, c1, c2, extra, logb, sig2 = res
    # the handwritten Pallas backward covers the all-RBF case only; with
    # extra (discrete-dim) grams present the XLA recompute vjp handles
    # everything, including d/d extra
    if BACKWARD == "pallas" and extra.shape[0] == 0:
        du1, du2, dc1, dc2, db, ds2 = _pallas_gram_bwd(
            u1, u2, c1, c2, logb, sig2, g, depth)
        return du1, du2, dc1, dc2, jnp.zeros_like(extra), db, ds2
    _, vjp = jax.vjp(lambda *a: _xla_gram_from_prep(*a, depth), u1, u2, c1, c2,
                     extra, logb, sig2)
    return vjp(g)


_gram_op.defvjp(_gram_fwd, _gram_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _gram_op_xla(u1, u2, c1, c2, extra, logb, sig2, depth):
    """Same contract as _gram_op with the forward generated by XLA from the
    prescaled inputs — shares _gram_bwd's recompute backward."""
    return _xla_gram_from_prep(u1, u2, c1, c2, extra, logb, sig2, depth)


def _gram_xla_fwd(u1, u2, c1, c2, extra, logb, sig2, depth):
    return (_xla_gram_from_prep(u1, u2, c1, c2, extra, logb, sig2, depth),
            (u1, u2, c1, c2, extra, logb, sig2))


_gram_op_xla.defvjp(_gram_xla_fwd, _gram_bwd)


def supports_pallas(oak) -> bool:
    """Structure check: at least one RBF-form dim (any measure — Gaussian,
    uniform, empirical, MOG — or the unconstrained variant), and every
    remaining dim a binary/categorical kernel handled via the extra-grams
    input. All UCI regression AND classification/mixed configs qualify;
    only an all-discrete model falls back to the per-dim XLA path."""
    from ..kernels.oak_kernel import UnconstrainedRBF
    from ..kernels.ortho_binary import OrthogonalBinary
    from ..kernels.ortho_categorical import OrthogonalCategorical
    from ..kernels.ortho_rbf import OrthogonalRBF

    if not oak.kernels:
        return False
    n_rbf = sum(isinstance(k, (OrthogonalRBF, UnconstrainedRBF))
                for k in oak.kernels)
    known = all(isinstance(k, (OrthogonalRBF, UnconstrainedRBF,
                               OrthogonalBinary, OrthogonalCategorical))
                for k in oak.kernels)
    return known and n_rbf > 0


def oak_gram(oak, X: jnp.ndarray, X2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fused OAK gram (prescaled inputs + recompute custom VJP), with the
    forward generated per the FORWARD selector. Output dtype follows X."""
    X2_ = X if X2 is None else X2
    N, M = X.shape[0], X2_.shape[0]
    u1, u2, c1, c2, extra, logb, sig2 = _prep(oak, X, X2_)

    if FORWARD != "pallas":
        op = _gram_op_xla if RESIDUAL == "recompute" else _res_op(RESIDUAL)
        return op(u1, u2, c1, c2, extra, logb[None, :],
                  sig2[None, :],
                  oak.max_interaction_depth).astype(X.dtype)

    Np, Mp = _round_up(N, TILE_N), _round_up(M, TILE_M)
    u1 = jnp.pad(u1, ((0, 0), (0, Np - N)))
    c1 = jnp.pad(c1, ((0, 0), (0, Np - N)))
    u2 = jnp.pad(u2, ((0, 0), (0, Mp - M)))
    c2 = jnp.pad(c2, ((0, 0), (0, Mp - M)))
    extra = jnp.pad(extra, ((0, 0), (0, Np - N), (0, Mp - M)))

    out = _gram_op(u1, u2, c1, c2, extra, logb[None, :], sig2[None, :],
                   oak.max_interaction_depth)
    return out[:N, :M].astype(X.dtype)


def oak_gram_xla(oak, X: jnp.ndarray, X2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """The same computation without Pallas (testing / CPU fallback)."""
    X2_ = X if X2 is None else X2
    u1, u2, c1, c2, extra, logb, sig2 = _prep(oak, X, X2_)
    return _xla_gram_from_prep(u1, u2, c1, c2, extra, logb[None, :],
                               sig2[None, :],
                               oak.max_interaction_depth).astype(X.dtype)
