"""Parallel multi-start hyperparameter optimization (vmapped L-BFGS).

The reference escapes bad optima by hand: you rerun the script with another
seed. Round 2 added *sequential* jittered restarts when a fit lands in the
all-noise attractor created by the Gamma(1, 0.2) sparsity prior
(/root/reference/oak/model_utils.py:161-165). This module is the TPU-native
form of that idea: K jittered initializations are optimized *simultaneously*
— the Adam warmup as one batched `lax.scan`, the L-BFGS refinement as one
batched `lax.while_loop` — so every per-iteration Gram build / Cholesky runs
as a single batched XLA program on the chip instead of K host-sequential
fits. On a multi-chip mesh the starts axis shards across devices
(embarrassingly parallel — each chip optimizes its own restart; the only
collective is the final argmin on the host).

vmap-over-while_loop semantics: JAX batches the loop by running the body
while ANY lane is still active and masking finished lanes' carries, so the
wall-clock is the slowest restart, not the sum.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..params import flatten_trainable
from .fit import FitResult


def _make_starts(vec0, n_starts: int, jitter: float, seed: int,
                 include_init: bool) -> jnp.ndarray:
    rng = np.random.default_rng(seed)
    v0 = np.asarray(vec0)
    starts = v0[None, :] + jitter * rng.standard_normal(
        (n_starts, v0.shape[0])).astype(v0.dtype)
    if include_init and n_starts > 0:
        starts[0] = v0
    return jnp.asarray(starts, vec0.dtype)


def fit_lbfgs_multistart(model, loss_fn: Callable, n_starts: int = 4,
                         jitter: float = 0.3, seed: int = 0,
                         max_iters: int = 500, tol: float = 1e-8,
                         memory_size: int = 30, warm_adam_steps: int = 0,
                         warm_lr: float = 2e-2, include_init: bool = True,
                         accept_fn: Optional[Callable] = None,
                         mesh=None) -> FitResult:
    """Optimize ``loss_fn(model)`` from ``n_starts`` jittered initializations
    in parallel; return the best accepted restart.

    - ``warm_adam_steps``: batched Adam warmup before L-BFGS (the SVGP path
      needs it to move q(u) off the cold start where zoom linesearch stalls).
    - ``accept_fn(model) -> bool``: host-side filter (e.g. "not the all-noise
      degenerate optimum"); the best *accepted* restart wins, falling back to
      the best overall if none is accepted.
    - ``mesh``: optional ``jax.sharding.Mesh`` whose first axis the starts
      dimension is sharded over (params-per-start are tiny; each device runs
      its own restarts). ``n_starts`` must then be divisible by the mesh size.

    The per-start final losses are exposed on ``FitResult.message``.
    """
    vec0, unflatten = flatten_trainable(model)
    starts = _make_starts(vec0, n_starts, jitter, seed, include_init)

    def loss_vec(vec):
        return loss_fn(unflatten(vec))

    # ---- batched Adam warmup: one scan, all starts ----
    def warm(starts):
        opt = optax.adam(warm_lr)

        def one_step(carry, _):
            vec, st = carry
            g = jax.vmap(jax.grad(loss_vec))(vec)
            g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
            up, st = opt.update(g, st)
            return (optax.apply_updates(vec, up), st), None

        st0 = opt.init(starts)
        (vec, _), _ = jax.lax.scan(one_step, (starts, st0), None,
                                   length=warm_adam_steps)
        return vec

    # ---- batched L-BFGS: vmap of the SAME while_loop fit_lbfgs runs
    # (optim/fit.py::lbfgs_loop — one definition, one convergence policy) ----
    from .fit import lbfgs_loop

    loop = lbfgs_loop(loss_vec, max_iters, tol, memory_size)

    def run_one(vec):
        v, value, grad, it = loop(vec)
        # a restart that diverged reports inf so argmin never selects it
        value = jnp.where(jnp.isfinite(value), value, jnp.inf)
        return v, value, jnp.sqrt(jnp.sum(grad * grad)), it

    def pipeline(starts):
        vec = warm(starts) if warm_adam_steps > 0 else starts
        return jax.vmap(run_one)(vec)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(np.prod(list(mesh.shape.values())))
        if n_starts % n_dev:
            raise ValueError(f"n_starts={n_starts} must be divisible by the "
                             f"mesh size {n_dev}")
        axis = list(mesh.shape.keys())[0]
        shard = NamedSharding(mesh, P(axis))
        starts = jax.device_put(starts, shard)
        run = jax.jit(pipeline,
                      in_shardings=(shard,),
                      out_shardings=(shard, shard, shard, shard))
    else:
        run = jax.jit(pipeline)

    vecs, values, gnorms, iters = jax.device_get(run(starts))

    if not np.isfinite(values).any():
        # every restart diverged (e.g. Cholesky failure on all lanes):
        # return the caller's model untouched rather than NaN parameters
        return FitResult(model=model, fun=float("inf"), num_iters=0,
                         success=False,
                         message=f"all {n_starts} parallel restarts diverged")

    order = np.argsort(values, kind="stable")
    best = int(order[0])
    if accept_fn is not None:
        for i in order:
            if not np.isfinite(values[i]):
                break
            if accept_fn(unflatten(jnp.asarray(vecs[i], vec0.dtype))):
                best = int(i)
                break

    fitted = unflatten(jnp.asarray(vecs[best], vec0.dtype))
    gnorm = float(gnorms[best])
    converged = bool(np.isfinite(values[best])) and gnorm <= tol
    msg = (f"best of {n_starts} parallel restarts (losses: "
           + ", ".join(f"{v:.4g}" for v in np.asarray(values)) + ")")
    return FitResult(model=fitted, fun=float(values[best]),
                     num_iters=int(iters[best]), success=converged,
                     message=msg, grad_norm=gnorm)
