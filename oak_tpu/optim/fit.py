"""Hyperparameter optimization.

The reference trains everything with ``gpflow.optimizers.Scipy`` (BFGS on a TF
closure; /root/reference/oak/model_utils.py:419-425). TPU-native equivalents:

- ``fit_scipy``: scipy.optimize.minimize over the flat *trainable* raw vector,
  with a jitted JAX value_and_grad — bitwise-equivalent trajectory semantics
  to the reference's optimizer for parity runs (each iteration is one device
  call; fine at UCI scale).
- ``fit_lbfgs``: optax.lbfgs, fully on-device via ``lax.while_loop`` — no
  host round-trips; the TPU fast path.
- ``fit_adam``: optax.adam with optional minibatching via a data-index PRNG
  stream — the "ELBO steps/sec" benchmark path.

All operate on the flat trainable vector from ``params.flatten_trainable`` so
non-trainable Params (fixed inducing points, pinned base variances) are never
touched.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy import optimize as sciopt

from ..params import flatten_trainable


@dataclasses.dataclass
class FitResult:
    model: object
    fun: float
    num_iters: int
    success: bool
    message: str = ""
    grad_norm: Optional[float] = None


def _vector_loss(model, loss_fn: Callable):
    vec0, unflatten = flatten_trainable(model)

    def loss_vec(vec):
        return loss_fn(unflatten(vec))

    return vec0, unflatten, loss_vec


def fit_scipy(model, loss_fn: Callable, method: str = "BFGS",
              max_iters: int = 1000, tol: Optional[float] = None,
              jit: bool = True) -> FitResult:
    """Minimize loss_fn(model) over trainable params with scipy (host loop).

    ``jit=False`` evaluates the objective eagerly — the analogue of the
    reference's ``Scipy().minimize(..., compile=False)`` (its tf.function
    toggle, model_utils.py:419-425); useful when debugging a loss that
    misbehaves under tracing."""
    vec0, unflatten, loss_vec = _vector_loss(model, loss_fn)
    vg = jax.value_and_grad(loss_vec)
    if jit:
        vg = jax.jit(vg)

    def fun(x):
        v, g = vg(jnp.asarray(x, vec0.dtype))
        return float(v), np.asarray(g, np.float64)

    res = sciopt.minimize(fun, np.asarray(vec0, np.float64), jac=True,
                          method=method, tol=tol,
                          options={"maxiter": max_iters})
    fitted = unflatten(jnp.asarray(res.x, vec0.dtype))
    return FitResult(model=fitted, fun=float(res.fun),
                     num_iters=int(res.get("nit", -1)), success=bool(res.success),
                     message=str(res.message))


def lbfgs_parts(loss_vec: Callable, tol: float, memory_size: int = 30):
    """The L-BFGS while_loop shared by ``fit_lbfgs`` and the batched
    multistart (optim/multistart.py), decomposed so callers can run it in
    bounded chunks: returns ``(init, run_range, stats)`` with

    - ``init(vec) -> state``
    - ``run_range(vec, state, it, limit) -> (vec, state, it)`` — iterate
      while ``it < limit`` and not converged (``limit`` may be a traced
      scalar, so one compiled chunk serves every call)
    - ``stats(state) -> (value, grad)``

    One definition of the step/convergence logic so the single-start and
    batched optimizers cannot silently diverge."""
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(loss_vec)

    def step(carry):
        vec, state, it, limit = carry
        value, grad = value_and_grad(vec, state=state)
        updates, state = opt.update(grad, state, vec, value=value, grad=grad,
                                    value_fn=loss_vec)
        vec = optax.apply_updates(vec, updates)
        return vec, state, it + 1, limit

    def cond(carry):
        vec, state, it, limit = carry
        grad = optax.tree_utils.tree_get(state, "grad")
        gnorm = jnp.sqrt(jnp.sum(grad * grad))
        return jnp.logical_and(it < limit,
                               jnp.logical_or(it == 0, gnorm > tol))

    def run_range(vec, state, it, limit):
        vec, state, it, _ = jax.lax.while_loop(
            cond, step, (vec, state, jnp.asarray(it, jnp.int32),
                         jnp.asarray(limit, jnp.int32)))
        return vec, state, it

    def stats(state):
        return (optax.tree_utils.tree_get(state, "value"),
                optax.tree_utils.tree_get(state, "grad"))

    return opt.init, run_range, stats


def lbfgs_loop(loss_vec: Callable, max_iters: int, tol: float,
               memory_size: int = 30):
    """Single-program form of ``lbfgs_parts``: a traceable
    ``run(vec) -> (vec, value, grad, iters)``."""
    init, run_range, stats = lbfgs_parts(loss_vec, tol, memory_size)

    def run(vec):
        vec, state, it = run_range(vec, init(vec), 0, max_iters)
        value, grad = stats(state)
        return vec, value, grad, it

    return run


def fit_lbfgs(model, loss_fn: Callable, max_iters: int = 500,
              tol: float = 1e-8, memory_size: int = 30,
              checkpoint_path=None, checkpoint_every: int = 100,
              resume: bool = True) -> FitResult:
    """On-device L-BFGS with zoom linesearch; single jitted while_loop.

    With ``checkpoint_path`` set the run executes in bounded chunks of
    ``checkpoint_every`` iterations via ``lbfgs_parts`` and persists the full
    carry (vec, L-BFGS state incl. linesearch, iteration count) after every
    chunk — a killed multi-hour full-batch fit resumes to the SAME trajectory
    (the while_loop chunking is exact: the carry is the whole optimizer
    state). The reference has no training-state persistence at all
    (/root/reference/oak/model_utils.py:44-64 saves final hyperparameters
    only)."""
    vec0, unflatten, loss_vec = _vector_loss(model, loss_fn)

    if checkpoint_path is not None:
        init, run_range, stats = lbfgs_parts(loss_vec, tol, memory_size)
        run_chunk = jax.jit(run_range)
        vec, state, it = vec0, init(vec0), 0
        if resume and os.path.exists(checkpoint_path):
            vec, state, it = load_train_state(checkpoint_path, state,
                                              dtype=vec0.dtype)
        chunk = checkpoint_every if checkpoint_every > 0 else 100
        limit = it
        while limit < max_iters:
            limit = min(limit + chunk, max_iters)
            vec, state, it_arr = run_chunk(vec, state, it, limit)
            it = int(jax.device_get(it_arr))
            save_train_state(checkpoint_path, jax.device_get(vec),
                             jax.device_get(state), it)
            if it < limit:
                break  # converged inside the chunk; stays stopped
        value, grad = stats(state)
        iters = it
    else:
        run = jax.jit(lbfgs_loop(loss_vec, max_iters, tol, memory_size))
        vec, value, grad, iters = run(vec0)
    fitted = unflatten(vec)
    gnorm = float(jnp.sqrt(jnp.sum(grad * grad)))
    value = float(value)
    iters = int(iters)
    # The state's stored value can be STALE-finite when the trajectory
    # diverged (a NaN update direction poisons the params while the state
    # keeps the last linesearch-accepted value). Report the loss OF the
    # returned params so callers' accept/retry logic sees the truth.
    vec_h = np.asarray(jax.device_get(vec))
    if not np.isfinite(vec_h).all():
        value = float("inf")
    converged = gnorm <= tol
    msg = (f"gradient norm {gnorm:.3e} <= tol after {iters} iterations"
           if converged else
           f"stopped at max_iters={max_iters} with gradient norm {gnorm:.3e}")
    return FitResult(model=fitted, fun=float(value), num_iters=iters,
                     success=converged, message=msg, grad_norm=gnorm)


def fit_adam(model, loss_fn: Callable, steps: int = 1000, lr: float = 1e-2,
             batch_fn: Optional[Callable] = None) -> FitResult:
    """Adam over the trainable vector. If ``batch_fn(step) -> args`` is given,
    loss_fn is called as loss_fn(model, *args) per step (minibatch ELBO);
    otherwise loss_fn(model)."""
    vec0, unflatten, _ = _vector_loss(model, lambda m: 0.0)

    if batch_fn is None:
        opt = optax.adam(lr)

        def loss_at(vec):
            return loss_fn(unflatten(vec))

        vg = jax.value_and_grad(loss_at)

        @jax.jit
        def update(vec, opt_state):
            v, g = vg(vec)
            # drop non-finite steps (transient Cholesky failures at the
            # edge of the feasible region) instead of poisoning the state
            g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(vec, updates), opt_state, v

        opt_state = opt.init(vec0)
        vec = vec0
        # return the BEST-FINITE iterate, not the last: the masked-gradient
        # steps never check the loss and can wander into a non-finite-loss
        # region (see optim/multistart.py warm() — the same guard, batched);
        # `update` returns the loss at the PRE-update vec, so track that
        best_v, best_vec = float("inf"), vec0
        for _ in range(steps):
            new_vec, opt_state, v = update(vec, opt_state)
            v = float(v)
            if np.isfinite(v) and v < best_v:
                best_v, best_vec = v, vec
            vec = new_vec
        if steps > 0:
            v_last = float(jax.jit(loss_at)(vec))
            if np.isfinite(v_last) and v_last < best_v:
                best_v, best_vec = v_last, vec
        return FitResult(model=unflatten(best_vec), fun=best_v,
                         num_iters=steps, success=True)

    opt = optax.adam(lr)

    def loss_at(vec, *args):
        return loss_fn(unflatten(vec), *args)

    vg = jax.value_and_grad(loss_at)

    @jax.jit
    def update(vec, opt_state, *args):
        v, g = vg(vec, *args)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(vec, updates), opt_state, v

    opt_state = opt.init(vec0)
    vec = vec0
    v = jnp.inf
    for i in range(steps):
        vec, opt_state, v = update(vec, opt_state, *batch_fn(i))
    return FitResult(model=unflatten(vec), fun=float(v), num_iters=steps,
                     success=True)


def save_train_state(path, vec, opt_state, step: int) -> None:
    """Serialize a mid-training state (trainable vector + optimizer-state
    leaves + step counter) to one ``.npz``. The optimizer-state *structure*
    is not stored — ``load_train_state`` rebuilds it from a template, so the
    file stays a plain array archive (no pickled objects)."""
    leaves = jax.tree_util.tree_leaves(opt_state)
    arrays = {f"opt_{i}": np.asarray(a) for i, a in enumerate(leaves)}
    # atomic: a crash mid-write must not corrupt the only checkpoint (the
    # whole point of the file is surviving crashes); write through a file
    # object so np.savez cannot append ".npz" to the tmp name
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, vec=np.asarray(vec), step=np.asarray(step), **arrays)
    os.replace(tmp, path)


def load_train_state(path, template_opt_state, dtype=None):
    """Inverse of ``save_train_state``: returns (vec, opt_state, step), with
    ``opt_state`` rebuilt by unflattening the saved leaves into the
    template's tree structure."""
    with np.load(path) as f:
        vec = jnp.asarray(f["vec"], dtype)
        step = int(f["step"])
        leaves = [f[f"opt_{i}"] for i in range(len(f.files) - 2)]
    treedef = jax.tree_util.tree_structure(template_opt_state)
    tmpl_leaves = jax.tree_util.tree_leaves(template_opt_state)
    opt_state = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(s, t.dtype) for s, t in zip(leaves, tmpl_leaves)])
    return vec, opt_state, step


def fit_adam_scan(model, loss_fn: Callable, steps: int = 1000, lr: float = 1e-2,
                  batch_args=None, checkpoint_path=None,
                  checkpoint_every: int = 0, resume: bool = True) -> FitResult:
    """Device-resident Adam: the training loop runs as ``lax.scan`` under
    jit — a single dispatch instead of ``steps`` host round-trips (the per-step
    dispatch costs ~0.3-0.5 ms on the tunneled TPU; over a 2000-step run
    that's a full second of pure overhead ``fit_adam`` pays and this doesn't).

    ``batch_args``: optional tuple of arrays with leading dimension
    ``steps`` (e.g. a stacked minibatch-index array); step ``i`` calls
    ``loss_fn(model, *[a[i] for a in batch_args])``. With ``batch_args=None``
    the loss is full-batch: ``loss_fn(model)``. The update math is identical
    to ``fit_adam`` — same stream in, same trajectory out (tested).

    Mid-training checkpoint/resume (the reference has none — it only saves
    final hyperparameters, /root/reference/oak/model_utils.py:44-64): with
    ``checkpoint_path`` set, the run executes in chunks of
    ``checkpoint_every`` steps and writes (vec, optimizer state, step) after
    each chunk; if the file already exists and ``resume=True``, training
    continues from the recorded step toward the same ``steps`` total,
    consuming the identical remaining batch stream — the resumed trajectory
    is the uninterrupted one (tested)."""
    vec0, unflatten = flatten_trainable(model)
    opt = optax.adam(lr)

    def one_step(carry, xs):
        vec, opt_state = carry
        args = () if xs is None else xs
        v, g = jax.value_and_grad(
            lambda u: loss_fn(unflatten(u), *args))(vec)
        g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
        updates, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(vec, updates), opt_state), v

    vec, v, start, ran = scan_checkpoint_driver(
        one_step, opt.init, vec0, steps, batch_args,
        checkpoint_path, checkpoint_every, resume)
    if not ran:
        # checkpoint already covers the requested run: nothing to do, and
        # that is success, not a failed fit
        return FitResult(model=unflatten(vec), fun=float("nan"), num_iters=0,
                         success=True,
                         message=f"checkpoint at step {start} >= steps={steps};"
                                 " nothing to run")
    return FitResult(model=unflatten(vec), fun=float(v), num_iters=steps - start,
                     success=bool(np.isfinite(float(v))))


def scan_checkpoint_driver(one_step, opt_init, vec0, steps: int, batch_args,
                           checkpoint_path, checkpoint_every: int,
                           resume: bool):
    """Shared chunked ``lax.scan`` driver with mid-training checkpoint/resume
    (used by ``fit_adam_scan`` and ``natgrad.fit_natgrad_scan`` — one
    definition of the resume semantics). ``one_step((vec, opt_state), xs)``
    is the scan body. Returns ``(vec, last_loss, start, ran)``; ``ran`` is
    False when an existing checkpoint already covered ``steps``. Resuming
    consumes the identical remaining ``batch_args`` slice, so the resumed
    trajectory equals the uninterrupted one."""

    @partial(jax.jit, static_argnums=(3,))
    def run(vec, opt_state, args, length):
        (vec, opt_state), losses = jax.lax.scan(
            one_step, (vec, opt_state), args, length=length)
        return vec, opt_state, losses[-1] if length else jnp.asarray(jnp.inf)

    def slice_args(lo, hi):
        if batch_args is None:
            return None
        return tuple(a[lo:hi] for a in batch_args)

    vec, opt_state, start = vec0, opt_init(vec0), 0
    if checkpoint_path is not None and resume and os.path.exists(checkpoint_path):
        vec, opt_state, start = load_train_state(checkpoint_path, opt_state,
                                                 dtype=vec0.dtype)
    if start >= steps and start > 0:
        # a loaded checkpoint already covers the request (start == 0 means
        # nothing was loaded: a fresh steps=0 run falls through and reports
        # an unsuccessful inf-loss fit, as before)
        return vec, jnp.asarray(jnp.nan), start, False

    chunk = (checkpoint_every if (checkpoint_path is not None
                                  and checkpoint_every > 0) else steps - start)
    v = jnp.inf
    i = start
    while i < steps:
        n = min(chunk, steps - i)
        vec, opt_state, v = run(vec, opt_state, slice_args(i, i + n), n)
        i += n
        if checkpoint_path is not None:
            save_train_state(checkpoint_path, jax.device_get(vec),
                             jax.device_get(opt_state), i)
    return vec, v, start, True
