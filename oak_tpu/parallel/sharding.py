"""Multi-chip scaling via jax.sharding + jit.

The reference is single-process CPU (SURVEY §2.3: no distributed code at all),
so this layer is a TPU-native design obligation rather than a port. The OAK
workload's natural scaling axis is N (data): inducing points Z and all
hyperparameters are small and replicated, while Kuf construction and the
per-datapoint variational expectations shard over N. With parameters
replicated and the batch sharded, XLA inserts the psum over ICI for the
gradient all-reduce — no hand-written collectives needed (scaling-book
recipe: pick a mesh, annotate shardings, let XLA do the rest).

M-sharding (very large inducing sets) would shard Kuu block-rows and use a
distributed Cholesky; not warranted at the reference's scales (M <= 512) —
documented deliberately rather than invented (SURVEY §5).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import flatten_trainable

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, *arrays, axis: str = DATA_AXIS):
    """Place arrays with their leading (data) dimension sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    out = tuple(jax.device_put(jnp.asarray(a), sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def data_parallel_elbo_step(model, mesh: Mesh, learning_rate: float = 1e-2,
                            axis: str = DATA_AXIS):
    """Build a jitted data-parallel Adam step on the SVGP ELBO.

    Returns (step_fn, init_state): ``step_fn(vec, opt_state, X, Y)`` expects
    the flat trainable vector + optimizer state replicated and (X, Y) sharded
    over the data axis; it returns updated (vec, opt_state, loss). The
    gradient all-reduce over shards is inserted by XLA.
    """
    vec0, unflatten = flatten_trainable(model)
    opt = optax.adam(learning_rate)

    def loss_fn(vec, X, Y):
        m = unflatten(vec)
        return m.training_loss(X, Y)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    @partial(
        jax.jit,
        in_shardings=(repl, repl, shard, shard),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
    def step(vec, opt_state, X, Y):
        loss, grads = jax.value_and_grad(loss_fn)(vec, X, Y)
        updates, opt_state = opt.update(grads, opt_state)
        vec = optax.apply_updates(vec, updates)
        return vec, opt_state, loss

    vec0 = replicate(mesh, vec0)
    opt_state = replicate(mesh, opt.init(vec0))
    return step, (vec0, opt_state, unflatten)


def data_parallel_natgrad_step(model, mesh: Mesh, gamma: float = 0.2,
                               hyper_lr: float = 1e-2, axis: str = DATA_AXIS,
                               staggered: bool = False):
    """Data-parallel natural-gradient training step (natgrad on q(u) +
    Adam on the hyperparameters, optim/natgrad.py) with the batch sharded
    over the mesh's data axis and all parameters replicated — the same
    sharding contract as data_parallel_elbo_step. The update math is
    ``optim.natgrad.natgrad_adam_step`` — the single shared definition."""
    from ..optim.natgrad import natgrad_adam_step, warn_if_q_diag

    warn_if_q_diag(model)
    vec0, unflatten = flatten_trainable(model)
    opt = optax.adam(hyper_lr)

    def loss_fn(m, X, Y):
        return m.training_loss(X, Y)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    step = partial(
        jax.jit,
        in_shardings=(repl, repl, shard, shard),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )(natgrad_adam_step(opt, unflatten, loss_fn, gamma,
                        staggered=staggered))

    vec0 = replicate(mesh, vec0)
    opt_state = replicate(mesh, opt.init(vec0))
    return step, (vec0, opt_state, unflatten)


def fit_lbfgs_sharded(model, mesh: Mesh, X=None, Y=None,
                      max_iters: int = 500, tol: float = 1e-8,
                      memory_size: int = 30, axis: str = DATA_AXIS):
    """FULL-BATCH L-BFGS with the data axis sharded over the mesh — one
    large fit spread across chips, complementing the minibatch-DP path
    (data_parallel_elbo_step) and the restarts-sharded multistart.

    Params stay replicated; every loss/grad evaluation inside the on-device
    while_loop computes its [*, N] grams and data-sum terms shard-local and
    XLA inserts the psums. The data MUST enter the jitted program as
    arguments (not closure constants): jit hoists closed-over arrays as
    replicated constants, silently discarding their sharding — measured on
    the 8-device CPU mesh, the closure form compiles with zero sharding
    annotations. Hence this wrapper rather than
    ``fit_lbfgs(model_with_sharded_leaves, ...)``.

    SVGP: pass (X, Y) explicitly (same contract as training_loss).
    GPR/SGPR: data is taken from the model's own X/Y leaves; the unflatten
    template carries EMPTY [0, D] stand-ins so the real arrays are never
    baked into the executable as replicated constants. Note GPR's [N, N]
    Cholesky is inherently replicated (XLA all-gathers the sharded gram
    rows first) — the sharding pays off for the gram/data terms only;
    SVGP/SGPR shard end-to-end except the [M, M] factorizations.
    """
    from ..optim.fit import FitResult, lbfgs_loop

    is_external_data = X is not None
    if not is_external_data and not (hasattr(model, "X")
                                     and hasattr(model, "Y")):
        raise ValueError("model carries no data leaves; pass X= and Y= "
                         "explicitly (SVGP contract)")
    n_data = (jnp.asarray(X).shape[0] if is_external_data
              else model.X.shape[0])
    n_dev = mesh.shape[axis]
    if n_data % n_dev != 0:
        raise ValueError(f"N={n_data} must be divisible by the mesh's "
                         f"{n_dev} devices (same contract as the other "
                         "data-parallel paths); trim or pad the data")
    if is_external_data:
        Xs, Ys = shard_batch(mesh, X, Y, axis=axis)
        if Ys.ndim == 1:
            Ys = Ys[:, None]
        template = model
    else:
        Xs, Ys = shard_batch(mesh, model.X, model.Y, axis=axis)
        template = model.replace(
            X=jnp.zeros((0,) + model.X.shape[1:], model.X.dtype),
            Y=jnp.zeros((0,) + model.Y.shape[1:], model.Y.dtype))

    vec0, unflatten = flatten_trainable(template)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    @partial(jax.jit, in_shardings=(repl, shard, shard))
    def run(vec, Xd, Yd):
        def loss_vec(v):
            m = unflatten(v)
            if is_external_data:
                return m.training_loss(Xd, Yd)
            return m.replace(X=Xd, Y=Yd).training_loss()

        return lbfgs_loop(loss_vec, max_iters, tol, memory_size)(vec)

    vec, value, grad, iters = run(jax.device_put(vec0, repl), Xs, Ys)
    fitted = unflatten(jnp.asarray(jax.device_get(vec)))
    if not is_external_data:
        fitted = fitted.replace(X=model.X, Y=model.Y)
    gnorm = float(jnp.sqrt(jnp.sum(jnp.asarray(jax.device_get(grad)) ** 2)))
    iters = int(jax.device_get(iters))
    converged = gnorm <= tol
    msg = (f"gradient norm {gnorm:.3e} <= tol after {iters} iterations"
           if converged else
           f"stopped at max_iters={max_iters} with gradient norm {gnorm:.3e}")
    return FitResult(model=fitted, fun=float(jax.device_get(value)),
                     num_iters=iters, success=converged, message=msg,
                     grad_norm=gnorm)


RESTART_AXIS = "restart"


def fit_lbfgs_multistart_sharded(model, mesh: Mesh, X=None, Y=None,
                                 n_starts: int = 4, jitter: float = 0.3,
                                 seed: int = 0, max_iters: int = 500,
                                 tol: float = 1e-8, memory_size: int = 30,
                                 warm_adam_steps: int = 0,
                                 warm_lr: float = 2e-2,
                                 include_init: bool = True,
                                 accept_fn=None, chunk_iters=None,
                                 axis: str = DATA_AXIS):
    """Multistart L-BFGS on a 2-D mesh: the RESTARTS axis sharded over one
    mesh axis and each fit's DATA axis sharded over the other — composing
    the two previously mutually-exclusive parallel modes
    (``optim.fit_lbfgs_multistart(mesh=)`` restarts-only,
    ``fit_lbfgs_sharded`` data-only). For fits that are both multimodal
    (need K jittered starts, model.py's Gamma-prior trap) and too large for
    one chip's HBM.

    ``mesh`` must have exactly two axes, one named ``axis`` ("data"); the
    OTHER axis shards the restarts. Each [K/dev_r] lane group computes its
    shard-local [*, N/dev_d] grams; XLA inserts the data-axis psums inside
    every vmapped loss/grad evaluation and nothing couples the lanes (the
    final argmin is host-side). Same trajectory as the unsharded multistart
    up to reduction order (tested on the 8-device CPU mesh).

    Data follows the ``fit_lbfgs_sharded`` contract: SVGP passes (X, Y)
    explicitly; GPR/SGPR take data from their own leaves (unflattened
    through an EMPTY [0, D] template so the arrays enter the jitted
    programs as sharded *arguments*, never baked in as replicated
    constants). Checkpointing is not supported on this path — use the 1-D
    variants for resumable fits."""
    from ..optim.fit import FitResult, lbfgs_parts
    from ..optim.multistart import CHUNK_ITERS, _make_starts, _pick_best

    axes = list(mesh.shape.keys())
    if len(axes) != 2 or axis not in axes:
        raise ValueError(
            f"fit_lbfgs_multistart_sharded needs a 2-D mesh with a "
            f"'{axis}' axis plus a restarts axis (got axes {axes}); use "
            "optim.fit_lbfgs_multistart(mesh=) for restarts-only or "
            "fit_lbfgs_sharded for data-only sharding")
    restart_axis = axes[0] if axes[1] == axis else axes[1]
    n_lane_dev = mesh.shape[restart_axis]
    if n_starts % n_lane_dev:
        raise ValueError(f"n_starts={n_starts} must be divisible by the "
                         f"mesh's '{restart_axis}' axis size {n_lane_dev}")

    is_external_data = X is not None
    if not is_external_data and not (hasattr(model, "X")
                                     and hasattr(model, "Y")):
        raise ValueError("model carries no data leaves; pass X= and Y= "
                         "explicitly (SVGP contract)")
    n_data = (jnp.asarray(X).shape[0] if is_external_data
              else model.X.shape[0])
    if n_data % mesh.shape[axis]:
        raise ValueError(f"N={n_data} must be divisible by the mesh's "
                         f"'{axis}' axis size {mesh.shape[axis]}")

    if is_external_data:
        Xs, Ys = shard_batch(mesh, X, Y, axis=axis)
        if Ys.ndim == 1:
            Ys = Ys[:, None]
        template = model
    else:
        Xs, Ys = shard_batch(mesh, model.X, model.Y, axis=axis)
        template = model.replace(
            X=jnp.zeros((0,) + model.X.shape[1:], model.X.dtype),
            Y=jnp.zeros((0,) + model.Y.shape[1:], model.Y.dtype))

    vec0, unflatten = flatten_trainable(template)
    starts = jax.device_put(
        _make_starts(vec0, n_starts, jitter, seed, include_init),
        NamedSharding(mesh, P(restart_axis)))

    def make_loss(Xd, Yd):
        def loss_vec(v):
            m = unflatten(v)
            if is_external_data:
                return m.training_loss(Xd, Yd)
            return m.replace(X=Xd, Y=Yd).training_loss()
        return loss_vec

    @jax.jit
    def prepare(starts, Xd, Yd):
        loss_vec = make_loss(Xd, Yd)
        init, _, _ = lbfgs_parts(loss_vec, tol, memory_size)
        if warm_adam_steps > 0:
            wopt = optax.adam(warm_lr)

            def one_step(carry, _):
                vec, st = carry
                g = jax.vmap(jax.grad(loss_vec))(vec)
                g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
                up, st = wopt.update(g, st)
                return (optax.apply_updates(vec, up), st), None

            (starts, _), _ = jax.lax.scan(
                one_step, (starts, wopt.init(starts)), None,
                length=warm_adam_steps)
        return starts, jax.vmap(init)(starts), jnp.zeros((n_starts,),
                                                         jnp.int32)

    @jax.jit
    def run_chunk(vecs, states, its, limit, Xd, Yd):
        _, run_range, _ = lbfgs_parts(make_loss(Xd, Yd), tol, memory_size)
        return jax.vmap(run_range, in_axes=(0, 0, 0, None))(
            vecs, states, its, limit)

    @jax.jit
    def finalize(states):
        # stats reads (value, grad) out of the L-BFGS state — data-free
        _, _, stats = lbfgs_parts(lambda v: jnp.zeros(()), tol, memory_size)
        values, grads = jax.vmap(stats)(states)
        values = jnp.where(jnp.isfinite(values), values, jnp.inf)
        return values, jnp.sqrt(jnp.sum(grads * grads, axis=-1))

    chunk = chunk_iters or CHUNK_ITERS
    vecs, states, its = prepare(starts, Xs, Ys)
    limit = 0
    while limit < max_iters:
        limit = min(limit + chunk, max_iters)
        vecs, states, its = run_chunk(vecs, states, its, limit, Xs, Ys)
        if not (np.asarray(jax.device_get(its)) >= limit).any():
            break

    values, gnorms = finalize(states)
    vecs, values, gnorms, iters = jax.device_get((vecs, values, gnorms, its))

    if not np.isfinite(values).any():
        return FitResult(model=model, fun=float("inf"), num_iters=0,
                         success=False,
                         message=f"all {n_starts} parallel restarts diverged")

    def accept_wrapped(m):
        if not is_external_data:
            m = m.replace(X=model.X, Y=model.Y)
        return accept_fn(m)

    best = _pick_best(vecs, values, unflatten, vec0.dtype,
                      accept_wrapped if accept_fn is not None else None)
    fitted = unflatten(jnp.asarray(vecs[best], vec0.dtype))
    if not is_external_data:
        fitted = fitted.replace(X=model.X, Y=model.Y)
    gnorm = float(gnorms[best])
    converged = bool(np.isfinite(values[best])) and gnorm <= tol
    msg = (f"best of {n_starts} restarts on a "
           f"{n_lane_dev}x{mesh.shape[axis]} (restart x data) mesh (losses: "
           + ", ".join(f"{v:.4g}" for v in np.asarray(values)) + ")")
    return FitResult(model=fitted, fun=float(values[best]),
                     num_iters=int(iters[best]), success=converged,
                     message=msg, grad_norm=gnorm)


def sharded_predict_f(model, mesh: Mesh, axis: str = DATA_AXIS):
    """Data-parallel predictive posterior: params replicated, test inputs
    sharded over the data axis, outputs sharded the same way. Each shard's
    Kfu rows only involve its own test points, so no cross-device
    communication is needed beyond the initial broadcast — XLA partitions
    the whole computation along N."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    model_r = jax.device_put(model, repl)

    @partial(jax.jit, in_shardings=(repl, shard), out_shardings=(shard, shard))
    def _predict(m, X):
        return m.predict_f(X)

    def predict(X):
        Xs = jax.device_put(jnp.asarray(X), shard)
        return _predict(model_r, Xs)

    return predict
