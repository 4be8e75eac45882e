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
