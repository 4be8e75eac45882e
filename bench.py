"""Benchmark: SVGP ELBO training steps/sec + full Sobol wall-clock on the
pumadyn-32nm-shaped config from BASELINE.json (N=8192, D=32, M=512).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

No GPflow is installed in this image and the UCI .mat files cannot be
downloaded (zero egress), so the dataset is synthetic with pumadyn's shapes
and the recorded reference point is this same workload measured with JAX on
the host CPU (see BASELINE.md) — a *conservative* stand-in for GPflow-CPU
(GPflow 2.2 eager/tf.function is slower than jitted XLA-CPU on this loop).
"""

import argparse
import json
import time

import numpy as np


def synth_pumadyn(n=8192, d=32, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    w = rng.normal(size=d) / np.sqrt(d)
    y = np.tanh(X @ w) + 0.5 * X[:, 0] * X[:, 1] + 0.1 * rng.normal(size=n)
    return X.astype(np.float32), y.reshape(-1, 1).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--m", type=int, default=512)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--quick", action="store_true", help="tiny shapes for smoke test")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (baseline measurement)")
    args = ap.parse_args()
    if args.quick:
        args.n, args.d, args.m, args.steps = 512, 8, 64, 10

    import jax

    if args.cpu:
        # the image's sitecustomize pins jax_platforms to "axon,cpu"
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from oak_tpu.kernels import OAKKernel
    from oak_tpu.models import SVGP, Gaussian
    from oak_tpu.params import flatten_trainable
    from oak_tpu import sobol as sb

    X, Y = synth_pumadyn(args.n, args.d)
    rng = np.random.default_rng(1)
    Z = X[rng.choice(args.n, args.m, replace=False)]

    kernel = OAKKernel.create(num_dims=args.d, max_interaction_depth=args.depth,
                              use_sparsity_prior=True,
                              lengthscale_bounds=[1e-3, 1e3], dtype=jnp.float32)
    model = SVGP.create(kernel, Gaussian.create(0.01, dtype=jnp.float32), Z,
                        num_data=args.n, dtype=jnp.float32)

    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    vec0, unflatten = flatten_trainable(model)
    opt = optax.adam(1e-2)

    @jax.jit
    def step(vec, opt_state):
        loss, g = jax.value_and_grad(
            lambda v: unflatten(v).training_loss(Xj, Yj)
        )(vec)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(vec, updates), opt_state, loss

    # warmup/compile
    opt_state = opt.init(vec0)
    vec, opt_state, loss = step(vec0, opt_state)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        vec, opt_state, loss = step(vec, opt_state)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    steps_per_sec = args.steps / dt

    trained = unflatten(vec)

    # Sobol: all order-1 and order-2 components on the M inducing points
    # + per-order totals via Newton-Girard (warmup once, then time).
    tuples, vals = sb.compute_sobol_oak(trained, max_interaction_depth=2)
    totals = sb.compute_sobol_by_order(trained, max_depth=min(args.depth, 4))
    t1 = time.perf_counter()
    tuples, vals = sb.compute_sobol_oak(trained, max_interaction_depth=2)
    totals = sb.compute_sobol_by_order(trained, max_depth=min(args.depth, 4))
    sobol_secs = time.perf_counter() - t1

    backend = jax.default_backend()
    # CPU-JAX reference for the identical workload, measured on this image's
    # single CPU core with `python bench.py --cpu --steps 5` (see BASELINE.md):
    # 0.003 ELBO steps/s, 0.703 s Sobol wall-clock.
    BASELINE_STEPS_PER_SEC = 0.003
    BASELINE_SOBOL_SECS = 0.703

    result = {
        "metric": "svgp_elbo_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
        "sobol_wall_s": round(sobol_secs, 3),
        "sobol_vs_baseline": round(BASELINE_SOBOL_SECS / max(sobol_secs, 1e-9), 2),
        "config": f"N={args.n} D={args.d} M={args.m} depth={args.depth}",
        "backend": backend,
        "final_elbo_loss": float(np.asarray(loss)),
        "num_sobol_components": len(tuples),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
