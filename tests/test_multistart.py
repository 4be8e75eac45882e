"""Parallel multi-start L-BFGS (optim/multistart.py): batched restarts match
or beat the single-start fit, the accept filter is honored, and the
mesh-sharded starts axis produces the same winner as the unsharded run."""

import jax.numpy as jnp
import numpy as np

from oak_tpu.kernels import OAKKernel
from oak_tpu.models import GPR
from oak_tpu.optim import fit_lbfgs, fit_lbfgs_multistart
from oak_tpu.params import flatten_trainable


def _model(rng, n=20):
    X = rng.normal(size=(n, 2))
    y = (np.sin(X[:, 0]) + 0.3 * X[:, 1]).reshape(-1, 1) \
        + 0.05 * rng.normal(size=(n, 1))
    k = OAKKernel.create(num_dims=2, max_interaction_depth=2,
                         use_sparsity_prior=True)
    return GPR.create(X, y, k, noise_variance=0.01)


def test_multistart_matches_or_beats_single(rng):
    m = _model(rng)
    loss = lambda mm: mm.training_loss()  # noqa: E731
    single = fit_lbfgs(m, loss, max_iters=100)
    multi = fit_lbfgs_multistart(m, loss, n_starts=3, jitter=0.2,
                                 max_iters=100, include_init=True)
    assert multi.fun <= single.fun + 1e-6
    assert "parallel restarts" in multi.message


def test_multistart_include_init_reproduces_single_trajectory(rng):
    # with zero jitter every lane IS the single start: converged objective
    # must agree with fit_lbfgs
    m = _model(rng)
    loss = lambda mm: mm.training_loss()  # noqa: E731
    single = fit_lbfgs(m, loss, max_iters=200)
    multi = fit_lbfgs_multistart(m, loss, n_starts=2, jitter=0.0,
                                 max_iters=200)
    assert abs(multi.fun - single.fun) < 1e-4 * max(1.0, abs(single.fun))


def test_multistart_never_returns_nonfinite_params(rng):
    """Round-5 heart postmortem: a NaN-gradient region (finite loss, inf
    backward through a sqrt clamp) NaNs every lane's params in ONE L-BFGS
    update, while each lane's optimizer state keeps the last accepted —
    finite — loss. The stale state values let four 100%-NaN lanes present
    as healthy fits. ``finalize`` must evaluate the loss FRESH at the
    returned params so diverged lanes read as inf and the caller's model is
    returned untouched instead of a NaN-parameter model."""
    m = _model(rng)
    vec0, _ = flatten_trainable(m)

    def poisoned_loss(mm):
        vec, _ = flatten_trainable(mm)
        base = jnp.sum((vec - 2.0) ** 2)
        # finite value everywhere; gradient NaN wherever vec[0] < 1e3
        # (0 * sqrt'(clamp) = 0 * inf): the round-5 trap shape
        trap = 0.0 * jnp.sqrt(jnp.maximum(vec[0] - 1e3, 0.0))
        return base + trap

    res = fit_lbfgs_multistart(m, poisoned_loss, n_starts=3, jitter=0.1,
                               max_iters=30, include_init=True)
    vec, _ = flatten_trainable(res.model)
    assert np.isfinite(np.asarray(vec)).all()
    assert res.fun == float("inf") and not res.success


def test_multistart_accept_fn_filters(rng):
    m = _model(rng)
    loss = lambda mm: mm.training_loss()  # noqa: E731
    seen = []

    def accept(model):
        # reject the overall-best lane to prove the filter is consulted in
        # loss order and a worse-but-accepted lane can win
        seen.append(float(loss(model)))
        return len(seen) > 1

    multi = fit_lbfgs_multistart(m, loss, n_starts=3, jitter=0.3,
                                 max_iters=50, accept_fn=accept)
    assert len(seen) == 2  # stopped at the first accepted lane
    assert np.isclose(multi.fun, seen[1], rtol=1e-5)


def test_multistart_warmup_runs(rng):
    m = _model(rng)
    loss = lambda mm: mm.training_loss()  # noqa: E731
    loss0 = float(loss(m))
    res = fit_lbfgs_multistart(m, loss, n_starts=2, jitter=0.1,
                               max_iters=20, warm_adam_steps=25)
    assert res.fun < loss0


def test_multistart_mesh_sharded_matches_unsharded(rng):
    from oak_tpu.parallel import make_mesh

    m = _model(rng)
    loss = lambda mm: mm.training_loss()  # noqa: E731
    mesh = make_mesh(4, axis="starts")
    plain = fit_lbfgs_multistart(m, loss, n_starts=4, jitter=0.25,
                                 max_iters=60, seed=3)
    sharded = fit_lbfgs_multistart(m, loss, n_starts=4, jitter=0.25,
                                   max_iters=60, seed=3, mesh=mesh)
    assert abs(plain.fun - sharded.fun) < 1e-4 * max(1.0, abs(plain.fun))
    # compare the fitted models in prediction space, not raw-parameter space:
    # a collapsed variance's raw (inverse-softplus) value is ill-conditioned
    # (-29 vs -30 raw are both ~0 constrained) and differs by fp reduction
    # order across shardings
    mu1, _ = plain.model.predict_f(jnp.asarray(plain.model.data[0]))
    mu2, _ = sharded.model.predict_f(jnp.asarray(plain.model.data[0]))
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2),
                               rtol=1e-4, atol=1e-6)


def test_optimise_restarts_entry_point(rng):
    # oak_model.optimise(restarts=K) routes through the parallel multistart
    from oak_tpu.model import oak_model

    X = rng.normal(size=(40, 2))
    y = (np.sin(X[:, 0]) + 0.3 * X[:, 1]).reshape(-1, 1) \
        + 0.05 * rng.normal(size=(40, 1))
    oak = oak_model(max_interaction_depth=2)
    oak.fit(X, y, optimise=False)
    res = oak.optimise(max_iters=60, restarts=2)
    assert "parallel restarts" in res.message
    pred = oak.predict(X)
    rmse = float(np.sqrt(np.mean((pred - y[:, 0]) ** 2)))
    base = float(np.sqrt(np.mean((y - y.mean()) ** 2)))
    assert rmse < base  # beats the mean predictor


def test_adam_multistart_runs_and_beats_single(rng):
    from oak_tpu.optim import fit_adam, fit_adam_multistart

    m = _model(rng)
    loss = lambda mm: mm.training_loss()  # noqa: E731
    single = fit_adam(m, loss, steps=60)
    multi = fit_adam_multistart(m, loss, n_starts=3, jitter=0.2, steps=60,
                                include_init=True)
    assert multi.fun <= single.fun + 1e-5
    assert "adam restarts" in multi.message


def test_natgrad_multistart_svgp(rng):
    from oak_tpu.models import SVGP, Gaussian
    from oak_tpu.optim import fit_natgrad_adam, fit_natgrad_multistart

    X = rng.normal(size=(24, 2))
    y = (np.sin(X[:, 0]) + 0.3 * X[:, 1]).reshape(-1, 1)
    k = OAKKernel.create(num_dims=2, max_interaction_depth=2)
    m = SVGP.create(k, Gaussian.create(0.1), X[:8], num_data=24)
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)
    loss = lambda mm: mm.training_loss(Xj, Yj)  # noqa: E731
    single = fit_natgrad_adam(m, loss, steps=40, gamma=1.0)
    multi = fit_natgrad_multistart(m, loss, n_starts=2, jitter=0.2, steps=40,
                                   gamma=1.0, include_init=True)
    assert np.isfinite(multi.fun)
    assert multi.fun <= single.fun + 1e-5
    assert "natgrad restarts" in multi.message


def test_lbfgs_multistart_checkpoint_resume(rng, tmp_path):
    """VERDICT r1 item 4: a killed chunked multistart resumes to the same
    trajectory — the persisted carry is the full batched optimizer state."""
    m = _model(rng)
    loss = lambda mm: mm.training_loss()  # noqa: E731
    full = fit_lbfgs_multistart(m, loss, n_starts=2, jitter=0.2,
                                max_iters=30, chunk_iters=10)

    ck = str(tmp_path / "multistart_state.npz")
    # "crash" after the first 10-iteration chunk...
    fit_lbfgs_multistart(m, loss, n_starts=2, jitter=0.2, max_iters=10,
                         chunk_iters=10, checkpoint_path=ck)
    # ...then resume toward the same 30-iteration total
    resumed = fit_lbfgs_multistart(m, loss, n_starts=2, jitter=0.2,
                                   max_iters=30, chunk_iters=10,
                                   checkpoint_path=ck)
    v1, _ = flatten_trainable(full.model)
    v2, _ = flatten_trainable(resumed.model)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-12)
    assert np.isclose(full.fun, resumed.fun, rtol=1e-10)


def test_oak_model_restarts_with_adam_and_natgrad(rng):
    """VERDICT r1 item 5: restarts>0 now runs batched lanes for adam and
    natgrad too (was lbfgs-only); scipy still rejects loudly."""
    import pytest

    from oak_tpu.model import oak_model

    X = rng.normal(size=(30, 2))
    y = (np.sin(X[:, 0]) + 0.3 * X[:, 1]).reshape(-1, 1)

    oak = oak_model(max_interaction_depth=2, optimizer="adam")
    oak.fit(X, y, optimise=False)
    res = oak.optimise(max_iters=40, restarts=2)
    assert np.isfinite(res.fun) and "adam restarts" in res.message

    yb = (X[:, 0] > 0).astype(float).reshape(-1, 1)
    oakn = oak_model(max_interaction_depth=2, optimizer="natgrad",
                     likelihood="bernoulli", num_inducing=8)
    oakn.fit(X, yb, optimise=False)
    resn = oakn.optimise(max_iters=40, restarts=2)
    assert np.isfinite(resn.fun) and "natgrad restarts" in resn.message

    oaks = oak_model(max_interaction_depth=2, optimizer="scipy")
    oaks.fit(X, y, optimise=False)
    with pytest.raises(ValueError, match="scipy"):
        oaks.optimise(max_iters=5, restarts=2)


def test_fit_restarts_kwarg(rng):
    # fit(X, y, restarts=K) — the one-call production-robust mode — forwards
    # to optimise(restarts=K) and routes through the parallel multistart
    from oak_tpu.model import oak_model

    X = rng.normal(size=(40, 2))
    y = (np.sin(X[:, 0]) + 0.3 * X[:, 1]).reshape(-1, 1) \
        + 0.05 * rng.normal(size=(40, 1))
    oak = oak_model(max_interaction_depth=2)
    oak.fit(X, y, restarts=2)
    pred = oak.predict(X)
    rmse = float(np.sqrt(np.mean((pred - y[:, 0]) ** 2)))
    base = float(np.sqrt(np.mean((y - y.mean()) ** 2)))
    assert rmse < base
