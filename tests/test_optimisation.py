"""Optimization sanity (reference tests/test_optimisation.py pattern): a few
iterations strictly improve the objective, for both the scipy bridge and the
on-device optimizers; non-trainable params stay fixed."""

import numpy as np

from oak_tpu.kernels import OAKKernel
from oak_tpu.models import GPR, SGPR
from oak_tpu.optim import fit_adam, fit_lbfgs, fit_scipy


def _model(rng, n=20, sparse=False):
    X = rng.normal(size=(n, 2))
    y = (np.sin(X[:, 0]) + 0.3 * X[:, 1]).reshape(-1, 1) + 0.05 * rng.normal(size=(n, 1))
    k = OAKKernel.create(num_dims=2, max_interaction_depth=2, use_sparsity_prior=True)
    if sparse:
        return SGPR.create(X, y, k, X[:7].copy(), noise_variance=0.01)
    return GPR.create(X, y, k, noise_variance=0.01)


def test_scipy_bfgs_improves(rng):
    m = _model(rng)
    loss0 = float(m.training_loss())
    res = fit_scipy(m, lambda mm: mm.training_loss(), method="BFGS", max_iters=5)
    assert res.fun < loss0


def test_lbfgs_improves(rng):
    m = _model(rng)
    loss0 = float(m.training_loss())
    res = fit_lbfgs(m, lambda mm: mm.training_loss(), max_iters=5)
    assert res.fun < loss0


def test_adam_improves(rng):
    m = _model(rng)
    loss0 = float(m.training_loss())
    res = fit_adam(m, lambda mm: mm.training_loss(), steps=30, lr=5e-2)
    assert res.fun < loss0


def test_fixed_params_untouched(rng):
    m = _model(rng, sparse=True)
    Z0 = np.asarray(m.Z.value).copy()
    res = fit_scipy(m, lambda mm: mm.training_loss(), max_iters=3)
    np.testing.assert_array_equal(np.asarray(res.model.Z.value), Z0)
    # pinned base variances (share_var mode) stay exactly 1
    for k in res.model.kernel.kernels:
        np.testing.assert_allclose(float(k.variance.value), 1.0)


def test_scipy_and_lbfgs_agree_at_convergence(rng):
    m = _model(rng, n=15)
    r1 = fit_scipy(m, lambda mm: mm.training_loss(), max_iters=300)
    r2 = fit_lbfgs(m, lambda mm: mm.training_loss(), max_iters=300)
    # converged objective parity (trajectories differ; reference SURVEY §7)
    assert abs(r1.fun - r2.fun) < 1e-3 * max(1.0, abs(r1.fun))


def test_adam_scan_matches_per_step_loop(rng):
    # fit_adam_scan (one lax.scan dispatch) must reproduce fit_adam's
    # trajectory exactly when fed the same minibatch stream
    import jax.numpy as jnp

    from oak_tpu.optim import fit_adam_scan

    m = _model(rng, n=24)
    X = jnp.asarray(m.data[0])
    Y = jnp.asarray(m.data[1])
    idx_stream = [np.random.default_rng(i).choice(24, 8, replace=False)
                  for i in range(12)]

    def loss_batch(mm, ib):
        k = mm.kernel.K(X[ib]) + mm.likelihood.variance.value * jnp.eye(8)
        r = Y[ib]
        return jnp.sum(r * jnp.linalg.solve(k, r))

    res_loop = fit_adam(m, lambda mm, ib: loss_batch(mm, ib), steps=12,
                        lr=1e-2, batch_fn=lambda i: (jnp.asarray(idx_stream[i]),))
    res_scan = fit_adam_scan(m, loss_batch, steps=12, lr=1e-2,
                             batch_args=(jnp.asarray(np.stack(idx_stream)),))
    assert np.isclose(res_loop.fun, res_scan.fun, rtol=1e-10)
    from oak_tpu.params import flatten_trainable

    v1, _ = flatten_trainable(res_loop.model)
    v2, _ = flatten_trainable(res_scan.model)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-12)


def test_adam_scan_full_batch(rng):
    from oak_tpu.optim import fit_adam_scan

    m = _model(rng)
    loss0 = float(m.training_loss())
    res = fit_adam_scan(m, lambda mm: mm.training_loss(), steps=30, lr=5e-2)
    assert res.fun < loss0


def test_adam_scan_checkpoint_resume(rng, tmp_path):
    # interrupt-and-resume reproduces the uninterrupted trajectory exactly
    import jax.numpy as jnp

    from oak_tpu.optim import fit_adam_scan
    from oak_tpu.params import flatten_trainable

    m = _model(rng, n=24)
    X, Y = (jnp.asarray(a) for a in m.data)
    idx = jnp.asarray(np.stack(
        [np.random.default_rng(i).choice(24, 8, replace=False)
         for i in range(10)]))

    def loss_batch(mm, ib):
        k = mm.kernel.K(X[ib]) + mm.likelihood.variance.value * jnp.eye(8)
        r = Y[ib]
        return jnp.sum(r * jnp.linalg.solve(k, r))

    full = fit_adam_scan(m, loss_batch, steps=10, lr=1e-2, batch_args=(idx,))

    ck = str(tmp_path / "train_state.npz")
    # "crash" after 6 steps...
    fit_adam_scan(m, loss_batch, steps=6, lr=1e-2, batch_args=(idx,),
                  checkpoint_path=ck, checkpoint_every=3)
    # ...then resume toward the same 10-step total on the same stream
    resumed = fit_adam_scan(m, loss_batch, steps=10, lr=1e-2, batch_args=(idx,),
                            checkpoint_path=ck, checkpoint_every=3)
    assert resumed.num_iters == 4  # only the remaining steps ran
    v1, _ = flatten_trainable(full.model)
    v2, _ = flatten_trainable(resumed.model)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-12)
    assert np.isclose(full.fun, resumed.fun, rtol=1e-10)


def test_optimise_minibatch_checkpoint(rng, tmp_path):
    from oak_tpu.model import oak_model
    from oak_tpu.params import flatten_trainable

    X = rng.normal(size=(64, 2))
    y = (X[:, 0] > 0).astype(float).reshape(-1, 1)
    ck = str(tmp_path / "mb.npz")

    def fresh():
        oak = oak_model(max_interaction_depth=2, likelihood="bernoulli")
        oak.fit(X, y, optimise=False)
        return oak

    oak_full = fresh()
    oak_full.optimise_minibatch(batch_size=16, steps=8, seed=1)

    oak_ck = fresh()
    oak_ck.optimise_minibatch(batch_size=16, steps=5, seed=1,
                              checkpoint_path=ck, checkpoint_every=5)
    oak_ck.m = fresh().m  # wipe the partially-trained params
    oak_ck.optimise_minibatch(batch_size=16, steps=8, seed=1,
                              checkpoint_path=ck, checkpoint_every=5)
    v1, _ = flatten_trainable(oak_full.m)
    v2, _ = flatten_trainable(oak_ck.m)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-10)


def test_adam_scan_resume_complete_is_success(rng, tmp_path):
    import jax.numpy as jnp

    from oak_tpu.optim import fit_adam_scan

    m = _model(rng, n=20)
    ck = str(tmp_path / "done.npz")
    loss = lambda mm: mm.training_loss()  # noqa: E731
    fit_adam_scan(m, loss, steps=4, lr=1e-2, checkpoint_path=ck,
                  checkpoint_every=2)
    res = fit_adam_scan(m, loss, steps=4, lr=1e-2, checkpoint_path=ck,
                        checkpoint_every=2)
    assert res.success and res.num_iters == 0
    assert "nothing to run" in res.message
    # the returned model is the checkpointed (trained) one, not the init
    assert float(loss(res.model)) < float(loss(m))


def test_optimise_minibatch_mesh_checkpoint(rng, tmp_path):
    from oak_tpu.model import oak_model
    from oak_tpu.parallel import make_mesh
    from oak_tpu.params import flatten_trainable

    X = rng.normal(size=(64, 2))
    y = (X[:, 0] > 0).astype(float).reshape(-1, 1)
    mesh = make_mesh(4)
    ck = str(tmp_path / "mesh_ck.npz")

    def fresh():
        oak = oak_model(max_interaction_depth=2, likelihood="bernoulli")
        oak.fit(X, y, optimise=False)
        return oak

    full = fresh()
    full.optimise_minibatch(batch_size=16, steps=6, seed=2, mesh=mesh)

    part = fresh()
    part.optimise_minibatch(batch_size=16, steps=3, seed=2, mesh=mesh,
                            checkpoint_path=ck, checkpoint_every=3)
    part.m = fresh().m  # wipe; resume must restore from the file
    part.optimise_minibatch(batch_size=16, steps=6, seed=2, mesh=mesh,
                            checkpoint_path=ck, checkpoint_every=3)
    v1, _ = flatten_trainable(full.m)
    v2, _ = flatten_trainable(part.m)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-8, atol=1e-10)


def test_optimise_restarts_scipy_rejected(rng):
    # round 2 lifted the lbfgs-only restriction: adam/natgrad run batched
    # restart lanes now (tests/test_multistart.py); only the host-loop scipy
    # optimizer still rejects restarts
    from oak_tpu.model import oak_model

    X = rng.normal(size=(20, 2))
    y = X[:, :1]
    oak = oak_model(max_interaction_depth=2, optimizer="scipy")
    oak.fit(X, y, optimise=False)
    import pytest

    with pytest.raises(ValueError, match="restarts"):
        oak.optimise(max_iters=3, restarts=2)


def test_lbfgs_checkpoint_resume(rng, tmp_path):
    """VERDICT r1 item 4: fit_lbfgs with checkpoint_path persists the full
    (vec, L-BFGS state, iter) carry per chunk; a killed run resumes to the
    SAME trajectory as the uninterrupted one."""
    from oak_tpu.optim import fit_lbfgs
    from oak_tpu.params import flatten_trainable

    m = _model(rng)
    loss = lambda mm: mm.training_loss()  # noqa: E731
    ck = str(tmp_path / "lbfgs_state.npz")
    full = fit_lbfgs(m, loss, max_iters=30, checkpoint_path=None)
    # "crash" after 10 iterations...
    fit_lbfgs(m, loss, max_iters=10, checkpoint_path=ck, checkpoint_every=10)
    # ...resume to the same 30-iteration total
    resumed = fit_lbfgs(m, loss, max_iters=30, checkpoint_path=ck,
                        checkpoint_every=10)
    v1, _ = flatten_trainable(full.model)
    v2, _ = flatten_trainable(resumed.model)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-12)
    assert np.isclose(full.fun, resumed.fun, rtol=1e-10)


def test_natgrad_scan_checkpoint_resume(rng, tmp_path):
    """natgrad minibatch training is resumable (was Adam-only in round 1)."""
    import jax.numpy as jnp

    from oak_tpu.kernels import OAKKernel
    from oak_tpu.models import SVGP, Gaussian
    from oak_tpu.optim import fit_natgrad_scan
    from oak_tpu.params import flatten_trainable

    X = rng.normal(size=(24, 2))
    y = (np.sin(X[:, 0]) + 0.3 * X[:, 1]).reshape(-1, 1)
    k = OAKKernel.create(num_dims=2, max_interaction_depth=2)
    m = SVGP.create(k, Gaussian.create(0.1), X[:8], num_data=24)
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)
    idx = jnp.asarray(np.stack(
        [np.random.default_rng(i).choice(24, 8, replace=False)
         for i in range(10)]))

    def loss_batch(mm, ib):
        return mm.training_loss(Xj[ib], Yj[ib])

    full = fit_natgrad_scan(m, loss_batch, steps=10, gamma=0.5,
                            batch_args=(idx,))
    ck = str(tmp_path / "natgrad_state.npz")
    fit_natgrad_scan(m, loss_batch, steps=6, gamma=0.5, batch_args=(idx,),
                     checkpoint_path=ck, checkpoint_every=3)
    resumed = fit_natgrad_scan(m, loss_batch, steps=10, gamma=0.5,
                               batch_args=(idx,), checkpoint_path=ck,
                               checkpoint_every=3)
    assert resumed.num_iters == 4
    v1, _ = flatten_trainable(full.model)
    v2, _ = flatten_trainable(resumed.model)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-12)


def test_optimise_minibatch_natgrad_checkpoint(rng, tmp_path):
    """oak_model natgrad minibatch training accepts checkpoint_path now."""
    from oak_tpu.model import oak_model
    from oak_tpu.params import flatten_trainable

    X = rng.normal(size=(40, 2))
    yb = (X[:, 0] > 0).astype(float).reshape(-1, 1)

    def fresh():
        oak = oak_model(max_interaction_depth=2, likelihood="bernoulli",
                        num_inducing=8)
        oak.fit(X, yb, optimise=False)
        return oak

    ck = str(tmp_path / "mb_natgrad.npz")
    a = fresh()
    a.optimise_minibatch(batch_size=16, steps=8, optimizer="natgrad",
                         gamma=0.5, seed=3)
    va, _ = flatten_trainable(a.m)

    b = fresh()
    b.optimise_minibatch(batch_size=16, steps=4, optimizer="natgrad",
                         gamma=0.5, seed=3, checkpoint_path=ck,
                         checkpoint_every=2)
    b.m = fresh().m  # wipe; resume must restore from the file
    b.optimise_minibatch(batch_size=16, steps=8, optimizer="natgrad",
                         gamma=0.5, seed=3, checkpoint_path=ck,
                         checkpoint_every=2)
    vb, _ = flatten_trainable(b.m)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-12)
