"""Multi-chip (virtual 8-device CPU mesh) data-parallel training tests: the
sharded ELBO step agrees with the single-device step and improves the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oak_tpu.kernels import OAKKernel
from oak_tpu.models import SVGP, Gaussian
from oak_tpu.parallel import data_parallel_elbo_step, make_mesh, shard_batch
from oak_tpu.params import flatten_trainable


def _setup(rng, n=64, d=3, m=8):
    X = rng.normal(size=(n, d))
    y = (np.sin(X[:, 0]) + X[:, 1]).reshape(-1, 1)
    k = OAKKernel.create(num_dims=d, max_interaction_depth=2,
                         use_sparsity_prior=True)
    model = SVGP.create(k, Gaussian.create(0.1), X[:m].copy(), num_data=n)
    return model, jnp.asarray(X), jnp.asarray(y)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dp_step_matches_single_device(rng):
    model, X, Y = _setup(rng)
    mesh = make_mesh(8)
    Xs, Ys = shard_batch(mesh, X, Y)
    step, (vec, opt_state, unflatten) = data_parallel_elbo_step(model, mesh,
                                                               learning_rate=1e-2)
    vec1, _, loss_dp = step(vec, opt_state, Xs, Ys)

    # single-device reference value of the same loss
    vec0, unflatten0 = flatten_trainable(model)
    loss_ref = unflatten0(vec0).training_loss(X, Y)
    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-8)


def test_dp_training_improves(rng):
    model, X, Y = _setup(rng)
    mesh = make_mesh(8)
    Xs, Ys = shard_batch(mesh, X, Y)
    step, (vec, opt_state, unflatten) = data_parallel_elbo_step(model, mesh,
                                                               learning_rate=5e-2)
    losses = []
    for _ in range(20):
        vec, opt_state, loss = step(vec, opt_state, Xs, Ys)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_dp_works_on_subset_mesh(rng):
    model, X, Y = _setup(rng, n=32)
    mesh = make_mesh(4)
    Xs, Ys = shard_batch(mesh, X, Y)
    step, (vec, opt_state, _) = data_parallel_elbo_step(model, mesh)
    _, _, loss = step(vec, opt_state, Xs, Ys)
    assert np.isfinite(float(loss))


def test_sharded_predict_matches_single_device(rng):
    from oak_tpu.parallel import sharded_predict_f

    model, X, Y = _setup(rng, n=48)
    mesh = make_mesh(8)
    Xt = jnp.asarray(rng.normal(size=(512, 3)))
    predict = sharded_predict_f(model, mesh)
    mu_s, var_s = predict(Xt)
    mu, var = model.predict_f(Xt)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var), rtol=1e-10)


def test_minibatch_trajectory_parity_multistep(rng):
    """End-to-end oak_model minibatch training on an 8-device mesh matches
    the single-device trajectory over 50 steps at non-toy shapes (N=4096,
    M=256): same seed -> identical batch stream -> same Adam trajectory up
    to floating-point reduction order."""
    from oak_tpu.model import oak_model
    from oak_tpu.params import flatten_trainable

    n, d = 4096, 3
    X = rng.normal(size=(n, d))
    logits = np.sin(X[:, 0]) + X[:, 1]
    y = (logits + 0.3 * rng.normal(size=n) > 0).astype(np.float64)

    def build():
        oak = oak_model(max_interaction_depth=2, num_inducing=256,
                        likelihood="bernoulli", use_normalising_flow=False)
        oak.fit(X, y, optimise=False)
        return oak

    oak_single = build()
    res_single = oak_single.optimise_minibatch(batch_size=256, steps=50,
                                               lr=1e-2, seed=3)
    oak_mesh = build()
    mesh = make_mesh(8)
    res_mesh = oak_mesh.optimise_minibatch(batch_size=256, steps=50,
                                           lr=1e-2, seed=3, mesh=mesh)

    v1, _ = flatten_trainable(oak_single.m)
    v2, _ = flatten_trainable(oak_mesh.m)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(res_mesh.fun, res_single.fun, rtol=1e-6)


def test_minibatch_mesh_batch_divisibility(rng):
    from oak_tpu.model import oak_model

    X = rng.normal(size=(64, 2))
    y = (X[:, 0] > 0).astype(np.float64)
    oak = oak_model(max_interaction_depth=1, num_inducing=8,
                    likelihood="bernoulli", use_normalising_flow=False)
    oak.fit(X, y, optimise=False)
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="divisible"):
        oak.optimise_minibatch(batch_size=20, steps=1, mesh=mesh)


def test_mesh_sharded_sobol_matches_single_device(rng):
    """compute_sobol_oak / by_order / prediction components under a mesh ==
    single-device values: the sharding hints only partition the O(N^2)
    intermediates (XLA inserts psums of the tiny per-order outputs), they
    must not change any value beyond reduction order."""
    from oak_tpu.models import GPR
    from oak_tpu.sobol import (compute_sobol_by_order, compute_sobol_oak,
                               get_prediction_component)

    n, d = 64, 4
    X = rng.normal(size=(n, d))
    y = (np.sin(X[:, 0]) + X[:, 1] * X[:, 2]).reshape(-1, 1)
    k = OAKKernel.create(num_dims=d, max_interaction_depth=3)
    model = GPR.create(X, y, k, noise_variance=0.1)
    mesh = make_mesh(8)

    tuples0, vals0 = compute_sobol_oak(model)
    tuples1, vals1 = compute_sobol_oak(model, mesh=mesh)
    assert tuples0 == tuples1
    np.testing.assert_allclose(vals1, vals0, rtol=1e-9, atol=1e-12)

    by0 = compute_sobol_by_order(model)
    by1 = compute_sobol_by_order(model, mesh=mesh)
    np.testing.assert_allclose(by1, by0, rtol=1e-9, atol=1e-12)

    pc0 = get_prediction_component(model)
    pc1 = get_prediction_component(model, mesh=mesh)
    np.testing.assert_allclose(pc1, pc0, rtol=1e-9, atol=1e-12)


def test_mesh_sharded_sobol_oak_model_entry(rng):
    """oak_model.get_sobol(mesh=) end-to-end parity with the unsharded call,
    including the forced chunked-ladder fallback route."""
    from oak_tpu.model import oak_model
    from oak_tpu import sobol as sobol_mod

    n, d = 96, 4
    X = rng.normal(size=(n, d))
    y = np.sin(X[:, 0]) + X[:, 1]
    oak = oak_model(max_interaction_depth=2, use_normalising_flow=False)
    oak.fit(X, y, optimise=False)
    mesh = make_mesh(8)
    s0 = oak.get_sobol()
    s1 = oak.get_sobol(mesh=mesh)
    np.testing.assert_allclose(s1, s0, rtol=1e-9, atol=1e-12)

    # chunked fallback under the mesh: shrink the ladder cap so every order
    # takes _chunked_quadforms. Fresh model SHAPE (different N) so the jitted
    # Sobol program retraces and actually sees the patched cap.
    X2 = rng.normal(size=(80, d))
    oak2 = oak_model(max_interaction_depth=2, use_normalising_flow=False)
    oak2.fit(X2, np.sin(X2[:, 0]) + X2[:, 1], optimise=False)
    _, v_full = sobol_mod.compute_sobol_oak(oak2.m)
    old = sobol_mod._LADDER_BYTES_CAP
    sobol_mod._LADDER_BYTES_CAP = 1
    try:
        _, v_chunk = sobol_mod.compute_sobol_oak(oak2.m, mesh=mesh)
    finally:
        sobol_mod._LADDER_BYTES_CAP = old
    np.testing.assert_allclose(v_chunk, v_full, rtol=1e-9, atol=1e-12)


def test_data_sharded_lbfgs_matches_single_device(rng):
    """fit_lbfgs_sharded (full-batch L-BFGS with the DATA axis sharded over
    the mesh) follows the single-device fit_lbfgs trajectory: same math,
    shard-local grams + XLA-inserted psums (f64: reduction-order drift only)."""
    from oak_tpu.models import SGPR
    from oak_tpu.optim.fit import fit_lbfgs
    from oak_tpu.parallel import fit_lbfgs_sharded
    from oak_tpu.params import flatten_trainable

    n, d, m = 64, 3, 8
    X = rng.normal(size=(n, d))
    y = (np.sin(X[:, 0]) + X[:, 1]).reshape(-1, 1)
    k = OAKKernel.create(num_dims=d, max_interaction_depth=2)
    model = SGPR.create(X, y, k, Z=X[:m].copy(), noise_variance=0.1)
    mesh = make_mesh(8)

    res_s = fit_lbfgs_sharded(model, mesh, max_iters=20)
    res_0 = fit_lbfgs(model, lambda mm: mm.training_loss(), max_iters=20)
    # the psum's reduction order differs from the single-device sum and the
    # drift compounds through 20 linesearch iterations — f64 keeps it ~1e-8
    np.testing.assert_allclose(res_s.fun, res_0.fun, rtol=1e-6)
    v_s, _ = flatten_trainable(res_s.model)
    v_0, _ = flatten_trainable(res_0.model)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_0),
                               rtol=1e-4, atol=1e-6)
    # the fitted model keeps its ORIGINAL (unsharded) data leaves
    assert res_s.model.X.shape == (n, d)

    # SVGP external-data contract
    sv_model, Xj, Yj = _setup(rng, n=64, d=3, m=8)
    rs = fit_lbfgs_sharded(sv_model, mesh, X=Xj, Y=Yj, max_iters=10)
    r0 = fit_lbfgs(sv_model, lambda mm: mm.training_loss(Xj, Yj),
                   max_iters=10)
    np.testing.assert_allclose(rs.fun, r0.fun, rtol=1e-8)


def test_data_sharded_lbfgs_validation(rng):
    from oak_tpu.models import SGPR
    from oak_tpu.parallel import fit_lbfgs_sharded

    X = rng.normal(size=(60, 2))  # 60 not divisible by 8
    y = X[:, :1]
    k = OAKKernel.create(num_dims=2, max_interaction_depth=1)
    model = SGPR.create(X, y, k, Z=X[:4].copy(), noise_variance=0.1)
    with pytest.raises(ValueError, match="divisible"):
        fit_lbfgs_sharded(model, make_mesh(8), max_iters=1)

    # a model without data leaves (SVGP) must get the clean contract error,
    # not an AttributeError from the N-divisibility probe
    from oak_tpu.models import SVGP

    from oak_tpu.models.likelihoods import Gaussian

    sv = SVGP.create(k, Gaussian.create(0.1), Z=X[:4].copy(), num_data=64)
    with pytest.raises(ValueError, match="pass X= and Y="):
        fit_lbfgs_sharded(sv, make_mesh(8), max_iters=1)


def test_oak_model_optimise_data_mesh(rng):
    """oak_model.optimise(data_mesh=) end-to-end: the data-sharded fit lands
    within trajectory-drift distance of the single-device fit, and invalid
    combinations raise."""
    from oak_tpu.model import oak_model

    n, d = 64, 3
    X = rng.normal(size=(n, d))
    y = np.sin(X[:, 0]) + 0.5 * X[:, 1]
    mesh = make_mesh(8)

    def build():
        oak = oak_model(max_interaction_depth=2, use_normalising_flow=False)
        oak.fit(X, y, optimise=False)
        return oak

    oak_s = build()
    res_s = oak_s.optimise(max_iters=25, data_mesh=mesh)
    oak_0 = build()
    res_0 = oak_0.optimise(max_iters=25)
    np.testing.assert_allclose(res_s.fun, res_0.fun, rtol=1e-6)

    oak_bad = build()
    with pytest.raises(ValueError, match="2-D mesh"):
        # restarts with a 1-D data_mesh: needs the (restart, data) mesh
        oak_bad.optimise(restarts=2, data_mesh=mesh)
    with pytest.raises(ValueError, match="checkpoint_path"):
        oak_bad.optimise(checkpoint_path="/tmp/x.npz", data_mesh=mesh)
    oak_bad.optimizer = "adam"
    with pytest.raises(ValueError, match="lbfgs"):
        oak_bad.optimise(data_mesh=mesh)


def test_dp_natgrad_matches_single_device(rng):
    """Sharded natgrad+Adam step == single-device fit_natgrad_adam step
    (same batch, same init) up to floating-point reduction order."""
    from oak_tpu.models import Bernoulli
    from oak_tpu.optim.natgrad import fit_natgrad_adam
    from oak_tpu.parallel import data_parallel_natgrad_step

    n = 64
    X = rng.normal(size=(n, 3))
    y = (X[:, 0] > 0).astype(np.float64).reshape(-1, 1)
    k = OAKKernel.create(num_dims=3, max_interaction_depth=2)
    model = SVGP.create(k, Bernoulli.create("logit"), X[:8].copy(),
                        q_diag=True, whiten=True, num_data=n)
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)

    mesh = make_mesh(8)
    step, (vec, opt_state, unflatten) = data_parallel_natgrad_step(
        model, mesh, gamma=0.2, hyper_lr=1e-2)
    Xs, Ys = shard_batch(mesh, Xj, Yj)
    vec1, _, loss_dp = step(vec, opt_state, Xs, Ys)

    res = fit_natgrad_adam(model, lambda m, a, b: m.training_loss(a, b),
                           steps=1, gamma=0.2, hyper_lr=1e-2,
                           batch_fn=lambda i: (Xj, Yj))
    v_single, _ = flatten_trainable(res.model)
    np.testing.assert_allclose(np.asarray(jax.device_get(vec1)),
                               np.asarray(v_single), rtol=1e-8, atol=1e-10)


def _mesh_2d(kr=2, kd=4):
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()).reshape(kr, kd),
                ("restart", "data"))


def test_multistart_2d_mesh_matches_unsharded(rng):
    """fit_lbfgs_multistart_sharded on a (restart x data) 2-D mesh follows
    the unsharded fit_lbfgs_multistart trajectory: identical starts (same
    seed), same chunking, shard-local grams with XLA-inserted data-axis
    psums (f64: reduction-order drift only)."""
    from oak_tpu.models import SGPR
    from oak_tpu.optim import fit_lbfgs_multistart
    from oak_tpu.parallel import fit_lbfgs_multistart_sharded

    n, d, m = 64, 3, 8
    X = rng.normal(size=(n, d))
    y = (np.sin(X[:, 0]) + X[:, 1]).reshape(-1, 1)
    k = OAKKernel.create(num_dims=d, max_interaction_depth=2)
    model = SGPR.create(X, y, k, Z=X[:m].copy(), noise_variance=0.1)
    mesh = _mesh_2d()

    res_s = fit_lbfgs_multistart_sharded(model, mesh, n_starts=2,
                                         jitter=0.3, seed=0, max_iters=20)
    res_0 = fit_lbfgs_multistart(model, lambda mm: mm.training_loss(),
                                 n_starts=2, jitter=0.3, seed=0,
                                 max_iters=20)
    np.testing.assert_allclose(res_s.fun, res_0.fun, rtol=1e-6)
    v_s, _ = flatten_trainable(res_s.model)
    v_0, _ = flatten_trainable(res_0.model)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_0),
                               rtol=1e-4, atol=1e-6)
    # the winning model keeps its ORIGINAL (unsharded) data leaves
    assert res_s.model.X.shape == (n, d)
    assert "restart x data" in res_s.message

    # SVGP external-data contract (with the batched Adam warmup lane)
    sv_model, Xj, Yj = _setup(rng, n=64, d=3, m=8)
    rs = fit_lbfgs_multistart_sharded(sv_model, mesh, X=Xj, Y=Yj,
                                      n_starts=2, seed=0, max_iters=10,
                                      warm_adam_steps=5)
    r0 = fit_lbfgs_multistart(sv_model, lambda mm: mm.training_loss(Xj, Yj),
                              n_starts=2, seed=0, max_iters=10,
                              warm_adam_steps=5)
    np.testing.assert_allclose(rs.fun, r0.fun, rtol=1e-6)


def test_multistart_2d_mesh_validation(rng):
    from oak_tpu.models import SGPR
    from oak_tpu.parallel import fit_lbfgs_multistart_sharded

    X = rng.normal(size=(64, 2))
    y = X[:, :1]
    k = OAKKernel.create(num_dims=2, max_interaction_depth=1)
    model = SGPR.create(X, y, k, Z=X[:4].copy(), noise_variance=0.1)

    with pytest.raises(ValueError, match="2-D mesh"):
        fit_lbfgs_multistart_sharded(model, make_mesh(8), n_starts=2)
    with pytest.raises(ValueError, match="divisible"):
        fit_lbfgs_multistart_sharded(model, _mesh_2d(), n_starts=3)
    Xbad = rng.normal(size=(62, 2))  # 62 not divisible by the 4 data devices
    mbad = SGPR.create(Xbad, Xbad[:, :1], k, Z=Xbad[:4].copy(),
                       noise_variance=0.1)
    with pytest.raises(ValueError, match="divisible"):
        fit_lbfgs_multistart_sharded(mbad, _mesh_2d(), n_starts=2)


def test_oak_model_optimise_restarts_data_mesh(rng):
    """oak_model.optimise(restarts=K, data_mesh=2-D mesh) end-to-end: the
    composed restarts-and-data-sharded fit lands within trajectory-drift
    distance of the unsharded multistart."""
    from oak_tpu.model import oak_model

    n, d = 64, 3
    X = rng.normal(size=(n, d))
    y = np.sin(X[:, 0]) + 0.5 * X[:, 1]

    def build():
        oak = oak_model(max_interaction_depth=2, use_normalising_flow=False)
        oak.fit(X, y, optimise=False)
        return oak

    oak_s = build()
    res_s = oak_s.optimise(max_iters=15, restarts=2, data_mesh=_mesh_2d())
    oak_0 = build()
    res_0 = oak_0.optimise(max_iters=15, restarts=2)
    np.testing.assert_allclose(res_s.fun, res_0.fun, rtol=1e-6)
