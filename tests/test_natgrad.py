"""Natural-gradient variational updates: the Gaussian-likelihood exactness
identity (one unit step collapses the SVGP bound onto the Titsias SGPR bound)
and convergence-speed vs Adam for Bernoulli."""

import jax.numpy as jnp
import numpy as np
import pytest

from oak_tpu.kernels import OAKKernel
from oak_tpu.models import SGPR, SVGP, Bernoulli, Gaussian
from oak_tpu.optim import fit_adam
from oak_tpu.optim.natgrad import _natgrad_update, fit_natgrad_adam


def _setup(rng, n=80, d=2, m=12):
    X = rng.normal(size=(n, d))
    y = (np.sin(X[:, 0]) + 0.5 * X[:, 1] + 0.05 * rng.normal(size=n)).reshape(-1, 1)
    k = OAKKernel.create(num_dims=d, max_interaction_depth=2)
    Z = X[:m].copy()
    return k, X, y, Z


def test_one_unit_step_recovers_sgpr_bound(rng):
    """Salimbeni et al. identity: for a Gaussian likelihood the ELBO is
    conjugate in the expectation parameters, so ONE natural-gradient step
    with gamma=1 lands q(u) on the optimum and the SVGP ELBO equals the
    collapsed SGPR bound (full q_sqrt required for exactness)."""
    k, X, y, Z = _setup(rng)
    svgp = SVGP.create(k, Gaussian.create(0.01), Z, q_diag=False, whiten=True,
                       num_data=X.shape[0])
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)

    def loss(m, *a):
        return -m.elbo(Xj, Yj)

    stepped = _natgrad_update(svgp, loss, 1.0, ())
    elbo = float(stepped.elbo(Xj, Yj))
    sgpr = SGPR.create(X, y, k, Z, noise_variance=0.01)
    np.testing.assert_allclose(elbo, float(sgpr.elbo()), rtol=1e-8)
    # and it is a fixed point: a second step does not move the bound
    stepped2 = _natgrad_update(stepped, loss, 1.0, ())
    np.testing.assert_allclose(float(stepped2.elbo(Xj, Yj)), elbo, rtol=1e-8)


def test_diag_natgrad_improves(rng):
    """Finite-step natgrad is an ascent direction, not a monotone method;
    assert substantial overall ELBO improvement over a few steps."""
    k, X, y, Z = _setup(rng)
    svgp = SVGP.create(k, Gaussian.create(0.05), Z, q_diag=True, whiten=True,
                       num_data=X.shape[0])
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)

    def loss(m, *a):
        return -m.elbo(Xj, Yj)

    start = float(svgp.elbo(Xj, Yj))
    m = svgp
    for _ in range(10):
        m = _natgrad_update(m, loss, 0.25, ())
    end = float(m.elbo(Xj, Yj))
    assert np.isfinite(end) and end > start + 1.0


def test_natgrad_adam_beats_adam_bernoulli(rng):
    """Fixed small step budget: natgrad+Adam reaches a better ELBO than pure
    Adam on the raw parameterization (the point of natural gradients)."""
    n = 120
    X = rng.normal(size=(n, 2))
    y = ((X[:, 0] + 0.5 * X[:, 1] + 0.3 * rng.normal(size=n)) > 0
         ).astype(np.float64).reshape(-1, 1)
    k = OAKKernel.create(num_dims=2, max_interaction_depth=2,
                         use_sparsity_prior=True)
    Z = X[:16].copy()
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)

    def build():
        kk = OAKKernel.create(num_dims=2, max_interaction_depth=2,
                              use_sparsity_prior=True)
        return SVGP.create(kk, Bernoulli.create("logit"), Z, q_diag=True,
                           whiten=True, num_data=n)

    def loss(m, *a):
        return m.training_loss(Xj, Yj)

    steps = 60
    res_ng = fit_natgrad_adam(build(), loss, steps=steps, gamma=0.2,
                              hyper_lr=1e-2)
    res_adam = fit_adam(build(), loss, steps=steps, lr=1e-2)
    assert res_ng.fun < res_adam.fun


def test_natgrad_minibatch_path(rng):
    n = 90
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] > 0).astype(np.float64).reshape(-1, 1)
    k = OAKKernel.create(num_dims=2, max_interaction_depth=1)
    svgp = SVGP.create(k, Bernoulli.create("logit"), X[:8].copy(), q_diag=True,
                       whiten=True, num_data=n)
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)
    idx = [jnp.asarray(rng.choice(n, 30, replace=False)) for _ in range(10)]

    res = fit_natgrad_adam(
        svgp, lambda m, Xb, Yb: m.training_loss(Xb, Yb), steps=10, gamma=0.1,
        batch_fn=lambda i: (Xj[idx[i]], Yj[idx[i]]))
    assert np.isfinite(res.fun)


def test_oak_model_natgrad_optimizer(rng):
    from oak_tpu import oak_model

    n = 90
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] + 0.4 * X[:, 1] > 0).astype(float).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=2, num_inducing=12,
                    likelihood="bernoulli", optimizer="natgrad")
    oak.fit(X, y, optimise=False)
    res = oak.optimise(max_iters=80)
    assert np.isfinite(res.fun)
    prob = oak.predict_proba(X, clip=True)
    acc = np.mean((prob > 0.5).astype(float) == y[:, 0])
    assert acc > 0.8

    # gaussian-likelihood models reject natgrad with a clear error
    oak2 = oak_model(max_interaction_depth=1, optimizer="natgrad")
    oak2.fit(X, y, optimise=False)
    with pytest.raises(ValueError, match="natgrad"):
        oak2.optimise(max_iters=1)


def test_natgrad_scan_matches_per_step_loop(rng):
    from oak_tpu.optim import fit_natgrad_scan
    from oak_tpu.params import flatten_trainable

    k, X, y, Z = _setup(rng, n=40)
    svgp = SVGP.create(k, Gaussian.create(0.01), Z, q_diag=True, whiten=True,
                       num_data=X.shape[0])
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)
    idx_stream = [np.random.default_rng(i).choice(40, 16, replace=False)
                  for i in range(8)]

    def loss_fn(m, ib):
        return m.training_loss(Xj[ib], Yj[ib])

    loop = fit_natgrad_adam(
        svgp, lambda m, ib: loss_fn(m, ib), steps=8, gamma=0.5,
        batch_fn=lambda i: (jnp.asarray(idx_stream[i]),))
    scan = fit_natgrad_scan(svgp, loss_fn, steps=8, gamma=0.5,
                            batch_args=(jnp.asarray(np.stack(idx_stream)),))
    assert np.isclose(loop.fun, scan.fun, rtol=1e-10)
    v1, _ = flatten_trainable(loop.model)
    v2, _ = flatten_trainable(scan.model)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-10)


def test_optimise_minibatch_natgrad(rng):
    from oak_tpu.model import oak_model

    X = rng.normal(size=(64, 2))
    y = (X[:, 0] + 0.3 * X[:, 1] > 0).astype(float).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=2, likelihood="bernoulli")
    oak.fit(X, y, optimise=False)
    loss0 = float(oak.m.training_loss(jnp.asarray(oak.X_scaled),
                                      jnp.asarray(oak.Y_scaled)))
    res = oak.optimise_minibatch(batch_size=32, steps=40, optimizer="natgrad",
                                 gamma=0.2, lr=5e-2)
    assert res.success
    loss1 = float(oak.m.training_loss(jnp.asarray(oak.X_scaled),
                                      jnp.asarray(oak.Y_scaled)))
    assert loss1 < loss0


def test_optimise_minibatch_natgrad_mesh(rng):
    from oak_tpu.model import oak_model
    from oak_tpu.parallel import make_mesh
    from oak_tpu.params import flatten_trainable

    X = rng.normal(size=(64, 2))
    y = (X[:, 0] > 0).astype(float).reshape(-1, 1)

    def fresh():
        oak = oak_model(max_interaction_depth=2, likelihood="bernoulli")
        oak.fit(X, y, optimise=False)
        return oak

    single = fresh()
    single.optimise_minibatch(batch_size=16, steps=5, seed=3,
                              optimizer="natgrad", gamma=0.2)
    meshed = fresh()
    meshed.optimise_minibatch(batch_size=16, steps=5, seed=3, mesh=make_mesh(4),
                              optimizer="natgrad", gamma=0.2)
    v1, _ = flatten_trainable(single.m)
    v2, _ = flatten_trainable(meshed.m)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-7)


def test_minibatch_inherits_model_optimizer(rng):
    # oak_model(optimizer='natgrad') + optimise_minibatch() must run natgrad
    from unittest import mock

    from oak_tpu.model import oak_model
    from oak_tpu.optim import natgrad as ng

    X = rng.normal(size=(32, 2))
    y = (X[:, 0] > 0).astype(float).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=2, likelihood="bernoulli",
                    optimizer="natgrad")
    oak.fit(X, y, optimise=False)
    with mock.patch.object(ng, "fit_natgrad_scan",
                           wraps=ng.fit_natgrad_scan) as spy:
        oak.optimise_minibatch(batch_size=16, steps=2)
    assert spy.called


def test_natgrad_scan_steps_zero(rng):
    from oak_tpu.optim import fit_natgrad_scan

    k, X, y, Z = _setup(rng, n=20)
    svgp = SVGP.create(k, Gaussian.create(0.01), Z, q_diag=True, whiten=True,
                       num_data=X.shape[0])
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)
    res = fit_natgrad_scan(svgp, lambda m: m.training_loss(Xj, Yj), steps=0)
    assert res.num_iters == 0 and not res.success  # inf loss, nothing ran


# --------------------------------------------------------------------------- #
# mean-field (q_diag) natgrad instability at scale — the reason oak_model and
# bench build FULL-covariance q for natgrad (optim/natgrad.py STABILITY note)
# --------------------------------------------------------------------------- #
def _stressed(rng, q_diag, num_data=1_000_000, n=1024, d=16, m=128):
    """Small arrays, large num_data: training_loss scales the data term by
    num_data/batch, reproducing the large-N minibatch regime cheaply.
    Everything is f32 — the mean-field divergence is an f32 round-off
    catastrophe (theta1 = m/S with a crushed S); in f64 the same iteration
    merely converges slowly, so f32 here IS the TPU-relevant regime."""
    X = rng.normal(size=(n, d)).astype(np.float32)
    w = rng.normal(size=d) / np.sqrt(d)
    y = (np.tanh(X @ w) + 0.5 * X[:, 0] * X[:, 1]
         + 0.1 * rng.normal(size=n)).reshape(-1, 1).astype(np.float32)
    k = OAKKernel.create(num_dims=d, max_interaction_depth=3,
                         use_sparsity_prior=True, dtype=jnp.float32)
    svgp = SVGP.create(k, Gaussian.create(0.01, dtype=jnp.float32),
                       jnp.asarray(X[:m], jnp.float32), q_diag=q_diag,
                       whiten=True, num_data=num_data, dtype=jnp.float32)
    return svgp, jnp.asarray(X), jnp.asarray(y)


def _minibatch_natgrad_losses(svgp, Xj, Yj, steps=10, batch=512, gamma=0.1):
    import jax

    from oak_tpu.optim.natgrad import natgrad_adam_step
    from oak_tpu.params import flatten_trainable
    import optax

    vec, unflatten = flatten_trainable(svgp)
    opt = optax.adam(1e-2)

    def loss_fn(m, ib):
        return m.training_loss(Xj[ib], Yj[ib])

    step = jax.jit(natgrad_adam_step(opt, unflatten, loss_fn, gamma))
    st = opt.init(vec)
    r = np.random.default_rng(0)
    losses = []
    for _ in range(steps):
        ib = jnp.asarray(r.integers(0, Xj.shape[0], batch))
        vec, st, loss = step(vec, st, ib)
        losses.append(float(loss))
    return np.asarray(losses)


def test_full_q_natgrad_stable_at_scale(rng):
    """The full-covariance natgrad minibatch iteration must stay finite and
    make clear progress in the inflated-num_data regime where the mean-field
    update diverges (measured on the N=10^6 bench config)."""
    svgp, Xj, Yj = _stressed(rng, q_diag=False)
    L = _minibatch_natgrad_losses(svgp, Xj, Yj)
    assert np.isfinite(L).all(), L
    assert L[-3:].mean() < 0.9 * L[:3].mean(), L  # descending, not surviving


def test_bernoulli_full_q_natgrad_stable_at_scale(rng):
    """Non-conjugate large-N regime (reference classification setup,
    uci_classification_train.py:108-124, at gamma=0.2): the Bernoulli
    natural-gradient step has no conjugate fixed point, so its stability at
    inflated num_data is a separate claim from the Gaussian one — pin it.
    Same minibatch scaling trick as ``_stressed``: small arrays, num_data
    scaled to 10^6, so the data-term amplification matches the bench's
    ``--large-scale --bernoulli`` run."""
    svgp, Xj, Y_lat = _stressed(rng, q_diag=False)
    svgp = svgp.replace(likelihood=Bernoulli.create("logit"))
    p = 1.0 / (1.0 + np.exp(-3.0 * np.asarray(Y_lat)[:, 0]))
    labels = (rng.uniform(size=len(p)) < p).astype(np.float32).reshape(-1, 1)
    Yj = jnp.asarray(labels)
    L = _minibatch_natgrad_losses(svgp, Xj, Yj, steps=15, gamma=0.2)
    assert np.isfinite(L).all(), L
    assert L[-3:].mean() < 0.9 * L[:3].mean(), L  # descending, not surviving


def test_diag_q_natgrad_diverges_at_scale(rng):
    """Pin the documented hazard: the SAME config with a mean-field q blows
    up (this is why natgrad entry points warn on q_diag and why
    oak_model(optimizer='natgrad') builds q_diag=False). In pure f32 the
    blow-up is terminal (loss -> inf); under the suite's x64 mode the spike
    still exceeds 50x the starting loss before the overshoot-rejection
    guards claw it back — either way the iteration is unusable while the
    full-q one descends smoothly. If this test ever fails because the diag
    iteration converges, the guards can be relaxed."""
    svgp, Xj, Yj = _stressed(rng, q_diag=True)
    L = _minibatch_natgrad_losses(svgp, Xj, Yj)
    assert (not np.isfinite(L).all()) or L.max() > 50.0 * L[0], L


def test_natgrad_warns_on_q_diag(rng):
    from oak_tpu.optim import fit_natgrad_adam

    k, X, y, Z = _setup(rng, n=20)
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)
    svgp = SVGP.create(k, Gaussian.create(0.05), Z, q_diag=True, whiten=True,
                       num_data=X.shape[0])
    with pytest.warns(UserWarning, match="q_diag"):
        fit_natgrad_adam(svgp, lambda m: m.training_loss(Xj, Yj), steps=1)


def test_oak_model_natgrad_builds_full_q(rng):
    from oak_tpu.model import oak_model

    X = rng.normal(size=(32, 2))
    y = (X[:, 0] > 0).astype(float).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=2, likelihood="bernoulli",
                    optimizer="natgrad")
    oak.fit(X, y, optimise=False)
    assert oak.m.q_diag is False
    # the default (non-natgrad) construction keeps the mean-field q
    oak2 = oak_model(max_interaction_depth=2, likelihood="bernoulli")
    oak2.fit(X, y, optimise=False)
    assert oak2.m.q_diag is True


def test_full_q_model_checkpoint_roundtrip(rng, tmp_path):
    """A natgrad-constructed (q_diag=False) model must save/load through the
    wrapper checkpoint: the loader's SVGP template is built from the saved
    q_diag/whiten config, so the full [R, M, M] q_sqrt round-trips."""
    from oak_tpu import load_oak_model
    from oak_tpu.model import oak_model

    X = rng.normal(size=(48, 2))
    y = (X[:, 0] + 0.3 * rng.normal(size=48) > 0).astype(float).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=2, likelihood="bernoulli",
                    optimizer="natgrad")
    oak.fit(X, y, optimise=False)
    assert oak.m.q_diag is False
    oak.optimise(max_iters=5)
    ck = tmp_path / "full_q.npz"
    oak.save(ck)
    oak2 = load_oak_model(ck)
    assert oak2.m.q_diag is False
    assert oak2.m.q_sqrt.value.ndim == 3  # [R, M, M], not diag [M, R]
    np.testing.assert_allclose(oak2.predict_proba(X), oak.predict_proba(X),
                               rtol=1e-6, atol=1e-8)


def test_fused_and_staggered_q_update_identical(rng):
    """The fused (one-backward) and staggered (two-backward) forms of
    natgrad_adam_step linearize the q(u) natural step at the SAME point, so
    after one step the variational parameters must be bit-comparable; only
    the hyper step may differ (its gradient is taken at old-q vs post-
    natgrad-q). Checked on full-q (vmapped latent algebra) and mean-field."""
    import jax
    import optax

    from oak_tpu.optim.natgrad import natgrad_adam_step
    from oak_tpu.params import flatten_trainable

    for q_diag in (False, True):
        k, X, y, Z = _setup(rng)
        svgp = SVGP.create(k, Gaussian.create(0.01), Z, q_diag=q_diag,
                           whiten=True, num_data=X.shape[0])
        Xj, Yj = jnp.asarray(X), jnp.asarray(y)

        def loss(m, a, b):
            return m.training_loss(a, b)

        vec0, unflatten = flatten_trainable(svgp)
        opt = optax.adam(1e-2)
        st0 = opt.init(vec0)
        outs = {}
        for name, staggered in (("fused", False), ("staggered", True)):
            step = jax.jit(natgrad_adam_step(opt, unflatten, loss, 0.3,
                                             staggered=staggered))
            v1, _, l1 = step(vec0, st0, Xj, Yj)
            outs[name] = (unflatten(v1), float(l1))

        mf, _ = outs["fused"]
        ms, _ = outs["staggered"]
        np.testing.assert_allclose(np.asarray(mf.q_mu.value),
                                   np.asarray(ms.q_mu.value),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(mf.q_sqrt.value),
                                   np.asarray(ms.q_sqrt.value),
                                   rtol=1e-6, atol=1e-8)
        # the hyper steps took the same-shaped Adam move (sign pattern may
        # differ at most where the two gradients disagree); at minimum both
        # moved the hypers and stayed finite
        assert np.all(np.isfinite(np.asarray(
            flatten_trainable(mf)[0])))
        # fused reports the pre-update loss; staggered the post-natgrad
        # loss - both must be finite
        assert np.isfinite(outs["fused"][1])
        assert np.isfinite(outs["staggered"][1])


def test_fused_hyper_gradient_matches_direct(rng):
    """The fused step's hyper gradient (from the joint vjp with q severed
    by _with_eta) must equal d loss/d vec with the q entries zeroed,
    computed the plain way."""
    import jax

    from oak_tpu.optim.natgrad import _eta_params, _with_eta
    from oak_tpu.params import apply_trainable_mask, flatten_trainable

    k, X, y, Z = _setup(rng)
    svgp = SVGP.create(k, Gaussian.create(0.01), Z, q_diag=False,
                       whiten=True, num_data=X.shape[0])
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)
    vec0, unflatten = flatten_trainable(svgp)

    e1, e2 = _eta_params(svgp)
    g_joint = jax.grad(
        lambda v: _with_eta(unflatten(v), e1, e2).training_loss(Xj, Yj))(vec0)

    g_tree = jax.grad(lambda m: m.training_loss(Xj, Yj))(svgp)
    zq = jax.tree_util.tree_map(jnp.zeros_like, (g_tree.q_mu, g_tree.q_sqrt))
    g_tree = g_tree.replace(q_mu=zq[0], q_sqrt=zq[1])
    g_direct, _ = flatten_trainable(apply_trainable_mask(g_tree, svgp))

    np.testing.assert_allclose(np.asarray(g_joint), np.asarray(g_direct),
                               rtol=1e-5, atol=1e-7)


def test_staggered_reachable_from_public_fitters(rng):
    """staggered=True must be reachable through the public entry points
    (fit_natgrad_adam here; fit_natgrad_scan / data_parallel_natgrad_step /
    fit_natgrad_multistart take the same kwarg) and converge."""
    k, X, y, Z = _setup(rng)
    svgp = SVGP.create(k, Gaussian.create(0.05), Z, q_diag=False,
                       whiten=True, num_data=X.shape[0])
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)

    def loss(m, *a):
        return m.training_loss(Xj, Yj)

    res = fit_natgrad_adam(svgp, loss, steps=5, gamma=0.5, staggered=True)
    assert res.success and np.isfinite(res.fun)
    # and it descends vs the start
    start = float(svgp.training_loss(Xj, Yj))
    end = float(res.model.training_loss(Xj, Yj))
    assert end < start
