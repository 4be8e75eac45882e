"""oak_model API-parity tests (reference tests/test_oak_model.py patterns):
smoke fit/predict/loglik grids, constructor validation matrices, flows skipped
on discrete/GMM dims, save/load roundtrip, first-class classification."""

import numpy as np
import pytest

from oak_tpu import oak_model


def _regression_data(rng, n=64, d=3):
    X = rng.normal(size=(n, d))
    y = np.sin(X[:, 0]) + 0.5 * X[:, 1] + 0.1 * rng.normal(size=n)
    return X, y.reshape(-1, 1)


@pytest.mark.parametrize("sparse", [False, True])
def test_fit_predict_beats_mean(rng, sparse):
    X, y = _regression_data(rng)
    oak = oak_model(max_interaction_depth=2, num_inducing=16, sparse=sparse)
    oak.fit(X, y, optimise=True)
    pred = oak.predict(X)
    rmse = np.sqrt(np.mean((pred - y[:, 0]) ** 2))
    rmse_mean = np.sqrt(np.mean((y[:, 0].mean() - y[:, 0]) ** 2))
    assert rmse < rmse_mean
    ll = oak.get_loglik(X, y)
    assert np.isfinite(ll)


def test_predict_out_of_range_raises_and_clip_works(rng):
    X, y = _regression_data(rng, n=40)
    oak = oak_model(max_interaction_depth=1)
    oak.fit(X, y, optimise=False)
    X_out = X.copy()
    X_out[0, 0] = X[:, 0].min() - 100.0  # far outside the flow's log-offset domain
    with pytest.raises(ValueError):
        oak.predict(X_out)
    pred = oak.predict(X_out, clip=True)
    assert np.isfinite(pred).all()


def test_empirical_measure_on_discrete_raises(rng):
    X, y = _regression_data(rng)
    X[:, 1] = (X[:, 1] > 0).astype(float)
    oak = oak_model(binary_feature=[1], empirical_measure=[1])
    with pytest.raises(ValueError):
        oak.fit(X, y, optimise=False)


def test_gmm_measure_on_discrete_raises(rng):
    X, y = _regression_data(rng)
    X[:, 2] = (X[:, 2] > 0).astype(float)
    oak = oak_model(binary_feature=[2], gmm_measure=[0, 0, 2])
    with pytest.raises(ValueError):
        oak.fit(X, y, optimise=False)


def test_gmm_measure_wrong_length_raises(rng):
    X, y = _regression_data(rng)
    oak = oak_model(gmm_measure=[2, 2])
    with pytest.raises(ValueError):
        oak.fit(X, y, optimise=False)


def test_overlapping_binary_categorical_raises(rng):
    X, y = _regression_data(rng)
    oak = oak_model(binary_feature=[0], categorical_feature=[0])
    with pytest.raises(ValueError):
        oak.fit(X, y, optimise=False)


def test_flows_skipped_on_discrete_and_gmm(rng):
    n = 60
    X = np.column_stack([
        rng.normal(size=n),
        rng.integers(0, 2, n).astype(float),
        rng.normal(size=n),
    ])
    y = rng.normal(size=(n, 1))
    oak = oak_model(binary_feature=[1], gmm_measure=[0, 0, 2])
    oak.fit(X, y, optimise=False)
    assert oak.input_flows[0] is not None
    assert oak.input_flows[1] is None
    assert oak.input_flows[2] is None  # GMM dim untouched
    np.testing.assert_array_equal(oak.X_scaled[:, 1], X[:, 1])
    np.testing.assert_array_equal(oak.X_scaled[:, 2], X[:, 2])


def test_mixed_types_fit_and_sobol(rng):
    n = 80
    X = np.column_stack([
        rng.normal(size=n),
        rng.integers(0, 2, n).astype(float),
        rng.integers(0, 3, n).astype(float),
    ])
    y = (X[:, 0] + X[:, 1] - 0.5 * X[:, 2] + 0.1 * rng.normal(size=n)).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=2, binary_feature=[1],
                    categorical_feature=[2])
    oak.fit(X, y, optimise=True)
    sob = oak.get_sobol()
    assert len(sob) == len(oak.tuple_of_indices)
    np.testing.assert_allclose(sob.sum(), 1.0, rtol=1e-6)
    by_order = oak.get_sobol_by_order()
    assert by_order.shape == (2,)


def test_empirical_measure_fit(rng):
    X, y = _regression_data(rng, n=50)
    oak = oak_model(max_interaction_depth=1, empirical_measure=[0])
    oak.fit(X, y, optimise=False)
    assert oak.empirical_locations[0] is not None
    assert oak.input_flows[0] is None
    sob = oak.get_sobol()
    assert np.isfinite(sob).all()


def test_save_load_roundtrip(tmp_path, rng):
    X, y = _regression_data(rng, n=40)
    oak = oak_model(max_interaction_depth=2)
    oak.fit(X, y, optimise=True)
    pred0 = oak.predict(X)
    sob0 = oak.get_sobol()

    path = tmp_path / "model.npz"
    oak.save(path)
    oak2 = oak_model.load(path)
    pred1 = oak2.predict(X)
    sob1 = oak2.get_sobol()
    np.testing.assert_allclose(pred0, pred1, rtol=1e-10)
    np.testing.assert_allclose(sob0, sob1, rtol=1e-10)


def test_classification_first_class(rng):
    n = 100
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=2, num_inducing=24,
                    likelihood="bernoulli")
    oak.fit(X, y, optimise=True)
    prob = oak.predict_proba(X, clip=True)
    acc = np.mean((prob > 0.5).astype(float) == y[:, 0])
    assert acc > 0.8
    nll = -oak.get_loglik(X, y)
    assert np.isfinite(nll)
    sob = oak.get_sobol()
    assert np.isfinite(sob).all()


def test_plot_smoke(tmp_path, rng):
    X, y = _regression_data(rng, n=50)
    oak = oak_model(max_interaction_depth=2)
    oak.fit(X, y, optimise=True)
    figs = oak.plot(top_n=3, save_fig=str(tmp_path / "figs"))
    assert len(figs) == 3
    assert any(p.suffix == ".pdf" for p in (tmp_path / "figs").iterdir())


def test_minibatch_training_improves(rng):
    n = 300
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] > 0).astype(float).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=2, num_inducing=16,
                    likelihood="bernoulli")
    oak.fit(X, y, optimise=False)
    loss0 = float(oak._loss_fn()(oak.m))
    res = oak.optimise_minibatch(batch_size=64, steps=60, lr=2e-2)
    loss1 = float(oak._loss_fn()(oak.m))
    assert loss1 < loss0


def test_export_predict_matches_predict(rng):
    X, y = _regression_data(rng, n=48)
    oak = oak_model(max_interaction_depth=2)
    oak.fit(X, y, optimise=True)
    f = oak.export_predict()
    p1 = np.asarray(f(X))
    p2 = oak.predict(X, clip=True)
    np.testing.assert_allclose(p1, p2, rtol=1e-8, atol=1e-10)


def test_latent_effect_plot_branch(rng):
    """plot_single_effect(i == D) on an SVGP: the reference's latent-effect
    branch (plotting_utils.py:80-84) — here the summed order-1 latent
    profile over the standardized scale; must not crash and must produce a
    figure."""
    import matplotlib
    matplotlib.use("Agg")
    from oak_tpu.plotting import plot_single_effect

    n = 60
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] > 0).astype(float).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=2, num_inducing=12,
                    likelihood="bernoulli")
    oak.fit(X, y, optimise=False)
    fig = plot_single_effect(oak.m, i=2, covariate_name="latent",
                             data=(oak.X_scaled, oak.Y_scaled))
    assert fig is not None


def test_normalizer_reference_aliases(rng):
    """Normalizer.KL_objective / Normalizer.plot — the reference's exact
    method names (normalising_flow.py:58-79)."""
    import matplotlib
    matplotlib.use("Agg")
    from oak_tpu.flows import Normalizer

    x = rng.gamma(2.0, 1.0, size=200)
    nz = Normalizer.create(x, log=True)
    import jax.numpy as jnp

    kl_a = float(nz.KL_objective(x))
    kl_b = float(nz.kl_objective(jnp.asarray(x)))
    assert kl_a == kl_b
    nz.plot(x)


def test_optimise_compile_flag(rng):
    """optimise(compile=False) with the scipy optimizer evaluates eagerly
    (reference Scipy(compile=) semantics) and still trains."""
    X, y = _regression_data(rng, n=40)
    oak = oak_model(max_interaction_depth=2, optimizer="scipy")
    oak.fit(X, y, optimise=False)
    res = oak.optimise(max_iters=5, compile=False)
    assert np.isfinite(res.fun)


def test_fit_lbfgs_reports_convergence(rng):
    from oak_tpu.optim import fit_lbfgs

    X, y = _regression_data(rng, n=40)
    oak = oak_model(max_interaction_depth=2)
    oak.fit(X, y, optimise=False)
    res = fit_lbfgs(oak.m, lambda m: m.training_loss(), max_iters=3)
    assert res.num_iters == 3 and not res.success
    assert res.grad_norm is not None and "max_iters" in res.message


def test_plot_smoke_mixed_types(tmp_path, rng):
    """Binary / categorical / second-order-binary plot paths — the reference
    shipped a NameError in plot_single_effect_binary (plotting_utils.py:427)
    precisely because these were never smoke-tested."""
    import matplotlib
    matplotlib.use("Agg")

    n = 80
    X = np.column_stack([
        rng.integers(0, 2, n).astype(float),       # binary
        rng.integers(0, 3, n).astype(float),       # categorical
        rng.normal(size=n),                        # continuous
    ])
    y = (X[:, 0] + 0.5 * X[:, 1] + np.sin(X[:, 2])
         + 0.3 * X[:, 0] * X[:, 2] + 0.1 * rng.normal(size=n)).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=2, binary_feature=[0],
                    categorical_feature=[1])
    oak.fit(X, y, optimise=True)
    figs = oak.plot(top_n=6, save_fig=str(tmp_path / "figs"))
    assert len(figs) >= 4
    assert any(p.suffix == ".pdf" for p in (tmp_path / "figs").iterdir())


def test_latent_effect_mixed_types_excludes_discrete(rng):
    """The latent-effect plot must skip binary/categorical dims (their table
    kernels are meaningless on a continuous grid) and must use the full
    covariance of the summed components, not the sum of marginal variances."""
    import matplotlib
    matplotlib.use("Agg")
    from oak_tpu.plotting import _summed_order1_posterior, _component_posterior
    from oak_tpu.plotting import plot_single_effect

    n = 70
    X = np.column_stack([
        rng.integers(0, 3, n).astype(float),
        rng.normal(size=n),
        rng.normal(size=n),
    ])
    y = (X[:, 1] + np.sin(X[:, 2])).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=2, categorical_feature=[0])
    oak.fit(X, y, optimise=False)

    xx = np.linspace(-3, 3, 50)
    mu, var = _summed_order1_posterior(oak.m, xx)
    assert np.isfinite(mu).all() and (var >= 0).all()

    # cross-covariance identity: Var(f1+f2) = Var(f1) + Var(f2) + 2 Cov
    import jax.numpy as jnp
    from oak_tpu.kernels.oak_kernel import kernel_K

    alpha, Qinv = oak.m.posterior_stats()
    Xc = np.asarray(oak.m.data[0])
    v = float(np.asarray(oak.m.kernel.variances[1].value))
    ks = [k for k in oak.m.kernel.kernels if k.active_dim in (1, 2)]
    Kx = [v * np.asarray(kernel_K(k, jnp.asarray(xx),
                                  jnp.asarray(Xc[:, k.active_dim]))) for k in ks]
    _, var1 = _component_posterior(oak.m, [1], [xx])
    _, var2 = _component_posterior(oak.m, [2], [xx])
    cov12 = -np.einsum("sm,mn,sn->s", Kx[0], np.asarray(Qinv), Kx[1])
    np.testing.assert_allclose(var, var1 + var2 + 2 * cov12, rtol=1e-8,
                               atol=1e-10)

    fig = plot_single_effect(oak.m, i=3, covariate_name="latent",
                             data=(oak.X_scaled, oak.Y_scaled))
    assert fig is not None


def test_latent_plot_ignores_data_scatter_flags(rng):
    """The latent branch's 1000-point grid cannot be paired with the n-row
    training Y; both scatter flags must be no-ops there."""
    import matplotlib
    matplotlib.use("Agg")
    from oak_tpu.plotting import plot_single_effect

    n = 40
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] > 0).astype(float).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=1, num_inducing=8,
                    likelihood="bernoulli")
    oak.fit(X, y, optimise=False)
    fig = plot_single_effect(oak.m, i=2, plot_raw_data=True,
                             plot_corrected_data=True,
                             data=(oak.X_scaled, oak.Y_scaled))
    assert fig is not None


def test_degenerate_and_pathological_detection(rng):
    """The two f32 optimizer traps are detected: all-noise (kernel collapsed,
    noise explains y), all-collapsed (kernel AND likelihood floored — housing
    fold-0 signature), and interpolation collapse (lik at floor, kernel
    exploded)."""
    import jax.numpy as jnp

    from oak_tpu.kernels import OAKKernel
    from oak_tpu.model import oak_model
    from oak_tpu.models import GPR

    X = rng.normal(size=(15, 2))
    m = GPR.create(X, X[:, :1],
                   OAKKernel.create(num_dims=2, max_interaction_depth=2),
                   noise_variance=0.01)
    assert not oak_model._degenerate_noise_fit(m)
    assert not oak_model._pathological_fit(m, 1.0)

    def set_vars(model, order_vals, lik):
        variances = tuple(
            v.assign(jnp.asarray(val)) for v, val in
            zip(model.kernel.variances, [1.0] + list(order_vals)))
        return model.replace(
            kernel=model.kernel.replace(variances=variances),
            likelihood=model.likelihood.replace(
                variance=model.likelihood.variance.assign(lik)))

    # all-noise: kernel ~0, noise ~Var(y)
    assert oak_model._degenerate_noise_fit(set_vars(m, [1e-6, 1e-6], 1.0))
    # all-collapsed: kernel ~0 AND likelihood at its floor
    assert oak_model._degenerate_noise_fit(set_vars(m, [1e-6, 1e-6], 1e-6))
    # interpolation collapse: lik floored, kernel exploded
    assert oak_model._pathological_fit(set_vars(m, [1e5, 1e5], 1e-8), -5.0)
    # non-finite loss / params
    assert oak_model._pathological_fit(m, float("nan"))
