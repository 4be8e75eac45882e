"""Effect plots with credible intervals.

Rebuild of /root/reference/oak/plotting_utils.py on top of the unified
posterior statistics (alpha, Qinv): every model type shares

    mean(s) = sigma2_order * K_c(s, Xcond) alpha
    var(s)  = sigma2_order * K_c_diag(s) - diag(Kc Qinv Kc^T)

instead of the reference's per-model L-vs-Qinv split (plotting_utils.py
:102-112). Fixes the reference's NameError in plot_single_effect_binary
(undefined Y_corrected_rescaled, plotting_utils.py:427) by actually computing
the corrected data. tikz export is gated on tikzplotlib availability.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

import matplotlib

matplotlib.use("Agg")
from matplotlib import pyplot as plt  # noqa: E402

from .kernels.oak_kernel import kernel_K, kernel_K_diag  # noqa: E402
from .sobol import check_single_latent  # noqa: E402


@dataclass
class FigureDescription:
    fig: "matplotlib.figure.Figure"
    description: str


def save_fig_list(fig_list: List[FigureDescription], dirname: Path) -> None:
    dirname = Path(dirname)
    dirname.mkdir(parents=True, exist_ok=True)
    for f in fig_list:
        safe = f.description.replace("/", "_")
        f.fig.savefig(dirname / (safe + ".pdf"), bbox_inches="tight")


def _save_tikz(tikz_path, title):
    if tikz_path is None:
        return
    try:
        import tikzplotlib

        tikzplotlib.save(str(tikz_path) + f"{title}.tex")
    except ImportError:
        pass


def _model_data(m, data=None):
    if data is not None:
        return np.asarray(data[0]), np.asarray(data[1])
    return np.asarray(m.data[0]), np.asarray(m.data[1])


def _conditioning_inputs(m) -> np.ndarray:
    Z = m.inducing_points
    return np.asarray(Z if Z is not None else m.data[0])


def _order_variance(m, order: int) -> float:
    k = m.kernel
    if k.share_var_across_orders:
        return float(np.asarray(k.variances[order].value))
    return 1.0


def _component_posterior(m, dims: List[int], grid_cols: List[np.ndarray]):
    """Mean and variance of one additive component on a grid.

    grid_cols[k] is the column of evaluation points for dims[k]; all columns
    have equal length S.
    """
    check_single_latent(m)
    alpha, Qinv = m.posterior_stats()
    Xc = _conditioning_inputs(m)
    order = len(dims)
    v = _order_variance(m, order)

    Kxx = None
    Kdiag = None
    for d, col in zip(dims, grid_cols):
        kd = m.kernel.kernels[d]
        g = np.asarray(kernel_K(kd, jnp.asarray(col), jnp.asarray(Xc[:, kd.active_dim])))
        gd = np.asarray(kernel_K_diag(kd, jnp.asarray(col)))
        Kxx = g if Kxx is None else Kxx * g
        Kdiag = gd if Kdiag is None else Kdiag * gd
    Kxx = v * Kxx  # [S, M]
    mu = Kxx @ np.asarray(alpha)[:, 0]
    var = v * Kdiag - np.einsum("sm,mn,sn->s", Kxx, np.asarray(Qinv), Kxx)
    return mu, np.maximum(var, 0.0)


def _summed_order1_posterior(m, xx: np.ndarray):
    """Posterior mean/variance of the SUM of the continuous dims' order-1
    effects evaluated at a shared grid (the latent-effect plot, i == D).

    Discrete (binary/categorical) dims are excluded — their kernels gather
    integer table entries and are meaningless on a continuous grid. The
    variance uses the summed cross-covariance vector: the components share
    one posterior, so Var(sum_d f_d) = sum_d prior_d - (sum_d Kxx_d) Qinv
    (sum_d Kxx_d)^T, NOT the sum of marginal variances (posterior
    cross-covariances between components are nonzero)."""
    from .kernels.oak_kernel import UnconstrainedRBF
    from .kernels.ortho_rbf import OrthogonalRBF

    check_single_latent(m)
    alpha, Qinv = m.posterior_stats()
    Xc = _conditioning_inputs(m)
    v = _order_variance(m, 1)
    Kxx_sum = None
    Kdiag_sum = None
    xxj = jnp.asarray(xx)
    for kd in m.kernel.kernels:
        if not isinstance(kd, (OrthogonalRBF, UnconstrainedRBF)):
            continue
        g = v * np.asarray(kernel_K(kd, xxj, jnp.asarray(Xc[:, kd.active_dim])))
        gd = v * np.asarray(kernel_K_diag(kd, xxj))
        Kxx_sum = g if Kxx_sum is None else Kxx_sum + g
        Kdiag_sum = gd if Kdiag_sum is None else Kdiag_sum + gd
    if Kxx_sum is None:
        raise ValueError("latent-effect plot needs at least one continuous dim")
    mu = Kxx_sum @ np.asarray(alpha)[:, 0]
    var = Kdiag_sum - np.einsum("sm,mn,sn->s", Kxx_sum, np.asarray(Qinv),
                                Kxx_sum)
    return mu, np.maximum(var, 0.0)


def _apply(t, x):
    return np.asarray(x) if t is None else np.asarray(t(x))


# --------------------------------------------------------------------------- #
def plot_single_effect(
    m, i: int, covariate_name: str = "", title: str = "",
    x_transform=None, y_transform=None, semilogy=False,
    plot_corrected_data=False, plot_raw_data=False, X_list=None,
    fontsize=22, tikz_path=None, ylim=None,
    quantile_range: Optional[List] = None, log_bin=False, num_bin: int = 100,
    data=None,
) -> FigureDescription:
    matplotlib.rcParams.update({"font.size": fontsize})
    X, Y = _model_data(m, data)
    D = m.kernel.num_dims
    latent = i == D
    if latent:
        # latent-effect branch (reference plotting_utils.py:80-84): the
        # reference sets Xi = linspace(-3, 3) with a standard-normal
        # histogram but then still indexes kernels[i], which IndexErrors for
        # an OAK kernel — dead code there. Here i == D plots the summed
        # order-1 latent profile f_lat(t) = sum_d f_d(t) over the
        # standardized scale, which is the well-defined completion of that
        # intent for additive models.
        Xi = np.random.default_rng(0).normal(size=1000)
    else:
        Xi = X[:, m.kernel.kernels[i].active_dim]

    if quantile_range is None:
        quantile_range = [0, 100]
    if latent:
        xx = np.linspace(-3.0, 3.0, 100)
        mu, var = _summed_order1_posterior(m, xx)
    else:
        xmin, xmax = np.percentile(Xi, (quantile_range[0], quantile_range[1]))
        xx = np.linspace(xmin, xmax, 100)
        mu, var = _component_posterior(m, [i], [xx])
    lower, upper = mu - 2 * np.sqrt(var), mu + 2 * np.sqrt(var)

    # the latent branch plots over a synthetic 1000-point grid; both
    # data-scatter options pair Xi with the n-row training Y and are
    # meaningless (and shape-mismatched) there
    plot_corrected_data = plot_corrected_data and not latent
    plot_raw_data = plot_raw_data and not latent
    if plot_corrected_data:
        alpha, _ = m.posterior_stats()
        Xc = _conditioning_inputs(m)
        K_full = np.asarray(m.kernel.K(jnp.asarray(X), jnp.asarray(Xc)))
        kd = m.kernel.kernels[i]
        K_i = _order_variance(m, 1) * np.asarray(
            kernel_K(kd, jnp.asarray(Xi), jnp.asarray(Xc[:, kd.active_dim]))
        )
        Y_corrected = Y - (K_full - K_i) @ np.asarray(alpha)

    xx_rescaled = _apply(x_transform, xx)
    Xi_rescaled = _apply(x_transform, Xi)
    mu_rescaled = _apply(y_transform, mu)
    lower_rescaled = _apply(y_transform, lower)
    upper_rescaled = _apply(y_transform, upper)
    Y_rescaled = _apply(y_transform, Y)

    figure = plt.figure(figsize=(8, 4))
    ax1 = figure.add_axes([0.2, 0.2, 0.75, 0.75])
    ax1.plot(xx_rescaled, mu_rescaled, linewidth=1, color="k", zorder=11)
    ax1.plot(xx_rescaled, lower_rescaled, linewidth=0.5, color="k", zorder=11)
    ax1.plot(xx_rescaled, upper_rescaled, linewidth=0.5, color="k", zorder=11)
    ax1.fill_between(xx_rescaled, lower_rescaled, upper_rescaled, alpha=0.2, color="C0")
    if plot_corrected_data:
        Yc = _apply(y_transform, Y_corrected)
        ax1.plot(Xi_rescaled, Yc[:, 0], "C0x", label="data with other effects removed")
        ax1.set_ylim(*np.percentile(Yc, (2, 98)))
    elif ylim is not None:
        ax1.set_ylim(ylim)
    ax1.set_xlim(xx_rescaled.min(), xx_rescaled.max())

    if plot_raw_data:
        ax1a = ax1.twinx()
        ax1a.plot(Xi_rescaled, Y_rescaled[:, 0], "C1x")
        ax1a.set_ylabel("Raw data", color="C1")
        ax1.set_zorder(ax1a.get_zorder() + 1)
        if semilogy:
            ax1a.semilogy()

    ax1.patch.set_visible(False)
    for tick in ax1.get_xticklabels():
        tick.set_visible(False)
    ax1.set_ylabel("$f_{" + covariate_name + "}$")
    ax1.set_title(title)

    ax2 = figure.add_axes([0.2, 0.05, 0.75, 0.15], sharex=ax1)
    bins = (
        num_bin if not log_bin
        else np.logspace(np.log10(Xi_rescaled.min() + 1),
                         np.log10(Xi_rescaled.max() + 1), num_bin)
    )
    if X_list is not None:
        ax2.hist(X_list[0], alpha=0.3, color="orange", bins=bins, label="data 1")
        ax2.hist(X_list[1], alpha=0.3, color="blue", bins=bins, label="data 2")
        ax2.legend(loc="upper right", prop={"size": 12})
    else:
        ax2.hist(Xi_rescaled.flatten(), alpha=0.2, color="grey", bins=bins)
    ax2.set_yticks([])
    ax2.set_xlabel(covariate_name)
    if semilogy:
        ax1.semilogy()
    _save_tikz(tikz_path, title)
    return FigureDescription(fig=figure, description=title)


def plot_second_order(
    m, i: int, j: int, covariate_names=None, x_transforms=None, y_transform=None,
    title: str = "", tikz_path=None, quantile_range=((2, 98), (2, 98)),
    log_axis=(False, False), xx=None, yy=None, num_bin: int = 100, data=None,
) -> FigureDescription:
    if covariate_names is None:
        covariate_names = [f"input {i}", f"input {j}"]
    X, _ = _model_data(m, data)
    Xi, Xj = X[:, i], X[:, j]

    qr = list(quantile_range) if quantile_range is not None else [None, None]
    if qr[0] is not None:
        xmin, xmax = np.percentile(Xi, tuple(qr[0]))
    else:
        xmin, xmax = Xi.min(), Xi.max()
    if qr[1] is not None:
        ymin, ymax = np.percentile(Xj, tuple(qr[1]))
    else:
        ymin, ymax = Xj.min(), Xj.max()
    xx_range = np.linspace(xmin, xmax, 50) if xx is None else xx
    yy_range = np.linspace(ymin, ymax, 50) if yy is None else yy
    gx, gy = np.meshgrid(xx_range, yy_range)
    mu, _var = _component_posterior(m, [i, j], [gx.flatten(), gy.flatten()])

    if x_transforms is None:
        x_transforms = [None, None]
    gx_r = _apply(x_transforms[0], gx)
    Xi_r = _apply(x_transforms[0], Xi)
    gy_r = _apply(x_transforms[1], gy)
    Xj_r = _apply(x_transforms[1], Xj)
    mu_r = _apply(y_transform, mu)

    figure = plt.figure(figsize=(8, 4))
    ax1 = figure.add_axes([0.2, 0.2, 0.75, 0.75])
    bins_i = bins_j = num_bin
    if log_axis and log_axis[0]:
        ax1.set_xscale("log")
        gx_r = gx_r + 1
        Xi_r = Xi_r + 1
        bins_i = np.logspace(np.log10(Xi_r.min() + 1), np.log10(Xi_r.max() + 1), num_bin)
    if log_axis and log_axis[1]:
        ax1.set_yscale("log")
        gy_r = gy_r + 1
        Xj_r = Xj_r + 1
        bins_j = np.logspace(np.log10(Xj_r.min() + 1), np.log10(Xj_r.max() + 1), num_bin)

    contours = ax1.contour(gx_r, gy_r, mu_r.reshape(gx.shape), linewidths=1.4,
                           colors="C0")
    ax1.clabel(contours, inline=1, fontsize=20)
    ax1.set_title(title)

    ax2 = figure.add_axes([0.2, 0.05, 0.75, 0.15], sharex=ax1)
    ax2.hist(Xi_r.flatten(), alpha=0.2, color="grey", bins=bins_i)
    ax2.set_yticks([])
    ax2.set_xlabel(covariate_names[0])

    ax3 = figure.add_axes([0.08, 0.2, 0.12, 0.75], sharey=ax1)
    ax3.hist(Xj_r.flatten(), alpha=0.2, color="grey", bins=bins_j,
             orientation="horizontal")
    ax3.set_xticks([])
    ax3.set_xlim(ax3.get_xlim()[::-1])
    ax3.set_ylabel(covariate_names[1])

    ax1.set_xlim(gx_r.min(), gx_r.max())
    ax1.set_ylim(gy_r.min(), gy_r.max())
    for tick in ax1.get_xticklabels() + ax1.get_yticklabels():
        tick.set_visible(False)
    _save_tikz(tikz_path, title)
    return FigureDescription(fig=figure, description=title)


def plot_single_effect_binary(
    m, i: int, binary_name: list, covariate_name: str = "",
    title: str = "Output Effect", y_transform=None, semilogy=False, tikz_path=None,
    data=None,
) -> FigureDescription:
    X, Y = _model_data(m, data)
    Xi = X[:, i]
    xx = np.array([0.0, 1.0])
    mu, var = _component_posterior(m, [i], [xx])
    lower, upper = mu - 2 * np.sqrt(var), mu + 2 * np.sqrt(var)

    # corrected data (reference intends this but hits a NameError,
    # plotting_utils.py:427)
    alpha, _ = m.posterior_stats()
    Xc = _conditioning_inputs(m)
    K_full = np.asarray(m.kernel.K(jnp.asarray(X), jnp.asarray(Xc)))
    kd = m.kernel.kernels[i]
    K_i = _order_variance(m, 1) * np.asarray(
        kernel_K(kd, jnp.asarray(Xi), jnp.asarray(Xc[:, kd.active_dim]))
    )
    Y_corrected = Y - (K_full - K_i) @ np.asarray(alpha)

    mu_r = _apply(y_transform, mu)
    lower_r = _apply(y_transform, lower)
    upper_r = _apply(y_transform, upper)
    Yc_r = _apply(y_transform, Y_corrected)

    fig, ax1 = plt.subplots(1, 1, figsize=(10, 6))
    ax1.plot([0, 0], [lower_r[0], upper_r[0]], linewidth=8, color="r")
    ax1.plot([1, 1], [lower_r[1], upper_r[1]], linewidth=8, color="r")
    ax1a = ax1.twinx()
    try:
        ax1.sharey(ax1a)
    except Exception:
        pass
    ax1a.boxplot([Yc_r[Xi == 0][:, 0], Yc_r[Xi == 1][:, 0]],
                 positions=np.array(range(2)))
    ax1a.set_xticklabels([binary_name[0], binary_name[1]])
    ax1a.set_ylabel("data with other effects removed", color="k")
    ax1.plot(1, mu_r[1], "x", linewidth=40, color="b")
    ax1.plot(0, mu_r[0], "x", linewidth=40, color="b")
    plt.xticks(np.arange(2), [binary_name[0], binary_name[1]])
    plt.xlim([-1, 2])
    plt.tight_layout()
    ax1.set_ylabel(title, color="r")
    ax1.set_title(covariate_name)
    if semilogy:
        ax1.semilogy()
        ax1a.semilogy()
    _save_tikz(tikz_path, title)
    return FigureDescription(fig=fig, description=title)


def plot_second_order_binary(
    m, i: int, j: int, binary_name: list, covariate_names=None, title: str = "",
    x_transforms=None, y_transform=None, tikz_path=None, data=None,
) -> FigureDescription:
    if covariate_names is None:
        covariate_names = [f"input {i}", f"input {j}"]
    X, _Y = _model_data(m, data)
    Xi = X[:, i]
    xmin, xmax = np.percentile(Xi, (2, 98))
    xx, yy = np.mgrid[xmin:xmax:100j, 0:1:2j]
    cols = [xx.flatten(), yy.flatten()]
    mu, var = _component_posterior(m, [i, j], cols)
    lower, upper = mu - 2 * np.sqrt(var), mu + 2 * np.sqrt(var)

    if x_transforms is None:
        xx_r = 1.0 * xx[:, 0]
        Xi_r = 1.0 * Xi
    else:
        xx_r = _apply(x_transforms[0], xx[:, 0])
        Xi_r = _apply(x_transforms[0], Xi)
    mu_r = _apply(y_transform, mu)
    lower_r = _apply(y_transform, lower)
    upper_r = _apply(y_transform, upper)

    fig, axes = plt.subplots(nrows=2, ncols=1, sharex="col", figsize=(10, 6))
    plt.subplots_adjust(left=0.25, bottom=0.25, right=1)
    sel0 = yy.flatten() == 0
    sel1 = yy.flatten() == 1
    for ax, sel, name in ((axes[0], sel0, binary_name[0]),
                          (axes[1], sel1, binary_name[1])):
        ax.plot(xx_r, mu_r[sel], linewidth=2, color="C0", zorder=10, label=name)
        ax.plot(xx_r, lower_r[sel], linewidth=0.5, color="k", zorder=11)
        ax.plot(xx_r, upper_r[sel], linewidth=0.5, color="k", zorder=11)
        ax.fill_between(xx_r, lower_r[sel], upper_r[sel], alpha=0.2, color="C0")
        ax.legend()
    axes[0].set_title(title)
    axes[0].set_xlim(xx_r.min(), xx_r.max())

    ax3 = fig.add_axes([0.25, 0.02, 0.75, 0.15], sharex=axes[1])
    ax3.hist(Xi_r.flatten(), alpha=0.2, color="grey", bins=50)
    ax3.set_yticks([])
    ax3.set_xlabel(covariate_names[0])
    for tick in axes[0].get_xticklabels() + axes[1].get_xticklabels():
        tick.set_visible(False)
    _save_tikz(tikz_path, title)
    return FigureDescription(fig=fig, description=title)


def plot_single_effect_categorical(
    m, i: int, categorical_name: list, title: str = "Output Effect",
    y_transform=None, semilogy=False, tikz_path=None,
) -> FigureDescription:
    num_cat = m.kernel.kernels[i].num_cat
    xx = np.arange(num_cat, dtype=float)
    mu, var = _component_posterior(m, [i], [xx])
    lower, upper = mu - 2 * np.sqrt(var), mu + 2 * np.sqrt(var)
    mu_r = _apply(y_transform, mu)
    lower_r = _apply(y_transform, lower)
    upper_r = _apply(y_transform, upper)

    fig, ax1 = plt.subplots(1, 1, figsize=(10, 6))
    for c in range(num_cat):
        ax1.plot([c, c], [lower_r[c], upper_r[c]], linewidth=8, color="cornflowerblue")
        ax1.plot(c, mu_r[c], "x", linewidth=20, color="r")
    plt.xticks(np.arange(num_cat), [categorical_name[c] for c in range(num_cat)])
    plt.xlim([-1, num_cat])
    plt.tight_layout()
    ax1.set_ylabel("Output Effect")
    ax1.set_title(title)
    if semilogy:
        ax1.semilogy()
    _save_tikz(tikz_path, title)
    return FigureDescription(fig=fig, description=title)


# --------------------------------------------------------------------------- #
def plot_model(
    oak, transformer_y=None, X_columns=None, X_lists=None, top_n=None,
    likelihood_variance=False, semilogy=False, save_fig=None, tikz_path=None,
    ylim=None, quantile_range=None, log_axis=(False, False), grid_range=None,
    log_bin=None, num_bin: int = 100,
) -> List[FigureDescription]:
    """Rank components by Sobol and plot the top_n effects — the dispatch
    logic of oak_model.plot (model_utils.py:526-700)."""
    num_dims = oak.num_dims
    if X_columns is None:
        X_columns = ["feature %d" % d for d in range(num_dims)]
    X_lists = X_lists or [None] * num_dims
    grid_range = grid_range or [None] * num_dims
    ylim = ylim or [None] * num_dims
    quantile_range = quantile_range or [None] * num_dims
    log_bin = log_bin or [False] * num_dims

    data = (oak.X_scaled, oak.Y_scaled)
    oak.get_sobol(likelihood_variance=likelihood_variance)
    order = np.argsort(oak.normalised_sobols)[::-1]
    tuples = oak.tuple_of_indices
    m = oak.m
    fig_list: List[FigureDescription] = []
    if top_n is None:
        top_n = len(order)
    for n in order[: min(top_n, len(order))]:
        dims = tuples[n]
        r = oak.normalised_sobols[n]
        if len(dims) == 1:
            i = dims[0]
            if i in oak.continuous_index:
                fig_list.append(plot_single_effect(
                    m, i, covariate_name=X_columns[i],
                    title=f"{X_columns[i]} (R={r:.3f})",
                    x_transform=oak._get_x_inverse_transformer(i),
                    y_transform=transformer_y, semilogy=semilogy,
                    X_list=X_lists[i], tikz_path=tikz_path, ylim=ylim[i],
                    quantile_range=quantile_range[i], log_bin=log_bin[i],
                    num_bin=num_bin, data=data))
            elif i in oak.binary_index:
                fig_list.append(plot_single_effect_binary(
                    m, i, ["0", "1"], title=f"{X_columns[i]} (R={r:.3f})",
                    y_transform=transformer_y, semilogy=semilogy,
                    tikz_path=tikz_path, data=data))
            else:
                fig_list.append(plot_single_effect_categorical(
                    m, i, [str(c) for c in range(m.kernel.kernels[i].num_cat)],
                    title=f"{X_columns[i]} (R={r:.3f})",
                    y_transform=transformer_y, semilogy=semilogy,
                    tikz_path=tikz_path))
        elif len(dims) == 2:
            i, j = dims
            if i in oak.continuous_index and j in oak.continuous_index:
                fig_list.append(plot_second_order(
                    m, i, j, [X_columns[i], X_columns[j]],
                    [oak._get_x_inverse_transformer(i),
                     oak._get_x_inverse_transformer(j)],
                    transformer_y,
                    title=f"{X_columns[i]}&{X_columns[j]} (R={r:.3f})",
                    tikz_path=tikz_path,
                    quantile_range=[quantile_range[i], quantile_range[j]],
                    log_axis=log_axis, xx=grid_range[i], yy=grid_range[j],
                    num_bin=num_bin, data=data))
            elif i in oak.continuous_index and j in oak.binary_index:
                fig_list.append(plot_second_order_binary(
                    m, i, j, ["0", "1"], [X_columns[i], X_columns[j]],
                    x_transforms=[oak._get_x_inverse_transformer(i)],
                    y_transform=transformer_y,
                    title=f"{X_columns[i]} (R={r:.3f})", tikz_path=tikz_path,
                    data=data))
            elif i in oak.binary_index and j in oak.continuous_index:
                fig_list.append(plot_second_order_binary(
                    m, j, i, ["0", "1"], [X_columns[j], X_columns[i]],
                    x_transforms=[oak._get_x_inverse_transformer(j)],
                    y_transform=transformer_y,
                    title=f"{X_columns[i]}&{X_columns[j]} (R={r:.3f})",
                    tikz_path=tikz_path, data=data))
        # orders > 2 are not plotted (reference raises NotImplementedError;
        # we skip them so plot() works on deep models)

    if save_fig is not None:
        save_fig_list(fig_list, Path(save_fig))
    return fig_list
