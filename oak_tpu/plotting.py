"""Effect plots with credible intervals.

Rebuild of /root/reference/oak/plotting_utils.py on top of the unified
posterior statistics (alpha, Qinv): every model type shares

    mean(s) = sigma2_order * K_c(s, Xcond) alpha
    var(s)  = sigma2_order * K_c_diag(s) - diag(Kc Qinv Kc^T)

instead of the reference's per-model L-vs-Qinv split (plotting_utils.py
:102-112). Fixes the reference's NameError in plot_single_effect_binary
(undefined Y_corrected_rescaled, plotting_utils.py:427) by actually computing
the corrected data. tikz export is gated on tikzplotlib availability.

Rendering is owned by :class:`EffectFigure`, a shared scaffolding for the one
layout grammar every effect plot uses (main panel + marginal histogram
strips); the five public plot functions only assemble data and call into it.
The panel geometry is pinned by tests/test_plotting_layout.py so figures stay
layout-compatible with the reference's output.
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
# Owned figure scaffolding.
#
# Every effect plot in this module speaks one layout grammar: a main panel
# carrying the effect itself (a credible band, a labelled contour field, or
# discrete interval marks), a thin marginal-histogram strip underneath
# showing where the training data lives on that axis, and — when the effect
# has a second continuous axis — a matching strip along the left edge.
# EffectFigure owns that grammar end to end: panel geometry, mark styles,
# marginal binning, the raw-data overlay axis, tick hygiene, and tikz
# export. The public plot functions below never touch figure geometry.

# Panel rectangles in figure fractions (x0, y0, width, height). The main
# panel floats above the bottom strip and right of the left strip with
# small gutters so the shared-axis panels read as a single unit.
_PANEL_GEOMETRY = {
    "main": (0.2, 0.2, 0.75, 0.75),
    "bottom": (0.2, 0.05, 0.75, 0.15),
    "left": (0.08, 0.2, 0.12, 0.75),
}


class EffectFigure:
    """Shared scaffolding for effect figures (see module docstring)."""

    BAND_COLOR = "C0"
    BAND_ALPHA = 0.2
    HIST_STYLE = {"color": "grey", "alpha": 0.2}
    #: overlay histograms for two-population comparisons (X_list option)
    OVERLAY_SERIES = (("orange", "data 1"), ("blue", "data 2"))

    def __init__(self, figsize=(8, 4), n_main: int = 1, main_rect=None,
                 main_gap: float = 0.08):
        self.fig = plt.figure(figsize=figsize)
        x0, y0, w, h = main_rect if main_rect is not None else _PANEL_GEOMETRY["main"]
        self._main_rect = (x0, y0, w, h)
        if n_main == 1:
            rows = [(x0, y0, w, h)]
        else:
            panel_h = (h - main_gap * (n_main - 1)) / n_main
            rows = [
                (x0, y0 + (n_main - 1 - k) * (panel_h + main_gap), w, panel_h)
                for k in range(n_main)
            ]
        first = self.fig.add_axes(rows[0])
        self.mains = [first] + [
            self.fig.add_axes(r, sharex=first) for r in rows[1:]
        ]
        self.main = first
        self.bottom = None
        self.left = None

    # ---- main-panel marks -------------------------------------------------
    def band(self, x, mean, lower, upper, ax=None, mean_style=None):
        """Posterior mean with a +/-2 sigma credible envelope.

        The envelope is a translucent fill with thin dark edge lines; the
        mean defaults to a heavier dark line but can be restyled (the
        stacked binary panels use a colored, legend-labelled mean).
        """
        ax = self.main if ax is None else ax
        ax.fill_between(x, lower, upper,
                        alpha=self.BAND_ALPHA, color=self.BAND_COLOR)
        for edge in (lower, upper):
            ax.plot(x, edge, color="k", linewidth=0.5, zorder=11)
        style = mean_style if mean_style is not None else {
            "color": "k", "linewidth": 1, "zorder": 11}
        ax.plot(x, mean, **style)
        return ax

    def contour_field(self, gx, gy, z, label_fontsize: int = 20):
        """Labelled contour field of a two-dim effect on the main panel."""
        marks = self.main.contour(gx, gy, z,
                                  colors=self.BAND_COLOR, linewidths=1.4)
        self.main.clabel(marks, inline=1, fontsize=label_fontsize)
        return marks

    def interval_marks(self, lower, upper, mean, level_names,
                       bar_color, point_color):
        """Discrete effect: a vertical credible bar plus a mean cross per
        level, with the level names as the x axis."""
        levels = np.arange(len(level_names))
        for c in levels:
            self.main.plot([c, c], [lower[c], upper[c]],
                           linewidth=8, color=bar_color)
        self.main.plot(levels, mean, "x", color=point_color, linestyle="none")
        self.main.set_xticks(levels)
        self.main.set_xticklabels(level_names)
        self.main.set_xlim(-1, len(level_names))

    def raw_overlay(self, x, y, semilogy: bool = False):
        """Raw observations on a secondary right-hand axis, drawn behind the
        effect band (the main panel is lifted above it)."""
        twin = self.main.twinx()
        twin.plot(x, y, "C1x")
        twin.set_ylabel("Raw data", color="C1")
        if semilogy:
            twin.semilogy()
        self.main.set_zorder(twin.get_zorder() + 1)
        self.main.patch.set_visible(False)
        return twin

    # ---- marginal histogram strips -----------------------------------------
    @staticmethod
    def _bins(values, num_bin: int, log: bool):
        if not log:
            return num_bin
        lo, hi = np.log10(values.min() + 1), np.log10(values.max() + 1)
        return np.logspace(lo, hi, num_bin)

    def _strip_rect(self, side: str):
        """Strip rectangles derived from the main panel's rect — a custom
        main_rect keeps its strips aligned (ADVICE r3): the bottom strip
        shares the main panel's x0/width and splits the margin under it
        1:3 gutterwise; the left strip shares y0/height and splits the
        margin left of it 2:3. For the default main rect these reproduce
        _PANEL_GEOMETRY exactly (pinned in tests/test_plotting_layout.py)."""
        x0, y0, w, h = self._main_rect
        if side == "bottom":
            return (x0, 0.25 * y0, w, 0.75 * y0)
        return (0.4 * x0, y0, 0.6 * x0, h)

    def bottom_hist(self, values, xlabel: str, num_bin: int = 100,
                    log_bins: bool = False, overlay=None):
        """Marginal histogram strip under the main panel (shared x)."""
        ax = self.fig.add_axes(self._strip_rect("bottom"), sharex=self.main)
        values = np.ravel(np.asarray(values))
        bins = self._bins(values, num_bin, log_bins)
        if overlay is not None:
            for series, (color, name) in zip(overlay, self.OVERLAY_SERIES):
                ax.hist(series, bins=bins, alpha=0.3, color=color, label=name)
            ax.legend(loc="upper right", prop={"size": 12})
        else:
            ax.hist(values, bins=bins, **self.HIST_STYLE)
        ax.set_yticks([])
        ax.set_xlabel(xlabel)
        self.bottom = ax
        return ax

    def left_hist(self, values, ylabel: str, num_bin: int = 100,
                  log_bins: bool = False):
        """Marginal histogram strip left of the main panel (shared y),
        with counts growing leftwards, toward the figure edge."""
        ax = self.fig.add_axes(self._strip_rect("left"), sharey=self.main)
        values = np.ravel(np.asarray(values))
        ax.hist(values, bins=self._bins(values, num_bin, log_bins),
                orientation="horizontal", **self.HIST_STYLE)
        ax.set_xticks([])
        ax.invert_xaxis()
        ax.set_ylabel(ylabel)
        self.left = ax
        return ax

    # ---- finishing ----------------------------------------------------------
    def finish(self, title: str, tikz_path=None) -> FigureDescription:
        """Tick hygiene + export. A main-panel axis that shares an axis with
        a marginal strip drops its duplicate tick labels — the strip carries
        them."""
        if self.bottom is not None:
            for ax in self.mains:
                plt.setp(ax.get_xticklabels(), visible=False)
        if self.left is not None:
            plt.setp(self.main.get_yticklabels(), visible=False)
        _save_tikz(tikz_path, title)
        return FigureDescription(fig=self.fig, description=title)


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

    ef = EffectFigure()
    ef.band(xx_rescaled, mu_rescaled, lower_rescaled, upper_rescaled)
    if plot_corrected_data:
        Yc = _apply(y_transform, Y_corrected)
        ef.main.plot(Xi_rescaled, Yc[:, 0], "C0x",
                     label="data with other effects removed")
        ef.main.set_ylim(*np.percentile(Yc, (2, 98)))
    elif ylim is not None:
        ef.main.set_ylim(ylim)
    ef.main.set_xlim(xx_rescaled.min(), xx_rescaled.max())
    if plot_raw_data:
        ef.raw_overlay(Xi_rescaled, Y_rescaled[:, 0], semilogy=semilogy)
    ef.main.set_ylabel("$f_{" + covariate_name + "}$")
    ef.main.set_title(title)
    ef.bottom_hist(Xi_rescaled, covariate_name, num_bin=num_bin,
                   log_bins=log_bin, overlay=X_list)
    if semilogy:
        ef.main.semilogy()
    return ef.finish(title, tikz_path)


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

    log_x = bool(log_axis and log_axis[0])
    log_y = bool(log_axis and log_axis[1])
    ef = EffectFigure()
    if log_x:
        # plot log(x+1) when the axis is logarithmic
        ef.main.set_xscale("log")
        gx_r = gx_r + 1
        Xi_r = Xi_r + 1
    if log_y:
        ef.main.set_yscale("log")
        gy_r = gy_r + 1
        Xj_r = Xj_r + 1
    ef.contour_field(gx_r, gy_r, mu_r.reshape(gx.shape))
    ef.main.set_title(title)
    ef.bottom_hist(Xi_r, covariate_names[0], num_bin=num_bin, log_bins=log_x)
    ef.left_hist(Xj_r, covariate_names[1], num_bin=num_bin, log_bins=log_y)
    ef.main.set_xlim(gx_r.min(), gx_r.max())
    ef.main.set_ylim(gy_r.min(), gy_r.max())
    return ef.finish(title, tikz_path)


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

    ef = EffectFigure(figsize=(10, 6), main_rect=(0.12, 0.12, 0.76, 0.8))
    box = ef.main.twinx()
    box.boxplot([Yc_r[Xi == 0][:, 0], Yc_r[Xi == 1][:, 0]], positions=[0, 1])
    box.set_ylabel("data with other effects removed", color="k")
    try:
        ef.main.sharey(box)
    except Exception:
        pass
    ef.interval_marks(lower_r, upper_r, mu_r,
                      [binary_name[0], binary_name[1]],
                      bar_color="r", point_color="b")
    ef.main.set_ylabel(title, color="r")
    ef.main.set_title(covariate_name)
    if semilogy:
        ef.main.semilogy()
        box.semilogy()
    return ef.finish(title, tikz_path)


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

    # one stacked band panel per binary level, sharing the continuous axis
    ef = EffectFigure(figsize=(10, 6), n_main=2)
    levels = yy.flatten()
    for ax, level, name in ((ef.mains[0], 0, binary_name[0]),
                            (ef.mains[1], 1, binary_name[1])):
        sel = levels == level
        ef.band(xx_r, mu_r[sel], lower_r[sel], upper_r[sel], ax=ax,
                mean_style={"linewidth": 2, "color": "C0", "zorder": 10,
                            "label": name})
        ax.legend()
    ef.mains[0].set_title(title)
    ef.mains[0].set_xlim(xx_r.min(), xx_r.max())
    ef.bottom_hist(Xi_r, covariate_names[0], num_bin=50)
    return ef.finish(title, tikz_path)


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

    ef = EffectFigure(figsize=(10, 6), main_rect=(0.12, 0.12, 0.76, 0.8))
    ef.interval_marks(lower_r, upper_r, mu_r,
                      [categorical_name[c] for c in range(num_cat)],
                      bar_color="cornflowerblue", point_color="r")
    ef.main.set_ylabel("Output Effect")
    ef.main.set_title(title)
    if semilogy:
        ef.main.semilogy()
    return ef.finish(title, tikz_path)


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
