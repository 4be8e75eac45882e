"""Per-feature normalising flow that Gaussianizes continuous inputs.

TPU-native rebuild of /root/reference/oak/normalising_flow.py: the transform is

    T(x) = SinhArcsinh_{skew, tail}( (u - m) * s ),   u = log(x - offset) or x

with trainable (skew, tail, s, m); ``offset = min(x) - 1`` fixed when the log
branch is on (normalising_flow.py:46-51). SinhArcsinh follows the tfp
convention Y = sinh((asinh(X) + skew) * tail). Training minimizes

    KL(T#p_data || N(0,1)) ~ 0.5 E[T(x)^2] - E[log |T'(x)|]

(normalising_flow.py:74-79). Everything is scalar-parameter elementwise math —
one fused XLA kernel per feature; fitting uses the shared optimizers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from .bijectors import Exp
from .params import Param, param
from .optim import fit_scipy


@struct.dataclass
class Normalizer:
    skewness: Param
    tailweight: Param  # Exp-transformed (positive)
    scale: Param  # Exp-transformed (positive), init 1/std
    shift: Param  # init -mean
    offset: jnp.ndarray  # only used when log=True
    log: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, x: np.ndarray, log: bool = True, dtype=None) -> "Normalizer":
        from .config import default_float

        dtype = dtype or default_float()
        x = np.asarray(x, np.float64).reshape(-1)
        if log:
            offset = np.min(x) - 1.0
            u = np.log(x - offset)
        else:
            offset = 0.0
            u = x
        return cls(
            skewness=param(0.0, dtype=dtype),
            tailweight=param(1.0, Exp(), dtype=dtype),
            scale=param(1.0 / np.std(u), Exp(), dtype=dtype),
            shift=param(-np.mean(u), dtype=dtype),
            offset=jnp.asarray(offset, dtype),
            log=log,
        )

    # ------------------------------------------------------------------ #
    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        u = jnp.log(x - self.offset) if self.log else x
        z = (u + self.shift.value) * self.scale.value
        t = self.tailweight.value
        return jnp.sinh((jnp.arcsinh(z) + self.skewness.value) * t)

    def inverse(self, y: jnp.ndarray) -> jnp.ndarray:
        t = self.tailweight.value
        z = jnp.sinh(jnp.arcsinh(y) / t - self.skewness.value)
        u = z / self.scale.value - self.shift.value
        return jnp.exp(u) + self.offset if self.log else u

    def forward_log_det_jacobian(self, x: jnp.ndarray) -> jnp.ndarray:
        u = jnp.log(x - self.offset) if self.log else x
        z = (u + self.shift.value) * self.scale.value
        t = self.tailweight.value
        g = (jnp.arcsinh(z) + self.skewness.value) * t
        # log cosh(g) without overflow for |g| > ~88 in f32
        log_cosh = jnp.abs(g) + jnp.log1p(jnp.exp(-2.0 * jnp.abs(g))) - jnp.log(2.0)
        fldj = (
            log_cosh
            + jnp.log(t)
            - 0.5 * jnp.log1p(z * z)
            + jnp.log(self.scale.value)
        )
        if self.log:
            fldj = fldj - jnp.log(x - self.offset)
        return fldj

    # ------------------------------------------------------------------ #
    def kl_objective(self, x: jnp.ndarray) -> jnp.ndarray:
        """KL to N(0,1) up to a constant (normalising_flow.py:74-79)."""
        y = self.forward(x)
        return 0.5 * jnp.mean(y * y) - jnp.mean(self.forward_log_det_jacobian(x))

    # reference-name aliases (normalising_flow.py:58-79 documented surface)
    def KL_objective(self, x) -> jnp.ndarray:
        return self.kl_objective(jnp.asarray(x))

    def plot(self, x, title: str = "Normalising Flow"):
        return plot_flow(self, x, title=title)


def fit_normalizer(x: np.ndarray, log: bool = True, max_iters: int = 200,
                   dtype=None, optimizer: str = "lbfgs") -> Normalizer:
    """Build and fit a Normalizer on one feature column (reference:
    scipy-optimized KL at model_utils.py:313-317). Default is the on-device
    L-BFGS (one jitted call — the scipy bridge costs one host<->device round
    trip per objective evaluation); pass optimizer='scipy' for the bridge."""
    n = Normalizer.create(x, log=log, dtype=dtype)
    xj = jnp.asarray(np.asarray(x).reshape(-1), n.offset.dtype)
    if optimizer == "scipy":
        res = fit_scipy(n, lambda m: m.kl_objective(xj), method="L-BFGS-B",
                        max_iters=max_iters)
    else:
        from .optim import fit_lbfgs

        res = fit_lbfgs(n, lambda m: m.kl_objective(xj), max_iters=max_iters)
    return res.model


def _stacked_normalizer(X_cols: np.ndarray, log: bool, dtype) -> Normalizer:
    """One Normalizer with vector parameters [K] over K feature columns."""
    from .config import default_float

    dtype = dtype or default_float()
    X_cols = np.asarray(X_cols, np.float64)
    if log:
        offset = X_cols.min(axis=0) - 1.0
        u = np.log(X_cols - offset[None, :])
    else:
        offset = np.zeros(X_cols.shape[1])
        u = X_cols
    K = X_cols.shape[1]
    return Normalizer(
        skewness=param(np.zeros(K), dtype=dtype),
        tailweight=param(np.ones(K), Exp(), dtype=dtype),
        scale=param(1.0 / u.std(axis=0), Exp(), dtype=dtype),
        shift=param(-u.mean(axis=0), dtype=dtype),
        offset=jnp.asarray(offset, dtype),
        log=log,
    )


def fit_normalizers(X_cols: np.ndarray, log: bool = True, max_iters: int = 200,
                    dtype=None) -> list:
    """Fit flows for K feature columns in ONE on-device L-BFGS run.

    The per-dim flows are independent, so the summed KL objective optimizes
    each independently; a single jitted run replaces K scipy loops (the
    reference fits each dim with its own scipy optimizer,
    model_utils.py:305-317). Returns K scalar-parameter Normalizers.
    """
    from .optim import fit_lbfgs

    X_cols = np.asarray(X_cols, np.float64)
    n = _stacked_normalizer(X_cols, log, dtype)
    xj = jnp.asarray(X_cols, n.offset.dtype)
    res = fit_lbfgs(n, lambda m: m.kl_objective(xj), max_iters=max_iters)
    fitted = res.model

    out = []
    for k in range(X_cols.shape[1]):
        out.append(Normalizer(
            skewness=fitted.skewness.replace(raw=fitted.skewness.raw[k]),
            tailweight=fitted.tailweight.replace(raw=fitted.tailweight.raw[k]),
            scale=fitted.scale.replace(raw=fitted.scale.raw[k]),
            shift=fitted.shift.replace(raw=fitted.shift.raw[k]),
            offset=fitted.offset[k],
            log=log,
        ))
    return out


def plot_flow(normalizer: Normalizer, x, title: str = "Normalising Flow"):
    """Diagnostic scatter + marginal histograms (normalising_flow.py:58-71)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    x = np.asarray(x).reshape(-1)
    y = np.asarray(normalizer.forward(jnp.asarray(x)))
    f = plt.figure()
    ax = f.add_axes([0.3, 0.3, 0.65, 0.65])
    ax.plot(x, y, "k.", label="Gaussian")
    ax.legend()
    ax_x = f.add_axes([0.3, 0.05, 0.65, 0.25], sharex=ax)
    ax_x.hist(x, bins=20)
    ax_y = f.add_axes([0.05, 0.3, 0.25, 0.65], sharey=ax)
    ax_y.hist(y, bins=20, orientation="horizontal")
    ax_y.set_xlim(ax_y.get_xlim()[::-1])
    ax.set_title(title)
    return f


def kstest(normalizer: Normalizer, x) -> tuple:
    """KS normality test of the transformed data (normalising_flow.py:81-85)."""
    from scipy import stats

    y = np.asarray(normalizer.forward(jnp.asarray(np.asarray(x).reshape(-1))))
    return stats.kstest(y, "norm")
