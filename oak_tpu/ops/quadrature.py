"""Gauss-Hermite quadrature over 1-D Gaussians.

Replaces GPflow's ``ndiagquad``-based expectations used by the Bernoulli
likelihood (variational expectations and predict_log_density) in the
reference's classification path (uci_classification_train.py:108-135).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import logsumexp

DEFAULT_NUM_POINTS = 20  # GPflow default for quadrature


@lru_cache(maxsize=None)
def _gh_points(n: int):
    x, w = np.polynomial.hermite_e.hermegauss(n)  # probabilists' Hermite
    w = w / np.sqrt(2.0 * np.pi)
    return x, w


def _safe_scale(var: jnp.ndarray) -> jnp.ndarray:
    """sqrt of the variance, clamped with a STRICTLY POSITIVE floor.

    A zero floor is a gradient trap: f32 cancellation in the SVGP predictive
    variance (K_diag - sum(A*A) + SW2) reaches var <= 0 at points coinciding
    with inducing codes (every discrete-feature dataset: the inducing Z are
    the data's own level codes). ``sqrt(maximum(var, 0.0))`` is then finite
    FORWARD but its backward is sqrt'(0) = inf, and the inf reaches every
    parameter feeding var — kernel hyperparameters and q_sqrt — while q_mu
    (mean-only) stays finite. That poisoned the first L-BFGS update
    direction of every restart lane on the heart config while the lanes'
    stored losses stayed finite (round-4/5 NaN artifacts). With a positive
    floor, a clamped point routes the cotangent to the floor branch: the
    gradient is exactly 0 there, never inf.
    """
    floor = 1e-10 if var.dtype == jnp.float32 else 1e-30
    return jnp.sqrt(jnp.maximum(var, floor))


def gauss_hermite(fn, mean: jnp.ndarray, var: jnp.ndarray,
                  num_points: int = DEFAULT_NUM_POINTS) -> jnp.ndarray:
    """E_{x ~ N(mean, var)}[fn(x)], elementwise over mean/var of any shape."""
    x, w = _gh_points(num_points)
    x = jnp.asarray(x, mean.dtype)
    w = jnp.asarray(w, mean.dtype)
    grid = mean[..., None] + _safe_scale(var)[..., None] * x
    return jnp.sum(fn(grid) * w, axis=-1)


def log_gauss_hermite(log_fn, mean: jnp.ndarray, var: jnp.ndarray,
                      num_points: int = DEFAULT_NUM_POINTS) -> jnp.ndarray:
    """log E[exp(log_fn(x))] with a logsumexp for stability."""
    x, w = _gh_points(num_points)
    x = jnp.asarray(x, mean.dtype)
    logw = jnp.log(jnp.asarray(w, mean.dtype))
    grid = mean[..., None] + _safe_scale(var)[..., None] * x
    return logsumexp(log_fn(grid) + logw, axis=-1)
