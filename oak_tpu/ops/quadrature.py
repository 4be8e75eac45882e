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


def gauss_hermite(fn, mean: jnp.ndarray, var: jnp.ndarray,
                  num_points: int = DEFAULT_NUM_POINTS) -> jnp.ndarray:
    """E_{x ~ N(mean, var)}[fn(x)], elementwise over mean/var of any shape."""
    x, w = _gh_points(num_points)
    x = jnp.asarray(x, mean.dtype)
    w = jnp.asarray(w, mean.dtype)
    grid = mean[..., None] + jnp.sqrt(jnp.maximum(var, 0.0))[..., None] * x
    return jnp.sum(fn(grid) * w, axis=-1)


def log_gauss_hermite(log_fn, mean: jnp.ndarray, var: jnp.ndarray,
                      num_points: int = DEFAULT_NUM_POINTS) -> jnp.ndarray:
    """log E[exp(log_fn(x))] with a logsumexp for stability."""
    x, w = _gh_points(num_points)
    x = jnp.asarray(x, mean.dtype)
    logw = jnp.log(jnp.asarray(w, mean.dtype))
    grid = mean[..., None] + jnp.sqrt(jnp.maximum(var, 0.0))[..., None] * x
    return logsumexp(log_fn(grid) + logw, axis=-1)
