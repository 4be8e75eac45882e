"""Input measures for the orthogonality constraint.

TPU-native rebuild of /root/reference/oak/input_measures.py: each measure is a
``flax.struct`` pytree (arrays are dynamic leaves so measures can live inside
jitted model pytrees; jit specializes per measure *type*, mirroring the
reference's isinstance dispatch in ortho_rbf_kernel.py:47-152).

Weight-normalization checks happen eagerly at construction (host side), like
the asserts at input_measures.py:53, 71.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from .config import default_float


class Measure:
    """Marker base class (reference: input_measures.py:16)."""


@struct.dataclass
class UniformMeasure(Measure):
    """Uniform measure on [a, b] (reference: input_measures.py:20-28)."""

    a: jnp.ndarray
    b: jnp.ndarray

    @classmethod
    def create(cls, a: float, b: float, dtype=None) -> "UniformMeasure":
        dtype = dtype or default_float()
        return cls(a=jnp.asarray(a, dtype), b=jnp.asarray(b, dtype))


@struct.dataclass
class GaussianMeasure(Measure):
    """N(mu, var) measure (reference: input_measures.py:31-39)."""

    mu: jnp.ndarray
    var: jnp.ndarray

    @classmethod
    def create(cls, mu: float, var: float, dtype=None) -> "GaussianMeasure":
        dtype = dtype or default_float()
        return cls(mu=jnp.asarray(mu, dtype), var=jnp.asarray(var, dtype))


@struct.dataclass
class EmpiricalMeasure(Measure):
    """Weighted dirac measure on data locations (reference: input_measures.py:42-56).

    location: [M, 1]; weights: [M, 1] summing to one.
    """

    location: jnp.ndarray
    weights: jnp.ndarray

    @classmethod
    def create(cls, location, weights=None, dtype=None) -> "EmpiricalMeasure":
        dtype = dtype or default_float()
        location = jnp.asarray(location, dtype).reshape(-1, 1)
        if weights is None:
            weights = jnp.full((location.shape[0], 1), 1.0 / location.shape[0], dtype)
        else:
            weights = jnp.asarray(weights, dtype).reshape(-1, 1)
            total = float(np.asarray(weights).sum())
            if not np.isclose(total, 1.0, atol=1e-6):
                raise ValueError(f"Empirical measure weights sum to {total}, not 1")
        return cls(location=location, weights=weights)


@struct.dataclass
class MOGMeasure(Measure):
    """Mixture-of-Gaussians measure (reference: input_measures.py:59-78).

    means/variances/weights: [K]; weights sum to one.
    """

    means: jnp.ndarray
    variances: jnp.ndarray
    weights: jnp.ndarray

    @classmethod
    def create(cls, means, variances, weights, dtype=None) -> "MOGMeasure":
        dtype = dtype or default_float()
        means = jnp.asarray(means, dtype).reshape(-1)
        variances = jnp.asarray(variances, dtype).reshape(-1)
        weights = jnp.asarray(weights, dtype).reshape(-1)
        if not (means.shape == variances.shape == weights.shape):
            raise ValueError("means/variances/weights must share shape [K]")
        total = float(np.asarray(weights).sum())
        if not np.isclose(total, 1.0, atol=1e-6):
            raise ValueError(f"MOG weights sum to {total}, not 1")
        return cls(means=means, variances=variances, weights=weights)
