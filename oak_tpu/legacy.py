"""Duvenaud-style product-kernel path.

Rebuild of the reference's legacy utilities (utils.py:32-113, 438-488): an
additive GP expressed as an explicit *list* of product kernels (one per
selected dim tuple) plus a constant kernel, each factor an OrthogonalRBF with
its own trainable variance — the "Additive GPs" (Duvenaud 2011)
parameterization, as opposed to the shared-order-variance OAK kernel. Used by
the reference for baselines and for Sobol computation on hand-built kernel
lists.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct

from .kernels import OrthogonalRBF
from .kernels.oak_kernel import kernel_K, kernel_K_diag
from .measures import EmpiricalMeasure, GaussianMeasure, Measure
from .params import Param, bounded, positive
from .sobol import compute_L_for_kernel


@struct.dataclass
class ConstantKernel:
    """gpflow.kernels.Constant equivalent (utils.py:110)."""

    variance: Param

    @classmethod
    def create(cls, variance: float = 1.0, dtype=None) -> "ConstantKernel":
        return cls(variance=positive(variance, dtype=dtype))

    def K(self, X, X2=None):
        n = X.shape[0]
        m = n if X2 is None else X2.shape[0]
        return self.variance.value * jnp.ones((n, m), jnp.asarray(X).dtype)

    def K_diag(self, X):
        return self.variance.value * jnp.ones((X.shape[0],), jnp.asarray(X).dtype)


@struct.dataclass
class ProductKernel:
    """Product of constrained 1-D kernels over distinct dims
    (gpflow.kernels.Product equivalent for this use)."""

    kernels: Tuple

    @property
    def active_dims(self) -> List[int]:
        return [k.active_dim for k in self.kernels]

    def K(self, X, X2=None):
        X = jnp.asarray(X)
        X2_ = X if X2 is None else jnp.asarray(X2)
        out = None
        for k in self.kernels:
            g = kernel_K(k, X[:, k.active_dim], X2_[:, k.active_dim])
            out = g if out is None else out * g
        return out

    def K_diag(self, X):
        X = jnp.asarray(X)
        out = None
        for k in self.kernels:
            g = kernel_K_diag(k, X[:, k.active_dim])
            out = g if out is None else out * g
        return out


def grammer_to_kernel(
    selected_dims: Sequence[Sequence[int]],
    offset: int = 0,
    measure: Optional[Measure] = None,
    lengthscales_lo: float = 1e-3,
    lengthscales_hi: float = 100.0,
    variance_lo: float = 0.01,
    variance_hi: float = 100.0,
    seed: int = 0,
) -> List:
    """Build product kernels for each selected dim tuple with random bounded
    hyperparameters, plus a trailing constant kernel (utils.py:63-113).
    Non-leading factors get unit fixed variance, as in the reference
    (utils.py:101-103)."""
    if measure is None:
        measure = GaussianMeasure.create(0.0, 10.0)
    rng = np.random.default_rng(seed)
    out: List = []
    for dims in selected_dims:
        factors = []
        for j, d in enumerate(dims):
            ls = float(rng.uniform(lengthscales_lo, lengthscales_hi))
            var = float(rng.uniform(variance_lo, variance_hi))
            dim = d + offset
            if isinstance(measure, EmpiricalMeasure):
                m = EmpiricalMeasure.create(measure.location[:, dim])
            else:
                m = measure
            k = OrthogonalRBF.create(m, lengthscale=ls, variance=var, active_dim=dim)
            k = k.replace(
                lengthscale=bounded(lengthscales_lo, lengthscales_hi, ls),
                variance=(bounded(variance_lo, variance_hi, var) if j == 0
                          else positive(1.0, trainable=False)),
            )
            factors.append(k)
        out.append(ProductKernel(kernels=tuple(factors)))
    out.append(ConstantKernel.create(10.0))
    return out


def extract_active_dims(kernel_list: Sequence) -> List[List[int]]:
    """Active-dim tuples of each non-constant kernel (utils.py:45-60)."""
    out = []
    for k in kernel_list:
        if isinstance(k, ProductKernel):
            out.append(list(k.active_dims))
        elif isinstance(k, ConstantKernel):
            continue
        else:
            out.append([k.active_dim])
    return out


def model_to_kernel_list(kernel_list: Sequence, selected_dims: Sequence) -> List:
    """Reorder a kernel list to match selected_dims, keeping the constant
    kernel last (utils.py:32-42)."""
    dims_of = extract_active_dims(kernel_list)
    non_const = [k for k in kernel_list if not isinstance(k, ConstantKernel)]
    out = []
    for want in selected_dims:
        for k, have in zip(non_const, dims_of):
            if list(want) == have:
                out.append(k)
    out.extend([k for k in kernel_list if isinstance(k, ConstantKernel)])
    return out


def compute_sobol(X, kernel_list: Sequence, alpha,
                  delta=None, mu=None) -> List[float]:
    """Sobol indices for a Duvenaud-style kernel list (utils.py:438-488):
    each product kernel contributes alpha^T (prod_d L_d) alpha with L_d built
    from the factor's own variance. ``X`` is the training inputs (full GP) or
    inducing points (sparse). ``delta``/``mu`` override the Gaussian Sobol
    measure per factor (the reference threads them into compute_L,
    utils.py:478); None uses each factor's own measure."""
    X = jnp.asarray(X)
    a = jnp.asarray(alpha).reshape(-1)
    out = []
    for k in kernel_list:
        if isinstance(k, ConstantKernel):
            continue
        factors = k.kernels if isinstance(k, ProductKernel) else (k,)
        L = None
        for f in factors:
            Lf = compute_L_for_kernel(f, X[:, f.active_dim], delta=delta, mu=mu)
            L = Lf if L is None else L * Lf
        out.append(float(a @ L @ a))
    return out
