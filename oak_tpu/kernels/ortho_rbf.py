"""Constrained (orthogonal) RBF kernel on one input dimension.

TPU-native rebuild of /root/reference/oak/ortho_rbf_kernel.py. The constrained
kernel is the rank-1 downdate of the squared-exponential base kernel

    K(x, x') = k(x, x') - cov(x,s) cov(x',s) / var_s

where cov(x,s) = ∫ k(x, s) dμ(s) and var_s = ∬ k(s, s') dμ(s) dμ(s'), with
closed forms per input measure (Uniform / Gaussian / Empirical / MOG). Unlike
the reference (closures chosen by isinstance at __init__,
ortho_rbf_kernel.py:47-152), this is a pure-function module dispatching on the
measure's pytree type at trace time: everything inlines into one fused XLA
computation. Inputs are 1-D column vectors [N] (the caller slices active dims).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import struct
from jax.scipy.special import erf

from ..measures import (
    EmpiricalMeasure,
    GaussianMeasure,
    Measure,
    MOGMeasure,
    UniformMeasure,
)
from ..params import Param, positive


@struct.dataclass
class OrthogonalRBF:
    """Parameters of one constrained 1-D RBF kernel.

    ``variance`` is the base-kernel variance σ²; the reference fixes it to 1
    (non-trainable) when variances are shared across interaction orders
    (oak_kernel.py:163-166).
    """

    lengthscale: Param
    variance: Param
    measure: Measure
    active_dim: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def create(cls, measure: Measure, lengthscale=1.0, variance=1.0,
               active_dim: int = 0, lengthscale_bounds=None,
               train_variance: bool = True, dtype=None) -> "OrthogonalRBF":
        from ..params import bounded

        if lengthscale_bounds is not None:
            ls = bounded(lengthscale_bounds[0], lengthscale_bounds[1], lengthscale,
                         dtype=dtype)
        else:
            ls = positive(lengthscale, dtype=dtype)
        var = positive(variance, trainable=train_variance, dtype=dtype)
        return cls(lengthscale=ls, variance=var, measure=measure,
                   active_dim=active_dim)


def rbf(k: OrthogonalRBF, x: jnp.ndarray, x2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Unconstrained SE base gram, [N, M] from 1-D inputs [N], [M]."""
    if x2 is None:
        x2 = x
    l = k.lengthscale.value
    d = (x[:, None] - x2[None, :]) / l
    return k.variance.value * jnp.exp(-0.5 * d * d)


def rbf_diag(k: OrthogonalRBF, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.full(x.shape, 1.0, x.dtype) * k.variance.value


def cov_x_s(k: OrthogonalRBF, x: jnp.ndarray) -> jnp.ndarray:
    """cov(x, s) = ∫ k(x, s) dμ(s), shape [N] for input [N]."""
    l = k.lengthscale.value
    s2 = k.variance.value
    m = k.measure
    if isinstance(m, GaussianMeasure):
        t = l * l + m.var
        return s2 * l / jnp.sqrt(t) * jnp.exp(-0.5 * (x - m.mu) ** 2 / t)
    if isinstance(m, UniformMeasure):
        c = s2 * l / (m.b - m.a) * math.sqrt(math.pi / 2.0)
        r2l = math.sqrt(2.0) * l
        return c * (erf((m.b - x) / r2l) - erf((m.a - x) / r2l))
    if isinstance(m, EmpiricalMeasure):
        loc = m.location[:, 0]
        return rbf(k, x, loc) @ m.weights[:, 0]
    if isinstance(m, MOGMeasure):
        t = l * l + m.variances[None, :]  # [N, K]
        comp = jnp.exp(-0.5 * (x[:, None] - m.means[None, :]) ** 2 / t) / jnp.sqrt(t)
        return s2 * l * (comp @ m.weights)
    raise NotImplementedError(f"measure {type(m)}")


def var_s(k: OrthogonalRBF) -> jnp.ndarray:
    """var_s = ∬ k(s, s') dμ(s) dμ(s'), scalar."""
    l = k.lengthscale.value
    s2 = k.variance.value
    m = k.measure
    if isinstance(m, GaussianMeasure):
        return s2 * l / jnp.sqrt(l * l + 2.0 * m.var)
    if isinstance(m, UniformMeasure):
        y = (m.b - m.a) / (math.sqrt(2.0) * l)
        return (2.0 / (m.b - m.a) ** 2) * s2 * l * l * (
            math.sqrt(math.pi) * y * erf(y) + jnp.exp(-y * y) - 1.0
        )
    if isinstance(m, EmpiricalMeasure):
        loc = m.location[:, 0]
        w = m.weights[:, 0]
        return w @ rbf(k, loc, loc) @ w
    if isinstance(m, MOGMeasure):
        t = l * l + m.variances[:, None] + m.variances[None, :]
        pair = jnp.exp(-0.5 * (m.means[:, None] - m.means[None, :]) ** 2 / t) / jnp.sqrt(t)
        return s2 * l * (m.weights @ pair @ m.weights)
    raise NotImplementedError(f"measure {type(m)}")


def _var_s_floored(k) -> jnp.ndarray:
    """var_s floored so the downdate stays differentiable when a
    sparsity-pruned base variance underflows to exactly 0 (then var_s = 0
    too and the downdate would be 0/0 = NaN; the correct limit is 0 — the
    whole kernel vanishes with sigma^2). The floor is sqrt(tiny), NOT tiny:
    the division/rsqrt VJPs form var_s^2 and var_s^{-3/2}, which at the
    smallest normal would underflow to 0 / overflow to inf and turn the
    zero cotangent into 0 * inf = NaN. sqrt(tiny) (1.1e-19 in f32) keeps
    both representable and never engages for any realistic variance."""
    v = var_s(k)
    return jnp.maximum(v, jnp.sqrt(jnp.finfo(v.dtype).tiny))


def K(k: OrthogonalRBF, x: jnp.ndarray, x2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Constrained gram: base - rank-1 downdate (ortho_rbf_kernel.py:157-172)."""
    cx = cov_x_s(k, x)
    cx2 = cx if x2 is None else cov_x_s(k, x2)
    return rbf(k, x, x2) - jnp.outer(cx, cx2) / _var_s_floored(k)


def K_diag(k: OrthogonalRBF, x: jnp.ndarray) -> jnp.ndarray:
    cx = cov_x_s(k, x)
    return rbf_diag(k, x) - cx * cx / _var_s_floored(k)
