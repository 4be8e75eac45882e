"""Constrained kernel on binary inputs {0, 1}.

TPU-native rebuild of /root/reference/oak/ortho_binary_kernel.py. The kernel is
a 2x2 covariance table B, constructed so that the implied function is
orthogonal to constants under the Bernoulli measure P(x=0)=p0:

    B = sigma^2 * [[p1^2, -p0*p1], [-p0*p1, p0^2]],   p1 = 1 - p0

(one checks p^T B p = 0 with p = [p0, p1]). Gram evaluation is a gather from B
by integer-cast inputs. On TPU we avoid gathers in the hot path: since inputs
are 0/1, K(x,x') is evaluated algebraically from the float inputs (an
outer-product-free elementwise expression that the fused OAK gram kernel can
inline), which is mathematically identical to the double-gather at
ortho_binary_kernel.py:40-53.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from ..params import Param, positive


@struct.dataclass
class OrthogonalBinary:
    variance: Param
    p0: jnp.ndarray
    active_dim: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def create(cls, p0: float = 0.5, variance=1.0, active_dim: int = 0,
               train_variance: bool = True, dtype=None) -> "OrthogonalBinary":
        from ..config import default_float

        dtype = dtype or default_float()
        return cls(variance=positive(variance, trainable=train_variance, dtype=dtype),
                   p0=jnp.asarray(p0, dtype), active_dim=active_dim)


def output_covariance(k: OrthogonalBinary) -> jnp.ndarray:
    """The 2x2 table B (ortho_binary_kernel.py:29-33)."""
    p0 = k.p0
    p1 = 1.0 - p0
    B = jnp.array([[1.0, 0.0], [0.0, 0.0]], k.p0.dtype) * p1 * p1 \
        + jnp.array([[0.0, 0.0], [0.0, 1.0]], k.p0.dtype) * p0 * p0 \
        + jnp.array([[0.0, -1.0], [-1.0, 0.0]], k.p0.dtype) * p0 * p1
    return B * k.variance.value


def output_variance(k: OrthogonalBinary) -> jnp.ndarray:
    p0 = k.p0
    p1 = 1.0 - p0
    return jnp.stack([p1 * p1, p0 * p0]) * k.variance.value


def _phi(k: OrthogonalBinary, x: jnp.ndarray) -> jnp.ndarray:
    """Signed 'feature' phi(x) with K(x,x') = sigma^2 phi(x) phi(x') where
    phi(0) = p1, phi(1) = -p0. B is rank-1: B = sigma^2 phi phi^T."""
    p0 = k.p0
    return (1.0 - p0) - x  # x=0 -> p1 ; x=1 -> 1 - p0 - 1 = -p0


def K(k: OrthogonalBinary, x: jnp.ndarray, x2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if x2 is None:
        x2 = x
    return k.variance.value * jnp.outer(_phi(k, x), _phi(k, x2))


def K_diag(k: OrthogonalBinary, x: jnp.ndarray) -> jnp.ndarray:
    p = _phi(k, x)
    return k.variance.value * p * p
