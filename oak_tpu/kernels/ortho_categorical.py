"""Constrained coregionalization kernel on categorical inputs {0..C-1}.

TPU-native rebuild of /root/reference/oak/ortho_categorical_kernel.py. A free
PSD table A = W W^T + diag(kappa) (W: [C, rank] trainable, kappa: [C] positive)
is projected so the result is orthogonal to constants under the categorical
measure p ([C, 1] fixed probabilities):

    B = A - (A p)(A p)^T / (p^T A p)        (so p^T B p = 0)

Gram evaluation gathers rows/cols of B by the integer-cast input column. The
gather is tiny (C x C table) and stays in VMEM; XLA lowers it to a one-hot
matmul on TPU which is MXU-friendly for large N.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..params import Param, param, positive


@struct.dataclass
class OrthogonalCategorical:
    W: Param
    kappa: Param
    variance: Param
    p: jnp.ndarray  # [C, 1] fixed measure probabilities
    active_dim: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def create(cls, p, rank: int = 2, variance=1.0, active_dim: int = 0,
               train_variance: bool = True, key=None, dtype=None) -> "OrthogonalCategorical":
        from ..config import default_float

        dtype = dtype or default_float()
        p = jnp.asarray(p, dtype).reshape(-1, 1)
        num_cat = p.shape[0]
        if key is None:
            key = jax.random.PRNGKey(0)
        # Reference draws W ~ U[0,1) (ortho_categorical_kernel.py:28).
        W = jax.random.uniform(key, (num_cat, rank), dtype)
        return cls(
            W=param(W, dtype=dtype),
            kappa=positive(jnp.ones((num_cat,), dtype), dtype=dtype),
            variance=positive(variance, trainable=train_variance, dtype=dtype),
            p=p,
            active_dim=active_dim,
        )

    @property
    def num_cat(self) -> int:
        return self.p.shape[0]


def output_covariance(k: OrthogonalCategorical) -> jnp.ndarray:
    """[C, C] constrained table B (ortho_categorical_kernel.py:34-42)."""
    W = k.W.value
    A = W @ W.T + jnp.diag(k.kappa.value)
    Ap = A @ k.p  # [C, 1]
    pAp = (k.p.T @ Ap)[0, 0]
    B = A - (Ap @ Ap.T) / pAp
    return B * k.variance.value


def output_variance(k: OrthogonalCategorical) -> jnp.ndarray:
    """diag(B), [C] (ortho_categorical_kernel.py:44-53)."""
    W = k.W.value
    A_diag = jnp.sum(W * W, axis=1) + k.kappa.value
    Ap = (W @ (W.T @ k.p) + k.kappa.value[:, None] * k.p)[:, 0]
    pAp = k.p[:, 0] @ Ap
    return (A_diag - Ap * Ap / pAp) * k.variance.value


def K(k: OrthogonalCategorical, x: jnp.ndarray, x2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if x2 is None:
        x2 = x
    B = output_covariance(k)
    xi = x.astype(jnp.int32)
    x2i = x2.astype(jnp.int32)
    return B[xi][:, x2i]


def K_diag(k: OrthogonalCategorical, x: jnp.ndarray) -> jnp.ndarray:
    return output_variance(k)[x.astype(jnp.int32)]
