"""Constrained-parameter pytrees.

TPU-native replacement for ``gpflow.Parameter`` (+ tfp bijector transforms and
priors), used throughout the reference (e.g.
/root/reference/oak/oak_kernel.py:211-221, ortho_binary_kernel.py:26).

Design: a ``Param`` is a pytree whose single dynamic leaf is the
*unconstrained* raw value; the bijector, trainable flag and prior are static
metadata (hashable frozen dataclasses), so jit sees them as compile-time
structure. Models are nested ``flax.struct.dataclass`` pytrees of Params and
plain arrays; losses are pure functions of the whole pytree, and optimizers
mask non-trainable leaves via ``trainable_mask``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.special import gammaln

from .bijectors import Bijector, Identity, Sigmoid, Softplus
from .config import default_float


# --------------------------------------------------------------------------- #
# Priors (static metadata; scalar hyperparameters are plain floats)
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class Prior:
    def log_prob(self, x):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Gamma(Prior):
    """Gamma(concentration, rate); the reference puts Gamma(1, 0.2) sparsity
    priors on the per-order variances (/root/reference/oak/model_utils.py:161-165)."""

    concentration: float
    rate: float

    def log_prob(self, x):
        a, b = self.concentration, self.rate
        out = a * jnp.log(b) - gammaln(a) - b * x
        # a == 1 (the reference's sparsity prior) must not evaluate
        # 0 * log(0) = NaN as a variance is shrunk to 0
        if a != 1.0:
            out = out + (a - 1.0) * jnp.log(x)
        return out


@dataclasses.dataclass(frozen=True)
class Normal(Prior):
    loc: float
    scale: float

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * jnp.log(2.0 * jnp.pi)


# --------------------------------------------------------------------------- #
# Param
# --------------------------------------------------------------------------- #
@struct.dataclass
class Param:
    raw: jnp.ndarray
    bij: Bijector = struct.field(pytree_node=False, default=Identity())
    trainable: bool = struct.field(pytree_node=False, default=True)
    prior: Optional[Prior] = struct.field(pytree_node=False, default=None)

    @property
    def value(self):
        return self.bij.forward(self.raw)

    def assign(self, constrained_value) -> "Param":
        raw = jnp.asarray(
            self.bij.inverse(jnp.asarray(constrained_value, dtype=self.raw.dtype)),
            dtype=self.raw.dtype,
        )
        return self.replace(raw=raw)

    def log_prior_density(self):
        """GPflow semantics: prior density evaluated on the *constrained* value
        (prior_on='constrained' is the GPflow default the reference relies on)."""
        if self.prior is None or not self.trainable:
            return jnp.zeros((), dtype=self.raw.dtype)
        return jnp.sum(self.prior.log_prob(self.value))


def _as_array(value, dtype):
    return jnp.asarray(value, dtype=dtype or default_float())


def param(value, bij: Bijector = Identity(), trainable=True, prior=None, dtype=None) -> Param:
    v = _as_array(value, dtype)
    return Param(raw=jnp.asarray(bij.inverse(v), dtype=v.dtype), bij=bij,
                 trainable=trainable, prior=prior)


def positive(value, low: float = 0.0, trainable=True, prior=None, dtype=None) -> Param:
    return param(value, Softplus(low=low), trainable=trainable, prior=prior, dtype=dtype)


def bounded(low: float, high: float, value, trainable=True, prior=None, dtype=None) -> Param:
    """gpflow ``bounded_param`` equivalent (/root/reference/oak/oak_kernel.py:24-33)."""
    return param(value, Sigmoid(low=low, high=high), trainable=trainable, prior=prior, dtype=dtype)


def fixed(value, dtype=None) -> Param:
    return param(value, Identity(), trainable=False, dtype=dtype)


# --------------------------------------------------------------------------- #
# Pytree utilities over models containing Params
# --------------------------------------------------------------------------- #
def _is_param(x) -> bool:
    return isinstance(x, Param)


def iter_params(tree):
    """All Param nodes in a pytree, with their key-paths, in canonical order."""
    flat = jax.tree_util.tree_flatten_with_path(tree, is_leaf=_is_param)[0]
    return [(jax.tree_util.keystr(kp), p) for kp, p in flat if _is_param(p)]


def apply_trainable_mask(grads, model):
    """Zero the raw-gradient of every non-trainable Param (and of every
    non-Param leaf, which is treated as fixed data rather than a parameter)."""

    def f(g, p):
        if _is_param(p):
            return g.replace(raw=g.raw if p.trainable else jnp.zeros_like(g.raw))
        return jax.tree_util.tree_map(jnp.zeros_like, g)

    return jax.tree_util.tree_map(f, grads, model, is_leaf=_is_param)


def log_prior_density(tree):
    """Sum of log prior densities of all trainable Params in the pytree.
    Added to objectives like GPflow's ``training_loss`` does."""
    total = 0.0
    for _, p in iter_params(tree):
        total = total + p.log_prior_density()
    return total


def flatten_trainable(tree):
    """Flatten trainable Param raws (and any bare trainable leaves marked by
    being a Param) into a single f64 numpy-compatible vector.

    Returns (vector, unflatten_fn) — the scipy-bridge optimizer interface.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree, is_leaf=_is_param)
    shapes, takes = [], []
    pieces = []
    for leaf in leaves:
        if _is_param(leaf) and leaf.trainable:
            arr = jnp.ravel(leaf.raw)
            pieces.append(arr)
            shapes.append(jnp.shape(leaf.raw))
            takes.append(True)
        else:
            shapes.append(None)
            takes.append(False)

    sizes = [int(jnp.size(jnp.zeros(s))) if s is not None else 0 for s in shapes]
    vec = jnp.concatenate(pieces) if pieces else jnp.zeros((0,), default_float())

    def unflatten(v):
        out, offset = [], 0
        for leaf, s, take in zip(leaves, shapes, takes):
            if take:
                n = int(jnp.size(jnp.zeros(s)))
                raw = jnp.reshape(v[offset : offset + n], s).astype(leaf.raw.dtype)
                out.append(leaf.replace(raw=raw))
                offset += n
            else:
                out.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)

    return vec, unflatten
