"""Likelihoods: Gaussian (closed form) and Bernoulli (quadrature).

Replaces the GPflow likelihood objects the reference borrows
(gpflow.likelihoods.Gaussian implicitly in GPR/SGPR; Bernoulli with a jittered
sigmoid inverse link in the classification script,
/root/reference/examples/uci/uci_classification_train.py:43-45,108).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.special import erf

from ..ops.quadrature import gauss_hermite, log_gauss_hermite
from ..params import Param, positive

_LOG2PI = math.log(2.0 * math.pi)


@struct.dataclass
class Gaussian:
    variance: Param

    @classmethod
    def create(cls, variance: float = 1.0, dtype=None) -> "Gaussian":
        # GPflow lower-bounds the likelihood variance at 1e-6.
        return cls(variance=positive(variance, low=1e-6, dtype=dtype))

    def log_prob(self, f, y):
        v = self.variance.value
        return -0.5 * (_LOG2PI + jnp.log(v) + (y - f) ** 2 / v)

    def variational_expectations(self, fmu, fvar, y):
        """E_{f~N(fmu,fvar)}[log p(y|f)] — closed form."""
        v = self.variance.value
        return -0.5 * (_LOG2PI + jnp.log(v) + ((y - fmu) ** 2 + fvar) / v)

    def predict_mean_and_var(self, fmu, fvar):
        # f32 cancellation in the sparse predictive variance (kdiag -
        # sum(tmp1^2) + sum(tmp2^2), models/sgpr.py) can leave fvar slightly
        # NEGATIVE at near-interpolated points; a prediction cannot be more
        # certain than exact interpolation, so clamp at 0 before adding the
        # observation noise — log(v) below would otherwise NaN the test NLL
        # of a healthy fit (seen on the round-5 pumadyn regeneration).
        return fmu, jnp.maximum(fvar, 0.0) + self.variance.value

    def predict_log_density(self, fmu, fvar, y):
        v = jnp.maximum(fvar, 0.0) + self.variance.value
        return -0.5 * (_LOG2PI + jnp.log(v) + (y - fmu) ** 2 / v)


def inv_probit(x, jitter: float = 1e-3):
    """GPflow's default Bernoulli inverse link."""
    return 0.5 * (1.0 + erf(x / math.sqrt(2.0))) * (1.0 - 2.0 * jitter) + jitter


def inv_logit(x, jitter: float = 1e-3):
    """The jittered sigmoid link from the reference classification script
    (uci_classification_train.py:43-45), computed with the numerically
    stable sigmoid.

    The naive ``1 / (1 + exp(-x))`` overflows f32 for x < ~-88: the forward
    clips to a finite p but the BACKWARD is inf/inf = NaN. The reference
    never sees this because it runs f64 (overflow at x < -709, unreachable);
    on f32 TPU hardware a deep OAK kernel at a cold start has prior marginal
    variance of O(depth * amplitude) — heart at depth 4 reaches fvar ~ 188,
    whose 20-point Gauss-Hermite grid hits f ~ -100 and NaNed every
    training gradient (round-4 heart artifact runs). ``jax.nn.sigmoid``
    evaluates exp only on the non-overflowing side."""
    return jax.nn.sigmoid(x) * (1.0 - 2.0 * jitter) + jitter


_INVLINKS = {"probit": inv_probit, "logit": inv_logit}


@struct.dataclass
class Bernoulli:
    """P(y=1|f) = invlink(f); y in {0, 1}. Expectations by Gauss-Hermite."""

    invlink_name: str = struct.field(pytree_node=False, default="logit")
    num_gh: int = struct.field(pytree_node=False, default=20)

    @classmethod
    def create(cls, invlink: str = "logit", num_gh: int = 20) -> "Bernoulli":
        if invlink not in _INVLINKS:
            raise ValueError(f"invlink must be one of {list(_INVLINKS)}")
        return cls(invlink_name=invlink, num_gh=num_gh)

    @property
    def invlink(self) -> Callable:
        return _INVLINKS[self.invlink_name]

    def log_prob(self, f, y):
        p = self.invlink(f)
        return y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p)

    def variational_expectations(self, fmu, fvar, y):
        return gauss_hermite(lambda f: self.log_prob(f, y[..., None]), fmu, fvar,
                             self.num_gh)

    def predict_mean_and_var(self, fmu, fvar):
        p = gauss_hermite(self.invlink, fmu, fvar, self.num_gh)
        return p, p - p * p

    def predict_log_density(self, fmu, fvar, y):
        return log_gauss_hermite(lambda f: self.log_prob(f, y[..., None]), fmu, fvar,
                                 self.num_gh)
