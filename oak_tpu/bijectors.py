"""Pure-JAX 1-D bijectors.

The reference leans on tensorflow_probability bijectors for parameter
transforms and the normalising flow:

- ``gpflow.utilities.positive()`` (Softplus) — /root/reference/oak/ortho_binary_kernel.py:26
- ``tfb.Sigmoid(low, high)`` for bounded lengthscales — /root/reference/oak/oak_kernel.py:24-33
- ``tfb.{SinhArcsinh, Scale, Shift, Log, Exp, Chain}`` for the normalising
  flow — /root/reference/oak/normalising_flow.py:16-56

TPU-native rebuild: each bijector is a hashable frozen dataclass (safe to use
as jit-static metadata) with pure ``forward`` / ``inverse`` /
``forward_log_det_jacobian`` functions operating on jnp arrays. Parameterised
bijectors (SinhArcsinh, Scale, Shift) take their parameters as *call-time
arguments* where they are trainable (the flow), and as frozen floats where
they are fixed configuration (parameter transforms).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
from jax import nn


@dataclasses.dataclass(frozen=True)
class Bijector:
    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError

    def forward_log_det_jacobian(self, x):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Bijector):
    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def forward_log_det_jacobian(self, x):
        return jnp.zeros_like(x)


@dataclasses.dataclass(frozen=True)
class Softplus(Bijector):
    """y = log(1 + exp(x)) + low. GPflow's ``positive()`` transform."""

    low: float = 0.0

    def forward(self, x):
        return nn.softplus(x) + self.low

    def inverse(self, y):
        # Numerically stable inverse-softplus: x = y + log(1 - exp(-y)).
        z = jnp.asarray(y) - self.low
        return z + jnp.log(-jnp.expm1(-z))

    def forward_log_det_jacobian(self, x):
        return -nn.softplus(-x)


@dataclasses.dataclass(frozen=True)
class Exp(Bijector):
    def forward(self, x):
        return jnp.exp(x)

    def inverse(self, y):
        return jnp.log(y)

    def forward_log_det_jacobian(self, x):
        return jnp.asarray(x)


@dataclasses.dataclass(frozen=True)
class Sigmoid(Bijector):
    """y = low + (high - low) * sigmoid(x); tfb.Sigmoid(low, high) equivalent.

    Used to bound lengthscales (reference bounded_param,
    /root/reference/oak/oak_kernel.py:24).
    """

    low: float = 0.0
    high: float = 1.0

    def forward(self, x):
        return self.low + (self.high - self.low) * nn.sigmoid(x)

    def inverse(self, y):
        z = (jnp.asarray(y) - self.low) / (self.high - self.low)
        return jnp.log(z) - jnp.log1p(-z)

    def forward_log_det_jacobian(self, x):
        return (
            math.log(self.high - self.low) - nn.softplus(-x) - nn.softplus(x)
        )
