"""Global numerics policy for oak-tpu.

The reference stack (GPflow 2.2 on TF) runs float64 everywhere. On TPU, f64 is
emulated and slow, so oak-tpu is dtype-polymorphic:

- *parity mode* (tests, CPU): enable ``jax.config.update("jax_enable_x64", True)``
  and everything runs f64, matching GPflow semantics.
- *performance mode* (TPU): default f32 with f32 accumulation inside matmuls
  (``preferred_element_type``) and jitter-escalating Cholesky (see ops/psd.py).

Mirrors the role of ``gpflow.config`` (default_float / default_jitter) used
throughout the reference (e.g. /root/reference/oak/oak_kernel.py:165).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Default jitter added to Kuu / K for Cholesky stability. GPflow's default is
# 1e-6 (used via gpflow.config.default_jitter() at /root/reference/oak/utils.py:185).
DEFAULT_JITTER_F64 = 1e-6
DEFAULT_JITTER_F32 = 1e-5


def default_float() -> jnp.dtype:
    """float64 when JAX x64 is enabled (parity mode), else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_jitter(dtype=None) -> float:
    dtype = dtype or default_float()
    return DEFAULT_JITTER_F64 if jnp.dtype(dtype) == jnp.float64 else DEFAULT_JITTER_F32


# --------------------------------------------------------------------------- #
# Pallas fused-gram policy: "auto" uses the fused kernel on TPU backends for
# f32 inputs whenever the kernel structure supports it; True/False force.
# --------------------------------------------------------------------------- #
_PALLAS_GRAM = "auto"


def set_pallas_gram(mode) -> None:
    """mode: True / False / 'auto'."""
    global _PALLAS_GRAM
    if mode not in (True, False, "auto"):
        raise ValueError("mode must be True, False or 'auto'")
    _PALLAS_GRAM = mode


def pallas_gram_enabled() -> bool:
    if _PALLAS_GRAM == "auto":
        return jax.default_backend() == "tpu"
    return bool(_PALLAS_GRAM)


from contextlib import contextmanager  # noqa: E402


@contextmanager
def exact_gram():
    """Trace-time scope that routes OAKKernel.K through the per-dim
    elementwise gram + Newton-Girard combination instead of the fused
    einsum gram. The fused forward's dots run at TPU-default single-pass
    bf16 — ideal for the training hot path (benchmarked, gradient-noise
    tolerant) but ~1% relative gram error, which the PREDICTION and
    interpretability paths cannot carry: on the sharp depth-8 pumadyn fit
    the posterior mean moved by ~0.1 (standardized y) and the sum-to-mean
    decomposition identity broke by 11% of its cancellation mass (round
    5). The per-dim route has no dot-general at all, so it is f32-exact
    on every backend. Used by GPR/SGPR predict_f and posterior_stats."""
    global _PALLAS_GRAM
    prev = _PALLAS_GRAM
    _PALLAS_GRAM = False
    try:
        yield
    finally:
        _PALLAS_GRAM = prev
