"""Numerical-health diagnostics.

SURVEY §5: the reference has no sanitizers — it catches Cholesky failures ad
hoc (uci_classification_train.py:146-159) and swallows prediction errors.
TPU-native equivalents:

- ``assert_finite(tree, name)``: host-side check of every leaf (call between
  jitted steps; raises with the offending key-paths).
- ``finite_or_debug(x, name)``: in-jit NaN/inf detection via jax.debug — no
  abort, prints location (useful under jit where host asserts can't run).
- ``cholesky_health(K)``: condition/jitter report for a kernel matrix.
- The jitter-escalation policy itself lives in ops.psd.safe_cholesky.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def assert_finite(tree, name: str = "tree") -> None:
    """Raise FloatingPointError listing every non-finite leaf (host-side)."""
    bad = []
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for kp, leaf in flat:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(kp))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def finite_or_debug(x: jnp.ndarray, name: str = "value") -> jnp.ndarray:
    """Identity that prints (under jit) when x contains non-finite entries."""
    n_bad = jnp.sum(~jnp.isfinite(x))

    def report(n):
        jax.debug.print("[oak-tpu] non-finite in " + name + ": {n}", n=n)

    jax.lax.cond(n_bad > 0, lambda: report(n_bad), lambda: None)
    return x


def checked(fn, errors=None):
    """checkify-instrumented version of a jittable function: NaN/inf produced
    anywhere inside (plus any explicit ``checkify.check`` calls) raise a
    JaxRuntimeError on the host instead of propagating silently — the
    in-kernel runtime-gate equivalent of the reference's
    ``tf.debugging`` asserts (SURVEY §2.4). Wrap the *jitted* function:

        loss = checked(jax.jit(model.training_loss))
    """
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.float_checks | checkify.user_checks
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def check_matrix_input(X, num_dims: int, name: str = "X") -> None:
    """Trace-time shape gate for kernel-entry inputs: 2-D with enough columns
    for every active dim (zero runtime cost — shapes are static under jit).
    Replaces the reference's eager ``tf.debugging.assert_shapes``."""
    shape = jnp.shape(X)
    if len(shape) != 2:
        raise ValueError(f"{name} must be 2-D [N, D], got shape {shape}")
    if shape[1] < num_dims:
        raise ValueError(
            f"{name} has {shape[1]} columns but the kernel's active dims "
            f"need at least {num_dims}")


def cholesky_health(K: jnp.ndarray) -> dict:
    """Host-side conditioning report for a PSD matrix."""
    K = np.asarray(K)
    diag = np.diagonal(K)
    eigs = np.linalg.eigvalsh((K + K.T) / 2)
    return {
        "n": K.shape[0],
        "diag_min": float(diag.min()),
        "diag_mean": float(diag.mean()),
        "eig_min": float(eigs.min()),
        "eig_max": float(eigs.max()),
        "condition": float(eigs.max() / max(eigs.min(), 1e-300)),
        "finite": bool(np.isfinite(K).all()),
    }
