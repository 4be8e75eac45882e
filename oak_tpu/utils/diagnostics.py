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
