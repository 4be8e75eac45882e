"""Serving export: serialized ahead-of-time compiled predict functions.

The reference has no serving story at all — deployment means pickling
hyperparameters and rebuilding a GPflow model in a full TF environment
(/root/reference/oak/model_utils.py:44-87, uci_plotting.py:163-200). The
TPU-native answer is ``jax.export``: lower the trained model's end-to-end
predict function (flows -> scalers -> posterior -> inverse link/scale,
``oak_model.export_predict``) to StableHLO with a *symbolic batch dimension*,
and serialize it to bytes. The artifact is self-contained — parameters are
baked in as constants — and can be loaded and called from any JAX process
(no oak_tpu import, no checkpoint, no model rebuild), compiling on first
call for whatever backend that process runs.

    blob = serialize_predict(oak)            # trained oak_model -> bytes
    f = deserialize_predict(blob)            # any process, any backend
    y = f(X)                                  # X: [n, D] f32, any n
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def serialize_predict(oak, path: Optional[Union[str, os.PathLike]] = None,
                      platforms=None, include_var: bool = False) -> bytes:
    """Serialize ``oak.export_predict()`` as an AOT artifact.

    The batch dimension is symbolic, so one artifact serves any batch size;
    the feature count D is baked in (the preprocessing is per-column).
    ``platforms``: lowering platforms, e.g. ("cpu", "tpu") for an artifact
    that runs on either; default is the current backend only.
    ``include_var=True`` exports a ``(mean, std)`` artifact (original target
    units / Bernoulli outcome std) instead of mean-only. For Bernoulli
    models the two artifacts serve DIFFERENT probabilities by design:
    mean-only mirrors ``oak_model.predict`` (plug-in invlink(E[f]));
    (mean, std) mirrors ``oak_model.predict_proba`` (posterior-predictive
    E[invlink(f)]) — see ``oak_model.export_predict``.
    """
    predict = oak.export_predict(include_var=include_var)
    d = int(np.asarray(oak.xmin).shape[-1])
    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, d), jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jax.jit(predict), **kwargs)(spec)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def deserialize_predict(blob_or_path: Union[bytes, str, os.PathLike]) -> Callable:
    """Load a serialized predict artifact; returns ``f(X) -> y`` (jittable).

    The returned callable re-traces/compiles on first use per batch shape on
    the *loading* process's backend (which must be one of the artifact's
    lowering platforms).
    """
    if isinstance(blob_or_path, (str, os.PathLike)):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = bytes(blob_or_path)
    exported = jax_export.deserialize(bytearray(blob))

    def predict(X):
        return exported.call(jnp.asarray(X, jnp.float32))

    return predict
