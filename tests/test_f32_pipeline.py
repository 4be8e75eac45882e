"""f32 performance-mode end-to-end test: the product's TPU selling point is
the f32 path, but the suite otherwise runs in f64 parity mode. This runs the
same deterministic autoMPG-shaped fit -> predict -> NLL -> Sobol pipeline as
`bench.py --verify` (VERIFY_r02 records it passing CPU-f64 vs TPU-f32 on real
hardware) entirely in f32 with x64 disabled, and asserts the 1e-3-grade
agreement of the BASELINE.json north star on the CPU backend."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.mark.filterwarnings("ignore")
def test_f32_pipeline_matches_f64():
    from bench import _verify_pipeline

    assert jax.config.jax_enable_x64
    r64 = _verify_pipeline()
    try:
        jax.config.update("jax_enable_x64", False)
        r32 = _verify_pipeline()
    finally:
        jax.config.update("jax_enable_x64", True)

    assert abs(r32["nll"] - r64["nll"]) <= 1e-3, (r32["nll"], r64["nll"])
    assert abs(r32["rmse"] - r64["rmse"]) <= 1e-3, (r32["rmse"], r64["rmse"])
    np.testing.assert_allclose(np.asarray(r32["sobol"]),
                               np.asarray(r64["sobol"]), atol=1e-3)


# --------------------------------------------------------------------------- #
# Matched-parameters forward parity across seeds and model families
# (VERDICT r3 task 5). These follow Gate B1's design, NOT the single-start
# fit-then-compare above: the f64 leg fits ONCE, the f32 leg loads the saved
# model and evaluates predict/NLL/Sobol at IDENTICAL parameters — optimizer-
# free and deterministic, so they isolate kernel/posterior/Sobol f32 numerics
# for the discrete kernels and the Bernoulli path, which previously had f32
# coverage only via the single on-hardware verify config.
# --------------------------------------------------------------------------- #
def _make_config(kind: str, seed: int):
    rng = np.random.default_rng(seed)
    n, d = 160, 4
    if kind == "continuous":
        X = rng.normal(size=(n, d))
        w = rng.normal(size=d)
        y = (np.sin(X @ w) + 0.4 * X[:, 0] * X[:, 1]
             + 0.05 * rng.normal(size=n)).reshape(-1, 1)
        kwargs = dict(max_interaction_depth=2)
    elif kind == "mixed":
        X = rng.normal(size=(n, d))
        X[:, 0] = (rng.uniform(size=n) < 0.6).astype(float)   # binary
        X[:, 1] = rng.choice(3, size=n, p=[0.5, 0.3, 0.2])    # categorical
        y = (0.8 * (X[:, 0] - 0.6) + np.array([0.5, -0.4, 0.1])[X[:, 1].astype(int)]
             + np.sin(X[:, 2]) + 0.3 * X[:, 3]
             + 0.05 * rng.normal(size=n)).reshape(-1, 1)
        kwargs = dict(max_interaction_depth=2, binary_feature=[0],
                      categorical_feature=[1])
    elif kind == "bernoulli":
        X = rng.normal(size=(n, d))
        X[:, 0] = (rng.uniform(size=n) < 0.5).astype(float)
        logits = 2.0 * (X[:, 1] + X[:, 2] * (X[:, 0] - 0.5))
        y = (rng.uniform(size=n) < 1 / (1 + np.exp(-logits)))
        y = y.astype(float).reshape(-1, 1)
        kwargs = dict(max_interaction_depth=2, binary_feature=[0],
                      likelihood="bernoulli", num_inducing=32, sparse=True)
    else:
        raise ValueError(kind)
    return X, y, kwargs


def _forward_metrics(oak, X_test, y_test):
    out = {"nll": float(-oak.get_loglik(X_test, y_test, clip=True)),
           "sobol": np.asarray(oak.get_sobol(), float)}
    if oak.likelihood == "bernoulli":
        out["pred"] = np.asarray(oak.predict_proba(X_test, clip=True), float)
    else:
        out["pred"] = np.asarray(oak.predict(X_test, clip=True), float)
    return out


@pytest.mark.filterwarnings("ignore")
@pytest.mark.parametrize("kind,seed", [
    ("continuous", 7), ("continuous", 11), ("continuous", 13),
    ("mixed", 7), ("mixed", 11), ("mixed", 13),
    ("bernoulli", 7), ("bernoulli", 11), ("bernoulli", 13),
])
def test_f32_forward_parity_matched_params(kind, seed, tmp_path):
    from oak_tpu.model import oak_model

    X, y, kwargs = _make_config(kind, seed)
    Xtr, Xte, ytr, yte = X[:120], X[120:], y[:120], y[120:]

    assert jax.config.jax_enable_x64
    oak64 = oak_model(**kwargs)
    oak64.fit(Xtr, ytr)
    path = tmp_path / "model.npz"
    oak64.save(path)
    r64 = _forward_metrics(oak64, Xte, yte)

    try:
        jax.config.update("jax_enable_x64", False)
        oak32 = oak_model.load(path)
        r32 = _forward_metrics(oak32, Xte, yte)
    finally:
        jax.config.update("jax_enable_x64", True)

    assert abs(r32["nll"] - r64["nll"]) <= 1e-3, (kind, seed, r32["nll"], r64["nll"])
    np.testing.assert_allclose(r32["sobol"], r64["sobol"], atol=1e-3,
                               err_msg=f"{kind} seed {seed}")
    np.testing.assert_allclose(r32["pred"], r64["pred"], atol=5e-3,
                               err_msg=f"{kind} seed {seed}")
