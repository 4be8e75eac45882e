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
