"""bench.py under pytest — the driver's round artifact (BENCH_r{N}.json) is
produced by running this CLI, so an argparse/JSON-writer regression here
would sink the round's headline evidence without failing anything. Same
subprocess pattern as tests/test_examples.py; CPU backend, --quick shapes,
persistent compile cache (bench.py sets it), so warm re-runs are fast.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run_bench(extra, timeout=900):
    env = dict(os.environ)
    env["OAK_TPU_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--quick", "--cpu"] + extra,
        cwd=str(REPO), env=env, timeout=timeout, capture_output=True,
        text=True)
    assert proc.returncode == 0, (
        f"bench.py exited {proc.returncode}\nstdout:\n{proc.stdout[-3000:]}"
        f"\nstderr:\n{proc.stderr[-3000:]}")
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_bench_headline_contract():
    out = _run_bench([])
    # the driver records this JSON line verbatim; pin the contract fields
    assert {"metric", "value", "unit", "vs_baseline"} <= set(out)
    assert out["value"] > 0
    assert isinstance(out["unit"], str)


def test_verify_leg_matched_params(tmp_path):
    """The redesigned Gate B's forward-parity plumbing: a cpu64 leg fits and
    saves; a cpu32 leg loads and evaluates at the SAME parameters. NLL must
    match to f32 resolution — this is deterministic (no optimizer in the
    second leg). The multistart legs are exercised on hardware by
    `bench.py --verify` (compile cost too high for the suite)."""
    save = tmp_path / "verify_model.npz"

    def run_leg(leg, extra):
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), "--verify-leg", leg]
            + extra,
            cwd=str(REPO), timeout=1800, capture_output=True, text=True)
        assert proc.returncode == 0, proc.stderr[-3000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    cpu64 = run_leg("cpu64", ["--verify-save", str(save)])
    assert save.exists()
    matched = run_leg("cpu32", ["--verify-load", str(save)])
    assert matched["backend"] == "cpu"
    assert abs(cpu64["nll"] - matched["nll"]) <= 1e-3
    assert max(abs(a - b) for a, b in
               zip(cpu64["sobol"], matched["sobol"])) <= 1e-3
    assert "train_loss" in cpu64 and "train_loss" in matched


def _load_bench_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gate_b2_same_basin_passes():
    """Gate B2's intended semantics (VERDICT r3 task 6): same basin + NLL
    within tolerance -> pass. Values from the measured VERIFY_r05 run."""
    bench = _load_bench_module()
    cpu = {"nll": 0.915420, "train_loss": 272.9644}
    tpu = {"nll": 0.915318, "train_loss": 272.9603}
    out = bench.gate_b2_fit_quality(cpu, tpu)
    assert out["fit_gate_pass"] is True
    assert out["basin_mismatch"] is False
    assert "basin_diagnostic" not in out


def test_gate_b2_basin_mismatch_fails_with_diagnostic():
    """Legs in DIFFERENT basins: deterministic FAIL naming both basins —
    never a flap on which basin happens to have better NLL. Values from the
    measured bifurcation (BASELINE.md 'Verify-gate redesign': good basin
    train_loss 273, stalled basin 337)."""
    bench = _load_bench_module()
    cpu = {"nll": 0.915420, "train_loss": 272.9644}
    tpu_stalled = {"nll": 1.113100, "train_loss": 337.3600}
    out = bench.gate_b2_fit_quality(cpu, tpu_stalled)
    assert out["fit_gate_pass"] is False
    assert out["basin_mismatch"] is True
    assert "272.9644" in out["basin_diagnostic"]
    assert "337.36" in out["basin_diagnostic"]

    # the mirror case: tpu32 lands in a BETTER basin cpu64 missed — still a
    # deterministic fail (the comparison is void, not lucky)
    tpu_better = {"nll": 0.80, "train_loss": 250.0}
    out2 = bench.gate_b2_fit_quality(cpu, tpu_better)
    assert out2["fit_gate_pass"] is False
    assert out2["basin_mismatch"] is True
    assert "basin_diagnostic" in out2


def test_gate_b2_nll_tolerance_boundary():
    bench = _load_bench_module()
    cpu = {"nll": 1.0, "train_loss": 100.0}
    # same basin, NLL worse than tolerance -> fail WITHOUT basin diagnostic
    out = bench.gate_b2_fit_quality({"nll": 1.0, "train_loss": 100.0},
                                    {"nll": 1.002, "train_loss": 100.0})
    assert out["fit_gate_pass"] is False and out["basin_mismatch"] is False
    # tpu better NLL passes (equal-or-better is allowed)
    out2 = bench.gate_b2_fit_quality(cpu, {"nll": 0.99, "train_loss": 100.5})
    assert out2["fit_gate_pass"] is True


def test_bench_predict_mode():
    out = _run_bench(["--predict"])
    assert out["metric"] == "predict_latency"
    batches = [r["batch"] for r in out["rows"]]
    assert batches == [1, 256, 4096]
    for r in out["rows"]:
        assert r["served_ms_per_call"] > 0
        assert r["cold_ms_per_call"] > 0
        assert r["served_rows_per_sec"] > 0
