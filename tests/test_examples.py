"""Example entry points under pytest (VERDICT r2 weak #1 / task 2).

Each CLI is run as a real subprocess on tiny shapes so an argparse, import,
or npz-writer regression fails the suite instead of a future manual run.
Asserted per script: exit 0 plus the output contract — the out_<fold>.npz
field set the reference writer produces
(/root/reference/examples/uci/uci_regression_train.py:183-190,
uci_classification_train.py:214-220), figure files for the plotting CLI, and
a served-prediction line for the serving walkthrough.

The subprocesses force the CPU backend via OAK_TPU_PLATFORM (the image's
sitecustomize rewrites JAX_PLATFORMS, so plain env vars don't stick) and
share the persistent compile cache to keep re-runs fast.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
UCI = REPO / "examples" / "uci"

# field sets of the reference's npz writers; our writers add provenance /
# timing extras on top, so assert superset
REFERENCE_REGRESSION_FIELDS = {"cumulative_sobol", "order", "rmse", "nll",
                               "sobol_order"}
REFERENCE_CLASSIFICATION_FIELDS = {"normalised_sobols",
                                   "classification_accuracy", "nll",
                                   "sobol_order"}


def _run(args, cwd=REPO, timeout=900):
    env = dict(os.environ)
    env["OAK_TPU_PLATFORM"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oak_tpu_jax_cache")
    proc = subprocess.run([sys.executable] + [str(a) for a in args],
                          cwd=str(cwd), env=env, timeout=timeout,
                          capture_output=True, text=True)
    assert proc.returncode == 0, (
        f"{args[0]} exited {proc.returncode}\nstdout:\n{proc.stdout[-3000:]}"
        f"\nstderr:\n{proc.stderr[-3000:]}")
    return proc


@pytest.fixture(scope="session")
def regression_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("uci_regression")
    proc = _run([UCI / "uci_regression_train.py", "--dataset_name", "autoMPG",
                 "--k", "2", "--max_iters", "30", "--depth", "2",
                 "--output_dir", out])
    return out, proc


def test_regression_cli(regression_run):
    out, proc = regression_run
    for fold in range(2):
        path = out / f"out_{fold}.npz"
        assert path.exists()
        with np.load(path) as z:
            assert REFERENCE_REGRESSION_FIELDS <= set(z.files)
            assert np.isfinite(float(z["rmse"]))
            assert np.isfinite(float(z["nll"]))
            # Sobol mass by order is non-negative and the cumulative curve
            # is monotone (components are added in decreasing-Sobol order)
            assert (z["sobol_order"] >= -1e-12).all()
            assert (np.diff(z["cumulative_sobol"]) >= -1e-12).all()
        assert (out / f"model_oak_{fold}.npz").exists()
    assert (out / "config.json").exists()
    # per-fold JSON progress lines reached stdout
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) >= 2 and "rmse" in lines[-1]


def test_plotting_cli(regression_run):
    out, _ = regression_run
    _run([UCI / "uci_plotting.py", "--dataset_name", "autoMPG",
          "--fold", "0", "--top_n", "3", "--output_dir", out])
    figs = list((out / "decomposition").glob("*.pdf"))
    assert len(figs) == 3, figs
    # figure names carry the Sobol index like the reference's convention
    assert all("(R=" in f.name for f in figs)


def test_classification_cli(tmp_path):
    _run([UCI / "uci_classification_train.py", "--dataset_name", "breast",
          "--k", "2", "--max_iters", "30", "--depth", "2",
          "--output_dir", tmp_path])
    for fold in range(2):
        with np.load(tmp_path / f"out_{fold}.npz", allow_pickle=True) as z:
            assert REFERENCE_CLASSIFICATION_FIELDS <= set(z.files)
            err = float(z["classification_accuracy"])
            assert 0.0 <= err <= 1.0
            assert np.isfinite(float(z["nll"]))


def test_classification_cli_mixed_types_heart(tmp_path):
    """End-to-end discrete-feature run (VERDICT r3 task 2): heart's known
    type signature routes sex/fbs/exang through OrthogonalBinary and
    cp/restecg/slope/ca/thal through OrthogonalCategorical (the CLI's
    --binary_feature/--categorical_feature 'auto' default), then the
    decomposition plots exercise the binary/categorical effect figures."""
    _run([UCI / "uci_classification_train.py", "--dataset_name", "heart",
          "--k", "2", "--max_iters", "30", "--depth", "2", "--restarts", "2",
          "--output_dir", tmp_path])
    cfg = json.loads((tmp_path / "config.json").read_text())
    assert cfg["model"]["binary_feature"] == [1, 5, 8]
    assert cfg["model"]["categorical_feature"] == [2, 6, 10, 11, 12]
    for fold in range(2):
        with np.load(tmp_path / f"out_{fold}.npz", allow_pickle=True) as z:
            assert REFERENCE_CLASSIFICATION_FIELDS <= set(z.files)
            assert 0.0 <= float(z["classification_accuracy"]) <= 1.0
            assert np.isfinite(float(z["nll"]))
            # the Sobol path ran through the discrete L branches
            assert z["normalised_sobols"].shape != ()
    # plotting on the mixed-type checkpoint: binary/categorical single
    # effects + the continuous-by-binary second-order panel
    _run([UCI / "uci_plotting.py", "--dataset_name", "heart",
          "--fold", "0", "--top_n", "6", "--output_dir", tmp_path])
    figs = list((tmp_path / "decomposition").glob("*.pdf"))
    assert len(figs) >= 3, figs


def test_fold_writer_refuses_diverged_folds(tmp_path):
    """VERDICT r4 task 8: a diverged fold must fail the run loudly instead of
    silently committing a broken artifact (the round-4 heart failure mode:
    NaN nll + all-zero Sobol + at-chance error, written anyway)."""
    sys.path.insert(0, str(UCI))
    from artifact_io import fold_problems, provenance_stamp, write_fold_artifact

    good_sob = np.array([0.6, 0.3, 0.1])
    good_order = np.array([0.9, 0.1])

    # the round-4 heart artifact, as the writer now sees it
    assert fold_problems("classification", nll=float("nan"),
                         sobol_vector=np.zeros(3), sobol_order=np.zeros(2),
                         classification_error=0.45)
    # each invariant trips individually
    assert fold_problems("classification", nll=0.4, sobol_vector=np.zeros(3),
                         sobol_order=np.zeros(2), classification_error=0.2)
    assert fold_problems("classification", nll=0.4, sobol_vector=good_sob,
                         sobol_order=good_order, classification_error=0.48)
    assert fold_problems("regression", nll=0.4, sobol_vector=good_sob,
                         sobol_order=good_order, rmse=float("inf"))
    assert fold_problems("regression", nll=0.4, sobol_vector=None,
                         sobol_order=None)
    # a healthy fold passes
    assert not fold_problems("classification", nll=0.35, sobol_vector=good_sob,
                             sobol_order=good_order, classification_error=0.15)

    stamp = provenance_stamp(restarts=4)
    assert stamp["restarts"] == 4 and stamp["code_commit"] != ""

    # refused fold -> no file; healthy fold -> file with the stamp
    bad = dict(nll=float("nan"), normalised_sobols=np.zeros(3),
               sobol_order=np.zeros(2), classification_accuracy=0.45)
    assert write_fold_artifact(tmp_path, 0, "classification", bad, stamp)
    assert not (tmp_path / "out_0.npz").exists()
    ok = dict(nll=0.35, normalised_sobols=good_sob, sobol_order=good_order,
              classification_accuracy=0.15)
    assert write_fold_artifact(tmp_path, 1, "classification", ok, stamp) == []
    with np.load(tmp_path / "out_1.npz", allow_pickle=True) as z:
        assert str(z["code_commit"]) == stamp["code_commit"]
        assert int(z["restarts"]) == 4


def test_example_clis_default_to_production_restarts():
    """The CLIs' default fit mode matches the repo's f32 production guidance
    (VERDICT r3 task 3; oak_model.fit docstring recommends restarts=4 —
    single-start f32 L-BFGS can land in a worse genuine optimum), and every
    COMMITTED artifact set was produced in a multistart mode: no silent
    single-start f32 fits remain in outputs/."""
    import re

    for script in ("uci_regression_train.py", "uci_classification_train.py"):
        src = (UCI / script).read_text()
        m = re.search(r'"--restarts",\s*type=int,\s*default=(\d+)', src)
        assert m is not None, script
        assert int(m.group(1)) == 4, script

    configs = sorted((UCI / "outputs").glob("*/config.json"))
    assert configs, "no committed artifact sets found"
    for cfg_path in configs:
        cfg = json.loads(cfg_path.read_text())
        assert cfg["fit"]["restarts"] >= 4, (
            f"{cfg_path} records a committed artifact produced outside the "
            f"production-recommended multistart mode")


def test_serving_example(tmp_path):
    artifact = tmp_path / "predict.jaxexp"
    proc = _run([REPO / "examples" / "serving_example.py", artifact,
                 "--n", "120", "--max_iters", "40"])
    assert artifact.exists() and artifact.stat().st_size > 0
    assert "served" in proc.stdout
    assert "single-row request ok" in proc.stdout


def test_examples_import_without_repo_cwd(tmp_path):
    """The scripts run from any CWD (install-mode hygiene: the path fallback
    resolves relative to the file, not the working directory)."""
    _run([UCI / "uci_regression_train.py", "--k", "2", "--max_iters", "5",
          "--depth", "1", "--output_dir", tmp_path / "o"], cwd=tmp_path)
    assert (tmp_path / "o" / "out_0.npz").exists()
