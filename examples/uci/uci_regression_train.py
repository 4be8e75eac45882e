"""UCI regression benchmark — K-fold OAK regression with Sobol analysis.

Rebuild of the reference's examples/uci/uci_regression_train.py: same CLI
(--dataset_name, --k), same per-fold output schema (out_<fold>.npz with rmse /
nll / sobol / cumulative_sobol / sobol_order), same cumulative-Sobol-vs-RMSE
curve built by adding components in Sobol order, and the sanity check that
per-component predictions sum to the full predictive mean.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

try:  # installed package (pip install -e .)
    import oak_tpu  # noqa: F401
except ImportError:  # uninstalled checkout: put the repo root on the path
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    import oak_tpu  # noqa: F401  (runs the OAK_TPU_PLATFORM hook now)

try:
    from datasets import feature_types, load_regression, parse_feature_flag
except ImportError:  # invoked from outside examples/uci
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from datasets import feature_types, load_regression, parse_feature_flag
from artifact_io import provenance_stamp, write_fold_artifact

# the CLIs re-run identical per-fold programs: the persistent compile cache
# (same dir as tests/conftest.py) makes every fold after the first cheap
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/oak_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def kfold_indices(n, k, seed=4):
    rng = np.random.RandomState(seed)
    idx = rng.permutation(n)
    folds = np.array_split(np.arange(n), k)
    return [(idx, np.setdiff1d(np.arange(n), f), f) for f in folds]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_name", default="autoMPG")
    ap.add_argument("--k", type=int, default=5, help="k-fold train-test splits")
    ap.add_argument("--max_iters", type=int, default=500)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--restarts", type=int, default=4,
                    help="parallel multi-start L-BFGS restarts. Default 4 — "
                         "the production guidance for f32 hardware "
                         "(oak_model.fit docstring / BASELINE.md "
                         "'Verify-gate redesign'): single-start f32 "
                         "trajectories can land in a worse genuine optimum "
                         "that no per-run diagnostic catches. 0 = single "
                         "start with automatic degenerate-fit fallback.")
    ap.add_argument("--binary_feature", default="auto",
                    help="comma-separated column indices to model with the "
                         "constrained binary kernel (reference kwarg "
                         "model_utils.py:200). 'auto' = the dataset's known "
                         "type signature (datasets.FEATURE_TYPES); 'none' = "
                         "all-continuous")
    ap.add_argument("--categorical_feature", default="auto",
                    help="comma-separated column indices for the constrained "
                         "categorical kernel (reference kwarg "
                         "model_utils.py:201); 'auto'/'none' as above")
    ap.add_argument("--optimizer", default="lbfgs",
                    choices=["lbfgs", "scipy", "adam"])
    ap.add_argument("--output_dir", default=None,
                    help="where to write out_<fold>.npz / model checkpoints "
                         "(default: examples/uci/outputs/<dataset_name>)")
    args = ap.parse_args()

    X, y, provenance = load_regression(args.dataset_name)
    n, d = X.shape
    depth = args.depth if args.depth is not None else d
    auto_bin, auto_cat = feature_types(args.dataset_name)
    binary_feature = parse_feature_flag(args.binary_feature, auto_bin)
    categorical_feature = parse_feature_flag(args.categorical_feature, auto_cat)

    from oak_tpu.experiment import ExperimentConfig, FitConfig, ModelConfig

    cfg = ExperimentConfig(
        dataset_name=args.dataset_name,
        task="regression",
        k_folds=args.k,
        data_provenance=provenance,
        # sparse stays False: oak_model.fit itself switches to inducing
        # points when the PER-FOLD training size exceeds 1000 (the
        # reference's threshold, model_utils.py:374) — thresholding on the
        # full dataset size here would flip boundary-sized datasets
        model=ModelConfig(max_interaction_depth=depth, num_inducing=500,
                          binary_feature=binary_feature,
                          categorical_feature=categorical_feature,
                          optimizer=args.optimizer),
        fit=FitConfig(max_iters=args.max_iters, restarts=args.restarts),
    )
    out_dir = (Path(args.output_dir) if args.output_dir is not None
               else Path(__file__).parent / "outputs" / args.dataset_name)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg.save(out_dir / "config.json")

    np.random.seed(cfg.seed)
    perm = np.random.permutation(n)
    X, y = X[perm], y[perm]

    from sklearn.model_selection import KFold

    stamp = provenance_stamp(args.restarts)
    failed_folds = []
    kf = KFold(n_splits=cfg.k_folds)
    for fold, (train_index, test_index) in enumerate(kf.split(X)):
        X_train, X_test = X[train_index], X[test_index]
        y_train, y_test = y[train_index], y[test_index]

        t0 = time.time()
        oak = cfg.run_fold(X_train, y_train)
        train_time = time.time() - t0

        y_pred = oak.predict(X_test, clip=True)
        rmse = float(np.sqrt(np.mean((y_pred - y_test[:, 0]) ** 2)))
        nll = float(-oak.get_loglik(X_test, y_test, clip=True))

        # Sobol + cumulative-Sobol-vs-RMSE curve (reference :123-136)
        t1 = time.time()
        sobols = oak.get_sobol()
        sobol_time = time.time() - t1
        tuples = oak.tuple_of_indices
        order = np.argsort(sobols)[::-1]

        comps = oak.get_prediction_components(X_test, clip=True)  # [C, N]
        alpha, _ = oak.m.posterior_stats()
        constant = float(np.asarray(alpha).sum()
                         * np.asarray(oak.m.kernel.variances[0].value))
        y_base = np.ones(len(test_index)) * constant

        # sanity: components + constant reproduce the predictive mean.
        # Budget: with the prediction paths' mixed-precision refinement
        # (ops/psd.py) and exact per-dim grams (config.exact_gram), the
        # identity holds to 4.5e-3 max on the sharpest committed fit
        # (pumadyn depth 8, measured round 5 on the TPU); 1e-2 absolute is
        # the honest f32-hardware budget (in f64 the identity is ~1e-13).
        total_scaled = comps.sum(axis=0) + constant
        mu_scaled = np.asarray(oak.m.predict_f(
            oak._transform_x(np.clip(X_test, oak.xmin, oak.xmax)))[0])[:, 0]
        tol = 1e-2 + 2e-2 * np.abs(mu_scaled)
        bad = np.abs(total_scaled - mu_scaled) > tol
        assert not bad.any(), (
            f"component sum deviates from predictive mean beyond the f32 "
            f"error budget on {int(bad.sum())}/{bad.size} points: max diff "
            f"{float(np.abs(total_scaled - mu_scaled).max()):.4g}")

        cumulative_sobol, rmse_component = [], []
        acc = y_base.copy()
        for c in order:
            acc = acc + comps[c]
            y_unscaled = oak.scaler_y.inverse_transform(acc.reshape(-1, 1))[:, 0]
            rmse_component.append(
                float(np.sqrt(np.mean((y_unscaled - y_test[:, 0]) ** 2))))
            cumulative_sobol.append(sobols[c])
        cumulative_sobol = np.cumsum(cumulative_sobol)

        sobol_order = np.zeros(depth)
        for t, v in zip(tuples, sobols):
            sobol_order[len(t) - 1] += v

        oak.save(out_dir / f"model_oak_{fold}.npz")
        problems = write_fold_artifact(
            out_dir, fold, "regression",
            dict(
                rmse=rmse,
                nll=nll,
                order=order,
                sobol=sobols,
                cumulative_sobol=cumulative_sobol,
                rmse_component=rmse_component,
                sobol_order=sobol_order,
                train_time=train_time,
                sobol_time=sobol_time,
                synthetic=provenance["data_provenance"] == "synthetic_standin",
                data_generator_seed=(provenance["generator_seed"]
                                     if provenance["generator_seed"] is not None
                                     else -1),
            ), stamp)
        if problems:
            failed_folds.append(fold)
        print(json.dumps({
            "fold": fold, "rmse": round(rmse, 4), "nll": round(nll, 4),
            "train_s": round(train_time, 1), "sobol_s": round(sobol_time, 2),
            "sobol_order": [round(float(v), 4) for v in sobol_order[:4]],
            "problems": problems,
        }))
    if failed_folds:
        print(f"FAILED: folds {failed_folds} violated the committed-artifact "
              "sanity invariants; their out_<fold>.npz were NOT written")
        sys.exit(1)


if __name__ == "__main__":
    main()
