"""Serving-export walkthrough: train an OAK model, serialize its predict
function as a self-contained AOT artifact, and serve from the artifact alone.

The artifact (StableHLO via jax.export, symbolic batch dimension, parameters
baked in) needs no oak_tpu model rebuild, no checkpoint, and no sklearn
preprocessing objects at serving time — the flows/scalers are lowered into
the function. The reference library has no serving story: deployment there
means pickling hyperparameters and rebuilding a GPflow model in a TF
environment (reference model_utils.py:44-87).

Run: python examples/serving_example.py
"""

import sys
from pathlib import Path

import numpy as np

try:  # installed package (pip install -e .)
    from oak_tpu import deserialize_predict, oak_model, serialize_predict
except ImportError:  # uninstalled checkout: put the repo root on the path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from oak_tpu import deserialize_predict, oak_model, serialize_predict


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default="/tmp/oak_predict.jaxexp",
                    help="where to write the serialized predict artifact")
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--max_iters", type=int, default=1000)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n = args.n
    n_train = (3 * n) // 4
    X = rng.normal(size=(n, 5))
    w = rng.normal(size=5)
    y = (np.sin(X @ w) + 0.4 * X[:, 0] * X[:, 1]
         + 0.05 * rng.normal(size=n)).reshape(-1, 1)

    oak = oak_model(max_interaction_depth=2)
    oak.fit(X[:n_train], y[:n_train], optimise=False)
    oak.optimise(max_iters=args.max_iters)

    path = args.path
    blob = serialize_predict(oak, path, include_var=True)
    print(f"serialized predict artifact: {len(blob)} bytes -> {path}")

    # ---- a "different process" would start here: artifact only ----
    serve = deserialize_predict(path)
    mean, std = (np.asarray(a) for a in serve(X[n_train:].astype(np.float32)))
    rmse = float(np.sqrt(np.mean((mean - y[n_train:, 0]) ** 2)))
    inside = float(np.mean(np.abs(mean - y[n_train:, 0]) < 2 * std))
    print(f"served {len(mean)} predictions: rmse={rmse:.4f}, "
          f"{inside:.0%} of targets inside the 2-sigma band")
    # symbolic batch dim: same artifact, any batch size
    one = serve(X[:1].astype(np.float32))
    print(f"single-row request ok: mean={float(np.asarray(one[0])[0]):.4f}")


if __name__ == "__main__":
    main()
