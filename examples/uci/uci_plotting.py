"""Load a saved fold model and plot the top effects.

Rebuild of the reference's examples/uci/uci_plotting.py — but loading is a
one-liner because checkpoints carry full wrapper state (no shape-matched
rebuild needed, cf. reference :163-200).
"""

import argparse
import sys
from pathlib import Path

try:  # installed package (pip install -e .)
    import oak_tpu  # noqa: F401
except ImportError:  # uninstalled checkout: put the repo root on the path
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    import oak_tpu  # noqa: F401  (runs the OAK_TPU_PLATFORM hook now)

# Feature-name tables for all 10 datasets (reference :19-96; the reference
# keys housing as "Housing" — both spellings are accepted below)
COVARIATE_NAMES = {
    "autoMPG": ["cylinders", "displacement", "horsepower", "weight",
                "acceleration", "year", "origin"],
    "housing": ["crime", "zoned", "industrial", "river", "NOX", "rooms",
                "age", "empl. dist.", "highway acc.", "tax", "pupil ratio",
                "black pct", "low status pct"],
    "concrete": ["Cement", "Blast Furnace Slag", "Fly Ash", "Water",
                 "Superplasticizer", "Coarse Aggregate", "Fine Aggregate",
                 "Age"],
    "pumadyn": [f"input {i}" for i in range(8)],
    "breast": ["ClumpThickness", "CellSize", "CellShape", "MarginalAdhesion",
               "SingleEpithelialCellSize", "BareNuclei", "BlandChromatin",
               "NormalNucleoli", "Mitoses"],
    "pima": ["Pregnancies", "Glucose", "BloodPressure", "SkinThickness",
             "Insulin", "BMI", "DiabetesPedigreeFunction", "Age"],
    "sonar": [f"input {i}" for i in range(60)],
    "ionosphere": [f"input {i}" for i in range(32)],
    "liver": ["mcv", "alkphos", "sgpt", "sgot", "gammagt", "drinks"],
    "heart": ["age", "sex", "cp", "trestbps", "chol", "fbs", "restecg",
              "thelach", "exang", "oldpeak", "slope", "ca", "thal"],
}
COVARIATE_NAMES["Housing"] = COVARIATE_NAMES["housing"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_name", default="autoMPG")
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument("--top_n", type=int, default=5)
    ap.add_argument("--reference_npz", default=None,
                    help="a checkpoint written by the REFERENCE's save_model "
                         "(positional hyperparams layout): rebuild this "
                         "fold's model shape, then overwrite its parameters "
                         "from the reference file (for output diffing)")
    ap.add_argument("--output_dir", default=None,
                    help="fold-output directory to read the checkpoint from "
                         "and write figures into "
                         "(default: examples/uci/outputs/<dataset_name>)")
    args = ap.parse_args()

    from oak_tpu import load_reference_npz, oak_model

    out_dir = (Path(args.output_dir) if args.output_dir is not None
               else Path(__file__).parent / "outputs" / args.dataset_name)
    oak = oak_model.load(out_dir / f"model_oak_{args.fold}.npz")
    if args.reference_npz:
        oak.m = load_reference_npz(oak.m, args.reference_npz)
    names = COVARIATE_NAMES.get(args.dataset_name)
    figs = oak.plot(
        X_columns=names,
        top_n=args.top_n,
        save_fig=str(out_dir / "decomposition"),
    )
    print(f"saved {len(figs)} figures to {out_dir / 'decomposition'}")


if __name__ == "__main__":
    main()
