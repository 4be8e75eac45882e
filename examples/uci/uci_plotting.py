"""Load a saved fold model and plot the top effects.

Rebuild of the reference's examples/uci/uci_plotting.py — but loading is a
one-liner because checkpoints carry full wrapper state (no shape-matched
rebuild needed, cf. reference :163-200).
"""

import argparse
from pathlib import Path
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "../..")))

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
    args = ap.parse_args()

    from oak_tpu import load_reference_npz, oak_model

    out_dir = Path(__file__).parent / "outputs" / args.dataset_name
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
