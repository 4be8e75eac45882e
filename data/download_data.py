"""Fetch the UCI .mat files used by the examples.

Mirrors the reference's data/download_data.py (same sources: the
duvenaud/additive-gps repository): 4 regression + 6 classification datasets.
Run from anywhere; files land next to this script. In offline environments
the examples fall back to synthetic data with matching shapes.
"""

import os
import urllib.request

BASE = "https://github.com/duvenaud/additive-gps/raw/master/data"

REGRESSION = {
    "autompg.mat": f"{BASE}/regression/autompg.mat",
    "housing.mat": f"{BASE}/regression/housing.mat",
    "r_concrete_1030.mat": f"{BASE}/regression/r_concrete_1030.mat",
    "pumadyn8nh.mat": f"{BASE}/regression/pumadyn8nh.mat",
}

CLASSIFICATION = {
    "breast.mat": f"{BASE}/classification/breast.mat",
    "pima.mat": f"{BASE}/classification/pima.mat",
    "sonar.mat": f"{BASE}/classification/sonar.mat",
    "ionosphere.mat": f"{BASE}/classification/ionosphere.mat",
    "r_liver.mat": f"{BASE}/classification/r_liver.mat",
    "r_heart.mat": f"{BASE}/classification/r_heart.mat",
}


def main():
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name, url in {**REGRESSION, **CLASSIFICATION}.items():
        dest = os.path.join(out_dir, name)
        if os.path.exists(dest):
            print(f"{name}: already present")
            continue
        print(f"downloading {url} -> {dest}")
        urllib.request.urlretrieve(url, dest)


if __name__ == "__main__":
    main()
