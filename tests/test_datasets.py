"""The examples' real-`.mat` ingestion branch (VERDICT r3 task 4).

This branch can never run in this image (zero egress: the UCI files cannot be
fetched), so it is the one production-only path in the examples — covered
here with tiny fabricated `.mat` files written by scipy.io.savemat. Pinned
behaviors, each matching the reference's loader quirks:

- autoMPG stores y as column 0 of X (reference
  examples/uci/uci_regression_train.py:69-71);
- other regression sets use separate X / y fields;
- classification labels are mapped {-1, 1} -> {0, 1} (reference
  uci_classification_train.py:84);
- provenance stamps data_provenance == "real_mat";
- heart's discrete columns are recoded to dense codes (raw UCI codes like
  thal = 3/6/7 become 0..C-1, the values the constrained kernels gather
  with) — an extension over the reference, which treats heart as
  all-continuous.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
from scipy import io as sio

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "uci"))
import datasets  # noqa: E402


def test_regression_real_mat_autompg_y_is_column_zero(tmp_path):
    rng = np.random.default_rng(0)
    raw = rng.normal(size=(12, 8))  # column 0 is y, columns 1..7 are X
    sio.savemat(tmp_path / "autompg.mat", {"X": raw})
    X, y, prov = datasets.load_regression("autoMPG", data_dir=str(tmp_path))
    np.testing.assert_allclose(X, raw[:, 1:])
    np.testing.assert_allclose(y, raw[:, :1])
    assert prov["data_provenance"] == "real_mat"
    assert prov["shape"] == [12, 7]


def test_regression_real_mat_separate_xy(tmp_path):
    rng = np.random.default_rng(1)
    Xr, yr = rng.normal(size=(9, 13)), rng.normal(size=(9, 1))
    sio.savemat(tmp_path / "housing.mat", {"X": Xr, "y": yr})
    X, y, prov = datasets.load_regression("housing", data_dir=str(tmp_path))
    np.testing.assert_allclose(X, Xr)
    np.testing.assert_allclose(y, yr)
    assert prov["data_provenance"] == "real_mat"


def test_classification_real_mat_label_mapping(tmp_path):
    rng = np.random.default_rng(2)
    Xr = rng.normal(size=(10, 9))
    yr = np.array([-1, 1, 1, -1, 1, -1, -1, 1, 1, -1], float).reshape(-1, 1)
    sio.savemat(tmp_path / "breast.mat", {"X": Xr, "y": yr})
    X, y, prov = datasets.load_classification("breast", data_dir=str(tmp_path))
    np.testing.assert_allclose(X, Xr)
    assert set(np.unique(y)) == {0.0, 1.0}
    np.testing.assert_allclose(y, (yr + 1) / 2)
    assert prov["data_provenance"] == "real_mat"


def test_classification_real_mat_heart_recodes_discrete(tmp_path):
    """Real heart columns carry raw UCI codes; the loader must hand the
    model dense 0..C-1 codes on every FEATURE_TYPES column."""
    rng = np.random.default_rng(3)
    n = 40
    Xr = rng.normal(size=(n, 13))
    Xr[:, 1] = rng.choice([0.0, 1.0], size=n)          # sex, already {0,1}
    Xr[:, 5] = rng.choice([1.0, 2.0], size=n)          # fbs coded {1,2}
    Xr[:, 8] = rng.choice([0.0, 1.0], size=n)          # exang
    Xr[:, 2] = rng.choice([1.0, 2.0, 3.0, 4.0], size=n)   # cp
    Xr[:, 6] = rng.choice([0.0, 1.0, 2.0], size=n)     # restecg
    Xr[:, 10] = rng.choice([1.0, 2.0, 3.0], size=n)    # slope
    Xr[:, 11] = rng.choice([0.0, 1.0, 2.0, 3.0], size=n)  # ca
    Xr[:, 12] = rng.choice([3.0, 6.0, 7.0], size=n)    # thal raw codes
    yr = rng.choice([-1.0, 1.0], size=(n, 1))
    sio.savemat(tmp_path / "r_heart.mat", {"X": Xr, "y": yr})
    X, y, prov = datasets.load_classification("heart", data_dir=str(tmp_path))
    assert prov["data_provenance"] == "real_mat"
    ft = datasets.FEATURE_TYPES["heart"]
    for j in ft["binary"]:
        assert set(np.unique(X[:, j])) <= {0.0, 1.0}, j
    for j, c in ft["categorical"].items():
        levels = np.unique(X[:, j])
        assert levels.min() == 0.0 and levels.max() <= c - 1, j
        np.testing.assert_allclose(levels, np.arange(len(levels)))
    # continuous columns untouched
    for j in (0, 3, 4, 7, 9):
        np.testing.assert_allclose(X[:, j], Xr[:, j])


def test_recode_rejects_nonbinary_flagged_column(tmp_path):
    Xr = np.zeros((6, 13))
    Xr[:, 1] = [0, 1, 2, 0, 1, 2]  # 3 levels on a binary-flagged column
    with pytest.raises(ValueError, match="binary"):
        datasets._recode_discrete(Xr, "heart")


def test_synthetic_heart_standin_matches_type_signature():
    """The zero-egress fallback must exercise the same discrete signature
    the real dataset has (VERDICT r3 task 2)."""
    X, y, prov = datasets.load_classification(
        "heart", data_dir="/nonexistent-dir")
    assert prov["data_provenance"] == "synthetic_standin"
    assert X.shape == (297, 13)
    ft = datasets.FEATURE_TYPES["heart"]
    for j in ft["binary"]:
        assert set(np.unique(X[:, j])) == {0.0, 1.0}, j
    for j, c in ft["categorical"].items():
        np.testing.assert_allclose(np.unique(X[:, j]), np.arange(c))
    assert set(np.unique(y)) == {0.0, 1.0}
    # both classes are materially populated
    assert 0.2 <= y.mean() <= 0.8


def test_parse_feature_flag():
    assert datasets.parse_feature_flag("auto", [1, 2]) == [1, 2]
    assert datasets.parse_feature_flag("auto", None) is None
    assert datasets.parse_feature_flag("none", [1]) is None
    assert datasets.parse_feature_flag("", [1]) is None
    assert datasets.parse_feature_flag("3,5,8", None) == [3, 5, 8]
