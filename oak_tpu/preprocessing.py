"""Input preprocessing: scalers, feature classification, k-means inducing-point
init, spherical-GMM measure estimation, empirical measures from unique values.

Rebuilds the sklearn-adjacent pieces of /root/reference/oak/model_utils.py
(:31-41, :703-770) and utils.py (:533-574). These run once per fit on small
host data, so they stay numpy/sklearn at the boundary (SURVEY §7 step 5); the
outputs feed static model structure.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
from sklearn.cluster import KMeans
from sklearn.mixture import GaussianMixture

from .measures import MOGMeasure


@dataclasses.dataclass
class StandardScaler:
    """Minimal sklearn.preprocessing.StandardScaler equivalent (fit/transform/
    inverse_transform on [N, D] numpy arrays)."""

    mean_: np.ndarray = None
    scale_: np.ndarray = None

    def fit(self, X: np.ndarray) -> "StandardScaler":
        X = np.asarray(X, np.float64)
        self.mean_ = X.mean(axis=0)
        std = X.std(axis=0)
        self.scale_ = np.where(std == 0.0, 1.0, std)
        return self

    def transform(self, X: np.ndarray) -> np.ndarray:
        return (np.asarray(X, np.float64) - self.mean_) / self.scale_

    def inverse_transform(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(X, np.float64) * self.scale_ + self.mean_

    @property
    def var_(self) -> np.ndarray:
        return self.scale_ ** 2


def get_kmeans_centers(X: np.ndarray, K: int = 500, seed: int = 0) -> np.ndarray:
    """K-means inducing init (model_utils.py:31-41; reference seeds 44/0)."""
    np.random.seed(44)
    kmeans = KMeans(n_clusters=K, random_state=seed, n_init=10).fit(X)
    return kmeans.cluster_centers_


def _discrete_centers(col: np.ndarray, n_clusters: int) -> np.ndarray:
    """Inducing-point coordinates for a discrete (binary/categorical) column:
    the observed level codes, allocated proportionally to their observed
    frequencies (largest-remainder rounding; every observed level gets at
    least one slot when it fits).

    The reference runs a per-column KMeans(n_clusters) here and truncates the
    centers to int (utils.py:533-574). With n_clusters far above the number
    of distinct codes that is both lossy (a center of 1.999... truncates to
    1, dropping a level) and unsafe: sklearn's empty-cluster relocation can
    emit centers far outside the data hull (observed: -39.4 on a {0, 1, 2}
    column, sklearn 1.9), and an out-of-range code later feeds the
    categorical kernel's level-index lookup — the round-4 heart runs NaNed
    exactly this way. Frequency-proportional allocation is deterministic,
    always in-range, and matches what the KMeans call converges to in the
    benign case (each distinct code claims slots in proportion to its
    cluster's mass)."""
    vals, counts = np.unique(col, return_counts=True)
    if len(vals) >= n_clusters:
        return vals[np.argsort(counts)[::-1][:n_clusters]]
    frac = counts / counts.sum() * n_clusters
    quota = np.maximum(np.floor(frac).astype(int), 1)
    rem = np.argsort(frac - np.floor(frac))[::-1]
    for i in np.tile(rem, n_clusters):  # largest remainders first
        if quota.sum() >= n_clusters:
            break
        quota[i] += 1
    while quota.sum() > n_clusters:  # only when the >=1 floor overshot
        quota[np.argmax(quota)] -= 1
    return np.repeat(vals, quota)


def initialize_kmeans_with_binary(
    X: np.ndarray, binary_index: Sequence[int],
    continuous_index: Optional[Sequence[int]] = None, n_clusters: int = 200,
) -> np.ndarray:
    """utils.py:533-552: frequency-proportional codes on each binary column
    (see _discrete_centers — the reference's per-column KMeans is unsafe
    when n_clusters exceeds the distinct codes), joint k-means on the
    continuous block."""
    Z = np.zeros((n_clusters, X.shape[1]))
    for idx in binary_index:
        Z[:, idx] = _discrete_centers(X[:, idx], n_clusters)
    if continuous_index is not None and len(continuous_index):
        km = KMeans(n_clusters=n_clusters, random_state=0, n_init=10).fit(
            X[:, list(continuous_index)]
        )
        Z[:, list(continuous_index)] = km.cluster_centers_
    return Z


def initialize_kmeans_with_categorical(
    X: np.ndarray, binary_index: Sequence[int], categorical_index: Sequence[int],
    continuous_index: Sequence[int], n_clusters: int = 200,
) -> np.ndarray:
    """utils.py:555-574, with the discrete columns handled by
    _discrete_centers instead of the reference's unsafe per-column KMeans."""
    Z = np.zeros((n_clusters, X.shape[1]))
    for idx in list(binary_index) + list(categorical_index):
        Z[:, idx] = _discrete_centers(X[:, idx], n_clusters)
    if len(continuous_index):
        km = KMeans(n_clusters=n_clusters, random_state=0, n_init=10).fit(
            X[:, list(continuous_index)]
        )
        Z[:, list(continuous_index)] = km.cluster_centers_
    return Z


def estimate_one_dim_gmm(K: int, X: np.ndarray) -> MOGMeasure:
    """Spherical-GMM measure per continuous dim (model_utils.py:753-770)."""
    X = np.asarray(X).reshape(-1)
    if K <= 0:
        raise ValueError("GMM needs K > 0 components")
    gm = GaussianMixture(n_components=K, random_state=0, covariance_type="spherical").fit(
        X.reshape(-1, 1)
    )
    return MOGMeasure.create(
        means=gm.means_.reshape(-1), variances=gm.covariances_, weights=gm.weights_
    )


def calculate_features(
    X: np.ndarray,
    categorical_feature: Optional[Sequence[int]],
    binary_feature: Optional[Sequence[int]],
) -> Tuple[List[int], List[int], List[int], Optional[list], Optional[list]]:
    """Classify feature columns and estimate discrete measure probabilities
    (model_utils.py:703-750): binary p0 = 1 - mean(x); categorical p from
    observed frequencies."""
    D = X.shape[1]
    if binary_feature is None and categorical_feature is None:
        return list(range(D)), [], [], None, None
    if binary_feature is not None and categorical_feature is not None:
        overlap = set(binary_feature) & set(categorical_feature)
        if overlap:
            raise ValueError(f"Overlapping feature set {overlap}")
    binary_index, categorical_index, continuous_index = [], [], []
    p0: list = []
    p: list = []
    for j in range(D):
        if binary_feature is not None and j in binary_feature:
            p0.append(1.0 - X[:, j].mean())
            p.append(None)
            binary_index.append(j)
        elif categorical_feature is not None and j in categorical_feature:
            p0.append(None)
            values, counts = np.unique(X[:, j], return_counts=True)
            probs = (counts / counts.sum()).reshape(-1, 1)
            if not np.isclose(probs.sum(), 1.0, atol=1e-6):
                raise ValueError("categorical probabilities do not normalize")
            p.append(probs)
            categorical_index.append(j)
        else:
            p0.append(None)
            p.append(None)
            continuous_index.append(j)
    return continuous_index, binary_index, categorical_index, p0, p


def empirical_measure_from_column(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Unique values + frequencies (model_utils.py:334-344)."""
    locations, counts = np.unique(np.asarray(x).reshape(-1), return_counts=True)
    weights = (counts / counts.sum()).reshape(-1, 1)
    return locations.reshape(-1, 1), weights
