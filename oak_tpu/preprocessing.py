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


def initialize_kmeans_with_binary(
    X: np.ndarray, binary_index: Sequence[int],
    continuous_index: Optional[Sequence[int]] = None, n_clusters: int = 200,
) -> np.ndarray:
    """utils.py:533-552: per-binary-column k-means rounded to int, joint
    k-means on the continuous block."""
    Z = np.zeros((n_clusters, X.shape[1]))
    for idx in binary_index:
        km = KMeans(n_clusters=n_clusters, random_state=0, n_init=10).fit(X[:, [idx]])
        Z[:, idx] = km.cluster_centers_.astype(int)[:, 0]
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
    """utils.py:555-574."""
    Z = np.zeros((n_clusters, X.shape[1]))
    for idx in list(binary_index) + list(categorical_index):
        km = KMeans(n_clusters=n_clusters, random_state=0, n_init=10).fit(X[:, [idx]])
        Z[:, idx] = km.cluster_centers_.astype(int)[:, 0]
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
