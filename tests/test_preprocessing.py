"""Inducing-point initialization for mixed discrete/continuous inputs.

Regression coverage for the round-4 heart NaN fits: the reference runs a
per-discrete-column KMeans(n_clusters) and truncates centers to int
(utils.py:533-574); with n_clusters far above the number of distinct codes,
sklearn's empty-cluster relocation can emit centers far outside the data
hull (observed: -39.4 on a {0, 1, 2} column, sklearn 1.9), and truncation
drops levels (1.999... -> 1). Out-of-range codes then feed the categorical
kernel's level-index lookup. oak_tpu allocates observed level codes
proportionally to their frequencies instead (preprocessing._discrete_centers).
"""

import numpy as np
import pytest

from oak_tpu.preprocessing import (_discrete_centers,
                                   initialize_kmeans_with_binary,
                                   initialize_kmeans_with_categorical)


@pytest.mark.parametrize("n_levels,n_clusters", [(2, 200), (3, 200), (4, 7),
                                                 (5, 3), (2, 1)])
def test_discrete_centers_in_range_and_sized(n_levels, n_clusters):
    rng = np.random.default_rng(0)
    col = rng.integers(0, n_levels, size=237).astype(float)
    c = _discrete_centers(col, n_clusters)
    assert c.shape == (n_clusters,)
    assert set(np.unique(c)) <= set(np.unique(col))


def test_discrete_centers_proportional_allocation():
    col = np.array([0.0] * 150 + [1.0] * 40 + [2.0] * 10)
    c = _discrete_centers(col, 100)
    counts = np.bincount(c.astype(int), minlength=3)
    assert counts.sum() == 100
    # largest-remainder allocation tracks the observed frequencies
    np.testing.assert_array_equal(counts, [75, 20, 5])
    # every observed level keeps at least one slot when room allows
    assert (counts >= 1).all()


def test_mixed_init_never_emits_out_of_range_codes():
    """The heart configuration that NaNed in round 4: 200 inducing points,
    237 rows, discrete columns with 2-4 levels. Every discrete coordinate of
    every inducing point must be an observed level code."""
    rng = np.random.default_rng(1)
    n = 237
    X = np.zeros((n, 6))
    X[:, 0] = rng.normal(size=n)                      # continuous
    X[:, 1] = rng.integers(0, 2, size=n)              # binary
    X[:, 2] = rng.integers(0, 4, size=n)              # categorical, 4 levels
    X[:, 3] = rng.normal(size=n)                      # continuous
    X[:, 4] = rng.integers(0, 3, size=n)              # categorical, 3 levels
    X[:, 5] = rng.integers(0, 2, size=n)              # binary
    Z = initialize_kmeans_with_categorical(
        X, binary_index=[1, 5], categorical_index=[2, 4],
        continuous_index=[0, 3], n_clusters=200)
    assert Z.shape == (200, 6)
    for idx in (1, 2, 4, 5):
        observed = set(np.unique(X[:, idx]))
        assert set(np.unique(Z[:, idx])) <= observed, idx
    # continuous block: k-means centers stay inside the data hull
    for idx in (0, 3):
        assert Z[:, idx].min() >= X[:, idx].min() - 1e-9
        assert Z[:, idx].max() <= X[:, idx].max() + 1e-9


def test_binary_init_never_emits_out_of_range_codes():
    rng = np.random.default_rng(2)
    n = 64
    X = np.column_stack([rng.integers(0, 2, size=n).astype(float),
                         rng.normal(size=n)])
    Z = initialize_kmeans_with_binary(X, binary_index=[0],
                                      continuous_index=[1], n_clusters=50)
    assert set(np.unique(Z[:, 0])) <= {0.0, 1.0}
    assert Z.shape == (50, 2)
