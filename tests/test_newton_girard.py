import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oak_tpu.ops import (
    elementary_symmetric_bruteforce,
    newton_girard,
    newton_girard_stacked,
)


@pytest.mark.parametrize("num_dims", [1, 3, 5])
@pytest.mark.parametrize("depth", [1, 2, 5])
def test_newton_girard_matches_bruteforce(num_dims, depth, rng):
    grams = [jnp.asarray(rng.uniform(0.1, 1.0, (4, 4))) for _ in range(num_dims)]
    e = newton_girard(grams, depth)
    ref = elementary_symmetric_bruteforce(grams, depth)
    assert len(e) == depth + 1
    for n in range(depth + 1):
        if n <= num_dims:
            np.testing.assert_allclose(np.asarray(e[n]), np.asarray(ref[n]),
                                       rtol=1e-10, atol=1e-12)
        else:
            # elementary symmetric polynomials above D vanish identically
            np.testing.assert_allclose(np.asarray(e[n]), 0.0, atol=1e-9)


def test_newton_girard_top_order_included(rng):
    """Covers the gap in the reference's test (its brute-force loop dropped the
    highest order, tests/test_kernel_properties.py:69-86)."""
    grams = [jnp.asarray(rng.uniform(0.5, 1.5, (3, 3))) for _ in range(4)]
    e = newton_girard(grams, 4)
    prod = grams[0] * grams[1] * grams[2] * grams[3]
    np.testing.assert_allclose(np.asarray(e[4]), np.asarray(prod), rtol=1e-10)


def test_newton_girard_stacked_and_jit(rng):
    stack = jnp.asarray(rng.uniform(0.1, 1.0, (4, 5, 5)))
    out = jax.jit(lambda s: newton_girard_stacked(s, 3))(stack)
    ref = elementary_symmetric_bruteforce(list(stack), 3)
    for n in range(4):
        np.testing.assert_allclose(np.asarray(out[n]), np.asarray(ref[n]), rtol=1e-10)


def test_newton_girard_vectors(rng):
    vecs = [jnp.asarray(rng.uniform(0.1, 1.0, (7,))) for _ in range(3)]
    e = newton_girard(vecs, 2)
    ref = elementary_symmetric_bruteforce(vecs, 2)
    for a, b in zip(e, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


def test_newton_girard_f32_depth_stability(rng):
    """f32 Newton-Girard stays accurate at production depths (PARITY_NOTES:
    the alternating-sign recursion was flagged as a risk; measured, it is
    <= ~5e-6 relative at D=32 depth 16 for constrained-kernel-like values)."""
    for D, depth, tol in [(10, 5, 1e-5), (32, 10, 1e-4), (32, 16, 1e-4)]:
        grams64 = [jnp.asarray(rng.uniform(-0.3, 1.0, (32, 32))) for _ in range(D)]
        grams32 = [g.astype(jnp.float32) for g in grams64]
        e64 = newton_girard(grams64, depth)
        e32 = newton_girard(grams32, depth)
        for n in range(1, depth + 1):
            a = np.asarray(e64[n])
            b = np.asarray(e32[n], np.float64)
            assert np.abs(a - b).max() / (np.abs(a).max() + 1e-30) < tol
