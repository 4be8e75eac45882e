"""Joint posterior function draws (GPflow ``predict_f_samples`` semantics).

The reference never exposes sampling as API — its tests draw GP samples with
raw numpy ``multivariate_normal`` (e.g. tests/test_orthogonality.py) and
users are left to do the same. Here every model carries
``predict_f_samples(Xnew, num_samples, seed)`` built on the full predictive
covariance and the jitter-escalating Cholesky.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.psd import safe_cholesky


def sample_mvn_columns(key, mean: jnp.ndarray, cov: jnp.ndarray,
                       num_samples: int) -> jnp.ndarray:
    """Draws from independent-per-column Gaussians N(mean[:, r], cov).

    ``mean``: [S, R]; ``cov``: [S, S] (one covariance shared by all R output
    columns — GPR/SGPR) or [R, S, S] (per-latent covariances — SVGP).
    Returns [num_samples, S, R].
    """
    S, R = mean.shape
    eps = jax.random.normal(key, (num_samples, S, R), mean.dtype)
    if cov.ndim == 2:
        L = safe_cholesky(cov)[0]
        draws = jnp.einsum("st,ntr->nsr", L, eps)
    else:
        Ls = jnp.stack([safe_cholesky(cov[r])[0] for r in range(cov.shape[0])])
        draws = jnp.einsum("rst,ntr->nsr", Ls, eps)
    return mean[None] + draws


def predict_f_samples(model, Xnew, num_samples: int = 1, seed=0) -> jnp.ndarray:
    """Joint samples of the posterior function at ``Xnew``:
    [num_samples, S, R]. ``seed`` is an int or a jax PRNG key."""
    mean, cov = model.predict_f(Xnew, full_cov=True)
    key = jax.random.PRNGKey(seed) if isinstance(seed, int) else seed
    return sample_mvn_columns(key, mean, cov, num_samples)
