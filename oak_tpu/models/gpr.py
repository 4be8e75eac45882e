"""Exact GP regression (GPR) with the OAK kernel.

Replaces ``gpflow.models.GPR`` as used by the reference
(/root/reference/oak/model_utils.py:159; sufficient statistics at
utils.py:206-211). Pure-functional: the model is one pytree; the loss is a
jitted function of it. Cholesky-based marginal likelihood; data is carried in
the pytree (like GPflow's data-owning models) so downstream Sobol/plotting
paths have access.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

from ..kernels.oak_kernel import OAKKernel
from ..ops.psd import (cholesky, cholesky_solve, logdet_from_chol,
                       refine_cholesky, solve_lower_refined,
                       solve_upper_refined)
from ..params import log_prior_density
from .likelihoods import Gaussian

_LOG2PI = math.log(2.0 * math.pi)


@struct.dataclass
class GPR:
    kernel: OAKKernel
    likelihood: Gaussian
    X: jnp.ndarray  # [N, D]
    Y: jnp.ndarray  # [N, R]

    @classmethod
    def create(cls, X, Y, kernel: OAKKernel, noise_variance: float = 1.0) -> "GPR":
        X = jnp.asarray(X)
        Y = jnp.asarray(Y)
        if Y.ndim == 1:
            Y = Y[:, None]
        return cls(kernel=kernel, likelihood=Gaussian.create(noise_variance, dtype=X.dtype),
                   X=X, Y=Y.astype(X.dtype))

    # ------------------------------------------------------------------ #
    def _chol(self, refined: bool = False) -> jnp.ndarray:
        K = self.kernel.K(self.X)
        Ky = K + self.likelihood.variance.value * jnp.eye(K.shape[0], dtype=K.dtype)
        L = cholesky(Ky, jitter=0.0)
        # prediction paths: Newton-refine against the HIGHEST-precision
        # residual (ops/psd.py mixed-precision refinement note)
        return refine_cholesky(Ky, L) if refined else L

    def log_marginal_likelihood(self) -> jnp.ndarray:
        L = self._chol()
        N, R = self.Y.shape
        alpha = cholesky_solve(L, self.Y)
        # y^T K^-1 y >= 0 in exact math; enforce it so an f32-broken factor
        # cannot fabricate likelihood (the SGPR bound's clamp rationale,
        # models/sgpr.py::elbo)
        quad = jnp.maximum(jnp.sum(self.Y * alpha), 0.0)
        return -0.5 * (quad + R * logdet_from_chol(L) + N * R * _LOG2PI)

    def training_loss(self) -> jnp.ndarray:
        """-(log marginal + log priors), GPflow ``training_loss`` semantics."""
        return -(self.log_marginal_likelihood() + log_prior_density(self))

    # ------------------------------------------------------------------ #
    def predict_f(self, Xnew, full_cov: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # prediction-path GEMMs at HIGH precision and grams on the exact
        # per-dim route (models/sgpr.py::predict_f + config.exact_gram
        # precision notes); training (log_marginal_likelihood) keeps DEFAULT
        from ..config import exact_gram
        from ..ops.psd import _hmm

        with exact_gram():
            return self._predict_f_exact(Xnew, full_cov)

    def _predict_f_exact(self, Xnew, full_cov: bool = False):
        from ..ops.psd import _hmm

        L = self._chol(refined=True)
        Kmn = self.kernel.K(self.X, jnp.asarray(Xnew))  # [N, S]
        A = solve_lower_refined(L, Kmn)  # [N, S]
        mean = _hmm(A.T, solve_lower_refined(L, self.Y))
        if full_cov:
            cov = self.kernel.K(Xnew) - _hmm(A.T, A)
            return mean, cov
        var = self.kernel.K_diag(jnp.asarray(Xnew)) - jnp.sum(A * A, axis=0)
        return mean, var[:, None] * jnp.ones((1, self.Y.shape[1]), A.dtype)


    def predict_f_samples(self, Xnew, num_samples: int = 1, seed=0):
        """Joint posterior function draws at Xnew, [num_samples, S, R]
        (GPflow ``predict_f_samples`` semantics; models/sampling.py)."""
        from .sampling import predict_f_samples

        return predict_f_samples(self, Xnew, num_samples, seed)

    def predict_y(self, Xnew) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mu, var = self.predict_f(Xnew)
        return self.likelihood.predict_mean_and_var(mu, var)

    def predict_log_density(self, Xnew, Ynew) -> jnp.ndarray:
        mu, var = self.predict_f(Xnew)
        Ynew = jnp.asarray(Ynew)
        if Ynew.ndim == 1:
            Ynew = Ynew[:, None]
        return jnp.sum(self.likelihood.predict_log_density(mu, var, Ynew), axis=-1)

    # ------------------------------------------------------------------ #
    def posterior_alpha(self) -> jnp.ndarray:
        """alpha with predictive mean = K(Xnew, X) alpha (no Qinv)."""
        from ..config import exact_gram

        with exact_gram():
            L = self._chol(refined=True)
            return solve_upper_refined(L, solve_lower_refined(L, self.Y))

    def posterior_stats(self):
        """(alpha, Qinv) with predictive mean = K(Xnew,X) alpha and
        covariance = K(Xnew) - K(Xnew,X) Qinv K(X,Xnew); the GPR branch of the
        reference's ``get_model_sufficient_statistics`` (utils.py:206-211)."""
        from ..config import exact_gram

        with exact_gram():
            L = self._chol(refined=True)
        alpha = solve_upper_refined(L, solve_lower_refined(L, self.Y))
        eye = jnp.eye(L.shape[0], dtype=L.dtype)
        Qinv = solve_upper_refined(L, solve_lower_refined(L, eye))
        return alpha, Qinv

    @property
    def data(self):
        return self.X, self.Y

    @property
    def inducing_points(self) -> Optional[jnp.ndarray]:
        return None
