"""Sparse GP regression — the Titsias (2009) collapsed bound.

Replaces ``gpflow.models.SGPR`` as used by the reference
(/root/reference/oak/model_utils.py:150-157); the posterior re-derivation the
reference does by hand at utils.py:180-204 is the spec for
``posterior_stats``. All dense algebra is MXU-shaped: Kuf [M, N] built once
per evaluation, two Choleskys of [M, M].
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import struct

from ..kernels.oak_kernel import OAKKernel
from ..ops.psd import (add_jitter, cholesky, cholesky_lower, refine_cholesky,
                       solve_lower, solve_lower_refined,
                       tri_inv_lower, tri_inv_lower_refined, wide_rhs)
from ..params import Param, fixed, log_prior_density, param
from .likelihoods import Gaussian

_LOG2PI = math.log(2.0 * math.pi)


@struct.dataclass
class SGPR:
    kernel: OAKKernel
    likelihood: Gaussian
    Z: Param  # [M, D] inducing inputs (fixed by default, like the reference)
    X: jnp.ndarray
    Y: jnp.ndarray

    @classmethod
    def create(cls, X, Y, kernel: OAKKernel, Z, noise_variance: float = 1.0,
               trainable_Z: bool = False) -> "SGPR":
        X = jnp.asarray(X)
        Y = jnp.asarray(Y)
        if Y.ndim == 1:
            Y = Y[:, None]
        Zp = param(jnp.asarray(Z, X.dtype)) if trainable_Z else fixed(jnp.asarray(Z, X.dtype))
        return cls(kernel=kernel, likelihood=Gaussian.create(noise_variance, dtype=X.dtype),
                   Z=Zp, X=X, Y=Y.astype(X.dtype))

    # ------------------------------------------------------------------ #
    def _common(self, refined: bool = False):
        """``refined=True`` (prediction/interpretability paths): Newton-
        refine the factors/solves against HIGHEST-precision residuals and
        run the chain GEMMs at HIGH — XLA:TPU's Cholesky/TriangularSolve
        internals are single-pass bf16 and a sharp Kuu's conditioning
        amplifies that to O(0.1) prediction error (ops/psd.py mixed-
        precision refinement note). Training (elbo) keeps the benchmarked
        fast route."""
        from ..ops.psd import _hmm

        Z = self.Z.value
        sigma2 = self.likelihood.variance.value
        sigma = jnp.sqrt(sigma2)
        Kuu = self.kernel.K(Z)
        Kuf = self.kernel.K(Z, self.X)  # [M, N]
        if refined:
            Kj = add_jitter(Kuu)
            L = refine_cholesky(Kj, cholesky_lower(Kj))
            Linv = tri_inv_lower_refined(L)
            A = _hmm(Linv, Kuf) / sigma  # [M, N]
            B = _hmm(A, A.T) + jnp.eye(A.shape[0], dtype=A.dtype)
            LB = refine_cholesky(B, cholesky_lower(B))
            c = solve_lower_refined(LB, _hmm(A, self.Y)) / sigma  # [M, R]
            return L, Linv, A, LB, c, sigma2
        L = cholesky(Kuu)  # jittered
        # [M, N] wide-RHS solve as explicit-inverse GEMM (ops/psd.py
        # tri_inv_lower) — this is the per-iteration hot op of SGPR fits;
        # Linv is returned so predict/posterior paths reuse it for free
        Linv = tri_inv_lower(L)
        A = (Linv @ Kuf) / sigma  # [M, N]
        B = A @ A.T + jnp.eye(A.shape[0], dtype=A.dtype)
        LB = cholesky(B, jitter=0.0)
        Aerr = A @ self.Y
        c = solve_lower(LB, Aerr) / sigma  # [M, R]
        return L, Linv, A, LB, c, sigma2

    def elbo(self) -> jnp.ndarray:
        """Titsias collapsed bound, with its exact-math inequalities ENFORCED
        so f32 breakdown cannot fabricate reward. In exact arithmetic

            ||c||^2 <= y^T y / sigma^2      (A^T B^-1 A is a contraction),
            tr(AA^T) <= sum K_diag/sigma^2  (Nystrom Q_ff ⪯ K_ff),
            diag(LB) >= 1                   (B = I + AA^T ⪰ I),

        but in the f32 interpolation-collapse basin (likelihood variance at
        its floor, near-singular jittered Kuu) the condition number of the
        A/LB chain reaches ~1e12 and the computed bound violates them by
        orders of magnitude: a 4-lane multistart on the depth-8 pumadyn
        SGPR converged to "bounds" of -3.5e7..-5.3e8 (impossible: the true
        bound is capped near 6·N ≈ 4e4 nats) and L-BFGS maximized the
        numerical bug into a NaN-predicting model (round-5 regeneration).
        The clamps are inactive at healthy parameters (the inequalities are
        strict with margin), and min/max route gradients cleanly at the
        boundary — the collapse basin simply stops looking attractive."""
        L, _, A, LB, c, sigma2 = self._common()
        N, R = self.Y.shape
        kdiag_sum = jnp.sum(self.kernel.K_diag(self.X))
        trace_term = jnp.sum(A * A)  # tr(A A^T) in the whitened space
        ydata = 0.5 * jnp.sum(self.Y * self.Y) / sigma2
        bound = (
            -0.5 * N * R * _LOG2PI
            - R * jnp.sum(jnp.log(jnp.maximum(jnp.diag(LB), 1.0)))
            - 0.5 * N * R * jnp.log(sigma2)
            - ydata
            + jnp.minimum(0.5 * jnp.sum(c * c), ydata)
            - 0.5 * R * jnp.maximum(kdiag_sum / sigma2 - trace_term, 0.0)
        )
        return bound

    def training_loss(self) -> jnp.ndarray:
        return -(self.elbo() + log_prior_density(self))

    # ------------------------------------------------------------------ #
    def predict_f(self, Xnew, full_cov: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # prediction-path GEMMs run at HIGH precision: TPU-default
        # single-pass bf16 puts ~1% relative error on the posterior mean,
        # which broke the sum-to-mean decomposition identity by 11% of the
        # cancellation mass on the sharp depth-8 pumadyn fit (round 5).
        # Training (elbo) keeps the benchmarked DEFAULT.
        from ..config import exact_gram
        from ..ops.psd import _hmm

        with exact_gram():
            return self._predict_f_exact(Xnew, full_cov)

    def _predict_f_exact(self, Xnew, full_cov: bool = False):
        from ..ops.psd import _hmm

        L, Linv, A, LB, c, _ = self._common(refined=True)
        Xnew = jnp.asarray(Xnew)
        Kus = self.kernel.K(self.Z.value, Xnew)  # [M, S]
        tmp1 = _hmm(Linv, Kus)  # [M, S]; Linv already formed by _common
        # explicit inverse only pays off for a wide RHS (shapes are static,
        # so this is a trace-time branch)
        if wide_rhs(Xnew.shape[0], LB.shape[0]):
            tmp2 = _hmm(tri_inv_lower_refined(LB), tmp1)  # [M, S]
        else:
            tmp2 = solve_lower_refined(LB, tmp1)
        mean = _hmm(tmp2.T, c)
        if full_cov:
            cov = (self.kernel.K(Xnew) - _hmm(tmp1.T, tmp1)
                   + _hmm(tmp2.T, tmp2))
            return mean, cov
        var = (
            self.kernel.K_diag(Xnew)
            - jnp.sum(tmp1 * tmp1, axis=0)
            + jnp.sum(tmp2 * tmp2, axis=0)
        )
        return mean, var[:, None] * jnp.ones((1, self.Y.shape[1]), var.dtype)


    def predict_f_samples(self, Xnew, num_samples: int = 1, seed=0):
        """Joint posterior function draws at Xnew, [num_samples, S, R]
        (GPflow ``predict_f_samples`` semantics; models/sampling.py)."""
        from .sampling import predict_f_samples

        return predict_f_samples(self, Xnew, num_samples, seed)

    def predict_y(self, Xnew):
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
        # Same operator route as predict_f (tri-inv + HIGH GEMMs), NOT XLA
        # triangular solves: predict evaluates Kus^T Linv^T LBinv^T c while
        # alpha-based consumers evaluate K(X, Z) alpha — if alpha is
        # computed through a different solve route, TPU solve-internal bf16
        # noise amplified by the factor conditioning makes the two
        # algebraically-identical answers disagree by ~0.1 on sharp fits
        # (the round-5 pumadyn sum-to-mean identity failure). One route,
        # one noise realization: the identity holds to f32 grade again.
        from ..config import exact_gram
        from ..ops.psd import _hmm

        with exact_gram():
            L, Linv, A, LB, c, _ = self._common(refined=True)
        return _hmm(Linv.T, _hmm(tri_inv_lower_refined(LB).T, c))

    def posterior_stats(self):
        """(alpha, Qinv): predictive mean = Kxu alpha, predictive covariance
        = Kxx - Kxu Qinv Kux. Matches the reference's hand-derived SGPR branch
        (utils.py:180-204): alpha = L^{-T} LB^{-T} c; Qinv = L^{-T}(I - B^{-1})L^{-1}."""
        from ..config import exact_gram
        from ..ops.psd import _hmm

        with exact_gram():
            L, Linv, A, LB, c, _ = self._common(refined=True)
        LBinv = tri_inv_lower_refined(LB)
        # the posterior_alpha operator route (tri-inv + HIGH GEMMs) — see
        # its precision note; alpha/Qinv feed every Sobol quadratic form
        # and per-component prediction
        alpha = _hmm(Linv.T, _hmm(LBinv.T, c))
        LBinv_Linv = _hmm(LBinv, Linv)
        Qinv = _hmm(Linv.T, Linv) - _hmm(LBinv_Linv.T, LBinv_Linv)
        return alpha, Qinv

    @property
    def data(self):
        return self.X, self.Y

    @property
    def inducing_points(self):
        return self.Z.value
