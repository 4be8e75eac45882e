"""Sparse variational GP (SVGP) — whitened, q_diag or full q_sqrt, Gaussian or
Bernoulli likelihood.

Replaces ``gpflow.models.SVGP`` as configured by the reference classification
path (whiten=True, q_diag=True, fixed Z, Bernoulli with jittered-sigmoid link;
/root/reference/examples/uci/uci_classification_train.py:108-124) and the
posterior ``alpha``/``Qinv`` statistics consumed by Sobol/plotting
(/root/reference/oak/utils.py:174-179).

The ELBO step is a pure function of (model, batch) and jit/pjit-friendly:
minibatching enters via an explicit scale factor, so the same function serves
full-batch L-BFGS parity runs and data-parallel Adam on a device mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

from ..kernels.oak_kernel import OAKKernel
from ..ops.psd import (cholesky, safe_cholesky, solve_lower, solve_upper,
                       tri_inv_lower, wide_rhs)
from ..params import Param, fixed, log_prior_density, param, positive


@struct.dataclass
class SVGP:
    kernel: OAKKernel
    likelihood: struct.PyTreeNode  # Gaussian or Bernoulli
    Z: Param  # [M, D]
    q_mu: Param  # [M, R]
    q_sqrt: Param  # diag: [M, R] positive; full: [R, M, M] lower-tri
    q_diag: bool = struct.field(pytree_node=False, default=True)
    whiten: bool = struct.field(pytree_node=False, default=True)
    num_data: Optional[int] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, kernel: OAKKernel, likelihood, Z, num_latent: int = 1,
               q_diag: bool = True, whiten: bool = True, trainable_Z: bool = False,
               num_data: Optional[int] = None, dtype=None) -> "SVGP":
        Z = jnp.asarray(Z, dtype)
        M = Z.shape[0]
        dtype = Z.dtype
        Zp = param(Z) if trainable_Z else fixed(Z)
        q_mu = param(jnp.zeros((M, num_latent), dtype))
        if q_diag:
            q_sqrt = positive(jnp.ones((M, num_latent), dtype), dtype=dtype)
        else:
            eye = jnp.eye(M, dtype=dtype)
            q_sqrt = param(jnp.tile(eye[None], (num_latent, 1, 1)))
        return cls(kernel=kernel, likelihood=likelihood, Z=Zp, q_mu=q_mu,
                   q_sqrt=q_sqrt, q_diag=q_diag, whiten=whiten, num_data=num_data)

    # ------------------------------------------------------------------ #
    def _q_sqrt_mats(self) -> jnp.ndarray:
        """[R, M, M] lower-triangular scale of q(u)."""
        q = self.q_sqrt.value
        if self.q_diag:
            return jnp.einsum("mr,mn->rmn", q, jnp.eye(q.shape[0], dtype=q.dtype))
        return jnp.tril(q)

    def prior_kl(self) -> jnp.ndarray:
        """KL(q(u) || p(u)); whitened p(u)=N(0,I) (the reference always runs
        whitened). The unwhitened case maps through Luu."""
        q_mu = self.q_mu.value
        M, R = q_mu.shape
        if self.q_diag:
            q = self.q_sqrt.value  # [M, R] stddevs
            logdet = 2.0 * jnp.sum(jnp.log(q))
            trace = jnp.sum(q * q)
        else:
            Lq = jnp.tril(self.q_sqrt.value)
            diag = jnp.diagonal(Lq, axis1=-2, axis2=-1)
            logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(diag)))
            trace = jnp.sum(Lq * Lq)
        if self.whiten:
            mahal = jnp.sum(q_mu * q_mu)
            return 0.5 * (trace + mahal - M * R - logdet)
        Luu = cholesky(self.kernel.K(self.Z.value))
        alpha = solve_lower(Luu, q_mu)
        mahal = jnp.sum(alpha * alpha)
        Lq = self._q_sqrt_mats()
        LinvLq = jnp.stack([solve_lower(Luu, Lq[r]) for r in range(R)])
        trace_w = jnp.sum(LinvLq * LinvLq)
        logdet_p = 2.0 * R * jnp.sum(jnp.log(jnp.diag(Luu)))
        return 0.5 * (trace_w + mahal - M * R - logdet + logdet_p)

    # ------------------------------------------------------------------ #
    def _safe_Luu(self) -> jnp.ndarray:
        """Jitter-ESCALATED Cholesky of Kuu for the prediction/posterior
        paths: a trained OAK can sit at near-constant per-dim kernels
        (lengthscales ~70 on the breast folds, round 5), where cond(Kuu)
        rides the f32 cliff and the default single-jitter factor NaNs in
        one compiled variant while the training leg's (differently
        blocked) instance survives — a finite-loss, accepted fit then
        predicted 100% NaN probabilities. Escalation keeps predictions
        finite at the cost of a slightly larger jitter on exactly the
        degenerate-conditioning fits where it cannot matter."""
        L, _ = safe_cholesky(self.kernel.K(self.Z.value))
        return L

    def predict_f(self, Xnew, full_cov: bool = False,
                  safe: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # ``safe=False`` (the ELBO's internal call): plain single-jitter
        # Cholesky — safe_cholesky's escalation while_loop is not
        # reverse-differentiable, and training wants the fast op anyway; a
        # non-finite loss honestly marks the lane as diverged. Public
        # predictions escalate (see _safe_Luu).
        Xnew = jnp.asarray(Xnew)
        Z = self.Z.value
        Luu = self._safe_Luu() if safe else cholesky(self.kernel.K(Z))
        Kus = self.kernel.K(Z, Xnew)  # [M, S]
        q_mu = self.q_mu.value
        R = q_mu.shape[1]
        if wide_rhs(Xnew.shape[0], Luu.shape[0]):
            # wide-RHS solves as explicit-inverse GEMMs (ops/psd.py
            # tri_inv_lower: ~2x faster fwd+bwd on TPU at the bench
            # shapes) — this is the ELBO/training branch (S = batch >= M)
            Linv = tri_inv_lower(Luu)
            A = Linv @ Kus  # [M, S] = Luu^{-1} Kus
            W = A if self.whiten else Linv.T @ A  # Kuu^{-1} Kus
        else:
            # narrow or SYMBOLIC RHS (small predict grids; jax.export
            # with a polymorphic batch): direct solves — cheaper than
            # forming the [M, M] inverse, and valid for any batch size
            # (trace-time branch; see ops/psd.py wide_rhs)
            A = solve_lower(Luu, Kus)
            W = A if self.whiten else solve_upper(Luu, A)

        mean = W.T @ q_mu  # [S, R]

        if self.q_diag:
            q = self.q_sqrt.value  # [M, R]
            SW2 = jnp.einsum("ms,mr->sr", W * W, q * q)  # [S, R]
        else:
            Lq = jnp.tril(self.q_sqrt.value)  # [R, M, M]
            LqTW = jnp.einsum("rnm,ns->rms", Lq, W)  # [R, M, S]
            SW2 = jnp.sum(LqTW * LqTW, axis=1).T  # [S, R]

        if full_cov:
            Kss = self.kernel.K(Xnew)
            base = Kss - A.T @ A
            if self.q_diag:
                q = self.q_sqrt.value
                covs = jnp.stack([
                    base + (W * (q[:, r] ** 2)[:, None]).T @ W for r in range(R)
                ])
            else:
                Lq = jnp.tril(self.q_sqrt.value)
                covs = jnp.stack([
                    base + (Lq[r].T @ W).T @ (Lq[r].T @ W) for r in range(R)
                ])
            return mean, covs
        var = (self.kernel.K_diag(Xnew) - jnp.sum(A * A, axis=0))[:, None] + SW2
        return mean, var


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
    def elbo(self, X, Y) -> jnp.ndarray:
        X = jnp.asarray(X)
        Y = jnp.asarray(Y)
        if Y.ndim == 1:
            Y = Y[:, None]
        fmu, fvar = self.predict_f(X, safe=False)
        ve = self.likelihood.variational_expectations(fmu, fvar, Y)
        scale = 1.0
        if self.num_data is not None:
            scale = self.num_data / X.shape[0]
        return jnp.sum(ve) * scale - self.prior_kl()

    def training_loss(self, X, Y) -> jnp.ndarray:
        return -(self.elbo(X, Y) + log_prior_density(self))

    # ------------------------------------------------------------------ #
    def posterior_alpha(self) -> jnp.ndarray:
        Luu = self._safe_Luu()
        if self.whiten:
            return solve_upper(Luu, self.q_mu.value)
        return solve_upper(Luu, solve_lower(Luu, self.q_mu.value))

    def posterior_stats(self):
        """(alpha, Qinv) a la GPflow posteriors: predictive mean = Kxu alpha,
        covariance = Kxx - Kxu Qinv Kux (utils.py:174-179). Whitened:
        alpha = Luu^{-T} q_mu, Qinv = Luu^{-T} (I - S) Luu^{-1} with
        S = Lq Lq^T (first latent)."""
        Z = self.Z.value
        Luu = self._safe_Luu()
        q_mu = self.q_mu.value
        Lq = self._q_sqrt_mats()[0]
        S = Lq @ Lq.T
        M = Luu.shape[0]
        eye = jnp.eye(M, dtype=Luu.dtype)
        if self.whiten:
            alpha = solve_upper(Luu, q_mu)
            Linv = tri_inv_lower(Luu)
            Qinv = Linv.T @ (eye - S) @ Linv
        else:
            Linv = tri_inv_lower(Luu)
            Kuu_inv = Linv.T @ Linv
            alpha = Kuu_inv @ q_mu
            Qinv = Kuu_inv - Kuu_inv @ S @ Kuu_inv
        return alpha, Qinv

    @property
    def inducing_points(self):
        return self.Z.value
