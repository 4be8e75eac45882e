"""Natural-gradient variational optimization for SVGP.

The variational distribution q(u) = N(m, S) is an exponential family; steepest
descent in its natural-parameter space (theta1 = S^-1 m, theta2 = -1/2 S^-1)
with the gradient taken in expectation coordinates (eta1 = m,
eta2 = S + m m^T) is the natural gradient:

    theta <- theta - gamma * dL/d(eta)

For a GAUSSIAN likelihood with a FULL-covariance q (q_diag=False) the ELBO
is concave in eta and one unit step (gamma = 1) on the full data lands q(u)
exactly on the optimal variational distribution — the SVGP bound collapses
onto the Titsias SGPR bound (tested). For non-conjugate likelihoods
(Bernoulli) smaller steps converge in far fewer iterations than Adam on the
raw (m, sqrt(S)) parameterization.

STABILITY — use q_diag=False for natural gradients. The mean-field family
(q_diag=True) restricts the update to diagonal natural parameters while the
true posterior precision Kuu^-1 + Kuu^-1 Kuf Kfu Kuu^-1 / sigma^2 is
strongly coupled off-diagonal; the diag step crushes S on diagonal
curvature, theta1 = m/S then amplifies the mean update along the ignored
coupled directions, and the iteration diverges for ANY practical gamma once
(num_data/batch) * prior_variance/noise_variance is large (measured on the
D=32 depth-3 bench config: loss grows ~30x/step identically at gamma=0.1
and 1e-3; the full-q update converges monotonically at gamma=0.1 at the
same config). This is why gpflow.optimizers.NaturalGradient refuses q_diag
models outright; we keep the diag branch for small-scale non-conjugate use
(where it is well-behaved and cheaper) but warn at every entry point.

This replaces the role of gpflow.optimizers.NaturalGradient, which the
reference stack has available but never uses (it runs full-batch BFGS on all
parameters; uci_classification_train.py:119-124) — a capability extension in
the spirit of SURVEY §2.4's "variational GP w/ natural or Adam updates".

The training loop alternates one natural-gradient step on (q_mu, q_sqrt)
with one Adam step on all OTHER trainables, both inside a single jitted
step on the flat trainable vector (relay-friendly: no pytree dispatch).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..params import apply_trainable_mask, flatten_trainable
from .fit import FitResult

_VAR_FLOOR = 1e-10


def warn_if_q_diag(model) -> None:
    """One-line hazard warning when natural gradients run on a mean-field q.

    Called (host-side, before tracing) by every natgrad entry point —
    fit_natgrad_adam / fit_natgrad_scan / fit_natgrad_multistart /
    data_parallel_natgrad_step. See the module docstring's STABILITY note:
    the diag-family step diverges at scale for any practical gamma; GPflow's
    NaturalGradient rejects q_diag models entirely."""
    if getattr(model, "q_diag", False):
        import warnings

        warnings.warn(
            "natural-gradient steps on a q_diag=True SVGP are unstable when "
            "(num_data/batch_size) * prior_variance/noise_variance is large "
            "(the mean-field natural step ignores the posterior's off-"
            "diagonal coupling and can diverge at any step size); build the "
            "model with q_diag=False for natgrad training",
            stacklevel=3)


def _eta_params(m):
    """Expectation parameters of q(u): eta1 = m [M, R]; eta2 = S + m m^T
    ([R, M, M] full-q, elementwise [M, R] mean-field)."""
    q_mu = m.q_mu.value
    if m.q_diag:
        s = m.q_sqrt.value
        return q_mu, s * s + q_mu * q_mu
    Lq = jnp.tril(m.q_sqrt.value)

    def e2_r(Lq_r, mu_r):
        return Lq_r @ Lq_r.T + jnp.outer(mu_r, mu_r)

    return q_mu, jax.vmap(e2_r, in_axes=(0, 1))(Lq, q_mu)


def _with_eta(m, e1, e2):
    """The model with q(u) rebuilt from expectation parameters — the
    differentiable map the eta-gradient passes through."""
    if m.q_diag:
        S_ = jnp.maximum(e2 - e1 * e1, _VAR_FLOOR)
        return m.replace(q_mu=m.q_mu.assign(e1),
                         q_sqrt=m.q_sqrt.assign(jnp.sqrt(S_)))
    M_ = e2.shape[-1]
    eye = jnp.eye(M_, dtype=e2.dtype)

    def rebuild_r(e2_r, e1_r):
        from ..ops.psd import cholesky_lower

        S_ = 0.5 * (e2_r + e2_r.T) - jnp.outer(e1_r, e1_r)
        return cholesky_lower(S_ + _VAR_FLOOR * eye)

    Lq_ = jax.vmap(rebuild_r, in_axes=(0, 1))(e2, e1)
    return m.replace(q_mu=m.q_mu.assign(e1), q_sqrt=m.q_sqrt.assign(Lq_))


def _apply_natural_step(m, g1, g2, gamma):
    """theta <- theta(m) - gamma * (dL/d eta), then back to (q_mu, q_sqrt).
    Rejects overshot (indefinite-precision) updates instead of poisoning q:
    elementwise for the mean-field family, per latent for full-q."""
    q_mu = m.q_mu.value  # [M, R]
    if m.q_diag:
        s = m.q_sqrt.value  # [M, R] stddevs
        S = s * s
        theta1, theta2 = q_mu / S, -0.5 / S
        t1 = theta1 - gamma * g1
        t2 = theta2 - gamma * g2
        # a valid natural parameter needs theta2 < 0; reject the step
        # elementwise where the (non-conjugate) update overshot
        ok = t2 < -_VAR_FLOOR
        S_new = jnp.where(ok, -0.5 / jnp.where(ok, t2, -1.0), S)
        m_new = S_new * jnp.where(ok, t1, theta1)
        return m.replace(q_mu=m.q_mu.assign(m_new),
                         q_sqrt=m.q_sqrt.assign(jnp.sqrt(S_new)))

    # full q_sqrt: [R, M, M] lower-triangular
    from ..ops.psd import chol_of_inv, tri_inv_lower

    Lq = jnp.tril(m.q_sqrt.value)

    def per_latent(mu_r, Lq_r):
        # S^-1 directly from the stored factor: S = Lq Lq^T holds whatever
        # the signs of Lq's diagonal; the explicit triangular inverse turns
        # the wide solve into one [M, M] solve + a GEMM (ops/psd.py
        # tri_inv_lower — a TPU triangular solve cannot ride the MXU)
        Linv = tri_inv_lower(Lq_r)
        Sinv = Linv.T @ Linv
        return Sinv @ mu_r, -0.5 * Sinv

    theta1s, theta2s = jax.vmap(per_latent, in_axes=(1, 0))(q_mu, Lq)
    t1 = theta1s - gamma * g1.T  # [R, M]
    t2 = theta2s - gamma * g2  # [R, M, M]

    def unmap_r(t1_r, t2_r, mu_old_r, Lq_old_r):
        P = -(t2_r + t2_r.T)  # = S_new^-1, symmetrized
        # Lq_new Lq_new^T = P^-1 in one Cholesky + one triangular solve
        # (chol_of_inv) instead of chol(P) -> cho_solve -> chol(S_new):
        # these ops are serial [M, M] back-substitutions on the step's
        # critical path (BASELINE.md: the natural-parameter algebra floor)
        Lq_new_r = chol_of_inv(P, _VAR_FLOOR)
        m_new_r = Lq_new_r @ (Lq_new_r.T @ t1_r)  # = S_new t1, two GEMVs
        # a non-conjugate overshoot makes theta2 indefinite -> NaNs from the
        # Cholesky; reject the whole latent's step rather than poison q
        bad = jnp.logical_not(jnp.all(jnp.isfinite(Lq_new_r))
                              & jnp.all(jnp.isfinite(m_new_r)))
        return (jnp.where(bad, mu_old_r, m_new_r),
                jnp.where(bad, Lq_old_r, Lq_new_r))

    m_new, Lq_new = jax.vmap(unmap_r)(t1, t2, q_mu.T, Lq)
    return m.replace(q_mu=m.q_mu.assign(m_new.T),
                     q_sqrt=m.q_sqrt.assign(Lq_new))


def _natgrad_update(m, loss_fn, gamma, args):
    """One natural-gradient step on (q_mu, q_sqrt) of an SVGP pytree."""
    e1, e2 = _eta_params(m)
    g1, g2 = jax.grad(lambda a, b: loss_fn(_with_eta(m, a, b), *args),
                      argnums=(0, 1))(e1, e2)
    return _apply_natural_step(m, g1, g2, gamma)


def natgrad_adam_step(opt, unflatten, loss_fn: Callable, gamma: float,
                      staggered: bool = False):
    """THE natgrad+Adam update: one natural-gradient step on (q_mu, q_sqrt)
    plus one Adam step on every other trainable. Shared by
    ``fit_natgrad_adam``, ``fit_natgrad_scan`` and
    ``parallel.data_parallel_natgrad_step`` — one definition so the update
    math (incl. the non-finite-gradient drop below) cannot silently diverge.

    Default (``staggered=False``): ONE backward pass per step — the loss is
    differentiated once, at the step's start point, jointly wrt the
    expectation parameters (eta1, eta2) of q(u) AND the flat trainable
    vector (whose q entries get exactly-zero gradients because ``_with_eta``
    overrides them); the natural step and the Adam step are then applied
    from those gradients. Measured 1.9x faster per step than the two-pass
    form at the large-scale bench config (BASELINE.md).

    ``staggered=True`` recovers the classic GPflow-loop ordering: natgrad
    first, then a SECOND backward at the post-natgrad q for the hyper
    gradient. With gamma=1 and a conjugate likelihood that second gradient
    is the gradient of the COLLAPSED (Titsias) bound — worth the extra
    backward when taking few, large hyper steps on full batches; for
    minibatch gamma<1 training the linearization points differ by O(gamma)
    and the fused form wins on wall-clock (measured: same-loss-per-step
    within noise at the bench config).

    Returns ``step(vec, opt_state, *args) -> (vec, opt_state, loss)``
    (traceable; callers jit/scan/shard it)."""

    def adam_on_hypers(gvec, opt_state, mdl_new):
        # drop non-finite hyper-gradients (transient Cholesky failures at the
        # feasible-region edge) instead of poisoning Adam's moment state —
        # same policy as optim.fit.fit_adam/fit_adam_scan
        gvec = jnp.where(jnp.isfinite(gvec), gvec, jnp.zeros_like(gvec))
        updates, opt_state = opt.update(gvec, opt_state)
        new_vec, _ = flatten_trainable(mdl_new)
        return optax.apply_updates(new_vec, updates), opt_state

    def step(vec, opt_state, *args):
        mdl = unflatten(vec)
        if staggered:
            mdl2 = _natgrad_update(mdl, loss_fn, gamma, args)
            loss, g = jax.value_and_grad(lambda mm: loss_fn(mm, *args))(mdl2)
            zero_q = jax.tree_util.tree_map(jnp.zeros_like, (g.q_mu, g.q_sqrt))
            g = g.replace(q_mu=zero_q[0], q_sqrt=zero_q[1])
            g = apply_trainable_mask(g, mdl2)
            gvec, _ = flatten_trainable(g)
            new_vec, opt_state = adam_on_hypers(gvec, opt_state, mdl2)
            return new_vec, opt_state, loss

        # fused: one joint backward at (old q, old hypers)
        e1, e2 = _eta_params(mdl)

        def loss_joint(e1_, e2_, v_):
            return loss_fn(_with_eta(unflatten(v_), e1_, e2_), *args)

        loss, (g1, g2, gvec) = jax.value_and_grad(
            loss_joint, argnums=(0, 1, 2))(e1, e2, vec)
        # gvec is d loss/d vec: already the masked trainable-raw gradient
        # (vec holds only trainable raws; _with_eta severs its q entries,
        # so their gradients are exactly zero — same as the staggered zeroing)
        mdl2 = _apply_natural_step(mdl, g1, g2, gamma)
        new_vec, opt_state = adam_on_hypers(gvec, opt_state, mdl2)
        return new_vec, opt_state, loss

    return step


def fit_natgrad_adam(model, loss_fn: Callable, steps: int = 200,
                     gamma: float = 0.1, hyper_lr: float = 1e-2,
                     batch_fn: Optional[Callable] = None,
                     staggered: bool = False) -> FitResult:
    """Alternate natural-gradient steps on the variational parameters with
    Adam steps on every other trainable. ``loss_fn(model)`` (full-batch) or
    ``loss_fn(model, *batch_fn(i))`` (minibatch). ``gamma=1`` with a Gaussian
    likelihood makes each variational step exact. ``staggered=True``
    selects the two-backward-pass ordering (see ``natgrad_adam_step``);
    the reported ``fun`` is the loss at the final step's linearization
    point (pre-update when fused, post-natgrad when staggered)."""
    warn_if_q_diag(model)
    vec0, unflatten = flatten_trainable(model)
    opt = optax.adam(hyper_lr)
    step = jax.jit(natgrad_adam_step(opt, unflatten, loss_fn, gamma,
                                     staggered=staggered))

    opt_state = opt.init(vec0)
    vec = vec0
    loss = jnp.inf
    if batch_fn is None:
        for _ in range(steps):
            vec, opt_state, loss = step(vec, opt_state)
    else:
        for i in range(steps):
            vec, opt_state, loss = step(vec, opt_state, *batch_fn(i))
    return FitResult(model=unflatten(vec), fun=float(loss), num_iters=steps,
                     success=bool(np.isfinite(float(loss))))


def fit_natgrad_scan(model, loss_fn: Callable, steps: int = 200,
                     gamma: float = 0.1, hyper_lr: float = 1e-2,
                     batch_args=None, checkpoint_path=None,
                     checkpoint_every: int = 0, resume: bool = True,
                     staggered: bool = False) -> FitResult:
    """Device-resident form of ``fit_natgrad_adam``: the whole alternating
    natgrad/Adam run is ONE ``lax.scan`` under jit (same update math — same
    stream in, same trajectory out, tested). ``batch_args``: tuple of arrays
    with leading dim ``steps``; step i calls
    ``loss_fn(model, *[a[i] for a in batch_args])``.

    ``checkpoint_path`` + ``checkpoint_every``: same mid-training
    checkpoint/resume semantics as ``fit_adam_scan`` (shared
    ``scan_checkpoint_driver``) — the natgrad state lives entirely in
    (trainable vector, Adam hyper-state), so (vec, opt_state, step) is the
    whole carry and a resumed run replays the identical trajectory."""
    from .fit import scan_checkpoint_driver

    warn_if_q_diag(model)
    vec0, unflatten = flatten_trainable(model)
    opt = optax.adam(hyper_lr)
    step = natgrad_adam_step(opt, unflatten, loss_fn, gamma,
                             staggered=staggered)

    def one_step(carry, xs):
        vec, opt_state = carry
        args = () if xs is None else xs
        vec, opt_state, loss = step(vec, opt_state, *args)
        return (vec, opt_state), loss

    vec, loss, start, ran = scan_checkpoint_driver(
        one_step, opt.init, vec0, steps, batch_args,
        checkpoint_path, checkpoint_every, resume)
    if not ran:
        return FitResult(model=unflatten(vec), fun=float("nan"), num_iters=0,
                         success=True,
                         message=f"checkpoint at step {start} >= steps={steps};"
                                 " nothing to run")
    return FitResult(model=unflatten(vec), fun=float(loss),
                     num_iters=steps - start,
                     success=bool(np.isfinite(float(loss))))
