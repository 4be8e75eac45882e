"""The user-facing ``oak_model`` wrapper — API parity with the reference's
``oak_model`` class (/root/reference/oak/model_utils.py:194-700): same
constructor kwargs, fit / optimise / predict / get_loglik / get_sobol / plot
surface, sklearn-ish numpy-at-the-boundary ergonomics, with the pure-JAX
models underneath.

Beyond the reference:
- classification is first-class (``likelihood='bernoulli'`` builds an SVGP
  with the jittered-logit link) instead of the model-swap hack the reference
  scripts do (uci_classification_train.py:108-124);
- ``predict`` raises a ValueError with a clipping hint instead of printing
  and returning None (model_utils.py:442-443 quirk, see PARITY_NOTES.md);
- optimizers: on-device L-BFGS (default), scipy BFGS (parity mode), Adam,
  or natural-gradient variational steps + Adam on hypers ("natgrad", SVGP).
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .flows import Normalizer
from .kernels import OAKKernel
from .models import GPR, SGPR, SVGP, Bernoulli
from .optim import fit_adam, fit_lbfgs, fit_scipy
from .preprocessing import (
    StandardScaler,
    calculate_features,
    empirical_measure_from_column,
    estimate_one_dim_gmm,
    get_kmeans_centers,
    initialize_kmeans_with_categorical,
)
from . import sobol as sobol_mod


def create_model_oak(
    data,
    max_interaction_depth: int = 2,
    constrain_orthogonal: bool = True,
    inducing_pts: Optional[np.ndarray] = None,
    optimise: bool = False,
    zfixed: bool = True,
    p0=None,
    p=None,
    lengthscale_bounds=None,
    empirical_locations=None,
    empirical_weights=None,
    use_sparsity_prior: bool = True,
    gmm_measures=None,
    share_var_across_orders: bool = True,
):
    """Factory mirroring the reference's ``create_model_oak``
    (model_utils.py:90-176): OAK kernel + GPR (or SGPR when inducing points
    are given), Gamma(1, 0.2) sparsity prior, likelihood variance 0.01."""
    X, Y = data
    X = np.asarray(X, np.float64)
    Y = np.asarray(Y, np.float64)
    num_dims = X.shape[1]
    kernel = OAKKernel.create(
        num_dims=num_dims,
        max_interaction_depth=max_interaction_depth,
        constrain_orthogonal=constrain_orthogonal,
        p0=p0,
        p=p,
        lengthscale_bounds=lengthscale_bounds,
        empirical_locations=empirical_locations,
        empirical_weights=empirical_weights,
        gmm_measures=gmm_measures,
        share_var_across_orders=share_var_across_orders,
        use_sparsity_prior=use_sparsity_prior and share_var_across_orders,
    )
    if inducing_pts is not None:
        model = SGPR.create(X, Y, kernel, inducing_pts, noise_variance=0.01,
                            trainable_Z=not zfixed)
    else:
        model = GPR.create(X, Y, kernel, noise_variance=0.01)
    if optimise:
        model = fit_lbfgs(model, lambda m: m.training_loss()).model
    return model


def apply_normalise_flow(X, input_flows) -> np.ndarray:
    """Apply per-dim flows; dims with no flow pass through
    (reference model_utils.py:179-191)."""
    X = np.array(X, np.float64, copy=True)
    for i, flow in enumerate(input_flows):
        if flow is not None:
            X[:, i] = np.asarray(flow.forward(jnp.asarray(X[:, i])))
    return X


class oak_model:
    def __init__(
        self,
        max_interaction_depth: int = 2,
        num_inducing: int = 200,
        lengthscale_bounds: Optional[Sequence[float]] = (1e-3, 1e3),
        binary_feature: Optional[List[int]] = None,
        categorical_feature: Optional[List[int]] = None,
        empirical_measure: Optional[List[int]] = None,
        use_sparsity_prior: bool = True,
        gmm_measure: Optional[List[int]] = None,
        sparse: bool = False,
        use_normalising_flow: bool = True,
        share_var_across_orders: bool = True,
        likelihood: str = "gaussian",
        optimizer: str = "lbfgs",
    ):
        """Constructor kwargs mirror model_utils.py:195-208; ``likelihood``
        and ``optimizer`` are new-framework extensions."""
        self.max_interaction_depth = max_interaction_depth
        self.num_inducing = num_inducing
        self.lengthscale_bounds = list(lengthscale_bounds) if lengthscale_bounds else None
        self.binary_feature = binary_feature
        self.categorical_feature = categorical_feature
        self.use_sparsity_prior = use_sparsity_prior
        self.empirical_measure = empirical_measure
        self.gmm_measure = gmm_measure
        self.sparse = sparse
        self.use_normalising_flow = use_normalising_flow
        self.share_var_across_orders = share_var_across_orders
        self.likelihood = likelihood
        self.optimizer = optimizer

        # state filled during fit
        self.m = None
        self.input_flows: Optional[List[Optional[Normalizer]]] = None
        self.scaler_y: Optional[StandardScaler] = None
        self.scaler_X_empirical: Optional[StandardScaler] = None
        self.scaler_X_continuous: Optional[StandardScaler] = None
        self.estimated_gmm_measures = None
        self.empirical_locations = None
        self.empirical_weights = None
        self.continuous_index = None
        self.binary_index = None
        self.categorical_index = None
        self.alpha = None
        self.normalised_sobols = None
        self.tuple_of_indices = None
        self.timings = {}

    # ------------------------------------------------------------------ #
    def fit(self, X, Y, optimise: bool = True,
            initialise_inducing_points: bool = True,
            restarts: int = 0) -> "oak_model":
        """``restarts`` is forwarded to :meth:`optimise` — the recommended
        robust mode on f32 hardware is ``fit(X, Y, restarts=4)``: single-start
        L-BFGS trajectories at f32 can converge to a worse stationary point
        (measured grad-norm 5.6e-5, i.e. a genuine local optimum that no
        single-run diagnostic can flag — BASELINE.md "Verify-gate redesign");
        the batched multistart keeps the best healthy basin by training
        loss."""
        t0 = time.time()
        X = np.asarray(X, np.float64)
        Y = np.asarray(Y, np.float64)
        if Y.ndim == 1:
            Y = Y.reshape(-1, 1)
        self.xmin, self.xmax = X.min(0), X.max(0)
        self.num_dims = X.shape[1]

        (self.continuous_index, self.binary_index, self.categorical_index,
         p0, p) = calculate_features(X, self.categorical_feature, self.binary_feature)

        if self.empirical_measure is not None:
            if not set(self.empirical_measure).issubset(self.continuous_index):
                raise ValueError(
                    f"Empirical measure={self.empirical_measure} should only be "
                    f"used on non-binary/categorical inputs {self.continuous_index}"
                )
        if self.gmm_measure is not None:
            if len(self.gmm_measure) != self.num_dims:
                raise ValueError(
                    f"Must specify number of GMM components for each of the "
                    f"{self.num_dims} input dimensions"
                )
            idx_gmm = np.flatnonzero(self.gmm_measure)
            if not set(idx_gmm).issubset(self.continuous_index):
                raise ValueError(
                    f"GMM measure on inputs {idx_gmm} should only be used on "
                    f"continuous inputs {self.continuous_index}"
                )

        # GMM measures per flagged continuous dim (model_utils.py:293-299)
        self.estimated_gmm_measures = [None] * self.num_dims
        if self.gmm_measure is not None:
            for i in np.flatnonzero(self.gmm_measure):
                self.estimated_gmm_measures[i] = estimate_one_dim_gmm(
                    K=int(self.gmm_measure[i]), X=X[:, i]
                )

        # normalising flows per continuous dim (model_utils.py:305-317),
        # all fitted in one on-device L-BFGS run
        self.input_flows = [None] * self.num_dims
        if self.use_normalising_flow:
            flow_dims = [
                i for i in self.continuous_index
                if not (self.empirical_measure is not None and i in self.empirical_measure)
                and self.estimated_gmm_measures[i] is None
            ]
            if flow_dims:
                from .flows import fit_normalizers

                for i, flow in zip(flow_dims, fit_normalizers(X[:, flow_dims])):
                    self.input_flows[i] = flow

        # output scaling + optional input standardization; classification
        # labels stay raw {0, 1} (the reference trains its SVGP on raw labels,
        # uci_classification_train.py:100)
        self.alpha = None
        if self.likelihood == "bernoulli":
            self.scaler_y = StandardScaler()
            self.scaler_y.mean_ = np.zeros(Y.shape[1])
            self.scaler_y.scale_ = np.ones(Y.shape[1])
        else:
            self.scaler_y = StandardScaler().fit(Y)
        self.Y_scaled = self.scaler_y.transform(Y)
        if self.empirical_measure is not None:
            self.scaler_X_empirical = StandardScaler().fit(X[:, self.empirical_measure])
        if not self.use_normalising_flow:
            self.scaler_X_continuous = StandardScaler().fit(X[:, self.continuous_index])
        self.X_scaled = self._transform_x(X)

        # empirical measure locations/weights on the scaled inputs
        self.empirical_locations = [None] * self.num_dims
        self.empirical_weights = [None] * self.num_dims
        if self.empirical_measure is not None:
            for i in self.empirical_measure:
                loc, w = empirical_measure_from_column(self.X_scaled[:, i])
                self.empirical_locations[i] = loc
                self.empirical_weights[i] = w

        # flows must not have touched discrete / fixed-measure dims
        assert np.allclose(self.X_scaled[:, self.binary_index],
                           X[:, self.binary_index]), "Flow applied to binary inputs"
        assert np.allclose(self.X_scaled[:, self.categorical_index],
                           X[:, self.categorical_index]), "Flow applied to categorical inputs"

        # inducing points (model_utils.py:372-393)
        Z = None
        if X.shape[0] > 1000 or self.sparse or self.likelihood == "bernoulli":
            if initialise_inducing_points:
                if (p0 is None) and (p is None):
                    Z = get_kmeans_centers(self.X_scaled, min(self.num_inducing,
                                                              X.shape[0]))
                else:
                    Z = initialize_kmeans_with_categorical(
                        self.X_scaled,
                        binary_index=self.binary_index,
                        categorical_index=self.categorical_index,
                        continuous_index=self.continuous_index,
                        n_clusters=min(self.num_inducing, X.shape[0]),
                    )
            else:
                Z = self.X_scaled[: self.num_inducing, :]

        kernel = OAKKernel.create(
            num_dims=self.num_dims,
            max_interaction_depth=self.max_interaction_depth,
            p0=p0,
            p=p,
            lengthscale_bounds=self.lengthscale_bounds,
            empirical_locations=self.empirical_locations,
            empirical_weights=self.empirical_weights,
            gmm_measures=self.estimated_gmm_measures,
            share_var_across_orders=self.share_var_across_orders,
            use_sparsity_prior=self.use_sparsity_prior and self.share_var_across_orders,
        )

        if self.likelihood == "bernoulli":
            # first-class classification path (reference: SVGP swap at
            # uci_classification_train.py:108-124)
            if Z is None:
                Z = self.X_scaled
            # q_diag=True matches the reference's mean-field default EXCEPT
            # under natgrad: diag-family natural-gradient steps diverge at
            # scale (optim/natgrad.py STABILITY note; GPflow's
            # NaturalGradient refuses q_diag models), so a natgrad-
            # constructed model gets the full-covariance q it needs
            self.m = SVGP.create(kernel, Bernoulli.create("logit"), Z,
                                 q_diag=(self.optimizer != "natgrad"),
                                 whiten=True,
                                 num_data=self.X_scaled.shape[0])
            self._train_data = (self.X_scaled, self.Y_scaled)
        elif Z is not None:
            self.m = SGPR.create(self.X_scaled, self.Y_scaled, kernel, Z,
                                 noise_variance=0.01)
        else:
            self.m = GPR.create(self.X_scaled, self.Y_scaled, kernel,
                                noise_variance=0.01)

        self.timings["fit_setup"] = time.time() - t0
        if optimise:
            self.optimise(restarts=restarts)
        return self

    # ------------------------------------------------------------------ #
    def _loss_fn(self):
        if isinstance(self.m, SVGP):
            X, Y = self._train_data
            Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
            return lambda m: m.training_loss(Xj, Yj)
        return lambda m: m.training_loss()

    def optimise(self, max_iters: int = 1000, compile: bool = True,
                 restarts: int = 0, mesh=None, data_mesh=None,
                 checkpoint_path=None, checkpoint_every: int = 100,
                 verbose: bool = False):
        """``compile`` mirrors the reference's Scipy(..., compile=) tf.function
        toggle (model_utils.py:419-425): with optimizer='scipy' it switches
        between jitted and eager objective evaluation. The on-device
        optimizers (lbfgs/adam) are always compiled — jit IS their execution
        model.

        ``restarts > 0`` runs that many jittered initializations *in
        parallel* as one batched program — vmapped L-BFGS / batched Adam
        lanes / vmapped natgrad+Adam per the chosen optimizer
        (optim/multistart.py) — and keeps the best non-degenerate fit;
        ``mesh`` shards the restarts axis over a device mesh. With
        ``restarts=0`` the parallel multistart still kicks in as a fallback
        when the single fit lands in the all-noise optimum.

        ``checkpoint_path``: mid-training checkpoint/resume for the
        on-device optimizers (lbfgs incl. multistart, adam, natgrad) —
        training state is persisted every ``checkpoint_every``
        iterations/steps and a killed run resumes to the same trajectory.
        Not supported with optimizer='scipy' (its optimizer state lives in
        scipy). The reference has no training-state persistence
        (model_utils.py:44-64 saves final hyperparameters only).

        ``data_mesh``: shard THE DATA AXIS of one full-batch L-BFGS fit over
        a device mesh (parallel.fit_lbfgs_sharded) — params replicated,
        every loss/grad's [*, N] grams and data sums computed shard-local
        with XLA-inserted psums. For fits too large for one chip; distinct
        from ``mesh`` (which shards the RESTARTS axis of a multistart).
        Combined with ``restarts > 0``, ``data_mesh`` must be a 2-D mesh
        with ('restart', 'data')-style axes: the restarts shard over one
        axis and each fit's data over the other
        (parallel.fit_lbfgs_multistart_sharded).

        ``verbose=True`` prints the parameter summary table before and
        after training, like the reference's gpflow print_summary calls
        around its Scipy minimize (model_utils.py:415-427); default off so
        programmatic use stays quiet."""
        if verbose:
            print("Model prior to optimisation")
            print(self.summary())
        t0 = time.time()
        self.alpha = None
        loss = self._loss_fn()
        if data_mesh is not None:
            if self.optimizer != "lbfgs":
                raise ValueError("data_mesh requires optimizer='lbfgs' "
                                 "(use optimise_minibatch(mesh=) for "
                                 "data-parallel adam/natgrad)")
            if checkpoint_path is not None:
                raise ValueError("data_mesh does not support "
                                 "checkpoint_path= (use the single-device "
                                 "or mesh= multistart paths for resumable "
                                 "fits)")
            if restarts > 0 and ("data" not in data_mesh.shape
                                 or len(data_mesh.shape) != 2):
                raise ValueError(
                    "restarts with data_mesh need a 2-D mesh with a 'data' "
                    "axis plus a restarts axis, e.g. Mesh(devices.reshape"
                    "(K, N//K), ('restart', 'data')) — the restarts shard "
                    "over one axis and each fit's data over the other "
                    f"(got axes {list(data_mesh.shape.keys())})")
        if restarts > 0 and self.optimizer == "scipy":
            # silently running a single start while the caller believes K
            # restarts ran would misattribute the result
            raise ValueError("restarts > 0 requires an on-device optimizer "
                             "(lbfgs/adam/natgrad); optimizer='scipy' is a "
                             "host loop and cannot run batched lanes")
        if checkpoint_path is not None and self.optimizer == "scipy":
            raise ValueError("checkpoint_path is not supported with "
                             "optimizer='scipy' (scipy owns the BFGS state)")
        if self.optimizer == "scipy":
            res = fit_scipy(self.m, loss, method="BFGS", max_iters=max_iters,
                            jit=compile)
        elif self.optimizer == "adam":
            if restarts > 0:
                from .optim import fit_adam_multistart

                res = fit_adam_multistart(
                    self.m, loss, n_starts=restarts, jitter=0.3, seed=0,
                    steps=max_iters, include_init=True, mesh=mesh,
                    accept_fn=lambda m: not (self._degenerate_noise_fit(m)
                                             or self._pathological_fit(m)))
            elif checkpoint_path is not None:
                res = fit_adam_scan(self.m, loss, steps=max_iters,
                                    checkpoint_path=checkpoint_path,
                                    checkpoint_every=checkpoint_every)
            else:
                res = fit_adam(self.m, loss, steps=max_iters)
        elif self.optimizer == "natgrad":
            # natural-gradient steps on q(u) alternated with Adam on the
            # hyperparameters (SVGP only); exact variational step for
            # Gaussian likelihoods, gentle step for non-conjugate ones
            if not isinstance(self.m, SVGP):
                raise ValueError("optimizer='natgrad' requires an SVGP model "
                                 "(likelihood='bernoulli' or sparse SVGP)")
            gamma = 1.0 if not isinstance(self.m.likelihood, Bernoulli) else 0.2
            if restarts > 0:
                from .optim import fit_natgrad_multistart

                res = fit_natgrad_multistart(
                    self.m, loss, n_starts=restarts, jitter=0.3, seed=0,
                    steps=max_iters, gamma=gamma, include_init=True,
                    mesh=mesh,
                    accept_fn=lambda m: not (self._degenerate_noise_fit(m)
                                             or self._pathological_fit(m)))
            elif checkpoint_path is not None:
                from .optim import fit_natgrad_scan

                res = fit_natgrad_scan(self.m, loss, steps=max_iters,
                                       gamma=gamma,
                                       checkpoint_path=checkpoint_path,
                                       checkpoint_every=checkpoint_every)
            else:
                from .optim import fit_natgrad_adam

                res = fit_natgrad_adam(self.m, loss, steps=max_iters,
                                       gamma=gamma)
        else:
            from .optim import fit_lbfgs_multistart

            init = self.m
            is_svgp = isinstance(self.m, SVGP)
            # Adam warmup moves the params off the cold start where the
            # zoom linesearch can stall in f32, then L-BFGS refines; gentle
            # lr — 5e-2 overshoots into Cholesky-failure territory on f32.
            # SVGP always needs it (q off the cold start); for GPR/SGPR the
            # explicit-restarts path ALSO warms every lane — the degenerate-
            # fit retry below always has (warm_adam_steps=300, the recipe
            # measured to escape the all-noise trap on the autoMPG folds),
            # and a cold 4-lane multistart on the depth-8 pumadyn SGPR
            # landed ALL lanes in the trap while the old single-start+warm-
            # retry path escaped (round-5 regeneration).
            warm_steps = 300 if (is_svgp or restarts > 0) else 0
            def bad_fit(m, fun=0.0) -> bool:
                return (self._degenerate_noise_fit(m)
                        or self._pathological_fit(m, fun))

            if restarts > 0 and data_mesh is not None:
                # 2-D composition: restarts sharded over one mesh axis,
                # each fit's data axis over the other
                from .parallel import fit_lbfgs_multistart_sharded

                if is_svgp:
                    Xj, Yj = map(jnp.asarray, self._train_data)
                else:
                    Xj = Yj = None
                res = fit_lbfgs_multistart_sharded(
                    init, data_mesh, X=Xj, Y=Yj, n_starts=restarts,
                    jitter=0.3, seed=0, max_iters=max_iters,
                    warm_adam_steps=warm_steps, include_init=True,
                    accept_fn=lambda m: not bad_fit(m))
            elif restarts > 0:
                res = fit_lbfgs_multistart(
                    init, loss, n_starts=restarts, jitter=0.3, seed=0,
                    max_iters=max_iters, warm_adam_steps=warm_steps,
                    include_init=True, mesh=mesh,
                    checkpoint_path=checkpoint_path,
                    accept_fn=lambda m: not bad_fit(m))
            elif data_mesh is not None:
                from .parallel import (data_parallel_elbo_step,
                                       fit_lbfgs_sharded, shard_batch)

                if is_svgp:
                    Xj, Yj = map(jnp.asarray, self._train_data)
                    if warm_steps:
                        # the same Adam warmup as the single-device path,
                        # run data-parallel (full batch sharded each step —
                        # identical trajectory up to reduction order)
                        step, (vec, opt_state, unflatten) = \
                            data_parallel_elbo_step(self.m, data_mesh,
                                                    learning_rate=2e-2)
                        Xs, Ys = shard_batch(data_mesh, Xj, Yj)
                        import jax as _jax
                        for _ in range(warm_steps):
                            vec, opt_state, _w = step(vec, opt_state, Xs, Ys)
                        self.m = unflatten(jnp.asarray(_jax.device_get(vec)))
                    res = fit_lbfgs_sharded(self.m, data_mesh, X=Xj, Y=Yj,
                                            max_iters=max_iters)
                else:
                    res = fit_lbfgs_sharded(self.m, data_mesh,
                                            max_iters=max_iters)
            else:
                if is_svgp:
                    self.m = fit_adam(self.m, loss, steps=warm_steps,
                                      lr=2e-2).model
                res = fit_lbfgs(self.m, loss, max_iters=max_iters,
                                checkpoint_path=checkpoint_path,
                                checkpoint_every=checkpoint_every)
                if bad_fit(res.model, res.fun):
                    # Two known f32 traps (f64 escapes both from the same
                    # init): (a) the Gamma(1, 0.2) sparsity prior makes the
                    # all-noise stationary point an attractor of cold-started
                    # L-BFGS (measured on the autoMPG folds: trap loss +457
                    # vs good-basin -206); (b) at high interaction depth the
                    # linesearch can run into interpolation collapse —
                    # likelihood variance at the f32 floor with exploded
                    # kernel variances, NaN params, or a non-finite loss
                    # (seen on the housing folds, D=13 depth 13). Jittered
                    # restarts reliably find a good basin; run them as ONE
                    # batched vmapped L-BFGS and keep the best healthy fit
                    # by loss (= log marginal incl. priors), falling back to
                    # the original if none improves.
                    # warm_adam_steps=300 for BOTH lanes mirrors the round-2
                    # sequential fallback's seed-0 (warm) lane, the recipe
                    # measured to escape on the autoMPG folds; the full-depth
                    # example runs were re-validated with this batched form
                    # the retry writes its OWN checkpoint file (the primary
                    # path's state is a different program's carry)
                    retry = fit_lbfgs_multistart(
                        init, loss, n_starts=2, jitter=0.3, seed=0,
                        max_iters=max_iters, warm_adam_steps=300,
                        include_init=False, mesh=mesh,
                        checkpoint_path=(f"{checkpoint_path}.retry"
                                         if checkpoint_path else None),
                        accept_fn=lambda m: not bad_fit(m))
                    # np.isfinite guard: an all-lanes-diverged multistart
                    # returns the UNTRAINED init with fun=inf — installing it
                    # would discard the trained (albeit degenerate) fit
                    if np.isfinite(retry.fun) and (
                            retry.fun < res.fun
                            or (bad_fit(res.model, res.fun)
                                and not bad_fit(retry.model, retry.fun))):
                        res = retry
        self.m = res.model
        self.timings["optimise"] = time.time() - t0
        if verbose:
            print(self.summary())
            print(f"Training took {self.timings['optimise']:.1f} seconds.")
        return res

    def summary(self) -> str:
        """Parameter table of the underlying model — the
        gpflow.utilities.print_summary equivalent the reference shows
        around optimisation (model_utils.py:174,416,426): name, transform,
        prior, trainable, shape, dtype, constrained value per Param."""
        from .utils.summary import summary_string

        return summary_string(self.m)

    @staticmethod
    def _pathological_fit(model, fun: float = 0.0) -> bool:
        """True when a trained model is numerically broken rather than merely
        degenerate: non-finite loss, non-finite parameters, or f32
        interpolation collapse (likelihood variance driven to the numerical
        floor while kernel variances explode — the posterior weights
        alpha = K^-1 y then overflow f32 and every downstream Sobol/predict
        quantity is garbage; observed on the housing folds at D=13
        depth 13)."""
        from .params import flatten_trainable

        if not np.isfinite(fun):
            return True
        vec, _ = flatten_trainable(model)
        if not np.isfinite(np.asarray(vec)).all():
            return True
        if hasattr(model.likelihood, "variance"):
            import jax

            lik, total = jax.device_get(
                (model.likelihood.variance.value,
                 sum(v.value for v in model.kernel.variances)))
            if float(lik) < 1e-7 and float(total) > 1e4:
                return True
        return False

    @staticmethod
    def _degenerate_noise_fit(model) -> bool:
        """True when every additive component's variance has collapsed to ~0.
        The targets are standardized (Var(y) = 1), so a healthy fit must put
        O(1) variance SOMEWHERE; with the kernel at zero the model either
        sits in the all-noise optimum (likelihood variance ~Var(y) — the
        Gamma-prior trap measured on the autoMPG folds) or, worse, in the
        all-collapsed state (likelihood variance stuck at its floor too,
        training loss astronomically positive — seen on housing fold 0 at
        D=13 depth 13, lengthscales saturated at both bounds). Both warrant
        the jittered-restart fallback; for an SVGP-Bernoulli classifier the
        latent is constant and it predicts p=0.5 everywhere."""
        if not model.kernel.share_var_across_orders:
            return False
        import jax

        leaves = [v.value for v in model.kernel.variances[1:]]
        vs = jax.device_get(leaves)
        total = float(np.sum([np.asarray(v) for v in vs]))
        return total < 1e-4

    def optimise_minibatch(self, batch_size: int = 256, steps: int = 2000,
                           lr: float = 1e-2, seed: int = 0, mesh=None,
                           checkpoint_path=None, checkpoint_every: int = 0,
                           optimizer: Optional[str] = None, gamma: float = 0.1):
        """Minibatched Adam on the SVGP ELBO (the scalable alternative to
        full-batch L-BFGS; only valid for SVGP models, whose bound is a sum
        over datapoints).

        ``mesh``: a ``jax.sharding.Mesh`` for data-parallel training — each
        minibatch is sharded over the mesh's data axis with parameters and
        optimizer state replicated; XLA inserts the gradient all-reduce over
        ICI (parallel/sharding.py). The batch stream is identical to the
        single-device path for the same seed, so trajectories match up to
        floating-point reduction order (tested in tests/test_sharding.py).

        ``checkpoint_path`` + ``checkpoint_every``: mid-training
        checkpoint/resume (Adam and natgrad, single-device and mesh) —
        training state (trainable vector, optimizer state, step) is written
        every ``checkpoint_every`` steps and, if the file exists, training
        resumes from it toward the same ``steps`` total on the identical
        batch stream.

        ``optimizer``: None (default) inherits the model-level optimizer when
        it is minibatch-capable ('adam'/'natgrad'), else Adam.
        ``optimizer="natgrad"``: minibatch natural-gradient steps on q(u)
        alternated with Adam(lr) on the hyperparameters — the standard
        large-scale SVGP recipe (device-resident scan single-device;
        ``data_parallel_natgrad_step`` on a mesh). ``gamma`` is the natgrad
        step size; the 0.1 default is the stable minibatch choice (a unit
        step is exact only FULL-batch with a Gaussian likelihood and a full-
        covariance q — on minibatches it jumps q(u) to each batch's optimum
        and diverges). Natgrad needs q_diag=False (optim/natgrad.py
        STABILITY note); a q_diag model gets a warning.
        """
        if not isinstance(self.m, SVGP):
            raise ValueError("minibatch training requires likelihood='bernoulli' "
                             "or an SVGP model")
        if optimizer is None:
            # inherit the construct-time knob when it names a minibatch-capable
            # optimizer (oak_model(optimizer='natgrad') + optimise_minibatch()
            # must not silently train with Adam); lbfgs/scipy are full-batch
            # optimizers, so they fall back to Adam here
            optimizer = self.optimizer if self.optimizer in ("adam", "natgrad") else "adam"
        if optimizer not in ("adam", "natgrad"):
            raise ValueError(f"optimizer must be 'adam' or 'natgrad', got {optimizer!r}")
        X, Y = self._train_data
        n = X.shape[0]
        rng = np.random.default_rng(seed)
        batch_size = min(batch_size, n)
        if mesh is not None:
            n_dev = int(np.prod(list(mesh.shape.values())))
            if batch_size % n_dev:
                raise ValueError(f"batch_size={batch_size} must be divisible "
                                 f"by the mesh size {n_dev}")
        idx_stream = [rng.choice(n, batch_size, replace=False)
                      for _ in range(steps)]

        t0 = time.time()
        if mesh is not None:
            import os as _os

            from .optim.fit import (FitResult, load_train_state,
                                    save_train_state)
            from .parallel import data_parallel_elbo_step, replicate, shard_batch

            Xh, Yh = np.asarray(X), np.asarray(Y)
            if optimizer == "natgrad":
                from .parallel import data_parallel_natgrad_step

                step, (vec, opt_state, unflatten) = data_parallel_natgrad_step(
                    self.m, mesh, gamma=gamma, hyper_lr=lr)
            else:
                step, (vec, opt_state, unflatten) = data_parallel_elbo_step(
                    self.m, mesh, learning_rate=lr)
            import jax

            start = 0
            if (checkpoint_path is not None
                    and _os.path.exists(checkpoint_path)):
                v_h, opt_h, start = load_train_state(
                    checkpoint_path, jax.device_get(opt_state))
                vec = replicate(mesh, jnp.asarray(v_h))
                opt_state = replicate(
                    mesh, jax.tree_util.tree_map(jnp.asarray, opt_h))
            loss = np.inf
            for i in range(start, steps):
                Xb, Yb = shard_batch(mesh, Xh[idx_stream[i]], Yh[idx_stream[i]])
                vec, opt_state, loss = step(vec, opt_state, Xb, Yb)
                if (checkpoint_path is not None and checkpoint_every > 0
                        and (i + 1) % checkpoint_every == 0):
                    save_train_state(checkpoint_path, jax.device_get(vec),
                                     jax.device_get(opt_state), i + 1)
            if checkpoint_path is not None and start < steps:
                save_train_state(checkpoint_path, jax.device_get(vec),
                                 jax.device_get(opt_state), steps)
            # pull the trained vector off the mesh before unflattening:
            # eager ops on mesh-committed arrays compile all-device
            # programs whose collectives can deadlock a starved host
            # platform (and on real hardware would pointlessly re-shard)
            import jax

            vec = jnp.asarray(jax.device_get(vec))
            ran = start < steps
            final = float(loss) if ran else float("nan")
            res = FitResult(model=unflatten(vec), fun=final,
                            num_iters=steps - start,
                            success=bool(np.isfinite(final)) if ran else True)
        else:
            from .optim.fit import fit_adam_scan

            # device-resident loop: the whole run is one lax.scan over the
            # stacked minibatch-index stream — a single dispatch instead of
            # one host round-trip per step; same stream -> same trajectory
            # as the mesh path and the old per-step loop
            Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
            idx = jnp.asarray(np.stack(idx_stream))

            def loss_fn(m, ib):
                return m.training_loss(Xj[ib], Yj[ib])

            if optimizer == "natgrad":
                from .optim.natgrad import fit_natgrad_scan

                res = fit_natgrad_scan(self.m, loss_fn, steps=steps,
                                       gamma=gamma, hyper_lr=lr,
                                       batch_args=(idx,),
                                       checkpoint_path=checkpoint_path,
                                       checkpoint_every=checkpoint_every)
            else:
                res = fit_adam_scan(self.m, loss_fn, steps=steps, lr=lr,
                                    batch_args=(idx,),
                                    checkpoint_path=checkpoint_path,
                                    checkpoint_every=checkpoint_every)
        self.m = res.model
        self.timings["optimise_minibatch"] = time.time() - t0
        return res

    def export_predict(self, include_var: bool = False):
        """A standalone jitted predict function over raw (unscaled) inputs —
        the serving export: closes over transforms + model, compiles once.

        ``include_var=True`` returns ``(mean, std)`` in the original target
        units (Gaussian: latent std times the y-scale, plus nothing for the
        likelihood — it is the *function's* credible band, matching the
        plots); Bernoulli: ``(prob, std)`` where prob is the Gauss-Hermite
        posterior-predictive probability and std the Bernoulli outcome's
        sqrt(p(1-p)).

        NOTE (Bernoulli): the two exports deliberately mirror the two live
        APIs, which differ — ``include_var=False`` serves the plug-in
        ``invlink(E[f])`` exactly like ``oak_model.predict`` (the reference's
        classification-script convention, uci_classification_train.py:128),
        while ``include_var=True`` serves the posterior-predictive
        ``E[invlink(f)]`` exactly like ``oak_model.predict_proba``. With
        nonzero latent variance these probabilities differ (the predictive
        mean shrinks toward 0.5); pick the artifact matching the live API
        your consumers compare against."""
        import jax

        flows = list(self.input_flows)
        m = self.m
        xmin = jnp.asarray(self.xmin)
        xmax = jnp.asarray(self.xmax)
        y_mean = jnp.asarray(self.scaler_y.mean_)
        y_scale = jnp.asarray(self.scaler_y.scale_)
        emp = self.empirical_measure
        emp_mean = (jnp.asarray(self.scaler_X_empirical.mean_)
                    if self.scaler_X_empirical is not None else None)
        emp_scale = (jnp.asarray(self.scaler_X_empirical.scale_)
                     if self.scaler_X_empirical is not None else None)
        cont = list(self.continuous_index)
        cont_mean = (jnp.asarray(self.scaler_X_continuous.mean_)
                     if self.scaler_X_continuous is not None else None)
        cont_scale = (jnp.asarray(self.scaler_X_continuous.scale_)
                      if self.scaler_X_continuous is not None else None)
        is_bernoulli = isinstance(m, SVGP) and isinstance(m.likelihood, Bernoulli)

        @jax.jit
        def predict(X):
            X = jnp.clip(jnp.asarray(X), xmin, xmax)
            cols = []
            for i in range(X.shape[1]):
                c = X[:, i]
                if flows[i] is not None:
                    c = flows[i].forward(c)
                cols.append(c)
            Xs = jnp.stack(cols, axis=1)
            if emp is not None:
                scaled = (Xs[:, jnp.asarray(emp)] - emp_mean) / emp_scale
                Xs = Xs.at[:, jnp.asarray(emp)].set(scaled)
            if cont_mean is not None:
                scaled = (Xs[:, jnp.asarray(cont)] - cont_mean) / cont_scale
                Xs = Xs.at[:, jnp.asarray(cont)].set(scaled)
            mu, var = m.predict_f(Xs)
            if is_bernoulli:
                if include_var:
                    p, pvar = m.likelihood.predict_mean_and_var(mu, var)
                    return p[:, 0], jnp.sqrt(jnp.maximum(pvar, 0.0))[:, 0]
                return m.likelihood.invlink(mu)[:, 0]
            if include_var:
                return ((mu * y_scale + y_mean)[:, 0],
                        (jnp.sqrt(jnp.maximum(var, 0.0)) * y_scale)[:, 0])
            return (mu * y_scale + y_mean)[:, 0]

        return predict

    # ------------------------------------------------------------------ #
    def _scale_y_inverse(self, y):
        return self.scaler_y.inverse_transform(np.asarray(y))

    def predict(self, X, clip: bool = False) -> np.ndarray:
        X_scaled = self._transform_x(
            np.clip(X, self.xmin, self.xmax) if clip else np.asarray(X, np.float64)
        )
        if not np.isfinite(X_scaled).all():
            raise ValueError(
                "test X is outside the range of the training input; "
                "call predict(X, clip=True) to clip into range"
            )
        mu, _ = self.m.predict_f(X_scaled)
        if isinstance(self.m, SVGP) and isinstance(self.m.likelihood, Bernoulli):
            return np.asarray(self.m.likelihood.invlink(mu))[:, 0]
        return self._scale_y_inverse(mu)[:, 0]

    def predict_f_samples(self, X, num_samples: int = 1, seed=0,
                          clip: bool = False) -> np.ndarray:
        """Joint posterior function draws at raw-unit inputs X, returned in
        the ORIGINAL target units: [num_samples, N] (regression; y-scaler
        inverted) or posterior probability draws invlink(f) (Bernoulli).
        Capability extension — the reference exposes no sampling API."""
        X_scaled = self._transform_x(
            np.clip(X, self.xmin, self.xmax) if clip else np.asarray(X, np.float64)
        )
        draws = np.asarray(self.m.predict_f_samples(
            jnp.asarray(X_scaled), num_samples=num_samples, seed=seed))[:, :, 0]
        if isinstance(self.m, SVGP) and isinstance(self.m.likelihood, Bernoulli):
            return np.asarray(self.m.likelihood.invlink(jnp.asarray(draws)))
        return (draws * self.scaler_y.scale_[0] + self.scaler_y.mean_[0])

    def predict_proba(self, X, clip: bool = False) -> np.ndarray:
        assert self.likelihood == "bernoulli"
        X_scaled = self._transform_x(
            np.clip(X, self.xmin, self.xmax) if clip else np.asarray(X, np.float64)
        )
        mu, var = self.m.predict_f(X_scaled)
        p, _ = self.m.likelihood.predict_mean_and_var(mu, var)
        return np.asarray(p)[:, 0]

    def get_loglik(self, X, y, clip: bool = False) -> float:
        X_scaled = self._transform_x(
            np.clip(X, self.xmin, self.xmax) if clip else np.asarray(X, np.float64)
        )
        y = np.asarray(y, np.float64)
        if y.ndim == 1:
            y = y.reshape(-1, 1)
        if self.likelihood == "bernoulli":
            ld = self.m.predict_log_density(X_scaled, y)
            return float(np.mean(np.asarray(ld)))
        y_scaled = self.scaler_y.transform(y)
        ld = self.m.predict_log_density(X_scaled, y_scaled)
        # density of the *scaled* target, as the reference computes it
        # (model_utils.py:445-460)
        return float(np.mean(np.asarray(ld)))

    # ------------------------------------------------------------------ #
    def _transform_x(self, X) -> np.ndarray:
        X = np.array(X, np.float64, copy=True)
        for i in range(X.shape[1]):
            flow = self.input_flows[i]
            if flow is not None:
                X[:, i] = np.asarray(flow.forward(jnp.asarray(X[:, i])))
        if self.empirical_measure is not None:
            X[:, self.empirical_measure] = self.scaler_X_empirical.transform(
                X[:, self.empirical_measure]
            )
        if not self.use_normalising_flow:
            X[:, self.continuous_index] = self.scaler_X_continuous.transform(
                X[:, self.continuous_index]
            )
        return X

    def _get_x_inverse_transformer(self, i: int):
        assert i in self.continuous_index
        if self.empirical_measure is not None and i in self.empirical_measure:
            j = self.empirical_measure.index(i)
            mean_i = self.scaler_X_empirical.mean_[j]
            std_i = self.scaler_X_empirical.scale_[j]
            return lambda x: np.asarray(x) * std_i + mean_i
        if self.gmm_measure is not None and self.estimated_gmm_measures[i] is not None:
            return None
        if self.input_flows[i] is not None:
            flow = self.input_flows[i]
            return lambda x: np.asarray(flow.inverse(jnp.asarray(np.asarray(x))))
        if self.scaler_X_continuous is not None:
            j = self.continuous_index.index(i)
            mean_i = self.scaler_X_continuous.mean_[j]
            std_i = self.scaler_X_continuous.scale_[j]
            return lambda x: np.asarray(x) * std_i + mean_i
        return None

    # ------------------------------------------------------------------ #
    def get_sobol(self, likelihood_variance: bool = False,
                  mesh=None) -> np.ndarray:
        """Normalized Sobol index per component (model_utils.py:499-524).
        ``mesh``: optional device mesh sharding the O(N^2) Sobol
        intermediates (sobol.compute_sobol_oak) — for models whose [D, N, N]
        L stack exceeds one chip's HBM."""
        tuples, sobols = sobol_mod.compute_sobol_oak(self.m, mesh=mesh)
        lik_var = None
        if likelihood_variance and not isinstance(self.m, SVGP):
            lik_var = float(self.m.likelihood.variance.value)
        self.normalised_sobols = sobol_mod.normalize_sobol(sobols, lik_var)
        self.tuple_of_indices = tuples
        return self.normalised_sobols

    def get_sobol_by_order(self) -> np.ndarray:
        """Normalized Sobol mass aggregated per interaction order."""
        self.get_sobol()
        out = np.zeros(self.max_interaction_depth)
        for t, v in zip(self.tuple_of_indices, self.normalised_sobols):
            out[len(t) - 1] += v
        return out

    def get_prediction_components(self, X=None, clip: bool = False) -> np.ndarray:
        if X is not None:
            X = self._transform_x(
                np.clip(X, self.xmin, self.xmax) if clip else np.asarray(X, np.float64)
            )
        else:
            X = self.X_scaled
        return sobol_mod.get_prediction_component(self.m, X=X)

    # ------------------------------------------------------------------ #
    def plot(self, *args, **kwargs):
        from . import plotting

        return plotting.plot_model(self, *args, **kwargs)

    def save(self, path):
        from .checkpoint import save_oak_model

        save_oak_model(self, path)

    @classmethod
    def load(cls, path) -> "oak_model":
        from .checkpoint import load_oak_model

        return load_oak_model(path)
