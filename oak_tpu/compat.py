"""Reference-named compatibility surface.

Every public function of the reference package is available under its exact
reference name and signature here, for drop-in use by code written against
amzn/orthogonal-additive-gaussian-processes. The canonical oak_tpu APIs
(sobol.py, checkpoint.py, params.py, flows.py) remain the primary surface —
these are thin faithful wrappers, including the reference's quirks where
behavior-compatibility demands it (noted per function).

Reference sources: /root/reference/oak/utils.py, model_utils.py,
normalising_flow.py, oak_kernel.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import sobol as _sobol
from .checkpoint import load_reference_npz, reference_param_order
from .kernels import OrthogonalBinary, OrthogonalCategorical
from .params import bounded as _bounded


# --------------------------------------------------------------------------- #
# utils.py names
# --------------------------------------------------------------------------- #
def compute_L(X, lengthscale, variance, dim, delta, mu) -> np.ndarray:
    """Reference utils.py:221-240: Gaussian-measure L matrix for column
    ``dim`` of X (f1 - f2 - f3 + f4)."""
    x = jnp.asarray(np.asarray(X)[:, dim])
    return np.asarray(_sobol.compute_L_gaussian(x, lengthscale, variance,
                                                delta, mu))


def compute_L_binary_kernel(X, p0, variance, dim) -> np.ndarray:
    """Reference utils.py:243-272 — NOTE: faithful to the reference, this
    scales by variance to the FIRST power, unlike every other branch (v^2);
    the canonical sobol.compute_L_binary fixes the inconsistency."""
    assert 0 <= p0 <= 1
    k = OrthogonalBinary.create(p0=p0, variance=1.0)
    x = jnp.asarray(np.asarray(X)[:, dim])
    return float(variance) * np.asarray(_sobol.compute_L_binary(k, x))


def compute_L_categorical_kernel(X, W, kappa, p, variance, dim) -> np.ndarray:
    """Reference utils.py:275-309."""
    k = OrthogonalCategorical.create(p=np.asarray(p).reshape(-1),
                                     variance=variance)
    k = k.replace(W=k.W.assign(jnp.asarray(np.asarray(W))),
                  kappa=k.kappa.assign(jnp.asarray(np.asarray(kappa))))
    x = jnp.asarray(np.asarray(X)[:, dim])
    return np.asarray(_sobol.compute_L_categorical(k, x))


def compute_L_empirical_measure(x, w, kernel, z) -> np.ndarray:
    """Reference utils.py:312-335: L = (w ∘ Kxu^T) Kxu over the empirical
    locations ``x`` with weights ``w``, evaluated at data/inducing ``z``."""
    from .kernels import ortho_rbf

    loc = jnp.asarray(np.asarray(x)).reshape(-1)
    wt = jnp.asarray(np.asarray(w)).reshape(-1)
    kxu = ortho_rbf.K(kernel, loc, jnp.asarray(np.asarray(z)).reshape(-1))
    return np.asarray((wt[:, None] * kxu).T @ kxu)


def get_model_sufficient_statistics(m, get_L: bool = True):
    """Reference utils.py:168-218: posterior weights alpha (and the Cholesky
    factor L with L L^T = Qinv^{-1}, i.e. chol(K + sigma^2 I) for GPR and the
    equivalent for SGPR/SVGP posteriors)."""
    alpha, Qinv = m.posterior_stats()
    if not get_L:
        return alpha
    Qinv = np.asarray(Qinv)
    L = np.linalg.cholesky(np.linalg.inv(Qinv))
    return alpha, L


# --------------------------------------------------------------------------- #
# model_utils.py names
# --------------------------------------------------------------------------- #
def save_model(model, filename) -> None:
    """Write a checkpoint in the REFERENCE's positional layout
    (model_utils.py:44-64: np.savez(filename, hyperparams=[...constrained
    values...]), with the SVGP save-all-parameters special case) so artifacts
    produced here can be loaded by the reference implementation, and vice
    versa via ``load_model``/``checkpoint.load_reference_npz``."""
    import os

    slots = reference_param_order(model)

    def get(slot):
        if slot.startswith("kernels["):
            i = int(slot[len("kernels["):slot.index("]")])
            field = slot.split(".")[1]
            return np.asarray(getattr(model.kernel.kernels[i], field).value)
        if slot.startswith("variances["):
            j = int(slot[len("variances["):-1])
            return np.asarray(model.kernel.variances[j].value)
        if slot == "likelihood.variance":
            return np.asarray(model.likelihood.variance.value)
        return np.asarray(getattr(model, slot).value)

    vals = [get(s) for s in slots]
    d = os.path.dirname(str(filename))
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez(filename, hyperparams=np.asarray(vals, dtype=object))


def load_model(model, filename, load_all_parameters: bool = False):
    """Reference model_utils.py:67-87 semantics over immutable pytrees: the
    reference assigns in place and returns None; here the loaded model is
    RETURNED (pure-functional models cannot be mutated). The
    ``load_all_parameters`` flag is implied by the model type (SVGP
    checkpoints always carry all parameters), matching how the reference's
    own save side behaves."""
    del load_all_parameters
    return load_reference_npz(model, filename)


def bounded_param(low: float, high: float, param):
    """Reference oak_kernel.py:24-33 (sigmoid-bounded parameter)."""
    return _bounded(low, high, param)


def _calculate_features(X, categorical_feature=None, binary_feature=None):
    """Reference model_utils.py:703-750 (private helper name)."""
    from .preprocessing import calculate_features

    return calculate_features(X, categorical_feature, binary_feature)


# --------------------------------------------------------------------------- #
# normalising_flow.py names
# --------------------------------------------------------------------------- #
def make_sinharcsinh():
    """Reference normalising_flow.py:16-20: a fresh SinhArcsinh bijector with
    trainable skewness/tailweight, as (skewness, tailweight) Params plus a
    forward callable — oak_tpu composes flows inside Normalizer, so this
    exists purely for reference-shaped code."""
    from .params import param
    from .bijectors import Exp

    skewness = param(0.0)
    tailweight = param(1.0, Exp())

    def forward(x, skewness=skewness, tailweight=tailweight):
        return jnp.sinh((jnp.arcsinh(jnp.asarray(x)) + skewness.value)
                        * tailweight.value)

    return {"skewness": skewness, "tailweight": tailweight, "forward": forward}


def make_standardizer(x):
    """Reference normalising_flow.py:23-27: scale-then-shift with trainable
    parameters initialized from the data moments."""
    from .params import param
    from .bijectors import Exp

    x = np.asarray(x, np.float64)
    scale = param(1.0 / np.std(x), Exp())
    shift = param(-np.mean(x))

    def forward(v, scale=scale, shift=shift):
        # tfb.Chain([Scale, Shift]) applies Shift FIRST: (x - mean) / std
        return (jnp.asarray(v) + shift.value) * scale.value

    return {"scale": scale, "shift": shift, "forward": forward}


# --------------------------------------------------------------------------- #
# utils.py names — Sobol / components / legacy representation / k-means
# --------------------------------------------------------------------------- #
def compute_sobol_oak(model, delta: float, mu: float,
                      share_var_across_orders=True):
    """Reference utils.py:338-435. ``delta`` (stddev) / ``mu`` are the prior
    measure's parameters; oak_tpu kernels carry their measure, so these are
    validated against it and a DIFFERING override raises NotImplementedError
    (the reference call sites pass the hardcoded delta=1, mu=0 of
    oak_kernel.py:84). Returns (tuples, sobol_values)."""
    del share_var_across_orders  # read from the kernel pytree itself
    return _sobol.compute_sobol_oak(model, delta=delta, mu=mu)


def get_prediction_component(m, alpha, X=None, share_var_across_orders=True):
    """Reference utils.py:491-530: per-component predictive means [C, N]."""
    del share_var_across_orders
    return _sobol.get_prediction_component(m, alpha=alpha, X=X)


def compute_sobol(model, kernel_list, delta, mu, alpha, sparse_gp: bool = True):
    """Reference utils.py:438-488 (legacy Duvenaud representation): Sobol of
    explicit product-kernel components via eq (40). delta/mu define the
    Gaussian Sobol measure and are threaded into every Gaussian-measure
    factor's L construction exactly as the reference does (utils.py:478) —
    they may legitimately differ from the kernels' own orthogonality-
    constraint measures. Non-Gaussian-measure factors (empirical) integrate
    under their own measure; the reference would silently apply the Gaussian
    closed form there (documented deviation, PARITY_NOTES.md)."""
    from .legacy import compute_sobol as _compute

    X = model.Z.value if sparse_gp else model.data[0]
    return _compute(X, kernel_list, alpha, delta=delta, mu=mu)


def model_to_kernel_list(model, selected_dims):
    """Reference utils.py:32-42. Accepts a legacy kernel list directly, or a
    model-like object carrying one (the reference reads m.kernel.kernels;
    oak_tpu's legacy representation keeps the list itself)."""
    from .legacy import model_to_kernel_list as _f

    kl = model if isinstance(model, (list, tuple)) else model.kernel.kernels
    return _f(kl, selected_dims)


def extract_active_dims(m):
    """Reference utils.py:45-60. Accepts a legacy kernel list or a model-like
    object carrying one."""
    from .legacy import extract_active_dims as _f

    kl = m if isinstance(m, (list, tuple)) else m.kernel.kernels
    return _f(kl)


def grammer_to_kernel(selected_dims, offset, measure=None,
                      lengthscales_lo=1e-3, lengthscales_hi=100,
                      variance_lo=0.01, variance_hi=100):
    """Reference utils.py:63-113 (random-hyperparameter product kernels)."""
    from .legacy import grammer_to_kernel as _f

    return _f(selected_dims, offset, measure=measure,
              lengthscales_lo=lengthscales_lo, lengthscales_hi=lengthscales_hi,
              variance_lo=variance_lo, variance_hi=variance_hi)


def initialize_kmeans_with_binary(X, binary_index, continuous_index=None,
                                  n_clusters=200):
    """Reference utils.py:533-552."""
    from .preprocessing import initialize_kmeans_with_binary as _f

    return _f(np.asarray(X), binary_index, continuous_index, n_clusters)


def initialize_kmeans_with_categorical(X, binary_index, categorical_index,
                                       continuous_index, n_clusters=200):
    """Reference utils.py:555-574."""
    from .preprocessing import initialize_kmeans_with_categorical as _f

    return _f(np.asarray(X), binary_index, categorical_index,
              continuous_index, n_clusters)


# --------------------------------------------------------------------------- #
# model_utils.py names — misc helpers
# --------------------------------------------------------------------------- #
def get_kmeans_centers(X, K: int = 500):
    """Reference model_utils.py:31-41."""
    from .preprocessing import get_kmeans_centers as _f

    return _f(np.asarray(X), K)


def estimate_one_dim_gmm(K: int, X):
    """Reference model_utils.py:753-770 (spherical GMM -> MOGMeasure)."""
    from .model import estimate_one_dim_gmm as _f

    return _f(K, np.asarray(X))


def apply_normalise_flow(X, input_flows):
    """Reference model_utils.py:179-191 (per-dim flow application)."""
    from .model import apply_normalise_flow as _f

    return _f(X, input_flows)


# oak_kernel.py name
def get_list_representation(kernel, num_dims, share_var_across_orders=True):
    """Reference oak_kernel.py:338-364."""
    from .kernels.oak_kernel import get_list_representation as _f

    return _f(kernel, num_dims, share_var_across_orders)


# gpflow.utilities name (the reference calls it around optimisation,
# model_utils.py:174,416,426)
def print_summary(module, fmt: str = "simple") -> None:
    """gpflow.utilities.print_summary equivalent: prints the parameter table
    (name, transform, prior, trainable, shape, dtype, constrained value) of
    any oak_tpu model/kernel pytree. ``fmt`` accepted for call-site
    compatibility; all formats print the same plain-text table."""
    from .utils.summary import print_summary as _f

    _f(module, fmt=fmt)


# --------------------------------------------------------------------------- #
# class names — input_measures.py, kernels, normalising_flow.py
#
# The factories below carry the reference classes' EXACT constructor
# signatures and return the native oak_tpu pytree classes (isinstance checks
# should target oak_tpu.measures / oak_tpu.kernels types — the returned
# objects ARE those types).
# --------------------------------------------------------------------------- #
from .measures import Measure  # noqa: F401,E402  (input_measures.py:16)


def UniformMeasure(a, b):
    """Reference input_measures.py:20-28 -> oak_tpu.measures.UniformMeasure."""
    from .measures import UniformMeasure as _M

    return _M.create(a, b)


def GaussianMeasure(mu, var):
    """Reference input_measures.py:31-39 -> oak_tpu.measures.GaussianMeasure."""
    from .measures import GaussianMeasure as _M

    return _M.create(mu, var)


def EmpiricalMeasure(location, weights=None):
    """Reference input_measures.py:42-56 -> oak_tpu.measures.EmpiricalMeasure
    (default uniform weights; sum-to-1 validated like input_measures.py:53)."""
    from .measures import EmpiricalMeasure as _M

    return _M.create(location, weights)


def MOGMeasure(means, variances, weights):
    """Reference input_measures.py:59-78 -> oak_tpu.measures.MOGMeasure."""
    from .measures import MOGMeasure as _M

    return _M.create(means, variances, weights)


class RBF:
    """Stand-in for ``gpflow.kernels.RBF`` as the ``base_kernel`` argument of
    ``OrthogonalRBFKernel`` (the reference constructs one purely to carry
    initial lengthscales/variance, ortho_rbf_kernel.py:28-35)."""

    def __init__(self, variance=1.0, lengthscales=1.0, active_dims=None):
        self.variance = variance
        self.lengthscales = lengthscales
        self.active_dims = active_dims


def _active_dim(active_dims) -> int:
    if active_dims is None:
        return 0
    if isinstance(active_dims, (list, tuple, np.ndarray)):
        (dim,) = np.asarray(active_dims).reshape(-1).tolist()
        return int(dim)
    return int(active_dims)


def OrthogonalRBFKernel(base_kernel, measure, active_dims=None):
    """Reference ortho_rbf_kernel.py:20-45 constructor ->
    oak_tpu.kernels.OrthogonalRBF. ``base_kernel`` supplies the initial
    lengthscales/variance (an ``RBF``-shaped object; anything without those
    attributes raises NotImplementedError like the reference's base-kernel
    type check at ortho_rbf_kernel.py:34-35)."""
    from . import measures as _measures
    from .kernels import OrthogonalRBF

    if not isinstance(measure, (_measures.UniformMeasure,
                                _measures.GaussianMeasure,
                                _measures.EmpiricalMeasure,
                                _measures.MOGMeasure)):
        raise NotImplementedError(f"unsupported measure {type(measure).__name__}")
    if base_kernel is None:
        ls, var = 1.0, 1.0
    else:
        # match the reference's explicit base-kernel type check
        # (ortho_rbf_kernel.py:34-35 rejects non-RBF bases): a Matern-shaped
        # object with .lengthscales/.variance must NOT be silently treated
        # as RBF on a surface documented as drop-in faithful
        if not (isinstance(base_kernel, RBF)
                or type(base_kernel).__name__ == "RBF"):
            raise NotImplementedError(
                f"base_kernel must be an RBF kernel (got "
                f"{type(base_kernel).__name__}); the reference supports no "
                f"other base (ortho_rbf_kernel.py:34-35)")
        ls = float(np.asarray(base_kernel.lengthscales))
        var = float(np.asarray(base_kernel.variance))
    return OrthogonalRBF.create(measure, lengthscale=ls, variance=var,
                                active_dim=_active_dim(active_dims))


def OAKKernel(base_kernels, num_dims, max_interaction_depth,
              active_dims=None, constrain_orthogonal=False, p0=None, p=None,
              lengthscale_bounds=None, empirical_locations=None,
              empirical_weights=None, gmm_measures=None,
              share_var_across_orders=True):
    """Reference oak_kernel.py:59-103 positional constructor ->
    oak_tpu.kernels.OAKKernel. ``base_kernels`` (a list of kernel CLASSES the
    reference deletes after __init__, oak_kernel.py:88-91) is accepted and
    ignored; the continuous base is always RBF, the only base the reference
    supports."""
    del base_kernels
    from .kernels import OAKKernel as _OAKKernel

    return _OAKKernel.create(
        num_dims=num_dims, max_interaction_depth=max_interaction_depth,
        active_dims=active_dims, constrain_orthogonal=constrain_orthogonal,
        p0=p0, p=p, lengthscale_bounds=lengthscale_bounds,
        empirical_locations=empirical_locations,
        empirical_weights=empirical_weights, gmm_measures=gmm_measures,
        share_var_across_orders=share_var_across_orders)


def Normalizer(x, log=True, **kwargs):
    """Reference normalising_flow.py:30-56 constructor ->
    oak_tpu.flows.Normalizer (SinhArcsinh ∘ affine (∘ log) bijector chain
    with KL_objective/kstest/plot). ``**kwargs`` (gpflow Module naming)
    accepted and ignored."""
    del kwargs
    from .flows import Normalizer as _Normalizer

    return _Normalizer.create(np.asarray(x), log=log)


# Sobol closed-form integrals (utils.py:116-165) — identical signatures.
f1 = _sobol.f1
f2 = _sobol.f2
f3 = _sobol.f3
f4 = _sobol.f4

# model_utils.py / oak_kernel.py / plotting_utils.py names resolved lazily so
# that importing the compat surface does not pull in matplotlib (plotting) or
# the full model stack until first use.
_LAZY = {
    "oak_model": ".model",             # model_utils.py:194
    "create_model_oak": ".model",      # model_utils.py:90
    "KernelComponenent": ".kernels.oak_kernel",  # oak_kernel.py:281 [sic]
    "KernelComponent": ".kernels.oak_kernel",    # corrected-name alias
    "FigureDescription": ".plotting",            # plotting_utils.py:19
    "save_fig_list": ".plotting",                # plotting_utils.py:25
    "plot_single_effect": ".plotting",           # plotting_utils.py:36
    "plot_second_order": ".plotting",            # plotting_utils.py:218
    "plot_single_effect_binary": ".plotting",    # plotting_utils.py:378
    "plot_second_order_binary": ".plotting",     # plotting_utils.py:456
    "plot_single_effect_categorical": ".plotting",  # plotting_utils.py:602
}


def __getattr__(name):
    mod = _LAZY.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod, __package__), name)


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
