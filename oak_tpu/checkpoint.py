"""Checkpointing: named-keypath npz save/load.

The reference saves a *positional* list of parameter arrays with
``allow_pickle=True`` (/root/reference/oak/model_utils.py:44-87) — fragile
against any structural change. Here every leaf is keyed by its pytree keypath
(inspectable with plain numpy, no pickling of code objects), and loading
fills a freshly-constructed template of identical structure — the same
"rebuild then load" contract the reference uses (uci_plotting.py:163-200).

``save_oak_model``/``load_oak_model`` persist the full wrapper state: model
params (including data and inducing points), per-dim flows, scalers, measure
specs and constructor config (JSON).
"""

from __future__ import annotations

import json
from pathlib import Path
import numpy as np
import jax
import jax.numpy as jnp


def _flat_with_keys(tree, prefix: str):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for kp, leaf in flat:
        out[prefix + jax.tree_util.keystr(kp)] = np.asarray(leaf)
    return out


def _fill_from_dict(template, data: dict, prefix: str):
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, leaf in flat:
        key = prefix + jax.tree_util.keystr(kp)
        if key not in data:
            raise KeyError(f"checkpoint missing key {key}")
        arr = data[key]
        leaves.append(jnp.asarray(arr, np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_params(tree, path) -> None:
    """Save every array leaf of a model pytree, keyed by keypath."""
    np.savez(path, **_flat_with_keys(tree, "m"))


def load_params(template, path):
    """Return a copy of ``template`` with leaves loaded from ``path``."""
    with np.load(path) as data:
        return _fill_from_dict(template, dict(data), "m")


# --------------------------------------------------------------------------- #
# Reference-layout compat loader
# --------------------------------------------------------------------------- #
def reference_param_order(model):
    """Describe the reference checkpoint's positional parameter layout for
    ``model``: a list of slot names in the order the reference's
    ``save_model`` writes them (/root/reference/oak/model_utils.py:44-64).

    The reference saves ``[p.numpy() for p in model.(trainable_)parameters]``
    — GPflow 2.2 enumerates parameters by tf.Module flattening: attribute
    names sorted alphabetically at each level, list attributes in index
    order. Consequences baked in here:

    - GPR/SGPR save *trainable* parameters only; SVGP saves ALL parameters
      (so a fixed inducing ``Z`` appears for SVGP but not for zfixed SGPR).
    - model level: ``inducing_variable`` < ``kernel`` < ``likelihood`` <
      ``q_mu`` < ``q_sqrt``.
    - kernel level: ``kernels[0..D-1]`` then ``variances[0..P]``.
    - in shared-variance mode the reference REPLACES pinned base variances
      with plain tensors (oak_kernel.py:163-166,178,186), so they are not
      Parameters at all and are absent from the file — EXCEPT empirical/GMM
      RBF dims, whose pinning the reference skips.
    - per-kernel attribute order: RBF ``lengthscales`` < ``variance``;
      categorical ``W`` < ``kappa`` < ``variance`` ('W' sorts before
      lowercase); binary just ``variance``.
    """
    from .kernels.oak_kernel import UnconstrainedRBF
    from .kernels.ortho_binary import OrthogonalBinary
    from .kernels.ortho_categorical import OrthogonalCategorical
    from .kernels.ortho_rbf import OrthogonalRBF
    from .measures import GaussianMeasure
    from .models import SGPR, SVGP

    oak = model.kernel
    shared = oak.share_var_across_orders
    slots = []
    if isinstance(model, SVGP):
        slots.append("Z")  # all-params save includes the fixed Z
    elif isinstance(model, SGPR) and model.Z.trainable:
        slots.append("Z")
    for i, k in enumerate(oak.kernels):
        if isinstance(k, (OrthogonalRBF, UnconstrainedRBF)):
            slots.append(f"kernels[{i}].lengthscale")
            pinned = shared and (isinstance(k, UnconstrainedRBF)
                                 or isinstance(k.measure, GaussianMeasure))
            if not pinned:
                slots.append(f"kernels[{i}].variance")
        elif isinstance(k, OrthogonalCategorical):
            slots.append(f"kernels[{i}].W")
            slots.append(f"kernels[{i}].kappa")
            if not shared:
                slots.append(f"kernels[{i}].variance")
        elif isinstance(k, OrthogonalBinary):
            if not shared:
                slots.append(f"kernels[{i}].variance")
        else:
            raise NotImplementedError(type(k))
    for j in range(len(oak.variances)):
        slots.append(f"variances[{j}]")
    if hasattr(model.likelihood, "variance"):
        slots.append("likelihood.variance")
    if isinstance(model, SVGP):
        slots.append("q_mu")
        slots.append("q_sqrt")
    return slots


def load_reference_npz(model, path):
    """Load a checkpoint written by the reference's ``save_model`` (a
    positional ``hyperparams`` object array of *constrained* values) onto an
    identically-structured oak_tpu model; returns the new model. The caller
    rebuilds the model shape first, exactly like the reference's consumers
    (uci_plotting.py:163-200)."""
    vals = list(np.load(path, allow_pickle=True)["hyperparams"])
    slots = reference_param_order(model)
    if len(vals) != len(slots):
        raise ValueError(
            f"checkpoint has {len(vals)} parameters but the model layout "
            f"expects {len(slots)}: {slots}")

    def assign(p, v):
        v = np.asarray(v, dtype=np.asarray(p.raw).dtype)
        return p.assign(jnp.asarray(v.reshape(np.asarray(p.raw).shape)))

    new = model
    kernels = list(new.kernel.kernels)
    variances = list(new.kernel.variances)
    likelihood = new.likelihood
    updates = {}
    for slot, v in zip(slots, vals):
        if slot == "Z":
            updates["Z"] = assign(new.Z, v)
        elif slot == "q_mu":
            updates["q_mu"] = assign(new.q_mu, v)
        elif slot == "q_sqrt":
            updates["q_sqrt"] = assign(new.q_sqrt, v)
        elif slot == "likelihood.variance":
            likelihood = likelihood.replace(
                variance=assign(likelihood.variance, v))
        elif slot.startswith("variances["):
            j = int(slot[len("variances["):-1])
            variances[j] = assign(variances[j], v)
        elif slot.startswith("kernels["):
            i = int(slot[len("kernels["):slot.index("]")])
            field = slot.split(".")[1]
            k = kernels[i]
            kernels[i] = k.replace(**{field: assign(getattr(k, field), v)})
        else:  # pragma: no cover
            raise AssertionError(slot)
    kernel = new.kernel.replace(kernels=tuple(kernels),
                                variances=tuple(variances))
    return new.replace(kernel=kernel, likelihood=likelihood, **updates)


# --------------------------------------------------------------------------- #
# Full oak_model wrapper persistence
# --------------------------------------------------------------------------- #
def save_oak_model(oak, path) -> None:
    from .models import SVGP

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    config = {
        "max_interaction_depth": oak.max_interaction_depth,
        "num_inducing": oak.num_inducing,
        "lengthscale_bounds": oak.lengthscale_bounds,
        "binary_feature": oak.binary_feature,
        "categorical_feature": oak.categorical_feature,
        "empirical_measure": oak.empirical_measure,
        "use_sparsity_prior": oak.use_sparsity_prior,
        "gmm_measure": list(oak.gmm_measure) if oak.gmm_measure is not None else None,
        "sparse": oak.sparse,
        "use_normalising_flow": oak.use_normalising_flow,
        "share_var_across_orders": oak.share_var_across_orders,
        "likelihood": oak.likelihood,
        "optimizer": oak.optimizer,
        "num_dims": oak.num_dims,
        "continuous_index": oak.continuous_index,
        "binary_index": oak.binary_index,
        "categorical_index": oak.categorical_index,
        "model_kind": type(oak.m).__name__,
        "flow_dims": [i for i, f in enumerate(oak.input_flows) if f is not None],
        # SVGP static structure (natgrad-constructed models use a full-
        # covariance q — the load template must match the saved leaf shapes)
        "q_diag": bool(getattr(oak.m, "q_diag", True)),
        "whiten": bool(getattr(oak.m, "whiten", True)),
    }

    arrays = {"config": np.frombuffer(json.dumps(config).encode(), np.uint8)}
    arrays.update(_flat_with_keys(oak.m, "m"))
    for i, flow in enumerate(oak.input_flows):
        if flow is not None:
            arrays.update(_flat_with_keys(flow, f"flow{i}"))
    arrays["scaler_y_mean"] = oak.scaler_y.mean_
    arrays["scaler_y_scale"] = oak.scaler_y.scale_
    if oak.scaler_X_empirical is not None:
        arrays["scaler_Xemp_mean"] = oak.scaler_X_empirical.mean_
        arrays["scaler_Xemp_scale"] = oak.scaler_X_empirical.scale_
    if oak.scaler_X_continuous is not None:
        arrays["scaler_Xcont_mean"] = oak.scaler_X_continuous.mean_
        arrays["scaler_Xcont_scale"] = oak.scaler_X_continuous.scale_
    arrays["xmin"] = oak.xmin
    arrays["xmax"] = oak.xmax
    arrays["X_scaled"] = oak.X_scaled
    arrays["Y_scaled"] = oak.Y_scaled
    if isinstance(oak.m, SVGP):
        arrays["train_X"] = oak._train_data[0]
        arrays["train_Y"] = oak._train_data[1]
    np.savez(path, **arrays)


def load_oak_model(path):
    from .flows import Normalizer
    from .model import oak_model
    from .preprocessing import StandardScaler

    with np.load(path) as f:
        data = dict(f)
    config = json.loads(bytes(data["config"]).decode())

    oak = oak_model(
        max_interaction_depth=config["max_interaction_depth"],
        num_inducing=config["num_inducing"],
        lengthscale_bounds=config["lengthscale_bounds"],
        binary_feature=config["binary_feature"],
        categorical_feature=config["categorical_feature"],
        empirical_measure=config["empirical_measure"],
        use_sparsity_prior=config["use_sparsity_prior"],
        gmm_measure=config["gmm_measure"],
        sparse=config["sparse"],
        use_normalising_flow=config["use_normalising_flow"],
        share_var_across_orders=config["share_var_across_orders"],
        likelihood=config["likelihood"],
        optimizer=config["optimizer"],
    )
    # rebuild by re-running the (cheap) structural part of fit on the stored
    # scaled data, then overwrite every parameter leaf from the checkpoint
    oak.num_dims = config["num_dims"]
    oak.continuous_index = config["continuous_index"]
    oak.binary_index = config["binary_index"]
    oak.categorical_index = config["categorical_index"]
    oak.xmin = data["xmin"]
    oak.xmax = data["xmax"]
    oak.X_scaled = data["X_scaled"]
    oak.Y_scaled = data["Y_scaled"]

    oak.scaler_y = StandardScaler(mean_=data["scaler_y_mean"],
                                  scale_=data["scaler_y_scale"])
    if "scaler_Xemp_mean" in data:
        oak.scaler_X_empirical = StandardScaler(mean_=data["scaler_Xemp_mean"],
                                                scale_=data["scaler_Xemp_scale"])
    if "scaler_Xcont_mean" in data:
        oak.scaler_X_continuous = StandardScaler(mean_=data["scaler_Xcont_mean"],
                                                 scale_=data["scaler_Xcont_scale"])

    oak.input_flows = [None] * oak.num_dims
    for i in config["flow_dims"]:
        template = Normalizer.create(np.array([0.5, 1.0, 2.0]), log=True)
        oak.input_flows[i] = _fill_from_dict(template, data, f"flow{i}")

    # rebuild the GP model with identical structure on stored data, then load
    X = data["X_scaled"]
    Y = data["Y_scaled"]
    # Re-derive feature measure structure exactly as fit() does, but without
    # optimization or flow refitting.
    from .preprocessing import calculate_features, empirical_measure_from_column
    from .preprocessing import estimate_one_dim_gmm
    from .kernels import OAKKernel
    from .models import GPR, SGPR, SVGP, Bernoulli

    Xraw_placeholder = X  # discrete columns are untouched by scaling
    _, _, _, p0, p = calculate_features(Xraw_placeholder,
                                        config["categorical_feature"],
                                        config["binary_feature"])
    empirical_locations = [None] * oak.num_dims
    empirical_weights = [None] * oak.num_dims
    if config["empirical_measure"] is not None:
        for i in config["empirical_measure"]:
            loc, w = empirical_measure_from_column(X[:, i])
            empirical_locations[i] = loc
            empirical_weights[i] = w
    oak.empirical_locations = empirical_locations
    oak.empirical_weights = empirical_weights
    gmms = [None] * oak.num_dims
    oak.estimated_gmm_measures = gmms
    if config["gmm_measure"] is not None:
        for i in np.flatnonzero(config["gmm_measure"]):
            gmms[i] = estimate_one_dim_gmm(int(config["gmm_measure"][i]), X[:, i])

    kernel = OAKKernel.create(
        num_dims=oak.num_dims,
        max_interaction_depth=config["max_interaction_depth"],
        p0=p0,
        p=p,
        lengthscale_bounds=config["lengthscale_bounds"],
        empirical_locations=empirical_locations,
        empirical_weights=empirical_weights,
        gmm_measures=gmms,
        share_var_across_orders=config["share_var_across_orders"],
        use_sparsity_prior=config["use_sparsity_prior"] and config["share_var_across_orders"],
    )

    kind = config["model_kind"]
    if kind == "SVGP":
        M = data["m.Z.raw"].shape[0]
        template = SVGP.create(kernel, Bernoulli.create("logit"), np.zeros((M, oak.num_dims)),
                               q_diag=config.get("q_diag", True),
                               whiten=config.get("whiten", True),
                               num_data=X.shape[0])
        oak._train_data = (data["train_X"], data["train_Y"])
    elif kind == "SGPR":
        M = data["m.Z.raw"].shape[0]
        template = SGPR.create(X, Y, kernel, np.zeros((M, oak.num_dims)),
                               noise_variance=0.01)
    else:
        template = GPR.create(X, Y, kernel, noise_variance=0.01)
    oak.m = _fill_from_dict(template, data, "m")
    return oak
