"""oak-tpu: TPU-native Orthogonal Additive Kernel Gaussian processes.

A brand-new JAX/XLA/Pallas framework with the capabilities of
amzn/orthogonal-additive-gaussian-processes (the OAK model of
"Additive Gaussian Processes Revisited", arXiv:2206.09861), built TPU-first:
pure-functional kernels and models as parameter pytrees, jitted losses, fused
gram construction, and sharding-ready training steps.
"""

import os as _os

if _os.environ.get("OAK_TPU_PLATFORM"):
    # Testing/baseline hook (e.g. "cpu"): force the JAX platform list once,
    # here, instead of per-script — this image's sitecustomize rewrites
    # jax_platforms to "axon,cpu" so a plain JAX_PLATFORMS env var does not
    # stick, and config.update must run after importing jax but before any
    # backend initialization. Best-effort: a no-op if a backend already
    # initialized (the importer chose a platform first, keep it).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["OAK_TPU_PLATFORM"])
    except RuntimeError:
        pass

from . import bijectors, config, measures, params
from .kernels import (
    OAKKernel,
    OrthogonalBinary,
    OrthogonalCategorical,
    OrthogonalRBF,
    UnconstrainedRBF,
    component_index_tuples,
)
from .measures import (
    EmpiricalMeasure,
    GaussianMeasure,
    Measure,
    MOGMeasure,
    UniformMeasure,
)
from .params import Gamma, Normal, Param, bounded, fixed, param, positive
from .flows import Normalizer, fit_normalizer
from .model import create_model_oak, oak_model
from .models import GPR, SGPR, SVGP, Bernoulli, Gaussian
from .optim import (
    fit_adam,
    fit_lbfgs,
    fit_lbfgs_multistart,
    fit_natgrad_adam,
    fit_scipy,
)
from .serving import deserialize_predict, serialize_predict
from .sobol import (
    compute_sobol_by_order,
    compute_sobol_oak,
    get_prediction_component,
    normalize_sobol,
    num_latents,
    select_latent,
)
from .checkpoint import (
    load_oak_model,
    load_params,
    load_reference_npz,
    save_oak_model,
    save_params,
)
from .experiment import ExperimentConfig, FitConfig, ModelConfig

__version__ = "0.1.0"
