"""oak-tpu: TPU-native Orthogonal Additive Kernel Gaussian processes.

A brand-new JAX/XLA/Pallas framework with the capabilities of
amzn/orthogonal-additive-gaussian-processes (the OAK model of
"Additive Gaussian Processes Revisited", arXiv:2206.09861), built TPU-first:
pure-functional kernels and models as parameter pytrees, jitted losses, fused
gram construction, and sharding-ready training steps.
"""

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
