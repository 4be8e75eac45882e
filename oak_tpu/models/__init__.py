from .gpr import GPR
from .likelihoods import Bernoulli, Gaussian, inv_logit, inv_probit
from .sgpr import SGPR
from .svgp import SVGP

__all__ = ["GPR", "SGPR", "SVGP", "Gaussian", "Bernoulli", "inv_logit", "inv_probit"]
