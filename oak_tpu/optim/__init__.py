from .fit import fit_adam, fit_adam_scan, fit_lbfgs, fit_scipy
from .multistart import fit_lbfgs_multistart
from .natgrad import fit_natgrad_adam

__all__ = ["fit_scipy", "fit_lbfgs", "fit_adam", "fit_adam_scan",
           "fit_natgrad_adam", "fit_lbfgs_multistart"]
