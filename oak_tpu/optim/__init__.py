from .fit import (
    FitResult,
    fit_adam,
    fit_adam_scan,
    fit_lbfgs,
    fit_scipy,
    load_train_state,
    save_train_state,
)
from .multistart import (
    fit_adam_multistart,
    fit_lbfgs_multistart,
    fit_natgrad_multistart,
)
from .natgrad import fit_natgrad_adam, fit_natgrad_scan

__all__ = ["FitResult", "fit_scipy", "fit_lbfgs", "fit_adam", "fit_adam_scan",
           "fit_natgrad_adam", "fit_natgrad_scan", "fit_lbfgs_multistart",
           "fit_adam_multistart", "fit_natgrad_multistart",
           "save_train_state",
           "load_train_state"]
