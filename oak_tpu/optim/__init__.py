from .fit import fit_adam, fit_lbfgs, fit_scipy

__all__ = ["fit_scipy", "fit_lbfgs", "fit_adam"]
