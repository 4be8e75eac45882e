from .newton_girard import (
    elementary_symmetric_bruteforce,
    newton_girard,
    newton_girard_stacked,
    power_sums,
)

__all__ = [
    "newton_girard",
    "newton_girard_stacked",
    "power_sums",
    "elementary_symmetric_bruteforce",
]
