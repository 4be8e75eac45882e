"""Parameter summary tables — ``gpflow.utilities.print_summary`` equivalent.

The reference prints a parameter table before and after optimisation
(/root/reference/oak/model_utils.py:174,416,426 — name, class, transform,
prior, trainable, shape, dtype, value). Here the model is a pure pytree of
``params.Param`` nodes, so the table is derived from ``iter_params``' named
keypaths instead of TF variable introspection.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import numpy as np

from ..params import Param, iter_params


def _format_value(v: np.ndarray, max_elems: int = 6) -> str:
    # float() each element: some numpy versions reject format specs on 0-d
    # arrays / numpy scalars
    v = np.asarray(v)
    if v.ndim == 0:
        return f"{float(v):.5g}"
    flat = v.ravel()
    if flat.size <= max_elems:
        body = ", ".join(f"{float(x):.4g}" for x in flat)
        return f"[{body}]"
    body = ", ".join(f"{float(x):.4g}" for x in flat[:max_elems])
    return f"[{body}, ...]"


def _transform_name(p: Param) -> str:
    bij = p.bij
    name = type(bij).__name__
    try:
        defaults = type(bij)()
    except TypeError:
        # a bijector whose constructor has required arguments: no class
        # defaults to compare against — show all bounds instead of raising
        defaults = None
    extras = []
    for field in ("low", "high"):
        val = getattr(bij, field, None)
        if val is None:
            continue
        # A Sigmoid's bounds are always load-bearing (the caller chose them,
        # e.g. lengthscale_bounds), so both are shown even at the class
        # default; elsewhere a class-default field (Softplus's low=0.0) is
        # noise and is suppressed.
        if (name != "Sigmoid" and defaults is not None
                and val == getattr(defaults, field, None)):
            continue
        extras.append(f"{field}={val:g}")
    return name + (f"({', '.join(extras)})" if extras else "")


def _prior_name(p: Param) -> str:
    if p.prior is None:
        return ""
    fields = ", ".join(
        f"{k}={v:g}" for k, v in vars(p.prior).items()
        if isinstance(v, (int, float))
    )
    return f"{type(p.prior).__name__}({fields})"


def parameter_table(tree: Any) -> List[Tuple[str, ...]]:
    """Rows of (name, class, transform, prior, trainable, shape, dtype,
    value) for every ``Param`` in the pytree, in canonical (checkpoint)
    order — the same columns as gpflow's print_summary table. Values are the
    *constrained* values, matching what GPflow's table shows; the class
    column is the parameter node's type (``Param``), the analogue of
    gpflow's ``Parameter``."""
    rows = []
    for name, p in iter_params(tree):
        value = np.asarray(p.value)
        rows.append((
            name.lstrip("."),
            type(p).__name__,
            _transform_name(p),
            _prior_name(p),
            str(bool(p.trainable)),
            str(tuple(value.shape)),
            str(value.dtype),
            _format_value(value),
        ))
    return rows


_HEADER = ("name", "class", "transform", "prior", "trainable", "shape",
           "dtype", "value")


def summary_string(tree: Any) -> str:
    """The table as one aligned string (``fmt`` variants of GPflow's
    print_summary all reduce to this text form here — there is no notebook
    HTML path to drive)."""
    rows = parameter_table(tree)
    if not rows:
        return "(no parameters)"
    widths = [max(len(r[i]) for r in rows + [_HEADER])
              for i in range(len(_HEADER))]
    lines = ["  ".join(h.ljust(w) for h, w in zip(_HEADER, widths)),
             "  ".join("-" * w for w in widths)]
    for r in rows:
        lines.append("  ".join(c.ljust(w) for c, w in zip(r, widths)))
    return "\n".join(lines)


def print_summary(tree: Any, fmt: str = "simple") -> None:
    """Print the parameter table (reference: gpflow.utilities.print_summary,
    called at model_utils.py:174,416,426). ``fmt`` is accepted for call-site
    compatibility; all formats print the same plain-text table."""
    del fmt
    print(summary_string(tree))
