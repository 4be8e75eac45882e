"""The OAK combination kernel.

TPU-native rebuild of /root/reference/oak/oak_kernel.py (OAKKernel,
KernelComponenent, get_list_representation). The kernel owns one constrained
1-D kernel per (group of) input dimension(s) plus per-interaction-order
variances sigma^2_0..sigma^2_P, and evaluates

    K = sum_n sigma^2_n * e_n(k_1, ..., k_D)

with e_n the elementary symmetric polynomials computed by Newton-Girard
(ops/newton_girard.py). All structure (dim types, measures, depth) is static;
parameters live in a single pytree so the whole gram inlines into one jitted
XLA computation (and later a fused Pallas kernel for the continuous block).
"""

from __future__ import annotations

import itertools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..measures import EmpiricalMeasure, GaussianMeasure, MOGMeasure
from ..ops.newton_girard import newton_girard
from ..params import Gamma, Param, positive
from . import ortho_binary, ortho_categorical, ortho_rbf
from .ortho_binary import OrthogonalBinary
from .ortho_categorical import OrthogonalCategorical
from .ortho_rbf import OrthogonalRBF


@struct.dataclass
class UnconstrainedRBF:
    """Plain SE kernel on one dim — the constrain_orthogonal=False variant
    (oak_kernel.py:190-210)."""

    lengthscale: Param
    variance: Param
    active_dim: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def create(cls, lengthscale=1.0, variance=1.0, active_dim: int = 0,
               lengthscale_bounds=None, train_variance: bool = True, dtype=None):
        from ..params import bounded

        if lengthscale_bounds is not None:
            ls = bounded(lengthscale_bounds[0], lengthscale_bounds[1], lengthscale, dtype=dtype)
        else:
            ls = positive(lengthscale, dtype=dtype)
        return cls(lengthscale=ls,
                   variance=positive(variance, trainable=train_variance, dtype=dtype),
                   active_dim=active_dim)


def kernel_K(k, x: jnp.ndarray, x2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gram of one constituent 1-D kernel on already-sliced columns."""
    if isinstance(k, OrthogonalRBF):
        return ortho_rbf.K(k, x, x2)
    if isinstance(k, OrthogonalBinary):
        return ortho_binary.K(k, x, x2)
    if isinstance(k, OrthogonalCategorical):
        return ortho_categorical.K(k, x, x2)
    if isinstance(k, UnconstrainedRBF):
        x2 = x if x2 is None else x2
        d = (x[:, None] - x2[None, :]) / k.lengthscale.value
        return k.variance.value * jnp.exp(-0.5 * d * d)
    raise NotImplementedError(type(k))


def kernel_K_diag(k, x: jnp.ndarray) -> jnp.ndarray:
    if isinstance(k, OrthogonalRBF):
        return ortho_rbf.K_diag(k, x)
    if isinstance(k, OrthogonalBinary):
        return ortho_binary.K_diag(k, x)
    if isinstance(k, OrthogonalCategorical):
        return ortho_categorical.K_diag(k, x)
    if isinstance(k, UnconstrainedRBF):
        return jnp.full(x.shape, 1.0, x.dtype) * k.variance.value
    raise NotImplementedError(type(k))


def stackable_groups(kernels) -> List[List[int]]:
    """Group kernel indices whose pytrees stack (same type, same treedef after
    normalizing the static active_dim, same leaf shapes) — each group can run
    per-dim computations as ONE vmapped call instead of a Python loop of
    launches. Pays off when the consumer keeps the batched layout (Sobol's
    per-dim L matmuls, K_diag's group-axis power-sum reductions); slicing
    the batch back out per dim costs more than the loop (measured 6x slower
    for K_diag at D=32, N=8192 on TPU)."""
    import jax as _jax

    groups: List[List[int]] = []
    keys = []
    for i, k in enumerate(kernels):
        k0 = k.replace(active_dim=0)
        key = (_jax.tree_util.tree_structure(k0),
               tuple(jnp.shape(l) for l in _jax.tree_util.tree_leaves(k0)))
        for g, kk in zip(groups, keys):
            if kk == key:
                g.append(i)
                break
        else:
            groups.append([i])
            keys.append(key)
    return groups


def stack_group(kernels, idx):
    import jax as _jax

    return _jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[kernels[i].replace(active_dim=0) for i in idx])


def per_dim_batched(kernels, X: jnp.ndarray, fn) -> List:
    """Evaluate ``fn(kernel, column)`` for every constituent kernel, vmapping
    each stackable group. Returns a list in dim order (entries may share a
    batched buffer)."""
    import jax as _jax

    out = [None] * len(kernels)
    for idx in stackable_groups(kernels):
        cols = jnp.stack([X[:, kernels[i].active_dim] for i in idx])
        if len(idx) == 1:
            out[idx[0]] = fn(kernels[idx[0]], cols[0])
            continue
        res = _jax.vmap(fn)(stack_group(kernels, idx), cols)
        for j, i in enumerate(idx):
            out[i] = _jax.tree_util.tree_map(lambda r: r[j], res)
    return out


@struct.dataclass
class OAKKernel:
    kernels: Tuple  # one constrained 1-D kernel per dim group
    variances: Tuple[Param, ...]  # P+1 order variances (or just the constant's)
    max_interaction_depth: int = struct.field(pytree_node=False, default=2)
    share_var_across_orders: bool = struct.field(pytree_node=False, default=True)

    @property
    def num_dims(self) -> int:
        return len(self.kernels)

    # ------------------------------------------------------------------ #
    @classmethod
    def create(
        cls,
        num_dims: int,
        max_interaction_depth: int = 2,
        active_dims: Optional[Sequence[Sequence[int]]] = None,
        constrain_orthogonal: bool = True,
        p0: Optional[Sequence[Optional[float]]] = None,
        p: Optional[Sequence] = None,
        lengthscale_bounds: Optional[Sequence[float]] = None,
        empirical_locations: Optional[Sequence] = None,
        empirical_weights: Optional[Sequence] = None,
        gmm_measures: Optional[Sequence[Optional[MOGMeasure]]] = None,
        share_var_across_orders: bool = True,
        use_sparsity_prior: bool = False,
        dtype=None,
    ) -> "OAKKernel":
        """Mirrors the reference constructor semantics
        (/root/reference/oak/oak_kernel.py:59-221):

        - continuous dims: OrthogonalRBF against N(0, 1) (delta2=1 hardcoded,
          oak_kernel.py:84), or an empirical / GMM measure if given;
        - binary dims (p0[d] set): OrthogonalBinary;
        - categorical dims (p[d] set): OrthogonalCategorical;
        - share_var_across_orders: base variances pinned to 1 (non-trainable)
          and trainable per-order variances sigma^2_0..sigma^2_P; otherwise
          only sigma^2_0 plus trainable per-kernel base variances;
        - unconstrained variant (constrain_orthogonal=False) uses plain RBF
          per dim (still via OrthogonalRBF machinery minus the downdate is NOT
          valid — instead we keep a plain-RBF flag via measure=None); see
          ``UnconstrainedRBF`` below.
        """
        if active_dims is None:
            active_dims = [[d] for d in range(num_dims)]
        flat = [d for group in active_dims for d in group]
        if len(flat) != len(set(flat)):
            raise ValueError("Active dims contains duplicates.")
        if max(flat) >= num_dims:
            raise ValueError("Active dims exceeding num dims.")
        if any(len(g) != 1 for g in active_dims):
            # the reference accepts multi-dim groups at construction but its
            # 1-D kernels reject them at evaluation (ortho_rbf_kernel.py:50);
            # fail loudly here instead
            raise NotImplementedError("active_dims groups must be single dims")
        D = len(active_dims)

        p0 = list(p0) if p0 is not None else [None] * D
        p = list(p) if p is not None else [None] * D
        if empirical_locations is None:
            if empirical_weights is not None:
                raise ValueError("Cannot have weights without locations")
            empirical_locations = [None] * D
            empirical_weights = [None] * D
        elif empirical_weights is None:
            empirical_weights = [None] * D
        if gmm_measures is None:
            gmm_measures = [None] * D

        if not constrain_orthogonal:
            if any(loc is not None for loc in empirical_locations):
                raise ValueError("Cannot have empirical locations without orthogonal constraint")

        kernels = []
        for d in range(D):
            dim = active_dims[d][0]
            train_var = not share_var_across_orders
            if empirical_locations[d] is not None and gmm_measures[d] is not None:
                raise ValueError(f"Both empirical and GMM measure defined for input {d}")
            if p[d] is not None:
                # per-dim key: the reference draws fresh uniform W per kernel
                # (ortho_categorical_kernel.py:28); a shared default key would
                # start equal-cardinality dims at an exactly symmetric point
                k = OrthogonalCategorical.create(
                    p=p[d], active_dim=dim, train_variance=train_var,
                    key=jax.random.PRNGKey(dim), dtype=dtype
                )
            elif p0[d] is not None:
                if constrain_orthogonal:
                    k = OrthogonalBinary.create(
                        p0=p0[d], active_dim=dim, train_variance=train_var, dtype=dtype
                    )
                else:
                    # reference uses OrthogonalBinary in both branches
                    # (oak_kernel.py:205-207)
                    k = OrthogonalBinary.create(
                        p0=p0[d], active_dim=dim, train_variance=train_var, dtype=dtype
                    )
            else:
                if not constrain_orthogonal:
                    k = UnconstrainedRBF.create(
                        active_dim=dim,
                        lengthscale_bounds=lengthscale_bounds,
                        train_variance=train_var,
                        dtype=dtype,
                    )
                else:
                    rbf_train_var = train_var
                    if empirical_locations[d] is not None:
                        measure = EmpiricalMeasure.create(
                            empirical_locations[d], empirical_weights[d], dtype=dtype
                        )
                        # the reference pins base variance to 1 ONLY in the
                        # Gaussian-measure branch (oak_kernel.py:163-166);
                        # empirical/GMM dims keep a trainable base variance
                        # even when variances are shared across orders
                        rbf_train_var = True
                    elif gmm_measures[d] is not None:
                        measure = gmm_measures[d]
                        rbf_train_var = True
                    else:
                        # delta2 = 1 prior measure variance (oak_kernel.py:84)
                        measure = GaussianMeasure.create(0.0, 1.0, dtype=dtype)
                    k = OrthogonalRBF.create(
                        measure,
                        active_dim=dim,
                        lengthscale_bounds=lengthscale_bounds,
                        train_variance=rbf_train_var,
                        dtype=dtype,
                    )
            kernels.append(k)

        prior = Gamma(1.0, 0.2) if use_sparsity_prior else None
        if share_var_across_orders:
            variances = tuple(
                positive(1.0, prior=prior, dtype=dtype)
                for _ in range(max_interaction_depth + 1)
            )
        else:
            variances = (positive(1.0, dtype=dtype),)

        return cls(
            kernels=tuple(kernels),
            variances=variances,
            max_interaction_depth=max_interaction_depth,
            share_var_across_orders=share_var_across_orders,
        )

    # ------------------------------------------------------------------ #
    def _max_active_dim(self) -> int:
        return max(k.active_dim for k in self.kernels) + 1

    def dim_grams(self, X: jnp.ndarray, X2: Optional[jnp.ndarray] = None) -> List[jnp.ndarray]:
        from ..utils.diagnostics import check_matrix_input

        check_matrix_input(X, self._max_active_dim(), "X")
        if X2 is not None:
            check_matrix_input(X2, self._max_active_dim(), "X2")
        mats = []
        for k in self.kernels:
            x = X[:, k.active_dim]
            x2 = None if X2 is None else X2[:, k.active_dim]
            mats.append(kernel_K(k, x, x2))
        return mats

    def dim_diags(self, X: jnp.ndarray) -> List[jnp.ndarray]:
        from ..utils.diagnostics import check_matrix_input

        check_matrix_input(X, self._max_active_dim(), "X")
        return [kernel_K_diag(k, X[:, k.active_dim]) for k in self.kernels]

    def _diag_power_sums(self, X: jnp.ndarray, depth: int) -> List[jnp.ndarray]:
        """Power sums s_p = sum_i k_i_diag**p, p=1..depth, via stacked groups.

        Power sums are order-free, so each stackable group contributes
        ``(vals**p).sum(0)`` of its vmapped [G, N] diag buffer directly —
        no per-dim slicing back out (a stack→vmap→unstack round-trip was
        measured 6x SLOWER than the plain loop on TPU; reducing over the
        group axis instead is what makes batching pay)."""
        import jax as _jax

        s = [None] * depth
        for idx in stackable_groups(self.kernels):
            if len(idx) == 1:
                k = self.kernels[idx[0]]
                vals = kernel_K_diag(k, X[:, k.active_dim])[None]
            else:
                cols = jnp.stack([X[:, self.kernels[i].active_dim]
                                  for i in idx])
                vals = _jax.vmap(kernel_K_diag)(
                    stack_group(self.kernels, idx), cols)
            vp = vals
            for p in range(depth):
                contrib = jnp.sum(vp, axis=0)
                s[p] = contrib if s[p] is None else s[p] + contrib
                if p + 1 < depth:
                    vp = vp * vals
        return s

    def _combine(self, terms: List[jnp.ndarray]) -> jnp.ndarray:
        if self.share_var_across_orders:
            out = self.variances[0].value * terms[0]
            for v, e in zip(self.variances[1:], terms[1:]):
                out = out + v.value * e
            return out
        out = self.variances[0].value * terms[0]
        for e in terms[1:]:
            out = out + e
        return out

    def K(self, X: jnp.ndarray, X2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..config import pallas_gram_enabled
        from ..ops import oak_gram_pallas as ogp
        from ..utils.diagnostics import check_matrix_input

        check_matrix_input(X, self._max_active_dim(), "X")
        if X2 is not None:
            check_matrix_input(X2, self._max_active_dim(), "X2")
        if (pallas_gram_enabled() and jnp.asarray(X).dtype == jnp.float32
                and ogp.supports_pallas(self)):
            return ogp.oak_gram(self, X, X2)
        e = newton_girard(self.dim_grams(X, X2), self.max_interaction_depth)
        return self._combine(e)

    def K_diag(self, X: jnp.ndarray) -> jnp.ndarray:
        from ..ops.newton_girard import newton_girard_from_power_sums
        from ..utils.diagnostics import check_matrix_input

        check_matrix_input(X, self._max_active_dim(), "X")
        e = newton_girard_from_power_sums(
            self._diag_power_sums(X, self.max_interaction_depth),
            self.max_interaction_depth)
        return self._combine(e)

    # ------------------------------------------------------------------ #
    def component_K(self, dims: Sequence[int], X: jnp.ndarray,
                    X2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Gram of one additive term (KernelComponenent.K,
        oak_kernel.py:300-320). ``dims`` indexes into self.kernels; empty
        means the constant term sigma^2_0 * 1."""
        n = X.shape[0]
        m = n if X2 is None else X2.shape[0]
        if len(dims) == 0:
            return self.variances[0].value * jnp.ones((n, m), X.dtype)
        out = None
        for d in dims:
            k = self.kernels[d]
            x = X[:, k.active_dim]
            x2 = None if X2 is None else X2[:, k.active_dim]
            g = kernel_K(k, x, x2)
            out = g if out is None else out * g
        if self.share_var_across_orders:
            out = self.variances[len(dims)].value * out
        return out

    def component_K_diag(self, dims: Sequence[int], X: jnp.ndarray) -> jnp.ndarray:
        if len(dims) == 0:
            return self.variances[0].value * jnp.ones((X.shape[0],), X.dtype)
        out = None
        for d in dims:
            k = self.kernels[d]
            g = kernel_K_diag(k, X[:, k.active_dim])
            out = g if out is None else out * g
        if self.share_var_across_orders:
            out = self.variances[len(dims)].value * out
        return out


def component_index_tuples(num_dims: int, max_interaction_depth: int) -> List[List[int]]:
    """All C(D, 0..P) index tuples, constant term first — the reference's
    ``get_list_representation`` ordering (oak_kernel.py:338-364)."""
    out: List[List[int]] = [[]]
    for order in range(1, max_interaction_depth + 1):
        out.extend([list(c) for c in itertools.combinations(range(num_dims), order)])
    return out


class KernelComponent:
    """One additive term of an OAKKernel, as a standalone kernel object —
    the reference's ``KernelComponenent`` [sic] (oak_kernel.py:281-335).
    Thin view over OAKKernel.component_K; the misspelled reference name is
    kept as an alias for API compatibility."""

    def __init__(self, oak_kernel: "OAKKernel", iComponent_list: Sequence[int],
                 share_var_across_orders: bool = True):
        self.oak_kernel = oak_kernel
        self.iComponent_list = list(iComponent_list)
        self.share_var_across_orders = share_var_across_orders
        self.kernels = [k for i, k in enumerate(oak_kernel.kernels)
                        if i in self.iComponent_list]

    def K(self, X, X2=None):
        return self.oak_kernel.component_K(self.iComponent_list, jnp.asarray(X),
                                           None if X2 is None else jnp.asarray(X2))

    def K_diag(self, X):
        return self.oak_kernel.component_K_diag(self.iComponent_list,
                                                jnp.asarray(X))


KernelComponenent = KernelComponent  # reference-typo alias


def get_list_representation(kernel: OAKKernel, num_dims: int,
                            share_var_across_orders: bool = True):
    """(selected_dims, [KernelComponent]) — reference oak_kernel.py:338-364."""
    selected_dims = component_index_tuples(num_dims, kernel.max_interaction_depth)
    components = [KernelComponent(kernel, dims, share_var_across_orders)
                  for dims in selected_dims]
    return selected_dims, components
