"""Newton-Girard elementary-symmetric-polynomial combination.

Given per-dimension gram matrices k_1..k_D (all [N, M], or diagonals [N]), the
OAK kernel needs the elementary symmetric polynomials

    e_0 = 1
    e_n = sum over all n-subsets S of prod_{i in S} k_i      (elementwise)

computed via the Newton-Girard identity with power sums s_p = sum_i k_i^p:

    e_n = (1/n) * sum_{p=1..n} (-1)^(p-1) e_{n-p} s_p

This is the reference's ``compute_additive_terms``
(/root/reference/oak/oak_kernel.py:223-249), re-architected for TPU: power sums
are accumulated one dimension at a time (peak memory (P+1) x N x M instead of
D x N x M) and everything is static-shape elementwise work that XLA fuses into
the surrounding gram construction. A brute-force enumerator is provided for
testing (mirrors tests/test_kernel_properties.py in the reference).
"""

from __future__ import annotations

import itertools
from typing import List, Sequence

import jax.numpy as jnp


def power_sums(grams: Sequence[jnp.ndarray], depth: int) -> List[jnp.ndarray]:
    """s_p = sum_i grams[i]**p for p = 1..depth, accumulated dimension-major.

    Avoids materializing the [D, ...] stack: each gram contributes its powers
    (computed by repeated multiplication, not ``pow``) and is then dead.
    """
    s = [None] * depth
    for g in grams:
        gp = g
        for p in range(depth):
            s[p] = gp if s[p] is None else s[p] + gp
            if p + 1 < depth:
                gp = gp * g
    return s


def newton_girard_from_power_sums(s: Sequence[jnp.ndarray],
                                  depth: int) -> List[jnp.ndarray]:
    """[e_0, ..., e_depth] from precomputed power sums s_1..s_depth.

    Split out of ``newton_girard`` so callers that can produce the power
    sums more efficiently than a per-dimension Python loop (e.g. a stacked
    [D, N] buffer reduced with ``(stack**p).sum(0)`` — see
    ``OAKKernel.K_diag``) reuse the identical e-recursion."""
    ones = jnp.ones_like(s[0])
    e = [ones]
    for n in range(1, depth + 1):
        acc = None
        for p in range(1, n + 1):
            term = e[n - p] * s[p - 1] if n - p > 0 else s[p - 1]
            term = term if p % 2 == 1 else -term
            acc = term if acc is None else acc + term
        e.append(acc / n)
    return e


def newton_girard(grams: Sequence[jnp.ndarray], depth: int) -> List[jnp.ndarray]:
    """[e_0, ..., e_depth], each shaped like grams[0]."""
    grams = list(grams)
    if not grams:
        raise ValueError("need at least one gram")
    return newton_girard_from_power_sums(power_sums(grams, depth), depth)


def newton_girard_stacked(stack: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Same, from a stacked [D, ...] array; returns [depth+1, ...]."""
    e = newton_girard(list(stack), depth)
    return jnp.stack(e, axis=0)


def elementary_symmetric_bruteforce(grams: Sequence[jnp.ndarray], depth: int) -> List[jnp.ndarray]:
    """O(C(D, n)) direct enumeration, for tests only."""
    grams = list(grams)
    out = [jnp.ones_like(grams[0])]
    for n in range(1, depth + 1):
        acc = jnp.zeros_like(grams[0])
        for combo in itertools.combinations(range(len(grams)), n):
            prod = grams[combo[0]]
            for i in combo[1:]:
                prod = prod * grams[i]
            acc = acc + prod
        out.append(acc)
    return out
