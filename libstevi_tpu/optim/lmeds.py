"""Least-median-of-absolute-residuals (LMedS) solvers.

Reference parity: `optimization/leastmedianoptimization.h` —
`leastAbsoluteMedian` (:38,119: enumerate dimsIn-element subsets via
`ChooseInSetIndexer`, solve each exactly, keep the solution with the lowest
median absolute residual) and `affineBestLeastMedianApproximation`
(:180,204; the MEDAD/ZMEDAD barycentric hook, optionally restricted to
caller-supplied test subsets).

TPU design: subset enumeration is static (itertools at trace time, capped),
the per-subset exact solves and residual medians are one `vmap` batch — a
batched small-matrix solve on the MXU instead of the reference's sequential
loop.
"""

from __future__ import annotations

import itertools

import numpy as np
import jax
import jax.numpy as jnp

_MAX_SUBSETS = 512


def _subsets(n: int, k: int, cap: int = _MAX_SUBSETS) -> np.ndarray:
    """All k-subsets when they fit under ``cap``; otherwise ``cap``
    subsets sampled uniformly with a fixed seed.  A lexicographic PREFIX
    would put the first rows in every subset — one outlier there would
    then contaminate every candidate model, defeating LMedS entirely."""
    import math
    total = math.comb(n, k)
    if total <= cap:
        return np.asarray(list(itertools.combinations(range(n), k)),
                          np.int32)
    rng = np.random.default_rng(0)
    picks = {tuple(np.sort(rng.choice(n, k, replace=False)))
             for _ in range(2 * cap)}
    combos = sorted(picks)[:cap]
    return np.asarray(combos, np.int32)


def _median_abs(r: jnp.ndarray) -> jnp.ndarray:
    """Upper median (nth_element at n/2), matching `MedianAbsDiff`."""
    k = r.shape[-1] // 2
    return jnp.sort(jnp.abs(r), axis=-1)[..., k]


def least_absolute_median(A: jnp.ndarray, b: jnp.ndarray,
                          subsets: np.ndarray | None = None) -> jnp.ndarray:
    """argmin_x median(|Ax - b|) by exact subset solves
    (`leastAbsoluteMedian`, `leastmedianoptimization.h:38-178`)."""
    n, k = A.shape
    if subsets is None:
        subsets = _subsets(n, k)
    idx = jnp.asarray(subsets)
    square = subsets.shape[1] == k

    def solve_subset(sub):
        As = A[sub]
        bs = b[sub]
        if square:
            x = jnp.linalg.solve(As + 1e-12 * jnp.eye(k), bs)
        else:
            # caller-supplied sets larger than the unknown count (e.g. the
            # sliding-sub-window sets of `unfold_sliding_subwindow_idxs`)
            # are solved least-squares, per `leastmedianoptimization.h:152`
            # ("reuse the least square solver")
            x = jnp.linalg.lstsq(As, bs)[0]
        return x, _median_abs(A @ x - b)

    xs, meds = jax.vmap(solve_subset)(idx)
    best = jnp.argmin(meds)
    return xs[best]


def affine_best_least_median_approximation(A: jnp.ndarray, b: jnp.ndarray,
                                           subsets: np.ndarray | None = None
                                           ) -> jnp.ndarray:
    """LMedS with the sum(x) == 1 constraint
    (`affineBestLeastMedianApproximation`,
    `leastmedianoptimization.h:180-221`)."""
    from .lsq import _affine_parts, _full_coeffs
    M, b0 = _affine_parts(A)
    alpha = least_absolute_median(M, b - b0, subsets)
    return _full_coeffs(alpha)
