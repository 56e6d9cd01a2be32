"""Generic RANSAC.

Reference parity: `optimization/generic_ransac.h:50-330` — templated
Model/Measure/SamplingStrategy RANSAC with OpenMP-parallel iterations and
per-thread RNG.

TPU design: all hypotheses are drawn up-front with `jax.random` (counter-
based, deterministic under a key) and fitted/scored as one `vmap` batch —
the OpenMP loop becomes a single batched kernel.  The best model (most
inliers, residual-sum tie-break) is selected with arithmetic; an optional
final refit on the winner's inliers uses the caller's fit function with a
weight vector (JAX requires static shapes, so the refit consumes inlier
WEIGHTS rather than a compacted subset).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp


@dataclass
class RansacResult:
    model: jnp.ndarray
    inliers: jnp.ndarray       # bool mask
    n_inliers: jnp.ndarray
    best_error: jnp.ndarray


def ransac(fit_fn: Callable, residual_fn: Callable, data, n_samples: int,
           n_iterations: int, threshold: float,
           key: jax.Array | None = None,
           refit_fn: Callable | None = None) -> RansacResult:
    """``fit_fn(subset_data) -> model``; ``residual_fn(model, data) -> (N,)``
    absolute residuals; ``refit_fn(data, weights) -> model`` (optional
    weighted refit on the winning inliers).

    `data` is a pytree whose leaves lead with the sample axis N.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    leaves = jax.tree_util.tree_leaves(data)
    N = leaves[0].shape[0]

    keys = jax.random.split(key, n_iterations)

    def hypothesis(k):
        idx = jax.random.choice(k, N, (n_samples,), replace=False)
        subset = jax.tree_util.tree_map(lambda a: a[idx], data)
        model = fit_fn(subset)
        res = jnp.abs(residual_fn(model, data))
        inl = res < threshold
        return model, inl.sum(), jnp.where(inl, res, 0.0).sum()

    models, counts, errs = jax.vmap(hypothesis)(keys)
    # most inliers; tie-break on lower inlier residual sum — selected
    # LEXICOGRAPHICALLY (a packed counts*1e9 - errs float score rounds
    # the residual term away entirely: the float32 ulp at 1e9 is 64)
    best = jnp.argmin(jnp.where(counts == counts.max(), errs, jnp.inf))
    model = jax.tree_util.tree_map(lambda m: m[best], models)
    res = jnp.abs(residual_fn(model, data))
    inliers = res < threshold
    if refit_fn is not None:
        model = refit_fn(data, inliers.astype(jnp.float32))
        res = jnp.abs(residual_fn(model, data))
        inliers = res < threshold
    return RansacResult(model=model, inliers=inliers,
                        n_inliers=inliers.sum(),
                        best_error=jnp.where(inliers, res, 0.0).sum())
