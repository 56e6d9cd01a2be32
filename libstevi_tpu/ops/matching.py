"""Scalar feature-comparison kernels, vectorized over the feature axis.

Reference parity: `correlation/matching_costs.h` — `dotProduct` (:60),
`SumSquareDiff` (:101), `SumAbsDiff` (:137), `MedianAbsDiff` (:182, which is
`std::nth_element` at index F/2, i.e. the *upper* median for even F),
`hammingScalar`/`hammingDistance` (:237,253 — popcount of xor), and
`KernelBasedMututalInformation` (:279 — KDE with per-vector Gaussian kernels
of bandwidth (max-min)/n).

Every kernel maps (..., F) x (..., F) -> (...) and is pure VPU work; the
cost-volume builder (`cost_volume.py`) routes the dot-product family through
the MXU instead and only falls back to these for the non-decomposable
functions (MEDAD/ZMEDAD, KERMI) and for Hamming.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import MatchingFunction, MATCH_TRAITS


def dot_product(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(source * target, axis=-1)


def sum_square_diff(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = source - target
    return jnp.sum(d * d, axis=-1)


def sum_abs_diff(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.abs(source - target), axis=-1)


def median_abs_diff(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Upper median of |s - t| (reference uses nth_element at F/2,
    `matching_costs.h:190-203`)."""
    diffs = jnp.abs(source - target)
    k = diffs.shape[-1] // 2
    return jnp.sort(diffs, axis=-1)[..., k]


def hamming_distance(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Popcount of xor, summed over census words (`matching_costs.h:237-263`)."""
    x = jnp.bitwise_xor(source.astype(jnp.uint32), target.astype(jnp.uint32))
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


def kernel_mutual_information(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """KDE-based mutual information score (`matching_costs.h:279-341`).

    O(F^2) per pixel via outer difference matrices; bandwidth is
    (max - min) / F per vector as in the reference.
    """
    n = source.shape[-1]
    s = source.astype(jnp.float32)
    t = target.astype(jnp.float32)

    s_std = (jnp.max(s, -1) - jnp.min(s, -1)) / n
    t_std = (jnp.max(t, -1) - jnp.min(t, -1)) / n

    ds = (s[..., :, None] - s[..., None, :]) / s_std[..., None, None]
    dt = (t[..., :, None] - t[..., None, :]) / t_std[..., None, None]
    ks = jnp.exp(-ds * ds)  # (..., F, F)
    kt = jnp.exp(-dt * dt)

    p_source = jnp.sum(ks, axis=-1)              # (..., F)
    p_target = jnp.sum(kt, axis=-1)
    p_joint = jnp.sum(ks * kt, axis=-1)
    p_joint_ind = p_source * p_target / n
    return jnp.sum(p_joint * jnp.log(p_joint / p_joint_ind), axis=-1)


_KERNELS = {
    "dot": dot_product,
    "ssd": sum_square_diff,
    "sad": sum_abs_diff,
    "medad": median_abs_diff,
    "hamming": hamming_distance,
    "kermi": kernel_mutual_information,
}


def feature_comparison(func: MatchingFunction, source: jnp.ndarray,
                       target: jnp.ndarray) -> jnp.ndarray:
    """`MatchingFunctionTraits<f>::featureComparison` applied along the last
    axis.  Inputs must already be normalized per the function's traits (the
    reference normalizes the feature volume first, see
    `cross_correlations.h:647-722`)."""
    return _KERNELS[MATCH_TRAITS[func].kernel](source, target)


def compare_feature_volumes(func: MatchingFunction, source_fv: jnp.ndarray,
                            target_fv: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel comparison of two aligned (H, W, F) feature volumes."""
    return feature_comparison(func, source_fv, target_fv)
