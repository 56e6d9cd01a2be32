"""Left/right covering statistics (occlusion-consistency metric).

Reference parity: `statistics/stereo_covering.h:31,88` — `computeCovering`:
each target pixel votes its (fractionally split) weight into the source
column it maps to under the target disparity; `computeCoveringProportion`
counts pixels whose accumulated covering reaches a threshold.

Note: the reference splits the fractional weight as ``propLow = sourcePix -
higher`` / ``propHigh = 1 - propLow`` (`stereo_covering.h:69-71`), which is
negative on the low bin for non-integer positions; the split is replicated
verbatim (it sums to 1 and is exact for integer disparities).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import DispDirection


def compute_covering(disp_l: jnp.ndarray, disp_r: jnp.ndarray,
                     direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
                     disp_scaling: float = 1.0, disp_offset: float = 0.0
                     ) -> jnp.ndarray:
    """Covering mask over the SOURCE image (source = right for
    RIGHT_TO_LEFT)."""
    sign = direction.delta_sign
    if direction is DispDirection.RIGHT_TO_LEFT:
        target = disp_l.astype(jnp.float32)
    else:
        target = disp_r.astype(jnp.float32)
    H, W = target.shape

    jj = jnp.arange(W, dtype=jnp.float32)[None, :]
    source_pix = jj - sign * disp_scaling * (target - disp_offset)
    lower = jnp.floor(source_pix).astype(jnp.int32)
    higher = jnp.ceil(source_pix).astype(jnp.int32)
    prop_low = source_pix - higher.astype(jnp.float32)
    prop_high = 1.0 - prop_low

    mask = jnp.zeros((H, W), jnp.float32)
    rows = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None], (H, W))

    lo_ok = (lower >= 0) & (lower < W)
    hi_ok = (higher >= 0) & (higher < W)
    mask = mask.at[rows, jnp.clip(lower, 0, W - 1)].add(
        jnp.where(lo_ok, prop_low, 0.0))
    mask = mask.at[rows, jnp.clip(higher, 0, W - 1)].add(
        jnp.where(hi_ok, prop_high, 0.0))
    return mask


def compute_covering_proportion(disp_l: jnp.ndarray, disp_r: jnp.ndarray,
                                covering_threshold: float = 0.5,
                                direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
                                disp_scaling: float = 1.0,
                                disp_offset: float = 0.0) -> jnp.ndarray:
    cov = compute_covering(disp_l, disp_r, direction, disp_scaling,
                           disp_offset)
    return jnp.mean((cov >= covering_threshold).astype(jnp.float32))
