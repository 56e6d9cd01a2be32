"""Keypoint orientation by intensity centroid.

Reference parity: `sparseMatching/pointsOrientation.h:58-146` —
`intensityOrientedCoordinates`: the main direction of a keypoint is the
normalized intensity-weighted centroid of the (2r+1)^2 window offsets
(out-of-image samples weigh 0; multichannel images sum over channels).

TPU design: batched over keypoints with vmap — each keypoint gathers its
window via dynamic slicing of a padded image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def intensity_oriented_coordinates(coords: jnp.ndarray, img: jnp.ndarray,
                                   search_radius: int = 3) -> jnp.ndarray:
    """coords: (N, 2) int (row, col).  Returns (N, 2) unit direction vectors
    (d_row, d_col)."""
    r = search_radius
    x = img.astype(jnp.float32)
    if x.ndim == 3:
        x = jnp.sum(x, -1)
    H, W = x.shape
    pad = jnp.pad(x, r)  # zero pad == out-of-image weight 0

    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)

    def one(c):
        win = jax.lax.dynamic_slice(pad, (c[0], c[1]),
                                    (2 * r + 1, 2 * r + 1))
        wi = jnp.sum(win * offs[:, None])
        wj = jnp.sum(win * offs[None, :])
        v = jnp.stack([wi, wj])
        n = jnp.linalg.norm(v)
        return v / jnp.where(n > 0, n, 1.0)

    return jax.vmap(one)(coords.astype(jnp.int32))
