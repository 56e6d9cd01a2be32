"""Pixel <-> homogeneous image-coordinate transforms.

Reference parity: `geometry/imagecoordinates.h:32-159` —
`Image2HomogeneousCoordinates` ((pt - pp) / f with anchor sign flips) and
`Homogeneous2ImageCoordinates` (its inverse).  Points are (..., 2) [x, y]
arrays; f is a scalar or (2,) focal, pp the (2,) principal point.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class ImageAnchors(enum.Enum):
    TOP_LEFT = 0
    TOP_RIGHT = 1
    BOTTOM_LEFT = 2
    BOTTOM_RIGHT = 3


def _anchor_signs(anchor: ImageAnchors) -> jnp.ndarray:
    if anchor is ImageAnchors.TOP_LEFT:
        return jnp.asarray([1.0, 1.0])
    if anchor is ImageAnchors.TOP_RIGHT:
        return jnp.asarray([1.0, -1.0])
    if anchor is ImageAnchors.BOTTOM_LEFT:
        return jnp.asarray([-1.0, 1.0])
    return jnp.asarray([-1.0, -1.0])


def image_to_homogeneous(pt: jnp.ndarray, f, pp,
                         anchor: ImageAnchors = ImageAnchors.TOP_LEFT
                         ) -> jnp.ndarray:
    f = jnp.broadcast_to(jnp.asarray(f, jnp.float32), (2,)) \
        if jnp.ndim(f) == 0 else jnp.asarray(f, jnp.float32)
    pp = jnp.asarray(pp, jnp.float32)
    r = (pt - pp) / f
    return r * _anchor_signs(anchor)


def homogeneous_to_image(hom: jnp.ndarray, f, pp,
                         anchor: ImageAnchors = ImageAnchors.TOP_LEFT
                         ) -> jnp.ndarray:
    f = jnp.broadcast_to(jnp.asarray(f, jnp.float32), (2,)) \
        if jnp.ndim(f) == 0 else jnp.asarray(f, jnp.float32)
    pp = jnp.asarray(pp, jnp.float32)
    return hom * _anchor_signs(anchor) * f + pp
