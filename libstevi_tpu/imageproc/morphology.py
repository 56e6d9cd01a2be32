"""Morphological operators.

Reference parity: `imageProcessing/morphologicalOperators.h:40-321` —
erosion/dilation with rectangular or circular structuring elements,
opening/closing, min/max/median feature reductions and the median filter.

TPU design: rectangular elements use `reduce_window` min/max; arbitrary
elements enumerate their offsets as shifted slices (static loop); the median
filter sorts the stacked window samples along a new axis.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def circular_structuring_element(radius: int) -> np.ndarray:
    d = np.arange(-radius, radius + 1)
    ii, jj = np.meshgrid(d, d, indexing="ij")
    return (ii * ii + jj * jj) <= radius * radius


def _offsets(element: np.ndarray):
    r0 = (element.shape[0] - 1) // 2
    r1 = (element.shape[1] - 1) // 2
    return [(i - r0, j - r1) for i, j in np.argwhere(element)]


def _shifted(img: jnp.ndarray, di: int, dj: int, fill) -> jnp.ndarray:
    H, W = img.shape[:2]
    pad_width = ((max(0, -di), max(0, di)), (max(0, -dj), max(0, dj))) \
        + ((0, 0),) * (img.ndim - 2)
    p = jnp.pad(img, pad_width, constant_values=fill)
    return p[max(0, di):max(0, di) + H, max(0, dj):max(0, dj) + W]


def erosion(img: jnp.ndarray, element=None, radius: int = 1) -> jnp.ndarray:
    """Min over the structuring element (rectangular (2r+1)^2 default)."""
    x = img.astype(jnp.float32)
    if element is None:
        w = 2 * radius + 1
        win = (w, w) + (1,) * (x.ndim - 2)
        return jax.lax.reduce_window(x, jnp.inf, jax.lax.min, win,
                                     (1,) * x.ndim, "SAME")
    out = None
    for di, dj in _offsets(np.asarray(element)):
        s = _shifted(x, di, dj, jnp.inf)
        out = s if out is None else jnp.minimum(out, s)
    return out


def dilation(img: jnp.ndarray, element=None, radius: int = 1) -> jnp.ndarray:
    x = img.astype(jnp.float32)
    if element is None:
        w = 2 * radius + 1
        win = (w, w) + (1,) * (x.ndim - 2)
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, win,
                                     (1,) * x.ndim, "SAME")
    out = None
    for di, dj in _offsets(np.asarray(element)):
        s = _shifted(x, -di, -dj, -jnp.inf)
        out = s if out is None else jnp.maximum(out, s)
    return out


def opening(img: jnp.ndarray, element=None, radius: int = 1) -> jnp.ndarray:
    return dilation(erosion(img, element, radius), element, radius)


def closing(img: jnp.ndarray, element=None, radius: int = 1) -> jnp.ndarray:
    return erosion(dilation(img, element, radius), element, radius)


def median_filter(img: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Window median with edge-clamped borders
    (`morphologicalOperators.h` median reduction)."""
    x = img.astype(jnp.float32)
    H, W = x.shape[:2]
    pads = ((radius, radius), (radius, radius)) + ((0, 0),) * (x.ndim - 2)
    p = jnp.pad(x, pads, mode="edge")
    stack = []
    w = 2 * radius + 1
    for di in range(w):
        for dj in range(w):
            stack.append(p[di:di + H, dj:dj + W])
    s = jnp.stack(stack, 0)
    k = s.shape[0] // 2
    return jnp.sort(s, 0)[k]
