"""Masked inpainting.

Reference parity: `imageProcessing/inpainting.h:46,100,178` —
nearest-neighbor fill and first-order diffusion inpainting of masked pixels.

TPU design: both are fixed-point sweeps of neighborhood reductions
(`lax.while_loop` of min-distance propagation / Jacobi diffusion) — no
queues or pointer chasing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _neighbors(x, fill):
    H, W = x.shape[:2]
    outs = []
    for di, dj in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
        pads = ((max(0, -di), max(0, di)), (max(0, -dj), max(0, dj))) \
            + ((0, 0),) * (x.ndim - 2)
        p = jnp.pad(x, pads, constant_values=fill)
        outs.append(p[max(0, di):max(0, di) + H, max(0, dj):max(0, dj) + W])
    return outs


def nearest_neighbor_inpainting(img: jnp.ndarray, mask: jnp.ndarray,
                                max_iters: int | None = None) -> jnp.ndarray:
    """Fill mask==True pixels with the value of the nearest (L1) valid
    pixel, propagating one ring per sweep (`inpainting.h:46`)."""
    x = img.astype(jnp.float32)
    H, W = x.shape[:2]
    m = jnp.broadcast_to(mask, (H, W))
    dist = jnp.where(m, jnp.inf, 0.0)
    val = jnp.where(m[..., None] if x.ndim == 3 else m, 0.0, x)

    def cond(state):
        dist, val, it = state
        return jnp.any(jnp.isinf(dist)) & (it < (max_iters or H + W))

    def body(state):
        dist, val, it = state
        nd = _neighbors(dist, jnp.inf)
        nv = _neighbors(val, 0.0)
        best_d = dist
        best_v = val
        for d, v in zip(nd, nv):
            better = d + 1.0 < best_d
            best_d = jnp.where(better, d + 1.0, best_d)
            bm = better[..., None] if val.ndim == 3 else better
            best_v = jnp.where(bm, v, best_v)
        return best_d, best_v, it + 1

    _, val, _ = jax.lax.while_loop(cond, body, (dist, val, jnp.int32(0)))
    return val


def diffusion_inpainting(img: jnp.ndarray, mask: jnp.ndarray,
                         iters: int = 200) -> jnp.ndarray:
    """First-order (Laplace) diffusion fill: masked pixels converge to the
    average of their neighbors (`inpainting.h:100,178`)."""
    x = img.astype(jnp.float32)
    init = nearest_neighbor_inpainting(x, mask)
    m = mask if x.ndim == 2 else jnp.broadcast_to(mask[..., None], x.shape)

    def body(_, cur):
        n = _neighbors(cur, 0.0)
        cnt = _neighbors(jnp.ones_like(cur), 0.0)
        avg = sum(n) / jnp.maximum(sum(cnt), 1.0)
        return jnp.where(m, avg, x)

    return jax.lax.fori_loop(0, iters, body, init)
