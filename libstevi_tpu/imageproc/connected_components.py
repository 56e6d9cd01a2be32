"""Connected-component labeling and per-cluster statistics.

Reference parity: `imageProcessing/connectedComponents.h:40-416` — N-d
component labeling over a boolean mask with a chosen contiguity (Queen /
Rook, `utils/contiguity.h:26-143`) plus per-cluster stats (size, centroid,
bounding axes, mean value).

TPU design: label propagation as iterated min-pooling over the contiguity
neighborhood (label = min neighbor label among foreground), run to a fixed
point with `lax.while_loop` — O(diameter) sweeps of pure VPU work, no
union-find pointer chasing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def connected_components(mask: jnp.ndarray, contiguity: str = "queen",
                         max_iters: int | None = None) -> jnp.ndarray:
    """Label foreground pixels of a 2-D bool mask; background gets -1.
    Labels are the flat index of each component's first (row-major) pixel,
    relabeled to consecutive ints by `relabel_consecutive` if needed."""
    H, W = mask.shape
    m = mask.astype(bool)
    init = jnp.where(m, jnp.arange(H * W, dtype=jnp.int32).reshape(H, W),
                     jnp.int32(H * W))

    if contiguity == "queen":
        offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                   (1, -1), (1, 0), (1, 1)]
    elif contiguity == "rook":
        offsets = [(-1, 0), (0, -1), (0, 1), (1, 0)]
    elif contiguity == "bishop":
        offsets = [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    else:
        raise ValueError(contiguity)

    big = jnp.int32(H * W)

    def sweep(labels):
        best = labels
        for di, dj in offsets:
            p = jnp.pad(labels, ((max(0, -di), max(0, di)),
                                 (max(0, -dj), max(0, dj))),
                        constant_values=big)
            n = p[max(0, di):max(0, di) + H, max(0, dj):max(0, dj) + W]
            best = jnp.minimum(best, n)
        return jnp.where(m, best, big)

    def cond(state):
        labels, changed, it = state
        cap = H * W if max_iters is None else max_iters
        return changed & (it < cap)

    def body(state):
        labels, _, it = state
        new = sweep(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True),
                                                   jnp.int32(0)))
    return jnp.where(m, labels, -1)


def relabel_consecutive(labels: jnp.ndarray):
    """Host-side relabeling to consecutive component ids (0..k-1) — one
    vectorized searchsorted pass (a per-component full-image scan is
    O(k*H*W) with thousands of components)."""
    import numpy as np
    lab = np.asarray(labels)
    uniq = np.unique(lab[lab >= 0])
    out = np.full(lab.shape, -1, np.int32)
    fg = lab >= 0
    out[fg] = np.searchsorted(uniq, lab[fg]).astype(np.int32)
    return out, len(uniq)


def cluster_stats(labels: jnp.ndarray, values: jnp.ndarray | None = None):
    """Per-cluster size, centroid, mean value and bbox
    (`connectedComponents.h` cluster statistics) — one vectorized
    bincount pass over the label map instead of a per-cluster
    full-image rescan."""
    import numpy as np
    lab, k = relabel_consecutive(labels)
    H, W = lab.shape
    fg = lab >= 0
    ids = lab[fg]
    iy, ix = np.nonzero(fg)
    sizes = np.bincount(ids, minlength=k)
    cy = np.bincount(ids, weights=iy, minlength=k) / sizes
    cx = np.bincount(ids, weights=ix, minlength=k) / sizes
    if values is not None:
        mv = np.bincount(ids, weights=np.asarray(values)[fg],
                         minlength=k) / sizes
    big = np.iinfo(np.int64).max
    y0 = np.full(k, big); x0 = np.full(k, big)
    y1 = np.full(k, -1); x1 = np.full(k, -1)
    np.minimum.at(y0, ids, iy); np.minimum.at(x0, ids, ix)
    np.maximum.at(y1, ids, iy); np.maximum.at(x1, ids, ix)
    return [{"size": int(sizes[c]),
             "centroid": (float(cy[c]), float(cx[c])),
             "mean": float(mv[c]) if values is not None else None,
             "bbox": (int(y0[c]), int(x0[c]), int(y1[c]), int(x1[c]))}
            for c in range(k)]
