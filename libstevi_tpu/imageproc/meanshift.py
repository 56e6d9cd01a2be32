"""Mean-shift clustering over image feature space.

Reference parity: `imageProcessing/meanShiftClustering.h:67` —
`meanShiftClustering`: iterate each feature vector toward the
kernel-weighted mean of all vectors within the bandwidth.

TPU design: all points shift simultaneously per iteration; the pairwise
kernel is one (N, N) matmul-shaped computation per step (batched on the
MXU), with a fixed iteration count for jit.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp


def mean_shift_clustering(features: jnp.ndarray, bandwidth: float,
                          iters: int = 30, merge_tol: float | None = None):
    """features: (N, F).  Returns (modes (N, F), labels (N,)) where labels
    group points whose modes coincide within merge_tol (default
    bandwidth/2)."""
    x = features.astype(jnp.float32)
    pts = x

    def body(_, cur):
        d2 = jnp.sum((cur[:, None, :] - x[None, :, :]) ** 2, -1)
        w = jnp.exp(-d2 / (2.0 * bandwidth * bandwidth))
        return (w @ x) / jnp.sum(w, -1, keepdims=True)

    modes = jax.lax.fori_loop(0, iters, body, pts)

    tol = bandwidth / 2.0 if merge_tol is None else merge_tol
    d2 = jnp.sum((modes[:, None, :] - modes[None, :, :]) ** 2, -1)
    same = d2 <= tol * tol
    # transitively close the proximity relation before labeling: chains
    # of modes within tolerance must share ONE canonical label (argmax
    # of the raw relation can name a point that itself carries a
    # different label).  log2(n) squarings of the boolean adjacency.
    n = same.shape[0]
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))))
    closed = same

    def _close(_, m):
        return (m @ m.astype(jnp.float32) > 0) | m

    closed = jax.lax.fori_loop(0, steps, _close, closed)
    labels = jnp.argmax(closed, axis=1)
    return modes, labels
