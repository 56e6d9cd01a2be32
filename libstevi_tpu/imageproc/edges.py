"""Edge extraction and pixel rasterization of lines / triangles.

Reference parity: `imageProcessing/edgesDetection.h:39` (gradient-based edge
extraction), `imageProcessing/pixelsLines.h:33` (line rasterization) and
`imageProcessing/pixelsTriangles.h:47` (triangle rasterization with
barycentric weights).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def detect_edges(image: jnp.ndarray, low: float = 0.1, high: float = 0.3
                 ) -> jnp.ndarray:
    """Gradient-magnitude edges with non-maximum suppression along the
    gradient direction and double thresholding (`edgesDetection.h:39`)."""
    from .filters import gaussian_blur
    x = gaussian_blur(image.astype(jnp.float32), 1.0, 2)
    gy = jnp.gradient(x, axis=0)
    gx = jnp.gradient(x, axis=1)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)

    # quantize direction to 4 bins and compare against the two neighbors;
    # shifts pad with -inf (a jnp.roll would wrap the OPPOSITE border's
    # magnitudes into the comparison and suppress genuine border edges)
    a = (jnp.round(ang / (jnp.pi / 4)).astype(jnp.int32)) % 4
    shifts = [(0, 1), (1, 1), (1, 0), (1, -1)]

    def shifted(m, di, dj):
        pads = ((max(0, -di), max(0, di)), (max(0, -dj), max(0, dj)))
        pm = jnp.pad(m, pads, constant_values=-jnp.inf)
        H2, W2 = m.shape
        return pm[max(0, di):max(0, di) + H2, max(0, dj):max(0, dj) + W2]

    nmax = jnp.zeros_like(mag, dtype=bool)
    for k, (di, dj) in enumerate(shifts):
        fwd = shifted(mag, -di, -dj)
        bwd = shifted(mag, di, dj)
        keep = (mag >= fwd) & (mag >= bwd)
        nmax = jnp.where(a == k, keep, nmax)

    mx = jnp.max(mag)
    # a flat image (mx == 0) has NO edges — the relative thresholds with
    # >= would otherwise classify every pixel as strong
    strong = nmax & (mag >= high * mx) & (mx > 0)
    weak = nmax & (mag >= low * mx) & (mx > 0)
    # hysteresis to FIXED POINT: the whole connected weak chain survives
    # (a fixed number of dilation passes dropped weak pixels more than
    # that many steps from a strong seed; `edgesDetection.h:39`)
    from .morphology import dilation

    def body(state):
        s, _ = state
        grown = jnp.where(weak, jnp.maximum(s, dilation(s, radius=1)), s)
        return grown, jnp.any(grown != s)

    def cond(state):
        return state[1]

    s, _ = jax.lax.while_loop(cond, body,
                              (strong.astype(jnp.float32), jnp.bool_(True)))
    return s > 0.5


def rasterize_line(p0, p1) -> np.ndarray:
    """Integer pixels of the segment p0 -> p1 (row, col), Bresenham-style
    (`pixelsLines.h:33`)."""
    r0, c0 = int(round(p0[0])), int(round(p0[1]))
    r1, c1 = int(round(p1[0])), int(round(p1[1]))
    n = max(abs(r1 - r0), abs(c1 - c0)) + 1
    rr = np.round(np.linspace(r0, r1, n)).astype(np.int64)
    cc = np.round(np.linspace(c0, c1, n)).astype(np.int64)
    keep = np.ones(n, bool)
    keep[1:] = (rr[1:] != rr[:-1]) | (cc[1:] != cc[:-1])
    return np.stack([rr[keep], cc[keep]], 1)


def rasterize_triangle(v0, v1, v2, shape=None):
    """Pixels inside the triangle with their barycentric weights
    (`pixelsTriangles.h:47`).  Returns (pixels (N, 2), weights (N, 3))."""
    v = np.asarray([v0, v1, v2], np.float64)
    rmin = int(np.floor(v[:, 0].min()))
    rmax = int(np.ceil(v[:, 0].max()))
    cmin = int(np.floor(v[:, 1].min()))
    cmax = int(np.ceil(v[:, 1].max()))
    if shape is not None:
        rmin = max(rmin, 0); cmin = max(cmin, 0)
        rmax = min(rmax, shape[0] - 1); cmax = min(cmax, shape[1] - 1)
    rr, cc = np.meshgrid(np.arange(rmin, rmax + 1),
                         np.arange(cmin, cmax + 1), indexing="ij")
    p = np.stack([rr.ravel(), cc.ravel()], 1).astype(np.float64)
    d = (v[1, 0] - v[0, 0]) * (v[2, 1] - v[0, 1]) \
        - (v[2, 0] - v[0, 0]) * (v[1, 1] - v[0, 1])
    if abs(d) < 1e-12:
        return np.zeros((0, 2), np.int64), np.zeros((0, 3))
    w1 = ((p[:, 0] - v[0, 0]) * (v[2, 1] - v[0, 1])
          - (v[2, 0] - v[0, 0]) * (p[:, 1] - v[0, 1])) / d
    w2 = ((v[1, 0] - v[0, 0]) * (p[:, 1] - v[0, 1])
          - (p[:, 0] - v[0, 0]) * (v[1, 1] - v[0, 1])) / d
    w0 = 1.0 - w1 - w2
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    return (p[inside].astype(np.int64),
            np.stack([w0[inside], w1[inside], w2[inside]], 1))
