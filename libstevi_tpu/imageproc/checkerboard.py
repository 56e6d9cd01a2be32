"""Checkerboard (calibration target) detection.

Reference parity: `imageProcessing/checkBoardDetection.h` (1532 LoC) —
corner candidates from checkerboard response filters
(`checkBoardCornersCandidates:870`), candidate filtering (:1003), grid
growing (`isolateCheckBoard:259`), subpixel corner refinement via a local
corner model fit (`fitCheckboardCornerCenterModelOptParameters:1086`), and
hierarchical refinement (:1412,1490).

TPU design: the response filter and subpixel refinement are dense
vectorized ops; grid growing is host-side combinatorial logic on the small
candidate set (as in the reference's std::vector processing).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp


def checkerboard_response(image: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
    """Saddle-point response: |Ixy|-dominant second-derivative pattern.
    Checkerboard corners are saddles of the intensity surface: the response
    combines the cross second derivative against the axial ones over a
    smoothed image (the reference's response filters, :870)."""
    from .filters import gaussian_blur
    x = gaussian_blur(image.astype(jnp.float32), radius / 2.0, radius)
    # second derivatives via central differences
    dxx = jnp.roll(x, -1, 1) - 2 * x + jnp.roll(x, 1, 1)
    dyy = jnp.roll(x, -1, 0) - 2 * x + jnp.roll(x, 1, 0)
    dxy = (jnp.roll(jnp.roll(x, -1, 0), -1, 1)
           - jnp.roll(jnp.roll(x, -1, 0), 1, 1)
           - jnp.roll(jnp.roll(x, 1, 0), -1, 1)
           + jnp.roll(jnp.roll(x, 1, 0), 1, 1)) / 4.0
    # saddle measure: negative Hessian determinant
    return dxy * dxy - dxx * dyy


def checkerboard_corner_candidates(image: jnp.ndarray, radius: int = 4,
                                   n_max: int = 256,
                                   rel_threshold: float = 0.2):
    """Top candidate corners (x, y float coords) by response NMS
    (`checkBoardCornersCandidates`, :870)."""
    from ..sparse.nms import non_local_maximum_point_selection
    resp = checkerboard_response(image, radius)
    thr = rel_threshold * jnp.max(resp)
    coords, vals, valid = non_local_maximum_point_selection(
        resp, float(radius), n_max, thr)
    return coords, vals, valid


def refine_checkerboard_corners(image: jnp.ndarray, coords: jnp.ndarray,
                                radius: int = 3, iters: int = 20
                                ) -> jnp.ndarray:
    """Subpixel saddle-point fit: within a window, solve the quadratic
    surface and step to its saddle (`fitCheckboardCornerCenterModelOpt
    Parameters`, :1086; `refineCheckBoardCorners`, :1451).  coords are
    (N, 2) [x, y]; returns refined float coords."""
    from ..ops.refinement import _PATCH_PINV  # 3x3 quadratic pseudo-inverse
    x = image.astype(jnp.float32)
    H, W = x.shape
    pad = jnp.pad(x, 1, mode="edge")

    def refine_one(c):
        cj = jnp.clip(jnp.round(c[0]).astype(jnp.int32), 1, W - 2)
        ci = jnp.clip(jnp.round(c[1]).astype(jnp.int32), 1, H - 2)
        patch = jax.lax.dynamic_slice(pad, (ci, cj), (3, 3))
        L = patch.reshape(9)
        fit = jnp.asarray(_PATCH_PINV) @ L
        a, b, cq, d, e = fit[0], fit[1], fit[2], fit[3], fit[4]
        det = 4 * a * cq - b * b
        det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        di = (-2 * cq * d + b * e) / det
        dj = (b * d - 2 * a * e) / det
        ok = (jnp.abs(di) < 1) & (jnp.abs(dj) < 1)
        return jnp.stack([c[0] + jnp.where(ok, dj, 0.0),
                          c[1] + jnp.where(ok, di, 0.0)])

    return jax.vmap(refine_one)(coords.astype(jnp.float32))


@dataclass
class CheckBoard:
    """Detected grid: (rows, cols, 2) float [x, y] corner positions."""

    corners: np.ndarray


def isolate_checkerboard(coords: np.ndarray, tol: float = 0.25
                         ) -> CheckBoard | None:
    """Grid growing (`isolateCheckBoard`, :259): host-side — seed from the
    most central candidate, find its nearest neighbors to define the two
    lattice vectors, then greedily extend the lattice while candidates fall
    within ``tol`` of the predicted positions."""
    pts = np.asarray(coords, np.float64)
    if len(pts) < 4:
        return None
    center = pts.mean(0)
    seed = int(np.argmin(((pts - center) ** 2).sum(1)))
    d = np.linalg.norm(pts - pts[seed], axis=1)
    d[seed] = np.inf
    n1 = int(np.argmin(d))
    v1 = pts[n1] - pts[seed]
    # second lattice vector: most orthogonal nearby candidate
    scores = []
    for k in range(len(pts)):
        if k in (seed, n1):
            scores.append(np.inf)
            continue
        v = pts[k] - pts[seed]
        cosang = abs(v @ v1) / (np.linalg.norm(v) * np.linalg.norm(v1))
        scores.append(np.linalg.norm(v) * (1 + 4 * cosang))
    n2 = int(np.argmin(scores))
    v2 = pts[n2] - pts[seed]

    step = max(np.linalg.norm(v1), np.linalg.norm(v2))

    def find(p):
        dd = np.linalg.norm(pts - p, axis=1)
        k = int(np.argmin(dd))
        return k if dd[k] < tol * step else -1

    # assign lattice coordinates by BFS over predicted positions
    grid = {(0, 0): seed}
    frontier = [(0, 0)]
    while frontier:
        (a, b) = frontier.pop()
        p0 = pts[grid[(a, b)]]
        for (da, db) in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            key = (a + da, b + db)
            if key in grid:
                continue
            k = find(p0 + da * v1 + db * v2)
            if k >= 0:
                grid[key] = k
                frontier.append(key)

    if len(grid) < 4:
        return None
    aa = [k[0] for k in grid]
    bb = [k[1] for k in grid]
    a0, a1 = min(aa), max(aa)
    b0, b1 = min(bb), max(bb)
    rows = a1 - a0 + 1
    cols = b1 - b0 + 1
    out = np.full((rows, cols, 2), np.nan)
    for (a, b), k in grid.items():
        out[a - a0, b - b0] = pts[k]
    return CheckBoard(out)


def detect_checkerboard(image: jnp.ndarray, radius: int = 4,
                        n_max: int = 256) -> CheckBoard | None:
    """Full pipeline: response -> NMS -> subpixel -> grid growing."""
    coords, vals, valid = checkerboard_corner_candidates(image, radius, n_max)
    coords = refine_checkerboard_corners(image, coords, radius)
    pts = np.asarray(coords)[np.asarray(valid)]
    return isolate_checkerboard(pts)
