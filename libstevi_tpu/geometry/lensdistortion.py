"""Brown lens-distortion model and single-camera image rectifier.

Reference parity: `geometry/lensdistortion.h` — `radialDistortion` (:35,
(k1 r^2 + k2 r^4 + k3 r^6) * pos), `tangentialDistortion` (:48),
`skewDistortion` (:163, x += B1*hx + B2*hy applied in pixel space),
Newton/fixed-point inverses (:63,117; 5 iterations by default),
`fullLensDistortionHomogeneousCoordinates` (:215) and its inverse (:260),
and `ImageRectifier` (:308; Minimal/Maximal/Same ROI + dense backward map).

TPU design: everything broadcasts over (..., 2) point arrays; the Newton
inverses are `lax.fori_loop`s with static iteration counts (jit-stable), and
the rectifier's backward map is one vectorized evaluation over the pixel
grid — gather-free; the actual resampling uses `interpolation.interpolate_image`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .imagecoordinates import (ImageAnchors, image_to_homogeneous,
                               homogeneous_to_image)


def radial_distortion(pos: jnp.ndarray, k123) -> jnp.ndarray:
    """(..., 2) homogeneous positions -> radial displacement."""
    k123 = jnp.asarray(k123, jnp.float32)
    r2 = jnp.sum(pos * pos, -1, keepdims=True)
    dr = k123[0] * r2 + k123[1] * r2 * r2 + k123[2] * r2 * r2 * r2
    return dr * pos


def tangential_distortion(pos: jnp.ndarray, t12) -> jnp.ndarray:
    t12 = jnp.asarray(t12, jnp.float32)
    x, y = pos[..., 0], pos[..., 1]
    r2 = x * x + y * y
    dx = t12[1] * (r2 + 2 * x * x) + 2 * t12[0] * x * y
    dy = t12[0] * (r2 + 2 * y * y) + 2 * t12[1] * x * y
    return jnp.stack([dx, dy], -1)


def skew_distortion(pos: jnp.ndarray, B12, f, pp) -> jnp.ndarray:
    """Homogeneous -> pixel coordinates with skew terms
    (`skewDistortion`, `lensdistortion.h:163-174`)."""
    B12 = jnp.asarray(B12, jnp.float32)
    r = homogeneous_to_image(pos, f, pp)
    dx = B12[0] * pos[..., 0] + B12[1] * pos[..., 1]
    return r.at[..., 0].add(dx)


def inverse_skew_distortion(pos: jnp.ndarray, B12, f, pp) -> jnp.ndarray:
    B12 = jnp.asarray(B12, jnp.float32)
    f = jnp.broadcast_to(jnp.asarray(f, jnp.float32), (2,)) \
        if jnp.ndim(f) == 0 else jnp.asarray(f, jnp.float32)
    pp = jnp.asarray(pp, jnp.float32)
    y = (pos[..., 1] - pp[1]) / f[1]
    x = (pos[..., 0] - B12[1] * y - pp[0]) / (f[0] + B12[0])
    return jnp.stack([x, y], -1)


def invert_radial_distortion(pos: jnp.ndarray, k123, iters: int = 5) -> jnp.ndarray:
    """Newton iteration on the radius (`invertRadialDistorstion`,
    `lensdistortion.h:63-82`)."""
    k123 = jnp.asarray(k123, jnp.float32)
    k1, k2, k3 = k123[0], k123[1], k123[2]
    rb = jnp.linalg.norm(pos, axis=-1)

    def body(_, r):
        num = r + k1 * r ** 3 + k2 * r ** 5 + k3 * r ** 7 - rb
        den = 1 + 3 * k1 * r ** 2 + 5 * k2 * r ** 4 + 7 * k3 * r ** 6
        return r - num / den

    r = jax.lax.fori_loop(0, iters, body, rb)
    scale = jnp.where(rb > 0, r / jnp.where(rb > 0, rb, 1.0), 1.0)
    return pos * scale[..., None]


def invert_radial_tangential_distortion(pos: jnp.ndarray, k123, t12,
                                        iters: int = 5) -> jnp.ndarray:
    """2-D Newton on the combined forward model
    (`invertRadialTangentialDistorstion`, `lensdistortion.h:117-160`)."""
    k123 = jnp.asarray(k123, jnp.float32)
    t12 = jnp.asarray(t12, jnp.float32)
    k1, k2, k3 = k123[0], k123[1], k123[2]
    t1, t2 = t12[0], t12[1]

    def body(_, npos):
        x, y = npos[..., 0], npos[..., 1]
        r2 = x * x + y * y
        dr = k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
        fx = x + x * dr + t2 * (r2 + 2 * x * x) + 2 * t1 * x * y - pos[..., 0]
        fy = y + y * dr + t1 * (r2 + 2 * y * y) + 2 * t2 * x * y - pos[..., 1]
        drdr2 = k1 + 2 * k2 * r2 + 3 * k3 * r2 ** 2
        drdx = 2 * drdr2 * x
        drdy = 2 * drdr2 * y
        a = 1 + dr + x * drdx + 6 * t2 * x + 2 * t1 * y
        b = 2 * t2 * y + 2 * t1 * x + x * drdy
        c = 2 * t2 * y + 2 * t1 * x + y * drdx
        d = 1 + dr + y * drdy + 6 * t1 * y + 2 * t2 * x
        det = a * d - b * c
        nx = x - (d * fx - b * fy) / det
        ny = y - (-c * fx + a * fy) / det
        return jnp.stack([nx, ny], -1)

    return jax.lax.fori_loop(0, iters, body, pos)


def invert_tangential_distortion(pos: jnp.ndarray, t12, iters: int = 5) -> jnp.ndarray:
    """(`invertTangentialDistorstion`, `lensdistortion.h:85-114`)."""
    t12 = jnp.asarray(t12, jnp.float32)
    t1, t2 = t12[0], t12[1]

    def body(_, npos):
        x, y = npos[..., 0], npos[..., 1]
        r2 = x * x + y * y
        fx = x + t2 * (r2 + 2 * x * x) + 2 * t1 * x * y - pos[..., 0]
        fy = y + t1 * (r2 + 2 * y * y) + 2 * t2 * x * y - pos[..., 1]
        a = 1 + 6 * t2 * x + 2 * t1 * y
        b = 2 * t2 * y + 2 * t1 * x
        c = b
        d = 1 + 6 * t1 * y + 2 * t2 * x
        det = a * d - b * c
        nx = x - (d * fx - b * fy) / det
        ny = y - (-c * fx + a * fy) / det
        return jnp.stack([nx, ny], -1)

    return jax.lax.fori_loop(0, iters, body, pos)


def full_lens_distortion_homogeneous(pos: jnp.ndarray, f, pp,
                                     k123=None, t12=None, B12=None
                                     ) -> jnp.ndarray:
    """Homogeneous coords -> distorted pixel coords
    (`fullLensDistortionHomogeneousCoordinates`, `lensdistortion.h:215-250`)."""
    m = pos
    if k123 is not None:
        m = m + radial_distortion(pos, k123)
    if t12 is not None:
        m = m + tangential_distortion(pos, t12)
    if B12 is not None:
        B12a = jnp.asarray(B12, jnp.float32)
        r = homogeneous_to_image(m, f, pp)
        dx = B12a[0] * m[..., 0] + B12a[1] * m[..., 1]
        return jnp.stack([r[..., 0] + dx, r[..., 1]], -1)
    return homogeneous_to_image(m, f, pp)


def invert_full_lens_distortion_homogeneous(pos: jnp.ndarray, f, pp,
                                            k123=None, t12=None, B12=None,
                                            iters: int = 5) -> jnp.ndarray:
    """Distorted pixel coords -> homogeneous coords
    (`invertFullLensDistortionHomogeneousCoordinates`,
    `lensdistortion.h:260-296`)."""
    if B12 is not None:
        inv = inverse_skew_distortion(pos, B12, f, pp)
    else:
        inv = image_to_homogeneous(pos, f, pp)
    if k123 is None and t12 is None:
        return inv
    if k123 is None:
        return invert_tangential_distortion(inv, t12, iters)
    if t12 is None:
        return invert_radial_distortion(inv, k123, iters)
    return invert_radial_tangential_distortion(inv, k123, t12, iters)


class ImageRectifier:
    """Single-camera undistortion: ROI + dense backward resampling map
    (`ImageRectifier`, `lensdistortion.h:308-592`).

    ROI methods: 'same' (full source frame), 'maximal' (bounding box of the
    undistorted border), 'minimal' (largest box inside the undistorted
    border).  The backward map is (H_roi, W_roi, 2) of (row, col) source
    coordinates, built by one vectorized forward-distortion over the grid.
    """

    MINIMAL, MAXIMAL, SAME = "minimal", "maximal", "same"

    def __init__(self, f, pp, source_size, k123=None, t12=None, B12=None):
        self.f = jnp.broadcast_to(jnp.asarray(f, jnp.float32), (2,)) \
            if jnp.ndim(f) == 0 else jnp.asarray(f, jnp.float32)
        self.pp = jnp.asarray(pp, jnp.float32)
        self.source_size = tuple(int(s) for s in source_size)  # (H, W)
        self.k123, self.t12, self.B12 = k123, t12, B12
        self.roi_top_left = None
        self.roi_bottom_right = None
        self.backward_map = None

    def _undistort_pixels(self, pts: jnp.ndarray) -> jnp.ndarray:
        hom = invert_full_lens_distortion_homogeneous(
            pts, self.f, self.pp, self.k123, self.t12, self.B12)
        return homogeneous_to_image(hom, self.f, self.pp)

    def compute(self, roi_method: str = "same") -> bool:
        import numpy as np
        H, W = self.source_size
        if roi_method == self.SAME:
            tl = np.array([0, 0])
            br = np.array([H - 1, W - 1])
        else:
            # undistorted positions of the border pixels
            xs = np.arange(W, dtype=np.float32)
            ys = np.arange(H, dtype=np.float32)
            top = jnp.stack([jnp.asarray(xs), jnp.zeros(W)], -1)
            bottom = jnp.stack([jnp.asarray(xs), jnp.full(W, H - 1.0)], -1)
            left = jnp.stack([jnp.zeros(H), jnp.asarray(ys)], -1)
            right = jnp.stack([jnp.full(H, W - 1.0), jnp.asarray(ys)], -1)
            ut = np.asarray(self._undistort_pixels(top))
            ub = np.asarray(self._undistort_pixels(bottom))
            ul = np.asarray(self._undistort_pixels(left))
            ur = np.asarray(self._undistort_pixels(right))
            if roi_method == self.MAXIMAL:
                all_pts = np.concatenate([ut, ub, ul, ur], 0)
                tl = np.array([np.floor(all_pts[:, 1].min()),
                               np.floor(all_pts[:, 0].min())]).astype(int)
                br = np.array([np.ceil(all_pts[:, 1].max()),
                               np.ceil(all_pts[:, 0].max())]).astype(int)
            elif roi_method == self.MINIMAL:
                tl = np.array([np.ceil(ut[:, 1].max()),
                               np.ceil(ul[:, 0].max())]).astype(int)
                br = np.array([np.floor(ub[:, 1].min()),
                               np.floor(ur[:, 0].min())]).astype(int)
            else:
                return False
        self.roi_top_left = tl
        self.roi_bottom_right = br
        # br is an INCLUSIVE pixel coordinate (H-1/W-1 for 'same'): the
        # grid must span br - tl + 1 rows/cols or the last row and
        # column of every ROI mode are dropped
        rng = br - tl + 1
        if rng[0] <= 1 or rng[1] <= 1:
            return False
        new_pp = self.pp - jnp.asarray([tl[1], tl[0]], jnp.float32)
        jj, ii = jnp.meshgrid(jnp.arange(rng[1], dtype=jnp.float32),
                              jnp.arange(rng[0], dtype=jnp.float32))
        pos = jnp.stack([jj, ii], -1)
        hom = image_to_homogeneous(pos, self.f, new_pp)
        src = full_lens_distortion_homogeneous(hom, self.f, self.pp,
                                               self.k123, self.t12, self.B12)
        # map stores (row, col) like the reference (`lensdistortion.h:568-569`)
        self.backward_map = jnp.stack([src[..., 1], src[..., 0]], -1)
        return True

    @property
    def target_pp(self):
        return self.pp - jnp.asarray([self.roi_top_left[1],
                                      self.roi_top_left[0]], jnp.float32)
