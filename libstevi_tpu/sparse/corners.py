"""Corner detectors: Harris structure tensor and FAST segment test.

Reference parity: `sparseMatching/cornerDetectors.h` — `HarrisCornerMMat`
(:20: optional unnormalized Gaussian low-pass of sigma (r+1)/2 with mirror
padding, gradients from the separable [-1,0,1] x [1,2,1] kernels of
`standardConvolutionFilters.h:278-360`), `HarrisCornerScore` (:184: Noble's
measure det/trace with non-finite values zeroed), windowed (:266: M summed
over a window before scoring) and masked (:318) variants, and
`FASTCornerDetection` (:457: 16-point Bresenham-circle segment test).

TPU design: all filters are separable convolutions expressed as shifted adds
on mirror-padded arrays; FAST evaluates all 16 circle offsets as shifted
copies and finds >=`n_contig` contiguous brighter/darker runs with a
wrap-around rolling AND — fully vectorized, no per-pixel control flow.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _conv1d(x: jnp.ndarray, taps, axis: int) -> jnp.ndarray:
    """Odd-length 1-D correlation with mirror padding along `axis`."""
    r = (len(taps) - 1) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad, mode="reflect")
    out = 0.0
    for k, t in enumerate(taps):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + x.shape[axis])
        out = out + t * xp[tuple(sl)]
    return out


def _gaussian_taps(radius: int) -> np.ndarray:
    """Unnormalized Gaussian taps, sigma = (radius+1)/2
    (`cornerDetectors.h:29,46-48`; normalize=false) — delegates to the
    shared `imageproc.filters.gaussian_filter_taps`."""
    from ..imageproc.filters import gaussian_filter_taps
    return np.asarray(gaussian_filter_taps((radius + 1) / 2.0, radius,
                                           normalize=False))


def harris_m_mat(img: jnp.ndarray, low_pass_radius: int = 3):
    """Structure-tensor entries (dx^2, dx*dy, dy^2) after the optional
    Gaussian low-pass (`HarrisCornerMMat`, `cornerDetectors.h:20-72`)."""
    x = img.astype(jnp.float32)
    if low_pass_radius >= 1:
        taps = _gaussian_taps(low_pass_radius)
        x = _conv1d(x, taps, 0)
        x = _conv1d(x, taps, 1)
    # Sobel-style separable gradients: derivative [-1,0,1] on one axis,
    # extension [1,2,1] on the other.  x = COLUMNS (the repo-wide image
    # convention, see edges.py): dx differentiates along axis 1.
    dx = _conv1d(_conv1d(x, [-1.0, 0.0, 1.0], 1), [1.0, 2.0, 1.0], 0)
    dy = _conv1d(_conv1d(x, [1.0, 2.0, 1.0], 1), [-1.0, 0.0, 1.0], 0)
    return dx * dx, dx * dy, dy * dy


def harris_corner_score(img: jnp.ndarray, low_pass_radius: int = 3
                        ) -> jnp.ndarray:
    """Noble's corner measure det(M)/trace(M), non-finite -> 0
    (`HarrisCornerScore`, `cornerDetectors.h:184-216`).  A 3-D input is
    treated as (H, W, C) and channel scores are summed (:218-264)."""
    if img.ndim == 3:
        return sum(harris_corner_score(img[..., c], low_pass_radius)
                   for c in range(img.shape[-1]))
    a, b, c = harris_m_mat(img, low_pass_radius)
    det = a * c - b * b
    tr = a + c
    score = det / tr
    return jnp.where(jnp.isfinite(score), score, 0.0)


def windowed_harris_corner_score(img: jnp.ndarray, window_radius: int = 2,
                                 low_pass_radius: int = 0) -> jnp.ndarray:
    """Structure tensor aggregated over a window before scoring
    (`windowedHarrisCornerScore`, `cornerDetectors.h:266-316`)."""
    from ..ops.filters import box_filter_2d
    a, b, c = harris_m_mat(img, low_pass_radius)
    a = box_filter_2d(a, window_radius, window_radius)
    b = box_filter_2d(b, window_radius, window_radius)
    c = box_filter_2d(c, window_radius, window_radius)
    det = a * c - b * b
    tr = a + c
    score = det / tr
    return jnp.where(jnp.isfinite(score), score, 0.0)


def masked_harris_corner_score(img: jnp.ndarray, mask: jnp.ndarray,
                               window_radius: int = 2,
                               low_pass_radius: int = 0) -> jnp.ndarray:
    """Windowed Harris restricted to a mask (`cornerDetectors.h:318-455`):
    masked-out pixels contribute nothing and score 0."""
    from ..ops.filters import box_filter_2d
    m = mask.astype(jnp.float32)
    a, b, c = harris_m_mat(img, low_pass_radius)
    a = box_filter_2d(a * m, window_radius, window_radius)
    b = box_filter_2d(b * m, window_radius, window_radius)
    c = box_filter_2d(c * m, window_radius, window_radius)
    det = a * c - b * b
    tr = a + c
    score = det / tr
    return jnp.where(jnp.isfinite(score) & (m > 0), score, 0.0)


# the 16 Bresenham circle offsets of radius 3, clockwise from 12 o'clock
_FAST_OFFSETS = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1)],
    np.int32)


def fast_corner_detection(img: jnp.ndarray, threshold: float,
                          n_contiguous: int = 12) -> jnp.ndarray:
    """FAST segment test (`FASTCornerDetection`, `cornerDetectors.h:457+`):
    a pixel is a corner when >= n_contiguous consecutive circle samples are
    all brighter than center+threshold or all darker than center-threshold.
    Returns a bool (H, W) map (border ring of 3 px is False)."""
    x = img.astype(jnp.float32)
    H, W = x.shape
    pad = jnp.pad(x, 3, mode="edge")
    circle = jnp.stack([pad[3 + di:3 + di + H, 3 + dj:3 + dj + W]
                        for di, dj in _FAST_OFFSETS], axis=0)  # (16, H, W)
    brighter = circle > (x + threshold)[None]
    darker = circle < (x - threshold)[None]

    def has_run(flags):
        # wrap-around: duplicate the ring, then AND over every window of
        # length n_contiguous via a rolling product
        ring = jnp.concatenate([flags, flags[:n_contiguous - 1]], 0)
        run = ring[:16]
        for k in range(1, n_contiguous):
            run = run & ring[k:k + 16]
        return jnp.any(run, 0)

    corner = has_run(brighter) | has_run(darker)
    edge = jnp.zeros((H, W), bool).at[3:H - 3, 3:W - 3].set(True)
    return corner & edge
