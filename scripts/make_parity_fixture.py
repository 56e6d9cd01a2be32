"""Render the committed parity fixture: a non-random stereo pair with exact
ground-truth disparity.

Scene: a slanted textured background plane plus three foreground objects
(constant-disparity card, parabolic bump, small high-disparity card).  Both
views sample one *continuous* band-limited texture analytically, so the
right view is exact at fractional disparities — no resampling error in the
ground truth (the reference evaluates its examples on Active-Passive
SimStereo pairs, `examples/stereo-match/main.cpp:234-303`; those are not
downloadable here, so this rendered pair plays the same role with exact GT).

Convention (matches the library, `correlation_base.h:824-878`):
RIGHT_TO_LEFT matching — the *source* is the second ("right") image, the
disparity map lives on its grid, and the target (first/"left") image is
sampled at ``j + d``: right(i, j) == left(i, j + d(i, j)) exactly for every
valid source pixel.  GT pixels whose correspondence leaves the target image
are NaN, as are pixels within one matching window of a disparity
discontinuity (occlusion boundary), mirroring SimStereo's invalid-pixel
masking role.

Writes tests/data/parity/{left,right,gt}.stevimg (480x640, D<=116) and a
small variant {left,right,gt}_small.stevimg (96x128, D<=28) for the fast
regression test.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libstevi_tpu.io import write_image


def texture(y, x, seed=7, n_waves=48):
    """Band-limited random-phase sinusoid field, exactly evaluable at
    fractional coordinates."""
    rng = np.random.default_rng(seed)
    out = np.zeros(np.broadcast(y, x).shape, np.float64)
    for _ in range(n_waves):
        f = 10 ** rng.uniform(-1.6, 0.12)          # 0.025 .. 1.3 rad/px
        th = rng.uniform(0, 2 * np.pi)
        ph = rng.uniform(0, 2 * np.pi)
        amp = 1.0 / (1.0 + 8.0 * f)
        out = out + amp * np.sin(f * (np.cos(th) * x + np.sin(th) * y) + ph)
    out = out - out.min()
    return (out / out.max()).astype(np.float32)


def disparity_scene(H, W, scale=1.0):
    """Exact GT disparity on the source grid + validity mask."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    u, v = xx / W, yy / H
    d = 18.0 + 12.0 * u + 6.0 * v                       # slanted background

    def rect(y0, y1, x0, x1):
        return ((v >= y0) & (v < y1) & (u >= x0) & (u < x1))

    m1 = rect(0.15, 0.45, 0.10, 0.35)                   # constant card
    d = np.where(m1, 62.3, d)
    cy, cx, ry, rx = 0.62, 0.55, 0.22, 0.18             # parabolic bump
    q = ((v - cy) / ry) ** 2 + ((u - cx) / rx) ** 2
    m2 = q < 1.0
    d = np.where(m2, 85.0 + 15.0 * (1.0 - q), d)
    m3 = rect(0.08, 0.22, 0.55, 0.72)                   # high-disp card
    d = np.where(m3, 104.7, d)
    return d * scale


def render_exact(H, W, scale, r=3):
    """Exact construction: the target ("left") is the plain texture and
    the source ("right") is forward-sampled, so right(i,j) =
    T(i, j + d(i,j)) = left(i, j + d(i,j)) exactly for every source
    pixel.  Occluded target regions then show texture from multiple scene
    points — harmless, since the GT lives on the source grid and every
    valid source pixel has an exact match."""
    d = disparity_scene(H, W, scale)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    left = texture(yy, xx)
    right = texture(yy, xx + d)
    gt = d.astype(np.float32)
    jj = np.arange(W)[None, :]
    ii = np.arange(H)[:, None]
    # out-of-target correspondences (+1 covers the truncated band) and the
    # window-support border, where the reference's truncatedCostVolume
    # writes NaN by design (`correlation_base.h:603-609`)
    invalid = (jj + d + r + 1 >= W) | (jj < r) | (ii < r) | (ii + r >= H)
    # mask matching-window-sized bands around depth discontinuities: the
    # aggregation window there mixes two surfaces (same as SimStereo's
    # occlusion mask role)
    dy, dx = np.gradient(d)
    edge = (np.abs(dx) + np.abs(dy)) > 1.0
    from scipy.ndimage import binary_dilation
    edge = binary_dilation(edge, iterations=2 * r + 2)
    gt[invalid | edge] = np.nan
    return left.astype(np.float32), right.astype(np.float32), gt


# ---------------------------------------------------------------------------
# Fixture #2: occlusions, disparity discontinuities, radiometric asymmetry
# ---------------------------------------------------------------------------
#
# A layered scene rendered with true left-view visibility: opaque surfaces
# at different depths, each with its own texture, so background pixels
# whose correspondence is covered by a nearer surface are genuinely
# OCCLUDED in the target view (the matcher sees a different surface
# there), disparity jumps 20-60 px at object borders, every surface has
# fractional (half-pixel-class) disparity, and the two views differ by an
# exposure gain/gamma plus independent sensor noise.  This is the
# SimStereo-class content the reference evaluates on
# (`examples/stereo-match/main.cpp:234-303`); occlusion consistency is
# what `statistics/stereo_covering.h:31,88` measures.
#
# Every surface's disparity is linear in x (d = c0(i) + s*x with |s| < 1),
# so the right->left map x -> x + d(i, x) inverts in closed form and both
# views plus the occlusion mask are ANALYTIC — no resampling error.


def _surfaces(H, W, scale):
    """Each surface: (texture seed, c0(i) array fn, slope s, cover(i, x)).
    d(i, x) = c0(i) + s*x on the right-view grid; higher d = nearer."""
    def rect(y0, y1, x0, x1):
        return lambda ii, xx: ((ii >= y0 * H) & (ii < y1 * H)
                               & (xx >= x0 * W) & (xx < x1 * W))

    def ellipse(cy, cx, ry, rx):
        return lambda ii, xx: (((ii / H - cy) / ry) ** 2
                               + ((xx / W - cx) / rx) ** 2) < 1.0

    bg = dict(seed=11, c0=lambda ii: scale * (16.0 + 7.0 * ii / H),
              s=scale * 14.0 / W, cover=lambda ii, xx: np.ones_like(
                  np.broadcast_to(ii, np.broadcast(ii, xx).shape), bool))
    cardA = dict(seed=23, c0=lambda ii: np.full_like(
        np.asarray(ii, np.float64), scale * 47.6), s=0.0,
        cover=rect(0.15, 0.48, 0.12, 0.34))
    # slanted card: slope 0.3 px/px regardless of scale
    cardB = dict(seed=37, c0=lambda ii: np.full_like(
        np.asarray(ii, np.float64), scale * 66.2 - 0.3 * 0.51 * W),
        s=0.3, cover=rect(0.55, 0.85, 0.40, 0.62))
    disk = dict(seed=41, c0=lambda ii: np.full_like(
        np.asarray(ii, np.float64), scale * 92.4), s=0.0,
        cover=ellipse(0.25, 0.72, 0.13, 0.10))
    cardD = dict(seed=53, c0=lambda ii: np.full_like(
        np.asarray(ii, np.float64), scale * 103.8), s=0.0,
        cover=rect(0.60, 0.72, 0.47, 0.55))      # occludes part of cardB
    return [bg, cardA, cardB, disk, cardD]


def render_occluded(H, W, scale, r=3, noise=0.012, gain=1.06, gamma=0.94):
    surfs = _surfaces(H, W, scale)
    ii, xx = np.mgrid[0:H, 0:W].astype(np.float64)

    def d_of(s, i_arr, x_arr):
        return s["c0"](i_arr) + s["s"] * x_arr

    # right view: nearest covering surface at each right pixel
    d_gt = d_of(surfs[0], ii, xx)
    right = texture(ii, xx, seed=surfs[0]["seed"])
    for s in surfs[1:]:
        near = s["cover"](ii, xx) & (d_of(s, ii, xx) > d_gt)
        d_gt = np.where(near, d_of(s, ii, xx), d_gt)
        right = np.where(near, texture(ii, xx, seed=s["seed"]), right)

    # left view: invert x + d(i, x) = jl per surface (closed form),
    # visible = max-d covered candidate
    jl = xx
    best_d = np.full((H, W), -np.inf)
    left = np.zeros((H, W), np.float64)
    for s in surfs:
        x_inv = (jl - s["c0"](ii)) / (1.0 + s["s"])
        cov = s["cover"](ii, x_inv)
        d_here = jl - x_inv
        win = cov & (d_here > best_d)
        best_d = np.where(win, d_here, best_d)
        left = np.where(win, texture(ii, x_inv, seed=s["seed"]), left)

    # occlusion on the right grid: some OTHER surface covers the
    # correspondence jl = j + d with strictly larger disparity
    jl_r = xx + d_gt
    occluded = np.zeros((H, W), bool)
    for s in surfs:
        x_inv = (jl_r - s["c0"](ii)) / (1.0 + s["s"])
        cov = s["cover"](ii, x_inv)
        d_here = jl_r - x_inv
        occluded |= cov & (d_here > d_gt + 1e-6)

    gt = d_gt.astype(np.float32)
    jj = np.arange(W)[None, :]
    i2 = np.arange(H)[:, None]
    invalid = (jj + d_gt + r + 1 >= W) | (jj < r) | (i2 < r) | (i2 + r >= H)
    dy, dx = np.gradient(d_gt)
    edge = (np.abs(dx) + np.abs(dy)) > 1.0
    from scipy.ndimage import binary_dilation
    edge = binary_dilation(edge, iterations=2 * r + 2)
    occ_band = binary_dilation(occluded, iterations=r + 1)
    gt[invalid | edge | occ_band] = np.nan

    # radiometric asymmetry: exposure gain + gamma on the left view,
    # independent sensor noise on both (GT remains exact — asymmetry is
    # a matcher challenge, not fixture error)
    rng = np.random.default_rng(97)
    left = np.clip(gain * np.power(np.clip(left, 0, None), gamma)
                   + rng.normal(0, noise, left.shape), 0.0, 1.5)
    right = np.clip(right + rng.normal(0, noise, right.shape), 0.0, 1.5)
    return (left.astype(np.float32), right.astype(np.float32), gt,
            occluded.astype(np.float32))


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "parity")
    os.makedirs(out_dir, exist_ok=True)

    left, right, gt = render_exact(480, 640, scale=1.0, r=3)
    write_image(os.path.join(out_dir, "left.stevimg"), left)
    write_image(os.path.join(out_dir, "right.stevimg"), right)
    write_image(os.path.join(out_dir, "gt.stevimg"), gt)
    print("full:", left.shape, "gt range",
          np.nanmin(gt), np.nanmax(gt),
          "valid", np.isfinite(gt).mean())

    left, right, gt = render_exact(96, 128, scale=0.25, r=2)
    write_image(os.path.join(out_dir, "left_small.stevimg"), left)
    write_image(os.path.join(out_dir, "right_small.stevimg"), right)
    write_image(os.path.join(out_dir, "gt_small.stevimg"), gt)
    print("small:", left.shape, "gt range",
          np.nanmin(gt), np.nanmax(gt),
          "valid", np.isfinite(gt).mean())

    left, right, gt, occ = render_occluded(480, 640, scale=1.0, r=3)
    write_image(os.path.join(out_dir, "left_occ.stevimg"), left)
    write_image(os.path.join(out_dir, "right_occ.stevimg"), right)
    write_image(os.path.join(out_dir, "gt_occ.stevimg"), gt)
    write_image(os.path.join(out_dir, "occ_mask.stevimg"), occ)
    print("occ full:", left.shape, "gt range", np.nanmin(gt),
          np.nanmax(gt), "valid", np.isfinite(gt).mean(),
          "occluded", occ.mean())

    left, right, gt, occ = render_occluded(96, 128, scale=0.25, r=2)
    write_image(os.path.join(out_dir, "left_occ_small.stevimg"), left)
    write_image(os.path.join(out_dir, "right_occ_small.stevimg"), right)
    write_image(os.path.join(out_dir, "gt_occ_small.stevimg"), gt)
    write_image(os.path.join(out_dir, "occ_mask_small.stevimg"), occ)
    print("occ small:", left.shape, "gt range", np.nanmin(gt),
          np.nanmax(gt), "valid", np.isfinite(gt).mean(),
          "occluded", occ.mean())


if __name__ == "__main__":
    main()
