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


if __name__ == "__main__":
    main()
