#!/usr/bin/env python3
"""Project a point cloud into a camera depth map.

Reference parity: `examples/points_cloud2depth_map/main.cpp` — load a
cloud, transform into a camera frame, project through a pinhole model,
z-buffer rasterize, then fill holes by inpainting.  The reference walks a
BSP per pixel; the TPU-native design rasterizes all points at once with a
scatter-min z-buffer (dense vectorized form) — same output, no spatial
index needed.

  python cli/points_cloud2depth_map.py cloud.las depth.stevimg \\
      --size 480 640 --f 500 --pp 320 240 \\
      [--rvec rx ry rz --t tx ty tz] [--inpaint]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("cloud")
    ap.add_argument("output")
    ap.add_argument("--size", type=int, nargs=2, default=[480, 640],
                    metavar=("H", "W"))
    ap.add_argument("--f", type=float, default=500.0)
    ap.add_argument("--pp", type=float, nargs=2, default=None,
                    metavar=("cx", "cy"))
    ap.add_argument("--rvec", type=float, nargs=3, default=[0, 0, 0],
                    help="world->camera axis-angle rotation")
    ap.add_argument("--t", type=float, nargs=3, default=[0, 0, 0],
                    help="world->camera translation")
    ap.add_argument("--inpaint", action="store_true",
                    help="fill holes by diffusion inpainting")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from libstevi_tpu.io import open_point_cloud, write_image
    from libstevi_tpu.geometry.rotations import rodrigues_formula

    H, W = args.size
    cx, cy = args.pp if args.pp else (W / 2.0, H / 2.0)

    cloud = open_point_cloud(args.cloud)
    pts = jnp.asarray(cloud.positions, jnp.float32)
    R = rodrigues_formula(jnp.asarray(args.rvec, jnp.float32))
    cam = pts @ R.T + jnp.asarray(args.t, jnp.float32)

    z = cam[:, 2]
    valid = z > 1e-6
    u = args.f * cam[:, 0] / jnp.where(valid, z, 1.0) + cx
    v = args.f * cam[:, 1] / jnp.where(valid, z, 1.0) + cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = valid & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)

    flat = jnp.where(inb, vi * W + ui, H * W)
    depth = jnp.full(H * W + 1, jnp.inf, jnp.float32)
    # scatter-min z-buffer: nearest point wins per pixel
    depth = depth.at[flat].min(jnp.where(inb, z, jnp.inf))
    depth = depth[:H * W].reshape(H, W)
    filled = float(jnp.isfinite(depth).mean())

    if args.inpaint:
        from libstevi_tpu.imageproc.inpainting import diffusion_inpainting
        mask = jnp.isfinite(depth)
        depth = diffusion_inpainting(jnp.where(mask, depth, 0.0), ~mask)

    out = np.array(depth, np.float32)
    out[~np.isfinite(out)] = 0.0
    write_image(args.output, out)
    print(json.dumps({"written": args.output, "n_points": cloud.n_points,
                      "coverage": round(filled, 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
