#!/usr/bin/env python3
"""Subpixel optical-flow refinement evaluation.

Reference parity: `examples/optical_flow_refine_test/main.cpp` — match a
2-D search window between two images, refine the integer flow with the
cost-interpolation and feature-space barycentric refiners, and (when a
ground-truth .flo is given) report per-method end-point errors over the
inlier set.

  python cli/optical_flow_refine.py img0.png img1.png -r 2 -s 3 \
      [--gt flow.flo] [-o refined.flo]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("img0", help="source image (flow maps img0 -> img1)")
    ap.add_argument("img1")
    ap.add_argument("-r", "--radius", type=int, default=2,
                    help="matching window radius")
    ap.add_argument("-s", "--search", type=int, default=3,
                    help="2-D search half-range")
    ap.add_argument("-m", "--matching", default="zncc",
                    choices=["zncc", "ncc", "zssd", "ssd", "sad"])
    ap.add_argument("--gt", default=None, help=".flo ground truth")
    ap.add_argument("-o", "--output", default=None, help=".flo output")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from libstevi_tpu.core import MatchingFunction
    from libstevi_tpu.core.search import SearchOffset2
    from libstevi_tpu.io import read_image, write_flo, read_flo
    from libstevi_tpu.ops import refined_barycentric_symmetric_2d_disp

    func = MatchingFunction[args.matching.upper()]
    i0 = np.asarray(read_image(args.img0, np.float32))
    i1 = np.asarray(read_image(args.img1, np.float32))
    if i0.ndim == 3:
        i0, i1 = i0.mean(-1), i1.mean(-1)

    s = args.search
    search = SearchOffset2(-s, s, -s, s)
    # img_l = target (img1), img_r = source (img0) under RIGHT_TO_LEFT
    flow = np.asarray(refined_barycentric_symmetric_2d_disp(
        func, jnp.asarray(i1), jnp.asarray(i0), args.radius, args.radius,
        search))

    report = {"shape": list(flow.shape),
              "mean_flow": [float(flow[..., 0].mean()),
                            float(flow[..., 1].mean())]}
    if args.gt:
        gt = np.asarray(read_flo(args.gt))
        # .flo stores (u, v) = (dx, dy); ours is (di, dj)
        gt_ij = np.stack([gt[..., 1], gt[..., 0]], -1) \
            if gt.shape[-1] == 2 else gt
        b = 2 * (args.radius + s)
        inner = np.s_[b:-b, b:-b]
        epe = np.hypot(flow[inner + (0,)] - gt_ij[inner + (0,)],
                       flow[inner + (1,)] - gt_ij[inner + (1,)])
        inlier = epe <= 1.0
        report["epe_mean"] = float(epe.mean())
        report["inlier_epe"] = float(epe[inlier].mean()) \
            if inlier.any() else None
        report["prop_inlier"] = float(inlier.mean())
    print(json.dumps(report))
    if args.output:
        # store as (u, v) = (dj, di)
        write_flo(args.output,
                  np.stack([flow[..., 1], flow[..., 0]], -1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
