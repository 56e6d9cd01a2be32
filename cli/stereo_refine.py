#!/usr/bin/env python3
"""Subpixel stereo-refinement evaluation.

Reference parity: `examples/stereo_refine_test/main.cpp` — run the
image-level refined-disparity entry points (cost-symmetric and
feature-space barycentric families) on a stereo pair and report each
method's accuracy against a ground-truth disparity.

  python cli/stereo_refine.py left.png right.png -d 32 -r 2 \
      [--gt disp.stevimg] [-o refined.stevimg]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("left")
    ap.add_argument("right")
    ap.add_argument("-d", "--disp-range", type=int, default=32)
    ap.add_argument("-r", "--radius", type=int, default=2)
    ap.add_argument("-m", "--matching", default="zncc",
                    choices=["zncc", "ncc", "zssd", "ssd", "sad", "medad"])
    ap.add_argument("--methods", nargs="+",
                    default=["barycentric", "barycentric-symmetric",
                             "cost-symmetric"])
    ap.add_argument("--gt", default=None)
    ap.add_argument("-o", "--output", default=None,
                    help="refined disparity of the LAST method (.stevimg)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from libstevi_tpu.core import MatchingFunction
    from libstevi_tpu.io import read_image, write_stevimg, read_stevimg
    from libstevi_tpu.ops import (refined_barycentric_disp,
                                  refined_barycentric_symmetric_disp,
                                  refined_cost_symmetric_disp)

    func = MatchingFunction[args.matching.upper()]
    left = np.asarray(read_image(args.left, np.float32))
    right = np.asarray(read_image(args.right, np.float32))
    if left.ndim == 3:
        left, right = left.mean(-1), right.mean(-1)
    l, r = jnp.asarray(left), jnp.asarray(right)

    runners = {
        "barycentric": lambda: refined_barycentric_disp(
            func, l, r, args.radius, args.radius, args.disp_range),
        "barycentric-symmetric": lambda: refined_barycentric_symmetric_disp(
            func, l, r, args.radius, args.radius, args.disp_range),
        "cost-symmetric": lambda: refined_cost_symmetric_disp(
            func, l, r, args.radius, args.radius, args.disp_range),
    }

    gt = np.asarray(read_stevimg(args.gt)) if args.gt else None
    report = {}
    out = None
    for name in args.methods:
        disp = np.asarray(runners[name]())
        out = disp
        entry = {"mean": float(disp.mean())}
        if gt is not None:
            b = 2 * args.radius + 2
            inner = np.s_[b:-b, b + args.disp_range:-b]
            err = np.abs(disp[inner] - gt[inner])
            entry["inlier_mae"] = float(err[err <= 1.0].mean())
            entry["prop_good_1.0"] = float((err <= 1.0).mean())
        report[name] = entry
    print(json.dumps(report))
    if args.output and out is not None:
        write_stevimg(args.output, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
