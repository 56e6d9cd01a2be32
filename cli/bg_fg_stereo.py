#!/usr/bin/env python3
"""Background-disparity estimation + foreground segmentation.

Reference parity: `examples/bg_fg_stereo/main.cpp` — estimate a global
background disparity from a background stereo pair, then segment each live
pair into foreground/background by comparing live costs at the background
disparity (`correlation/disparity_plus_background_segmentation.h`).

  python cli/bg_fg_stereo.py bg_left bg_right live_left live_right \\
      -d 64 [-m ncc] [-o disp.stevimg] [--mask-out mask.stevimg]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bg_left")
    ap.add_argument("bg_right")
    ap.add_argument("live_left")
    ap.add_argument("live_right")
    ap.add_argument("-d", "--disp-width", type=int, default=64)
    ap.add_argument("-m", "--match-func", default="zncc")
    ap.add_argument("--radius", type=int, default=3)
    ap.add_argument("--rel-threshold", type=float, default=0.9)
    ap.add_argument("-o", "--output", default="disp.stevimg")
    ap.add_argument("--mask-out", default=None)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from libstevi_tpu.core import MatchingFunction
    from libstevi_tpu.core.search import SearchOffset1
    from libstevi_tpu.io import read_image, write_image
    from libstevi_tpu.ops import unfold
    from libstevi_tpu.ops.cost_volume import (normalize_feature_volume,
                                              feature_volume_to_cost_volume)
    from libstevi_tpu.ops.bg_segmentation import \
        DisparityEstimatorWithBackgroundRemoval

    func = MatchingFunction[args.match_func.upper()]

    def load(p):
        img = np.asarray(read_image(p, np.float32))
        if img.ndim == 3:
            img = img.mean(-1)
        return jnp.asarray(img)

    r = args.radius
    search = SearchOffset1(0, args.disp_width - 1)
    est = DisparityEstimatorWithBackgroundRemoval(
        func, relative_threshold=args.rel_threshold)
    fv = {k: unfold(r, r, load(p)) for k, p in
          (("bl", args.bg_left), ("br", args.bg_right),
           ("ll", args.live_left), ("lr", args.live_right))}
    est.compute_background_disp(fv["br"], fv["bl"], search)
    live_cv = feature_volume_to_cost_volume(func, fv["ll"], fv["lr"], search)
    out = est.compute_disp_and_foreground_mask(live_cv)

    write_image(args.output, np.asarray(out.disp, np.float32))
    if args.mask_out:
        write_image(args.mask_out,
                    np.asarray(out.fg_mask, np.float32))
    print(json.dumps({
        "output": args.output,
        "fg_fraction": round(float(np.asarray(out.fg_mask).mean()), 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
