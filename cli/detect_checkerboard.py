#!/usr/bin/env python3
"""Checkerboard calibration-target detection CLI.

Reference parity: `examples/checkboard_detection/main.cpp` — detect corner
candidates, filter, grow the grid, refine subpixel, report the grid.

  python cli/detect_checkerboard.py image.png [-o corners.json]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--smooth-radius", type=int, default=1)
    ap.add_argument("--nms-radius", type=int, default=2)
    ap.add_argument("--lambda-threshold", type=float, default=0.0)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from libstevi_tpu.io import read_image
    from libstevi_tpu.imageproc.checkerboard import detect_checkerboard

    img = np.asarray(read_image(args.image, np.float32))
    if img.ndim == 3:
        img = img.mean(-1)
    board = detect_checkerboard(jnp.asarray(img), args.smooth_radius,
                                args.nms_radius, args.lambda_threshold)
    if board is None:
        print(json.dumps({"found": False}))
        return 1
    report = {"found": True, "rows": board.rows, "cols": board.cols,
              "n_points": board.n_points_found}
    print(json.dumps(report))
    if args.output:
        report["corners"] = np.where(np.isfinite(board.corners),
                                     board.corners, None).tolist()
        with open(args.output, "w") as fp:
            json.dump(report, fp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
