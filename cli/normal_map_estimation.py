#!/usr/bin/env python3
"""Normal-map + height estimation from a single image.

Reference parity: `examples/normal_map_estimation/main.cpp` — intrinsic
decomposition for the shading image, light-direction estimation, the
edge-guided normal solver, normal rectification over the area of
interest, least-squares height integration and plane flattening.

  python cli/normal_map_estimation.py image.png -o normals.stevimg \
      [--height height.stevimg] [--light X Y Z] [--n-iter 30]
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
    ap.add_argument("-o", "--output", default=None,
                    help="normal map output (.stevimg, H x W x 3)")
    ap.add_argument("--height", default=None,
                    help="flattened height-map output (.stevimg)")
    ap.add_argument("--light", type=float, nargs=3, default=None,
                    help="known light direction; estimated when absent")
    ap.add_argument("--n-iter", type=int, default=30)
    ap.add_argument("--lambda-norm", type=float, default=1.0)
    ap.add_argument("--lambda-diff", type=float, default=0.25)
    ap.add_argument("--lambda-dir", type=float, default=0.25)
    ap.add_argument("--max-diff", type=float, default=50.0)
    ap.add_argument("--ensure-convex", action="store_true")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from libstevi_tpu.io import read_image, write_stevimg
    from libstevi_tpu.imageproc import (
        retinex_fft, estimate_light_direction_from_shading,
        normal_map_from_intrinsic_decomposition, rectify_normal_map,
        height_from_normal_map, flatten_height_map_in_area_of_interest)

    img = np.asarray(read_image(args.image, np.float32))
    gray = img if img.ndim == 2 else img.mean(-1)
    guide = img if img.ndim == 3 else np.stack([gray] * 3, -1)

    dec = retinex_fft(jnp.asarray(gray))
    shading = dec.shading if dec.shading.ndim == 2 else dec.shading[..., 0]

    if args.light is not None:
        light = np.asarray(args.light, np.float32)
    else:
        light = np.asarray(estimate_light_direction_from_shading(shading))
        # the estimator's documented convention opposes the n.l light
        light = np.asarray([-light[0], -light[1], light[2]], np.float32)

    normals = normal_map_from_intrinsic_decomposition(
        shading, jnp.asarray(guide), jnp.asarray(light),
        lambda_norm=args.lambda_norm, lambda_diff=args.lambda_diff,
        lambda_dir=args.lambda_dir, n_iter=args.n_iter)

    mask = jnp.ones(gray.shape, bool)
    normals = rectify_normal_map(normals, mask)
    height = height_from_normal_map(normals, args.max_diff)
    flat = flatten_height_map_in_area_of_interest(height, mask,
                                                  args.ensure_convex)

    n = np.asarray(normals)
    report = {"shape": list(n.shape),
              "light": [float(v) for v in light],
              "mean_up": float(n[..., 2].mean()),
              "height_range": float(np.ptp(np.asarray(flat)))}
    print(json.dumps(report))
    if args.output:
        write_stevimg(args.output, n)
    if args.height:
        write_stevimg(args.height, np.asarray(flat))
    return 0


if __name__ == "__main__":
    sys.exit(main())
