#!/usr/bin/env python3
"""Intrinsic image decomposition CLI.

Reference parity: `examples/intrisic_image_decomposition/main.cpp` —
split an image into reflectance and shading with the non-local-texture
retinex (RGB) or the FFT retinex (gray), optionally auto-tuning the
chromaticity threshold by shading entropy.

  python cli/intrinsic_decomposition.py image.png \
      [--reflectance r.stevimg] [--shading s.stevimg] [--auto]
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
    ap.add_argument("--reflectance", default=None)
    ap.add_argument("--shading", default=None)
    ap.add_argument("--auto", action="store_true",
                    help="sweep chromaticity thresholds, keep the "
                         "minimum-entropy shading (RGB only)")
    ap.add_argument("--diff-threshold", type=float, default=2e-3)
    ap.add_argument("--lambda-retinex", type=float, default=1.0)
    ap.add_argument("--lambda-texture", type=float, default=1.0)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from libstevi_tpu.io import read_image, write_stevimg
    from libstevi_tpu.imageproc import (
        retinex_fft, retinex_with_nonlocal_texture_constraint,
        auto_retinex_with_nonlocal_texture_constraint)

    img = np.asarray(read_image(args.image, np.float32))
    if img.ndim == 3 and img.shape[-1] == 3:
        if args.auto:
            dec = auto_retinex_with_nonlocal_texture_constraint(
                jnp.asarray(img), lambda_retinex=args.lambda_retinex,
                lambda_texture=args.lambda_texture,
                max_val=float(img.max()) or 1.0)
        else:
            dec = retinex_with_nonlocal_texture_constraint(
                jnp.asarray(img), args.diff_threshold,
                lambda_retinex=args.lambda_retinex,
                lambda_texture=args.lambda_texture)
    else:
        gray = img if img.ndim == 2 else img.mean(-1)
        dec = retinex_fft(jnp.asarray(gray))

    R = np.asarray(dec.reflectance)
    S = np.asarray(dec.shading)
    print(json.dumps({
        "reflectance_shape": list(R.shape), "shading_shape": list(S.shape),
        "reflectance_range": [float(R.min()), float(R.max())],
        "shading_range": [float(S.min()), float(S.max())]}))
    if args.reflectance:
        write_stevimg(args.reflectance, R)
    if args.shading:
        write_stevimg(args.shading, S)
    return 0


if __name__ == "__main__":
    sys.exit(main())
