#!/usr/bin/env python3
"""Dense stereo matching CLI.

Reference parity: `examples/stereo-match/main.cpp` — load a rectified pair,
run the selected matcher (dense WTA / SGM / hierarchical / PatchMatch) with a
chosen matching cost, optional subpixel refinement, write the disparity map,
and report accuracy vs. ground truth: the proportion of pixels with
|err| <= 2.0 ("prop good", `main.cpp:234-258`) and the inlier MAE
(`main.cpp:275-303`).

Usage:
  python cli/stereo_match.py LEFT RIGHT -o disp.stevimg -d 120 -m zncc \\
      --matcher sgm --refine parabola [--gt GT.flo] [--radius 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("left")
    ap.add_argument("right")
    ap.add_argument("-o", "--output", default="disp.stevimg")
    ap.add_argument("-d", "--disp-width", type=int, default=120)
    ap.add_argument("-m", "--match-func", default="zncc",
                    choices=["cc", "ncc", "ssd", "sad", "zcc", "zncc",
                             "zssd", "zsad", "census"])
    ap.add_argument("--matcher", default="sgm",
                    choices=["wta", "sgm", "hierarchical", "patchmatch"])
    ap.add_argument("--radius", type=int, default=3)
    ap.add_argument("--sgm-p1", type=float, default=0.1)
    ap.add_argument("--sgm-p2", type=float, default=0.5)
    ap.add_argument("--sgm-dirs", type=int, default=8)
    ap.add_argument("--refine", default="none",
                    choices=["none", "parabola", "equiangular", "gaussian"])
    ap.add_argument("--precision", default="f32", choices=["f32", "bf16"],
                    help="bf16 rides the packed-VPU SGM kernels (~1.8x "
                         "frame rate on TPU; see PARITY_r02.json bound)")
    ap.add_argument("--gt", help="ground-truth disparity (.stevimg/.flo)")
    args = ap.parse_args(argv)

    # persistent XLA compilation cache: repeat invocations at the same
    # shapes skip the (minutes-long on first use) TPU compiles
    import os
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "libstevi_tpu_xla"))

    for path, role in ((args.left, "left image"), (args.right, "right image"),
                       (args.gt, "ground truth")):
        if path and not __import__("os").path.exists(path):
            ap.error(f"{role} not found: {path}")

    import jax.numpy as jnp
    from libstevi_tpu.core import MatchingFunction, MATCH_TRAITS, \
        ExtractionStrategy
    from libstevi_tpu.core.search import SearchOffset1
    from libstevi_tpu.io import read_image, write_image
    from libstevi_tpu.ops import (unfold_based_cost_volume, sgm_cost_volume,
                                  extract_selected_index,
                                  selected_index_to_disp,
                                  truncated_cost_volume,
                                  refine_disp_cost_interpolation,
                                  InterpolationKernel)

    func = MatchingFunction[args.match_func.upper()]
    img_l = jnp.asarray(read_image(args.left, np.float32))
    img_r = jnp.asarray(read_image(args.right, np.float32))
    if img_l.ndim == 3 and img_l.shape[-1] > 3:
        img_l = img_l[..., :3]
        img_r = img_r[..., :3]

    t0 = time.perf_counter()
    if args.matcher == "patchmatch":
        from libstevi_tpu.ops.patchmatch import patch_match
        disp = patch_match(func, img_l, img_r,
                           SearchOffset1(0, args.disp_width - 1),
                           h_radius=args.radius, v_radius=args.radius)
        disp_f = np.asarray(disp, np.float32)
    elif args.matcher == "hierarchical":
        from libstevi_tpu.ops.hierarchical import \
            hierarchical_truncated_cost_volume
        out = hierarchical_truncated_cost_volume(
            func, img_l, img_r, args.radius, args.radius, args.disp_width,
            depth=2)
        idx = out.disp_estimate
        disp_f = np.asarray(idx, np.float32)
        if args.refine != "none":
            tcv = out.truncated_cost_volume
            if MATCH_TRAITS[func].strategy is ExtractionStrategy.SCORE:
                tcv = -tcv
            k = InterpolationKernel[args.refine.upper()]
            r = tcv.shape[-1] // 2
            disp_f = np.asarray(refine_disp_cost_interpolation(
                k, tcv[..., r - 1:r + 2], idx))
    elif args.matcher == "sgm":
        # the production fast path: on TPU the whole chain (fused CV in
        # both SGM-native layouts, Pout baking, fused WTA + subpixel)
        cv_dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
        from libstevi_tpu.ops import dense_sgm_stereo
        rk = None if args.refine == "none" \
            else InterpolationKernel[args.refine.upper()]
        disp, idx, tcv = dense_sgm_stereo(
            func, img_l, img_r, args.radius, args.radius, args.disp_width,
            P1=args.sgm_p1, P2=args.sgm_p2, n_directions=args.sgm_dirs,
            refine_kernel=rk, cv_dtype=cv_dtype)
        disp_f = np.asarray(disp, np.float32)
    else:
        cv_dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
        cv = unfold_based_cost_volume(func, img_l, img_r, args.radius,
                                      args.radius, args.disp_width,
                                      cv_dtype=cv_dtype)
        strategy = MATCH_TRAITS[func].strategy
        idx = extract_selected_index(cv, strategy)
        tcv = None
        disp = selected_index_to_disp(idx)
        disp_f = np.asarray(disp, np.float32)
        if args.refine != "none":
            if tcv is None:
                work_cv = -cv if strategy is ExtractionStrategy.SCORE else cv
                tcv = truncated_cost_volume(work_cv, idx, args.radius,
                                            args.radius, 1)
            k = InterpolationKernel[args.refine.upper()]
            disp_f = np.asarray(refine_disp_cost_interpolation(k, tcv, idx))
    dt = time.perf_counter() - t0

    write_image(args.output, disp_f.astype(np.float32))

    report = {"matcher": args.matcher, "match_func": args.match_func,
              "disp_width": args.disp_width, "time_s": round(dt, 3),
              "output": args.output}

    if args.gt:
        from libstevi_tpu.statistics import prop_good, inlier_mae
        gt = read_image(args.gt, np.float32)
        if gt.ndim == 3:
            gt = gt[..., 0]
        report["prop_good_2.0"] = round(prop_good(disp_f, gt, 2.0), 4)
        report["inlier_mae"] = round(inlier_mae(disp_f, gt, 2.0), 4)

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
