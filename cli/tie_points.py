#!/usr/bin/env python3
"""Sparse tie-point pipeline: corners -> descriptors -> matching -> robust
relative pose.

Reference parity: `examples/tie_points_checker` (a Qt inspector over the
same pipeline) + SURVEY §3.6 call stack: Harris/FAST corners, non-local-max
selection, intensity orientation, BRIEF/whitened descriptors, optimal
assignment matching, essential-matrix estimation with cheirality selection,
inlier statistics.

  python cli/tie_points.py left.png right.png [-n 256] [--detector harris]
      [--descriptor whitened] [--f 500] [-o matches.json]
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
    ap.add_argument("-n", "--n-points", type=int, default=256)
    ap.add_argument("--detector", default="harris",
                    choices=["harris", "fast"])
    ap.add_argument("--descriptor", default="whitened",
                    choices=["brief", "whitened", "oriented", "circular"])
    ap.add_argument("--radius", type=int, default=4)
    ap.add_argument("--f", type=float, default=None,
                    help="focal length (pixels) for pose estimation")
    ap.add_argument("--inlier-threshold", type=float, default=2e-3)
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from libstevi_tpu.io import read_image
    from libstevi_tpu.sparse.corners import (harris_corner_score,
                                             fast_corner_detection)
    from libstevi_tpu.sparse.nms import non_local_maximum_point_selection
    from libstevi_tpu.sparse.orientation import intensity_oriented_coordinates
    from libstevi_tpu.sparse import descriptors as D
    from libstevi_tpu.optim.assignment import match_descriptors

    def load(path):
        img = np.asarray(read_image(path, np.float32))
        if img.ndim == 3:
            img = img.mean(-1)
        return jnp.asarray(img)

    img_l, img_r = load(args.left), load(args.right)
    H, W = img_l.shape

    def detect(img):
        if args.detector == "harris":
            score = harris_corner_score(img)
        else:
            score = fast_corner_detection(img, 0.05)
        coords, vals, valid = non_local_maximum_point_selection(
            score, float(args.radius), args.n_points, 0.0)
        coords = np.asarray(coords)[np.asarray(valid)]
        # keep clear of borders for descriptor support
        m = 2 * args.radius + 2
        keep = ((coords[:, 0] > m) & (coords[:, 0] < W - m)
                & (coords[:, 1] > m) & (coords[:, 1] < H - m))
        return jnp.asarray(coords[keep])

    def describe(img, coords_xy):
        # descriptors take (row, col) coords
        rc = coords_xy[:, ::-1]
        if args.descriptor == "brief":
            pat = D.random_sampling_pattern(256, args.radius, seed=7)
            return np.asarray(D.brief_descriptor(rc, img, pat)
                              ).astype(np.float64)
        if args.descriptor == "whitened":
            return np.asarray(D.whitened_pixels_descriptor(
                rc, img, radius=args.radius))
        if args.descriptor == "oriented":
            dirs = intensity_oriented_coordinates(rc, img, args.radius)
            return np.asarray(D.oriented_whitened_pixels_descriptor(
                rc, img, dirs, radius=args.radius))
        return np.asarray(D.circular_fft_descriptor(rc, img, n_rings=4,
                                                    n_per_ring=16))

    cl, cr = detect(img_l), detect(img_r)
    dl, dr = describe(img_l, cl), describe(img_r, cr)
    ia, ib = match_descriptors(dl, dr)
    pl = np.asarray(cl)[ia]
    pr = np.asarray(cr)[ib]

    report = {"n_left": int(len(cl)), "n_right": int(len(cr)),
              "n_matches": int(len(ia))}

    if args.f and len(ia) >= 8:
        import jax
        from libstevi_tpu.geometry.alignement import (
            estimate_essential_matrix, essential_matrix_to_transforms,
            select_transform)
        from libstevi_tpu.optim.ransac import ransac

        f = args.f
        cx, cy = W / 2.0, H / 2.0
        h1 = jnp.asarray(np.stack([(pl[:, 0] - cx) / f,
                                   (pl[:, 1] - cy) / f], -1), jnp.float32)
        h2 = jnp.asarray(np.stack([(pr[:, 0] - cx) / f,
                                   (pr[:, 1] - cy) / f], -1), jnp.float32)

        def fit(sample):
            a, b = sample
            return estimate_essential_matrix(a, b)

        def resid(E, data):
            a, b = data
            x1 = jnp.concatenate([a, jnp.ones_like(a[:, :1])], -1)
            x2 = jnp.concatenate([b, jnp.ones_like(b[:, :1])], -1)
            Ex1 = x1 @ E.T
            x2Ex1 = jnp.sum(x2 * Ex1, -1)
            # Sampson distance
            Etx2 = x2 @ E
            den = (Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2
                   + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2)
            return jnp.abs(x2Ex1) / jnp.sqrt(jnp.maximum(den, 1e-12))

        res = ransac(fit, resid, (h1, h2), n_samples=8,
                     n_iterations=256, threshold=args.inlier_threshold,
                     key=jax.random.PRNGKey(3))
        inl = np.asarray(res.inliers)
        report["n_inliers"] = int(inl.sum())
        report["inlier_ratio"] = round(float(inl.mean()), 4)
        T1, T2 = essential_matrix_to_transforms(res.model)
        T = select_transform(T1, T2, h1[inl], h2[inl])
        report["rotation"] = np.asarray(T.R).round(5).tolist()
        report["translation"] = np.asarray(T.t).round(5).tolist()

    print(json.dumps(report, indent=1))
    if args.output:
        report["matches"] = np.concatenate([pl, pr], -1).tolist()
        with open(args.output, "w") as fp:
            json.dump(report, fp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
