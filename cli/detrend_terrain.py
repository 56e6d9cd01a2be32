#!/usr/bin/env python3
"""Detrend the terrain out of a point cloud.

Reference parity: `examples/detrend_terrain_in_pt_cloud/main.cpp` —
rasterize the minimum z per XY tile (the terrain estimate), fill empty
tiles, and subtract the sampled terrain from every point's z, writing a
cloud whose heights are relative to the local ground.

  python cli/detrend_terrain.py cloud.las -o flat.las --tile 5.0
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
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--tile", type=float, default=5.0,
                    help="terrain raster tile size (cloud units)")
    ap.add_argument("--smooth", type=float, default=1.0,
                    help="gaussian sigma (tiles) applied to the terrain")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from libstevi_tpu.io.pointcloud_io import (open_point_cloud, PointCloud,
                                               save_point_cloud)
    from libstevi_tpu.imageproc import gaussian_blur
    from libstevi_tpu.imageproc.inpainting import nearest_neighbor_inpainting

    cloud = open_point_cloud(args.cloud)
    pos = cloud.positions
    t = args.tile
    x0, y0 = pos[:, 0].min(), pos[:, 1].min()
    gi = np.floor((pos[:, 0] - x0) / t).astype(np.int64)
    gj = np.floor((pos[:, 1] - y0) / t).astype(np.int64)
    ni, nj = int(gi.max()) + 1, int(gj.max()) + 1

    # min-z per tile (`computeMinInTiles`)
    zmap = np.full((ni, nj), np.inf)
    np.minimum.at(zmap, (gi, gj), pos[:, 2])
    empty = ~np.isfinite(zmap)
    if empty.any():
        filled = np.asarray(nearest_neighbor_inpainting(
            jnp.asarray(np.where(empty, 0.0, zmap), jnp.float32),
            jnp.asarray(empty)))
    else:
        filled = zmap.astype(np.float32)
    if args.smooth > 0 and min(ni, nj) > 2:
        filled = np.asarray(gaussian_blur(jnp.asarray(filled), args.smooth))

    terrain = filled[gi, gj]
    new_pos = pos.copy()
    new_pos[:, 2] = pos[:, 2] - terrain
    save_point_cloud(args.output, PointCloud(new_pos, cloud.attributes))
    print(json.dumps({
        "n_points": int(len(pos)),
        "raster": [ni, nj],
        "terrain_range": [float(filled.min()), float(filled.max())],
        "z_after": [float(new_pos[:, 2].min()), float(new_pos[:, 2].max())],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
