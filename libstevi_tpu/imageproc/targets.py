"""Hexagonal RGB fiducial target detection.

Reference parity: `imageProcessing/hexagonalRGBTargetsDetection.h` —
`detectHexTargets` (:233): cluster saturated color blobs, take centroids,
validate the hexagonal arrangement (six peripheral blobs around a center)
geometrically.

Design: color thresholding + connected components run on device; the
small-candidate geometric validation is host-side.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp


@dataclass
class HexTarget:
    center: tuple
    corners: np.ndarray      # (6, 2) peripheral blob centroids (row, col)


def _blob_centroids(mask: np.ndarray, min_size: int = 4):
    from .connected_components import connected_components, cluster_stats
    stats = cluster_stats(connected_components(jnp.asarray(mask)))
    return [s["centroid"] for s in stats if s["size"] >= min_size]


def detect_hex_targets(image: np.ndarray, saturation_threshold: float = 0.5,
                       value_threshold: float = 0.3,
                       radius_tol: float = 0.35) -> list[HexTarget]:
    """image: (H, W, 3) RGB in [0, 1].  Returns detected hexagonal targets.
    """
    from .color import rgb_to_hsv
    hsv = np.asarray(rgb_to_hsv(jnp.asarray(image, jnp.float32)))
    colored = (hsv[..., 1] > saturation_threshold) \
        & (hsv[..., 2] > value_threshold)
    cents = np.asarray(_blob_centroids(colored))
    if len(cents) < 7:
        return []

    targets = []
    for i, c in enumerate(cents):
        d = np.linalg.norm(cents - c, axis=1)
        order = np.argsort(d)
        ring = order[1:7]
        if len(ring) < 6:
            continue
        r = d[ring]
        if r.max() <= 0:
            continue
        # hexagon: six roughly equidistant neighbors at ~60 degree spacing
        if (r.max() - r.min()) / r.mean() > radius_tol:
            continue
        vecs = cents[ring] - c
        angles = np.sort(np.arctan2(vecs[:, 0], vecs[:, 1]))
        gaps = np.diff(np.concatenate([angles, [angles[0] + 2 * np.pi]]))
        if np.abs(gaps - np.pi / 3).max() > np.pi / 6:
            continue
        targets.append(HexTarget(center=tuple(c), corners=cents[ring]))
    return targets
