"""Keypoint descriptors: BRIEF, whitened pixels, oriented variants.

Reference parity: `sparseMatching/pointsDescriptors.h` — sampling-pattern
generators (:76-208: random uniform pairs, dense windows, radial patterns),
`BriefDescriptor` (:244: comparison pairs rotated by the keypoint's main
direction, bit-packed into uint32 words), `WhitenedPixelsDescriptor` (:323:
window pixels standardized per keypoint) and the oriented variant (:401).

TPU design: keypoints batch with vmap; each descriptor is a handful of
bilinear samples of the padded image — gathers of O(N_kp * n_samples),
negligible next to the dense pipelines.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..interpolation.interpolation import bilinear_sample


def random_sampling_pattern(n_pairs: int, radius: int,
                            seed: int = 0) -> np.ndarray:
    """(n_pairs, 2, 2) of (row, col) offsets, uniform in the window
    (`generateRandomComparisonPairs`, `pointsDescriptors.h:76`)."""
    rng = np.random.default_rng(seed)
    return rng.uniform(-radius, radius, (n_pairs, 2, 2)).astype(np.float32)


def dense_sampling_pattern(radius: int) -> np.ndarray:
    """All (2r+1)^2 window offsets, row-major (`pointsDescriptors.h:124`)."""
    d = np.arange(-radius, radius + 1)
    ii, jj = np.meshgrid(d, d, indexing="ij")
    return np.stack([ii.ravel(), jj.ravel()], -1).astype(np.float32)


def radial_sampling_pattern(n_rings: int, n_per_ring: int,
                            radius: float) -> np.ndarray:
    """Rings of samples at equal angular spacing (`pointsDescriptors.h:170`)."""
    offs = []
    for k in range(1, n_rings + 1):
        rad = radius * k / n_rings
        for a in range(n_per_ring):
            th = 2 * np.pi * a / n_per_ring
            offs.append((rad * np.sin(th), rad * np.cos(th)))
    return np.asarray(offs, np.float32)


def _rot(dirs: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices aligning the sampling frame with the keypoint
    direction; theta = atan2(d_row, d_col) (`pointsDescriptors.h:272`)."""
    theta = jnp.arctan2(dirs[:, 0], dirs[:, 1])
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    # [[c, s], [-s, c]] rotates offsets INTO the keypoint frame: for
    # direction (1, 0) (theta=90deg) the (0, 1) tap maps to (1, 0).
    # The transpose rotated by -theta, breaking rotation invariance
    # (oriented descriptors of a 90deg-rotated patch anti-correlated).
    return jnp.stack([jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], -2)


def _sample(img: jnp.ndarray, coords: jnp.ndarray, offsets: jnp.ndarray,
            rot: jnp.ndarray | None):
    """Bilinear samples at keypoint + (optionally rotated) offsets.
    coords (N, 2) float (row, col); offsets (M, 2); returns (N, M)."""
    x = img.astype(jnp.float32)
    if x.ndim == 3:
        x = jnp.mean(x, -1)
    if rot is not None:
        offs = jnp.einsum("nab,mb->nma", rot, offsets)
    else:
        offs = jnp.broadcast_to(offsets[None], (coords.shape[0],)
                                + offsets.shape)
    pts = coords[:, None, :] + offs
    return bilinear_sample(x, pts)


def brief_descriptor(coords: jnp.ndarray, img: jnp.ndarray,
                     pairs: np.ndarray,
                     directions: jnp.ndarray | None = None) -> jnp.ndarray:
    """BRIEF bits: bit k = sample(pair_k[0]) < sample(pair_k[1]), packed into
    uint32 words (`BriefDescriptor`, `pointsDescriptors.h:244-321`).
    coords (N, 2) float (row, col); pairs (P, 2, 2).  Returns (N, ceil(P/32))
    uint32."""
    pairs = jnp.asarray(pairs)
    rot = _rot(directions) if directions is not None else None
    s0 = _sample(img, coords, pairs[:, 0, :], rot)
    s1 = _sample(img, coords, pairs[:, 1, :], rot)
    bits = (s0 < s1).astype(jnp.uint32)            # (N, P)
    P = bits.shape[1]
    n_words = -(-P // 32)
    padded = jnp.pad(bits, ((0, 0), (0, n_words * 32 - P)))
    padded = padded.reshape(bits.shape[0], n_words, 32)
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(padded * weights, -1, dtype=jnp.uint32)


def whitened_pixels_descriptor(coords: jnp.ndarray, img: jnp.ndarray,
                               radius: int = 3,
                               directions: jnp.ndarray | None = None
                               ) -> jnp.ndarray:
    """Window pixels standardized per keypoint (zero mean, unit variance)
    (`WhitenedPixelsDescriptor`, `pointsDescriptors.h:323-399`)."""
    offsets = jnp.asarray(dense_sampling_pattern(radius))
    rot = _rot(directions) if directions is not None else None
    s = _sample(img, coords, offsets, rot)
    mean = jnp.mean(s, -1, keepdims=True)
    std = jnp.std(s, -1, keepdims=True)
    return (s - mean) / jnp.where(std > 0, std, 1.0)


def oriented_whitened_pixels_descriptor(coords: jnp.ndarray,
                                        img: jnp.ndarray,
                                        directions: jnp.ndarray,
                                        radius: int = 3) -> jnp.ndarray:
    """(`OrientedWhitenedPixelsDescriptor`, `pointsDescriptors.h:401+`)."""
    return whitened_pixels_descriptor(coords, img, radius, directions)


def circular_fft_descriptor(coords: jnp.ndarray, img: jnp.ndarray,
                            n_rings: int = 4, n_per_ring: int = 16,
                            radius: float = 6.0) -> jnp.ndarray:
    """Rotation-invariant circular-FFT amplitude descriptor
    (`pointsDescriptors.h:525`): sample each ring at uniform angles and keep
    the FFT magnitude per ring (rotation = circular shift = phase only), with
    per-ring mean/contrast normalization."""
    offsets = jnp.asarray(radial_sampling_pattern(n_rings, n_per_ring,
                                                  radius))
    s = _sample(img, coords, offsets, None)          # (N, n_rings*n_per_ring)
    s = s.reshape(s.shape[0], n_rings, n_per_ring)
    mean = jnp.mean(s, -1, keepdims=True)
    std = jnp.std(s, -1, keepdims=True)
    s = (s - mean) / jnp.where(std > 1e-6, std, 1.0)
    amp = jnp.abs(jnp.fft.rfft(s, axis=-1))          # (N, rings, n//2+1)
    return amp.reshape(amp.shape[0], -1)
