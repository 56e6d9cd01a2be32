"""Sparse matching tests: corners, NMS, orientation, descriptors, and the
full sparse -> pose chain (`testSparseMatchingUtils.cpp` pattern)."""

import numpy as np
import jax.numpy as jnp
import pytest

from libstevi_tpu.sparse import (harris_corner_score,
                                 windowed_harris_corner_score,
                                 fast_corner_detection,
                                 non_local_maximum_point_selection,
                                 intensity_oriented_coordinates,
                                 brief_descriptor,
                                 whitened_pixels_descriptor,
                                 random_sampling_pattern)
from libstevi_tpu.optim import optimal_assignment


def _checker_corner_image():
    """A single high-contrast corner at (16, 16)."""
    img = np.zeros((32, 32), np.float32)
    img[:16, :16] = 1.0
    return img


class TestHarris:
    def test_detects_checker_corner(self):
        img = _checker_corner_image()
        score = np.asarray(harris_corner_score(jnp.asarray(img), 1))
        peak = np.unravel_index(np.argmax(score), score.shape)
        assert abs(peak[0] - 15.5) < 2.5 and abs(peak[1] - 15.5) < 2.5

    def test_flat_image_zero(self):
        img = np.full((16, 16), 0.5, np.float32)
        score = np.asarray(windowed_harris_corner_score(jnp.asarray(img), 2))
        np.testing.assert_allclose(score, 0.0, atol=1e-6)

    def test_edge_scores_below_corner(self):
        img = _checker_corner_image()
        score = np.asarray(harris_corner_score(jnp.asarray(img), 1))
        corner_score = score[14:18, 14:18].max()
        edge_score = score[5, 14:18].max()   # along the vertical edge
        assert corner_score > 3 * edge_score


class TestFast:
    def test_detects_bright_dot(self):
        img = np.zeros((20, 20), np.float32)
        img[10, 10] = 0.0
        img[:, :] = 0.5
        img[10, 10] = 1.0
        det = np.asarray(fast_corner_detection(jnp.asarray(img), 0.2))
        assert det[10, 10]
        assert det.sum() == 1

    def test_flat_none(self):
        img = np.full((20, 20), 0.3, np.float32)
        det = np.asarray(fast_corner_detection(jnp.asarray(img), 0.1))
        assert det.sum() == 0


class TestNms:
    def test_selects_separated_peaks(self):
        s = np.zeros((30, 30), np.float32)
        s[5, 5] = 3.0
        s[6, 6] = 2.5      # within radius of the first -> suppressed
        s[20, 20] = 2.0
        s[5, 25] = 1.0
        coords, vals, valid = non_local_maximum_point_selection(
            jnp.asarray(s), radius=4.0, n_points=3, threshold=0.5)
        coords = np.asarray(coords)[np.asarray(valid)]
        got = {(int(c[1]), int(c[0])) for c in coords}  # (row, col)
        assert got == {(5, 5), (20, 20), (5, 25)}


class TestOrientation:
    def test_gradient_direction(self):
        img = np.tile(np.arange(16, dtype=np.float32), (16, 1))  # bright right
        dirs = np.asarray(intensity_oriented_coordinates(
            jnp.asarray([[8, 8]]), jnp.asarray(img), 3))
        # centroid pulled toward +col
        assert dirs[0, 1] > 0.9 and abs(dirs[0, 0]) < 0.1


class TestDescriptors:
    def test_brief_shift_invariance(self, rng):
        img = rng.uniform(0, 1, (40, 40)).astype(np.float32)
        pairs = random_sampling_pattern(64, 4, seed=1)
        c1 = jnp.asarray([[15.0, 15.0]])
        c2 = jnp.asarray([[15.0, 20.0]])
        d_same = brief_descriptor(c1, jnp.asarray(img), pairs)
        d_same2 = brief_descriptor(c1, jnp.asarray(img), pairs)
        d_other = brief_descriptor(c2, jnp.asarray(img), pairs)
        np.testing.assert_array_equal(np.asarray(d_same), np.asarray(d_same2))
        assert (np.asarray(d_same) != np.asarray(d_other)).any()

    def test_whitened_is_standardized(self, rng):
        img = rng.uniform(0, 1, (30, 30)).astype(np.float32)
        d = np.asarray(whitened_pixels_descriptor(
            jnp.asarray([[12.0, 14.0], [20.0, 9.0]]), jnp.asarray(img), 3))
        np.testing.assert_allclose(d.mean(-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(d.std(-1), 1.0, atol=1e-4)


class TestSparseChain:
    def test_detect_describe_match_known_shift(self, rng):
        """Corners detected in a shifted image pair must match across the
        known translation (the sparse->pose chain of SURVEY.md §3.6)."""
        img = rng.uniform(0, 1, (64, 64)).astype(np.float32)
        # strong blobs to create corners
        for (i, j) in [(10, 12), (30, 40), (50, 20), (40, 55), (18, 45)]:
            img[i - 1:i + 2, j - 1:j + 2] += 2.0
        shift = 4
        img2 = np.roll(img, shift, axis=1)

        def keypoints(im, n=5):
            s = windowed_harris_corner_score(jnp.asarray(im), 2, 1)
            coords, _, valid = non_local_maximum_point_selection(
                s, 5.0, n, 1e-4)
            return np.asarray(coords)[np.asarray(valid)]  # (k, 2) [x, y]

        k1 = keypoints(img)
        k2 = keypoints(img2)
        assert len(k1) >= 4 and len(k2) >= 4

        def desc(im, kps):
            c = jnp.asarray(kps[:, ::-1].copy())  # (row, col)
            return np.asarray(whitened_pixels_descriptor(
                c, jnp.asarray(im), 3))

        d1 = desc(img, k1)
        d2 = desc(img2, k2)
        costs = ((d1[:, None, :] - d2[None, :, :]) ** 2).sum(-1)
        ri, ci = optimal_assignment(costs)
        dx = k2[ci, 0] - k1[ri, 0]
        dy = k2[ci, 1] - k1[ri, 1]
        good = (np.abs(dx - shift) < 1.5) & (np.abs(dy) < 1.5)
        assert good.mean() >= 0.8


def test_circular_fft_descriptor_rotation_invariant(rng):
    """90-degree rotation maps each ring onto itself with a circular shift
    (n_per_ring % 4 == 0), so the FFT-amplitude descriptor is unchanged
    (`pointsDescriptors.h:525` family)."""
    from libstevi_tpu.sparse.descriptors import circular_fft_descriptor
    img = rng.uniform(0, 1, (48, 48)).astype(np.float32)
    img_rot = np.rot90(img).copy()          # (i, j) -> (47 - j, i)
    pts = np.array([[20.0, 30.0], [25.0, 17.0]], np.float32)
    pts_rot = np.stack([47.0 - pts[:, 1], pts[:, 0]], -1)
    d0 = np.asarray(circular_fft_descriptor(jnp.asarray(pts),
                                            jnp.asarray(img)))
    d1 = np.asarray(circular_fft_descriptor(jnp.asarray(pts_rot),
                                            jnp.asarray(img_rot)))
    np.testing.assert_allclose(d0, d1, rtol=1e-4, atol=1e-4)

    # different content -> different descriptor (not trivially constant)
    d2 = np.asarray(circular_fft_descriptor(
        jnp.asarray(np.array([[10.0, 10.0]], np.float32)), jnp.asarray(img)))
    assert np.abs(d0[0] - d2[0]).max() > 1e-3
