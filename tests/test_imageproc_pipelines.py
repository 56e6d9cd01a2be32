"""Tests for the image-processing pipelines: L0, intrinsic decomposition,
shape from shading, checkerboard, hex targets, edges, fg segmentation."""

import numpy as np
import jax.numpy as jnp
import pytest

from libstevi_tpu.optim.l0 import l0_smoothing
from libstevi_tpu.imageproc.intrinsic_decomposition import \
    perform_intrinsic_image_decomposition
from libstevi_tpu.imageproc.shape_from_shading import (
    shape_from_shading, integrate_normals, estimate_light_direction)
from libstevi_tpu.imageproc.checkerboard import (detect_checkerboard,
                                                 checkerboard_response)
from libstevi_tpu.imageproc.targets import detect_hex_targets
from libstevi_tpu.imageproc.edges import (detect_edges, rasterize_line,
                                          rasterize_triangle)
from libstevi_tpu.imageproc.foreground_segmentation import (
    get_global_refined_mask, hierarchical_global_refined_mask, MaskInfo)


class TestL0:
    def test_flattens_noise_keeps_steps(self, rng):
        x = np.zeros((32, 32), np.float32)
        x[:, 16:] = 1.0
        noisy = x + rng.normal(0, 0.05, x.shape).astype(np.float32)
        out = np.asarray(l0_smoothing(jnp.asarray(noisy), lam=0.02))
        # noise flattened within regions
        assert out[:, :14].std() < noisy[:, :14].std() / 2
        # the step survives
        assert out[:, 20:].mean() - out[:, :12].mean() > 0.8


class TestIntrinsic:
    def test_separates_shading_gradient(self, rng):
        H, W = 32, 32
        refl = np.where(rng.random((H, W)) > 0.5, 0.9, 0.3).astype(np.float32)
        # make reflectance piecewise constant in blocks
        refl = np.kron(np.where(rng.random((8, 8)) > 0.5, 0.9, 0.3),
                       np.ones((4, 4))).astype(np.float32)
        shading = np.linspace(0.4, 1.0, W, dtype=np.float32)[None, :].repeat(H, 0)
        img = refl * shading
        dec = perform_intrinsic_image_decomposition(jnp.asarray(img))
        s = np.asarray(dec.shading)
        # recovered shading increases along the gradient direction
        assert s[:, -4:].mean() > s[:, :4].mean() * 1.2
        r = np.asarray(dec.reflectance)
        assert np.isfinite(r).all()


class TestShapeFromShading:
    def _dome(self, H=48, W=48):
        yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                             indexing="ij")
        z = np.sqrt(np.maximum(0.49 - xx ** 2 - yy ** 2, 0.0))
        n = np.stack([-np.gradient(z, axis=0), -np.gradient(z, axis=1),
                      np.ones_like(z)], -1)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        return z, n

    def test_integration_recovers_dome(self):
        z, n = self._dome()
        h = np.asarray(integrate_normals(jnp.asarray(n.astype(np.float32))))
        center = h[20:28, 20:28].mean()
        edge = (h[:4].mean() + h[-4:].mean()) / 2
        assert center - edge > 0.3   # dome shape from exact normals

    def test_refinement_reduces_shading_residual(self):
        # oblique light (vertical light leaves the concave/convex ambiguity)
        z, n = self._dome()
        light = np.array([0.3, 0.1, 0.95], np.float32)
        light /= np.linalg.norm(light)
        img = np.clip(n @ light, 0, 1).astype(np.float32)
        from libstevi_tpu.imageproc.shape_from_shading import \
            initial_normal_map, refine_normals
        n0 = initial_normal_map(jnp.asarray(img), jnp.asarray(light))
        nr = refine_normals(jnp.asarray(img), n0, light, iters=150)

        def resid(nn):
            shade = np.asarray(nn) @ light
            return float(((shade - img) ** 2).mean())

        assert resid(nr) < resid(n0) * 0.5
        assert resid(nr) < 1e-3

    def test_light_estimation(self, rng):
        n = rng.normal(size=(100, 3))
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        L = np.array([0.3, -0.2, 0.9], np.float32)
        I = n @ L
        got = np.asarray(estimate_light_direction(jnp.asarray(I),
                                                  jnp.asarray(n)))
        np.testing.assert_allclose(got, L, atol=1e-4)


class TestCheckerboard:
    def _board(self, sq=8, n=6, jitter=0):
        H = W = sq * n + 16
        img = np.zeros((H, W), np.float32)
        for i in range(n):
            for j in range(n):
                if (i + j) % 2 == 0:
                    img[8 + i * sq:8 + (i + 1) * sq,
                        8 + j * sq:8 + (j + 1) * sq] = 1.0
        return img

    def test_response_peaks_at_inner_corners(self):
        img = self._board()
        resp = np.asarray(checkerboard_response(jnp.asarray(img), 2))
        # response at an inner corner vs flat area
        assert resp[16, 16] > 10 * abs(resp[12, 12])

    def test_grid_detected(self):
        img = self._board()
        board = detect_checkerboard(jnp.asarray(img), radius=2, n_max=64)
        assert board is not None
        r, c, _ = board.corners.shape
        assert r >= 4 and c >= 4
        # lattice spacing ~ 8 px
        d = np.nanmean(np.linalg.norm(
            board.corners[:, 1:] - board.corners[:, :-1], axis=-1))
        assert abs(d - 8) < 1.0


class TestHexTargets:
    def test_synthetic_hex(self):
        img = np.zeros((64, 64, 3), np.float32)
        img[...] = 0.1
        center = np.array([32, 32])
        import math
        def blob(r, c, color):
            img[int(r) - 2:int(r) + 3, int(c) - 2:int(c) + 3] = color
        blob(32, 32, [1.0, 0.0, 0.0])
        for k in range(6):
            a = k * math.pi / 3
            blob(32 + 12 * math.sin(a), 32 + 12 * math.cos(a),
                 [0.0, 1.0, 0.0] if k % 2 else [0.0, 0.0, 1.0])
        targets = detect_hex_targets(img)
        assert len(targets) >= 1
        c = min(targets, key=lambda t: (t.center[0] - 32) ** 2
                + (t.center[1] - 32) ** 2)
        assert abs(c.center[0] - 32) < 2 and abs(c.center[1] - 32) < 2


class TestEdges:
    def test_step_edge_found(self):
        img = np.zeros((24, 24), np.float32)
        img[:, 12:] = 1.0
        e = np.asarray(detect_edges(jnp.asarray(img)))
        assert e[:, 10:14].any(axis=1).mean() > 0.9
        assert e[:, :8].mean() < 0.05

    def test_line_rasterization(self):
        px = rasterize_line((0, 0), (3, 7))
        assert tuple(px[0]) == (0, 0) and tuple(px[-1]) == (3, 7)
        assert len(px) == 8

    def test_triangle_rasterization(self):
        pix, w = rasterize_triangle((0, 0), (6, 0), (0, 6))
        assert len(pix) > 10
        np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-9)
        assert (w >= 0).all()


class TestFgSegmentation:
    def test_square_recovered(self, rng):
        H, W = 24, 24
        truth = np.zeros((H, W), bool)
        truth[8:16, 8:16] = True
        cost = np.zeros((H, W, 2), np.float32)
        noise = rng.normal(0, 0.3, (H, W))
        cost[..., 1] = np.where(truth, 0.2, 1.0) + noise   # fg label cost
        cost[..., 0] = np.where(truth, 1.0, 0.2) - noise   # bg label cost
        mask = get_global_refined_mask(cost, switch_cost=0.6)
        acc = (mask == truth.astype(int)).mean()
        assert acc > 0.97

    def test_hierarchical(self, rng):
        H, W = 32, 32
        truth = np.zeros((H, W), bool)
        truth[8:24, 8:24] = True
        def level_cost(h, w):
            t = truth[::H // h, ::W // w]
            c = np.zeros((h, w, 2), np.float32)
            c[..., 1] = np.where(t, 0.2, 1.0)
            c[..., 0] = np.where(t, 1.0, 0.2)
            return c
        costs = [level_cost(16, 16), level_cost(32, 32)]
        mask = hierarchical_global_refined_mask(costs, 0.4)
        acc = (mask == truth.astype(int)).mean()
        assert acc > 0.95
