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

    def test_nonlocal_texture_retinex_recovers_ramp(self, rng):
        """Reference-parity RGB solver
        (`intrinsicImageDecomposition.h:60-545`): exact reconstruction and
        the smooth shading ramp lands in the shading channel."""
        from libstevi_tpu.imageproc.intrinsic_decomposition import \
            retinex_with_nonlocal_texture_constraint
        H = W = 32
        base = rng.uniform(0.2, 1.0, (4, 4, 3))
        refl = np.kron(base, np.ones((8, 8, 1)))[:H, :W]
        shading = np.linspace(0.3, 1.0, W, dtype=np.float32)[None, :, None]
        img = (refl * shading).astype(np.float32)
        dec = retinex_with_nonlocal_texture_constraint(jnp.asarray(img),
                                                       2e-3)
        S = np.asarray(dec.shading)
        R = np.asarray(dec.reflectance)
        assert np.isfinite(S).all() and np.isfinite(R).all()
        # decomposition is exact: R * S == img
        np.testing.assert_allclose(R * S, img, atol=1e-4)
        # recovered shading column profile follows the true ramp
        prof = S[:, :, 0].mean(0)
        corr = np.corrcoef(prof, shading[0, :, 0])[0, 1]
        assert corr > 0.95, corr
        # reflectance is near-constant inside each block despite the ramp
        blk = R[2:6, 2:6, 0]
        assert blk.std() / blk.mean() < 0.1

    def test_auto_retinex_sweeps_thresholds(self, rng):
        from libstevi_tpu.imageproc.intrinsic_decomposition import \
            auto_retinex_with_nonlocal_texture_constraint
        H = W = 24
        refl = np.kron(rng.uniform(0.3, 1.0, (3, 3, 3)),
                       np.ones((8, 8, 1)))[:H, :W]
        shading = np.linspace(0.4, 1.0, H, dtype=np.float32)[:, None, None]
        img = (refl * shading * 255).astype(np.float32)
        dec = auto_retinex_with_nonlocal_texture_constraint(
            jnp.asarray(img))
        assert dec is not None
        assert np.isfinite(np.asarray(dec.shading)).all()


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


class TestShapeFromShadingReference:
    """Reference-parity SFS surface (`shapeFromShading.h:34-1215`) on a
    rendered hemisphere with exact analytic normals.  Channel order is the
    reference's (x = columns, y = rows, z up)."""

    @staticmethod
    def _dome(H=48, W=48, light=(0.35, 0.15, 0.92)):
        ci, cj, R = H / 2 - .5, W / 2 - .5, H * 1.2
        ii, jj = np.mgrid[0:H, 0:W].astype(np.float64)
        r2 = (ii - ci) ** 2 + (jj - cj) ** 2
        z = np.sqrt(np.maximum(R * R - r2, 1e-6))
        n = np.stack([(jj - cj) / R, (ii - ci) / R, z / R], -1)
        lhat = np.asarray(light, np.float64)
        lhat /= np.linalg.norm(lhat)
        s = np.clip(n @ lhat / lhat[2], 0, 1).astype(np.float32)
        return s, n.astype(np.float32), lhat.astype(np.float32), z

    @staticmethod
    def _ang(n, n_true):
        nn = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        return np.degrees(np.arccos(np.clip((nn * n_true).sum(-1), -1, 1)))

    def test_initial_estimate_properties(self):
        from libstevi_tpu.imageproc.shape_from_shading import \
            initial_normal_map_estimate
        s, n_true, lhat, _ = self._dome()
        n0 = np.asarray(initial_normal_map_estimate(jnp.asarray(s),
                                                    jnp.asarray(lhat)))
        assert np.isfinite(n0).all()
        assert (n0[..., 2] >= 0).all()              # upward-z override
        np.testing.assert_allclose(np.linalg.norm(n0, axis=-1), 1.0,
                                   atol=1e-4)       # quadratic is |n|=1
        assert self._ang(n0, n_true).mean() < 70    # far better than random

    def test_single_shading_solver_converges(self):
        from libstevi_tpu.imageproc.shape_from_shading import (
            initial_normal_map_estimate, normal_map_from_single_shading_image)
        s, n_true, lhat, _ = self._dome()
        nr = np.asarray(normal_map_from_single_shading_image(
            jnp.asarray(s), jnp.asarray(lhat), n_iter=30))
        assert np.isfinite(nr).all()
        np.testing.assert_allclose(np.linalg.norm(nr, axis=-1), 1.0,
                                   atol=1e-5)
        n0 = np.asarray(initial_normal_map_estimate(jnp.asarray(s),
                                                    jnp.asarray(lhat)))

        # Gauss-Newton beats the greedy initial estimate on angular error
        assert self._ang(nr, n_true).mean() < self._ang(n0, n_true).mean()
        assert self._ang(nr, n_true).mean() < 35

    def test_intrinsic_decomposition_solver(self):
        from libstevi_tpu.imageproc.shape_from_shading import (
            initial_normal_map_estimate, normal_map_from_intrinsic_decomposition)
        s, n_true, lhat, _ = self._dome()
        guide = np.stack([s] * 3, -1)
        nd = np.asarray(normal_map_from_intrinsic_decomposition(
            jnp.asarray(s), jnp.asarray(guide), jnp.asarray(lhat), n_iter=30))
        assert np.isfinite(nd).all()
        np.testing.assert_allclose(np.linalg.norm(nd, axis=-1), 1.0,
                                   atol=1e-5)
        n0 = np.asarray(initial_normal_map_estimate(jnp.asarray(s),
                                                    jnp.asarray(lhat)))
        assert (self._ang(nd, n_true).mean()
                < self._ang(n0, n_true).mean() + 1)  # never worse than init

    def test_height_from_normal_map_matches_analytic(self):
        from libstevi_tpu.imageproc.shape_from_shading import \
            height_from_normal_map
        s, n_true, lhat, z = self._dome()
        h = np.asarray(height_from_normal_map(jnp.asarray(n_true)))
        assert abs(h[0, 0]) < 1e-3                  # anchor
        H, W = z.shape
        got = h[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4].mean() \
            - (h[:3].mean() + h[-3:].mean()) / 2
        want = z[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4].mean() \
            - (z[:3].mean() + z[-3:].mean()) / 2
        # reference integrates +n/nz (shapeFromShading.h:905), so the
        # recovered relief is the negated surface
        np.testing.assert_allclose(got, -want, rtol=0.02)

    def test_rectify_normal_map(self):
        from libstevi_tpu.imageproc.shape_from_shading import \
            rectify_normal_map
        tilted = np.broadcast_to(np.asarray([0.3, 0.2, 0.93], np.float32),
                                 (32, 32, 3))
        mask = np.ones((32, 32), bool)
        out = np.asarray(rectify_normal_map(jnp.asarray(tilted),
                                            jnp.asarray(mask)))
        mean = out.reshape(-1, 3).mean(0)
        np.testing.assert_allclose(mean / np.linalg.norm(mean),
                                   [0, 0, 1], atol=1e-4)

    def test_flatten_height_map(self):
        from libstevi_tpu.imageproc.shape_from_shading import \
            flatten_height_map_in_area_of_interest
        H = W = 48
        ii, jj = np.mgrid[0:H, 0:W].astype(np.float64)
        r2 = (ii - H / 2) ** 2 + (jj - W / 2) ** 2
        mask = r2 < (H * 0.4) ** 2
        plane = (0.2 * ii + 0.1 * jj + 3 + np.exp(-r2 / 50)).astype(np.float32)
        fl = np.asarray(flatten_height_map_in_area_of_interest(
            jnp.asarray(plane), jnp.asarray(mask)))
        assert (fl[~mask] == 0).all()
        assert abs(fl[mask].min()) < 1e-5           # shifted to zero
        assert fl[H // 2, W // 2] > fl[mask].mean()  # bump survives deplaning

    def test_flatten_ensure_convex_majority_rule(self):
        """ensure_convex replicates the reference's majority vote on the
        sign of the SMOOTHED plane-removed height
        (`shapeFromShading.h:1050-1075`): the flip puts MOST of the
        masked region above the fitted plane.  A narrow peak over a wide
        tail therefore inverts (wide plateau + dent), and a wide plateau
        with a narrow pit stays."""
        from libstevi_tpu.imageproc.shape_from_shading import \
            flatten_height_map_in_area_of_interest
        H = W = 48
        ii, jj = np.mgrid[0:H, 0:W].astype(np.float64)
        r2 = (ii - H / 2) ** 2 + (jj - W / 2) ** 2
        mask = r2 < (H * 0.4) ** 2
        dome = np.exp(-r2 / 50).astype(np.float32)
        # narrow peak -> majority below plane -> flipped to a dent
        fl = np.asarray(flatten_height_map_in_area_of_interest(
            jnp.asarray(dome), jnp.asarray(mask), ensure_convex=True))
        assert fl[H // 2, W // 2] < fl[mask].mean()
        # narrow pit -> majority above plane -> kept as-is
        fl = np.asarray(flatten_height_map_in_area_of_interest(
            jnp.asarray(-dome), jnp.asarray(mask), ensure_convex=True))
        assert fl[H // 2, W // 2] < fl[mask].mean()

    def test_estimate_light_direction_ramp_semantics(self):
        from libstevi_tpu.imageproc.shape_from_shading import \
            estimate_light_direction_from_shading
        H = W = 48
        jj = np.mgrid[0:H, 0:W][1].astype(np.float32)
        ramp = 0.2 + 0.6 * jj / W
        got = np.asarray(estimate_light_direction_from_shading(
            jnp.asarray(ramp)))
        # documented reference convention (`:1203-1207`): x = -dir_cols,
        # y = +dir_rows, z = 1 (45-degree elevation)
        np.testing.assert_allclose(got, [-1.0, 0.0, 1.0], atol=1e-3)

    def test_gradient_based_edges(self):
        from libstevi_tpu.imageproc.shape_from_shading import \
            gradient_based_edges
        img = np.zeros((40, 40, 3), np.float32)
        img[:, 20:] = 1.0
        mask, grads = gradient_based_edges(jnp.asarray(img), 0.1)
        m = np.asarray(mask)
        assert 0.05 <= m.mean() <= 0.16              # ~prop_edges selected
        cols = np.where(m.any(0))[0]
        assert set(cols) <= {19, 20, 21}             # edges sit on the step
        g = np.asarray(grads)
        assert (np.abs(g[..., 0][m]) > 0).all()      # column gradient
        assert (g[~m] == 0).all()


class TestCheckerboard:
    """Rendered boards with exact analytic corner GT: the detector must
    survive blur / rotation / perspective and localize sub-0.1 px
    (`checkBoardDetection.h:870,1003,1086,1412`)."""

    @staticmethod
    def _render(H=200, W=260, n_sq=(6, 8), theta=0.0, persp=(0.0, 0.0),
                sharp=2.0, origin=(30.0, 30.0), sq=24.0):
        """Projective checkerboard: board coords (u, v) map to pixels via
        x = origin + sq * R(theta) @ (u, v) / w, w = 1 + persp . (u, v).
        Intensity 0.5 + 0.45 tanh(sharp * sin(pi u) sin(pi v)) — corners
        are exact saddles at integer (u, v).  Returns (img, gt) with gt
        the (rows, cols, 2) interior-corner pixel coords."""
        nv, nu = n_sq
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
        c, s_ = np.cos(theta), np.sin(theta)
        # invert the map pixel -> board: iterate (projective, mild persp)
        u = ((xx - origin[0]) * c + (yy - origin[1]) * s_) / sq
        v = (-(xx - origin[0]) * s_ + (yy - origin[1]) * c) / sq
        for _ in range(8):
            w = 1.0 + persp[0] * u + persp[1] * v
            u = ((xx - origin[0]) * c + (yy - origin[1]) * s_) / sq * w
            v = (-(xx - origin[0]) * s_ + (yy - origin[1]) * c) / sq * w
        inside = (u >= 0) & (u <= nu) & (v >= 0) & (v <= nv)
        field = np.sin(np.pi * u) * np.sin(np.pi * v)
        # white quiet zone outside the board (realistic print): outer
        # board corners become L-junctions the section filter rejects
        img = np.where(inside, 0.5 + 0.45 * np.tanh(sharp * field), 0.95)
        gt = np.zeros((nv - 1, nu - 1, 2))
        for a in range(1, nv):
            for b in range(1, nu):
                w = 1.0 / (1.0 + persp[0] * b + persp[1] * a)
                bu, bv = b * w, a * w
                gt[a - 1, b - 1] = (origin[0] + sq * (c * bu - s_ * bv),
                                    origin[1] + sq * (s_ * bu + c * bv))
        return img.astype(np.float32), gt

    @staticmethod
    def _accuracy(board, gt):
        det = board.corners.reshape(-1, 2)
        det = det[np.isfinite(det[:, 0])]
        gtf = gt.reshape(-1, 2)
        d = np.linalg.norm(det[:, None] - gtf[None], axis=-1).min(1)
        return det, d

    def test_response_is_saddle_at_corners(self):
        from libstevi_tpu.imageproc.checkerboard import checkerboard_response
        img, gt = self._render()
        resp, lmin, lmax, _ = map(np.asarray,
                                  checkerboard_response(jnp.asarray(img)))
        i, j = int(round(gt[2, 3, 1])), int(round(gt[2, 3, 0]))
        assert resp[i, j] < 0 and lmin[i, j] < 0 < lmax[i, j]

    def test_fronto_parallel_subpixel(self):
        img, gt = self._render(sharp=2.0)
        board = detect_checkerboard(jnp.asarray(img))
        assert board is not None
        # the grid must contain the full interior lattice (border corners
        # against the quiet zone may legitimately extend it)
        assert board.corners.shape[0] >= gt.shape[0]
        assert board.corners.shape[1] >= gt.shape[1]
        det = board.corners.reshape(-1, 2)
        det = det[np.isfinite(det[:, 0])]
        # every interior GT corner matched sub-0.1 px
        d_gt = np.linalg.norm(gt.reshape(-1, 2)[:, None] - det[None],
                              axis=-1).min(1)
        assert d_gt.mean() < 0.1, d_gt.mean()
        assert d_gt.max() < 0.3, d_gt.max()

    def test_rotated_perspective_blur(self):
        from scipy.ndimage import gaussian_filter
        img, gt = self._render(theta=0.42, persp=(0.01, -0.008), sharp=3.0)
        img = gaussian_filter(img, 1.0)
        board = detect_checkerboard(jnp.asarray(img))
        assert board is not None
        det = board.corners.reshape(-1, 2)
        det = det[np.isfinite(det[:, 0])]
        d_gt = np.linalg.norm(gt.reshape(-1, 2)[:, None] - det[None],
                              axis=-1).min(1)
        # nearly all interior GT corners found, localized well despite
        # blur + rotation + perspective
        assert (d_gt < 1.0).mean() > 0.95
        assert d_gt[d_gt < 1.0].mean() < 0.15, d_gt[d_gt < 1.0].mean()

    def test_filter_rejects_non_checker_corners(self):
        from libstevi_tpu.imageproc.checkerboard import (
            checkerboard_corner_candidates, filter_checkerboard_candidates)
        # one isolated black square: its 4 corners are L-corners, not
        # checkerboard saddles; the 8-section filter must reject them
        img = np.full((64, 64), 1.0, np.float32)
        img[24:40, 24:40] = 0.0
        from scipy.ndimage import gaussian_filter
        img = gaussian_filter(img, 1.0)
        cands = checkerboard_corner_candidates(jnp.asarray(img))
        if len(cands):
            thr = 0.05 * float((-cands.lmin).max())
            cands = cands[(cands.lmin <= -thr) & (cands.lmax >= thr)]
        kept = filter_checkerboard_candidates(img, cands)
        assert len(kept) == 0

    def test_hierarchical_upsample_refinement(self):
        from libstevi_tpu.imageproc.checkerboard import (
            checkerboard_corner_candidates, filter_checkerboard_candidates,
            isolate_checkerboard, fit_checkerboard_corners_hierarchical)
        from libstevi_tpu.interpolation import average_pooling_downsample
        img, gt = self._render(H=400, W=520, sq=48.0, origin=(60, 60),
                               theta=0.1, sharp=2.0)
        small = np.asarray(average_pooling_downsample(jnp.asarray(img), 2))
        cands = checkerboard_corner_candidates(jnp.asarray(small))
        thr = 0.05 * float((-cands.lmin).max())
        cands = cands[(cands.lmin <= -thr) & (cands.lmax >= thr)]
        cands = filter_checkerboard_candidates(small, cands)
        board = isolate_checkerboard(cands)
        assert board is not None
        idx = board._candidate_idx
        ks = idx[idx >= 0]
        pos = fit_checkerboard_corners_hierarchical(
            [jnp.asarray(small), jnp.asarray(img)],
            np.asarray(cands.x)[ks], np.asarray(cands.y)[ks],
            np.asarray(cands.main_dir)[ks], upscaling_factor=2.0)
        det = np.asarray(pos)
        d_gt = np.linalg.norm(gt.reshape(-1, 2)[:, None] - det[None],
                              axis=-1).min(1)
        assert d_gt.mean() < 0.1, d_gt.mean()


class TestHexTargets:
    """Reference-style targets: six colored dots on hexagon corners on
    white paper, exactly one main-color (blue) reference dot, the others
    encoding bits as red (positive) / green (negative)
    (`hexagonalRGBTargetsDetection.h:233`)."""

    COLORS = {"r": (1.0, 0.08, 0.08), "g": (0.08, 1.0, 0.08),
              "b": (0.08, 0.08, 1.0)}

    @classmethod
    def _render(cls, center=(32.0, 32.0), radius=12.0, phase=0.3,
                code="bggrgr", H=64, W=64, dot_rad=2.6):
        img = np.ones((H, W, 3), np.float32)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
        gt = []
        for k, ch in enumerate(code):
            a = phase + k * np.pi / 3
            r = center[0] + radius * np.sin(a)
            c = center[1] + radius * np.cos(a)
            m = (yy - r) ** 2 + (xx - c) ** 2 <= dot_rad ** 2
            img[m] = cls.COLORS[ch]
            gt.append((r, c, ch))
        return img, gt

    def test_detects_and_decodes(self):
        img, gt = self._render()
        targets = detect_hex_targets(img, rel_max_hex_diameter=0.45)
        assert len(targets) == 1
        t = targets[0]
        # reference dot is the blue one, sub-pixel accurate
        br, bc, _ = next(g for g in gt if g[2] == "b")
        assert abs(t.pos_ref_dot[0] - br) < 0.5
        assert abs(t.pos_ref_dot[1] - bc) < 0.5
        # the five bit dots decode red=positive in angular order: derive
        # the expected order with the same angle convention
        pts = np.asarray([(g[0], g[1]) for g in gt])
        ctr = pts.mean(0)
        ang = np.arctan2(pts[:, 0] - ctr[0], pts[:, 1] - ctr[1])
        main = next(i for i, g in enumerate(gt) if g[2] == "b")
        ang = ang - ang[main]
        ang = np.where(ang < 0, 2 * np.pi + ang, ang)
        ang[main] = 0.0
        order = np.argsort(ang, kind="stable")[1:]
        want_bits = [gt[i][2] == "r" for i in order]
        assert list(t.dots_positives) == want_bits
        for k, i in enumerate(order):
            assert np.linalg.norm(t.dots_positions[k]
                                  - np.asarray(gt[i][:2])) < 0.5

    def test_rejects_non_hexagonal_layouts(self):
        # six dots on a line fail the ellipse validation
        img = np.ones((64, 96, 3), np.float32)
        yy, xx = np.mgrid[0:64, 0:96].astype(np.float64)
        for k in range(6):
            m = (yy - 32) ** 2 + (xx - (26 + 8 * k)) ** 2 <= 2.6 ** 2
            img[m] = self.COLORS["r" if k else "b"]
        assert detect_hex_targets(img, rel_max_hex_diameter=0.45) == []

    def test_requires_single_main_dot(self):
        img, _ = self._render(code="bbgrgr")   # two blue dots
        assert detect_hex_targets(img, rel_max_hex_diameter=0.45) == []


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


def test_hex_ellipse_rejects_parallel_rows():
    """Two parallel rows of three dots fit a degenerate conic, not an
    ellipse — the discriminant test must reject the false hexagon."""
    import numpy as np
    from libstevi_tpu.imageproc.targets import detect_hex_targets
    img = np.ones((64, 96, 3), np.float32)
    pts = [(20, 20), (20, 44), (20, 68), (44, 20), (44, 44), (44, 68)]
    cols = [(0.1, 0.1, 0.9), (0.9, 0.1, 0.1), (0.1, 0.9, 0.1),
            (0.9, 0.1, 0.1), (0.1, 0.9, 0.1), (0.9, 0.1, 0.1)]
    for (y, x), c in zip(pts, cols):
        img[y - 2:y + 3, x - 2:x + 3] = c
    assert detect_hex_targets(img) == []


def test_texture_chains_rotation_invariant(rng):
    """Non-local texture clustering aligns 90/180/270-degree-rotated
    patch copies into the seed frame (orient = seed_orient + 4 - o):
    the chain coefficients must match the unrotated-copy baseline
    (`intrinsicImageDecomposition.h:265-464`)."""
    import numpy as np
    from libstevi_tpu.imageproc.intrinsic_decomposition import (
        _texture_chains, _rg_chromaticity)

    def build(rot):
        img = np.full((20, 20, 3), 0.5, np.float32)
        patch = np.random.default_rng(5).uniform(
            0.2, 0.9, (5, 5, 3)).astype(np.float32)
        img[3:8, 3:8] = patch
        img[12:17, 12:17] = np.rot90(patch, k=rot) if rot else patch
        log = np.log(np.maximum(img, 1e-8))
        return _texture_chains(_rg_chromaticity(log), log, 0.002)

    base = build(0)
    for rot in (1, 2, 3):
        got = build(rot)
        assert len(got[0]) == len(base[0])
        np.testing.assert_allclose(np.abs(got[2]).mean(),
                                   np.abs(base[2]).mean(), rtol=0.05)
