"""Smoke tests for the CLI tool layer (reference `examples/` parity:
`examples/CMakeLists.txt` builds 23 tools; each tool here runs in-process
on small synthetic fixtures)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "cli"))

DATA = os.path.join(os.path.dirname(__file__), "data", "parity")


def _capture(capsys):
    lines = capsys.readouterr().out.strip().splitlines()
    start = max(i for i, l in enumerate(lines) if l.lstrip().startswith("{"))
    return json.loads("\n".join(lines[start:]))


class TestStereoMatchCli:
    def test_sgm_on_parity_pair(self, tmp_path, capsys):
        import stereo_match
        rc = stereo_match.main([
            os.path.join(DATA, "left_small.stevimg"),
            os.path.join(DATA, "right_small.stevimg"),
            "-o", str(tmp_path / "d.stevimg"), "-d", "32", "-m", "zncc",
            "--matcher", "sgm", "--refine", "parabola", "--radius", "2",
            "--gt", os.path.join(DATA, "gt_small.stevimg")])
        assert rc in (0, None)
        rep = _capture(capsys)
        assert rep["prop_good_2.0"] > 0.97

    def test_sgm16_on_parity_pair(self, tmp_path, capsys):
        """16-direction end-to-end through the CLI reaches the same
        accuracy class as 8 directions on the fixture."""
        import stereo_match
        rc = stereo_match.main([
            os.path.join(DATA, "left_small.stevimg"),
            os.path.join(DATA, "right_small.stevimg"),
            "-o", str(tmp_path / "d16.stevimg"), "-d", "32", "-m", "zncc",
            "--matcher", "sgm", "--sgm-dirs", "16", "--refine", "parabola",
            "--radius", "2",
            "--gt", os.path.join(DATA, "gt_small.stevimg")])
        assert rc in (0, None)
        rep = _capture(capsys)
        assert rep["prop_good_2.0"] > 0.97


class TestIoPointcloudCli:
    def test_info_and_convert(self, tmp_path, capsys, rng):
        import io_pointcloud
        from libstevi_tpu.io import PointCloud, save_point_cloud
        n = 200
        cloud = PointCloud(
            rng.uniform(-10, 10, (n, 3)),
            {"intensity": rng.integers(0, 100, n).astype(np.uint16),
             "gps_time": rng.uniform(0, 1, n)})
        src = str(tmp_path / "a.las")
        save_point_cloud(src, cloud)
        io_pointcloud.main(["info", src])
        rep = _capture(capsys)
        assert rep["n_points"] == n
        assert rep["format"].startswith("LAS")
        dst = str(tmp_path / "b.pcd")
        io_pointcloud.main(["convert", src, dst, "--drop", "gps_time",
                            "--rename", "intensity=amp"])
        rep = _capture(capsys)
        assert rep["n_points"] == n
        assert "amp" in rep["attributes"]
        assert "gps_time" not in rep["attributes"]
        from libstevi_tpu.io import open_point_cloud
        back = open_point_cloud(dst)
        np.testing.assert_allclose(back.positions, cloud.positions,
                                   atol=1e-3)

    def test_map(self, tmp_path, capsys, rng):
        """examples/io_map/main.cpp: geometry-aware attribute mapping."""
        import io_pointcloud
        from libstevi_tpu.io import PointCloud, save_point_cloud
        n = 50
        pos = rng.uniform(-10, 10, (n, 3))
        cloud = PointCloud(pos, {"intensity":
                                 rng.integers(0, 100, n).astype(np.uint16)})
        src = str(tmp_path / "a.las")
        dst = str(tmp_path / "b.las")
        save_point_cloud(src, cloud)
        io_pointcloud.main(["map", src, dst, "--map", "x=y", "y=x",
                            "z=newZ"])
        rep = _capture(capsys)
        assert "newZ" in rep["attributes"]
        g0 = rep["first_point_before"]["geometry"]
        g1 = rep["first_point_after"]["geometry"]
        assert abs(g1[0] - g0[1]) < 1e-3 and abs(g1[1] - g0[0]) < 1e-3
        assert g1[2] == 0.0
        from libstevi_tpu.io import open_point_cloud
        back = open_point_cloud(dst)
        np.testing.assert_allclose(back.positions[:, 0], pos[:, 1], atol=1e-3)
        np.testing.assert_allclose(back.attributes["newZ"], pos[:, 2],
                                   atol=1e-3)


class TestDepthMapCli:
    def test_projection(self, tmp_path, capsys, rng):
        import points_cloud2depth_map
        from libstevi_tpu.io import PointCloud, save_point_cloud, read_image
        # a fronto-parallel plane of points at z = 5
        g = np.stack(np.meshgrid(np.linspace(-2, 2, 80),
                                 np.linspace(-1.5, 1.5, 60),
                                 indexing="xy"), -1).reshape(-1, 2)
        pts = np.concatenate([g, np.full((len(g), 1), 5.0)], -1)
        src = str(tmp_path / "plane.las")
        save_point_cloud(src, PointCloud(pts, {}))
        out = str(tmp_path / "depth.stevimg")
        points_cloud2depth_map.main([src, out, "--size", "48", "64",
                                     "--f", "60", "--inpaint"])
        rep = _capture(capsys)
        assert rep["coverage"] > 0.5
        depth = np.asarray(read_image(out, np.float32))
        center = depth[20:28, 28:36]
        np.testing.assert_allclose(center, 5.0, atol=0.05)


class TestTiePointsCli:
    def test_matches_and_pose(self, capsys):
        import tie_points
        tie_points.main([os.path.join(DATA, "left_small.stevimg"),
                         os.path.join(DATA, "right_small.stevimg"),
                         "-n", "96", "--f", "120"])
        rep = _capture(capsys)
        assert rep["n_matches"] >= 8
        if "n_inliers" in rep:
            assert rep["n_inliers"] >= 8


class TestBgFgStereoCli:
    def test_foreground_detected(self, tmp_path, capsys, rng):
        import bg_fg_stereo
        from libstevi_tpu.io import write_image
        H, W, d_bg, d_fg = 48, 72, 3, 9
        bg_r = rng.uniform(0.1, 1.0, (H, W)).astype(np.float32)
        bg_l = np.roll(bg_r, d_bg, axis=1)
        live_r = bg_r.copy()
        # a textured square moved to the foreground disparity
        sq = rng.uniform(0.1, 1.0, (16, 16)).astype(np.float32)
        live_r[16:32, 24:40] = sq
        live_l = np.roll(live_r, d_bg, axis=1)
        live_l[16:32, 24 + d_fg:40 + d_fg] = sq
        paths = {}
        for nm, img in (("bl", bg_l), ("br", bg_r), ("ll", live_l),
                        ("lr", live_r)):
            paths[nm] = str(tmp_path / f"{nm}.stevimg")
            write_image(paths[nm], img)
        bg_fg_stereo.main([paths["bl"], paths["br"], paths["ll"],
                           paths["lr"], "-d", "16",
                           "-o", str(tmp_path / "disp.stevimg"),
                           "--mask-out", str(tmp_path / "mask.stevimg")])
        rep = _capture(capsys)
        assert 0.0 < rep["fg_fraction"] < 0.5


class TestCheckerboardCli:
    def test_detects_rendered_board(self, tmp_path, capsys):
        import detect_checkerboard
        from libstevi_tpu.io import write_image
        from test_imageproc_pipelines import TestCheckerboard
        img, gt = TestCheckerboard._render()
        p = str(tmp_path / "board.stevimg")
        write_image(p, img)
        rc = detect_checkerboard.main([p, "-o",
                                       str(tmp_path / "corners.json")])
        assert rc == 0
        rep = _capture(capsys)
        assert rep["found"] and rep["n_points"] >= 35


class TestNormalMapCli:
    def test_dome_normals_and_height(self, tmp_path, capsys):
        import normal_map_estimation
        from libstevi_tpu.io import write_stevimg
        H = W = 40
        ii, jj = np.mgrid[0:H, 0:W].astype(np.float64)
        R = H * 1.2
        z = np.sqrt(np.maximum(R * R - (ii - H / 2) ** 2 - (jj - W / 2) ** 2,
                               1e-6))
        n = np.stack([(jj - W / 2) / R, (ii - H / 2) / R, z / R], -1)
        l = np.asarray([0.3, 0.1, 0.95])
        l /= np.linalg.norm(l)
        img = np.clip(n @ l / l[2], 0, 1).astype(np.float32)
        p = str(tmp_path / "dome.stevimg")
        write_stevimg(p, img)
        rc = normal_map_estimation.main([
            p, "-o", str(tmp_path / "n.stevimg"),
            "--height", str(tmp_path / "h.stevimg"),
            "--light", str(l[0]), str(l[1]), str(l[2]), "--n-iter", "10"])
        assert rc in (0, None)
        rep = _capture(capsys)
        assert rep["mean_up"] > 0.6
        assert (tmp_path / "n.stevimg").exists()
        assert (tmp_path / "h.stevimg").exists()


class TestIntrinsicCli:
    def test_rgb_decomposition(self, tmp_path, capsys, rng):
        import intrinsic_decomposition
        from libstevi_tpu.io import write_stevimg
        refl = np.kron(rng.uniform(0.3, 1.0, (3, 3, 3)),
                       np.ones((8, 8, 1)))[:20, :20]
        sh = np.linspace(0.4, 1.0, 20, dtype=np.float32)[None, :, None]
        p = str(tmp_path / "img.stevimg")
        write_stevimg(p, (refl * sh).astype(np.float32))
        rc = intrinsic_decomposition.main([
            p, "--reflectance", str(tmp_path / "r.stevimg"),
            "--shading", str(tmp_path / "s.stevimg")])
        assert rc in (0, None)
        rep = _capture(capsys)
        assert rep["shading_shape"][:2] == [20, 20]
        assert (tmp_path / "r.stevimg").exists()


class TestOpticalFlowRefineCli:
    def test_subpixel_flow_recovered(self, tmp_path, capsys, rng):
        import optical_flow_refine
        from libstevi_tpu.io import write_stevimg, write_flo
        from scipy.ndimage import map_coordinates
        H = W = 32
        base = rng.uniform(0.1, 1, (H + 4, W + 4)).astype(np.float32)
        k = np.ones(3) / 3
        base = np.apply_along_axis(
            lambda r: np.convolve(r, k, "same"), 1, base)
        tgt = base[:H, :W]
        ys, xs = np.mgrid[0:H, 0:W]
        di, dj = 0.3, 0.6
        src = map_coordinates(base, [ys + di, xs + dj],
                              order=1).astype(np.float32)
        p0, p1 = str(tmp_path / "i0.stevimg"), str(tmp_path / "i1.stevimg")
        write_stevimg(p0, src)
        write_stevimg(p1, tgt)
        gt = np.zeros((H, W, 2), np.float32)
        gt[..., 0], gt[..., 1] = dj, di          # .flo is (u=dx, v=dy)
        pg = str(tmp_path / "gt.flo")
        write_flo(pg, gt)
        rc = optical_flow_refine.main([p0, p1, "-r", "2", "-s", "2",
                                       "--gt", pg,
                                       "-o", str(tmp_path / "out.flo")])
        assert rc in (0, None)
        rep = _capture(capsys)
        assert rep["epe_mean"] < 0.45            # refined below integer WTA
        assert rep["prop_inlier"] > 0.95


class TestStereoRefineCli:
    def test_methods_report(self, tmp_path, capsys):
        import stereo_refine
        rc = stereo_refine.main([
            os.path.join(DATA, "left_small.stevimg"),
            os.path.join(DATA, "right_small.stevimg"),
            "-d", "32", "-r", "2",
            "--gt", os.path.join(DATA, "gt_small.stevimg"),
            "-o", str(tmp_path / "ref.stevimg")])
        assert rc in (0, None)
        rep = _capture(capsys)
        # raw WTA (no SGM) leaves outliers on this pair; like the
        # reference's refine test (:145) judge sub-pixel quality on the
        # inlier set
        for m in ("barycentric", "barycentric-symmetric", "cost-symmetric"):
            assert rep[m]["prop_good_1.0"] > 0.45, (m, rep[m])
        # feature-space barycentric beats the parabola cost triplet —
        # the comparison the reference's tool exists to demonstrate
        assert rep["barycentric"]["inlier_mae"] < 0.2
        assert rep["barycentric-symmetric"]["inlier_mae"] < 0.2
        assert rep["cost-symmetric"]["inlier_mae"] < 0.5
        assert (tmp_path / "ref.stevimg").exists()


class TestSplitPtCloudCli:
    def test_tiles_with_context(self, tmp_path, capsys, rng):
        import split_pt_cloud
        from libstevi_tpu.io.pointcloud_io import (PointCloud, save_point_cloud,
                                                   open_point_cloud)
        pos = rng.uniform(0, 100, (400, 3))
        cloud = PointCloud(pos, {"intensity": rng.uniform(
            0, 1, 400).astype(np.float32)})
        p = str(tmp_path / "cloud.las")
        save_point_cloud(p, cloud)
        rc = split_pt_cloud.main([p, "-o", str(tmp_path / "tile"),
                                  "-n", "2", "2", "-c", "10"])
        assert rc in (0, None)
        rep = _capture(capsys)
        assert len(rep["tiles"]) == 4
        n_own = sum(t["n_own"] for t in rep["tiles"])
        assert n_own == 400                      # own points partition
        t0 = open_point_cloud(rep["tiles"][0]["path"])
        assert t0.n_points == (rep["tiles"][0]["n_own"]
                               + rep["tiles"][0]["n_context"])
        assert "is_context" in t0.attributes


class TestViewerCli:
    def test_stats_and_render(self, tmp_path, capsys, rng):
        import stevimg_viewer
        from libstevi_tpu.io import write_stevimg, read_image
        img = rng.uniform(0, 2, (16, 20)).astype(np.float32)
        p = str(tmp_path / "a.stevimg")
        write_stevimg(p, img)
        rc = stevimg_viewer.main([p, "-o", str(tmp_path / "v.stevimg"),
                                  "--colormap", "gray"])
        assert rc in (0, None)
        rep = _capture(capsys)
        assert rep["shape"] == [16, 20]
        assert abs(rep["max"] - img.max()) < 1e-5
        view = np.asarray(read_image(str(tmp_path / "v.stevimg")))
        assert view.shape == (16, 20, 3)


class TestDetrendCli:
    def test_removes_terrain_trend(self, tmp_path, capsys, rng):
        import detrend_terrain
        from libstevi_tpu.io.pointcloud_io import (PointCloud,
                                                   save_point_cloud,
                                                   open_point_cloud)
        n = 600
        xy = rng.uniform(0, 50, (n, 2))
        ground = 0.5 * xy[:, 0] + 0.2 * xy[:, 1]          # sloped terrain
        height = rng.uniform(0, 3, n) * (rng.random(n) < 0.3)
        pos = np.column_stack([xy, ground + height])
        p = str(tmp_path / "c.las")
        save_point_cloud(p, PointCloud(pos, {}))
        out = str(tmp_path / "flat.las")
        rc = detrend_terrain.main([p, "-o", out, "--tile", "5",
                                   "--smooth", "0"])
        assert rc in (0, None)
        rep = _capture(capsys)
        flat = open_point_cloud(out)
        z = flat.positions[:, 2]
        # the 25-unit slope is gone: heights sit near zero (tile
        # quantization of the slope remains within a tile's z span)
        assert z.max() < 8.0
        assert np.median(np.abs(z)) < 3.0
        assert rep["n_points"] == n


class TestRayAlignmentEvalCli:
    def test_solvers_recover_transform(self, capsys):
        import ray_alignment_eval
        rc = ray_alignment_eval.main(["-n", "4", "--rays", "50",
                                      "--noise", "0.001"])
        assert rc in (0, None)
        rep = _capture(capsys)
        assert rep["gauss-newton"]["rot_deg_median"] < 1.0
        assert rep["relaxed"]["rot_deg_median"] < 2.0

    def test_robust_survives_outliers(self, capsys):
        import ray_alignment_eval
        rc = ray_alignment_eval.main(["-n", "3", "--rays", "60",
                                      "--outliers", "0.2",
                                      "--solvers", "robust", "relaxed"])
        assert rc in (0, None)
        rep = _capture(capsys)
        # RANSAC shrugs off the scrambled 20%; the linear relaxation
        # degrades
        assert rep["robust"]["rot_deg_median"] < 2.0
