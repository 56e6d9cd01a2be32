"""Stereo rig rectifier + statistics + graphs tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from libstevi_tpu.geometry.stereorigrectifier import StereoRigRectifier
from libstevi_tpu.geometry.rotations import rodrigues_formula
from libstevi_tpu.interpolation import resample_image
from libstevi_tpu.statistics import (compute_covering,
                                     compute_covering_proportion,
                                     matern_kernel)
from libstevi_tpu.graphs import max_flow_min_cut
from libstevi_tpu.core import DispDirection


class TestRigRectifier:
    def _rig(self, r=(0.0, 0.02, 0.01)):
        return StereoRigRectifier(
            r_cam2_to_cam1=np.asarray(r, np.float32),
            t_cam2_to_cam1=np.asarray([1.0, 0.02, 0.01], np.float32),
            f1=500.0, pp1=np.array([320.0, 240.0]), size1=(640, 480),
            f2=505.0, pp2=np.array([318.0, 242.0]), size2=(640, 480))

    @pytest.mark.parametrize("roi", ["minimal", "same", "maximal"])
    def test_compute_succeeds(self, roi):
        rig = self._rig()
        assert rig.compute(roi)
        assert rig.backward_cam1.shape[-1] == 2
        assert rig.backward_cam2.shape[:2] == rig.backward_cam1.shape[:2] \
            or True
        assert rig.normalized_baseline > 0
        assert np.isfinite(np.asarray(rig.backward_cam1)).all()

    def test_rectified_rows_are_epipolar(self):
        """After rectification, a 3-D point projects to the SAME row in both
        rectified cameras (the defining property)."""
        rig = self._rig()
        assert rig.compute("minimal")
        RC2 = np.asarray(rodrigues_formula(rig.r))
        t = np.asarray(rig.t)

        rng = np.random.default_rng(0)
        pts_c1 = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
        pts_c1[:, 2] += 6.0
        # cam2-to-cam1 pose: x_c1 = RC2 x_c2 + t => x_c2 = RC2^T (x_c1 - t)
        pts_c2 = (pts_c1 - t) @ RC2

        R1 = np.asarray(rig.corr_r_cam1)
        R2 = np.asarray(rig.corr_r_cam2)
        f = rig.reprojection_flen
        npp1 = np.asarray(rig.new_pp_cam1)
        npp2 = np.asarray(rig.new_pp_cam2)

        def rect_project(pts, R, npp):
            q = pts @ R   # R^T applied to rows == derotation
            h = q[:, :2] / q[:, 2:3]
            return f * h + npp

        p1 = rect_project(pts_c1, R1, npp1)
        p2 = rect_project(pts_c2, R2, npp2)
        assert np.abs(p1[:, 1] - p2[:, 1]).max() < 0.2  # same row

    def test_backward_map_resamples(self, rng):
        rig = self._rig()
        assert rig.compute("minimal")
        img = jnp.asarray(rng.uniform(0, 1, (480, 640)).astype(np.float32))
        rect = resample_image(img, rig.backward_cam1)
        assert rect.shape == rig.backward_cam1.shape[:2]
        assert bool(jnp.isfinite(rect).all())

    def test_degenerate_zero_baseline_rejected(self):
        rig = StereoRigRectifier(np.zeros(3, np.float32),
                                 np.zeros(3, np.float32), 500.0,
                                 np.array([320.0, 240.0]), (640, 480))
        assert not rig.compute("minimal")


class TestCovering:
    def test_perfect_coverage_integer_disp(self):
        H, W, d = 8, 32, 3
        disp_l = np.full((H, W), d, np.float32)
        disp_r = np.full((H, W), d, np.float32)
        cov = np.asarray(compute_covering(jnp.asarray(disp_l),
                                          jnp.asarray(disp_r)))
        # each left pixel j maps to source column j - d
        assert (cov[:, :W - d] == 1.0).all()
        assert (cov[:, W - d:] == 0.0).all()
        prop = float(compute_covering_proportion(jnp.asarray(disp_l),
                                                 jnp.asarray(disp_r)))
        assert prop == pytest.approx((W - d) / W)

    def test_matern(self):
        d = jnp.asarray([0.0, 1.0])
        for nu in (0.5, 1.5, 2.5):
            k = np.asarray(matern_kernel(d, nu))
            assert k[0] == pytest.approx(1.0)
            assert 0 < k[1] < 1


class TestMaxFlow:
    def test_simple_network(self):
        #  0 -> 1 -> 3
        #  0 -> 2 -> 3
        edges = [(0, 1), (1, 3), (0, 2), (2, 3), (1, 2)]
        caps = [3.0, 2.0, 2.0, 3.0, 1.0]
        res = max_flow_min_cut(4, edges, caps, 0, 3)
        assert res.max_flow == pytest.approx(5.0)
        assert res.source_side[0] and not res.source_side[3]

    def test_bottleneck_cut(self):
        edges = [(0, 1), (1, 2)]
        caps = [10.0, 1.0]
        res = max_flow_min_cut(3, edges, caps, 0, 2)
        assert res.max_flow == pytest.approx(1.0)
        assert res.cut_edges == [(1, 2)]

    def test_native_matches_scipy_bit_for_bit_on_integer_graphs(self):
        """The native float-capacity Boykov-Kolmogorov solver
        (`native/maxflow.cpp`, default backend) must agree EXACTLY with
        the scipy integer preflow-push cross-check wherever the int
        scaling is lossless, and both cuts must be optimal
        (cut capacity == flow)."""
        rng = np.random.default_rng(0)
        for trial in range(60):
            n = int(rng.integers(4, 25))
            m = int(rng.integers(3, 100))
            edges = rng.integers(0, n, (m, 2))
            edges = edges[edges[:, 0] != edges[:, 1]]
            caps = rng.integers(0, 20, len(edges)).astype(np.float64)
            a = max_flow_min_cut(n, edges, caps, 0, n - 1,
                                 backend="native")
            b = max_flow_min_cut(n, edges, caps, 0, n - 1,
                                 backend="scipy")
            assert a.max_flow == b.max_flow, trial
            for res in (a, b):
                cut = sum(caps[i] for i, (u, v)
                          in enumerate(map(tuple, edges))
                          if res.source_side[u]
                          and not res.source_side[v])
                assert cut == pytest.approx(res.max_flow, abs=1e-9)

    def test_native_float_capacities_no_quantization(self):
        """Float capacities run unscaled (`graph_flow.h:48` semantics):
        the returned flow equals the min-cut capacity summed in full
        double precision — impossible after int32 rounding."""
        rng = np.random.default_rng(1)
        for trial in range(30):
            n = int(rng.integers(4, 20))
            m = int(rng.integers(3, 80))
            edges = rng.integers(0, n, (m, 2))
            edges = edges[edges[:, 0] != edges[:, 1]]
            caps = rng.uniform(0, 1, len(edges)) * np.pi
            res = max_flow_min_cut(n, edges, caps, 0, n - 1,
                                   backend="native")
            cut = sum(caps[i] for i, (u, v) in enumerate(map(tuple, edges))
                      if res.source_side[u] and not res.source_side[v])
            assert cut == pytest.approx(res.max_flow, rel=1e-12, abs=1e-12)


class TestDCEL:
    """Planar-subdivision DCEL (`graphs/doublyConnectedEdgeLists.h`):
    incremental face construction over shared edges, with exterior
    boundary maintenance."""

    def test_two_triangles_share_an_edge(self):
        from libstevi_tpu.graphs.dcel import DoublyConnectedEdgeList
        d = DoublyConnectedEdgeList.with_vertices(4)
        f0 = d.make_face([0, 1, 2])
        assert f0 == 0
        assert d.n_edges == 6                      # 3 pairs
        # second triangle reuses the (2, 1) exterior twin of (1, 2)
        f1 = d.make_face([2, 1, 3])
        assert f1 == 1
        assert d.n_edges == 10                     # only 2 new pairs
        assert d.face_vertices(0) == [0, 1, 2] or \
            d.face_vertices(0) == [1, 2, 0] or d.face_vertices(0) == [2, 0, 1]
        vs1 = d.face_vertices(1)
        assert sorted(vs1) == [1, 2, 3] and len(vs1) == 3
        # shared edge: (1,2) belongs to f0, (2,1) to f1
        e12 = d.edge_between_vertices(1, 2)
        e21 = d.edge_between_vertices(2, 1)
        assert d.edges[e12].face == 0
        assert d.edges[e21].face == 1
        assert d.edges[e12].twin == e21

    def test_exterior_boundary_is_closed(self):
        from libstevi_tpu.graphs.dcel import DoublyConnectedEdgeList
        d = DoublyConnectedEdgeList.with_vertices(4)
        d.make_face([0, 1, 2])
        d.make_face([2, 1, 3])
        ext = d.exterior_cycle()
        # quad exterior: 4 boundary half-edges 0-2-3-1 (reversed winding)
        assert len(ext) == 4
        assert all(d.edges[e].face < 0 for e in ext)
        vs = [d.edges[e].vertex1 for e in ext]
        assert sorted(vs) == [0, 1, 2, 3]
        # prev/next are mutually consistent
        for e in ext:
            assert d.edges[d.edges[e].next].previous == e

    def test_rejects_face_over_owned_edge(self):
        from libstevi_tpu.graphs.dcel import DoublyConnectedEdgeList
        d = DoublyConnectedEdgeList.with_vertices(4)
        assert d.make_face([0, 1, 2]) == 0
        # (0, 1) already belongs to face 0
        assert d.make_face([0, 1, 3]) == -1
        assert d.n_faces == 1

    def test_quad_strip_full_tiling(self):
        """A 2x2 quad grid: 4 faces, interior edges shared, exterior = 8."""
        from libstevi_tpu.graphs.dcel import DoublyConnectedEdgeList
        d = DoublyConnectedEdgeList.with_vertices(9)

        def vid(r, c):
            return 3 * r + c
        for r in range(2):
            for c in range(2):
                fid = d.make_face([vid(r, c), vid(r, c + 1),
                                   vid(r + 1, c + 1), vid(r + 1, c)])
                assert fid == 2 * r + c
        assert d.n_faces == 4
        # 12 undirected edges = 24 half-edges
        assert d.n_edges == 24
        ext = d.exterior_cycle()
        assert len(ext) == 8
        # every interior half-edge pair spans two different faces
        for e in range(d.n_edges):
            t = d.edges[e].twin
            if d.edges[e].face >= 0 and d.edges[t].face >= 0:
                assert d.edges[e].face != d.edges[t].face

    def test_vertex_local_queries(self):
        from libstevi_tpu.graphs.dcel import DoublyConnectedEdgeList
        d = DoublyConnectedEdgeList.with_vertices(4)
        d.make_face([0, 1, 2])
        # vertex 0 has an exterior edge leaving it
        e = d.external_edge_leaving_from(0)
        assert e is not None and d.edges[e].face < 0
        ent, leav = d.exterior_edge_for_vertex(0)
        assert d.edges[ent].vertex2 == 0 and d.edges[leav].vertex1 == 0
        assert d.edge_between_vertices(0, 3) is None

    def test_face_size_constraint(self):
        from libstevi_tpu.graphs.dcel import DoublyConnectedEdgeList
        d = DoublyConnectedEdgeList.with_vertices(4, face_size=3)
        assert d.make_face([0, 1, 2, 3]) == -1
        assert d.make_face([0, 1, 2]) == 0
