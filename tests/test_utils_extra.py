"""Tests for utils, on-demand volumes, compressor unfold, BSP/BVH, sensor
frames, poses math, GUI adapter."""

import numpy as np
import jax.numpy as jnp
import pytest

from libstevi_tpu.core.utils import (Contiguity, PropagationDirection,
                                     IndexPairMap,
                                     accumulation_extended_dtype,
                                     equivalent_one_for_normalizing,
                                     NumbersCache)
from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.core.search import SearchOffset1
from libstevi_tpu.ops import unfold
from libstevi_tpu.ops.on_demand import (CachelessOnDemandStereoCostVolume,
                                        OnDemandFeaturesVolume)
from libstevi_tpu.ops.compressor import (UnFoldCompressor, unfold_compressed,
                                         grpix17r3_filter, grpix17r4_filter)
from libstevi_tpu.ops.cost_volume import normalize_feature_volume
from libstevi_tpu.geometry.bsp import GenericBSP, GenericBVH
from libstevi_tpu.geometry.sensorframes import (RAS, FLU, NED, ENU,
                                                get_sensor_frame_conversion)
from libstevi_tpu.geometry.posesmath import compute_rotation_speed


class TestUtils:
    def test_contiguity_counts(self):
        assert len(Contiguity.QUEEN.offsets) == 8
        assert len(Contiguity.ROOK.offsets) == 4
        assert len(Contiguity.BISHOP.offsets) == 4

    def test_index_pair_map_symmetric(self):
        m = IndexPairMap()
        m[(3, 7)] = "x"
        assert m[(7, 3)] == "x" and (7, 3) in m

    def test_type_promotions(self):
        assert accumulation_extended_dtype(jnp.uint8) == jnp.int16
        assert equivalent_one_for_normalizing(jnp.int16) == 1 << 14

    def test_numbers_cache_deterministic(self):
        a = NumbersCache(seed=3)
        b = NumbersCache(seed=3)
        a.seed(5)
        b.seed(5)
        assert [a() for _ in range(4)] == [b() for _ in range(4)]


class TestOnDemand:
    def test_cost_field_matches_dense(self, rng):
        img_l = rng.uniform(0, 1, (12, 20)).astype(np.float32)
        img_r = rng.uniform(0, 1, (12, 20)).astype(np.float32)
        func = MatchingFunction.ZNCC
        fl = normalize_feature_volume(func, unfold(1, 1, jnp.asarray(img_l)))
        fr = normalize_feature_volume(func, unfold(1, 1, jnp.asarray(img_r)))
        from libstevi_tpu.ops.cost_volume import aggregate_cost
        dense = np.asarray(aggregate_cost(func, fl, fr, 6))
        odcv = CachelessOnDemandStereoCostVolume(func, fr, fl,
                                                 SearchOffset1(0, 5))
        for d in (0, 3, 5):
            field = np.asarray(odcv.cost_field(
                jnp.full((12, 20), d, jnp.int32)))
            inner = np.s_[:, :20 - d]
            np.testing.assert_allclose(field[inner], dense[..., d][inner],
                                       rtol=1e-5, atol=1e-6)

    def test_truncated_from_field(self, rng):
        img = rng.uniform(0, 1, (10, 16)).astype(np.float32)
        func = MatchingFunction.SSD
        f = normalize_feature_volume(func, unfold(1, 1, jnp.asarray(img)))
        odcv = CachelessOnDemandStereoCostVolume(func, f, f,
                                                 SearchOffset1(0, 4))
        disp = jnp.zeros((10, 16), jnp.int32)
        tcv = np.asarray(odcv.truncated_cost_volume(disp, 1))
        assert tcv.shape == (10, 16, 3)
        np.testing.assert_allclose(tcv[:, 2:-2, 1], 0.0, atol=1e-6)

    def test_features_volume_offsets(self, rng):
        img = rng.uniform(0, 1, (8, 8)).astype(np.float32)
        v = OnDemandFeaturesVolume([(0, 0), (0, 1), (1, 0)],
                                   jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(v.feature_vector(3, 4)),
                                   [img[3, 4], img[3, 5], img[4, 4]],
                                   rtol=1e-6)


class TestCompressor:
    def test_grpix_masks_have_17_features(self):
        for mask in (grpix17r3_filter(), grpix17r4_filter()):
            comp = UnFoldCompressor(mask)
            assert comp.n_features == 17

    def test_compressed_unfold_group_means(self, rng):
        img = rng.uniform(0, 1, (12, 14)).astype(np.float32)
        comp = UnFoldCompressor(grpix17r3_filter())
        out = np.asarray(unfold_compressed(comp, jnp.asarray(img)))
        assert out.shape == (12, 14, 17)
        # feature 0 (label 1) is the center pixel itself
        np.testing.assert_allclose(out[..., 0], img, rtol=1e-6)
        # feature 1 (label 2) is the mean of (3,2) and (3,1) offsets
        i, j = 6, 7
        want = (img[i, j - 1] + img[i, j - 2]) / 2
        assert out[i, j, 1] == pytest.approx(want, rel=1e-5)


class TestBsp:
    def test_nearest_and_range(self, rng):
        pts = rng.uniform(0, 1, (200, 3))
        bsp = GenericBSP(pts)
        q = np.array([0.5, 0.5, 0.5])
        k = bsp.nearest(q)
        brute = int(np.argmin(((pts - q) ** 2).sum(1)))
        assert k == brute
        lo, hi = np.full(3, 0.2), np.full(3, 0.4)
        got = set(bsp.range_query(lo, hi).tolist())
        want = set(np.nonzero(np.all((pts >= lo) & (pts <= hi), 1))[0].tolist())
        assert got == want

    def test_bvh_query(self, rng):
        lo = rng.uniform(0, 0.8, (50, 3))
        boxes = np.stack([lo, lo + 0.1], 1)
        bvh = GenericBVH(boxes)
        got = set(bvh.query_box([0.4, 0.4, 0.4], [0.5, 0.5, 0.5]).tolist())
        want = {i for i in range(50)
                if np.all(boxes[i, 1] >= 0.4) and np.all(boxes[i, 0] <= 0.5)}
        assert got == want


class TestSensorFrames:
    def test_round_trip(self):
        M = get_sensor_frame_conversion(NED, ENU)
        Mi = get_sensor_frame_conversion(ENU, NED)
        np.testing.assert_allclose(M @ Mi, np.eye(3), atol=1e-12)

    def test_ned_to_enu(self):
        M = get_sensor_frame_conversion(NED, ENU)
        # NED (1, 0, 0) = north -> ENU (0, 1, 0)
        np.testing.assert_allclose(M @ [1, 0, 0], [0, 1, 0], atol=1e-12)
        np.testing.assert_allclose(M @ [0, 0, 1], [0, 0, -1], atol=1e-12)


class TestPosesMath:
    def test_rotation_speed(self):
        r1 = jnp.asarray([0.0, 0.0, 0.1])
        r2 = jnp.asarray([0.0, 0.0, 0.3])
        w = np.asarray(compute_rotation_speed(r1, r2, 0.5))
        np.testing.assert_allclose(w, [0, 0, 0.4], atol=1e-5)


class TestOnDemandMemoization:
    def test_plane_granular_memoization(self, rng):
        """`GenericOnDemandCostVolume` semantics
        (`on_demand_cost_volume.h:105-181`): compute and memory grow with
        the queried disparities, not the full volume; repeated access
        reuses the cache."""
        from libstevi_tpu.ops.on_demand import OnDemandStereoCostVolume
        img = rng.uniform(0, 1, (10, 16)).astype(np.float32)
        func = MatchingFunction.SSD
        f = normalize_feature_volume(func, unfold(1, 1, jnp.asarray(img)))
        od = OnDemandStereoCostVolume(func, f, f, SearchOffset1(0, 7))
        assert od.n_computed_planes == 0
        v = od.cost_value((3, 4), 2)
        assert od.n_computed_planes == 1
        assert abs(float(v) - float(od.cost_value((5, 5), 2))) >= 0
        assert od.n_computed_planes == 1          # same plane reused
        # out-of-range queries return None without computing anything
        assert od.cost_value((0, 0), 9) is None
        assert od.cost_value((0, 15), 3) is None
        assert od.n_computed_planes == 1
        # self-match at d=0: zero cost
        assert abs(float(od.cost_value((4, 4), 0))) < 1e-6
        assert od.n_computed_planes == 2

    def test_memoized_field_matches_direct(self, rng):
        from libstevi_tpu.ops.on_demand import OnDemandStereoCostVolume
        img = rng.uniform(0, 1, (8, 12)).astype(np.float32)
        func = MatchingFunction.ZNCC
        f = normalize_feature_volume(func, unfold(1, 1, jnp.asarray(img)))
        od = OnDemandStereoCostVolume(func, f, f, SearchOffset1(0, 5))
        disp = jnp.asarray(rng.integers(0, 6, (8, 12)), jnp.int32)
        direct = np.asarray(od.cost_field(disp))
        memo = np.asarray(od.cost_field(disp, memoize=True))
        np.testing.assert_allclose(memo, direct, rtol=1e-5, atol=1e-6)
        assert od.n_computed_planes == len(np.unique(np.asarray(disp)))
