"""Image-processing layer tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from libstevi_tpu.imageproc import (
    convolve_2d, PaddingType, gaussian_blur, finite_difference,
    rgb_to_gray, rgb_to_hsv, hsv_to_rgb, yuv_to_rgb, normalize_channels,
    Histogram, otsu_threshold, erosion, dilation, opening, closing,
    median_filter, circular_structuring_element, connected_components,
    nearest_neighbor_inpainting, diffusion_inpainting,
    FourierTransformCalculator, mean_shift_clustering,
)
from libstevi_tpu.imageproc.convolutions import PaddingInfos
from libstevi_tpu.imageproc.connected_components import (relabel_consecutive,
                                                         cluster_stats)


class TestConvolutions:
    def test_identity_kernel(self, rng):
        img = rng.uniform(0, 1, (8, 10)).astype(np.float32)
        k = np.zeros((3, 3), np.float32)
        k[1, 1] = 1.0
        pads = (PaddingInfos(1), PaddingInfos(1))
        got = np.asarray(convolve_2d(jnp.asarray(img), jnp.asarray(k), pads))
        np.testing.assert_allclose(got, img, atol=1e-6)

    def test_box_kernel_matches_numpy(self, rng):
        img = rng.uniform(0, 1, (9, 9)).astype(np.float32)
        k = np.ones((3, 3), np.float32)
        pads = (PaddingInfos(1), PaddingInfos(1))
        got = np.asarray(convolve_2d(jnp.asarray(img), jnp.asarray(k), pads))
        want = np.zeros_like(img)
        p = np.pad(img, 1)
        for di in range(3):
            for dj in range(3):
                want += p[di:di + 9, dj:dj + 9]
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_mirror_padding(self):
        img = np.arange(16, dtype=np.float32).reshape(4, 4)
        k = np.zeros((3, 1), np.float32)
        k[0, 0] = 1.0  # picks the row above
        pads = (PaddingInfos(1, mode=PaddingType.MIRROR), PaddingInfos(0))
        got = np.asarray(convolve_2d(jnp.asarray(img), jnp.asarray(k), pads))
        np.testing.assert_allclose(got[0], img[1])  # reflect

    def test_gaussian_blur_preserves_mean(self, rng):
        img = rng.uniform(0, 1, (32, 32)).astype(np.float32)
        out = np.asarray(gaussian_blur(jnp.asarray(img), 1.5))
        assert abs(out.mean() - img.mean()) < 1e-2
        assert out.std() < img.std()


class TestColor:
    def test_hsv_round_trip(self, rng):
        rgb = rng.uniform(0, 1, (10, 10, 3)).astype(np.float32)
        back = np.asarray(hsv_to_rgb(rgb_to_hsv(jnp.asarray(rgb))))
        np.testing.assert_allclose(back, rgb, atol=1e-5)

    def test_gray_weights(self):
        g = float(rgb_to_gray(jnp.asarray([1.0, 1.0, 1.0])))
        assert g == pytest.approx(1.0, abs=1e-6)

    def test_yuv_identity_gray(self):
        rgb = np.asarray(yuv_to_rgb(jnp.asarray([[0.5, 0.5, 0.5]])))
        np.testing.assert_allclose(rgb, [[0.5, 0.5, 0.5]], atol=1e-6)

    def test_normalize_channels(self, rng):
        x = rng.uniform(0.1, 1, (5, 5, 3)).astype(np.float32)
        n = np.asarray(normalize_channels(jnp.asarray(x)))
        np.testing.assert_allclose(n.sum(-1), 1.0, atol=1e-5)


class TestHistogram:
    def test_counts(self):
        data = jnp.asarray([0.0, 0.1, 0.9, 1.0])
        h = Histogram.compute(data, 2, 0.0, 1.0)
        np.testing.assert_array_equal(np.asarray(h.counts), [2, 2])

    def test_otsu_bimodal(self, rng):
        data = np.concatenate([rng.normal(0.2, 0.02, 500),
                               rng.normal(0.8, 0.02, 500)]).astype(np.float32)
        t = float(otsu_threshold(jnp.asarray(data)))
        # the between-class variance is flat across the empty gap, so any
        # threshold separating the modes is a valid argmax
        assert ((data < t) == (data < 0.5)).mean() > 0.999


class TestMorphology:
    def test_erosion_dilation_duality(self, rng):
        img = (rng.random((12, 12)) > 0.5).astype(np.float32)
        e = np.asarray(erosion(jnp.asarray(img), radius=1))
        d = np.asarray(dilation(jnp.asarray(-img), radius=1))
        np.testing.assert_allclose(e, -d, atol=1e-6)

    def test_opening_removes_speck(self):
        img = np.zeros((11, 11), np.float32)
        img[5, 5] = 1.0  # single-pixel speck
        img[1:4, 1:8] = 1.0  # solid block survives
        o = np.asarray(opening(jnp.asarray(img), radius=1))
        assert o[5, 5] == 0.0
        assert o[2, 4] == 1.0

    def test_circular_element(self):
        el = circular_structuring_element(2)
        assert el[2, 2] and el[0, 2] and not el[0, 0]

    def test_median_filter_removes_salt(self, rng):
        img = np.full((9, 9), 0.5, np.float32)
        img[4, 4] = 5.0
        m = np.asarray(median_filter(jnp.asarray(img), 1))
        assert m[4, 4] == 0.5


class TestConnectedComponents:
    def test_two_blobs(self):
        m = np.zeros((10, 10), bool)
        m[1:3, 1:3] = True
        m[6:9, 6:9] = True
        lab, k = relabel_consecutive(connected_components(jnp.asarray(m)))
        assert k == 2
        assert len({lab[1, 1], lab[7, 7]}) == 2
        assert lab[0, 0] == -1

    def test_rook_vs_queen_diagonal(self):
        m = np.zeros((4, 4), bool)
        m[0, 0] = m[1, 1] = True
        _, kq = relabel_consecutive(connected_components(jnp.asarray(m),
                                                         "queen"))
        _, kr = relabel_consecutive(connected_components(jnp.asarray(m),
                                                         "rook"))
        assert kq == 1 and kr == 2

    def test_stats(self):
        m = np.zeros((6, 6), bool)
        m[2:4, 2:4] = True
        stats = cluster_stats(connected_components(jnp.asarray(m)))
        assert stats[0]["size"] == 4
        assert stats[0]["centroid"] == (2.5, 2.5)


class TestInpainting:
    def test_nn_fill_constant_region(self):
        img = np.ones((8, 8), np.float32) * 3.0
        mask = np.zeros((8, 8), bool)
        mask[3:5, 3:5] = True
        img[mask] = -99.0
        out = np.asarray(nearest_neighbor_inpainting(jnp.asarray(img),
                                                     jnp.asarray(mask)))
        np.testing.assert_allclose(out, 3.0, atol=1e-6)

    def test_diffusion_interpolates_gradient(self):
        img = np.tile(np.linspace(0, 1, 16, dtype=np.float32), (8, 1))
        mask = np.zeros((8, 16), bool)
        mask[:, 6:10] = True
        corrupted = img.copy()
        corrupted[mask] = 0.0
        out = np.asarray(diffusion_inpainting(jnp.asarray(corrupted),
                                              jnp.asarray(mask), iters=500))
        np.testing.assert_allclose(out, img, atol=0.02)


class TestFourier:
    def test_round_trip(self, rng):
        img = rng.uniform(0, 1, (16, 16)).astype(np.float32)
        f = FourierTransformCalculator()
        back = np.asarray(f.backward(f.forward(jnp.asarray(img)))).real
        np.testing.assert_allclose(back, img, atol=1e-5)


class TestMeanShift:
    def test_two_clusters(self, rng):
        a = rng.normal(0.0, 0.05, (30, 2))
        b = rng.normal(3.0, 0.05, (30, 2))
        x = np.concatenate([a, b]).astype(np.float32)
        modes, labels = mean_shift_clustering(jnp.asarray(x), 0.5)
        labs = np.asarray(labels)
        assert len(set(labs[:30])) == 1
        assert len(set(labs[30:])) == 1
        assert labs[0] != labs[-1]


class TestPacked422:
    def _oracle(self, img, u_even):
        """Direct loop transliteration of `colorConversions.h:334-457`."""
        H, W, _ = img.shape
        out = np.zeros((H, W, 3), np.float32)
        for i in range(H):
            if u_even:
                U, V = img[i, 0, 1], img[i, 1, 1]
            else:
                V, U = img[i, 0, 1], img[i, 1, 1]
            for j in range(W):
                Y = img[i, j, 0]
                if j % 2 == 0:
                    if u_even:
                        U = img[i, j, 1]
                    else:
                        V = img[i, j, 1]
                else:
                    if u_even:
                        V = img[i, j, 1]
                    else:
                        U = img[i, j, 1]
                r = Y + 1.370705 * (V - 128.0)
                g = Y - 0.698001 * (V - 128.0) - 0.337633 * (U - 128.0)
                b = Y + 1.732446 * (U - 128.0)
                out[i, j] = np.clip([r, g, b], -1000.0, 1000.0)
        return out

    def test_yuyv_matches_reference_loop(self, rng):
        from libstevi_tpu.imageproc.color import yuyv_to_rgb
        img = rng.uniform(0, 255, (6, 9, 2)).astype(np.float32)
        got = np.asarray(yuyv_to_rgb(jnp.asarray(img)))
        np.testing.assert_allclose(got, self._oracle(img, True), rtol=1e-5)

    def test_yvyu_matches_reference_loop(self, rng):
        from libstevi_tpu.imageproc.color import yvyu_to_rgb
        img = rng.uniform(0, 255, (5, 8, 2)).astype(np.float32)
        got = np.asarray(yvyu_to_rgb(jnp.asarray(img)))
        np.testing.assert_allclose(got, self._oracle(img, False), rtol=1e-5)


class TestFilterND:
    """N-d axis-role convolution engine (`convolutions.h:32-560`)."""

    @staticmethod
    def _corr2(x, k):
        from scipy.signal import correlate2d
        return correlate2d(x, k, mode="valid")

    def test_moving_moving_matches_scipy(self, rng):
        from libstevi_tpu.imageproc import FilterND, MovingWindowAxis
        x = rng.uniform(0, 1, (9, 11)).astype(np.float32)
        k = rng.uniform(-1, 1, (3, 3)).astype(np.float32)
        f = FilterND(k, MovingWindowAxis(), MovingWindowAxis())
        got = np.asarray(f.convolve(jnp.asarray(x)))
        np.testing.assert_allclose(got, self._corr2(x, k), rtol=1e-5,
                                   atol=1e-5)
        assert f.output_shape(x.shape) == got.shape

    def test_aggregate_axis_contracts(self, rng):
        from libstevi_tpu.imageproc import (FilterND, MovingWindowAxis,
                                            AggregateWindowsAxis)
        x = rng.uniform(0, 1, (8, 10, 3)).astype(np.float32)
        k = rng.uniform(-1, 1, (3, 3, 3)).astype(np.float32)
        f = FilterND(k, MovingWindowAxis(), MovingWindowAxis(),
                     AggregateWindowsAxis())
        got = np.asarray(f.convolve(jnp.asarray(x)))
        want = sum(self._corr2(x[..., c], k[..., c]) for c in range(3))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_batched_input_is_depthwise(self, rng):
        from libstevi_tpu.imageproc import (FilterND, MovingWindowAxis,
                                            BatchedInputAxis)
        x = rng.uniform(0, 1, (4, 8, 10)).astype(np.float32)
        k = rng.uniform(-1, 1, (3, 3)).astype(np.float32)
        f = FilterND(k, BatchedInputAxis(), MovingWindowAxis(),
                     MovingWindowAxis())
        got = np.asarray(f.convolve(jnp.asarray(x)))
        for b in range(4):
            np.testing.assert_allclose(got[b], self._corr2(x[b], k),
                                       rtol=1e-5, atol=1e-5)

    def test_batched_output_filter_bank(self, rng):
        """The gradient-filter pattern of `shapeFromShading.h:78`:
        (H, W) image, (3, 3, nDir) bank -> (H', W', nDir)."""
        from libstevi_tpu.imageproc import (FilterND, MovingWindowAxis,
                                            BatchedOutputAxis)
        x = rng.uniform(0, 1, (8, 10)).astype(np.float32)
        k = rng.uniform(-1, 1, (3, 3, 2)).astype(np.float32)
        f = FilterND(k, MovingWindowAxis(), MovingWindowAxis(),
                     BatchedOutputAxis())
        got = np.asarray(f.convolve(jnp.asarray(x)))
        assert got.shape == (6, 8, 2)
        for o in range(2):
            np.testing.assert_allclose(got[..., o],
                                       self._corr2(x, k[..., o]),
                                       rtol=1e-5, atol=1e-5)

    def test_full_role_mix(self, rng):
        """BatchedInput x Moving x Moving x Aggregate x BatchedOutput —
        per-channel contraction + filter bank, batched (the
        `edgesDetection.h:77` BIaxis+BOaxis pattern)."""
        from libstevi_tpu.imageproc import (
            FilterND, MovingWindowAxis, AggregateWindowsAxis,
            BatchedInputAxis, BatchedOutputAxis)
        x = rng.uniform(0, 1, (2, 7, 9, 3)).astype(np.float32)
        k = rng.uniform(-1, 1, (3, 3, 3, 2)).astype(np.float32)
        f = FilterND(k, BatchedInputAxis(), MovingWindowAxis(),
                     MovingWindowAxis(), AggregateWindowsAxis(),
                     BatchedOutputAxis())
        got = np.asarray(f.convolve(jnp.asarray(x)))
        assert got.shape == (2, 5, 7, 2)
        for b in range(2):
            for o in range(2):
                want = sum(self._corr2(x[b, :, :, c], k[:, :, c, o])
                           for c in range(3))
                np.testing.assert_allclose(got[b, :, :, o], want,
                                           rtol=1e-5, atol=1e-5)

    def test_three_moving_axes_volumetric(self, rng):
        from scipy.ndimage import correlate
        from libstevi_tpu.imageproc import FilterND, MovingWindowAxis
        x = rng.uniform(0, 1, (6, 7, 8)).astype(np.float32)
        k = rng.uniform(-1, 1, (3, 3, 3)).astype(np.float32)
        f = FilterND(k, MovingWindowAxis(), MovingWindowAxis(),
                     MovingWindowAxis())
        got = np.asarray(f.convolve(jnp.asarray(x)))
        want = correlate(x, k, mode="constant")[1:-1, 1:-1, 1:-1]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_padding_and_stride(self, rng):
        from libstevi_tpu.imageproc import (FilterND, MovingWindowAxis,
                                            PaddingInfos, PaddingType)
        x = rng.uniform(0, 1, (9, 9)).astype(np.float32)
        k = rng.uniform(-1, 1, (3, 3)).astype(np.float32)
        pad = PaddingInfos(1, mode=PaddingType.MIRROR)
        f0 = FilterND(k, MovingWindowAxis(pad), MovingWindowAxis(pad))
        full = np.asarray(f0.convolve(jnp.asarray(x)))
        assert full.shape == (9, 9)           # same-size with pad 1
        want = self._corr2(np.pad(x, 1, mode="reflect"), k)
        np.testing.assert_allclose(full, want, rtol=1e-5, atol=1e-5)
        # stride 1 = every second window position
        f1 = FilterND(k, MovingWindowAxis(pad, stride=1),
                      MovingWindowAxis(pad))
        sub = np.asarray(f1.convolve(jnp.asarray(x)))
        np.testing.assert_allclose(sub, full[::2], rtol=1e-5, atol=1e-5)
        assert f1.output_shape((9, 9)) == sub.shape
