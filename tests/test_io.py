"""IO round-trip tests, incl. reading the reference's sample point clouds."""

import glob
import os

import numpy as np
import pytest

from libstevi_tpu.io import (read_image, write_image, read_flo, write_flo,
                             read_stevimg, write_stevimg, PointCloud,
                             read_las, write_las, read_pcd, write_pcd,
                             open_point_cloud)

SAMPLES = "/root/reference/test/pointcloud_samples"


class TestImageIO:
    def test_stevimg_round_trip(self, rng, tmp_path):
        for dtype in (np.uint8, np.int16, np.float32):
            img = (rng.uniform(0, 100, (7, 9, 3))).astype(dtype)
            p = str(tmp_path / f"x_{np.dtype(dtype).name}.stevimg")
            write_stevimg(p, img)
            back = read_stevimg(p)
            assert back.dtype == img.dtype
            np.testing.assert_array_equal(back, img)

    def test_flo_round_trip(self, rng, tmp_path):
        flow = rng.normal(size=(5, 8, 2)).astype(np.float32)
        p = str(tmp_path / "f.flo")
        write_flo(p, flow)
        np.testing.assert_array_equal(read_flo(p), flow)

    def test_pfm_round_trip(self, rng, tmp_path):
        """`examples/io_img_and_disp/main.cpp:54-83` reads .pfm disparity
        maps (float, Middlebury convention) — float round-trip must be
        exact, no 8-bit clipping."""
        disp = rng.uniform(0, 120, (9, 13)).astype(np.float32)
        p = str(tmp_path / "d.pfm")
        write_image(p, disp)
        back = read_image(p)
        np.testing.assert_array_equal(np.squeeze(back), disp)

    def test_png_round_trip(self, rng, tmp_path):
        img = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
        p = str(tmp_path / "i.png")
        write_image(p, img)
        np.testing.assert_array_equal(read_image(p), img)

    def test_dispatch_by_extension(self, rng, tmp_path):
        img = rng.uniform(0, 1, (4, 4)).astype(np.float32)
        p = str(tmp_path / "r.stevimg")
        write_image(p, img)
        np.testing.assert_array_equal(read_image(p), img)


class TestLas:
    def test_round_trip(self, rng, tmp_path):
        n = 1000
        cloud = PointCloud(
            rng.uniform(-100, 100, (n, 3)),
            {"intensity": rng.integers(0, 65535, n).astype(np.uint16),
             "classification": rng.integers(0, 31, n).astype(np.uint8),
             "gps_time": rng.uniform(0, 1e6, n)})
        p = str(tmp_path / "c.las")
        write_las(p, cloud)
        back = read_las(p)
        assert back.n_points == n
        np.testing.assert_allclose(back.positions, cloud.positions,
                                   atol=1e-3)
        np.testing.assert_array_equal(back.attributes["intensity"],
                                      cloud.attributes["intensity"])
        np.testing.assert_allclose(back.attributes["gps_time"],
                                   cloud.attributes["gps_time"])

    @pytest.mark.skipif(not glob.glob(os.path.join(SAMPLES, "las", "*")),
                        reason="no reference samples")
    def test_reads_reference_samples(self):
        for path in glob.glob(os.path.join(SAMPLES, "las", "*.las")):
            cloud = open_point_cloud(path)
            assert cloud.n_points > 0
            assert np.isfinite(cloud.positions).all()


class TestPcd:
    @pytest.mark.parametrize("binary", [True, False])
    def test_round_trip(self, rng, binary, tmp_path):
        n = 200
        cloud = PointCloud(
            rng.uniform(-10, 10, (n, 3)),
            {"intensity": rng.uniform(0, 1, n).astype(np.float32)})
        p = str(tmp_path / "c.pcd")
        write_pcd(p, cloud, binary=binary)
        back = read_pcd(p)
        assert back.n_points == n
        np.testing.assert_allclose(back.positions, cloud.positions,
                                   atol=1e-4)
        np.testing.assert_allclose(back.attributes["intensity"],
                                   cloud.attributes["intensity"], atol=1e-6)

    @pytest.mark.skipif(not glob.glob(os.path.join(SAMPLES, "pcd", "*")),
                        reason="no reference samples")
    def test_reads_reference_samples(self):
        ok = 0
        for path in glob.glob(os.path.join(SAMPLES, "pcd", "*.pcd")):
            try:
                cloud = open_point_cloud(path)
            except IOError:
                continue  # e.g. binary_compressed not yet supported
            assert cloud.n_points > 0
            ok += 1
        assert ok >= 1


class TestAttributes:
    def test_rename_and_drop(self, rng):
        c = PointCloud(rng.uniform(size=(5, 3)),
                       {"a": np.arange(5), "b": np.ones(5)})
        r = c.rename_attributes({"a": "alpha"})
        assert "alpha" in r.attributes and "a" not in r.attributes
        d = r.drop_attributes(["b"])
        assert list(d.attributes) == ["alpha"]

    def test_geometry_mapper(self, rng):
        """`attributeMapper.h` via `examples/io_map/main.cpp:29`: x<->y
        swap + z extracted into a plain attribute (vacated axis -> 0)."""
        from libstevi_tpu.io.pointcloud_io import map_point_cloud_attributes
        pos = rng.uniform(-5, 5, (6, 3))
        c = PointCloud(pos.copy(), {"i": np.arange(6)})
        m = map_point_cloud_attributes(c, {"x": "y", "y": "x", "z": "newZ"})
        np.testing.assert_array_equal(m.positions[:, 0], pos[:, 1])
        np.testing.assert_array_equal(m.positions[:, 1], pos[:, 0])
        np.testing.assert_array_equal(m.positions[:, 2], 0.0)
        np.testing.assert_array_equal(m.attributes["newZ"], pos[:, 2])
        assert "i" in m.attributes
        k = map_point_cloud_attributes(c, {"z": "h"}, only_keep=True)
        assert list(k.attributes) == ["h"] and k.positions[:, 2].max() == 0

    def test_mapper_stream(self, rng, tmp_path):
        """Chunk-streaming mapper == whole-cloud mapper on a LAS file."""
        from libstevi_tpu.io import save_point_cloud
        from libstevi_tpu.io.pointcloud_io import (
            AttributeMapperStream, map_point_cloud_attributes,
            open_point_cloud_stream)
        n = 64
        c = PointCloud(rng.uniform(-5, 5, (n, 3)),
                       {"intensity": rng.integers(0, 99, n).astype(np.uint16)})
        path = str(tmp_path / "m.las")
        save_point_cloud(path, c)
        st = AttributeMapperStream(open_point_cloud_stream(path),
                                   {"x": "y", "y": "x", "intensity": "amp"})
        assert "amp" in st.attributes
        got = st.read_chunk(0, n)
        from libstevi_tpu.io import open_point_cloud
        want = map_point_cloud_attributes(
            open_point_cloud(path), {"x": "y", "y": "x", "intensity": "amp"})
        np.testing.assert_allclose(got["xyz"], want.positions, atol=1e-6)
        np.testing.assert_array_equal(got["amp"], want.attributes["amp"])


class TestSdcMetacloud:
    def test_sdc_round_trip(self, rng, tmp_path):
        from libstevi_tpu.io.sdc_io import read_sdc, write_sdc
        n = 100
        cloud = PointCloud(rng.uniform(-5, 5, (n, 3)),
                           {"amplitude": rng.integers(0, 1000, n).astype(np.uint16),
                            "time": rng.uniform(0, 10, n)})
        p = str(tmp_path / "c.sdc")
        write_sdc(p, cloud)
        back = read_sdc(p)
        np.testing.assert_allclose(back.positions, cloud.positions, atol=1e-5)
        np.testing.assert_array_equal(back.attributes["amplitude"],
                                      cloud.attributes["amplitude"])

    def test_sdc_reads_reference_samples(self):
        import glob as g
        files = g.glob(os.path.join(SAMPLES, "sdc", "*.sdc"))
        if not files:
            pytest.skip("no sdc samples")
        from libstevi_tpu.io.sdc_io import read_sdc
        for f in files:
            c = read_sdc(f)
            assert c.n_points > 0

    def test_metacloud_round_trip(self, rng, tmp_path):
        from libstevi_tpu.io.metacloud_io import (read_metacloud,
                                                  write_metacloud)
        cloud = PointCloud(rng.uniform(-5, 5, (40, 3)),
                           {"intensity": rng.integers(0, 100, 40).astype(np.uint16)})
        cloud = PointCloud(cloud.positions,
                           {"intensity": cloud.attributes["intensity"]})
        p = str(tmp_path / "c.metacloud")
        write_metacloud(p, cloud, meta={"creator": "test"})
        back = read_metacloud(p)
        np.testing.assert_allclose(back.positions, cloud.positions, atol=1e-3)
        assert back.metacloud_attributes["creator"] == "test"

    @pytest.mark.skipif(not glob.glob(os.path.join(SAMPLES, "metacloud", "*")),
                        reason="no samples")
    def test_reads_reference_metacloud_samples(self):
        from libstevi_tpu.io.metacloud_io import read_metacloud
        for f in glob.glob(os.path.join(SAMPLES, "metacloud", "*.metacloud")):
            c = read_metacloud(f)
            assert c.n_points > 0
            assert np.isfinite(c.positions).all()


# ---------------------------------------------------------------------------
# EXR + compressed PCD
# ---------------------------------------------------------------------------

def test_exr_roundtrip_all_compressions(tmp_path, rng):
    from libstevi_tpu.io.exr_io import (write_exr, read_exr,
                                        read_exr_channel, is_exr_file,
                                        exr_channels)
    R = rng.uniform(0, 10, (33, 47)).astype(np.float32)
    Z = rng.normal(size=(33, 47)).astype(np.float32)
    for comp in ("none", "zips", "zip"):
        p = str(tmp_path / f"t_{comp}.exr")
        assert write_exr(p, {"R": R, "Z": Z}, compression=comp)
        assert is_exr_file(p)
        assert exr_channels(p) == ["R", "Z"]
        back = read_exr(p)
        np.testing.assert_array_equal(back["R"], R)
        np.testing.assert_array_equal(back["Z"], Z)
        np.testing.assert_array_equal(read_exr_channel(p, "Z"), Z)


def test_exr_via_image_dispatch(tmp_path, rng):
    from libstevi_tpu.io import read_image, write_image
    img = rng.uniform(0, 1, (20, 30, 3)).astype(np.float32)
    p = str(tmp_path / "rgb.exr")
    write_image(p, img)
    np.testing.assert_array_equal(read_image(p), img)


def test_exr_reads_real_openexr_half_file():
    """A file produced by the actual OpenEXR library (CPython test data):
    16x16 RGBA, HALF pixels, uncompressed."""
    p = ("/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
         "python3.11/test/imghdrdata/python.exr")
    import os
    if not os.path.exists(p):
        import pytest
        pytest.skip("sample EXR not present")
    from libstevi_tpu.io.exr_io import read_exr, exr_channels
    assert exr_channels(p) == ["A", "B", "G", "R"]
    planes = read_exr(p)
    for name in "ABGR":
        assert planes[name].shape == (16, 16)
        assert 0.0 <= planes[name].min() and planes[name].max() <= 1.0


def test_pcd_binary_compressed_roundtrip(tmp_path, rng):
    from libstevi_tpu.io.pointcloud_io import (PointCloud, write_pcd,
                                               read_pcd)
    xyz = rng.normal(size=(500, 3))
    cloud = PointCloud(xyz, {"intensity":
                             rng.uniform(0, 1, 500).astype(np.float32)})
    p = str(tmp_path / "c.pcd")
    assert write_pcd(p, cloud, compressed=True)
    with open(p, "rb") as f:
        assert b"binary_compressed" in f.read(400)
    back = read_pcd(p)
    np.testing.assert_allclose(back.positions, xyz.astype(np.float32),
                               atol=1e-6)
    np.testing.assert_array_equal(back.attributes["intensity"],
                                  cloud.attributes["intensity"])


def test_lzf_codec_roundtrip(rng):
    from libstevi_tpu.native import lzf_compress, lzf_decompress
    for data in (b"", b"a" * 1000,
                 rng.integers(0, 4, 5000, dtype=np.uint8).tobytes(),
                 rng.integers(0, 256, 3000, dtype=np.uint8).tobytes()):
        c = lzf_compress(data)
        assert lzf_decompress(c, len(data)) == data


class TestLasV2:
    """Formats 4-10, VLR/EVLR, extra-bytes, chunked streaming
    (`las_pointcloud_io.h:199-487`)."""

    def _attrs(self, rng, n):
        return {
            "intensity": rng.integers(0, 65535, n).astype(np.uint16),
            "classification": rng.integers(0, 255, n).astype(np.uint8),
            "gps_time": rng.uniform(0, 1e6, n),
            "rgb": rng.integers(0, 65535, (n, 3)).astype(np.uint16),
            "nir": rng.integers(0, 65535, n).astype(np.uint16),
            "return_number": rng.integers(1, 5, n).astype(np.uint8),
            "number_of_returns": np.full(n, 5, np.uint8),
            "scanner_channel": rng.integers(0, 3, n).astype(np.uint8),
            "synthetic": rng.integers(0, 2, n).astype(bool),
            "overlap": rng.integers(0, 2, n).astype(bool),
            "scan_angle": rng.integers(-15000, 15000, n).astype(np.int16),
            "point_source_id": rng.integers(0, 100, n).astype(np.uint16),
            "reflectance": rng.uniform(-20, 10, n).astype(np.float32),
            "ring": rng.integers(0, 64, n).astype(np.uint8),
        }

    def test_format8_extra_bytes_vlr_evlr(self, rng, tmp_path):
        from libstevi_tpu.io.las_stream import LasReader, write_las_v2, Vlr
        n = 1000
        xyz = rng.uniform(-100, 100, (n, 3))
        attrs = self._attrs(rng, n)
        vlrs = [Vlr("MyApp", 7, b"hello payload", "test vlr"),
                Vlr("MyApp", 8, b"E" * 70000, "big evlr", is_evlr=True)]
        p = str(tmp_path / "f8.las")
        write_las_v2(p, xyz, attrs, point_format=8, vlrs=vlrs)
        r = LasReader(p)
        assert r.header.version == (1, 4)       # EVLR forces 1.4
        assert r.header.point_format == 8
        assert r.header.extra_bytes == 5        # f32 + u8 custom attrs
        ch = r.read_chunk(0, n)
        np.testing.assert_allclose(ch["xyz"], xyz, atol=1e-3)
        for k in ("intensity", "classification", "rgb", "nir",
                  "return_number", "number_of_returns", "scanner_channel",
                  "scan_angle", "point_source_id", "synthetic", "overlap",
                  "ring"):
            np.testing.assert_array_equal(ch[k], attrs[k])
        np.testing.assert_allclose(ch["gps_time"], attrs["gps_time"])
        np.testing.assert_allclose(ch["reflectance"], attrs["reflectance"])
        mine = [v for v in r.header.vlrs if v.user_id == "MyApp"]
        assert mine[0].payload == b"hello payload" and not mine[0].is_evlr
        assert len(mine[1].payload) == 70000 and mine[1].is_evlr

    def test_chunked_streaming_matches_full(self, rng, tmp_path):
        from libstevi_tpu.io.las_stream import LasReader, write_las_v2
        n = 997   # prime: chunk edges don't align
        xyz = rng.uniform(0, 10, (n, 3))
        inten = rng.integers(0, 65535, n).astype(np.uint16)
        p = str(tmp_path / "s.las")
        write_las_v2(p, xyz, {"intensity": inten}, point_format=6)
        r = LasReader(p)
        assert r.header.point_format == 6 and r.header.version == (1, 4)
        parts = list(r.chunks(size=100))
        np.testing.assert_array_equal(
            np.concatenate([c["intensity"] for c in parts]), inten)
        np.testing.assert_allclose(
            np.concatenate([c["xyz"] for c in parts]), xyz, atol=1e-3)
        mid = r.read_chunk(500, 50)
        np.testing.assert_allclose(mid["xyz"], xyz[500:550], atol=1e-3)

    def test_wave_packets_format9(self, rng, tmp_path):
        from libstevi_tpu.io.las_stream import LasReader, write_las_v2
        n = 64
        xyz = rng.uniform(0, 1, (n, 3))
        wp = rng.integers(0, 255, (n, 29)).astype(np.uint8)
        p = str(tmp_path / "f9.las")
        write_las_v2(p, xyz, {"gps_time": rng.uniform(0, 1, n),
                              "wave_packet": wp}, point_format=9)
        ch = LasReader(p).read_chunk(0, n)
        np.testing.assert_array_equal(ch["wave_packet"], wp)

    def test_legacy_classification_bits(self, rng, tmp_path):
        from libstevi_tpu.io import read_las, write_las, PointCloud
        n = 128
        cloud = PointCloud(
            rng.uniform(0, 1, (n, 3)),
            {"classification": rng.integers(0, 31, n).astype(np.uint8),
             "synthetic": rng.integers(0, 2, n).astype(bool),
             "withheld": rng.integers(0, 2, n).astype(bool)})
        p = str(tmp_path / "leg.las")
        write_las(p, cloud, point_format=0)
        back = read_las(p)
        for k in ("classification", "synthetic", "withheld"):
            np.testing.assert_array_equal(back.attributes[k],
                                          cloud.attributes[k])

    def test_descriptor_scale_offset(self, rng, tmp_path):
        from libstevi_tpu.io.las_stream import (LasReader, write_las_v2,
                                                ExtraBytesDescriptor)
        n = 100
        xyz = rng.uniform(0, 1, (n, 3))
        # attribute values are ALWAYS value space on the Python side:
        # the writer stores (v - offset)/scale as raw counts and the
        # reader applies raw*scale+offset, so write->read round-trips
        vals = 5.0 + 0.01 * rng.integers(0, 1000, n)
        desc = [ExtraBytesDescriptor("scaled", 3, scale=0.01, offset=5.0)]
        write_las_v2(str(tmp_path / "d.las"), xyz, {"scaled": vals},
                     point_format=6, extra_descriptors=desc)
        ch = LasReader(str(tmp_path / "d.las")).read_chunk(0, n)
        np.testing.assert_allclose(ch["scaled"], vals, atol=1e-9)


class TestMetaCloudNative:
    """Native multi-file format (`metacloud_io.h:10-173`): EXTRA_ATTRIBUTES
    binary sidecars, typed METACLOUD_ATTRIBUTES, INDEX_FILES."""

    def test_extra_attribute_sidecar_round_trip(self, rng, tmp_path):
        from libstevi_tpu.io.metacloud_io import (read_metacloud,
                                                  write_metacloud)
        n = 64
        cloud = PointCloud(
            rng.uniform(-5, 5, (n, 3)),
            {"intensity": rng.integers(0, 100, n).astype(np.uint16),
             "reflectance": rng.uniform(-10, 5, n).astype(np.float32),
             "ring": rng.integers(0, 32, n).astype(np.uint8)})
        p = str(tmp_path / "c.metacloud")
        write_metacloud(p, cloud,
                        meta={"sensor": "riegl x", "count": 42,
                              "rate": 2.5},
                        index_files=[("idx.bsp", "bsp", "main")])
        # native sidecar present; the points LAS holds no extra bytes
        assert (tmp_path / "c_extra.bin").exists()
        from libstevi_tpu.io.las_stream import LasReader
        assert LasReader(str(tmp_path / "c_points.las")).header.extra_bytes \
            == 0
        back = read_metacloud(p)
        np.testing.assert_allclose(back.positions, cloud.positions,
                                   atol=1e-3)
        for k in ("intensity", "reflectance", "ring"):
            np.testing.assert_array_equal(back.attributes[k],
                                          cloud.attributes[k])
        # typed metacloud attributes (`metacloud_io.cpp:329-352` regexes)
        assert back.metacloud_attributes["sensor"] == "riegl x"
        assert back.metacloud_attributes["count"] == 42
        assert isinstance(back.metacloud_attributes["count"], int)
        assert back.metacloud_attributes["rate"] == 2.5
        assert back.metacloud_index_files == [("idx.bsp", "bsp", "main")]

    def test_hand_written_descriptor(self, rng, tmp_path):
        from libstevi_tpu.io.metacloud_io import read_metacloud
        from libstevi_tpu.io.pointcloud_io import write_las
        n = 10
        cloud = PointCloud(rng.uniform(0, 1, (n, 3)), {})
        write_las(str(tmp_path / "pts.las"), cloud)
        np.arange(n, dtype=np.float64).tofile(str(tmp_path / "e.bin"))
        (tmp_path / "h.metacloud").write_text(
            "# a comment\n"
            "POINTS_FILES\n"
            '  "pts.las"\n'
            "\n"
            "EXTRA_ATTRIBUTES\n"
            '"e.bin" float64 "height"\n'
            "METACLOUD_ATTRIBUTES\n"
            'quotednum "123"\n'
            "realnum 123\n")
        back = read_metacloud(str(tmp_path / "h.metacloud"))
        np.testing.assert_allclose(back.attributes["height"], np.arange(n))
        # quoted numbers stay strings, unquoted become int64
        assert back.metacloud_attributes["quotednum"] == "123"
        assert back.metacloud_attributes["realnum"] == 123


class TestStreamingInterface:
    def test_large_las_streams_in_bounded_chunks(self, tmp_path):
        """A 2M-point LAS iterates through fixed-size windows — the
        streaming role of the reference's point access interfaces
        (`pointcloud_io.h:322-525`)."""
        from libstevi_tpu.io.las_stream import write_las_v2
        from libstevi_tpu.io.pointcloud_io import open_point_cloud_stream
        n = 2_000_000
        xyz = np.stack([np.arange(n, dtype=np.float64) % 1000,
                        np.arange(n, dtype=np.float64) // 1000,
                        np.zeros(n)], -1)
        p = str(tmp_path / "big.las")
        write_las_v2(p, xyz, {"intensity":
                              (np.arange(n) % 65536).astype(np.uint16)},
                     point_format=0)
        r = open_point_cloud_stream(p)
        assert r.n_points == n
        total, checksum = 0, 0
        for ch in r.chunks(size=250_000):
            assert len(ch["xyz"]) <= 250_000
            total += len(ch["xyz"])
            checksum += int(ch["intensity"].sum())
        assert total == n
        assert checksum == sum(i % 65536 for i in range(n))

    def test_adapter_for_pcd(self, rng, tmp_path):
        from libstevi_tpu.io.pointcloud_io import (write_pcd,
                                                   open_point_cloud_stream)
        cloud = PointCloud(rng.uniform(0, 1, (100, 3)),
                           {"i": rng.uniform(0, 1, 100).astype(np.float32)})
        p = str(tmp_path / "c.pcd")
        write_pcd(p, cloud)
        r = open_point_cloud_stream(p)
        assert r.n_points == 100
        ch = r.read_chunk(40, 10)
        np.testing.assert_allclose(ch["xyz"], cloud.positions[40:50],
                                   atol=1e-6)
        np.testing.assert_allclose(ch["i"], cloud.attributes["i"][40:50])

    def test_mapper_collision_raises(self, rng):
        """Lossless-or-loud: a mapping target colliding with an unmapped
        name must raise, not silently drop data."""
        from libstevi_tpu.io.pointcloud_io import map_point_cloud_attributes
        c = PointCloud(rng.uniform(size=(4, 3)),
                       {"intensity": np.arange(4)})
        with pytest.raises(ValueError):
            map_point_cloud_attributes(c, {"intensity": "z"})
        with pytest.raises(ValueError):
            map_point_cloud_attributes(c, {"z": "intensity"})
        # mapping the displaced name away is lossless and allowed
        m = map_point_cloud_attributes(c, {"intensity": "z", "z": "old_z"})
        np.testing.assert_array_equal(m.positions[:, 2], np.arange(4))
        assert "old_z" in m.attributes

    def test_pfm_scale_factor(self, tmp_path):
        """PFM |scale| is a unit factor: write(scale=-0.25) then read
        returns the original physical values."""
        from libstevi_tpu.io.image_io import read_pfm, write_pfm
        img = np.linspace(0, 4, 12, dtype=np.float32).reshape(3, 4)
        p = str(tmp_path / "s.pfm")
        write_pfm(p, img, scale=-0.25)
        np.testing.assert_allclose(read_pfm(p), img, rtol=1e-6)


class TestChunkedLasWriter:
    def test_multichunk_equals_monolithic(self, rng, tmp_path):
        """Streamed multi-chunk write reads back identical to the
        one-shot writer (same values; header count/bounds backpatched)."""
        from libstevi_tpu.io.las_stream import LasChunkWriter, write_las_v2
        from libstevi_tpu.io.las_stream import LasReader
        n = 1000
        xyz = rng.uniform(-50, 50, (n, 3))
        attrs = {"intensity": rng.integers(0, 9999, n).astype(np.uint16),
                 "gps_time": rng.uniform(0, 1e5, n),
                 "temperature": rng.uniform(-20, 40, n).astype(np.float32)}
        mono = str(tmp_path / "mono.las")
        write_las_v2(mono, xyz, attrs)
        chunked = str(tmp_path / "chunked.las")
        with LasChunkWriter(chunked) as w:
            for s in range(0, n, 128):
                e = min(s + 128, n)
                w.write_chunk(xyz[s:e], {k: v[s:e] for k, v in attrs.items()})
        ra, rb = LasReader(mono), LasReader(chunked)
        assert rb.n_points == n
        ca = ra.read_chunk(0, n)
        cb = rb.read_chunk(0, n)
        # offsets differ (global mins vs first-chunk mins) but decoded
        # values agree to quantization
        np.testing.assert_allclose(cb["xyz"], ca["xyz"], atol=2e-4)
        np.testing.assert_array_equal(cb["intensity"], ca["intensity"])
        np.testing.assert_allclose(cb["temperature"], ca["temperature"],
                                   rtol=1e-6)
        # header bounds are the true bounds
        np.testing.assert_allclose(rb.header.mins, xyz.min(0), atol=2e-4)
        np.testing.assert_allclose(rb.header.maxs, xyz.max(0), atol=2e-4)

    def test_stream_to_stream(self, rng, tmp_path):
        """open_point_cloud_stream -> mapper -> write_point_cloud_stream
        round-trips in bounded memory (the io_map big-file path)."""
        from libstevi_tpu.io import save_point_cloud, open_point_cloud
        from libstevi_tpu.io.pointcloud_io import (
            AttributeMapperStream, open_point_cloud_stream,
            write_point_cloud_stream)
        n = 500
        c = PointCloud(rng.uniform(-5, 5, (n, 3)),
                       {"intensity": rng.integers(0, 99, n).astype(np.uint16)})
        src = str(tmp_path / "s.las")
        dst = str(tmp_path / "d.las")
        save_point_cloud(src, c)
        st = AttributeMapperStream(open_point_cloud_stream(src),
                                   {"x": "y", "y": "x"})
        write_point_cloud_stream(dst, st, chunk_size=100)
        back = open_point_cloud(dst)
        np.testing.assert_allclose(back.positions[:, 0], c.positions[:, 1],
                                   atol=1e-3)
        np.testing.assert_allclose(back.positions[:, 1], c.positions[:, 0],
                                   atol=1e-3)
        np.testing.assert_array_equal(back.attributes["intensity"],
                                      c.attributes["intensity"])

    def test_chunked_fmt7_evlr(self, rng, tmp_path):
        """Chunked writer with a new format (7: rgb+gps, LAS 1.4), an
        EVLR (buffered at open, written after the points at close) and
        extra bytes — all survive the multi-chunk round trip."""
        from libstevi_tpu.io.las_stream import (LasChunkWriter, LasReader,
                                                Vlr)
        n = 300
        xyz = rng.uniform(-10, 10, (n, 3))
        attrs = {"gps_time": rng.uniform(0, 1e4, n),
                 "rgb": rng.integers(0, 65535, (n, 3)).astype(np.uint16),
                 "score": rng.uniform(0, 1, n).astype(np.float64)}
        path = str(tmp_path / "c7.las")
        vlrs = [Vlr("MyApp", 7, b"hdr payload", "in header"),
                Vlr("MyApp", 9, b"E" * 4096, "after points", is_evlr=True)]
        with LasChunkWriter(path, point_format=7, vlrs=vlrs) as w:
            for s in range(0, n, 77):
                e = min(s + 77, n)
                w.write_chunk(xyz[s:e], {k: v[s:e] for k, v in attrs.items()})
        r = LasReader(path)
        assert r.header.point_format == 7
        assert r.header.version == (1, 4)
        assert r.n_points == n
        ch = r.read_chunk(0, n)
        np.testing.assert_allclose(ch["xyz"], xyz, atol=2e-4)
        np.testing.assert_array_equal(ch["rgb"], attrs["rgb"])
        np.testing.assert_allclose(ch["score"], attrs["score"], rtol=1e-12)
        evs = [v for v in r.header.vlrs if v.is_evlr
               and v.user_id == "MyApp"]
        assert len(evs) == 1 and len(evs[0].payload) == 4096
        hdrs = [v for v in r.header.vlrs if not v.is_evlr
                and v.user_id == "MyApp"]
        assert hdrs and hdrs[0].payload == b"hdr payload"


class TestDescriptorEdgeCases:
    def test_signed_no_data_round_trip(self):
        """no_data anchors in the descriptor's own type family (LAS 1.4
        table 24): -1 must survive pack/unpack for signed codes."""
        from libstevi_tpu.io.las_stream import ExtraBytesDescriptor
        d = ExtraBytesDescriptor("height", 6, no_data=-1.0)  # int32
        back = ExtraBytesDescriptor.unpack(d.pack())
        assert back.no_data == -1.0

    def test_non_ascii_name_keeps_record_length(self):
        """Multi-byte names must not resize the 192-byte record (a
        char-count slice would corrupt every following descriptor)."""
        from libstevi_tpu.io.las_stream import (ExtraBytesDescriptor,
                                                parse_extra_bytes_vlr)
        a = ExtraBytesDescriptor("héight", 9)
        b = ExtraBytesDescriptor("plain", 9)
        raw = a.pack() + b.pack()
        assert len(a.pack()) == 192
        descs = parse_extra_bytes_vlr(raw)
        assert descs[1].name == "plain" and descs[1].data_type == 9

    def test_nir_format_inference_and_guard(self, rng, tmp_path):
        """'nir' infers format 8 (not silently dropped at format 2);
        an explicit too-small format raises instead of dropping."""
        from libstevi_tpu.io.las_stream import (LasChunkWriter, LasReader,
                                                write_las_v2)
        n = 40
        xyz = rng.uniform(-1, 1, (n, 3))
        attrs = {"gps_time": rng.uniform(0, 1, n),
                 "rgb": rng.integers(0, 99, (n, 3)).astype(np.uint16),
                 "nir": rng.integers(0, 99, n).astype(np.uint16)}
        p = str(tmp_path / "nir.las")
        write_las_v2(p, xyz, attrs)
        r = LasReader(p)
        assert r.header.point_format == 8
        np.testing.assert_array_equal(r.read_chunk(0, n)["nir"],
                                      attrs["nir"])
        with pytest.raises(ValueError):
            w = LasChunkWriter(str(tmp_path / "bad.las"), point_format=2)
            w.write_chunk(xyz, attrs)

    def test_scaled_extra_bytes_write_inversion(self, rng, tmp_path):
        """A read->write copy of scale/offset extra bytes preserves the
        VALUE space (the writer inverts what the reader applies)."""
        from libstevi_tpu.io.las_stream import (ExtraBytesDescriptor,
                                                LasChunkWriter, LasReader)
        n = 30
        xyz = rng.uniform(-1, 1, (n, 3))
        desc = [ExtraBytesDescriptor("temp", 3, scale=0.01, offset=5.0)]
        vals = 5.0 + 0.01 * rng.integers(0, 1000, n)  # value space
        p1, p2 = str(tmp_path / "a.las"), str(tmp_path / "b.las")
        with LasChunkWriter(p1, extra_descriptors=desc) as w:
            w.write_chunk(xyz, {"temp": vals})
        r1 = LasReader(p1)
        got1 = r1.read_chunk(0, n)["temp"]
        np.testing.assert_allclose(got1, vals, atol=1e-9)
        with LasChunkWriter(p2, extra_descriptors=r1.extra_descriptors) as w:
            w.write_chunk(xyz, {"temp": got1})
        got2 = LasReader(p2).read_chunk(0, n)["temp"]
        np.testing.assert_allclose(got2, vals, atol=1e-9)

    def test_oversized_header_vlr_promoted_to_evlr(self, rng, tmp_path):
        """Header VLR length is u16: >65535-byte payloads auto-promote
        to EVLRs instead of truncating the recorded length."""
        from libstevi_tpu.io.las_stream import (LasChunkWriter, LasReader,
                                                Vlr)
        n = 10
        xyz = rng.uniform(-1, 1, (n, 3))
        p = str(tmp_path / "big.las")
        with LasChunkWriter(p, vlrs=[Vlr("MyApp", 1, b"x" * 70000,
                                         "big")]) as w:
            w.write_chunk(xyz, {})
        r = LasReader(p)
        mine = [v for v in r.header.vlrs if v.user_id == "MyApp"]
        assert len(mine) == 1 and mine[0].is_evlr
        assert len(mine[0].payload) == 70000
        assert r.n_points == n
