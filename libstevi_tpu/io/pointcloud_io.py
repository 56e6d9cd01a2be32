"""Point-cloud abstraction and codecs.

Reference parity: `io/pointcloud_io.{h,cpp}` — the generic attribute /
access interfaces (`pointcloud_io.h:64-553`) collapse to a `PointCloud`
dataclass (positions + named attribute arrays); `openPointCloud`
(`pointcloud_io.h:815`) sniffs the format by extension.  Codecs:
  * LAS (`las_pointcloud_io.{h,cpp}`): native C++ codec
    (`native/las_codec.cpp`, ctypes-bound) covering LAS 1.2-1.4 point
    formats 0-3;
  * PCD (`pcd_pointcloud_io.{h,cpp}`): ascii + binary readers/writers;
  * attribute mapper/remover (`attributeMapper.h`, `attributeRemover.h`):
    `rename_attributes` / `drop_attributes`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class PointCloud:
    """positions (N, 3) float64 + named per-point attribute arrays."""

    positions: np.ndarray
    attributes: dict = field(default_factory=dict)

    @property
    def n_points(self) -> int:
        return len(self.positions)

    def rename_attributes(self, mapping: dict) -> "PointCloud":
        """`attributeMapper.h:11-86`."""
        attrs = {mapping.get(k, k): v for k, v in self.attributes.items()}
        return PointCloud(self.positions, attrs)

    def drop_attributes(self, names) -> "PointCloud":
        """`attributeRemover.h:13-181`."""
        attrs = {k: v for k, v in self.attributes.items() if k not in names}
        return PointCloud(self.positions, attrs)


# ---------------------------------------------------------------------------
# LAS (native codec)
# ---------------------------------------------------------------------------

def read_las(path: str) -> PointCloud:
    import ctypes
    from ..native import las_library, LasInfo
    lib = las_library()
    info = LasInfo()
    rc = lib.las_read_info(path.encode(), ctypes.byref(info))
    if rc != 0:
        raise IOError(f"not a LAS file ({rc}): {path}")
    n = info.n_points
    xyz = np.empty((n, 3), np.float64)
    intensity = np.empty(n, np.uint16)
    classification = np.empty(n, np.uint8)
    has_gps = info.point_format == 1 or info.point_format >= 3
    has_rgb = info.point_format in (2, 3, 5, 7, 8, 10)
    gps = np.empty(n, np.float64) if has_gps else None
    rgb = np.empty((n, 3), np.uint16) if has_rgb else None

    def ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None

    got = lib.las_read_points(path.encode(), ptr(xyz), ptr(intensity),
                              ptr(classification), ptr(gps), ptr(rgb))
    if got < 0:
        raise IOError(f"LAS read failed ({got}): {path}")
    attrs = {"intensity": intensity[:got],
             "classification": classification[:got]}
    if gps is not None:
        attrs["gps_time"] = gps[:got]
    if rgb is not None:
        attrs["rgb"] = rgb[:got]
    return PointCloud(xyz[:got], attrs)


def write_las(path: str, cloud: PointCloud, point_format: int | None = None
              ) -> bool:
    import ctypes
    from ..native import las_library
    lib = las_library()
    xyz = np.ascontiguousarray(cloud.positions, np.float64)
    n = len(xyz)
    intensity = cloud.attributes.get("intensity")
    classification = cloud.attributes.get("classification")
    gps = cloud.attributes.get("gps_time")
    rgb = cloud.attributes.get("rgb")
    if point_format is None:
        point_format = {(False, False): 0, (True, False): 1,
                        (False, True): 2, (True, True): 3}[
            (gps is not None, rgb is not None)]

    def prep(a, dt):
        return np.ascontiguousarray(a, dt) if a is not None else None

    intensity = prep(intensity, np.uint16)
    classification = prep(classification, np.uint8)
    gps = prep(gps, np.float64)
    rgb = prep(rgb, np.uint16)

    def ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None

    rc = lib.las_write_points(path.encode(), ptr(xyz), n, ptr(intensity),
                              ptr(classification), ptr(gps), ptr(rgb),
                              point_format)
    if rc != 0:
        raise IOError(f"LAS write failed ({rc}): {path}")
    return True


# ---------------------------------------------------------------------------
# PCD
# ---------------------------------------------------------------------------

_PCD_TYPES = {("F", 4): np.float32, ("F", 8): np.float64,
              ("I", 1): np.int8, ("I", 2): np.int16, ("I", 4): np.int32,
              ("U", 1): np.uint8, ("U", 2): np.uint16, ("U", 4): np.uint32}


def read_pcd(path: str) -> PointCloud:
    with open(path, "rb") as f:
        fields, sizes, types, counts = [], [], [], []
        n_points = 0
        data_mode = "ascii"
        while True:
            line = f.readline().decode("ascii", "replace").strip()
            if line.startswith("#") or not line:
                continue
            key, _, rest = line.partition(" ")
            key = key.upper()
            if key == "FIELDS":
                fields = rest.split()
            elif key == "SIZE":
                sizes = [int(v) for v in rest.split()]
            elif key == "TYPE":
                types = rest.split()
            elif key == "COUNT":
                counts = [int(v) for v in rest.split()]
            elif key == "POINTS":
                n_points = int(rest)
            elif key == "DATA":
                data_mode = rest.strip()
                break
        if not counts:
            counts = [1] * len(fields)
        dtypes = [_PCD_TYPES[(t, s)] for t, s in zip(types, sizes)]

        if data_mode == "ascii":
            raw = np.loadtxt(f, dtype=np.float64, ndmin=2)
            cols = {}
            c = 0
            for name, cnt in zip(fields, counts):
                cols[name] = raw[:, c:c + cnt].squeeze(-1) if cnt == 1 \
                    else raw[:, c:c + cnt]
                c += cnt
        elif data_mode == "binary":
            rec = np.dtype([(name, dt, (cnt,)) if cnt > 1 else (name, dt)
                            for name, dt, cnt in zip(fields, dtypes, counts)])
            arr = np.frombuffer(f.read(rec.itemsize * n_points), rec,
                                n_points)
            cols = {name: np.array(arr[name]) for name in fields}
        elif data_mode == "binary_compressed":
            # u32 compressed size, u32 uncompressed size, LZF payload; the
            # uncompressed data is field-major (SOA).  The reference stubs
            # this mode out (`gotoNextBinaryCompressed`,
            # `pcd_pointcloud_io.cpp:516` returns false); we decode it.
            from ..native import lzf_decompress
            csz, usz = np.frombuffer(f.read(8), np.uint32, 2)
            raw = lzf_decompress(f.read(int(csz)), int(usz))
            cols = {}
            off = 0
            for name, dt, cnt in zip(fields, dtypes, counts):
                nb = np.dtype(dt).itemsize * cnt * n_points
                block = np.frombuffer(raw[off:off + nb], dt)
                cols[name] = (block if cnt == 1
                              else block.reshape(n_points, cnt))
                off += nb
        else:
            raise IOError(f"unsupported PCD data mode {data_mode!r}")

    xyz = np.stack([cols.pop("x"), cols.pop("y"), cols.pop("z")],
                   -1).astype(np.float64)
    return PointCloud(xyz, cols)


def write_pcd(path: str, cloud: PointCloud, binary: bool = True,
              compressed: bool = False) -> bool:
    xyz = np.asarray(cloud.positions, np.float32)
    fields = ["x", "y", "z"] + list(cloud.attributes)
    arrays = [xyz[:, 0], xyz[:, 1], xyz[:, 2]] \
        + [np.asarray(v) for v in cloud.attributes.values()]
    type_char = []
    sizes = []
    for a in arrays:
        if a.dtype.kind == "f":
            type_char.append("F")
        elif a.dtype.kind == "i":
            type_char.append("I")
        else:
            type_char.append("U")
        sizes.append(a.dtype.itemsize)
    n = len(xyz)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {' '.join(fields)}\n"
        f"SIZE {' '.join(str(s) for s in sizes)}\n"
        f"TYPE {' '.join(type_char)}\n"
        f"COUNT {' '.join('1' for _ in fields)}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        f"DATA {'binary_compressed' if compressed else 'binary' if binary else 'ascii'}\n")
    with open(path, "wb") as f:
        f.write(header.encode())
        if compressed:
            from ..native import lzf_compress
            raw = b"".join(np.ascontiguousarray(a).tobytes()
                           for a in arrays)          # field-major (SOA)
            payload = lzf_compress(raw)
            f.write(np.asarray([len(payload), len(raw)],
                               np.uint32).tobytes())
            f.write(payload)
        elif binary:
            rec = np.dtype([(name, a.dtype) for name, a in
                            zip(fields, arrays)])
            out = np.empty(n, rec)
            for name, a in zip(fields, arrays):
                out[name] = a
            f.write(out.tobytes())
        else:
            cols = np.column_stack([a.astype(np.float64) for a in arrays])
            np.savetxt(f, cols, fmt="%.8g")
    return True


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def open_point_cloud(path: str) -> PointCloud:
    """Format-sniffing reader (`openPointCloud`, `pointcloud_io.h:815`)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".las":
        return read_las(path)
    if ext == ".pcd":
        return read_pcd(path)
    if ext == ".sdc":
        from .sdc_io import read_sdc
        return read_sdc(path)
    if ext == ".metacloud":
        from .metacloud_io import read_metacloud
        return read_metacloud(path)
    raise IOError(f"unsupported point-cloud format: {ext}")


def save_point_cloud(path: str, cloud: PointCloud) -> bool:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".las":
        return write_las(path, cloud)
    if ext == ".pcd":
        return write_pcd(path, cloud)
    if ext == ".sdc":
        from .sdc_io import write_sdc
        return write_sdc(path, cloud)
    if ext == ".metacloud":
        from .metacloud_io import write_metacloud
        return write_metacloud(path, cloud)
    raise IOError(f"unsupported point-cloud format: {ext}")
