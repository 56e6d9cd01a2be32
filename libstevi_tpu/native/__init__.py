"""Native (C++) components, compiled on demand with the system toolchain.

The reference's only compiled code is its IO layer (`io/*.cpp`, SURVEY.md
§2.6); this package mirrors that: the LAS codec is C++ (`las_codec.cpp`)
bound through ctypes.  Build products are cached next to the sources with
a source-content hash sidecar and rebuilt whenever the hash differs (git
does not preserve mtimes, so an mtime comparison would make a fresh
clone's pick checkout-order-dependent); a committed .so is only used
as-is when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(name: str) -> str:
    src = os.path.join(_DIR, f"{name}.cpp")
    so = os.path.join(_DIR, f"{name}.so")
    sig = os.path.join(_DIR, f"{name}.src.sha256")
    digest = hashlib.sha256(open(src, "rb").read()).hexdigest()
    recorded = open(sig).read().strip() if os.path.exists(sig) else None
    if os.path.exists(so) and recorded == digest:
        return so
    if shutil.which("g++") is None:
        if os.path.exists(so):
            if recorded is not None and recorded != digest:
                import warnings
                warnings.warn(
                    f"{name}.cpp changed but no g++ is available to "
                    f"rebuild — using the STALE compiled {name}.so",
                    RuntimeWarning, stacklevel=2)
            return so          # committed binary, no toolchain to rebuild
        raise OSError(f"no g++ available to build {name}.cpp")
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
        check=True, capture_output=True)
    with open(sig, "w") as f:
        f.write(digest + "\n")
    return so


_las_lib = None


def las_library() -> ctypes.CDLL:
    """The LAS codec shared library (compiled on first use)."""
    global _las_lib
    if _las_lib is None:
        _las_lib = ctypes.CDLL(_build("las_codec"))
        _configure_las(_las_lib)
    return _las_lib


class LasInfo(ctypes.Structure):
    _fields_ = [
        ("version_major", ctypes.c_uint8),
        ("version_minor", ctypes.c_uint8),
        ("point_format", ctypes.c_uint8),
        ("point_record_len", ctypes.c_uint16),
        ("n_points", ctypes.c_uint64),
        ("header_size", ctypes.c_uint32),
        ("offset_to_points", ctypes.c_uint64),
        ("scale", ctypes.c_double * 3),
        ("offset", ctypes.c_double * 3),
        ("mins", ctypes.c_double * 3),
        ("maxs", ctypes.c_double * 3),
        ("n_vlrs", ctypes.c_uint32),
        ("n_evlrs", ctypes.c_uint32),
        ("start_of_evlrs", ctypes.c_uint64),
        ("extra_bytes", ctypes.c_uint16),
        ("file_source_id", ctypes.c_uint16),
        ("global_encoding", ctypes.c_uint16),
    ]


class LasVlrMeta(ctypes.Structure):
    _fields_ = [
        ("user_id", ctypes.c_char * 17),
        ("description", ctypes.c_char * 33),
        ("record_id", ctypes.c_uint16),
        ("payload_len", ctypes.c_uint64),
    ]


def _configure_las(lib: ctypes.CDLL):
    lib.las_read_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(LasInfo)]
    lib.las_read_info.restype = ctypes.c_int
    lib.las_read_vlr_meta.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                      ctypes.POINTER(LasVlrMeta)]
    lib.las_read_vlr_meta.restype = ctypes.c_int
    lib.las_read_vlr_payload.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.c_char_p, ctypes.c_longlong]
    lib.las_read_vlr_payload.restype = ctypes.c_longlong
    lib.las_read_points_chunk.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64] \
        + [ctypes.c_void_p] * 12 + [ctypes.c_int]
    lib.las_read_points_chunk.restype = ctypes.c_longlong
    lib.las_write_points_v2.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int] \
        + [ctypes.c_void_p] * 12 + [ctypes.c_int, ctypes.c_int] \
        + [ctypes.c_void_p] * 7
    lib.las_write_points_v2.restype = ctypes.c_int
    lib.las_writer_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int] \
        + [ctypes.c_void_p] * 6 + [ctypes.c_void_p, ctypes.c_int]
    lib.las_writer_open.restype = ctypes.c_void_p
    lib.las_writer_append.argtypes = [
        ctypes.c_void_p, ctypes.c_longlong] + [ctypes.c_void_p] * 12
    lib.las_writer_append.restype = ctypes.c_longlong
    lib.las_writer_close.argtypes = [ctypes.c_void_p]
    lib.las_writer_close.restype = ctypes.c_int
    lib.las_writer_abort.argtypes = [ctypes.c_void_p]
    lib.las_writer_abort.restype = None
    lib.las_read_points.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.las_read_points.restype = ctypes.c_longlong
    lib.las_write_points.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.las_write_points.restype = ctypes.c_int


_lzf_lib = None


def lzf_library() -> ctypes.CDLL:
    """The LZF codec shared library (PCD binary_compressed payloads)."""
    global _lzf_lib
    if _lzf_lib is None:
        lib = ctypes.CDLL(_build("lzf_codec"))
        for fn in (lib.lzf_decompress, lib.lzf_compress):
            fn.argtypes = [ctypes.c_char_p, ctypes.c_long,
                           ctypes.c_char_p, ctypes.c_long]
            fn.restype = ctypes.c_long
        _lzf_lib = lib
    return _lzf_lib


def lzf_decompress(data: bytes, out_size: int) -> bytes:
    lib = lzf_library()
    out = ctypes.create_string_buffer(out_size)
    n = lib.lzf_decompress(data, len(data), out, out_size)
    if n < 0:
        raise IOError("malformed LZF stream")
    return out.raw[:n]


def lzf_compress(data: bytes) -> bytes:
    lib = lzf_library()
    cap = len(data) + len(data) // 16 + 64
    out = ctypes.create_string_buffer(cap)
    n = lib.lzf_compress(data, len(data), out, cap)
    if n < 0:
        raise IOError("LZF compression overflow")
    return out.raw[:n]


_maxflow_lib = None


def maxflow_library() -> ctypes.CDLL:
    """The Boykov-Kolmogorov float-capacity max-flow library
    (`maxflow.cpp`, compiled on first use)."""
    global _maxflow_lib
    if _maxflow_lib is None:
        lib = ctypes.CDLL(_build("maxflow"))
        lib.bk_maxflow.restype = ctypes.c_double
        lib.bk_maxflow.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _maxflow_lib = lib
    return _maxflow_lib
