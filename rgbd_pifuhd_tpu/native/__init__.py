"""Native (C++) host kernels with transparent build-on-first-use.

The compute path is JAX/XLA on TPU; these are the HOST-side kernels around
it (SURVEY.md: the reference leans on skimage/trimesh native code for these
— we ship our own):

- marching.cc — marching tetrahedra isosurface extraction (dense, masked,
  and sparse-direct variants)
- meshio.cc   — sparse-volume densify + OBJ writer
- raster.cc   — orthographic z-buffer rasterizer (offline data generation)

Built with g++ -O3 into ``_build/`` on first import (no pip), loaded via
ctypes.  ``load_marching()`` returns None if no compiler is available; the
NumPy implementation is the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_HERE, "_build")
_LOCK = threading.Lock()
_CACHE: dict = {}


def _build_lib(name: str, sources: list[str], extra_flags=()) -> str | None:
    so_path = os.path.join(_BUILD, f"lib{name}.so")
    srcs = [os.path.join(_HERE, s) for s in sources]
    if os.path.exists(so_path) and all(
        os.path.getmtime(so_path) >= os.path.getmtime(s) for s in srcs
    ):
        return so_path
    os.makedirs(_BUILD, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", *extra_flags, *srcs, "-o", so_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        msg = getattr(e, "stderr", b"")
        print(f"[native] build of {name} failed: {e} "
              f"{msg.decode() if isinstance(msg, bytes) else msg}")
        return None
    return so_path


def load_marching():
    """ctypes handle to the marching-tetrahedra kernel, or None."""
    with _LOCK:
        if "marching" in _CACHE:
            return _CACHE["marching"]
        so = _build_lib("marching", ["marching.cc"])
        lib = None
        if so:
            lib = ctypes.CDLL(so)
            out_args = [
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.mt_run.restype = ctypes.c_int
            lib.mt_run.argtypes = [
                ctypes.POINTER(ctypes.c_float),   # vol
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # X Y Z
                ctypes.c_float,                    # thresh
                ctypes.POINTER(ctypes.c_int8),     # case table
                ctypes.c_int,                      # mc_cols (0 = tets)
                ctypes.c_int,                      # n_threads
            ] + out_args
            lib.mt_run_cells.restype = ctypes.c_int
            lib.mt_run_cells.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_float,
                ctypes.POINTER(ctypes.c_int8),
                ctypes.c_int,                      # mc_cols (0 = tets)
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),   # cells [K, 3]
                ctypes.c_int64,                    # n_cells
                ctypes.c_int,                      # factor
            ] + out_args
            lib.mt_run_sparse.restype = ctypes.c_int
            lib.mt_run_sparse.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),   # corner_q [(n+1)^3]
                ctypes.POINTER(ctypes.c_int32),   # top_idx [K]
                ctypes.c_int64,                    # K
                ctypes.POINTER(ctypes.c_uint8),   # refined packed
                ctypes.c_int64,                    # n (cells/axis)
                ctypes.c_int,                      # factor
                ctypes.c_int64,                    # res
                ctypes.c_int,                      # pack_bits
                ctypes.c_float,                    # band_scale
                ctypes.c_float,                    # thresh
                ctypes.POINTER(ctypes.c_int8),    # case table
                ctypes.c_int,                      # mc_cols (0 = tets)
                ctypes.c_int,                      # n_threads
                ctypes.POINTER(ctypes.c_int32),   # scan cells [K', 3]
                ctypes.c_int64,                    # n_cells
            ] + out_args
            lib.mt_run_sparse3.restype = ctypes.c_int
            lib.mt_run_sparse3.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),   # corner_q [(n+1)^3]
                ctypes.POINTER(ctypes.c_int32),   # top8_idx [K1]
                ctypes.c_int64,                    # K1
                ctypes.POINTER(ctypes.c_uint8),   # sub_q [K1, 27]
                ctypes.POINTER(ctypes.c_int32),   # top4_idx [K2]
                ctypes.c_int64,                    # K2
                ctypes.POINTER(ctypes.c_uint8),   # refined packed
                ctypes.c_int64,                    # n
                ctypes.c_int,                      # factor
                ctypes.c_int64,                    # res
                ctypes.c_int,                      # pack_bits
                ctypes.c_float,                    # band_scale
                ctypes.c_float,                    # thresh
                ctypes.POINTER(ctypes.c_int8),    # case table
                ctypes.c_int,                      # mc_cols (0 = tets)
                ctypes.c_int,                      # n_threads
                ctypes.POINTER(ctypes.c_int32),   # scan cells [K', 3]
                ctypes.c_int64,                    # n_cells
            ] + out_args
            lib.mt_free.argtypes = [ctypes.c_void_p]
            # incremental session API (slab-pipelined marching+coloring)
            lib.mt3_begin.restype = ctypes.c_void_p
            lib.mt3_begin.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),   # corner_q [(n+1)^3]
                ctypes.POINTER(ctypes.c_int32),   # top8_idx [K1]
                ctypes.c_int64,                    # K1
                ctypes.POINTER(ctypes.c_uint8),   # sub_q [K1, 27]
                ctypes.POINTER(ctypes.c_int32),   # top4_idx [K2]
                ctypes.c_int64,                    # K2
                ctypes.POINTER(ctypes.c_uint8),   # refined packed
                ctypes.c_int64,                    # n
                ctypes.c_int,                      # factor
                ctypes.c_int64,                    # res
                ctypes.c_int,                      # pack_bits
                ctypes.c_float,                    # band_scale
                ctypes.c_float,                    # thresh
                ctypes.POINTER(ctypes.c_int8),    # case table
                ctypes.c_int,                      # mc_cols (0 = tets)
                ctypes.c_int,                      # n_threads
            ]
            lib.mt3_step.restype = ctypes.c_int
            lib.mt3_step.argtypes = [
                ctypes.c_void_p,                   # session
                ctypes.POINTER(ctypes.c_int32),   # cells [K', 3]
                ctypes.c_int64,                    # n_cells
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),  # new verts
                ctypes.POINTER(ctypes.c_int64),   # n_new_verts
                ctypes.POINTER(ctypes.c_int64),   # base_vert
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),  # faces
                ctypes.POINTER(ctypes.c_int64),   # n_faces
            ]
            lib.mt3_end.argtypes = [ctypes.c_void_p]
        _CACHE["marching"] = lib
        return lib


def load_raster():
    """ctypes handle to the orthographic rasterizer kernel, or None."""
    with _LOCK:
        if "raster" in _CACHE:
            return _CACHE["raster"]
        so = _build_lib("raster", ["raster.cc"])
        lib = None
        if so:
            lib = ctypes.CDLL(so)
            lib.raster_ortho.restype = ctypes.c_int
            lib.raster_ortho.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # px
                ctypes.POINTER(ctypes.c_double),  # py
                ctypes.POINTER(ctypes.c_double),  # pz
                ctypes.c_int64,                    # V
                ctypes.POINTER(ctypes.c_double),  # vn [V,3]
                ctypes.POINTER(ctypes.c_double),  # vshade (nullable)
                ctypes.c_int,                      # shade_ch
                ctypes.POINTER(ctypes.c_int32),   # faces
                ctypes.c_int64,                    # F
                ctypes.c_int64,                    # size
                ctypes.POINTER(ctypes.c_double),  # albedo [3]
                ctypes.POINTER(ctypes.c_double),  # light [3]
                ctypes.POINTER(ctypes.c_double),  # uvs [T,2] (nullable)
                ctypes.POINTER(ctypes.c_int32),   # face_uvs [F,3] (nullable)
                ctypes.POINTER(ctypes.c_float),   # tex [th,tw,3] (nullable)
                ctypes.c_int64, ctypes.c_int64,    # th, tw
                ctypes.POINTER(ctypes.c_double),  # face_albedo (nullable)
                ctypes.POINTER(ctypes.c_float),   # zbuf
                ctypes.POINTER(ctypes.c_float),   # nbuf
                ctypes.POINTER(ctypes.c_float),   # rgb
                ctypes.POINTER(ctypes.c_uint8),   # mask
                ctypes.c_int,                      # n_threads
            ]
        _CACHE["raster"] = lib
        return lib


def load_meshio():
    """ctypes handle to the densify / obj_write kernels, or None."""
    with _LOCK:
        if "meshio" in _CACHE:
            return _CACHE["meshio"]
        so = _build_lib("meshio", ["meshio.cc"])
        lib = None
        if so:
            lib = ctypes.CDLL(so)
            lib.densify.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,   # vol, res
                ctypes.POINTER(ctypes.c_float),                    # fill
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,    # marks, n
                ctypes.c_int,                                      # factor
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,    # top, K
                ctypes.POINTER(ctypes.c_float),                    # refined
                ctypes.c_int,                                      # threads
            ]
            lib.transform_affine.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            lib.bbox_quantize_u16.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,  # verts, n
                ctypes.POINTER(ctypes.c_float),                   # lo[3]
                ctypes.POINTER(ctypes.c_float),                   # scale[3]
                ctypes.POINTER(ctypes.c_uint16),                  # out u16
                ctypes.c_int,                                     # threads
            ]
            lib.obj_write.restype = ctypes.c_int
            lib.obj_write.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
            ]
            lib.obj_format_faces.restype = ctypes.c_int
            lib.obj_format_faces.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.obj_open.restype = ctypes.c_int64
            lib.obj_open.argtypes = [ctypes.c_char_p]
            lib.obj_append_verts.restype = ctypes.c_int
            lib.obj_append_verts.argtypes = [
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            lib.obj_finish.restype = ctypes.c_int
            lib.obj_finish.argtypes = [
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_char), ctypes.c_int64,
            ]
            lib.meshio_free.argtypes = [ctypes.c_void_p]
        _CACHE["meshio"] = lib
        return lib
