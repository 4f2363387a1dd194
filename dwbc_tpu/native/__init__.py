"""Native (C++) host-side components, loaded via ctypes.

The reference's native layer is the external Isaac Gym binary; its
terrain pipeline calls the packaged `isaacgym.terrain_utils` builders
(reference terrain.py:35, :57-60). Here the equivalent native layer is
built from source in `src/` (g++ -O3 -fopenmp) and exposed with a pure
numpy fallback, so the framework works with or without a toolchain:

  * fractal_noise(...)          — multi-octave gradient Perlin heightfield
  * heightfield_to_trimesh(...) — vertices/triangles for export & viz

Build explicitly with `python -m dwbc_tpu.native.build` or implicitly on
first use (compiles once into native/lib/).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
LIB_PATH = os.path.join(_DIR, "lib", "libdwbc_terrain.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if os.environ.get("DWBC_NO_NATIVE"):
        _load_failed = True
        return None
    try:
        if not os.path.exists(LIB_PATH) or (
            os.path.getmtime(LIB_PATH)
            < os.path.getmtime(os.path.join(_DIR, "src", "terrain.cpp"))
        ):
            from . import build

            build.build()
        lib = ctypes.CDLL(LIB_PATH)
        lib.dwbc_fractal_noise.restype = ctypes.c_int
        lib.dwbc_fractal_noise.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_uint64,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ]
        lib.dwbc_heightfield_to_trimesh.restype = None
        lib.dwbc_heightfield_to_trimesh.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.c_float,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def fractal_noise(
    x_samples: int,
    y_samples: int,
    x_scale: int,
    y_scale: int,
    z_scale: float,
    octaves: int = 2,
    lacunarity: float = 2.0,
    gain: float = 0.25,
    seed: int = 0,
) -> Optional[np.ndarray]:
    """Native fractal Perlin; None if the native lib is unavailable or the
    resolution doesn't divide the sample grid (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros((x_samples, y_samples), np.float32)
    rc = lib.dwbc_fractal_noise(x_samples, y_samples, x_scale, y_scale,
                                float(z_scale), octaves, float(lacunarity),
                                float(gain), seed & (2**64 - 1), out)
    return out if rc == 0 else None


def heightfield_to_trimesh(
    height: np.ndarray, cell: float, origin: Tuple[float, float]
) -> Tuple[np.ndarray, np.ndarray]:
    """(vertices (H*W, 3) f32, triangles (2(H-1)(W-1), 3) i32). Native when
    available, numpy otherwise — identical output either way."""
    h = np.ascontiguousarray(height, np.float32)
    H, W = h.shape
    lib = _load()
    if lib is not None:
        verts = np.empty((H * W, 3), np.float32)
        tris = np.empty((2 * (H - 1) * (W - 1), 3), np.int32)
        lib.dwbc_heightfield_to_trimesh(h, H, W, float(cell),
                                        float(origin[0]), float(origin[1]),
                                        verts, tris)
        return verts, tris
    # numpy fallback (same layout)
    xx, yy = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    verts = np.stack([origin[0] + xx.ravel() * cell,
                      origin[1] + yy.ravel() * cell,
                      h.ravel()], -1).astype(np.float32)
    ii, jj = np.meshgrid(np.arange(H - 1), np.arange(W - 1), indexing="ij")
    a = (ii * W + jj).ravel()
    b = a + 1
    c = a + W
    d = c + 1
    tris = np.empty((2 * (H - 1) * (W - 1), 3), np.int32)
    tris[0::2] = np.stack([a, b, c], -1)
    tris[1::2] = np.stack([b, d, c], -1)
    return verts, tris
