"""ctypes bindings for the native data-pipeline kernels (native/fastops.cpp),
with pure-numpy fallbacks when the shared library is absent.

The reference's equivalent native layer is its numba-JIT hole puncher
(pseudo_hole.py:8) and torch's C++ DataLoader machinery; here the per-sample
hot loops are a dependency-free C++ .so (built by native/build.sh) that
releases the GIL so loader threads overlap with the device step.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _find_lib() -> Optional[ctypes.CDLL]:
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = (
        os.path.join(here, "..", "..", "native", "libfastops.so"),
        os.path.join(here, "libfastops.so"),
    )
    for cand in candidates:
        if os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            _declare(lib)
            return lib
    # lazy one-shot build (dependency-free C++; ~1s)
    src = os.path.join(here, "..", "..", "native", "fastops.cpp")
    if os.path.exists(src):
        import subprocess

        try:
            subprocess.run(["g++", "-O3", "-fPIC", "-shared", "-o",
                            candidates[0], src], check=True,
                           capture_output=True, timeout=120)
            lib = ctypes.CDLL(candidates[0])
            _declare(lib)
            return lib
        except Exception:
            pass
    return None


def _declare(lib: ctypes.CDLL):
    f32p = ctypes.POINTER(ctypes.c_float)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.depth_normalize_zero_preserve.argtypes = [
        f32p, f32p, ctypes.c_long, ctypes.c_float, ctypes.c_float]
    lib.sparse_sample.argtypes = [f32p, f32p, ctypes.c_long, ctypes.c_long,
                                  ctypes.c_float, ctypes.c_uint64]
    lib.hole_image.argtypes = [f32p, ctypes.c_long, ctypes.c_long,
                               ctypes.c_long, ctypes.c_long, ctypes.c_long,
                               ctypes.c_uint64]
    lib.sunrgbd_depth_decode.argtypes = [u16p, f32p, ctypes.c_long]
    lib.pepper_mask.argtypes = [u8p, ctypes.c_long, ctypes.c_float,
                                ctypes.c_uint64]
    lib.depth_mm_to_m.argtypes = [u16p, f32p, ctypes.c_long, ctypes.c_float]


def available() -> bool:
    global _LIB
    if _LIB is None:
        _LIB = _find_lib()
    return _LIB is not None


def _f32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def depth_normalize_zero_preserve(depth: np.ndarray, mean: float,
                                  std: float) -> np.ndarray:
    depth = np.ascontiguousarray(depth, np.float32)
    if available():
        out = np.empty_like(depth)
        _LIB.depth_normalize_zero_preserve(_f32(depth), _f32(out), depth.size,
                                           mean, std)
        return out
    out = (depth - mean) / std
    out[depth <= 1e-8] = 0.0
    return out


def sparse_sample(depth: np.ndarray, num_sample: int, seed: int,
                  t_valid: float = 1e-4) -> np.ndarray:
    depth = np.ascontiguousarray(depth, np.float32)
    if available():
        out = np.empty_like(depth)
        _LIB.sparse_sample(_f32(depth), _f32(out), depth.size, num_sample,
                           t_valid, seed & 0xFFFFFFFFFFFFFFFF)
        return out
    flat = depth.reshape(-1)
    nnz = np.flatnonzero(flat > t_valid)
    rng = np.random.default_rng(seed)
    keep = rng.permutation(nnz.size)[:num_sample]
    out = np.zeros_like(flat)
    out[nnz[keep]] = flat[nnz[keep]]
    return out.reshape(depth.shape)


def sunrgbd_depth_decode(depth: np.ndarray) -> np.ndarray:
    depth = np.ascontiguousarray(depth, np.uint16)
    if available():
        out = np.empty(depth.shape, np.float32)
        _LIB.sunrgbd_depth_decode(
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            _f32(out), depth.size)
        return out
    v = np.bitwise_or(np.right_shift(depth, 3), np.left_shift(depth, 13))
    return v.astype(np.float32) / 1000.0


def pepper_mask(shape, snr: float, seed: int) -> np.ndarray:
    """0/1/2 salt-pepper label mask (reference helper.py:397 distribution)."""
    n = int(np.prod(shape))
    if available():
        out = np.empty(n, np.uint8)
        _LIB.pepper_mask(out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         n, snr, seed & 0xFFFFFFFFFFFFFFFF)
        return out.reshape(shape)
    rng = np.random.default_rng(seed)
    u = rng.uniform(size=shape)
    half = (1.0 - snr) / 2.0
    return np.where(u < snr, 0, np.where(u < snr + half, 1, 2)).astype(np.uint8)


def depth_mm_to_m(depth: np.ndarray, scale: float = 1e-3) -> np.ndarray:
    depth = np.ascontiguousarray(depth, np.uint16)
    if available():
        out = np.empty(depth.shape, np.float32)
        _LIB.depth_mm_to_m(
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            _f32(out), depth.size, scale)
        return out
    return depth.astype(np.float32) * scale


def hole_image(img: np.ndarray, hole_h: int, hole_w: int, num: int,
               seed: int) -> np.ndarray:
    out = np.ascontiguousarray(img, np.float32).copy()
    if available():
        _LIB.hole_image(_f32(out), out.shape[0], out.shape[1], hole_h,
                        hole_w, num, seed & 0xFFFFFFFFFFFFFFFF)
        return out
    from .pseudo_hole import hole_image as py_hole

    return py_hole(out, hole_w, hole_h, num, np.random.default_rng(seed))
