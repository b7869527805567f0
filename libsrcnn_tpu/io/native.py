"""ctypes bindings for the native host library (native/srcnn_host.cpp).

The reference is native C++ throughout; here the device compute is
JAX/XLA/Pallas and the native tier covers the host data path: OpenMP color
packing, double-precision contribution tables, and a lock-free frame ring
for streaming producers.  Everything degrades gracefully to the numpy
implementations when the library has not been built (``make -C native``) --
:func:`available` reports which tier is active.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_LIB_DIR, "libsrcnn_host.so"))


@functools.lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_LIB_PATH):
        try:  # attempt a build if the toolchain is present
            subprocess.run(["make", "-C", os.path.abspath(_LIB_DIR)],
                           capture_output=True, timeout=120, check=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)

    lib.srcnn_rgb_to_ycbcr.argtypes = [u8p, f32p, ctypes.c_int64, ctypes.c_int32]
    lib.srcnn_ycbcr_to_rgb.argtypes = [f32p, u8p, ctypes.c_int64, ctypes.c_int32]
    lib.srcnn_contribution_table.argtypes = [
        ctypes.c_int32, ctypes.c_int64, ctypes.c_int64, i32p, f64p]
    lib.srcnn_contribution_table.restype = ctypes.c_int32
    lib.srcnn_ring_create.argtypes = [ctypes.c_int64, ctypes.c_int32]
    lib.srcnn_ring_create.restype = ctypes.c_void_p
    lib.srcnn_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.srcnn_ring_push.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64]
    lib.srcnn_ring_push.restype = ctypes.c_int32
    lib.srcnn_ring_pop.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64]
    lib.srcnn_ring_pop.restype = ctypes.c_int64
    lib.srcnn_ring_size.argtypes = [ctypes.c_void_p]
    lib.srcnn_ring_size.restype = ctypes.c_int32
    lib.srcnn_host_version.restype = ctypes.c_int32
    return lib


def available() -> bool:
    return _lib() is not None


def _require_lib():
    lib = _lib()
    if lib is None:
        raise RuntimeError(
            "native host library unavailable (build with `make -C native`); "
            "use the numpy/JAX implementations in ops.color / "
            "ops.weights_table instead")
    return lib


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """u8 [H,W,D] -> f32 planar [D,H,W], native OpenMP path."""
    lib = _require_lib()
    h, w, d = img.shape
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty((d, h, w), dtype=np.float32)
    lib.srcnn_rgb_to_ycbcr(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h * w, d)
    return out


def ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    """f32 planar [D,H,W] -> u8 [H,W,D], native OpenMP path."""
    lib = _require_lib()
    d, h, w = planes.shape
    planes = np.ascontiguousarray(planes, dtype=np.float32)
    out = np.empty((h, w, d), dtype=np.uint8)
    lib.srcnn_ycbcr_to_rgb(
        planes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h * w, d)
    return out


def contribution_table(filter_type: int, dst_size: int, src_size: int):
    """Native double-precision contribution table; same contract as
    :func:`libsrcnn_tpu.ops.weights_table.contribution_table`."""
    import math

    from ..config import FilterType
    from ..ops.filters import FILTERS

    lib = _require_lib()
    # single source of truth for the support width: the buffer sized
    # here is written by the native side BEFORE the window assert below,
    # so a drifted copy of the table would corrupt the heap, not assert
    fw = FILTERS[FilterType(int(filter_type))][1]
    scale = dst_size / src_size
    width = fw / scale if scale < 1.0 else fw
    window = 2 * int(math.ceil(width)) + 1
    left = np.empty((dst_size,), dtype=np.int32)
    weights = np.zeros((dst_size, window), dtype=np.float64)
    got = lib.srcnn_contribution_table(
        int(filter_type), dst_size, src_size,
        left.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    assert got == window, (got, window)
    return left, weights


class FrameRing:
    """Lock-free SPSC frame queue backed by the native library; feeds raw
    frames from a producer thread/process to the device loop."""

    def __init__(self, frame_bytes: int, nslots: int = 8):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native library unavailable; build native/")
        self._lib = lib
        self._cap = int(frame_bytes)
        self._ptr = lib.srcnn_ring_create(self._cap, int(nslots))

    def push(self, frame: np.ndarray) -> bool:
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        return bool(self._lib.srcnn_ring_push(
            self._ptr, frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            frame.nbytes))

    def pop(self) -> np.ndarray | None:
        out = np.empty((self._cap,), dtype=np.uint8)
        n = self._lib.srcnn_ring_pop(
            self._ptr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._cap)
        if n <= 0:
            return None
        return out[:n]

    def __len__(self) -> int:
        return int(self._lib.srcnn_ring_size(self._ptr))

    def close(self) -> None:
        if self._ptr:
            self._lib.srcnn_ring_destroy(self._ptr)
            self._ptr = None

    def __del__(self):  # noqa: D105
        try:
            self.close()
        except Exception:
            pass
