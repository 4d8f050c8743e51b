"""ctypes bindings for the native data-loading core (``native/tcs_io.cc``).

Falls back transparently to the pure-Python readers when the shared library
is absent; ``build()`` compiles it with the in-tree Makefile. All native
calls release the GIL, so a ThreadPoolExecutor around these achieves real
decode parallelism (the role of the reference's dataloader worker
processes, ``stereo_datasets.py:727-733``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native", "libtcs_io.so")
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_lib: Optional[ctypes.CDLL] = None


def build(quiet: bool = True) -> bool:
    """Compile the native library in-tree. Returns success."""
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=quiet,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    c_int_p = ctypes.POINTER(ctypes.c_int)
    lib.tcs_png_info.argtypes = [ctypes.c_char_p, c_int_p, c_int_p, c_int_p, c_int_p]
    lib.tcs_png_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int]
    lib.tcs_jpeg_info.argtypes = [ctypes.c_char_p, c_int_p, c_int_p, c_int_p]
    lib.tcs_jpeg_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int]
    lib.tcs_pfm_info.argtypes = [ctypes.c_char_p, c_int_p, c_int_p, c_int_p]
    lib.tcs_pfm_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int]
    lib.tcs_resize_bilinear_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    if hasattr(lib, "tcs_color_jitter"):  # version ≥ 2
        lib.tcs_color_jitter.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float,
        ]
    _lib = lib
    return lib


def has_color_jitter() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "tcs_color_jitter")


def available() -> bool:
    return _load() is not None


def read_png(path: str) -> np.ndarray:
    """uint8 (H, W, C) or uint16 (H, W) for 16-bit grayscale PNGs."""
    lib = _load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    depth = ctypes.c_int()
    rc = lib.tcs_png_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(ch), ctypes.byref(depth))
    if rc != 0:
        raise IOError(f"tcs_png_info({path}) rc={rc}")
    if depth.value == 16:
        out = np.empty((h.value, w.value, ch.value), np.uint16)
    else:
        out = np.empty((h.value, w.value, ch.value), np.uint8)
    rc = lib.tcs_png_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                          out.nbytes)
    if rc != 0:
        raise IOError(f"tcs_png_read({path}) rc={rc}")
    return out[..., 0] if ch.value == 1 else out


def read_jpeg(path: str) -> np.ndarray:
    lib = _load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.tcs_jpeg_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(ch))
    if rc != 0:
        raise IOError(f"tcs_jpeg_info({path}) rc={rc}")
    out = np.empty((h.value, w.value, ch.value), np.uint8)
    rc = lib.tcs_jpeg_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                           out.nbytes)
    if rc != 0:
        raise IOError(f"tcs_jpeg_read({path}) rc={rc}")
    return out


def read_pfm(path: str) -> np.ndarray:
    lib = _load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.tcs_pfm_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(ch))
    if rc != 0:
        raise IOError(f"tcs_pfm_info({path}) rc={rc}")
    out = np.empty((h.value, w.value, ch.value), np.float32)
    rc = lib.tcs_pfm_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                          out.size)
    if rc != 0:
        raise IOError(f"tcs_pfm_read({path}) rc={rc}")
    return out[..., 0] if ch.value == 1 else out


def color_jitter(img: np.ndarray, order, f_brightness: float,
                 f_contrast: float, f_saturation: float, hue_shift: float,
                 gamma: float, gain: float) -> np.ndarray:
    """Apply brightness/contrast/saturation/hue in ``order`` (a permutation
    of 0..3), then gamma — GIL-released C++ loop matching the numpy
    ``ColorJitter`` pipeline. img: (..., 3) 0..255; returns float32
    (clipped, unrounded — the caller rounds to uint8)."""
    lib = _load()
    assert lib is not None and hasattr(lib, "tcs_color_jitter")
    buf = np.ascontiguousarray(img, np.float32).copy() \
        if not (isinstance(img, np.ndarray) and img.dtype == np.float32
                and img.flags.c_contiguous) else img.copy()
    assert buf.shape[-1] == 3, buf.shape
    order_arr = np.ascontiguousarray(order, np.int32)
    assert order_arr.size == 4
    lib.tcs_color_jitter(
        buf.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_long(buf.size // 3),
        order_arr.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_float(f_brightness), ctypes.c_float(f_contrast),
        ctypes.c_float(f_saturation), ctypes.c_float(hue_shift),
        ctypes.c_float(gamma), ctypes.c_float(gain),
    )
    return buf


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """float32 (H, W, C) → (out_h, out_w, C), half-pixel-centre bilinear."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    out = np.empty((out_h, out_w, C), np.float32)
    lib.tcs_resize_bilinear_f32(
        img.ctypes.data_as(ctypes.c_void_p), H, W, C,
        out.ctypes.data_as(ctypes.c_void_p), out_h, out_w,
    )
    return out[..., 0] if squeeze else out
