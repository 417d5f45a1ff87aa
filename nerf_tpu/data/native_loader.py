"""ctypes bindings for the native C++ dataset loader (native/loader.cpp).

Builds lazily on first use (g++ + system zlib) and falls back to PIL when
unavailable. Exposes `load_image_rgba(path, downscale) -> np.float32 [H,W,4]`
with Lanczos-3 downscaling matching the reference's PIL pipeline
(reference: src/dataset.py:54-63).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "loader.cpp")
_LIB = os.path.join(_ROOT, "native", "libnerf_loader.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-o", _LIB, _SRC, "-lz"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) and os.path.exists(_SRC):
            if not _build():
                return None
        if not os.path.exists(_LIB):
            return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.nerf_png_dims.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.nerf_png_dims.restype = ctypes.c_int
            lib.nerf_load_png_rgba_f32.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            lib.nerf_load_png_rgba_f32.restype = ctypes.c_int
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def load_image_rgba(path: str, downscale: int = 1) -> np.ndarray:
    """fp32 RGBA in [0,1], shape [H//d, W//d, 4]. Native fast path for
    8-bit non-interlaced PNGs; PIL fallback otherwise."""
    lib = get_lib()
    if lib is not None and path.lower().endswith(".png"):
        w = ctypes.c_int()
        h = ctypes.c_int()
        p = path.encode()
        # Belt-and-braces dim bound (the C side also validates the PNG
        # signature/IHDR): never allocate more than a 16k x 16k RGBA image
        # from header bytes; fall through to PIL on anything suspicious.
        if (lib.nerf_png_dims(p, ctypes.byref(w), ctypes.byref(h)) == 0
                and 0 < w.value <= 16384 and 0 < h.value <= 16384):
            ow, oh = w.value // max(downscale, 1), h.value // max(downscale, 1)
            out = np.empty((oh, ow, 4), np.float32)
            rc = lib.nerf_load_png_rgba_f32(
                p, downscale,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                out.size)
            if rc == 0:
                return out
    # Fallback: PIL (also handles JPEG, interlaced PNG, 16-bit, ...).
    from PIL import Image
    img = Image.open(path).convert("RGBA")
    if downscale > 1:
        img = img.resize((img.width // downscale, img.height // downscale),
                         Image.LANCZOS)
    return np.asarray(img, np.float32) / 255.0
