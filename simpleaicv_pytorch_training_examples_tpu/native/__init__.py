"""Native data-core bindings (ctypes over the C ABI in data_core.cpp).

The shared library is built on first import with the baked-in g++ and
cached next to the source; if the toolchain or libjpeg is missing the
module degrades gracefully (`lib() is None`) and callers fall back to cv2.
"""

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "data_core.cpp")
_SO = os.path.join(_DIR, "libsimpleaicv_data.so")

_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC,
           "-ljpeg", "-pthread", "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def lib():
    """The loaded CDLL, building it if needed; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        cdll = ctypes.CDLL(_SO)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        cdll.saicv_decode_jpeg.restype = u8p
        cdll.saicv_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        cdll.saicv_free.restype = None
        cdll.saicv_free.argtypes = [ctypes.c_void_p]
        cdll.saicv_normalize_into_canvas.restype = None
        cdll.saicv_normalize_into_canvas.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        cdll.saicv_decode_jpeg_batch.restype = ctypes.c_int
        cdll.saicv_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        _lib = cdll
    except Exception:  # noqa: BLE001 — missing toolchain/libjpeg
        _lib = None
    return _lib
