"""numpy front-end for the native data core.

decode_jpeg / decode_jpeg_batch replace cv2.imread+resize on the hot
classification/detection input path (libjpeg DCT-domain prescale does the
big downscales nearly free); normalize_into_canvas fuses the
uint8->float32 normalize + padded-canvas write into one native pass.
All functions fall back to cv2/numpy when the native library is absent.
"""

import ctypes

import numpy as np

from ..native import lib

__all__ = ["native_available", "decode_jpeg", "decode_jpeg_batch",
           "normalize_into_canvas"]


def native_available():
    return lib() is not None


def _cv2_decode(data, max_side):
    import cv2
    img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        return None
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if max_side and max(img.shape[:2]) != max_side:
        h, w = img.shape[:2]
        f = max_side / max(h, w)
        img = cv2.resize(img, (max(1, int(round(w * f))),
                               max(1, int(round(h * f)))))
    return img


def decode_jpeg(data, max_side=0):
    """JPEG bytes (or path) -> RGB uint8 [H,W,3]; None on decode error."""
    if isinstance(data, str):
        with open(data, "rb") as f:
            data = f.read()
    cdll = lib()
    if cdll is None:
        return _cv2_decode(data, max_side)
    h = ctypes.c_int()
    w = ctypes.c_int()
    ptr = cdll.saicv_decode_jpeg(data, len(data), int(max_side),
                                 ctypes.byref(h), ctypes.byref(w))
    if not ptr:
        return _cv2_decode(data, max_side)  # e.g. PNG bytes
    try:
        arr = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 3)).copy()
    finally:
        cdll.saicv_free(ptr)
    return arr


def decode_jpeg_batch(blobs, max_side=0, n_threads=8):
    """List of JPEG bytes -> list of RGB uint8 arrays (None for failures),
    decoded on native threads with zero GIL contention."""
    cdll = lib()
    if cdll is None:
        return [decode_jpeg(b, max_side) for b in blobs]
    n = len(blobs)
    bufs = (ctypes.c_char_p * n)(*blobs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    outs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    cdll.saicv_decode_jpeg_batch(bufs, lens, n, int(max_side), outs, hs,
                                 ws, int(n_threads))
    images = []
    for i in range(n):
        if outs[i]:
            arr = np.ctypeslib.as_array(
                outs[i], shape=(hs[i], ws[i], 3)).copy()
            cdll.saicv_free(outs[i])
            images.append(arr)
        else:
            images.append(decode_jpeg(blobs[i], max_side))
    return images


def normalize_into_canvas(img, canvas, scale=1.0 / 255.0,
                          mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0)):
    """Write uint8 RGB [h,w,3] into float32 canvas [H,W,3] at the top-left
    as (px*scale - mean)/std, one fused native pass."""
    cdll = lib()
    h, w = img.shape[:2]
    if cdll is None or img.dtype != np.uint8 \
            or not canvas.flags["C_CONTIGUOUS"]:
        canvas[:h, :w] = (img.astype(np.float32) * scale -
                          np.asarray(mean, np.float32)) / \
            np.asarray(std, np.float32)
        return canvas
    img = np.ascontiguousarray(img)
    mean_a = (ctypes.c_float * 3)(*[float(x) for x in mean])
    std_a = (ctypes.c_float * 3)(*[float(x) for x in std])
    cdll.saicv_normalize_into_canvas(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        canvas.shape[0], canvas.shape[1], float(scale), mean_a, std_a)
    return canvas
