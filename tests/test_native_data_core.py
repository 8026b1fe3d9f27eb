"""Native C++ data core: decode exactness vs cv2, DCT prescale, fused
normalize-into-canvas, graceful fallback."""

import numpy as np
import pytest


def _jpeg_blob(h=240, w=320):
    import cv2
    rs = np.random.RandomState(0)
    img = (rs.rand(h, w, 3) * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    return enc.tobytes()


def test_decode_matches_cv2():
    import cv2
    from simpleaicv_pytorch_training_examples_tpu.data.native_jpeg import (
        decode_jpeg, native_available)

    blob = _jpeg_blob()
    dec = decode_jpeg(blob)
    ref = cv2.cvtColor(cv2.imdecode(np.frombuffer(blob, np.uint8),
                                    cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    assert dec.shape == ref.shape
    if native_available():
        # both are libjpeg: bit-exact
        np.testing.assert_array_equal(dec, ref)


def test_decode_prescale_and_batch():
    from simpleaicv_pytorch_training_examples_tpu.data.native_jpeg import (
        decode_jpeg, decode_jpeg_batch)

    blob = _jpeg_blob(480, 640)
    small = decode_jpeg(blob, max_side=160)
    assert max(small.shape[:2]) == 160
    batch = decode_jpeg_batch([blob] * 6, max_side=128, n_threads=4)
    assert len(batch) == 6
    assert all(max(b.shape[:2]) == 128 for b in batch)


def test_normalize_into_canvas_exact():
    from simpleaicv_pytorch_training_examples_tpu.data.native_jpeg import (
        normalize_into_canvas)

    rs = np.random.RandomState(1)
    img = (rs.rand(30, 50, 3) * 255).astype(np.uint8)
    canvas = np.zeros((64, 64, 3), np.float32)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    normalize_into_canvas(img, canvas, 1 / 255.0, mean, std)
    ref = (img.astype(np.float32) / 255.0 -
           np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    np.testing.assert_allclose(canvas[:30, :50], ref, atol=2e-6)
    assert float(np.abs(canvas[30:]).max()) == 0.0  # padding untouched


def test_non_jpeg_falls_back():
    import cv2
    from simpleaicv_pytorch_training_examples_tpu.data.native_jpeg import (
        decode_jpeg)

    img = (np.random.RandomState(2).rand(20, 20, 3) * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".png", img)
    dec = decode_jpeg(enc.tobytes())  # png bytes through the jpeg path
    assert dec is not None and dec.shape == (20, 20, 3)


def test_decode_degenerate_1px_dims():
    """Regression: resize_bilinear used to clamp to sh-2/sw-2 and read past
    the source buffer for 1-pixel-tall/wide JPEGs."""
    from simpleaicv_pytorch_training_examples_tpu.data.native_jpeg import (
        decode_jpeg)

    for h, w in [(1, 300), (300, 1), (1, 1), (2, 500)]:
        blob = _jpeg_blob(h, w)
        out = decode_jpeg(blob, max_side=64)
        assert out is not None and max(out.shape[:2]) == 64 or \
            max(out.shape[:2]) == max(h, w)  # tiny side may round up to 1
        assert out.dtype == np.uint8
