"""WarpMLS text augmentation family: identity exactness + shape/range
preservation of the random augs."""

import numpy as np


def _sample():
    img = np.tile(np.linspace(0, 255, 160, dtype=np.float32)[None, :, None],
                  (32, 1, 3))
    return {"image": img, "label": "hello world text", "scale": 1.0,
            "size": np.array([32, 160], np.float32)}


def test_warp_mls_identity():
    from simpleaicv_pytorch_training_examples_tpu.text_recognition.common import (
        warp_mls)

    img = _sample()["image"]
    src = [[0, 0], [160, 0], [160, 32], [0, 32]]
    out = warp_mls(img, src, src)
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_warp_mls_shift_moves_pixels():
    from simpleaicv_pytorch_training_examples_tpu.text_recognition.common import (
        warp_mls)

    img = _sample()["image"]
    src = [[0, 0], [160, 0], [160, 32], [0, 32]]
    dst = [[10, 0], [170, 0], [170, 32], [10, 32]]
    out = warp_mls(img, src, dst)
    assert float(np.abs(out - img).mean()) > 1.0


def test_distort_stretch_perspective_scale():
    from simpleaicv_pytorch_training_examples_tpu.text_recognition.common import (
        Distort, Perspective, RandomScale, Stretch)

    np.random.seed(0)
    for aug in (Distort(prob=1.0), Stretch(prob=1.0),
                Perspective(prob=1.0), RandomScale(prob=1.0)):
        s = aug(dict(_sample()))
        assert s["image"].ndim == 3 and s["image"].shape[2] == 3
        assert 0.0 <= float(s["image"].min())
        assert float(s["image"].max()) <= 255.0
        assert s["label"] == "hello world text"
