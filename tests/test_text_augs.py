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


def test_final_char_table_cjk_roundtrip():
    """The shipped 12,111-char merged table (reference final_char_table.py
    parity): 12113 classes (chars + garbage + blank), space preserved,
    CJK encodes/decodes."""
    from simpleaicv_pytorch_training_examples_tpu.text_recognition.char_sets import (
        FINAL_CHAR_TABLE)
    from simpleaicv_pytorch_training_examples_tpu.text_recognition.common import (
        CTCTextLabelConverter)

    cv = CTCTextLabelConverter(chars_file=FINAL_CHAR_TABLE,
                               str_max_length=80, garbage_char="㍿")
    assert cv.num_classes == 12113
    assert " " in cv.char_to_index
    enc, lens = cv.encode(["中国 Hello 123", "深度学习"])
    rt = "".join(cv.index_to_char[i] for i in enc[0][: int(lens[0])])
    assert rt == "中国 Hello 123"
    # OOV maps to the garbage char
    enc2, lens2 = cv.encode(["の㍿"])  # 'の' IS in the table; '㍿' garbage
    assert cv.index_to_char[enc2[0][0]] == "の"
