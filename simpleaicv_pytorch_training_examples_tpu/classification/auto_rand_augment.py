"""AutoAugment (ImageNet policy) + RandAugment, PIL-backed.

Parity with /root/reference/SimpleAICV/classification/auto_rand_augment.py
(AutoAugment at :538, RandAugment at :646). Operates on dict samples whose
'image' is float32 RGB HWC in [0, 255] (pre-normalization), like the
reference's placement between RandomResizedCrop and Normalize.
"""

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

__all__ = ["AutoAugment", "RandAugment"]

_FILL = (128, 128, 128)


def _shear_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0),
                         fillcolor=_FILL)


def _shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0),
                         fillcolor=_FILL)


def _translate_x(img, v):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, v * img.size[0], 0, 1, 0), fillcolor=_FILL)


def _translate_y(img, v):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, 0, 0, 1, v * img.size[1]), fillcolor=_FILL)


def _rotate(img, v):
    return img.rotate(v, fillcolor=_FILL)


def _auto_contrast(img, _):
    return ImageOps.autocontrast(img)


def _invert(img, _):
    return ImageOps.invert(img)


def _equalize(img, _):
    return ImageOps.equalize(img)


def _solarize(img, v):
    return ImageOps.solarize(img, int(v))


def _posterize(img, v):
    return ImageOps.posterize(img, max(1, int(v)))


def _contrast(img, v):
    return ImageEnhance.Contrast(img).enhance(v)


def _color(img, v):
    return ImageEnhance.Color(img).enhance(v)


def _brightness(img, v):
    return ImageEnhance.Brightness(img).enhance(v)


def _sharpness(img, v):
    return ImageEnhance.Sharpness(img).enhance(v)


def _identity(img, _):
    return img


# op -> (fn, min_v, max_v, signed)
_OPS = {
    "ShearX": (_shear_x, 0.0, 0.3, True),
    "ShearY": (_shear_y, 0.0, 0.3, True),
    "TranslateX": (_translate_x, 0.0, 0.45, True),
    "TranslateY": (_translate_y, 0.0, 0.45, True),
    "Rotate": (_rotate, 0.0, 30.0, True),
    "AutoContrast": (_auto_contrast, 0, 1, False),
    "Invert": (_invert, 0, 1, False),
    "Equalize": (_equalize, 0, 1, False),
    "Solarize": (_solarize, 256.0, 0.0, False),
    "Posterize": (_posterize, 8.0, 4.0, False),
    "Contrast": (_contrast, 1.0, 1.9, True),
    "Color": (_color, 1.0, 1.9, True),
    "Brightness": (_brightness, 1.0, 1.9, True),
    "Sharpness": (_sharpness, 1.0, 1.9, True),
    "Identity": (_identity, 0, 1, False),
}

_MAX_LEVEL = 10


def _apply_op(img, name, magnitude):
    fn, lo, hi, signed = _OPS[name]
    v = lo + (hi - lo) * magnitude / _MAX_LEVEL
    if signed and np.random.rand() < 0.5:
        if name in ("Contrast", "Color", "Brightness", "Sharpness"):
            v = 2.0 - v  # enhance factor mirrored around 1
        else:
            v = -v
    return fn(img, v)


# AutoAugment ImageNet policy: (op, prob, magnitude) pairs
_IMAGENET_POLICY = [
    (("Posterize", 0.4, 8), ("Rotate", 0.6, 9)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)),
    (("Equalize", 0.8, 8), ("Equalize", 0.6, 3)),
    (("Posterize", 0.6, 7), ("Posterize", 0.6, 6)),
    (("Equalize", 0.4, 7), ("Solarize", 0.2, 4)),
    (("Equalize", 0.4, 4), ("Rotate", 0.8, 8)),
    (("Solarize", 0.6, 3), ("Equalize", 0.6, 7)),
    (("Posterize", 0.8, 5), ("Equalize", 1.0, 2)),
    (("Rotate", 0.2, 3), ("Solarize", 0.6, 8)),
    (("Equalize", 0.6, 8), ("Posterize", 0.4, 6)),
    (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
    (("Rotate", 0.4, 9), ("Equalize", 0.6, 2)),
    (("Equalize", 0.0, 7), ("Equalize", 0.8, 8)),
    (("Invert", 0.6, 4), ("Equalize", 1.0, 8)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Rotate", 0.8, 8), ("Color", 1.0, 2)),
    (("Color", 0.8, 8), ("Solarize", 0.8, 7)),
    (("Sharpness", 0.4, 7), ("Invert", 0.6, 8)),
    (("ShearX", 0.6, 5), ("Equalize", 1.0, 9)),
    (("Color", 0.4, 0), ("Equalize", 0.6, 3)),
    (("Equalize", 0.4, 7), ("Solarize", 0.2, 4)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)),
    (("Invert", 0.6, 4), ("Equalize", 1.0, 8)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Equalize", 0.8, 8), ("Equalize", 0.6, 3)),
]


def _to_pil(image):
    return Image.fromarray(np.clip(image, 0, 255).astype(np.uint8))


def _from_pil(img):
    return np.asarray(img, dtype=np.float32)


class AutoAugment:

    def __call__(self, sample):
        img = _to_pil(sample["image"])
        policy = _IMAGENET_POLICY[np.random.randint(len(_IMAGENET_POLICY))]
        for name, prob, magnitude in policy:
            if np.random.rand() < prob:
                img = _apply_op(img, name, magnitude)
        sample["image"] = _from_pil(img)
        return sample


class RandAugment:

    def __init__(self, N=2, M=10):
        self.N = N
        self.M = M
        self.op_names = [n for n in _OPS if n != "Identity"]

    def __call__(self, sample):
        img = _to_pil(sample["image"])
        for _ in range(self.N):
            name = self.op_names[np.random.randint(len(self.op_names))]
            img = _apply_op(img, name, self.M)
        sample["image"] = _from_pil(img)
        return sample
