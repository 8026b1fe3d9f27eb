"""Classification transforms, collater, and checkpoint helpers.

Parity with /root/reference/SimpleAICV/classification/common.py:22-881.
Transforms are host-side numpy ops over dict samples
``{'image': HWC float32, 'label': int}`` — same dataflow as the reference's
PIL/cv2 transforms, but PIL-free; the PIL<->cv2 adapter classes are kept as
no-ops so reference-style config bodies port unchanged. The collater emits
fixed-shape NHWC numpy batches (static shapes are what XLA wants).

`load_state_dict` is the torch-checkpoint importer + shape-filtered partial
load (reference common.py:758-841): it stores the path on the model def and
the engine applies it after param init.
"""

import math
import random

import numpy as np

__all__ = [
    "Opencv2PIL", "PIL2Opencv", "TorchPad", "TorchRandomHorizontalFlip",
    "TorchRandomCrop", "TorchMeanStdNormalize", "TorchResize",
    "TorchCenterCrop", "TorchRandomResizedCrop", "Normalize", "RandomErasing",
    "ClassificationCollater", "load_state_dict", "AverageMeter", "AccMeter",
]

from ..utils.meters import AverageMeter, AccMeter  # re-export (common.py:668)


class Opencv2PIL:
    """No-op adapter (images stay numpy HWC throughout)."""

    def __call__(self, sample):
        return sample


class PIL2Opencv:
    """No-op adapter."""

    def __call__(self, sample):
        return sample


class TorchPad:
    """Pad H/W by `padding` with fill or reflect, like torchvision Pad."""

    def __init__(self, padding=4, fill=0, padding_mode="reflect"):
        self.padding = padding
        self.fill = fill
        self.padding_mode = padding_mode

    def __call__(self, sample):
        image = sample["image"]
        p = self.padding
        if self.padding_mode == "reflect":
            image = np.pad(image, ((p, p), (p, p), (0, 0)), mode="reflect")
        else:
            image = np.pad(image, ((p, p), (p, p), (0, 0)),
                           mode="constant", constant_values=self.fill)
        sample["image"] = image
        return sample


class TorchRandomHorizontalFlip:

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample):
        if np.random.uniform(0, 1) < self.prob:
            sample["image"] = np.ascontiguousarray(sample["image"][:, ::-1])
        return sample


class TorchRandomCrop:

    def __init__(self, resize=32):
        self.resize = resize

    def __call__(self, sample):
        image = sample["image"]
        h, w = image.shape[:2]
        th = tw = self.resize
        y = np.random.randint(0, h - th + 1)
        x = np.random.randint(0, w - tw + 1)
        sample["image"] = image[y:y + th, x:x + tw]
        return sample


class TorchMeanStdNormalize:
    """(x/255 - mean)/std with mean/std given in 0-1 range.

    Applied as one fused multiply-add (x*inv - bias with inv=1/(255*std),
    bias=mean/std — algebraically identical, ~1e-7 float assoc.
    difference): the loader profile showed the naive 3-pass form costing
    1.6 ms/img of the ~8 ms/img host budget (tools/perf/loader_bench.py)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)
        self._inv = (1.0 / (255.0 * self.std)).astype(np.float32)
        self._bias = (self.mean / self.std).astype(np.float32)

    def __call__(self, sample):
        image = np.multiply(sample["image"], self._inv, dtype=np.float32)
        image -= self._bias
        sample["image"] = image
        return sample


def _resize_image(image, out_h, out_w):
    """Bilinear resize via cv2 if available, else numpy fallback."""
    try:
        import cv2
        return cv2.resize(image, (out_w, out_h),
                          interpolation=cv2.INTER_LINEAR)
    except ImportError:
        # vectorized bilinear in numpy
        h, w = image.shape[:2]
        ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
        xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
        y0 = np.clip(np.floor(ys).astype(np.int32), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(np.int32), 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        wy = np.clip(ys - y0, 0, 1)[:, None, None]
        wx = np.clip(xs - x0, 0, 1)[None, :, None]
        img = image.astype(np.float32)
        if img.ndim == 2:
            img = img[..., None]
            squeeze = True
        else:
            squeeze = False
        top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
        bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
        out = top * (1 - wy[:, :, 0:1]) + bot * wy[:, :, 0:1]
        if squeeze:
            out = out[..., 0]
        return out.astype(image.dtype)


class TorchResize:

    def __init__(self, resize=224):
        self.resize = resize

    def __call__(self, sample):
        # torchvision Resize(int): short side -> resize, keep aspect
        image = sample["image"]
        h, w = image.shape[:2]
        if h <= w:
            out_h, out_w = self.resize, max(1, int(round(w * self.resize / h)))
        else:
            out_h, out_w = max(1, int(round(h * self.resize / w))), self.resize
        sample["image"] = _resize_image(image, out_h, out_w)
        return sample


class TorchCenterCrop:

    def __init__(self, resize=224):
        self.resize = resize

    def __call__(self, sample):
        image = sample["image"]
        h, w = image.shape[:2]
        th = tw = self.resize
        y = max(0, (h - th) // 2)
        x = max(0, (w - tw) // 2)
        sample["image"] = image[y:y + th, x:x + tw]
        return sample


class TorchRandomResizedCrop:
    """Random scale/aspect crop then resize (torchvision semantics)."""

    def __init__(self, resize=224, scale=(0.08, 1.0),
                 ratio=(3.0 / 4.0, 4.0 / 3.0)):
        self.resize = resize
        self.scale = scale
        self.ratio = ratio

    def __call__(self, sample):
        image = sample["image"]
        h, w = image.shape[:2]
        area = h * w
        for _ in range(10):
            target_area = area * np.random.uniform(*self.scale)
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            aspect = math.exp(np.random.uniform(*log_ratio))
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                y = np.random.randint(0, h - ch + 1)
                x = np.random.randint(0, w - cw + 1)
                crop = image[y:y + ch, x:x + cw]
                sample["image"] = _resize_image(crop, self.resize,
                                                self.resize)
                return sample
        # fallback: center crop
        in_ratio = w / h
        if in_ratio < self.ratio[0]:
            cw, ch = w, int(round(w / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            cw, ch = int(round(h * self.ratio[1])), h
        else:
            cw, ch = w, h
        y, x = (h - ch) // 2, (w - cw) // 2
        crop = image[y:y + ch, x:x + cw]
        sample["image"] = _resize_image(crop, self.resize, self.resize)
        return sample


class Normalize:
    """x/255 with ImageNet-default scaling (reference Normalize: /255)."""

    def __call__(self, sample):
        sample["image"] = sample["image"].astype(np.float32) / 255.0
        return sample


class RandomErasing:
    """timm-style random erasing on a normalized image."""

    def __init__(self, prob=0.25, area_range=(0.02, 1.0 / 3.0),
                 aspect_range=(0.3, 10 / 3.0)):
        self.prob = prob
        self.area_range = area_range
        self.aspect_range = aspect_range

    def __call__(self, sample):
        if np.random.uniform(0, 1) > self.prob:
            return sample
        image = sample["image"]
        h, w = image.shape[:2]
        area = h * w
        for _ in range(10):
            target = area * np.random.uniform(*self.area_range)
            aspect = np.random.uniform(*self.aspect_range)
            eh = int(round(math.sqrt(target * aspect)))
            ew = int(round(math.sqrt(target / aspect)))
            if eh < h and ew < w:
                y = np.random.randint(0, h - eh)
                x = np.random.randint(0, w - ew)
                image[y:y + eh, x:x + ew] = np.random.normal(
                    size=(eh, ew, image.shape[2])).astype(image.dtype)
                sample["image"] = image
                return sample
        return sample


class ClassificationCollater:
    """dict samples -> fixed-shape NHWC float32 batch + int32 labels.

    Reference collater (common.py:645-666) emits BCHW torch tensors; the TPU
    layout is NHWC so no transpose ever happens on device.
    """

    def __call__(self, samples):
        images = np.stack([s["image"] for s in samples]).astype(np.float32)
        labels = np.asarray([s["label"] for s in samples], dtype=np.int32)
        return {"image": images, "label": labels}


def load_state_dict(trained_model_path, model, excluded_layer_name=()):
    """Record a torch/orbax checkpoint path for deferred filtered loading.

    The reference mutates a live nn.Module at config-import time
    (common.py:758). Flax modules are stateless defs, so the path is stored
    and applied by the engine right after init via
    `utils.checkpoint.load_params_filtered`.
    """
    if trained_model_path:
        object.__setattr__(model, "_pretrained_path", trained_model_path)
        object.__setattr__(model, "_pretrained_excluded",
                           tuple(excluded_layer_name))
    return model
