"""SOD transforms + collater.

Parity with /root/reference/SimpleAICV/salient_object_detection/common.py:
YoloStyleResize / RandomHorizontalFlip / Normalize over {'image','mask'}
samples (mask is a 0-255 saliency png scaled to 0-1), collater pads to a
fixed square canvas. NHWC numpy.
"""

import numpy as np

from ..classification.common import load_state_dict  # re-export
from ..semantic_segmentation.common import (RandomHorizontalFlip,
                                            YoloStyleResize)

__all__ = ["YoloStyleResize", "RandomHorizontalFlip", "Normalize",
           "SalientObjectDetectionCollater", "load_state_dict"]


class Normalize:
    """image /255; mask scaled to 0-1."""

    def __call__(self, sample):
        sample["image"] = sample["image"].astype(np.float32) / 255.0
        if sample["mask"].max() > 1.0:
            sample["mask"] = sample["mask"].astype(np.float32) / 255.0
        return sample


class SalientObjectDetectionCollater:

    def __init__(self, resize=1024):
        self.resize = resize

    def __call__(self, samples):
        n = len(samples)
        images = np.zeros((n, self.resize, self.resize, 3), np.float32)
        masks = np.zeros((n, self.resize, self.resize), np.float32)
        sizes = np.zeros((n, 2), np.float32)
        for i, s in enumerate(samples):
            img, m = s["image"], s["mask"]
            images[i, :img.shape[0], :img.shape[1]] = img
            masks[i, :m.shape[0], :m.shape[1]] = m
            sizes[i] = s.get("size", np.array(img.shape[:2], np.float32))
        return {"image": images, "mask": masks, "size": sizes}
