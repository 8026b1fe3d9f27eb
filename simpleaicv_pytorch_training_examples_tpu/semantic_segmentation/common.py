"""Semantic segmentation transforms + collater.

Parity with /root/reference/SimpleAICV/semantic_segmentation/common.py:
YoloStyleResize (long-edge), RandomHorizontalFlip, Normalize, and a
collater padding image+mask into a fixed square canvas (mask padded with
255 = ignore). NHWC numpy.
"""

import numpy as np

from ..classification.common import load_state_dict  # re-export

__all__ = ["YoloStyleResize", "RandomHorizontalFlip", "Normalize",
           "RandomCrop", "SemanticSegmentationCollater", "load_state_dict"]


class YoloStyleResize:

    def __init__(self, resize=512, multi_scale=False,
                 multi_scale_range=(0.8, 1.0), stride=32):
        self.resize = resize
        self.multi_scale = multi_scale
        self.multi_scale_range = multi_scale_range
        self.stride = stride

    def __call__(self, sample):
        import cv2
        image, mask = sample["image"], sample["mask"]
        h, w = image.shape[:2]
        if self.multi_scale:
            lo = int(self.multi_scale_range[0] * self.resize)
            hi = int(self.multi_scale_range[1] * self.resize)
            choices = sorted({i // self.stride * self.stride
                              for i in range(lo, hi + self.stride)})
            final = choices[np.random.randint(len(choices))]
        else:
            final = self.resize
        factor = final / max(h, w)
        rh, rw = int(round(h * factor)), int(round(w * factor))
        sample["image"] = cv2.resize(image, (rw, rh))
        sample["mask"] = cv2.resize(mask.astype(np.float32), (rw, rh),
                                    interpolation=cv2.INTER_NEAREST)
        sample["size"] = np.array([rh, rw], np.float32)
        return sample


class RandomCrop:

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample):
        if np.random.uniform(0, 1) >= self.prob:
            return sample
        image, mask = sample["image"], sample["mask"]
        h, w = image.shape[:2]
        ch, cw = int(h * np.random.uniform(0.8, 1.0)), \
            int(w * np.random.uniform(0.8, 1.0))
        y = np.random.randint(0, h - ch + 1)
        x = np.random.randint(0, w - cw + 1)
        sample["image"] = image[y:y + ch, x:x + cw]
        sample["mask"] = mask[y:y + ch, x:x + cw]
        sample["size"] = np.array([ch, cw], np.float32)
        return sample


class RandomHorizontalFlip:

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample):
        if np.random.uniform(0, 1) < self.prob:
            sample["image"] = np.ascontiguousarray(sample["image"][:, ::-1])
            sample["mask"] = np.ascontiguousarray(sample["mask"][:, ::-1])
        return sample


class Normalize:

    def __call__(self, sample):
        sample["image"] = sample["image"].astype(np.float32) / 255.0
        return sample


class SemanticSegmentationCollater:
    """Pads mask with 0 = background class (reference common.py:128)."""

    def __init__(self, resize=512):
        self.resize = resize

    def __call__(self, samples):
        n = len(samples)
        images = np.zeros((n, self.resize, self.resize, 3), np.float32)
        masks = np.zeros((n, self.resize, self.resize), np.int32)
        sizes = np.zeros((n, 2), np.float32)
        for i, s in enumerate(samples):
            img, m = s["image"], s["mask"]
            images[i, :img.shape[0], :img.shape[1]] = img
            masks[i, :m.shape[0], :m.shape[1]] = m.astype(np.int32)
            sizes[i] = s.get("size", np.array(img.shape[:2], np.float32))
        return {"image": images, "mask": masks, "size": sizes}
