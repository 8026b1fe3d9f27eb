"""Human matting transforms + collater.

Parity with /root/reference/SimpleAICV/human_matting/common.py: samples
carry {'image','mask'(alpha 0-1),'trimap'(0/128/255),'fg_map','bg_map'};
collater pads everything to a fixed square canvas, NHWC.
"""

import numpy as np

from ..classification.common import load_state_dict  # re-export

__all__ = ["YoloStyleResize", "RandomHorizontalFlip", "Normalize",
           "HumanMattingCollater", "load_state_dict"]


class YoloStyleResize:

    def __init__(self, resize=1024, multi_scale=False,
                 multi_scale_range=(0.8, 1.0), stride=32):
        self.resize = resize
        self.multi_scale = multi_scale
        self.multi_scale_range = multi_scale_range
        self.stride = stride

    def __call__(self, sample):
        import cv2
        h, w = sample["image"].shape[:2]
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
        for key in ("image", "fg_map", "bg_map"):
            if key in sample and sample[key] is not None:
                sample[key] = cv2.resize(sample[key], (rw, rh))
        sample["mask"] = cv2.resize(sample["mask"], (rw, rh))
        sample["trimap"] = cv2.resize(sample["trimap"], (rw, rh),
                                      interpolation=cv2.INTER_NEAREST)
        sample["size"] = np.array([rh, rw], np.float32)
        return sample


class RandomHorizontalFlip:

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample):
        if np.random.uniform(0, 1) < self.prob:
            for key in ("image", "mask", "trimap", "fg_map", "bg_map"):
                if key in sample and sample[key] is not None:
                    sample[key] = np.ascontiguousarray(
                        sample[key][:, ::-1])
        return sample


class Normalize:

    def __call__(self, sample):
        for key in ("image", "fg_map", "bg_map"):
            if key in sample and sample[key] is not None:
                sample[key] = sample[key].astype(np.float32) / 255.0
        if sample["mask"].max() > 1.0:
            sample["mask"] = sample["mask"].astype(np.float32) / 255.0
        return sample


class HumanMattingCollater:

    def __init__(self, resize=1024):
        self.resize = resize

    def __call__(self, samples):
        n = len(samples)
        r = self.resize
        images = np.zeros((n, r, r, 3), np.float32)
        masks = np.zeros((n, r, r), np.float32)
        trimaps = np.zeros((n, r, r), np.float32)
        fg_maps = np.zeros((n, r, r, 3), np.float32)
        bg_maps = np.zeros((n, r, r, 3), np.float32)
        sizes = np.zeros((n, 2), np.float32)
        for i, s in enumerate(samples):
            h, w = s["image"].shape[:2]
            images[i, :h, :w] = s["image"]
            masks[i, :h, :w] = s["mask"]
            trimaps[i, :h, :w] = s["trimap"]
            if s.get("fg_map") is not None:
                fg_maps[i, :h, :w] = s["fg_map"]
            if s.get("bg_map") is not None:
                bg_maps[i, :h, :w] = s["bg_map"]
            sizes[i] = s.get("size", np.array([h, w], np.float32))
        return {"image": images, "mask": masks, "trimap": trimaps,
                "fg_map": fg_maps, "bg_map": bg_maps, "size": sizes}
