"""Detection transforms + collaters (host numpy, dict samples).

Parity with /root/reference/SimpleAICV/detection/common.py:16-340:
DetectionResize (retina_style short/long-edge rule with 1333/800 ratio vs
yolo_style long-edge rule, optional multi-scale snapped to stride),
RandomHorizontalFlip/RandomCrop/RandomTranslate on boxes, and a collater
that pads images into a fixed square canvas and annots to a fixed
max_annots_num with -1 (static shapes for XLA; NHWC).
Samples: {'image': HWC float32, 'annots': [N,5] xyxy+class,
'scale': float, 'size': [h,w]}.
"""

import numpy as np

from ..classification.common import load_state_dict  # re-export

__all__ = [
    "DetectionResize", "RandomHorizontalFlip", "RandomCrop",
    "RandomTranslate", "Normalize", "DetectionCollater", "load_state_dict",
]


class Normalize:

    def __call__(self, sample):
        sample["image"] = sample["image"].astype(np.float32) / 255.0
        return sample


class DetectionResize:

    def __init__(self, resize=800, stride=32, resize_type="retina_style",
                 multi_scale=False, multi_scale_range=(0.8, 1.0)):
        assert resize_type in ("retina_style", "yolo_style")
        self.resize = resize
        self.stride = stride
        self.resize_type = resize_type
        self.multi_scale = multi_scale
        self.multi_scale_range = multi_scale_range
        self.ratio = 1333.0 / 800

    def _pick_resize(self):
        lo = int(self.multi_scale_range[0] * self.resize)
        hi = int(self.multi_scale_range[1] * self.resize)
        resize_list = sorted({i // self.stride * self.stride
                              for i in range(lo, hi + self.stride)})
        return resize_list[np.random.randint(0, len(resize_list))]

    def __call__(self, sample):
        import cv2
        image, annots = sample["image"], sample["annots"]
        h, w = image.shape[:2]

        if self.resize_type == "retina_style":
            short = self._pick_resize() if self.multi_scale else self.resize
            scales = (short, int(round(self.resize * self.ratio)))
            max_long, max_short = max(scales), min(scales)
            factor = min(max_long / max(h, w), max_short / min(h, w))
        else:
            final = self._pick_resize() if self.multi_scale else self.resize
            factor = final / max(h, w)

        rh, rw = int(round(h * factor)), int(round(w * factor))
        image = cv2.resize(image, (rw, rh))
        factor = np.float32(factor)
        if annots.shape[0] > 0:
            annots[:, :4] *= factor
        sample["image"] = image
        sample["annots"] = annots
        sample["scale"] = sample.get("scale", 1.0) * factor
        sample["size"] = np.array([rh, rw], np.float32)
        return sample


class RandomHorizontalFlip:

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample):
        image, annots = sample["image"], sample["annots"]
        if annots.shape[0] == 0:
            return sample
        if np.random.uniform(0, 1) < self.prob:
            image = np.ascontiguousarray(image[:, ::-1, :])
            w = image.shape[1]
            x1 = annots[:, 0].copy()
            x2 = annots[:, 2].copy()
            annots[:, 0] = w - x2
            annots[:, 2] = w - x1
            sample["image"] = image
            sample["annots"] = annots
            sample["size"] = np.array(image.shape[:2], np.float32)
        return sample


class RandomCrop:

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample):
        image, annots = sample["image"], sample["annots"]
        if annots.shape[0] == 0 or np.random.uniform(0, 1) >= self.prob:
            return sample
        h, w = image.shape[:2]
        max_bbox = np.concatenate([np.min(annots[:, 0:2], axis=0),
                                   np.max(annots[:, 2:4], axis=0)], axis=-1)
        max_left = max_bbox[0]
        max_up = max_bbox[1]
        max_right = w - max_bbox[2]
        max_down = h - max_bbox[3]
        crop_xmin = max(0, int(max_bbox[0] -
                               np.random.uniform(0, max_left)))
        crop_ymin = max(0, int(max_bbox[1] - np.random.uniform(0, max_up)))
        crop_xmax = min(w, int(max_bbox[2] +
                               np.random.uniform(0, max_right)))
        crop_ymax = min(h, int(max_bbox[3] + np.random.uniform(0, max_down)))
        image = image[crop_ymin:crop_ymax, crop_xmin:crop_xmax]
        annots[:, [0, 2]] -= crop_xmin
        annots[:, [1, 3]] -= crop_ymin
        sample["image"] = image
        sample["annots"] = annots
        sample["size"] = np.array(image.shape[:2], np.float32)
        return sample


class RandomTranslate:

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample):
        image, annots = sample["image"], sample["annots"]
        if annots.shape[0] == 0 or np.random.uniform(0, 1) >= self.prob:
            return sample
        h, w = image.shape[:2]
        max_bbox = np.concatenate([np.min(annots[:, 0:2], axis=0),
                                   np.max(annots[:, 2:4], axis=0)], axis=-1)
        tx = np.random.uniform(-(max_bbox[0] - 1), (w - max_bbox[2] - 1))
        ty = np.random.uniform(-(max_bbox[1] - 1), (h - max_bbox[3] - 1))
        M = np.array([[1, 0, tx], [0, 1, ty]], dtype=np.float32)
        import cv2
        image = cv2.warpAffine(image, M, (w, h))
        annots[:, [0, 2]] += tx
        annots[:, [1, 3]] += ty
        sample["image"] = image
        sample["annots"] = annots
        return sample


class DetectionCollater:

    def __init__(self, resize=800, resize_type="retina_style",
                 max_annots_num=100):
        assert resize_type in ("retina_style", "yolo_style")
        self.resize = resize
        if resize_type == "retina_style":
            self.resize = int(round(self.resize * 1333.0 / 800))
        self.max_annots_num = max_annots_num

    def __call__(self, samples):
        n = len(samples)
        images = np.zeros((n, self.resize, self.resize, 3), np.float32)
        annots = np.full((n, self.max_annots_num, 5), -1.0, np.float32)
        scales = np.zeros((n,), np.float32)
        sizes = np.zeros((n, 2), np.float32)
        for i, s in enumerate(samples):
            img = s["image"]
            images[i, :img.shape[0], :img.shape[1]] = img
            a = s["annots"][:self.max_annots_num]
            if a.shape[0] > 0:
                annots[i, :a.shape[0]] = a
            scales[i] = s.get("scale", 1.0)
            sizes[i] = s.get("size", np.array(img.shape[:2], np.float32))
        return {"image": images, "annots": annots, "scale": scales,
                "size": sizes}


class DETRDetectionCollater:
    """DETR variant: adds the pixel padding mask (True = padded) and
    cxcywh-normalized 'scaled_annots' (reference common.py:291-360)."""

    def __init__(self, resize=800, resize_type="yolo_style",
                 max_annots_num=100):
        assert resize_type in ("retina_style", "yolo_style")
        self.resize = resize
        if resize_type == "retina_style":
            self.resize = int(round(self.resize * 1333.0 / 800))
        self.max_annots_num = max_annots_num

    def __call__(self, samples):
        n = len(samples)
        r = self.resize
        images = np.zeros((n, r, r, 3), np.float32)
        masks = np.ones((n, r, r), bool)
        annots = np.full((n, self.max_annots_num, 5), -1.0, np.float32)
        scaled_annots = np.full((n, self.max_annots_num, 5), -1.0,
                                np.float32)
        scales = np.zeros((n,), np.float32)
        sizes = np.zeros((n, 2), np.float32)
        for i, s in enumerate(samples):
            img = s["image"]
            h, w = img.shape[:2]
            images[i, :h, :w] = img
            masks[i, :h, :w] = False
            a = s["annots"][:self.max_annots_num]
            if a.shape[0] > 0:
                annots[i, :a.shape[0]] = a
                wh = np.array([w, h, w, h], np.float32)
                ctr = (a[:, 0:2] + a[:, 2:4]) / 2
                box_wh = a[:, 2:4] - a[:, 0:2]
                cxcywh = np.concatenate([ctr, box_wh], axis=1) / wh
                scaled_annots[i, :a.shape[0], 0:4] = cxcywh
                scaled_annots[i, :a.shape[0], 4] = a[:, 4]
            scales[i] = s.get("scale", 1.0)
            sizes[i] = s.get("size", np.array(img.shape[:2], np.float32))
        return {"image": images, "mask": masks, "annots": annots,
                "scaled_annots": scaled_annots, "scale": scales,
                "size": sizes}


__all__.append("DETRDetectionCollater")
