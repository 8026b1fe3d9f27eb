"""Text detection transforms, target generation, collater.

Parity with /root/reference/SimpleAICV/text_detection/common.py: samples
carry polygon annotations; target generation produces the DBNet
probability mask (polygons shrunk by offset d = area*(1-r^2)/perimeter,
r=0.4), ignore masks for '###' illegible boxes, and the threshold map
(normalized distance to the polygon border inside a +-d band).

pyclipper is unavailable here; polygon offsetting uses rasterize +
cv2.erode/dilate with an elliptical kernel of radius d, and the threshold
band uses cv2.distanceTransform — equivalent targets up to pixel
quantization.
"""

import numpy as np

from ..classification.common import load_state_dict  # re-export

__all__ = ["RandomHorizontalFlip", "YoloStyleResize", "Normalize",
           "TextDetectionCollater", "generate_dbnet_targets",
           "load_state_dict"]


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
        sample["image"] = cv2.resize(sample["image"], (rw, rh))
        sample["annots"] = {
            "boxes": [np.asarray(b, np.float32) * factor
                      for b in sample["annots"]["boxes"]],
            "ignores": sample["annots"]["ignores"],
        }
        sample["size"] = np.array([rh, rw], np.float32)
        return sample


class RandomHorizontalFlip:

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample):
        if np.random.uniform(0, 1) < self.prob:
            image = np.ascontiguousarray(sample["image"][:, ::-1])
            w = image.shape[1]
            boxes = []
            for b in sample["annots"]["boxes"]:
                b = np.asarray(b, np.float32).copy()
                b[:, 0] = w - b[:, 0]
                boxes.append(b)
            sample["image"] = image
            sample["annots"] = {"boxes": boxes,
                                "ignores": sample["annots"]["ignores"]}
        return sample


class Normalize:

    def __call__(self, sample):
        sample["image"] = sample["image"].astype(np.float32) / 255.0
        return sample


def _offset_distance(poly, shrink_ratio=0.4):
    import cv2
    area = cv2.contourArea(poly.astype(np.float32))
    perimeter = cv2.arcLength(poly.astype(np.float32), True)
    if perimeter < 1e-3:
        return 0.0
    return area * (1.0 - shrink_ratio**2) / perimeter


def generate_dbnet_targets(image_shape, boxes, ignores, shrink_ratio=0.4,
                           thresh_min=0.3, thresh_max=0.7):
    """Build DBNet training targets for one image.

    Returns dict: probability_mask, probability_ignore_mask, threshold_mask,
    threshold_ignore_mask (all [H, W] float32). Ignore masks are 1 on
    trainable pixels (reference semantics).
    """
    import cv2
    h, w = image_shape[:2]
    prob_mask = np.zeros((h, w), np.float32)
    prob_ignore = np.ones((h, w), np.float32)
    thresh_mask = np.zeros((h, w), np.float32)
    thresh_ignore = np.zeros((h, w), np.float32)

    for poly, ignore in zip(boxes, ignores):
        poly = np.asarray(poly, np.float32).reshape(-1, 2)
        if poly.shape[0] < 3:
            continue
        ipoly = poly.astype(np.int32)
        if ignore:
            cv2.fillPoly(prob_ignore, [ipoly], 0.0)
            continue
        d = max(1, int(round(_offset_distance(poly, shrink_ratio))))
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                           (2 * d + 1, 2 * d + 1))
        full = np.zeros((h, w), np.uint8)
        cv2.fillPoly(full, [ipoly], 1)
        shrunk = cv2.erode(full, kernel)
        if shrunk.sum() == 0:
            # too small to shrink: ignore for prob loss (reference marks
            # un-shrinkable polys as ignore)
            cv2.fillPoly(prob_ignore, [ipoly], 0.0)
        else:
            prob_mask = np.maximum(prob_mask, shrunk.astype(np.float32))

        # threshold band: dilate by d; value = 1 - dist_to_border/d
        dilated = cv2.dilate(full, kernel)
        thresh_ignore = np.maximum(thresh_ignore,
                                   dilated.astype(np.float32))
        # distance to the polygon border, computed inside and outside
        border = np.zeros((h, w), np.uint8)
        cv2.polylines(border, [ipoly], True, 1)
        dist = cv2.distanceTransform((1 - border).astype(np.uint8),
                                     cv2.DIST_L2, 3)
        band = np.clip(1.0 - dist / max(d, 1), 0.0, 1.0) * dilated
        thresh_mask = np.maximum(thresh_mask, band)

    thresh_mask = thresh_mask * (thresh_max - thresh_min) + thresh_min
    return {
        "probability_mask": prob_mask,
        "probability_ignore_mask": prob_ignore,
        "threshold_mask": thresh_mask.astype(np.float32),
        "threshold_ignore_mask": thresh_ignore,
    }


class TextDetectionCollater:
    """Pads images + target masks to a fixed square canvas [B,R,R]."""

    def __init__(self, resize=1024, shrink_ratio=0.4):
        self.resize = resize
        self.shrink_ratio = shrink_ratio

    def __call__(self, samples):
        n = len(samples)
        r = self.resize
        images = np.zeros((n, r, r, 3), np.float32)
        keys = ("probability_mask", "probability_ignore_mask",
                "threshold_mask", "threshold_ignore_mask")
        shapes = {k: np.zeros((n, r, r), np.float32) for k in keys}
        sizes = np.zeros((n, 2), np.float32)
        for i, s in enumerate(samples):
            img = s["image"]
            h, w = img.shape[:2]
            images[i, :h, :w] = img
            targets = generate_dbnet_targets(
                (h, w), s["annots"]["boxes"], s["annots"]["ignores"],
                self.shrink_ratio)
            for k in keys:
                shapes[k][i, :h, :w] = targets[k]
            sizes[i] = s.get("size", np.array([h, w], np.float32))
        out = {"image": images, "size": sizes}
        out.update(shapes)
        return out


class TextDetectionEvalCollater(TextDetectionCollater):
    """Eval-time collater: also carries the raw gt polygons + ignore flags
    (host-side lists, consumed by the DetEval metric — reference
    text_scripts.py:1150-1228 keeps `shapes` alongside the tensors)."""

    def __call__(self, samples):
        out = super().__call__(samples)
        out["gt_polys"] = [s["annots"]["boxes"] for s in samples]
        out["gt_ignores"] = [s["annots"]["ignores"] for s in samples]
        return out
