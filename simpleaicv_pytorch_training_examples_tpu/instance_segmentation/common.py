"""Instance segmentation transforms + fixed-shape collaters.

Parity with /root/reference/SimpleAICV/instance_segmentation/common.py
(YOLACTInstanceSegmentationCollater :161, SOLOV2InstanceSegmentationCollater
:217), reshaped for static-shape SPMD training:
- images pad to fixed square NHWC;
- annots pad to [B, max_instances, 5] with -1 (YOLACT boxes normalized by
  resize like the reference);
- per-instance masks are downsampled host-side to mask-feature resolution
  (resize/4) and padded to [B, max_instances, H/4, W/4], keeping device
  HBM small (the reference ships full-res ragged mask lists to GPU).
"""

import numpy as np

from ..classification.common import load_state_dict  # re-export
from ..detection.common import DetectionResize, Normalize

__all__ = ["InstanceSegmentationResize", "RandomHorizontalFlip", "Normalize",
           "YOLACTInstanceSegmentationCollater",
           "SOLOV2InstanceSegmentationCollater", "load_state_dict"]


class InstanceSegmentationResize(DetectionResize):
    """DetectionResize that also resizes the instance mask stack."""

    def __call__(self, sample):
        import cv2
        h0 = sample["image"].shape[0]
        sample = super().__call__(sample)
        rh, rw = sample["image"].shape[:2]
        mask = sample["mask"]
        if mask.shape[2] > 0:
            mask = cv2.resize(mask, (rw, rh),
                              interpolation=cv2.INTER_LINEAR)
            if mask.ndim == 2:
                mask = mask[:, :, None]
        else:
            mask = np.zeros((rh, rw, 0), np.float32)
        sample["mask"] = mask
        return sample


class RandomHorizontalFlip:

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, sample):
        if sample["annots"].shape[0] == 0 or \
                np.random.uniform(0, 1) >= self.prob:
            return sample
        image = np.ascontiguousarray(sample["image"][:, ::-1])
        mask = np.ascontiguousarray(sample["mask"][:, ::-1])
        annots = sample["annots"]
        w = image.shape[1]
        x1 = annots[:, 0].copy()
        x2 = annots[:, 2].copy()
        annots[:, 0] = w - x2
        annots[:, 2] = w - x1
        sample.update(image=image, mask=mask, annots=annots)
        return sample


def _collate(samples, resize, max_instances, mask_downsample,
             normalize_boxes):
    import cv2
    n = len(samples)
    r = resize
    rm = r // mask_downsample
    images = np.zeros((n, r, r, 3), np.float32)
    annots = np.full((n, max_instances, 5), -1.0, np.float32)
    masks = np.zeros((n, max_instances, rm, rm), np.float32)
    scales = np.zeros((n,), np.float32)
    sizes = np.zeros((n, 2), np.float32)
    for i, s in enumerate(samples):
        img = s["image"]
        h, w = img.shape[:2]
        images[i, :h, :w] = img
        a = s["annots"][:max_instances]
        if a.shape[0] > 0:
            box = a.copy()
            if normalize_boxes:
                box[:, 0:4] = box[:, 0:4] / r
            annots[i, :box.shape[0]] = box
            m = s["mask"][:, :, :max_instances]  # [h,w,N]
            canvas = np.zeros((r, r, m.shape[2]), np.float32)
            canvas[:h, :w] = m
            small = cv2.resize(canvas, (rm, rm),
                               interpolation=cv2.INTER_LINEAR)
            if small.ndim == 2:
                small = small[:, :, None]
            masks[i, :m.shape[2]] = (small > 0.5).astype(
                np.float32).transpose(2, 0, 1)
        scales[i] = s.get("scale", 1.0)
        sizes[i] = s.get("size", np.array(img.shape[:2], np.float32))
    return {"image": images, "annots": annots, "mask": masks,
            "scale": scales, "size": sizes}


class YOLACTInstanceSegmentationCollater:

    def __init__(self, resize=544, resize_type="retina_style",
                 max_instances=36):
        self.resize = resize
        if resize_type == "retina_style":
            self.resize = int(round(self.resize * 1333.0 / 800))
        self.max_instances = max_instances

    def __call__(self, samples):
        return _collate(samples, self.resize, self.max_instances,
                        mask_downsample=4, normalize_boxes=True)


class SOLOV2InstanceSegmentationCollater:

    def __init__(self, resize=1024, resize_type="yolo_style",
                 max_instances=36):
        self.resize = resize
        if resize_type == "retina_style":
            self.resize = int(round(self.resize * 1333.0 / 800))
        self.max_instances = max_instances

    def __call__(self, samples):
        return _collate(samples, self.resize, self.max_instances,
                        mask_downsample=4, normalize_boxes=False)
