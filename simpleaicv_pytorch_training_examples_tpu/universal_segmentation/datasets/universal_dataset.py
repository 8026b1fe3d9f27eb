"""Universal-segmentation dataset adapters.

Capability parity with /root/reference/SimpleAICV/universal_segmentation/
datasets/ (ade20kdataset, cocosemanticsegmentationdataset, cocodataset,
samacocodataset, face_parsing_dataset, human_parsing_dataset,
salient_object_detection_dataset, human_matting_dataset,
human_instance_matting_dataset — 9 files, each re-emitting one sub-task's
data in the Mask2Former (classes, instance-mask stack) contract).

TPU re-design: the underlying per-task datasets already exist in this
framework, so the universal contract is produced at collate time by three
fixed-shape collaters — semantic (per-class stacks from a label map),
binary (fg-vs-bg from SOD/matting alphas), instance (per-annotation
masks). Every batch is [B, M, H, W] with -1-padded class labels, matching
UniversalSegmentationLoss.
"""

import numpy as np

__all__ = ["UniversalSemanticCollater", "UniversalBinaryCollater",
           "UniversalInstanceCollater"]


class UniversalSemanticCollater:
    """Label-map datasets (ADE20K / COCO-semantic / face / human parsing):
    each present class becomes one instance."""

    def __init__(self, resize=512, max_instances=32, ignore_index=255,
                 background_class=0):
        self.resize = resize
        self.max_instances = max_instances
        self.ignore_index = ignore_index
        self.background_class = background_class

    def __call__(self, samples):
        n = len(samples)
        r = self.resize
        images = np.zeros((n, r, r, 3), np.float32)
        gt_classes = np.full((n, self.max_instances), -1.0, np.float32)
        gt_masks = np.zeros((n, self.max_instances, r, r), np.float32)
        for i, s in enumerate(samples):
            img, m = s["image"], s["mask"]
            h, w = img.shape[:2]
            images[i, :h, :w] = img
            classes = np.unique(m.astype(np.int64))
            classes = classes[(classes != self.background_class)
                              & (classes != self.ignore_index)]
            classes = classes[:self.max_instances]
            for j, c in enumerate(classes):
                gt_classes[i, j] = c
                gt_masks[i, j, :h, :w] = (m == c).astype(np.float32)
        return {"image": images, "gt_classes": gt_classes,
                "gt_masks": gt_masks}


class UniversalBinaryCollater:
    """SOD / human-matting datasets: the binarized foreground is a single
    class-1 instance (reference salient_object_detection_dataset.py /
    human_matting_dataset.py adapters)."""

    def __init__(self, resize=512, max_instances=8, fg_threshold=0.5):
        self.resize = resize
        self.max_instances = max_instances
        self.fg_threshold = fg_threshold

    def __call__(self, samples):
        n = len(samples)
        r = self.resize
        images = np.zeros((n, r, r, 3), np.float32)
        gt_classes = np.full((n, self.max_instances), -1.0, np.float32)
        gt_masks = np.zeros((n, self.max_instances, r, r), np.float32)
        for i, s in enumerate(samples):
            img = s["image"]
            m = s.get("mask", s.get("alpha"))
            h, w = img.shape[:2]
            images[i, :h, :w] = img
            fg = np.asarray(m, np.float32)
            if fg.max() > 1.5:
                fg = fg / 255.0
            fg = (fg > self.fg_threshold).astype(np.float32)
            if fg.sum() > 0:
                gt_classes[i, 0] = 1.0
                gt_masks[i, 0, :h, :w] = fg
        return {"image": images, "gt_classes": gt_classes,
                "gt_masks": gt_masks}


class UniversalInstanceCollater:
    """Instance datasets (COCO / SAMA-COCO / human-instance-matting):
    per-annotation masks pass straight through (class ids already in the
    instance dataset's space)."""

    def __init__(self, resize=512, max_instances=32):
        self.resize = resize
        self.max_instances = max_instances

    def __call__(self, samples):
        n = len(samples)
        r = self.resize
        images = np.zeros((n, r, r, 3), np.float32)
        gt_classes = np.full((n, self.max_instances), -1.0, np.float32)
        gt_masks = np.zeros((n, self.max_instances, r, r), np.float32)
        for i, s in enumerate(samples):
            img = s["image"]
            h, w = img.shape[:2]
            images[i, :h, :w] = img
            annots = np.asarray(s["annots"])  # [K, 5] boxes+class
            masks = np.asarray(s["mask"])     # [K, H, W]
            k_out = 0
            for k in range(len(annots)):
                if k_out >= self.max_instances or annots[k, 4] < 0:
                    continue
                if masks[k].sum() <= 0:
                    continue
                gt_classes[i, k_out] = float(annots[k, 4])
                gt_masks[i, k_out, :h, :w] = masks[k].astype(np.float32)
                k_out += 1
        return {"image": images, "gt_classes": gt_classes,
                "gt_masks": gt_masks}
