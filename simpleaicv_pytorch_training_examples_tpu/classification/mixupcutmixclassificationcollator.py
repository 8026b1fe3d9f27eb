"""Mixup/CutMix batch collater (timm semantics, numpy).

Parity with /root/reference/SimpleAICV/classification/
mixupcutmixclassificationcollator.py (batch mode): per batch, with
`mixup_cutmix_prob`, apply either CutMix (with `switch_to_cutmix_prob`) or
Mixup with Beta(alpha, alpha) lambda; labels become smoothed one-hot mixes
(pairs formed with the flipped batch). Output labels are soft [B, C] floats
consumed by OneHotLabelCELoss.
"""

import numpy as np


def _one_hot(labels, num_classes, on_value, off_value):
    out = np.full((labels.shape[0], num_classes), off_value, np.float32)
    out[np.arange(labels.shape[0]), labels] = on_value
    return out


def _mixup_label(labels, num_classes, lam, smoothing):
    off_value = smoothing / num_classes
    on_value = 1.0 - smoothing + off_value
    y1 = _one_hot(labels, num_classes, on_value, off_value)
    y2 = _one_hot(labels[::-1], num_classes, on_value, off_value)
    return y1 * lam + y2 * (1.0 - lam)


def _rand_bbox(h, w, lam):
    ratio = np.sqrt(1.0 - lam)
    cut_h, cut_w = int(h * ratio), int(w * ratio)
    cy = np.random.randint(0, h)
    cx = np.random.randint(0, w)
    yl = np.clip(cy - cut_h // 2, 0, h)
    yh = np.clip(cy + cut_h // 2, 0, h)
    xl = np.clip(cx - cut_w // 2, 0, w)
    xh = np.clip(cx + cut_w // 2, 0, w)
    return yl, yh, xl, xh


class MixupCutmixClassificationCollater:

    # random augmentation happens in-collate: the runner must never fall
    # back to this collater for eval loaders (engine/runner.py checks this)
    augments = True

    def __init__(self, use_mixup=True, mixup_alpha=0.8, cutmix_alpha=1.0,
                 cutmix_minmax=None, mixup_cutmix_prob=1.0,
                 switch_to_cutmix_prob=0.5, mode="batch", correct_lam=True,
                 label_smoothing=0.1, num_classes=1000):
        assert mode == "batch", "only batch mode is implemented"
        self.use_mixup = use_mixup
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.mixup_cutmix_prob = mixup_cutmix_prob
        self.switch_to_cutmix_prob = switch_to_cutmix_prob
        self.correct_lam = correct_lam
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes

    def __call__(self, samples):
        images = np.stack([s["image"] for s in samples]).astype(np.float32)
        labels = np.asarray([s["label"] for s in samples], dtype=np.int64)

        lam = 1.0
        if self.use_mixup and np.random.rand() < self.mixup_cutmix_prob:
            use_cutmix = np.random.rand() < self.switch_to_cutmix_prob
            if use_cutmix and self.cutmix_alpha > 0:
                lam = float(np.random.beta(self.cutmix_alpha,
                                           self.cutmix_alpha))
                h, w = images.shape[1:3]
                yl, yh, xl, xh = _rand_bbox(h, w, lam)
                images[:, yl:yh, xl:xh] = images[::-1, yl:yh, xl:xh]
                if self.correct_lam:
                    lam = 1.0 - (yh - yl) * (xh - xl) / float(h * w)
            elif self.mixup_alpha > 0:
                lam = float(np.random.beta(self.mixup_alpha,
                                           self.mixup_alpha))
                images = images * lam + images[::-1] * (1.0 - lam)

        soft = _mixup_label(labels, self.num_classes, lam,
                            self.label_smoothing)
        return {"image": images, "label": soft}
