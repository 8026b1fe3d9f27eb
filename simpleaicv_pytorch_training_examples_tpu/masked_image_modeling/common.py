"""MAE collater: patchify + per-patch-normalize labels host-side.

Parity with /root/reference/SimpleAICV/masked_image_modeling/common.py:17-56
(MAESelfSupervisedPretrainCollater), but emitting NHWC images (TPU layout)
and numpy labels.
"""

import numpy as np

__all__ = ["MAESelfSupervisedPretrainCollater"]


class MAESelfSupervisedPretrainCollater:

    def __init__(self, image_size=224, patch_size=16, norm_label=True):
        assert image_size % patch_size == 0
        self.patch_size = patch_size
        self.patch_nums = image_size // patch_size
        self.norm_label = norm_label

    def __call__(self, samples):
        images = np.stack([s["image"] for s in samples]).astype(np.float32)
        b, h, w, c = images.shape
        p, g = self.patch_size, self.patch_nums
        # NHWC -> [B, gh, p, gw, p, C] -> [B, gh*gw, p*p*C]
        labels = images.reshape(b, g, p, g, p, c)
        labels = labels.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g,
                                                            p * p * c)
        if self.norm_label:
            mean = labels.mean(axis=-1, keepdims=True)
            var = labels.var(axis=-1, keepdims=True)
            labels = (labels - mean) / (var + 1e-4)**0.5
        return {"image": images, "label": labels.astype(np.float32)}
