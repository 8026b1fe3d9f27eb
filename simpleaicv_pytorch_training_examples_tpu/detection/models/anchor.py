"""Static anchor / position generation (numpy, computed once).

Parity with /root/reference/SimpleAICV/detection/models/anchor.py:5-135
(RetinaAnchors, FCOSPositions). The reference regenerates anchors inside
every loss/decode call; here they are pure-numpy functions of the (static)
feature sizes, so under jit they become compile-time constants living in
HBM — zero per-step host work.
"""

import math

import numpy as np


class RetinaAnchors:

    def __init__(self,
                 areas=((32, 32), (64, 64), (128, 128), (256, 256),
                        (512, 512)),
                 ratios=(0.5, 1, 2),
                 scales=(2**0, 2**(1.0 / 3.0), 2**(2.0 / 3.0)),
                 strides=(8, 16, 32, 64, 128)):
        self.areas = np.array(areas, dtype=np.float32)
        self.ratios = np.array(ratios, dtype=np.float32)
        self.scales = np.array(scales, dtype=np.float32)
        self.strides = np.array(strides, dtype=np.float32)

    def __call__(self, fpn_feature_sizes):
        """fpn_feature_sizes: [[w, h], ...] per level.

        Returns list of [h, w, n_anchors, 4] xyxy anchors per level.
        """
        one_image_anchors = []
        for index, area in enumerate(self.areas):
            base = self.generate_base_anchors(area)
            anchors = self.generate_anchors_on_feature_map(
                base, fpn_feature_sizes[index], self.strides[index])
            one_image_anchors.append(anchors)
        return one_image_anchors

    def generate_base_anchors(self, area):
        # [n_ratio*n_scale, 2] (w, h) pairs; ratio-major like the reference
        aspects = np.array([[[s * math.sqrt(r), s * math.sqrt(1 / r)]
                             for s in self.scales] for r in self.ratios],
                           dtype=np.float32).reshape(-1, 2)
        wh = area * aspects
        base = np.zeros((len(aspects), 4), dtype=np.float32)
        base[:, 0:2] = -wh / 2
        base[:, 2:4] = wh / 2
        return base

    def generate_anchors_on_feature_map(self, base_anchors, feature_map_size,
                                        stride):
        w, h = int(feature_map_size[0]), int(feature_map_size[1])
        shifts_x = (np.arange(0, w) + 0.5) * stride
        shifts_y = (np.arange(0, h) + 0.5) * stride
        sx, sy = np.meshgrid(shifts_x, shifts_y)  # [h, w]
        shifts = np.stack([sx, sy, sx, sy], axis=-1)[:, :, None, :]
        anchors = base_anchors[None, None] + shifts  # [h, w, A, 4]
        return anchors.astype(np.float32)

    def flat_anchors(self, fpn_feature_sizes) -> np.ndarray:
        """All levels concatenated: [total_anchors, 4]."""
        levels = self(fpn_feature_sizes)
        return np.concatenate([l.reshape(-1, 4) for l in levels], axis=0)


class FCOSPositions:

    def __init__(self, strides=(8, 16, 32, 64, 128)):
        self.strides = np.array(strides, dtype=np.float32)

    def __call__(self, fpn_feature_sizes):
        """Returns list of [h, w, 2] (x, y) center positions per level."""
        out = []
        for stride, size in zip(self.strides, fpn_feature_sizes):
            w, h = int(size[0]), int(size[1])
            shifts_x = (np.arange(0, w) + 0.5) * stride
            shifts_y = (np.arange(0, h) + 0.5) * stride
            sx, sy = np.meshgrid(shifts_x, shifts_y)  # [h, w]
            out.append(np.stack([sx, sy], axis=-1).astype(np.float32))
        return out

    def flat_positions(self, fpn_feature_sizes) -> np.ndarray:
        levels = self(fpn_feature_sizes)
        return np.concatenate([l.reshape(-1, 2) for l in levels], axis=0)
