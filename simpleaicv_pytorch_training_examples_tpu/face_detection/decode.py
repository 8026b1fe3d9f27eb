"""RetinaFace decoder.

Parity with /root/reference/SimpleAICV/face_detection/decode.py:24-120
(RetinaFaceDecoder): single-class sigmoid scores, txtytwth decode over the
square face anchors, score threshold + top-n + greedy NMS — all on device
via the shared DecodeMethod.
"""

import jax.numpy as jnp
import numpy as np

from ..detection.decode import DecodeMethod, RetinaDecoder
from .models import RetinaFaceAnchors

__all__ = ["RetinaFaceDecoder"]


class RetinaFaceDecoder:

    def __init__(self, anchor_sizes=((8, 16, 32), (32, 64, 128),
                                     (128, 256, 512)),
                 strides=(8, 16, 32), max_object_num=100,
                 min_score_threshold=0.05, topn=1000,
                 nms_type="python_nms", nms_threshold=0.5):
        self.anchors = RetinaFaceAnchors(anchor_sizes, strides)
        self.decode_function = DecodeMethod(max_object_num,
                                            min_score_threshold, topn,
                                            nms_type, nms_threshold)

    def __call__(self, preds):
        cls_preds, reg_preds = preds
        feature_sizes = [[p.shape[2], p.shape[1]] for p in cls_preds]
        anchors = self.anchors.flat_anchors(feature_sizes)

        b = cls_preds[0].shape[0]
        cls_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, 1) for p in cls_preds],
            axis=1).astype(jnp.float32)
        reg_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, 4) for p in reg_preds],
            axis=1).astype(jnp.float32)

        cls_scores = cls_preds[..., 0]
        cls_classes = jnp.zeros_like(cls_scores)
        pred_bboxes = RetinaDecoder.snap_txtytwth_to_x1y1x2y2(
            reg_preds, jnp.asarray(anchors))
        return self.decode_function(cls_scores, cls_classes, pred_bboxes)
