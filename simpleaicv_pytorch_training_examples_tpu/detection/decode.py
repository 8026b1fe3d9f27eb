"""Detection decoders — fully on-device (the reference's host-numpy decode
moved onto TPU).

Parity with /root/reference/SimpleAICV/detection/decode.py:106-370
(DecodeMethod / RetinaDecoder / FCOSDecoder): per-image argmax class +
score, score threshold, top-n preselect, greedy (D)IoU NMS, fixed
max_object_num output slots padded with -1.

TPU-first: the entire decode is one jitted program — anchor decode
(compile-time constant anchors), top-k preselect (jax.lax.top_k), and the
fixed-iteration greedy NMS from ops/nms.py — so eval never round-trips to
host numpy. Box coordinates are floor-cast to int then back to float to
match the reference's `.astype(np.int32)` quantization.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import device_nms
from .models.anchor import FCOSPositions, RetinaAnchors

__all__ = ["RetinaDecoder", "FCOSDecoder", "DecodeMethod"]


class DecodeMethod:
    """Shared device decode: threshold -> top-n -> NMS -> fixed slots."""

    def __init__(self, max_object_num=100, min_score_threshold=0.05,
                 topn=1000, nms_type="python_nms", nms_threshold=0.5):
        assert nms_type in ("torch_nms", "python_nms", "diou_python_nms")
        self.max_object_num = max_object_num
        self.min_score_threshold = min_score_threshold
        self.topn = topn
        self.diou = nms_type == "diou_python_nms"
        self.nms_threshold = nms_threshold

        @jax.jit
        def _decode(cls_scores, cls_classes, pred_bboxes):
            def one_image(scores, classes, boxes):
                valid = scores > self.min_score_threshold
                masked = jnp.where(valid, scores, -jnp.inf)
                k = min(self.topn, masked.shape[0])
                top_scores, top_idx = jax.lax.top_k(masked, k)
                top_boxes = boxes[top_idx]
                top_classes = classes[top_idx]
                out_scores, keep_idx = device_nms(
                    top_boxes, top_scores, self.nms_threshold,
                    self.max_object_num, diou=self.diou)
                kept = keep_idx >= 0
                safe_idx = jnp.clip(keep_idx, 0, None)
                out_classes = jnp.where(kept,
                                        top_classes[safe_idx].astype(
                                            jnp.float32), -1.0)
                out_boxes = jnp.where(kept[:, None], top_boxes[safe_idx],
                                      0.0)
                return out_scores, out_classes, out_boxes

            return jax.vmap(one_image)(cls_scores, cls_classes, pred_bboxes)

        self._decode = _decode

    def __call__(self, cls_scores, cls_classes, pred_bboxes):
        scores, classes, boxes = self._decode(jnp.asarray(cls_scores),
                                              jnp.asarray(cls_classes),
                                              jnp.asarray(pred_bboxes))
        return [np.asarray(scores), np.asarray(classes), np.asarray(boxes)]


class RetinaDecoder:

    def __init__(self,
                 areas=((32, 32), (64, 64), (128, 128), (256, 256),
                        (512, 512)),
                 ratios=(0.5, 1, 2),
                 scales=(2**0, 2**(1.0 / 3.0), 2**(2.0 / 3.0)),
                 strides=(8, 16, 32, 64, 128),
                 max_object_num=100,
                 min_score_threshold=0.05,
                 topn=1000,
                 nms_type="python_nms",
                 nms_threshold=0.5):
        self.anchors = RetinaAnchors(areas, ratios, scales, strides)
        self.decode_function = DecodeMethod(max_object_num,
                                            min_score_threshold, topn,
                                            nms_type, nms_threshold)

    def __call__(self, preds):
        cls_preds, reg_preds = preds
        feature_sizes = [[p.shape[2], p.shape[1]] for p in cls_preds]
        anchors = self.anchors.flat_anchors(feature_sizes)  # [A, 4] numpy

        b = cls_preds[0].shape[0]
        cls_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, p.shape[-1]) for p in cls_preds],
            axis=1).astype(jnp.float32)
        reg_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, 4) for p in reg_preds],
            axis=1).astype(jnp.float32)

        cls_classes = jnp.argmax(cls_preds, axis=2)
        cls_scores = jnp.take_along_axis(cls_preds, cls_classes[..., None],
                                         axis=2)[..., 0]
        pred_bboxes = self.snap_txtytwth_to_x1y1x2y2(reg_preds,
                                                     jnp.asarray(anchors))
        return self.decode_function(cls_scores, cls_classes, pred_bboxes)

    @staticmethod
    def snap_txtytwth_to_x1y1x2y2(reg_preds, anchors):
        anchors_wh = anchors[None, :, 2:4] - anchors[None, :, 0:2]
        anchors_ctr = anchors[None, :, 0:2] + 0.5 * anchors_wh
        wh = jnp.exp(reg_preds[:, :, 2:4]) * anchors_wh
        ctr = reg_preds[:, :, 0:2] * anchors_wh + anchors_ctr
        boxes = jnp.concatenate([ctr - 0.5 * wh, ctr + 0.5 * wh], axis=2)
        # reference quantizes to int32
        return jnp.trunc(boxes).astype(jnp.float32)


class FCOSDecoder:

    def __init__(self,
                 strides=(8, 16, 32, 64, 128),
                 max_object_num=100,
                 min_score_threshold=0.05,
                 topn=1000,
                 nms_type="python_nms",
                 nms_threshold=0.6):
        self.positions = FCOSPositions(strides)
        self.decode_function = DecodeMethod(max_object_num,
                                            min_score_threshold, topn,
                                            nms_type, nms_threshold)

    def __call__(self, preds):
        cls_preds, reg_preds, center_preds = preds
        feature_sizes = [[p.shape[2], p.shape[1]] for p in cls_preds]
        positions = self.positions.flat_positions(feature_sizes)

        b = cls_preds[0].shape[0]
        cls_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, p.shape[-1]) for p in cls_preds],
            axis=1).astype(jnp.float32)
        reg_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, 4) for p in reg_preds],
            axis=1).astype(jnp.float32)
        center_preds = jnp.concatenate(
            [jnp.asarray(p).reshape(b, -1, 1) for p in center_preds],
            axis=1).astype(jnp.float32)

        cls_classes = jnp.argmax(cls_preds, axis=2)
        cls_scores = jnp.take_along_axis(cls_preds, cls_classes[..., None],
                                         axis=2)[..., 0]
        cls_scores = jnp.sqrt(cls_scores * center_preds[..., 0])
        pred_bboxes = self.snap_ltrb_to_x1y1x2y2(reg_preds,
                                                 jnp.asarray(positions))
        return self.decode_function(cls_scores, cls_classes, pred_bboxes)

    @staticmethod
    def snap_ltrb_to_x1y1x2y2(reg_preds, positions):
        reg_preds = jnp.exp(reg_preds)
        xy_min = positions[None] - reg_preds[:, :, 0:2]
        xy_max = positions[None] + reg_preds[:, :, 2:4]
        boxes = jnp.concatenate([xy_min, xy_max], axis=2)
        return jnp.trunc(boxes).astype(jnp.float32)


class DETRDecoder:
    """DETR decode: per-query softmax (no-object dropped), cxcywh -> xyxy in
    input-image coordinates via per-image scaled sizes; top max_object_num
    by score with a score threshold (no NMS — DETR is set-based).

    Parity with /root/reference/SimpleAICV/detection/decode.py:366-440.
    """

    def __init__(self, num_classes=80, max_object_num=100,
                 min_score_threshold=0.05, topn=100):
        self.num_classes = num_classes
        self.max_object_num = max_object_num
        self.min_score_threshold = min_score_threshold
        self.topn = topn

        @jax.jit
        def _decode(cls_pred, reg_pred, sizes):
            # cls_pred [B,Q,C+1] logits, reg_pred [B,Q,4] cxcywh in [0,1]
            probs = jax.nn.softmax(cls_pred.astype(jnp.float32), axis=-1)
            scores = probs[..., :-1].max(axis=-1)
            classes = probs[..., :-1].argmax(axis=-1).astype(jnp.float32)
            hw = sizes[:, None, :]  # [B,1,2] (h,w)
            scale = jnp.concatenate([hw[..., 1:2], hw[..., 0:1],
                                     hw[..., 1:2], hw[..., 0:1]], axis=-1)
            boxes = jnp.concatenate(
                [reg_pred[..., :2] - 0.5 * reg_pred[..., 2:4],
                 reg_pred[..., :2] + 0.5 * reg_pred[..., 2:4]],
                axis=-1) * scale

            k = min(self.max_object_num, scores.shape[1])
            top_scores, top_idx = jax.lax.top_k(scores, k)
            top_classes = jnp.take_along_axis(classes, top_idx, axis=1)
            top_boxes = jnp.take_along_axis(boxes, top_idx[..., None],
                                            axis=1)
            keep = top_scores > self.min_score_threshold
            out_scores = jnp.where(keep, top_scores, -1.0)
            out_classes = jnp.where(keep, top_classes, -1.0)
            out_boxes = jnp.where(keep[..., None], top_boxes, 0.0)
            return out_scores, out_classes, out_boxes

        self._decode = _decode

    def __call__(self, preds, sizes):
        cls_preds, reg_preds = preds
        scores, classes, boxes = self._decode(
            jnp.asarray(cls_preds[-1]), jnp.asarray(reg_preds[-1]),
            jnp.asarray(sizes))
        return [np.asarray(scores), np.asarray(classes), np.asarray(boxes)]


__all__.append("DETRDecoder")
