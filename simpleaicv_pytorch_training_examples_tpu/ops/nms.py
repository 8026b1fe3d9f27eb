"""Non-maximum suppression.

TPU-native design: the reference's greedy python NMS
(/root/reference/SimpleAICV/detection/decode.py:25-105) is a host-side
while-loop; on TPU we run a fixed-iteration greedy NMS entirely on device —
`max_output` iterations of (argmax over scores, suppress-by-IoU), which is
exactly greedy NMS because boxes are selected in score order. The python
variant is kept for host fallback / bit-parity tests.

`diou` mode subtracts the DIoU center-distance penalty before thresholding
(reference diou_python_nms).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_iou_one_to_many(box, boxes, diou: bool = False):
    tl = jnp.maximum(box[0:2], boxes[:, 0:2])
    br = jnp.minimum(box[2:4], boxes[:, 2:4])
    wh = jnp.clip(br - tl, 0.0, None)
    overlap = wh[:, 0] * wh[:, 1]
    area1 = jnp.clip((box[2] - box[0]) * (box[3] - box[1]), 0.0, None)
    wh2 = jnp.clip(boxes[:, 2:4] - boxes[:, 0:2], 0.0, None)
    area2 = wh2[:, 0] * wh2[:, 1]
    union = jnp.clip(area1 + area2 - overlap, 1e-4, None)
    ious = overlap / union
    if diou:
        etl = jnp.minimum(box[0:2], boxes[:, 0:2])
        ebr = jnp.maximum(box[2:4], boxes[:, 2:4])
        c2 = jnp.clip(jnp.sum((ebr - etl)**2, axis=1), 1e-4, None)
        ctr1 = (box[0:2] + box[2:4]) / 2
        ctr2 = (boxes[:, 0:2] + boxes[:, 2:4]) / 2
        p2 = jnp.sum((ctr1 - ctr2)**2, axis=1)
        ious = ious - p2 / c2
    return ious


def device_nms(boxes, scores, iou_threshold: float, max_output: int,
               diou: bool = False):
    """Greedy NMS for one image on device.

    boxes [N, 4] xyxy, scores [N] (invalid candidates must carry -inf).
    Returns (out_scores [max_output], out_indices [max_output]); slots past
    the kept detections have score -1 and index -1.
    """
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)

    def body(carry, _):
        work_scores = carry
        idx = jnp.argmax(work_scores)
        best = work_scores[idx]
        keep = best > -jnp.inf
        box = boxes[idx]
        ious = _pairwise_iou_one_to_many(box, boxes, diou)
        suppress = ious >= iou_threshold
        new_scores = jnp.where(suppress, neg_inf, work_scores)
        new_scores = new_scores.at[idx].set(neg_inf)
        out_score = jnp.where(keep, best, -1.0)
        out_idx = jnp.where(keep, idx, -1)
        return new_scores, (out_score, out_idx)

    _, (out_scores, out_idx) = jax.lax.scan(body, scores, None,
                                            length=max_output)
    return out_scores, out_idx


def python_nms(sorted_bboxes: np.ndarray, sorted_scores: np.ndarray,
               nms_threshold: float, diou: bool = False) -> np.ndarray:
    """Host greedy NMS over score-sorted boxes (reference parity)."""
    wh = sorted_bboxes[:, 2:4] - sorted_bboxes[:, 0:2]
    areas = np.maximum(wh[:, 0] * wh[:, 1], 0)
    indexes = np.arange(sorted_scores.shape[0], dtype=np.int32)
    keep = []
    while indexes.shape[0] > 0:
        keep_idx = indexes[0]
        keep.append(keep_idx)
        indexes = indexes[1:]
        if len(indexes) == 0:
            break
        tl = np.maximum(sorted_bboxes[keep_idx, 0:2],
                        sorted_bboxes[indexes, 0:2])
        br = np.minimum(sorted_bboxes[keep_idx, 2:4],
                        sorted_bboxes[indexes, 2:4])
        owh = np.maximum(br - tl, 0)
        overlap = owh[:, 0] * owh[:, 1]
        union = np.maximum(areas[keep_idx] + areas[indexes] - overlap, 1e-4)
        ious = overlap / union
        if diou:
            etl = np.minimum(sorted_bboxes[keep_idx, 0:2],
                             sorted_bboxes[indexes, 0:2])
            ebr = np.maximum(sorted_bboxes[keep_idx, 2:4],
                             sorted_bboxes[indexes, 2:4])
            c2 = np.maximum(((ebr - etl)**2).sum(axis=1), 1e-4)
            ctr1 = (sorted_bboxes[keep_idx, 0:2] +
                    sorted_bboxes[keep_idx, 2:4]) / 2
            ctr2 = (sorted_bboxes[indexes, 0:2] +
                    sorted_bboxes[indexes, 2:4]) / 2
            p2 = ((ctr1 - ctr2)**2).sum(axis=1)
            ious = ious - p2 / c2
        indexes = indexes[ious < nms_threshold]
    return np.asarray(keep, dtype=np.int64)
