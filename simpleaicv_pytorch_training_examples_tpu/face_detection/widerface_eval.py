"""WIDERFace easy/medium/hard AP evaluator (pure numpy).

Parity with /root/reference/10.face_detection_training/widerface_evaluate/
eval_widerface.py: per-difficulty gt subsets, greedy IoU-0.5 matching of
score-ranked detections, AP over 1000 score thresholds with normalized
scores.
"""

import json

import numpy as np

__all__ = ["evaluate_widerface", "load_widerface_gt"]


def load_widerface_gt(json_path):
    """Load the resaved official per-difficulty ground truth (produced by
    tools/dataset_preprocessing/resave_widerface_gt.py from the 4 official
    .mat files — reference eval_widerface.py:63-78).

    Returns {image_stem: {"boxes": [N,4] xyxy float32, "easy"/"medium"/
    "hard": [N] bool keep masks}}. Faces outside a difficulty's keep list
    are ignored at that difficulty (matching them is neither hit nor FP).
    """
    with open(json_path) as f:
        raw = json.load(f)
    gt = {}
    for stem, entry in raw.items():
        boxes = np.asarray(entry["boxes"], np.float32).reshape(-1, 4)
        n = len(boxes)
        item = {"boxes": boxes}
        for lvl in ("easy", "medium", "hard"):
            mask = np.zeros(n, bool)
            idx = [i for i in entry.get(lvl, []) if 0 <= i < n]
            mask[idx] = True
            item[lvl] = mask
        gt[stem] = item
    return gt


def _image_eval(pred_boxes, pred_scores, gt_boxes, keep_mask,
                iou_threshold=0.5):
    """Returns (pred_recall [len(pred)], ignore-aware proposal flags)."""
    n_pred = len(pred_boxes)
    pred_recall = np.zeros(n_pred)
    proposal = np.ones(n_pred)
    if len(gt_boxes) == 0:
        return pred_recall, proposal
    matched = np.zeros(len(gt_boxes))
    recall_count = 0
    for i in range(n_pred):
        box = pred_boxes[i]
        ix1 = np.maximum(box[0], gt_boxes[:, 0])
        iy1 = np.maximum(box[1], gt_boxes[:, 1])
        ix2 = np.minimum(box[2], gt_boxes[:, 2])
        iy2 = np.minimum(box[3], gt_boxes[:, 3])
        iw = np.clip(ix2 - ix1, 0, None)
        ih = np.clip(iy2 - iy1, 0, None)
        inter = iw * ih
        area_b = (box[2] - box[0]) * (box[3] - box[1])
        area_g = (gt_boxes[:, 2] - gt_boxes[:, 0]) * \
            (gt_boxes[:, 3] - gt_boxes[:, 1])
        ious = inter / np.clip(area_b + area_g - inter, 1e-10, None)
        best = int(np.argmax(ious))
        if ious[best] >= iou_threshold:
            if not keep_mask[best]:
                proposal[i] = -1  # matched an ignored gt
            elif matched[best] == 0:
                matched[best] = 1
                recall_count += 1
        pred_recall[i] = recall_count
    return pred_recall, proposal


def evaluate_widerface(gts, dets, thresh_num=1000):
    """gts: list of dicts {boxes [N,4], easy/medium/hard [N] bool masks};
    dets: list of (boxes [M,4] xyxy, scores [M]). Returns (easy, medium,
    hard) AP."""
    # normalize scores globally
    all_scores = np.concatenate([d[1] for d in dets if len(d[1])]) \
        if any(len(d[1]) for d in dets) else np.array([0.0])
    smin, smax = all_scores.min(), all_scores.max()
    rng = max(smax - smin, 1e-8)

    aps = []
    for level in ("easy", "medium", "hard"):
        count_face = 0
        pr_curve = np.zeros((thresh_num, 2))
        for gt, (boxes, scores) in zip(gts, dets):
            keep = gt[level]
            count_face += int(keep.sum())
            if len(boxes) == 0:
                continue
            order = np.argsort(-scores)
            boxes_s = boxes[order]
            scores_s = (scores[order] - smin) / rng
            pred_recall, proposal = _image_eval(boxes_s, scores_s,
                                                gt["boxes"], keep)
            for t in range(thresh_num):
                thresh = 1 - (t + 1) / thresh_num
                above = np.where(scores_s >= thresh)[0]
                if len(above) == 0:
                    continue
                r_index = above[-1]
                valid = proposal[:r_index + 1]
                pr_curve[t, 0] += int((valid == 1).sum())
                pr_curve[t, 1] += pred_recall[r_index]
        precision = pr_curve[:, 1] / np.clip(pr_curve[:, 0], 1e-10, None)
        recall = pr_curve[:, 1] / max(count_face, 1e-10)
        # VOC-style all-points AP over the pr curve
        precision = np.clip(precision, 0, 1)
        mrec = np.concatenate([[0.0], recall, [1.0]])
        mpre = np.concatenate([[0.0], precision, [0.0]])
        for i in range(mpre.size - 1, 0, -1):
            mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        aps.append(float(np.sum((mrec[idx + 1] - mrec[idx]) *
                                mpre[idx + 1])))
    return tuple(aps)
