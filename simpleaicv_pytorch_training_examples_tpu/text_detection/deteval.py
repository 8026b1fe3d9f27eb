"""DetEval-style polygon matching metrics for text detection.

Parity with /root/reference/tools/text_scripts.py:1230-1637
(compute_text_detection_pr_per_batch, one_to_one_match_count,
one_to_many_match_count, many_to_one_match_count, compute_pred_gt_ious):
precision/recall/hmean with one-to-one, one-gt-to-many-preds and
many-gts-to-one-pred matching, a punish factor for the split/merge cases,
and '###' (ignore) ground truths excluded from both counts — predictions
matching only ignored gts are dropped from the precision denominator.
"""

import numpy as np

__all__ = ["compute_pred_gt_coverage", "deteval_match",
           "TextDetectionMetric"]


def compute_pred_gt_coverage(pred_polys, gt_polys, size):
    """Rasterized coverage ratios.

    Returns (pred_cov [P,G], gt_cov [P,G]) where
    pred_cov[i,j] = inter_area(i,j) / area(pred_i) and
    gt_cov[i,j] = inter_area(i,j) / area(gt_j)
    (reference compute_pred_gt_ious, text_scripts.py:1617-1637).
    """
    import cv2
    h, w = int(size[0]), int(size[1])
    n_p, n_g = len(pred_polys), len(gt_polys)
    if n_p == 0 or n_g == 0:
        return np.zeros((n_p, n_g)), np.zeros((n_p, n_g))
    pred_masks = np.zeros((n_p, h, w), np.uint8)
    gt_masks = np.zeros((n_g, h, w), np.uint8)
    for i, poly in enumerate(pred_polys):
        cv2.fillPoly(pred_masks[i],
                     [np.round(np.asarray(poly)).astype(np.int32)], 1)
    for j, poly in enumerate(gt_polys):
        cv2.fillPoly(gt_masks[j],
                     [np.round(np.asarray(poly)).astype(np.int32)], 1)
    p = pred_masks.reshape(n_p, -1).astype(np.float64)
    g = gt_masks.reshape(n_g, -1).astype(np.float64)
    inter = p @ g.T  # [P, G]
    p_area = np.clip(p.sum(axis=1), 1.0, None)[:, None]
    g_area = np.clip(g.sum(axis=1), 1.0, None)[None, :]
    return inter / p_area, inter / g_area


def deteval_match(pred_polys, gt_polys, gt_ignores, size,
                  precision_iou_threshold=0.5, recall_iou_threshold=0.5,
                  punish_factor=1.0, match_count_threshold=2):
    """One image's DetEval counts.

    Returns (pred_correct, gt_correct, pred_num, gt_num) where the *_num
    denominators already exclude ignored gts and the predictions consumed
    by them.
    """
    n_p, n_g = len(pred_polys), len(gt_polys)
    gt_ignores = np.asarray(gt_ignores, bool) if n_g else np.zeros(0, bool)
    pred_cov, gt_cov = compute_pred_gt_coverage(pred_polys, gt_polys, size)
    over = (pred_cov > precision_iou_threshold) & \
        (gt_cov > recall_iou_threshold)

    pred_flag = np.zeros(n_p, bool)
    gt_flag = np.zeros(n_g, bool)
    pred_correct = gt_correct = 0.0
    pred_ignored = 0

    # --- one-to-one: unique crossing in both row and column ---
    for i in range(n_p):
        for j in range(n_g):
            if pred_flag[i] or gt_flag[j] or not over[i, j]:
                continue
            if over[i, :].sum() == 1 and over[:, j].sum() == 1:
                pred_flag[i] = gt_flag[j] = True
                if gt_ignores[j]:
                    pred_ignored += 1
                else:
                    pred_correct += 1.0
                    gt_correct += 1.0

    # --- one gt split across many preds ---
    for j in range(n_g):
        if gt_flag[j]:
            continue
        cand = [i for i in range(n_p) if not pred_flag[i]
                and pred_cov[i, j] > precision_iou_threshold]
        if len(cand) >= match_count_threshold and \
                gt_cov[cand, j].sum() > recall_iou_threshold:
            gt_flag[j] = True
            for i in cand:
                pred_flag[i] = True
            if gt_ignores[j]:
                pred_ignored += len(cand)
            else:
                gt_correct += punish_factor
                pred_correct += punish_factor * len(cand)

    # --- many gts merged into one pred ---
    for i in range(n_p):
        if pred_flag[i]:
            continue
        cand = [j for j in range(n_g) if not gt_flag[j]
                and gt_cov[i, j] > recall_iou_threshold]
        if len(cand) >= match_count_threshold and \
                pred_cov[i, cand].sum() > precision_iou_threshold:
            pred_flag[i] = True
            for j in cand:
                gt_flag[j] = True
            non_ignored = [j for j in cand if not gt_ignores[j]]
            if not non_ignored:
                pred_ignored += 1
            else:
                pred_correct += punish_factor
                gt_correct += punish_factor * len(non_ignored)

    gt_num = float(n_g - gt_ignores.sum())
    pred_num = float(n_p - pred_ignored)
    return pred_correct, gt_correct, pred_num, gt_num


class TextDetectionMetric:
    """Accumulates DetEval counts over images; reports P/R/hmean (%)."""

    def __init__(self, precision_iou_threshold=0.5,
                 recall_iou_threshold=0.5, punish_factor=1.0,
                 match_count_threshold=2):
        self.kwargs = dict(
            precision_iou_threshold=precision_iou_threshold,
            recall_iou_threshold=recall_iou_threshold,
            punish_factor=punish_factor,
            match_count_threshold=match_count_threshold)
        self.reset()

    def reset(self):
        self.pred_correct = 0.0
        self.gt_correct = 0.0
        self.pred_num = 0.0
        self.gt_num = 0.0

    def update(self, pred_polys, gt_polys, gt_ignores, size):
        pc, gc, pn, gn = deteval_match(pred_polys, gt_polys, gt_ignores,
                                       size, **self.kwargs)
        self.pred_correct += pc
        self.gt_correct += gc
        self.pred_num += pn
        self.gt_num += gn

    def compute(self):
        precision = self.pred_correct / max(self.pred_num, 1e-8) * 100
        recall = self.gt_correct / max(self.gt_num, 1e-8) * 100
        hmean = 2 * precision * recall / max(precision + recall, 1e-8)
        return {"precision": precision, "recall": recall, "hmean": hmean}
