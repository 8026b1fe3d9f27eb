"""Pascal VOC mAP evaluator (pure numpy).

Parity with /root/reference/tools/scripts.py:503-739 (compute_voc_ap /
evaluate_voc_detection): per-class AP at configurable IoU thresholds with
the VOC2010+ all-points interpolation (use_07_metric=False default).
"""

import numpy as np

__all__ = ["compute_voc_ap", "evaluate_voc_detection"]


def compute_voc_ap(recall, precision, use_07_metric=False):
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = np.max(precision[recall >= t]) if np.any(recall >= t) \
                else 0.0
            ap += p / 11.0
        return ap
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def evaluate_voc_detection(gts, dets, num_classes=20,
                           iou_threshold=0.5, use_07_metric=False):
    """gts: per image list of [N,5] xyxy+class arrays; dets: per image
    list of (boxes [M,4], scores [M], classes [M]). Returns (mAP, per-class
    AP dict)."""
    aps = {}
    for cls in range(num_classes):
        # collect
        cls_gts = []
        n_pos = 0
        for g in gts:
            keep = g[:, 4] == cls if g.shape[0] else np.zeros(0, bool)
            boxes = g[keep][:, :4] if g.shape[0] else np.zeros((0, 4))
            cls_gts.append({"boxes": boxes,
                            "matched": np.zeros(len(boxes), bool)})
            n_pos += len(boxes)
        records = []
        for img_idx, (boxes, scores, classes) in enumerate(dets):
            keep = classes == cls
            for b, s in zip(boxes[keep], scores[keep]):
                records.append((s, img_idx, b))
        if n_pos == 0:
            continue
        records.sort(key=lambda r: -r[0])
        tp = np.zeros(len(records))
        fp = np.zeros(len(records))
        for i, (score, img_idx, box) in enumerate(records):
            g = cls_gts[img_idx]
            if len(g["boxes"]) == 0:
                fp[i] = 1
                continue
            gx = g["boxes"]
            ix1 = np.maximum(box[0], gx[:, 0])
            iy1 = np.maximum(box[1], gx[:, 1])
            ix2 = np.minimum(box[2], gx[:, 2])
            iy2 = np.minimum(box[3], gx[:, 3])
            iw = np.clip(ix2 - ix1, 0, None)
            ih = np.clip(iy2 - iy1, 0, None)
            inter = iw * ih
            area_b = (box[2] - box[0]) * (box[3] - box[1])
            area_g = (gx[:, 2] - gx[:, 0]) * (gx[:, 3] - gx[:, 1])
            ious = inter / np.clip(area_b + area_g - inter, 1e-10, None)
            best = int(np.argmax(ious))
            if ious[best] >= iou_threshold and not g["matched"][best]:
                tp[i] = 1
                g["matched"][best] = True
            else:
                fp[i] = 1
        tp_cum = np.cumsum(tp)
        fp_cum = np.cumsum(fp)
        recall = tp_cum / n_pos
        precision = tp_cum / np.clip(tp_cum + fp_cum, 1e-10, None)
        aps[cls] = compute_voc_ap(recall, precision, use_07_metric)
    mAP = float(np.mean(list(aps.values()))) if aps else 0.0
    return mAP, aps
