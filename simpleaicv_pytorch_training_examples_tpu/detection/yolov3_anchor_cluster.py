"""YOLOv3-style anchor k-means clustering.

Parity with /root/reference/SimpleAICV/detection/yolov3_anchor_cluster.py:
IoU-distance k-means over dataset box (w, h) pairs.
"""

import numpy as np

__all__ = ["kmeans_anchors", "collect_dataset_wh"]


def _wh_iou(whs, centers):
    """IoU between boxes and centers assuming shared top-left corner."""
    inter = np.minimum(whs[:, None, 0], centers[None, :, 0]) * \
        np.minimum(whs[:, None, 1], centers[None, :, 1])
    area_w = whs[:, 0] * whs[:, 1]
    area_c = centers[:, 0] * centers[:, 1]
    return inter / np.clip(area_w[:, None] + area_c[None] - inter, 1e-10,
                           None)


def kmeans_anchors(whs, n_anchors=9, iterations=300, seed=0):
    """whs [N, 2] -> [n_anchors, 2] sorted by area, and the mean best IoU."""
    rs = np.random.RandomState(seed)
    centers = whs[rs.choice(len(whs), n_anchors, replace=False)].copy()
    assign = np.zeros(len(whs), np.int64)
    for _ in range(iterations):
        ious = _wh_iou(whs, centers)
        new_assign = np.argmax(ious, axis=1)
        if (new_assign == assign).all():
            break
        assign = new_assign
        for k in range(n_anchors):
            members = whs[assign == k]
            if len(members):
                centers[k] = np.median(members, axis=0)
    order = np.argsort(centers[:, 0] * centers[:, 1])
    centers = centers[order]
    mean_iou = float(_wh_iou(whs, centers).max(axis=1).mean())
    return centers, mean_iou


def collect_dataset_wh(dataset, resize=None):
    """Gather (w, h) of every gt box in a detection dataset."""
    whs = []
    for i in range(len(dataset)):
        annots = dataset.load_annots(i) if hasattr(dataset, "load_annots") \
            else dataset[i]["annots"]
        if annots.shape[0] == 0:
            continue
        wh = annots[:, 2:4] - annots[:, 0:2]
        whs.append(wh)
    return np.concatenate(whs, axis=0) if whs else np.zeros((0, 2))
