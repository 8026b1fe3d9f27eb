"""Detection losses in pure jnp, fully vectorized (no boolean indexing).

Parity with /root/reference/SimpleAICV/detection/losses.py:
- IoUMethod (:25): IoU / GIoU / DIoU / CIoU / EIoU, xyxy or xywh.
- RetinaLoss (:123): max-IoU anchor assignment (<0.4 bg, >=0.5 fg, else
  ignore), alpha-focal BCE normalized by positive count, SmoothL1 (beta=1/9)
  on txtytwth targets or IoU-family loss on decoded boxes.
- FCOSLoss (:434): per-level scale-range (mi) assignment with center
  sampling (radius 1.5 strides), min-area tie-break, centerness-weighted
  GIoU, centerness BCE.

TPU-first shape discipline: annotations come in as a fixed-size padded
tensor [B, max_annots, 5] with class -1 padding (the reference pads to the
batch max; fixed padding keeps shapes static under jit). All filtering is
by mask multiplication; `positive_num == 0` short-circuits become
`jnp.where` guards, so the whole loss is one XLA program, vmapped over the
batch.
"""

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from .models.anchor import FCOSPositions, RetinaAnchors

__all__ = ["IoUMethod", "RetinaLoss", "FCOSLoss"]

_EPS = 1e-4
_INF = 1e8


class IoUMethod:
    """Pairwise IoU family over broadcastable [..., 4] boxes."""

    def __call__(self, boxes1, boxes2, iou_type="IoU", box_type="xyxy"):
        assert iou_type in ("IoU", "GIoU", "DIoU", "CIoU", "EIoU")
        if box_type == "xywh":
            boxes1 = jnp.concatenate([boxes1[..., :2] - boxes1[..., 2:] / 2,
                                      boxes1[..., :2] + boxes1[..., 2:] / 2],
                                     axis=-1)
            boxes2 = jnp.concatenate([boxes2[..., :2] - boxes2[..., 2:] / 2,
                                      boxes2[..., :2] + boxes2[..., 2:] / 2],
                                     axis=-1)
        overlap_min = jnp.maximum(boxes1[..., 0:2], boxes2[..., 0:2])
        overlap_max = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
        overlap_wh = jnp.clip(overlap_max - overlap_min, 0.0, None)
        overlap = overlap_wh[..., 0] * overlap_wh[..., 1]

        wh1 = jnp.clip(boxes1[..., 2:4] - boxes1[..., 0:2], 0.0, None)
        wh2 = jnp.clip(boxes2[..., 2:4] - boxes2[..., 0:2], 0.0, None)
        area1 = wh1[..., 0] * wh1[..., 1]
        area2 = wh2[..., 0] * wh2[..., 1]
        union = area1 + area2 - overlap
        ious = overlap / jnp.clip(union, 1e-4, None)

        if iou_type == "IoU":
            return ious

        enclose_min = jnp.minimum(boxes1[..., 0:2], boxes2[..., 0:2])
        enclose_max = jnp.maximum(boxes1[..., 2:4], boxes2[..., 2:4])
        enclose_wh = jnp.clip(enclose_max - enclose_min, 0.0, None)

        if iou_type == "GIoU":
            enclose_area = jnp.clip(enclose_wh[..., 0] * enclose_wh[..., 1],
                                    1e-4, None)
            return ious - (enclose_area - union) / enclose_area

        # center distance based variants
        c1 = (boxes1[..., 0:2] + boxes1[..., 2:4]) / 2
        c2 = (boxes2[..., 0:2] + boxes2[..., 2:4]) / 2
        center_dist = jnp.sum((c1 - c2)**2, axis=-1)
        enclose_diag = jnp.clip(jnp.sum(enclose_wh**2, axis=-1), 1e-4, None)

        if iou_type == "DIoU":
            return ious - center_dist / enclose_diag

        if iou_type == "CIoU":
            v = (4.0 / math.pi**2) * (
                jnp.arctan(wh2[..., 0] / jnp.clip(wh2[..., 1], 1e-4, None)) -
                jnp.arctan(wh1[..., 0] / jnp.clip(wh1[..., 1], 1e-4, None))
            )**2
            alpha = jax.lax.stop_gradient(
                v / jnp.clip(1.0 - ious + v, 1e-4, None))
            return ious - center_dist / enclose_diag - alpha * v

        # EIoU
        dist_w = (wh1[..., 0] - wh2[..., 0])**2
        dist_h = (wh1[..., 1] - wh2[..., 1])**2
        cw2 = jnp.clip(enclose_wh[..., 0]**2, 1e-4, None)
        ch2 = jnp.clip(enclose_wh[..., 1]**2, 1e-4, None)
        return ious - center_dist / enclose_diag - dist_w / cw2 - \
            dist_h / ch2


def _focal_bce(cls_preds, gt_onehot, valid_mask, positive_num, alpha, gamma):
    """Alpha-balanced focal BCE summed over valid anchors / positives."""
    cls_preds = jnp.clip(cls_preds, _EPS, 1.0 - _EPS)
    alpha_factor = jnp.where(gt_onehot == 1.0, alpha, 1.0 - alpha)
    pt = jnp.where(gt_onehot == 1.0, cls_preds, 1.0 - cls_preds)
    focal = alpha_factor * (1.0 - pt)**gamma
    bce = -(gt_onehot * jnp.log(cls_preds) +
            (1.0 - gt_onehot) * jnp.log(1.0 - cls_preds))
    loss = (focal * bce).sum(axis=-1) * valid_mask
    total = loss.sum() / jnp.clip(positive_num, 1.0, None)
    return jnp.where(positive_num > 0, total, 0.0)


class RetinaLoss:

    def __init__(self,
                 areas=((32, 32), (64, 64), (128, 128), (256, 256),
                        (512, 512)),
                 ratios=(0.5, 1, 2),
                 scales=(2**0, 2**(1.0 / 3.0), 2**(2.0 / 3.0)),
                 strides=(8, 16, 32, 64, 128),
                 alpha=0.25,
                 gamma=2,
                 beta=1.0 / 9.0,
                 cls_loss_weight=1.0,
                 box_loss_weight=1.0,
                 box_loss_type="SmoothL1"):
        assert box_loss_type in ("SmoothL1", "IoU", "GIoU", "DIoU", "CIoU",
                                 "EIoU")
        self.anchors = RetinaAnchors(areas, ratios, scales, strides)
        self.alpha = alpha
        self.gamma = gamma
        self.beta = beta
        self.cls_loss_weight = cls_loss_weight
        self.box_loss_weight = box_loss_weight
        self.box_loss_type = box_loss_type
        self.iou_function = IoUMethod()

    def __call__(self, preds, annotations):
        """preds: [cls_heads, reg_heads] per-level lists; annotations:
        [B, max_annots, 5] (xyxy, class; padded with -1)."""
        cls_preds, reg_preds = preds
        feature_sizes = [[p.shape[2], p.shape[1]] for p in cls_preds]
        anchors = jnp.asarray(self.anchors.flat_anchors(feature_sizes))

        b = annotations.shape[0]
        cls_preds = jnp.concatenate(
            [p.reshape(b, -1, p.shape[-1]) for p in cls_preds], axis=1)
        reg_preds = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in reg_preds], axis=1)
        cls_preds = cls_preds.astype(jnp.float32)
        reg_preds = reg_preds.astype(jnp.float32)
        annotations = annotations.astype(jnp.float32)

        gt_boxes, gt_class = jax.vmap(self._assign_one_image,
                                      in_axes=(None, 0))(anchors,
                                                         annotations)

        valid = (gt_class >= 0).astype(jnp.float32)
        positive = (gt_class > 0).astype(jnp.float32)
        positive_num = positive.sum()

        num_classes = cls_preds.shape[-1]
        onehot = jax.nn.one_hot(jnp.clip(gt_class, 0, None).astype(jnp.int32),
                                num_classes + 1, dtype=jnp.float32)[..., 1:]
        cls_loss = _focal_bce(cls_preds, onehot, valid, positive_num,
                              self.alpha, self.gamma)

        if self.box_loss_type == "SmoothL1":
            x = jnp.abs(reg_preds - gt_boxes)
            l1 = jnp.where(x >= self.beta, x - 0.5 * self.beta,
                           0.5 * (x**2) / self.beta)
            reg_loss = (l1.sum(axis=-1) * positive).sum() / \
                jnp.clip(positive_num, 1.0, None)
        else:
            pred_boxes = self._snap_txtytwth_to_xyxy(reg_preds,
                                                     anchors[None])
            ious = self.iou_function(pred_boxes, gt_boxes,
                                     iou_type=self.box_loss_type)
            reg_loss = ((1.0 - ious) * positive).sum() / \
                jnp.clip(positive_num, 1.0, None)
        reg_loss = jnp.where(positive_num > 0, reg_loss, 0.0)

        return {"cls_loss": self.cls_loss_weight * cls_loss,
                "reg_loss": self.box_loss_weight * reg_loss}

    def _assign_one_image(self, anchors, annots):
        """anchors [A,4], annots [G,5] -> (gt_targets [A,4], gt_class [A])."""
        gt_valid = annots[:, 4] >= 0  # [G]
        any_valid = jnp.any(gt_valid)
        ious = self.iou_function(anchors[:, None, :], annots[None, :, 0:4])
        ious = jnp.where(gt_valid[None, :], ious, -1.0)  # [A, G]
        overlap = ious.max(axis=1)
        indices = ious.argmax(axis=1)

        cls_of_best = annots[indices, 4]
        gt_class = jnp.full(anchors.shape[:1], -1.0)
        gt_class = jnp.where(overlap < 0.4, 0.0, gt_class)
        gt_class = jnp.where(overlap >= 0.5, cls_of_best + 1.0, gt_class)
        gt_class = jnp.where(any_valid, gt_class, -1.0)

        best_boxes = annots[indices, 0:4]
        if self.box_loss_type == "SmoothL1":
            best_boxes = self._snap_annotations_to_txtytwth(best_boxes,
                                                            anchors)
        return best_boxes, gt_class

    @staticmethod
    def _snap_annotations_to_txtytwth(gt_boxes, anchors):
        anchors_wh = anchors[..., 2:4] - anchors[..., 0:2]
        anchors_ctr = anchors[..., 0:2] + 0.5 * anchors_wh
        gt_wh = jnp.clip(gt_boxes[..., 2:4] - gt_boxes[..., 0:2], _EPS, None)
        gt_ctr = gt_boxes[..., 0:2] + 0.5 * gt_wh
        return jnp.concatenate([(gt_ctr - anchors_ctr) / anchors_wh,
                                jnp.log(gt_wh / anchors_wh)], axis=-1)

    @staticmethod
    def _snap_txtytwth_to_xyxy(snap_boxes, anchors):
        anchors_wh = anchors[..., 2:4] - anchors[..., 0:2]
        anchors_ctr = anchors[..., 0:2] + 0.5 * anchors_wh
        boxes_wh = jnp.exp(snap_boxes[..., 2:4]) * anchors_wh
        boxes_ctr = snap_boxes[..., 0:2] * anchors_wh + anchors_ctr
        return jnp.concatenate([boxes_ctr - 0.5 * boxes_wh,
                                boxes_ctr + 0.5 * boxes_wh], axis=-1)


class FCOSLoss:

    def __init__(self,
                 strides=(8, 16, 32, 64, 128),
                 mi=((-1, 64), (64, 128), (128, 256), (256, 512),
                     (512, 100000000)),
                 alpha=0.25,
                 gamma=2.0,
                 cls_loss_weight=1.0,
                 box_loss_weight=1.0,
                 center_ness_loss_weight=1.0,
                 box_loss_iou_type="GIoU",
                 center_sample_radius=1.5,
                 use_center_sample=True):
        assert box_loss_iou_type in ("IoU", "GIoU", "DIoU", "CIoU", "EIoU")
        self.positions = FCOSPositions(strides)
        self.strides = strides
        self.mi = mi
        self.alpha = alpha
        self.gamma = gamma
        self.cls_loss_weight = cls_loss_weight
        self.box_loss_weight = box_loss_weight
        self.center_ness_loss_weight = center_ness_loss_weight
        self.box_loss_iou_type = box_loss_iou_type
        self.center_sample_radius = center_sample_radius
        self.use_center_sample = use_center_sample
        self.iou_function = IoUMethod()

    def __call__(self, preds, annotations):
        cls_preds, reg_preds, center_preds = preds
        feature_sizes = [[p.shape[2], p.shape[1]] for p in cls_preds]
        positions = jnp.asarray(
            self.positions.flat_positions(feature_sizes))  # [P, 2]

        import numpy as np
        mi_np, stride_np = [], []
        for (lo, hi), s, size in zip(self.mi, self.strides, feature_sizes):
            n = int(size[0]) * int(size[1])
            mi_np.append(np.tile(np.array([[lo, hi]], np.float32), (n, 1)))
            stride_np.append(np.full((n,), s, np.float32))
        mi = jnp.asarray(np.concatenate(mi_np))  # [P, 2]
        stride = jnp.asarray(np.concatenate(stride_np))  # [P]

        b = annotations.shape[0]
        cls_preds = jnp.concatenate(
            [p.reshape(b, -1, p.shape[-1]) for p in cls_preds],
            axis=1).astype(jnp.float32)
        reg_preds = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in reg_preds],
            axis=1).astype(jnp.float32)
        center_preds = jnp.concatenate(
            [p.reshape(b, -1, 1) for p in center_preds],
            axis=1).astype(jnp.float32)
        annotations = annotations.astype(jnp.float32)

        ltrb, gt_class, centerness = jax.vmap(
            self._assign_one_image,
            in_axes=(None, None, None, 0))(positions, mi, stride,
                                           annotations)

        positive = (gt_class > 0).astype(jnp.float32)
        positive_num = positive.sum()
        valid = jnp.ones_like(positive)  # all fcos points contribute to cls

        num_classes = cls_preds.shape[-1]
        onehot = jax.nn.one_hot(gt_class.astype(jnp.int32), num_classes + 1,
                                dtype=jnp.float32)[..., 1:]
        cls_loss = _focal_bce(cls_preds, onehot, valid, positive_num,
                              self.alpha, self.gamma)

        # reg loss: decode pred ltrb (exp) and gt ltrb around positions
        pred_ltrb = jnp.exp(reg_preds)
        pos = positions[None]  # [1, P, 2]
        pred_boxes = jnp.concatenate([pos - pred_ltrb[..., 0:2],
                                      pos + pred_ltrb[..., 2:4]], axis=-1)
        gt_boxes = jnp.concatenate([pos - ltrb[..., 0:2],
                                    pos + ltrb[..., 2:4]], axis=-1)
        ious = self.iou_function(pred_boxes, gt_boxes,
                                 iou_type=self.box_loss_iou_type)
        reg_loss = ((1.0 - ious) * centerness * positive).sum() / \
            jnp.clip(positive_num, 1.0, None)
        reg_loss = jnp.where(positive_num > 0, reg_loss, 0.0)

        cp = jnp.clip(center_preds[..., 0], _EPS, 1.0 - _EPS)
        cnt_bce = -(centerness * jnp.log(cp) +
                    (1.0 - centerness) * jnp.log(1.0 - cp))
        cnt_loss = (cnt_bce * positive).sum() / \
            jnp.clip(positive_num, 1.0, None)
        cnt_loss = jnp.where(positive_num > 0, cnt_loss, 0.0)

        return {"cls_loss": self.cls_loss_weight * cls_loss,
                "reg_loss": self.box_loss_weight * reg_loss,
                "center_ness_loss": self.center_ness_loss_weight * cnt_loss}

    def _assign_one_image(self, positions, mi, stride, annots):
        """positions [P,2], mi [P,2], stride [P], annots [G,5] ->
        (ltrb [P,4], gt_class [P], centerness [P])."""
        gt_valid = annots[:, 4] >= 0  # [G]
        gt_boxes = annots[:, 0:4]  # [G, 4]

        pos = positions[:, None, :]  # [P, 1, 2]
        l = pos[..., 0] - gt_boxes[None, :, 0]
        t = pos[..., 1] - gt_boxes[None, :, 1]
        r = gt_boxes[None, :, 2] - pos[..., 0]
        b_ = gt_boxes[None, :, 3] - pos[..., 1]
        ltrb = jnp.stack([l, t, r, b_], axis=-1)  # [P, G, 4]

        inside = ltrb.min(axis=-1) > 0  # [P, G]
        max_ltrb = ltrb.max(axis=-1)
        in_range = (max_ltrb > mi[:, None, 0]) & (max_ltrb < mi[:, None, 1])

        valid = inside & in_range & gt_valid[None, :]
        if self.use_center_sample:
            centers = (gt_boxes[None, :, 0:2] + gt_boxes[None, :, 2:4]) / 2
            dist = jnp.sqrt(jnp.sum((pos - centers)**2, axis=-1))
            valid &= dist < (stride[:, None] * self.center_sample_radius)

        gt_wh = gt_boxes[:, 2:4] - gt_boxes[:, 0:2]
        gt_area = gt_wh[:, 0] * gt_wh[:, 1]  # [G]
        area = jnp.where(valid, gt_area[None, :], _INF)  # [P, G]
        min_index = area.argmin(axis=1)  # [P]
        is_positive = valid.any(axis=1)

        chosen_ltrb = jnp.take_along_axis(
            ltrb, min_index[:, None, None].repeat(4, -1), axis=1)[:, 0]
        chosen_class = annots[min_index, 4]

        gt_class = jnp.where(is_positive, chosen_class + 1.0, 0.0)
        ltrb_t = jnp.where(is_positive[:, None], chosen_ltrb, 0.0)

        l_, t_ = ltrb_t[:, 0], ltrb_t[:, 1]
        r_, bb = ltrb_t[:, 2], ltrb_t[:, 3]
        cness = jnp.sqrt(
            (jnp.minimum(l_, r_) / jnp.clip(jnp.maximum(l_, r_), _EPS, None))
            * (jnp.minimum(t_, bb) /
               jnp.clip(jnp.maximum(t_, bb), _EPS, None)))
        cness = jnp.where(is_positive, cness, 0.0)
        return ltrb_t, gt_class, cness


def _hungarian_match_host(cost, gt_valid):
    """Host-side per-image LSA. cost [B,Q,M] fp32, gt_valid [B,M] bool ->
    matched gt index per query [B,Q] int32 (-1 = unmatched)."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost, np.float64)
    gt_valid = np.asarray(gt_valid, bool)
    b, q, m = cost.shape
    out = np.full((b, q), -1, np.int32)
    for i in range(b):
        valid_idx = np.where(gt_valid[i])[0]
        if valid_idx.size == 0:
            continue
        c = cost[i][:, valid_idx]
        c = np.nan_to_num(c, nan=1e5, posinf=1e5, neginf=-1e5)
        rows, cols = linear_sum_assignment(c)
        out[i, rows] = valid_idx[cols]
    return out


class DETRLoss:
    """DETR Hungarian-matched set loss with deep supervision.

    Parity with /root/reference/SimpleAICV/detection/losses.py:843-1090:
    match on the last decoder layer (cls softmax-prob cost + L1 + GIoU),
    then per-layer weighted CE (no-object weight 0.1), L1, GIoU losses.

    The matching itself is combinatorial and runs host-side via
    jax.pure_callback (SURVEY.md §7 "Hungarian matching stays host-side");
    everything else is on device with static shapes (annotations are the
    fixed-size cxcywh-normalized 'scaled_annots' [B,M,5], -1 padded).
    """

    def __init__(self, cls_match_cost=1.0, box_match_cost=5.0,
                 giou_match_cost=2.0, cls_loss_weight=1.0,
                 box_l1_loss_weight=5.0, iou_loss_weight=2.0,
                 no_object_cls_weight=0.1, num_classes=80):
        self.cls_match_cost = cls_match_cost
        self.box_match_cost = box_match_cost
        self.giou_match_cost = giou_match_cost
        self.cls_loss_weight = cls_loss_weight
        self.box_l1_loss_weight = box_l1_loss_weight
        self.iou_loss_weight = iou_loss_weight
        self.no_object_cls_weight = no_object_cls_weight
        self.num_classes = num_classes

    @staticmethod
    def _cxcywh_to_xyxy(boxes):
        return jnp.concatenate([boxes[..., :2] - 0.5 * boxes[..., 2:4],
                                boxes[..., :2] + 0.5 * boxes[..., 2:4]],
                               axis=-1)

    @staticmethod
    def _pairwise_giou(boxes1, boxes2):
        """[..., N, 4] x [..., M, 4] xyxy -> [..., N, M] giou."""
        b1 = boxes1[..., :, None, :]
        b2 = boxes2[..., None, :, :]
        lt = jnp.maximum(b1[..., :2], b2[..., :2])
        rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
        wh = jnp.clip(rb - lt, 0.0, None)
        inter = wh[..., 0] * wh[..., 1]
        a1 = jnp.clip((b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1]),
                      0.0, None)
        a2 = jnp.clip((b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1]),
                      0.0, None)
        union = jnp.clip(a1 + a2 - inter, 1e-4, None)
        iou = inter / union
        elt = jnp.minimum(b1[..., :2], b2[..., :2])
        erb = jnp.maximum(b1[..., 2:], b2[..., 2:])
        ewh = jnp.clip(erb - elt, 0.0, None)
        earea = jnp.clip(ewh[..., 0] * ewh[..., 1], 1e-4, None)
        return iou - (earea - union) / earea

    def __call__(self, preds, annotations):
        cls_preds, reg_preds = preds  # [L,B,Q,C+1], [L,B,Q,4]
        cls_preds = cls_preds.astype(jnp.float32)
        reg_preds = jnp.clip(reg_preds.astype(jnp.float32), _EPS, 1.0 - _EPS)
        annotations = annotations.astype(jnp.float32)

        gt_boxes = annotations[..., 0:4]  # cxcywh normalized
        gt_class = annotations[..., 4]
        gt_valid = gt_class >= 0  # [B, M]
        safe_class = jnp.clip(gt_class, 0, None).astype(jnp.int32)

        # --- matching on last layer (no gradient) ---
        last_cls = jax.lax.stop_gradient(cls_preds[-1])
        last_reg = jax.lax.stop_gradient(reg_preds[-1])
        probs = jnp.clip(jax.nn.softmax(last_cls, axis=-1), _EPS, 1.0 - _EPS)
        cls_cost = -jnp.take_along_axis(
            jnp.broadcast_to(probs[:, :, None, :],
                             (*probs.shape[:2], gt_class.shape[1],
                              probs.shape[-1])),
            safe_class[:, None, :, None], axis=-1)[..., 0]  # [B,Q,M]
        box_cost = jnp.abs(last_reg[:, :, None, :] -
                           gt_boxes[:, None, :, :]).sum(-1)
        giou_cost = -self._pairwise_giou(self._cxcywh_to_xyxy(last_reg),
                                         self._cxcywh_to_xyxy(gt_boxes))
        total_cost = (self.cls_match_cost * cls_cost +
                      self.box_match_cost * box_cost +
                      self.giou_match_cost * giou_cost)

        b, q = last_cls.shape[0], last_cls.shape[1]
        matched = jax.pure_callback(
            _hungarian_match_host,
            jax.ShapeDtypeStruct((b, q), jnp.int32),
            total_cost, gt_valid, vmap_method="sequential")
        is_matched = matched >= 0
        safe_matched = jnp.clip(matched, 0, None)
        n_matched = jnp.clip(gt_valid.sum().astype(jnp.float32), 1.0, None)

        # per-query targets
        tgt_class = jnp.where(
            is_matched,
            jnp.take_along_axis(safe_class, safe_matched, axis=1),
            self.num_classes)  # no-object index
        tgt_boxes = jnp.take_along_axis(
            gt_boxes, safe_matched[..., None], axis=1)  # [B,Q,4]

        empty_weight = jnp.ones(self.num_classes + 1).at[-1].set(
            self.no_object_cls_weight)
        class_weights = empty_weight[tgt_class]  # [B,Q]

        loss_dict = {}
        n_layers = cls_preds.shape[0]
        for idx in range(n_layers):
            logp = jax.nn.log_softmax(cls_preds[idx], axis=-1)
            nll = -jnp.take_along_axis(logp, tgt_class[..., None],
                                       axis=-1)[..., 0]
            # weighted mean (torch F.cross_entropy(weight=...)) semantics
            cls_loss = (nll * class_weights).sum() / class_weights.sum()

            diff = jnp.abs(reg_preds[idx] - tgt_boxes).sum(-1)
            l1_loss = (diff * is_matched).sum() / n_matched

            pred_xy = self._cxcywh_to_xyxy(reg_preds[idx])
            tgt_xy = self._cxcywh_to_xyxy(tgt_boxes)
            giou = self._pairwise_giou(
                pred_xy.reshape(-1, 1, 4), tgt_xy.reshape(-1, 1, 4))[:, 0, 0]
            giou = giou.reshape(b, q)
            giou_loss = ((1.0 - giou) * is_matched).sum() / n_matched

            loss_dict[f"layer_{idx}_cls_loss"] = \
                self.cls_loss_weight * cls_loss
            loss_dict[f"layer_{idx}_box_l1_loss"] = \
                self.box_l1_loss_weight * l1_loss
            loss_dict[f"layer_{idx}_box_iou_loss"] = \
                self.iou_loss_weight * giou_loss
        return loss_dict


__all__.append("DETRLoss")
