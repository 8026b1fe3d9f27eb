"""RetinaFace loss.

Parity with /root/reference/SimpleAICV/face_detection/losses.py:23-200
(RetinaFaceLoss): the RetinaNet max-IoU assignment (>=0.5 fg, <0.4 bg)
with square face anchors and a single sigmoid class, focal BCE + SmoothL1
on txtytwth or IoU-family loss (default CIoU) on decoded boxes.
"""

import jax
import jax.numpy as jnp

from ..detection.losses import IoUMethod, RetinaLoss, _focal_bce
from .models import RetinaFaceAnchors

__all__ = ["RetinaFaceLoss"]

_EPS = 1e-4


class RetinaFaceLoss:

    def __init__(self, anchor_sizes=((8, 16, 32), (32, 64, 128),
                                     (128, 256, 512)),
                 strides=(8, 16, 32), alpha=0.25, gamma=2, beta=1.0 / 9.0,
                 cls_loss_weight=1.0, box_loss_weight=1.0,
                 box_loss_type="CIoU"):
        assert box_loss_type in ("SmoothL1", "IoU", "GIoU", "DIoU", "CIoU",
                                 "EIoU")
        self.anchors = RetinaFaceAnchors(anchor_sizes, strides)
        self.alpha = alpha
        self.gamma = gamma
        self.beta = beta
        self.cls_loss_weight = cls_loss_weight
        self.box_loss_weight = box_loss_weight
        self.box_loss_type = box_loss_type
        self.iou_function = IoUMethod()

    def __call__(self, preds, annotations):
        cls_preds, reg_preds = preds
        feature_sizes = [[p.shape[2], p.shape[1]] for p in cls_preds]
        anchors = jnp.asarray(self.anchors.flat_anchors(feature_sizes))

        b = annotations.shape[0]
        cls_preds = jnp.concatenate(
            [p.reshape(b, -1, 1) for p in cls_preds],
            axis=1).astype(jnp.float32)
        reg_preds = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in reg_preds],
            axis=1).astype(jnp.float32)
        annotations = annotations.astype(jnp.float32)

        # reuse the RetinaNet assigner (single face class -> label 0 -> +1)
        helper = RetinaLoss.__new__(RetinaLoss)
        helper.box_loss_type = self.box_loss_type
        helper.iou_function = self.iou_function
        gt_boxes, gt_class = jax.vmap(
            lambda a: RetinaLoss._assign_one_image(helper, anchors, a)
        )(annotations)

        valid = (gt_class >= 0).astype(jnp.float32)
        positive = (gt_class > 0).astype(jnp.float32)
        positive_num = positive.sum()

        # single-class focal: gt one-hot is just the positive flag
        onehot = positive[..., None]
        cls_loss = _focal_bce(cls_preds, onehot, valid, positive_num,
                              self.alpha, self.gamma)

        if self.box_loss_type == "SmoothL1":
            x = jnp.abs(reg_preds - gt_boxes)
            l1 = jnp.where(x >= self.beta, x - 0.5 * self.beta,
                           0.5 * (x**2) / self.beta)
            reg_loss = (l1.sum(axis=-1) * positive).sum() / \
                jnp.clip(positive_num, 1.0, None)
        else:
            pred_boxes = RetinaLoss._snap_txtytwth_to_xyxy(reg_preds,
                                                           anchors[None])
            ious = self.iou_function(pred_boxes, gt_boxes,
                                     iou_type=self.box_loss_type)
            reg_loss = ((1.0 - ious) * positive).sum() / \
                jnp.clip(positive_num, 1.0, None)
        reg_loss = jnp.where(positive_num > 0, reg_loss, 0.0)

        return {"cls_loss": self.cls_loss_weight * cls_loss,
                "reg_loss": self.box_loss_weight * reg_loss}
