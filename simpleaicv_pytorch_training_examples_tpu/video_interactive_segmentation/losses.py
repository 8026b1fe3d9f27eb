"""SAM2 video losses.

Parity with /root/reference/SimpleAICV/video_interactive_segmentation/
losses.py:11-240 (SAM2Loss): per-frame sigmoid focal (weight 20) + dice +
IoU-MSE with best-mask selection, plus occlusion (object-score) BCE against
whether the gt mask is non-empty on that frame, averaged over frames.
"""

import jax
import jax.numpy as jnp

from ..interactive_segmentation.losses import SAMLoss

__all__ = ["SAM2Loss", "SAM2MultiLevelLoss"]

_EPS = 1e-4


class SAM2Loss:

    def __init__(self, alpha=0.25, gamma=2, focal_loss_weight=20,
                 dice_loss_weight=1, iou_predict_loss_weight=1,
                 object_score_loss_weight=1, supervise_all_iou=True,
                 mask_threshold=0.0):
        self.sam_loss = SAMLoss(alpha, gamma, focal_loss_weight,
                                dice_loss_weight, iou_predict_loss_weight,
                                supervise_all_iou, mask_threshold)
        self.object_score_loss_weight = object_score_loss_weight

    def __call__(self, preds, targets):
        """preds: (masks [B,T,M,H,W], ious [B,T,M], obj_logits [B,T,1]);
        targets: [B,T,H,W] per-frame gt masks."""
        masks, ious, obj_logits = preds
        t_frames = masks.shape[1]
        focal_total, dice_total, iou_total, obj_total = 0.0, 0.0, 0.0, 0.0
        for t in range(t_frames):
            d = self.sam_loss(([masks[:, t]], [ious[:, t]]),
                              targets[:, t][:, None])
            focal_total += d["focal_loss"]
            dice_total += d["dice_loss"]
            iou_total += d["iou_predict_loss"]

            obj_gt = (targets[:, t].sum(axis=(1, 2)) > 0).astype(
                jnp.float32)
            p = jnp.clip(jax.nn.sigmoid(
                obj_logits[:, t, 0].astype(jnp.float32)), _EPS, 1.0 - _EPS)
            obj_total += -(obj_gt * jnp.log(p) +
                           (1 - obj_gt) * jnp.log(1 - p)).mean()

        return {
            "focal_loss": focal_total / t_frames,
            "dice_loss": dice_total / t_frames,
            "iou_predict_loss": iou_total / t_frames,
            "object_score_loss":
                self.object_score_loss_weight * obj_total / t_frames,
        }


class SAM2MultiLevelLoss(SAM2Loss):
    """Per-frame SAM2 loss supervising ALL mask levels (reference
    losses.py:243+ SAM2MultiLevelLoss): swaps the best-mask selection for
    level-averaged supervision, keeping the occlusion CE term."""

    def __init__(self, alpha=0.25, gamma=2, focal_loss_weight=20,
                 dice_loss_weight=1, iou_predict_loss_weight=1,
                 object_score_loss_weight=1, mask_threshold=0.0):
        from ..interactive_segmentation.losses import SAMMultiLevelLoss
        super().__init__(alpha, gamma, focal_loss_weight, dice_loss_weight,
                         iou_predict_loss_weight, object_score_loss_weight,
                         mask_threshold=mask_threshold)
        self.sam_loss = SAMMultiLevelLoss(
            alpha, gamma, focal_loss_weight, dice_loss_weight,
            iou_predict_loss_weight, mask_threshold=mask_threshold)
