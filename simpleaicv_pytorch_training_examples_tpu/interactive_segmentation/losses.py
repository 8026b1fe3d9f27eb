"""SAM losses.

Parity with /root/reference/SimpleAICV/interactive_segmentation/
losses.py:11-200 (SAMLoss): per decoder iteration, sigmoid focal
(weight 20) + dice (weight 1) per predicted mask vs the gt mask, best-mask
selection by combined focal+dice when multimask, MSE between predicted IoU
and the actual IoU of the thresholded mask (all masks supervised when
supervise_all_iou).
"""

import jax
import jax.numpy as jnp

__all__ = ["SAMLoss", "SAMMultiLevelLoss"]

_EPS = 1e-4


class SAMLoss:

    def __init__(self, alpha=0.25, gamma=2, focal_loss_weight=20,
                 dice_loss_weight=1, iou_predict_loss_weight=1,
                 supervise_all_iou=True, mask_threshold=0.0):
        self.alpha = alpha
        self.gamma = gamma
        self.focal_loss_weight = focal_loss_weight
        self.dice_loss_weight = dice_loss_weight
        self.iou_predict_loss_weight = iou_predict_loss_weight
        self.supervise_all_iou = supervise_all_iou
        self.mask_threshold = mask_threshold

    def _per_mask_losses(self, mask_logits, iou_preds, targets):
        """mask_logits [B,M,H,W]; iou_preds [B,M]; targets [B,1,H,W]."""
        t = jnp.broadcast_to(targets, mask_logits.shape).astype(jnp.float32)
        p = jnp.clip(jax.nn.sigmoid(mask_logits.astype(jnp.float32)), _EPS,
                     1.0 - _EPS)
        # focal (per-pixel mean per mask)
        alpha_f = jnp.where(t == 1.0, self.alpha, 1.0 - self.alpha)
        pt = jnp.where(t == 1.0, p, 1.0 - p)
        bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
        focal = (alpha_f * (1.0 - pt)**self.gamma * bce).mean(axis=(2, 3))
        # dice
        inter = (p * t).sum(axis=(2, 3))
        dice = 1.0 - (2.0 * inter + _EPS) / (
            p.sum(axis=(2, 3)) + t.sum(axis=(2, 3)) + _EPS)
        # actual iou of the thresholded mask
        bin_p = (mask_logits > self.mask_threshold).astype(jnp.float32)
        bi = (bin_p * t).sum(axis=(2, 3))
        bu = jnp.clip(bin_p.sum(axis=(2, 3)) + t.sum(axis=(2, 3)) - bi,
                      _EPS, None)
        actual_iou = bi / bu
        iou_mse = (iou_preds.astype(jnp.float32) - actual_iou)**2
        return focal, dice, iou_mse

    def __call__(self, all_iter_preds, targets):
        """all_iter_preds: (list of mask_logits [B,M,H,W],
        list of iou_preds [B,M]); targets [B,1,H,W]."""
        all_masks, all_ious = all_iter_preds
        n_iter = len(all_masks)
        focal_total, dice_total, iou_total = 0.0, 0.0, 0.0
        for mask_logits, iou_preds in zip(all_masks, all_ious):
            focal, dice, iou_mse = self._per_mask_losses(mask_logits,
                                                         iou_preds, targets)
            if focal.shape[1] > 1:
                combine = focal * self.focal_loss_weight + \
                    dice * self.dice_loss_weight
                best = jnp.argmin(combine, axis=-1)
                bidx = jnp.arange(focal.shape[0])
                focal_sel = focal[bidx, best]
                dice_sel = dice[bidx, best]
                if self.supervise_all_iou:
                    iou_sel = iou_mse.mean(axis=-1)
                else:
                    iou_sel = iou_mse[bidx, best]
            else:
                focal_sel = focal[:, 0]
                dice_sel = dice[:, 0]
                iou_sel = iou_mse[:, 0]
            focal_total += focal_sel.mean()
            dice_total += dice_sel.mean()
            iou_total += iou_sel.mean()

        return {
            "focal_loss": self.focal_loss_weight * focal_total / n_iter,
            "dice_loss": self.dice_loss_weight * dice_total / n_iter,
            "iou_predict_loss":
                self.iou_predict_loss_weight * iou_total / n_iter,
        }


class SAMMultiLevelLoss(SAMLoss):
    """Supervise ALL mask levels against the target instead of selecting
    the best one (reference losses.py:201-300 SAMMultiLevelLoss: targets
    broadcast over the M multimask outputs, losses averaged over levels).
    Used by the multilevel SAM training recipes."""

    def __call__(self, all_iter_preds, targets):
        all_masks, all_ious = all_iter_preds
        n_iter = len(all_masks)
        focal_total, dice_total, iou_total = 0.0, 0.0, 0.0
        for mask_logits, iou_preds in zip(all_masks, all_ious):
            focal, dice, iou_mse = self._per_mask_losses(mask_logits,
                                                         iou_preds, targets)
            focal_total += focal.mean()
            dice_total += dice.mean()
            iou_total += iou_mse.mean()
        return {
            "focal_loss": self.focal_loss_weight * focal_total / n_iter,
            "dice_loss": self.dice_loss_weight * dice_total / n_iter,
            "iou_predict_loss":
                self.iou_predict_loss_weight * iou_total / n_iter,
        }
