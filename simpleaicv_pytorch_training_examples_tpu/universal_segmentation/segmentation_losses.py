"""Universal segmentation losses (Mask2Former-style Hungarian set loss).

Parity with /root/reference/SimpleAICV/universal_segmentation/
{segmentation_losses,mask2former_losses}.py: per-image Hungarian matching
of queries to gt masks with point-sampled sigmoid-CE + dice + class costs
(scipy LSA via pure_callback, like the DETR loss), then weighted CE on
classes (no-object weight 0.1) and point-sampled BCE + dice on matched
masks.

TPU re-design: the reference's uncertainty-based adaptive point sampling
(mask2former_losses.py:206) becomes a fixed `num_points` uniform random
sampling inside the jitted step — static shapes, same estimator family; gt
arrives as fixed [B, M, H', W'] padded mask stacks + [B, M] class labels
(-1 padding) at the model's mask resolution.
"""

import jax
import jax.numpy as jnp

from ..detection.losses import _hungarian_match_host

__all__ = ["UniversalSegmentationLoss", "Mask2FormerLoss"]

_EPS = 1e-6


def _sample_points(masks, points_xy):
    """masks [..., H, W]; points_xy [P, 2] in [0,1] -> [..., P] bilinear."""
    h, w = masks.shape[-2], masks.shape[-1]
    ys = points_xy[:, 1] * (h - 1)
    xs = points_xy[:, 0] * (w - 1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = ys - y0
    wx = xs - x0
    v00 = masks[..., y0, x0]
    v01 = masks[..., y0, x1]
    v10 = masks[..., y1, x0]
    v11 = masks[..., y1, x1]
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
            v10 * wy * (1 - wx) + v11 * wy * wx)


class UniversalSegmentationLoss:

    def __init__(self, num_classes=151, cls_match_cost=2.0,
                 mask_match_cost=5.0, dice_match_cost=5.0,
                 cls_loss_weight=2.0, mask_loss_weight=5.0,
                 dice_loss_weight=5.0, no_object_cls_weight=0.1,
                 num_points=4096):
        self.num_classes = num_classes
        self.cls_match_cost = cls_match_cost
        self.mask_match_cost = mask_match_cost
        self.dice_match_cost = dice_match_cost
        self.cls_loss_weight = cls_loss_weight
        self.mask_loss_weight = mask_loss_weight
        self.dice_loss_weight = dice_loss_weight
        self.no_object_cls_weight = no_object_cls_weight
        self.num_points = num_points

    def _select_points(self, rng, mask_preds):
        """Uniform point sampling (Mask2FormerLoss overrides this)."""
        return jax.random.uniform(rng, (self.num_points, 2))

    def __call__(self, preds, gt_classes, gt_masks, rng):
        """preds: (mask_preds [B,Q,H,W] logits, class_preds [B,Q,C]);
        gt_classes [B,M] (-1 pad); gt_masks [B,M,H,W] {0,1};
        rng: PRNGKey for point sampling."""
        mask_preds, class_preds = preds
        mask_preds = mask_preds.astype(jnp.float32)
        class_preds = class_preds.astype(jnp.float32)
        gt_masks = gt_masks.astype(jnp.float32)
        b, q = class_preds.shape[0], class_preds.shape[1]
        m = gt_classes.shape[1]
        gt_valid = gt_classes >= 0
        safe_class = jnp.clip(gt_classes, 0, None).astype(jnp.int32)

        points = self._select_points(rng, mask_preds)  # [P, 2]
        pred_pts = _sample_points(mask_preds, points)  # [B,Q,P]
        gt_pts = _sample_points(gt_masks, points)  # [B,M,P]

        # --- matching costs (no grad) ---
        pp = jax.lax.stop_gradient(pred_pts)
        probs = jax.nn.softmax(jax.lax.stop_gradient(class_preds), axis=-1)
        cls_cost = -jnp.take_along_axis(
            jnp.broadcast_to(probs[:, :, None, :], (b, q, m, probs.shape[-1])),
            safe_class[:, None, :, None], axis=-1)[..., 0]
        # point-sampled sigmoid BCE cost
        sp = jax.nn.log_sigmoid(pp)
        sn = jax.nn.log_sigmoid(-pp)
        # bce[b,q,m] = mean_p( -gt*logsig(pred) - (1-gt)*logsig(-pred) )
        mask_cost = (-jnp.einsum("bqp,bmp->bqm", sp, gt_pts) -
                     jnp.einsum("bqp,bmp->bqm", sn, 1.0 - gt_pts)) / \
            self.num_points
        # dice cost
        prob_pts = jax.nn.sigmoid(pp)
        inter = jnp.einsum("bqp,bmp->bqm", prob_pts, gt_pts)
        denom = prob_pts.sum(-1)[:, :, None] + gt_pts.sum(-1)[:, None, :]
        dice_cost = 1.0 - (2 * inter + 1.0) / (denom + 1.0)

        total_cost = (self.cls_match_cost * cls_cost +
                      self.mask_match_cost * mask_cost +
                      self.dice_match_cost * dice_cost)
        matched = jax.pure_callback(
            _hungarian_match_host,
            jax.ShapeDtypeStruct((b, q), jnp.int32), total_cost, gt_valid)
        is_matched = matched >= 0
        safe_matched = jnp.clip(matched, 0, None)
        n_matched = jnp.clip(gt_valid.sum().astype(jnp.float32), 1.0, None)

        # --- class loss (weighted CE; unmatched -> no-object class C-1...)
        # reference uses the last class index as no-object
        no_object = self.num_classes - 1
        tgt_class = jnp.where(
            is_matched, jnp.take_along_axis(safe_class, safe_matched,
                                            axis=1), no_object)
        weights = jnp.ones(self.num_classes).at[no_object].set(
            self.no_object_cls_weight)
        logp = jax.nn.log_softmax(class_preds, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt_class[..., None],
                                   axis=-1)[..., 0]
        w = weights[tgt_class]
        cls_loss = (nll * w).sum() / w.sum()

        # --- mask losses on matched pairs (with grads, point-sampled) ---
        tgt_pts = jnp.take_along_axis(
            gt_pts, safe_matched[..., None], axis=1)  # [B,Q,P]
        valid_f = is_matched.astype(jnp.float32)
        bce = -(tgt_pts * jax.nn.log_sigmoid(pred_pts) +
                (1.0 - tgt_pts) * jax.nn.log_sigmoid(-pred_pts))
        mask_loss = (bce.mean(-1) * valid_f).sum() / n_matched

        pred_prob = jax.nn.sigmoid(pred_pts)
        inter2 = (pred_prob * tgt_pts).sum(-1)
        dice = 1.0 - (2 * inter2 + 1.0) / (
            pred_prob.sum(-1) + tgt_pts.sum(-1) + 1.0)
        dice_loss = (dice * valid_f).sum() / n_matched

        return {
            "cls_loss": self.cls_loss_weight * cls_loss,
            "mask_loss": self.mask_loss_weight * mask_loss,
            "dice_loss": self.dice_loss_weight * dice_loss,
        }


class Mask2FormerLoss(UniversalSegmentationLoss):
    """Uncertainty-guided point sampling (reference mask2former_losses.py:
    16-260 Mask2FormerHungarianMatcher + Mask2FormerLoss with
    get_uncertain_point_coords_with_randomness): oversample uniform
    candidates, keep the `importance_sample_ratio` fraction with the
    highest prediction uncertainty (-|logit|, reduced over queries so the
    point set stays shared and shapes stay static), fill the rest with
    fresh uniform points."""

    def __init__(self, *args, oversample_ratio=3.0,
                 importance_sample_ratio=0.75, **kwargs):
        super().__init__(*args, **kwargs)
        self.oversample_ratio = oversample_ratio
        self.importance_sample_ratio = importance_sample_ratio

    def _select_points(self, rng, mask_preds):
        r1, r2 = jax.random.split(rng)
        n_cand = int(self.num_points * self.oversample_ratio)
        n_imp = int(self.num_points * self.importance_sample_ratio)
        cand = jax.random.uniform(r1, (n_cand, 2))
        logits = jax.lax.stop_gradient(
            _sample_points(mask_preds, cand))  # [B,Q,Pc]
        uncertainty = -jnp.abs(logits).min(axis=(0, 1))  # most-uncertain
        _, top_idx = jax.lax.top_k(uncertainty, n_imp)
        imp = cand[top_idx]
        uni = jax.random.uniform(r2, (self.num_points - n_imp, 2))
        return jnp.concatenate([imp, uni], axis=0)
