"""Universal instance-matting loss (Hungarian per-query alpha matching).

Parity with /root/reference/SimpleAICV/universal_segmentation/
matting_losses.py:20-713 (UniversalMattingLoss): queries are matched to
ground-truth instance alphas (point-sampled L1 + class cost, scipy LSA via
pure_callback), then matched pairs take class CE (no-object weighted),
fused/local alpha L1 and a 3-class trimap CE on the global branch.

TPU re-design: the trimap target is derived in-graph from alpha
thresholds (fg > 0.95, unknown 0.05-0.95) instead of the reference's host
erosion/dilation — static shapes, same supervision signal family.
"""

import jax
import jax.numpy as jnp

from ..detection.losses import _hungarian_match_host
from .segmentation_losses import _sample_points

__all__ = ["UniversalInstanceMattingLoss"]

_EPS = 1e-6


class UniversalInstanceMattingLoss:

    def __init__(self, num_classes=2, cls_match_cost=2.0,
                 alpha_match_cost=5.0, cls_loss_weight=2.0,
                 fused_loss_weight=5.0, local_loss_weight=2.0,
                 global_loss_weight=1.0, no_object_cls_weight=0.1,
                 num_points=4096):
        self.num_classes = num_classes
        self.cls_match_cost = cls_match_cost
        self.alpha_match_cost = alpha_match_cost
        self.cls_loss_weight = cls_loss_weight
        self.fused_loss_weight = fused_loss_weight
        self.local_loss_weight = local_loss_weight
        self.global_loss_weight = global_loss_weight
        self.no_object_cls_weight = no_object_cls_weight
        self.num_points = num_points

    def __call__(self, preds, gt_classes, gt_alphas, rng):
        """preds: (global [B,Q,H,W,3], local [B,Q,H,W,1],
        fused [B,Q,H,W,1], class_preds [B,Q,C]); gt_classes [B,M]
        (-1 pad); gt_alphas [B,M,H,W] in [0,1]; rng for point sampling."""
        global_p, local_p, fused_p, class_preds = preds
        fused = fused_p[..., 0].astype(jnp.float32)   # [B,Q,H,W]
        local = local_p[..., 0].astype(jnp.float32)
        class_preds = class_preds.astype(jnp.float32)
        gt_alphas = gt_alphas.astype(jnp.float32)
        b, q = class_preds.shape[0], class_preds.shape[1]
        m = gt_classes.shape[1]
        gt_valid = gt_classes >= 0
        safe_class = jnp.clip(gt_classes, 0, None).astype(jnp.int32)

        points = jax.random.uniform(rng, (self.num_points, 2))
        pred_pts = _sample_points(jax.lax.stop_gradient(fused), points)
        gt_pts = _sample_points(gt_alphas, points)  # [B,M,P]

        probs = jax.nn.softmax(jax.lax.stop_gradient(class_preds), axis=-1)
        cls_cost = -jnp.take_along_axis(
            jnp.broadcast_to(probs[:, :, None, :],
                             (b, q, m, probs.shape[-1])),
            safe_class[:, None, :, None], axis=-1)[..., 0]
        # point-sampled alpha L1 cost
        l1_cost = jnp.abs(pred_pts[:, :, None, :] -
                          gt_pts[:, None, :, :]).mean(-1)
        total_cost = (self.cls_match_cost * cls_cost +
                      self.alpha_match_cost * l1_cost)
        matched = jax.pure_callback(
            _hungarian_match_host,
            jax.ShapeDtypeStruct((b, q), jnp.int32), total_cost, gt_valid)
        is_matched = matched >= 0
        safe_matched = jnp.clip(matched, 0, None)
        n_matched = jnp.clip(gt_valid.sum().astype(jnp.float32), 1.0, None)

        # class loss (no-object = last class)
        no_object = self.num_classes - 1
        tgt_class = jnp.where(
            is_matched,
            jnp.take_along_axis(safe_class, safe_matched, axis=1),
            no_object)
        weights = jnp.ones(self.num_classes).at[no_object].set(
            self.no_object_cls_weight)
        logp = jax.nn.log_softmax(class_preds, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt_class[..., None],
                                   axis=-1)[..., 0]
        w = weights[tgt_class]
        cls_loss = (nll * w).sum() / w.sum()

        # matched alpha targets gathered per query: [B,Q,H,W]
        tgt_alpha = jnp.take_along_axis(
            gt_alphas, safe_matched[:, :, None, None], axis=1)
        valid_f = is_matched.astype(jnp.float32)

        fused_l1 = jnp.abs(fused - tgt_alpha).mean(axis=(2, 3))
        fused_loss = (fused_l1 * valid_f).sum() / n_matched
        local_l1 = jnp.abs(local - tgt_alpha).mean(axis=(2, 3))
        local_loss = (local_l1 * valid_f).sum() / n_matched

        # global trimap CE: 3-class target from alpha thresholds
        tri_fg = (tgt_alpha > 0.95).astype(jnp.float32)
        tri_unknown = ((tgt_alpha > 0.05) &
                       (tgt_alpha <= 0.95)).astype(jnp.float32)
        tri_bg = 1.0 - tri_fg - tri_unknown
        tri_onehot = jnp.stack([tri_bg, tri_unknown, tri_fg], axis=-1)
        gp = jnp.clip(global_p.astype(jnp.float32), _EPS, 1.0 - _EPS)
        bce = -(tri_onehot * jnp.log(gp) +
                (1.0 - tri_onehot) * jnp.log(1.0 - gp))
        global_loss = (bce.mean(axis=(2, 3, 4)) * valid_f).sum() / n_matched

        return {
            "cls_loss": self.cls_loss_weight * cls_loss,
            "fused_alpha_loss": self.fused_loss_weight * fused_loss,
            "local_alpha_loss": self.local_loss_weight * local_loss,
            "global_trimap_loss": self.global_loss_weight * global_loss,
        }
