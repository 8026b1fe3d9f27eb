"""Instance segmentation decoders — on-device.

Parity with /root/reference/SimpleAICV/instance_segmentation/decode.py:
- SOLOV2Decoder (:337): per-level points-NMS (2x2 local max) on sigmoid
  category heatmaps, top-k kernel selection, dynamic-conv mask assembly,
  matrix NMS (:572) with gaussian decay, final score threshold.
- YOLACTDecoder (:22): per-class fast NMS (:218) over variance-decoded
  boxes, prototype mask assembly + box crop (:309).

All fixed-shape jitted programs; outputs are padded arrays with -1 class
for empty slots, masks at mask-feature (input/4) resolution for the
evaluator to upsample host-side.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SOLOV2Decoder", "YOLACTDecoder"]


def _points_nms(heat):
    """Keep only 2x2 local maxima (reference decode.py:563-571).
    heat [G,G,C]."""
    pad = jnp.pad(heat, ((0, 1), (0, 1), (0, 0)), constant_values=-jnp.inf)
    pooled = jax.lax.reduce_window(pad, -jnp.inf, jax.lax.max,
                                   (2, 2, 1), (1, 1, 1), "VALID")
    keep = (heat >= pooled).astype(heat.dtype)
    return heat * keep


def _matrix_nms(masks, labels, scores, sigma=2.0, kernel="gaussian"):
    """Matrix NMS over binary masks [N,H,W] (reference decode.py:572-620).
    Returns decayed scores [N]."""
    n = masks.shape[0]
    flat = masks.reshape(n, -1)
    inter = flat @ flat.T  # [N,N]
    areas = flat.sum(axis=1)
    union = areas[:, None] + areas[None, :] - inter
    ious = inter / jnp.clip(union, 1e-6, None)
    # only consider pairs with higher-scored mask j < i (scores sorted desc)
    upper = jnp.triu(jnp.ones((n, n)), k=1)
    same_label = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    decay_iou = ious * upper * same_label  # [N,N]: row i (higher) -> col j
    # compensate[i]: max IoU of suppressor i with any even-higher mask
    compensate = (decay_iou.max(axis=0))[:, None]
    if kernel == "gaussian":
        decay = jnp.exp(-sigma * (decay_iou**2 - compensate**2))
    else:
        decay = (1 - decay_iou) / jnp.clip(1 - compensate, 1e-6, None)
    decay = jnp.where(decay_iou > 0, decay, 1.0)
    decay_coeff = decay.min(axis=0)
    return scores * decay_coeff


class SOLOV2Decoder:

    def __init__(self, grid_nums=(40, 36, 24, 16, 12),
                 strides=(8, 8, 16, 32, 32),
                 mask_feature_upsample_scale=4, max_mask_num=100,
                 topn=500, min_score_threshold=0.1,
                 keep_score_threshold=0.1, mask_threshold=0.5,
                 update_threshold=0.05):
        self.grid_nums = grid_nums
        self.strides = strides
        self.upsample_scale = mask_feature_upsample_scale
        self.max_mask_num = max_mask_num
        self.topn = topn
        self.min_score_threshold = min_score_threshold
        self.mask_threshold = mask_threshold
        self.update_threshold = update_threshold

    def __call__(self, preds):
        mask_feat, kernel_preds, cate_preds = preds
        b = mask_feat.shape[0]

        @jax.jit
        def decode(mask_feat, *flat_preds):
            n_levels = len(self.grid_nums)
            kernels = flat_preds[:n_levels]
            cates = flat_preds[n_levels:]

            def one_image(mfeat, *per_level):
                kerns = per_level[:n_levels]
                cats = per_level[n_levels:]
                all_scores, all_classes, all_kernels = [], [], []
                for g, kern, cat in zip(self.grid_nums, kerns, cats):
                    heat = _points_nms(jax.nn.sigmoid(
                        cat.astype(jnp.float32)))
                    scores = heat.max(axis=-1).reshape(-1)  # [G*G]
                    classes = heat.argmax(axis=-1).reshape(-1)
                    all_scores.append(scores)
                    all_classes.append(classes.astype(jnp.float32))
                    all_kernels.append(kern.reshape(g * g, -1))
                scores = jnp.concatenate(all_scores)
                classes = jnp.concatenate(all_classes)
                kernels_cat = jnp.concatenate(all_kernels, axis=0)

                scores = jnp.where(scores > self.min_score_threshold,
                                   scores, -jnp.inf)
                k = min(self.topn, scores.shape[0])
                top_scores, top_idx = jax.lax.top_k(scores, k)
                top_classes = classes[top_idx]
                top_kernels = kernels_cat[top_idx]

                masks_logit = jnp.einsum("hwe,ke->khw",
                                         mfeat.astype(jnp.float32),
                                         top_kernels)
                soft = jax.nn.sigmoid(masks_logit)
                masks = (soft > self.mask_threshold).astype(jnp.float32)
                areas = masks.sum(axis=(1, 2))
                seg_score = (soft * masks).sum(axis=(1, 2)) / \
                    jnp.clip(areas, 1e-6, None)
                top_scores = jnp.where(jnp.isfinite(top_scores),
                                       top_scores * seg_score, -jnp.inf)
                top_scores = jnp.where(areas > 0, top_scores, -jnp.inf)

                decayed = _matrix_nms(masks, top_classes,
                                      jnp.where(jnp.isfinite(top_scores),
                                                top_scores, 0.0))
                decayed = jnp.where(jnp.isfinite(top_scores), decayed,
                                    -jnp.inf)
                decayed = jnp.where(decayed > self.update_threshold,
                                    decayed, -jnp.inf)

                m = min(self.max_mask_num, decayed.shape[0])
                out_scores, out_idx = jax.lax.top_k(decayed, m)
                kept = jnp.isfinite(out_scores)
                out_classes = jnp.where(kept, top_classes[out_idx], -1.0)
                out_masks = jnp.where(kept[:, None, None], masks[out_idx],
                                      0.0)
                out_scores = jnp.where(kept, out_scores, -1.0)
                return out_scores, out_classes, out_masks

            return jax.vmap(one_image)(mask_feat, *kernels, *cates)

        scores, classes, masks = decode(jnp.asarray(mask_feat),
                                        *[jnp.asarray(k)
                                          for k in kernel_preds],
                                        *[jnp.asarray(c)
                                          for c in cate_preds])
        return [np.asarray(scores), np.asarray(classes), np.asarray(masks)]


class YOLACTDecoder:

    def __init__(self, resize=544, resize_type="retina_style",
                 scales=(24, 48, 96, 192, 384), ratios=(1, 1 / 2, 2),
                 strides=(8, 16, 32, 64, 128), max_object_num=100,
                 min_score_threshold=0.05, topn=200, nms_threshold=0.5,
                 mask_threshold=0.5):
        from .models.yolact import YOLACTAnchors
        self.resize = resize
        if resize_type == "retina_style":
            self.resize = int(round(resize * 1333.0 / 800))
        self.anchors = YOLACTAnchors(resize=self.resize, scales=scales,
                                     ratios=ratios, strides=strides)
        self.max_object_num = max_object_num
        self.min_score_threshold = min_score_threshold
        self.topn = topn
        self.nms_threshold = nms_threshold
        self.mask_threshold = mask_threshold

    def __call__(self, preds):
        class_preds, box_preds, coef_preds, proto_outs, _ = preds
        feature_sizes = [[p.shape[2], p.shape[1]] for p in class_preds]
        anchors = jnp.asarray(self.anchors.flat_anchors(feature_sizes))
        b = proto_outs.shape[0]
        num_classes = class_preds[0].shape[-1]
        proto_planes = coef_preds[0].shape[-1]
        cls = jnp.concatenate([jnp.asarray(p).reshape(b, -1, num_classes)
                               for p in class_preds], axis=1)
        box = jnp.concatenate([jnp.asarray(p).reshape(b, -1, 4)
                               for p in box_preds], axis=1)
        coef = jnp.concatenate([jnp.asarray(p).reshape(b, -1, proto_planes)
                                for p in coef_preds], axis=1)

        @jax.jit
        def decode(cls, box, coef, protos):
            def one_image(c, bx, cf, proto):
                probs = jax.nn.softmax(c.astype(jnp.float32), axis=-1)
                scores = probs[:, 1:].max(axis=-1)  # drop background
                classes = probs[:, 1:].argmax(axis=-1).astype(jnp.float32)
                # decode boxes (variances 0.1/0.2), normalized xyxy
                variances = (0.1, 0.2)
                ctr = anchors[:, :2] + bx[:, :2] * variances[0] * \
                    anchors[:, 2:]
                wh = anchors[:, 2:] * jnp.exp(bx[:, 2:] * variances[1])
                boxes = jnp.concatenate([ctr - wh / 2, ctr + wh / 2],
                                        axis=1)

                masked = jnp.where(scores > self.min_score_threshold,
                                   scores, -jnp.inf)
                k = min(self.topn, masked.shape[0])
                top_scores, top_idx = jax.lax.top_k(masked, k)
                top_boxes = boxes[top_idx]
                top_classes = classes[top_idx]
                top_coefs = cf[top_idx]

                # fast NMS: suppress if IoU with any higher-scored same-class
                # detection exceeds threshold
                lt = jnp.maximum(top_boxes[:, None, :2],
                                 top_boxes[None, :, :2])
                rb = jnp.minimum(top_boxes[:, None, 2:],
                                 top_boxes[None, :, 2:])
                wh_i = jnp.clip(rb - lt, 0.0, None)
                inter = wh_i[..., 0] * wh_i[..., 1]
                areas = jnp.clip(
                    (top_boxes[:, 2] - top_boxes[:, 0]) *
                    (top_boxes[:, 3] - top_boxes[:, 1]), 0.0, None)
                union = jnp.clip(areas[:, None] + areas[None] - inter,
                                 1e-6, None)
                ious = inter / union
                same = top_classes[:, None] == top_classes[None, :]
                higher = jnp.triu(jnp.ones((k, k), bool), k=1).T  # j<i
                max_iou = jnp.where(same & higher, ious, 0.0).max(axis=1)
                keep = (max_iou <= self.nms_threshold) & \
                    jnp.isfinite(top_scores)

                kept_scores = jnp.where(keep, top_scores, -jnp.inf)
                m = min(self.max_object_num, k)
                out_scores, out_idx = jax.lax.top_k(kept_scores, m)
                ok = jnp.isfinite(out_scores)
                out_classes = jnp.where(ok, top_classes[out_idx], -1.0)
                out_boxes = jnp.where(ok[:, None], top_boxes[out_idx], 0.0)
                sel_coefs = top_coefs[out_idx]

                mask_logit = jnp.einsum("hwp,kp->khw",
                                        proto.astype(jnp.float32),
                                        sel_coefs)
                soft = jax.nn.sigmoid(mask_logit)
                hp, wp = soft.shape[1], soft.shape[2]
                xs = jnp.arange(wp, dtype=jnp.float32)[None, None, :]
                ys = jnp.arange(hp, dtype=jnp.float32)[None, :, None]
                x1 = out_boxes[:, None, None, 0] * wp
                x2 = out_boxes[:, None, None, 2] * wp
                y1 = out_boxes[:, None, None, 1] * hp
                y2 = out_boxes[:, None, None, 3] * hp
                crop = ((xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2))
                masks = ((soft * crop) > self.mask_threshold).astype(
                    jnp.float32)
                masks = jnp.where(ok[:, None, None], masks, 0.0)
                out_scores = jnp.where(ok, out_scores, -1.0)
                return out_scores, out_classes, out_boxes, masks

            return jax.vmap(one_image)(cls, box, coef, protos)

        scores, classes, boxes, masks = decode(cls, box, coef,
                                               jnp.asarray(proto_outs))
        return [np.asarray(scores), np.asarray(classes), np.asarray(boxes),
                np.asarray(masks)]
