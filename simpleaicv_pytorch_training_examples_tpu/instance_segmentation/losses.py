"""Instance segmentation losses (SOLOv2 / YOLACT), pure jnp.

Parity with /root/reference/SimpleAICV/instance_segmentation/losses.py:
- SOLOV2Loss (:557): per-level scale-range assignment of gt masks to grid
  cells in a sigma-shrunk center region (clipped to +-1 cell around the
  mass-center cell), focal loss over grid categories normalized by positive
  cell count, dice loss over dynamically-convolved masks normalized by
  (cell, gt) pair count.
- YOLACTLoss (:22): see YOLACTLoss docstring.

TPU re-design: the reference builds python lists of per-image positive
instances; here each (level, image) selects up to `max_positive_pairs`
(cell, gt) pairs via argsort-of-validity — fixed shapes, masked reductions,
one XLA program. GT masks arrive from the collater already at mask-feature
resolution (H/4) to keep HBM small.
"""

import jax
import jax.numpy as jnp

__all__ = ["SOLOV2Loss", "YOLACTLoss"]

_EPS = 1e-4


class SOLOV2Loss:

    def __init__(self,
                 scale_ranges=((1, 96), (48, 192), (96, 384), (192, 768),
                               (384, 2048)),
                 grid_nums=(40, 36, 24, 16, 12),
                 mask_feature_upsample_scale=4,
                 sigma=0.2,
                 alpha=0.25,
                 gamma=2.0,
                 cls_loss_weight=1.0,
                 dice_loss_weight=3.0,
                 max_positive_pairs=64):
        self.scale_ranges = scale_ranges
        self.grid_nums = grid_nums
        self.upsample_scale = mask_feature_upsample_scale
        self.sigma = sigma
        self.alpha = alpha
        self.gamma = gamma
        self.cls_loss_weight = cls_loss_weight
        self.dice_loss_weight = dice_loss_weight
        self.max_positive_pairs = max_positive_pairs

    def _assign_level(self, grid_num, lo, hi, gt_bboxes, gt_masks,
                      input_h, input_w):
        """One image, one level. gt_bboxes [M,5], gt_masks [M,Hm,Wm].
        Returns cate_label [G,G] int32, pair_cell [K], pair_gt [K],
        pair_valid [K]."""
        m = gt_bboxes.shape[0]
        g = grid_num
        labels = gt_bboxes[:, 4]
        boxes = gt_bboxes[:, 0:4]
        gt_valid = labels >= 0
        areas = jnp.sqrt(jnp.clip(
            (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]),
            0.0, None))
        mask_sum = gt_masks.sum(axis=(1, 2))
        hit = gt_valid & (areas >= lo) & (areas <= hi) & (mask_sum > 0)

        # mass centers at mask-feature resolution -> input pixels
        hm, wm = gt_masks.shape[1], gt_masks.shape[2]
        ys = jnp.arange(hm, dtype=jnp.float32)[None, :, None]
        xs = jnp.arange(wm, dtype=jnp.float32)[None, None, :]
        m00 = jnp.clip(mask_sum, _EPS, None)
        center_x = (gt_masks * xs).sum(axis=(1, 2)) / m00 * \
            self.upsample_scale
        center_y = (gt_masks * ys).sum(axis=(1, 2)) / m00 * \
            self.upsample_scale

        half_w = 0.5 * (boxes[:, 2] - boxes[:, 0]) * self.sigma
        half_h = 0.5 * (boxes[:, 3] - boxes[:, 1]) * self.sigma

        def cell_of(coord, size):
            return jnp.floor((coord / size) * g).astype(jnp.int32)

        coord_i = cell_of(center_y, input_h)
        coord_j = cell_of(center_x, input_w)
        top = jnp.maximum(jnp.maximum(0, cell_of(center_y - half_h,
                                                 input_h)), coord_i - 1)
        down = jnp.minimum(jnp.minimum(g - 1, cell_of(center_y + half_h,
                                                      input_h)), coord_i + 1)
        left = jnp.maximum(jnp.maximum(0, cell_of(center_x - half_w,
                                                  input_w)), coord_j - 1)
        right = jnp.minimum(jnp.minimum(g - 1, cell_of(center_x + half_w,
                                                       input_w)),
                            coord_j + 1)

        ii = jnp.arange(g)[:, None, None]  # [G,1,1]
        jj = jnp.arange(g)[None, :, None]  # [1,G,1]
        in_region = ((ii >= top[None, None]) & (ii <= down[None, None]) &
                     (jj >= left[None, None]) & (jj <= right[None, None]) &
                     hit[None, None])  # [G,G,M]

        # category label: the LAST (reference iteration order) valid gt wins
        order = jnp.arange(m)
        best = jnp.where(in_region, order[None, None], -1).max(axis=-1)
        any_pos = best >= 0
        cate_label = jnp.where(
            any_pos,
            labels[jnp.clip(best, 0, None)].astype(jnp.int32) + 1,
            0).astype(jnp.int32)

        # fixed-capacity pair selection
        flat_valid = in_region.reshape(-1)  # [G*G*M]
        k = self.max_positive_pairs
        idx = jnp.argsort(~flat_valid)[:k]
        pair_valid = flat_valid[idx]
        pair_cell = idx // m
        pair_gt = idx % m
        return cate_label, pair_cell, pair_gt, pair_valid

    def __call__(self, preds, gt_bboxes, gt_masks):
        """gt_bboxes [B,M,5] (-1 padded); gt_masks [B,M,Hm,Wm] float 0/1 at
        mask-feature resolution."""
        mask_feat, kernel_preds, cate_preds = preds
        mask_feat = mask_feat.astype(jnp.float32)  # [B,Hm,Wm,E]
        gt_bboxes = gt_bboxes.astype(jnp.float32)
        gt_masks = gt_masks.astype(jnp.float32)
        input_h = mask_feat.shape[1] * self.upsample_scale
        input_w = mask_feat.shape[2] * self.upsample_scale

        total_focal_num = 0.0
        total_focal_sum = 0.0
        total_dice_sum = 0.0
        total_pair_num = 0.0

        for level, (g, (lo, hi)) in enumerate(zip(self.grid_nums,
                                                  self.scale_ranges)):
            assign = jax.vmap(
                lambda b, mk: self._assign_level(g, lo, hi, b, mk, input_h,
                                                 input_w))
            cate_label, pair_cell, pair_gt, pair_valid = assign(gt_bboxes,
                                                                gt_masks)

            # ---- focal over this level's grid ----
            logits = cate_preds[level].astype(jnp.float32)  # [B,G,G,C]
            num_classes = logits.shape[-1]
            p = jnp.clip(jax.nn.sigmoid(logits), _EPS, 1.0 - _EPS)
            onehot = jax.nn.one_hot(cate_label, num_classes + 1,
                                    dtype=jnp.float32)[..., 1:]
            alpha_factor = jnp.where(onehot == 1.0, self.alpha,
                                     1.0 - self.alpha)
            pt = jnp.where(onehot == 1.0, p, 1.0 - p)
            bce = -(onehot * jnp.log(p) + (1.0 - onehot) * jnp.log(1.0 - p))
            total_focal_sum += (alpha_factor * (1.0 - pt)**self.gamma *
                                bce).sum()
            total_focal_num += (cate_label > 0).sum().astype(jnp.float32)

            # ---- dice over selected (cell, gt) pairs ----
            e = kernel_preds[level].shape[-1]
            kernels = kernel_preds[level].astype(jnp.float32).reshape(
                mask_feat.shape[0], g * g, e)  # [B,G*G,E]

            def per_image(kern, mfeat, masks, cells, gts, valid):
                sel_k = kern[cells]  # [K,E]
                pred = jnp.einsum("hwe,ke->khw", mfeat, sel_k)
                pred = jnp.clip(jax.nn.sigmoid(pred), _EPS, 1.0 - _EPS)
                tgt = masks[gts]  # [K,Hm,Wm]
                a = (pred * tgt).sum(axis=(1, 2))
                b_ = (pred * pred).sum(axis=(1, 2))
                c = (tgt * tgt).sum(axis=(1, 2))
                dice = 1.0 - (2 * a) / (b_ + c + _EPS)
                return (dice * valid).sum(), valid.sum().astype(jnp.float32)

            dice_sum, pair_num = jax.vmap(per_image)(
                kernels, mask_feat, gt_masks, pair_cell, pair_gt,
                pair_valid.astype(jnp.float32))
            total_dice_sum += dice_sum.sum()
            total_pair_num += pair_num.sum()

        cls_loss = jnp.where(
            total_focal_num > 0,
            total_focal_sum / jnp.clip(total_focal_num, 1.0, None), 0.0)
        dice_loss = jnp.where(
            total_pair_num > 0,
            total_dice_sum / jnp.clip(total_pair_num, 1.0, None), 0.0)
        return {"cls_loss": self.cls_loss_weight * cls_loss,
                "dice_loss": self.dice_loss_weight * dice_loss}


class YOLACTLoss:
    """YOLACT multi-task loss.

    Parity with /root/reference/SimpleAICV/instance_segmentation/
    losses.py:22-554: SSD-style max-IoU anchor matching (>=0.5 fg, <0.4 bg,
    in between ignore; each gt force-matched to its best anchor), OHEM
    cross entropy (3:1 hard negatives ranked by logsumexp - bg logit),
    SmoothL1 on variance-scaled offsets, prototype-assembled mask BCE
    cropped to the matched gt box and normalized by box area, and a
    per-class max-combined semantic-seg BCE on the P3 auxiliary head.

    TPU re-design: gt boxes arrive as fixed [B,M,5] normalized xyxy (-1
    padded), gt masks as [B,M,Hp,Wp] at prototype resolution; per-image
    positive masks are capped at `choose_max_mask_num` via argsort
    selection.
    """

    def __init__(self, resize=544, resize_type="retina_style",
                 scales=(24, 48, 96, 192, 384), ratios=(1, 1 / 2, 2),
                 strides=(8, 16, 32, 64, 128), cls_loss_weight=1.0,
                 box_loss_weight=1.5, mask_loss_weight=6.125,
                 semantic_seg_loss_weight=1.0, choose_max_mask_num=100):
        from .models.yolact import YOLACTAnchors
        self.resize = resize
        if resize_type == "retina_style":
            self.resize = int(round(resize * 1333.0 / 800))
        self.anchors = YOLACTAnchors(resize=self.resize, scales=scales,
                                     ratios=ratios, strides=strides)
        self.cls_loss_weight = cls_loss_weight
        self.box_loss_weight = box_loss_weight
        self.mask_loss_weight = mask_loss_weight
        self.semantic_seg_loss_weight = semantic_seg_loss_weight
        self.choose_max_mask_num = choose_max_mask_num

    @staticmethod
    def _pairwise_iou(boxes1, boxes2):
        """[M,4] x [A,4] xyxy -> [M,A]."""
        lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
        rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
        wh = jnp.clip(rb - lt, 0.0, None)
        inter = wh[..., 0] * wh[..., 1]
        a1 = jnp.clip((boxes1[:, 2] - boxes1[:, 0]) *
                      (boxes1[:, 3] - boxes1[:, 1]), 0.0, None)
        a2 = jnp.clip((boxes2[:, 2] - boxes2[:, 0]) *
                      (boxes2[:, 3] - boxes2[:, 1]), 0.0, None)
        union = jnp.clip(a1[:, None] + a2[None] - inter, 1e-10, None)
        return inter / union

    def _match_one_image(self, anchors_cxcywh, gt):
        """anchors [A,4] cxcywh norm; gt [M,5] xyxy norm + class."""
        boxes = gt[:, 0:4]
        labels = gt[:, 4]
        valid = labels >= 0
        any_valid = jnp.any(valid)
        priors_xyxy = jnp.concatenate(
            [anchors_cxcywh[:, :2] - anchors_cxcywh[:, 2:] / 2,
             anchors_cxcywh[:, :2] + anchors_cxcywh[:, 2:] / 2], axis=1)
        ious = self._pairwise_iou(boxes, priors_xyxy)  # [M,A]
        ious = jnp.where(valid[:, None], ious, -1.0)

        anchor_max_iou = ious.max(axis=0)
        anchor_max_gt = ious.argmax(axis=0)
        # force-match each valid gt to its best anchor (later gt wins)
        gt_best_anchor = ious.argmax(axis=1)  # [M]
        m = boxes.shape[0]
        for g in range(m):
            a = gt_best_anchor[g]
            anchor_max_iou = jnp.where(
                valid[g], anchor_max_iou.at[a].set(2.0), anchor_max_iou)
            anchor_max_gt = jnp.where(
                valid[g], anchor_max_gt.at[a].set(g), anchor_max_gt)

        matched_boxes = boxes[anchor_max_gt]
        cls_labels = labels[anchor_max_gt] + 1.0
        cls_labels = jnp.where(anchor_max_iou < 0.5, -1.0, cls_labels)
        cls_labels = jnp.where(anchor_max_iou < 0.4, 0.0, cls_labels)
        cls_labels = jnp.where(any_valid, cls_labels, 0.0)

        # variance-scaled SSD offsets
        variances = (0.1, 0.2)
        g_cxcy = ((matched_boxes[:, :2] + matched_boxes[:, 2:]) / 2 -
                  anchors_cxcywh[:, :2]) / (variances[0] *
                                            anchors_cxcywh[:, 2:])
        g_wh = jnp.log(jnp.clip(
            (matched_boxes[:, 2:] - matched_boxes[:, :2]) /
            anchors_cxcywh[:, 2:], 1e-8, None)) / variances[1]
        box_labels = jnp.concatenate([g_cxcy, g_wh], axis=1)
        return cls_labels, box_labels, matched_boxes, anchor_max_gt

    def __call__(self, preds, gt_bboxes, gt_masks):
        class_preds, box_preds, coef_preds, proto_outs, seg_preds = preds
        b = proto_outs.shape[0]
        gt_bboxes = gt_bboxes.astype(jnp.float32)
        gt_masks = gt_masks.astype(jnp.float32)

        feature_sizes = [[p.shape[2], p.shape[1]] for p in class_preds]
        anchors = jnp.asarray(self.anchors.flat_anchors(feature_sizes))

        num_classes = class_preds[0].shape[-1]
        class_preds = jnp.concatenate(
            [p.reshape(b, -1, num_classes) for p in class_preds],
            axis=1).astype(jnp.float32)
        box_preds = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in box_preds],
            axis=1).astype(jnp.float32)
        proto_planes = coef_preds[0].shape[-1]
        coef_preds = jnp.concatenate(
            [p.reshape(b, -1, proto_planes) for p in coef_preds],
            axis=1).astype(jnp.float32)

        cls_labels, box_labels, matched_boxes, matched_gt = jax.vmap(
            lambda g: self._match_one_image(anchors, g))(gt_bboxes)

        positive = cls_labels > 0
        n_pos_total = jnp.clip(positive.sum().astype(jnp.float32), 1.0,
                               None)

        # ---- OHEM classification loss ----
        logp = jax.nn.log_softmax(class_preds, axis=-1)
        mark = jax.nn.logsumexp(class_preds, axis=-1) - class_preds[..., 0]
        mark = jnp.where(positive | (cls_labels < 0), 0.0, mark)
        n_pos_img = positive.sum(axis=1, keepdims=True)
        n_neg_img = jnp.clip(3 * n_pos_img, None,
                             positive.shape[1] - 1).astype(jnp.float32)
        order = jnp.argsort(-mark, axis=1)
        ranks = jnp.argsort(order, axis=1).astype(jnp.float32)
        neg = (ranks < n_neg_img) & ~positive & (cls_labels >= 0)

        tgt = jnp.clip(cls_labels, 0, None).astype(jnp.int32)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        use = (positive | neg).astype(jnp.float32)
        cls_loss = (nll * use).sum() / n_pos_total

        # ---- box loss (SmoothL1 beta=1) ----
        d = jnp.abs(box_preds - box_labels)
        sl1 = jnp.where(d >= 1.0, d - 0.5, 0.5 * d * d).sum(-1)
        box_loss = (sl1 * positive).sum() / n_pos_total

        # ---- mask loss ----
        hp, wp = proto_outs.shape[1], proto_outs.shape[2]
        k = self.choose_max_mask_num

        def per_image(proto, coefs, pos, m_boxes, m_gt, masks):
            idx = jnp.argsort(~pos)[:k]  # first positives
            sel_valid = pos[idx].astype(jnp.float32)
            sel_coef = coefs[idx]  # [K,P]
            sel_box = m_boxes[idx]  # [K,4] normalized xyxy
            sel_masks = masks[m_gt[idx]]  # [K,Hp,Wp]
            pred = jnp.einsum("hwp,kp->hwk", proto, sel_coef)
            pred = jnp.clip(jax.nn.sigmoid(pred), _EPS, 1.0 - _EPS)
            # crop to box
            xs = jnp.arange(wp, dtype=jnp.float32)[None, :, None]
            ys = jnp.arange(hp, dtype=jnp.float32)[:, None, None]
            x1 = sel_box[None, None, :, 0] * wp
            x2 = sel_box[None, None, :, 2] * wp
            y1 = sel_box[None, None, :, 1] * hp
            y2 = sel_box[None, None, :, 3] * hp
            crop = ((xs >= x1) & (xs < x2) & (ys >= y1) &
                    (ys < y2)).astype(jnp.float32)
            pred = pred * crop
            pred = jnp.clip(pred, _EPS, 1.0 - _EPS)
            tgt_m = sel_masks.transpose(1, 2, 0)  # [Hp,Wp,K]
            bce = -(tgt_m * jnp.log(pred) +
                    (1.0 - tgt_m) * jnp.log(1.0 - pred))
            area = jnp.clip((sel_box[:, 2] - sel_box[:, 0]) *
                            (sel_box[:, 3] - sel_box[:, 1]), 1e-6, None)
            per_mask = bce.sum(axis=(0, 1)) / area
            return (per_mask * sel_valid).sum()

        mask_sum = jax.vmap(per_image)(proto_outs, coef_preds, positive,
                                       matched_boxes, matched_gt, gt_masks)
        mask_loss = mask_sum.sum() / (hp * wp * n_pos_total)

        # ---- semantic seg loss (P3 resolution) ----
        sh, sw = seg_preds.shape[1], seg_preds.shape[2]
        n_seg_classes = seg_preds.shape[-1]
        seg_masks = jax.image.resize(
            gt_masks, (b, gt_masks.shape[1], sh, sw), "bilinear") > 0.5
        seg_masks = seg_masks.astype(jnp.float32)
        gt_class = jnp.clip(gt_bboxes[..., 4], 0, None).astype(jnp.int32)
        gt_valid = (gt_bboxes[..., 4] >= 0).astype(jnp.float32)
        onehot = jax.nn.one_hot(gt_class, n_seg_classes,
                                dtype=jnp.float32) * gt_valid[..., None]
        # segment_gt[b,h,w,c] = max over gts of mask * class-onehot
        segment_gt = jnp.einsum("bmhw,bmc->bhwc", seg_masks, onehot)
        segment_gt = jnp.clip(segment_gt, 0.0, 1.0)
        p = jnp.clip(jax.nn.sigmoid(seg_preds.astype(jnp.float32)), _EPS,
                     1.0 - _EPS)
        seg_bce = -(segment_gt * jnp.log(p) +
                    (1.0 - segment_gt) * jnp.log(1.0 - p))
        seg_loss = seg_bce.sum() / (sh * sw * b)

        return {"cls_loss": self.cls_loss_weight * cls_loss,
                "box_loss": self.box_loss_weight * box_loss,
                "mask_loss": self.mask_loss_weight * mask_loss,
                "segmantic_seg_loss":
                    self.semantic_seg_loss_weight * seg_loss}
