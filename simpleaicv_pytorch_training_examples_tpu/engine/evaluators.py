"""Reusable per-epoch evaluators for the generic runner."""

from typing import Optional

import numpy as np


def classification_evaluator(model, config, ctx, output_index: Optional[int]
                             = None, topk: int = 5):
    """Top-1/top-k accuracy over ctx.test_loader.

    output_index selects one element when the model returns a tuple (e.g.
    KDModel returns (tea, stu): pass 1 for the student).
    """
    import jax
    import jax.numpy as jnp

    from ..parallel import shard_batch
    from ..parallel.mesh import pad_batch_to_multiple
    from ..utils.meters import AccMeter

    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32
    use_ema = getattr(config, "use_ema_model", False)

    @jax.jit
    def eval_step(state, batch):
        params = state.ema_params if use_ema else state.params
        out = model.apply({"params": params, **state.variables},
                          batch["image"].astype(compute_dtype), train=False)
        if output_index is not None:
            out = out[output_index]
        logits = out.astype(jnp.float32)
        labels = batch["label"]
        if labels.ndim == 2:  # soft labels -> argmax
            labels = jnp.argmax(labels, axis=-1)
        top1 = jnp.argmax(logits, axis=-1) == labels
        _, topk_idx = jax.lax.top_k(logits, topk)
        return top1, jnp.any(topk_idx == labels[:, None], axis=-1)

    def evaluate(state):
        meter = AccMeter()
        for batch in ctx.test_loader:
            padded, n_real = pad_batch_to_multiple(batch, ctx.n_devices)
            padded = shard_batch(padded, ctx.mesh)
            top1, topk_hit = eval_step(state, padded)
            meter.update(np.asarray(top1)[:n_real].sum(),
                         np.asarray(topk_hit)[:n_real].sum(), n_real)
        return meter.acc1, (f"top1 {meter.acc1:.3f} "
                            f"top{topk} {meter.acc_topk:.3f}")

    return evaluate


def detection_coco_evaluator(model, config, ctx):
    """COCO-protocol mAP over ctx.test_loader.

    Mirrors /root/reference/tools/scripts.py:742-876 (evaluate_coco_detection)
    with the decode running on device and the mAP accumulation in the
    pure-numpy evaluator (pycocotools is unavailable here).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..detection.coco_eval import COCOMeanAveragePrecision
    from ..parallel import shard_batch
    from ..parallel.mesh import pad_batch_to_multiple

    decoder = config.decoder
    dataset = config.test_dataset
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    @jax.jit
    def forward(state, images):
        return model.apply({"params": state.params, **state.variables},
                           images.astype(compute_dtype), train=False)

    def evaluate(state):
        dets = []
        sample_idx = 0
        for batch in ctx.test_loader:
            padded, n_real = pad_batch_to_multiple(batch, ctx.n_devices)
            sharded = shard_batch(padded, ctx.mesh)
            preds = forward(state, sharded["image"])
            scores, classes, boxes = decoder(preds)
            scores = np.asarray(scores)[:n_real]
            classes = np.asarray(classes)[:n_real]
            boxes = np.asarray(boxes)[:n_real]
            scales = np.asarray(batch["scale"])[:n_real]
            for i in range(n_real):
                image_id = dataset.image_ids[sample_idx]
                sample_idx += 1
                keep = classes[i] >= 0
                bxs = boxes[i][keep] / max(scales[i], 1e-8)
                scs = scores[i][keep]
                cls = classes[i][keep]
                for b, s, c in zip(bxs, scs, cls):
                    dets.append({
                        "image_id": image_id,
                        "category_id": dataset.label_to_cat_id[int(c)],
                        "bbox": [float(b[0]), float(b[1]),
                                 float(b[2] - b[0]), float(b[3] - b[1])],
                        "score": float(s),
                    })

        gts = []
        for idx in range(sample_idx):
            image_id = dataset.image_ids[idx]
            for a in dataset.anns_by_image.get(image_id, []):
                gts.append({
                    "image_id": image_id,
                    "category_id": a["category_id"],
                    "bbox": list(a["bbox"]),
                    "iscrowd": a.get("iscrowd", 0),
                    "area": a.get("area", a["bbox"][2] * a["bbox"][3]),
                })
        stats = COCOMeanAveragePrecision().evaluate(
            gts, dets, image_ids=[dataset.image_ids[i]
                                  for i in range(sample_idx)])
        mAP = stats[0] * 100
        return mAP, (f"mAP {mAP:.3f} AP50 {stats[1] * 100:.3f} "
                     f"AP75 {stats[2] * 100:.3f}")

    return evaluate


def detection_voc_evaluator(model, config, ctx):
    """Pascal VOC mAP@0.5 over ctx.test_loader.

    Mirrors /root/reference/tools/scripts.py:503-739
    (evaluate_voc_detection): decode on device, per-class all-points AP on
    host over original-pixel coordinates.
    """
    import jax
    import jax.numpy as jnp

    from ..detection.voc_eval import evaluate_voc_detection
    from ..parallel import shard_batch
    from ..parallel.mesh import pad_batch_to_multiple

    decoder = config.decoder
    dataset = config.test_dataset
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    @jax.jit
    def forward(state, images):
        return model.apply({"params": state.params, **state.variables},
                           images.astype(compute_dtype), train=False)

    def evaluate(state):
        dets, gts = [], []
        sample_idx = 0
        for batch in ctx.test_loader:
            padded, n_real = pad_batch_to_multiple(batch, ctx.n_devices)
            sharded = shard_batch(padded, ctx.mesh)
            preds = forward(state, sharded["image"])
            scores, classes, boxes = decoder(preds)
            scores = np.asarray(scores)[:n_real]
            classes = np.asarray(classes)[:n_real]
            boxes = np.asarray(boxes)[:n_real]
            scales = np.asarray(batch["scale"])[:n_real]
            for i in range(n_real):
                keep = classes[i] >= 0
                dets.append((boxes[i][keep] / max(scales[i], 1e-8),
                             scores[i][keep], classes[i][keep]))
                annots, _ = dataset.parse_annotation(sample_idx)
                gts.append(np.asarray(annots, np.float32).reshape(-1, 5))
                sample_idx += 1
        mAP, per_class = evaluate_voc_detection(
            gts, dets, num_classes=config.num_classes, iou_threshold=0.5)
        mAP *= 100
        return mAP, f"VOC mAP@0.5 {mAP:.3f} ({len(per_class)} classes)"

    return evaluate


def semantic_segmentation_evaluator(model, config, ctx):
    """Streaming confusion-matrix mIoU/precision/recall/dice.

    Mirrors /root/reference/tools/scripts.py:1106-1171 (torch.histc
    streaming confusion) with the per-batch confusion computed on device as
    a bincount of gt*C+pred and summed on host.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..parallel import shard_batch
    from ..parallel.mesh import pad_batch_to_multiple

    num_classes = config.num_classes
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    @jax.jit
    def eval_step(state, batch, n_real):
        pred = model.apply({"params": state.params, **state.variables},
                           batch["image"].astype(compute_dtype), train=False)
        pred_cls = jnp.argmax(pred.astype(jnp.float32), axis=-1)
        gt = batch["mask"].astype(jnp.int32)
        b = gt.shape[0]
        flat = (gt.reshape(b, -1) * num_classes +
                pred_cls.reshape(b, -1))
        # padded rows go to an overflow bin that is sliced away, so the
        # ragged final batch cannot pollute the confusion matrix
        valid = (jnp.arange(b) < n_real)[:, None]
        flat = jnp.where(valid, flat, num_classes * num_classes)
        conf = jnp.bincount(flat.reshape(-1),
                            length=num_classes * num_classes + 1)
        return conf[:num_classes * num_classes].reshape(num_classes,
                                                        num_classes)

    def evaluate(state):
        confusion = np.zeros((num_classes, num_classes), np.int64)
        for batch in ctx.test_loader:
            padded, n_real = pad_batch_to_multiple(batch, ctx.n_devices)
            padded = shard_batch(padded, ctx.mesh)
            conf = np.asarray(eval_step(state, padded, n_real))
            confusion += conf
        tp = np.diag(confusion).astype(np.float64)
        fp = confusion.sum(axis=0) - tp
        fn = confusion.sum(axis=1) - tp
        valid = (confusion.sum(axis=1) > 0)
        iou = tp / np.clip(tp + fp + fn, 1, None)
        precision = tp / np.clip(tp + fp, 1, None)
        recall = tp / np.clip(tp + fn, 1, None)
        dice = 2 * tp / np.clip(2 * tp + fp + fn, 1, None)
        miou = float(iou[valid].mean() * 100) if valid.any() else 0.0
        return miou, (f"mIoU {miou:.3f} "
                      f"mprecision {precision[valid].mean() * 100:.3f} "
                      f"mrecall {recall[valid].mean() * 100:.3f} "
                      f"mdice {dice[valid].mean() * 100:.3f}")

    return evaluate


def salient_object_detection_evaluator(model, config, ctx):
    """Threshold-swept IoU / precision / recall / F-beta^2.

    Mirrors /root/reference/tools/salient_object_detection_scripts.py:24-90
    (EvalMeter over 256 thresholds, beta^2=0.3, plus mean IoU at 0.5).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..parallel import shard_batch
    from ..parallel.mesh import pad_batch_to_multiple

    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32
    thresholds = jnp.linspace(0.0, 1.0 - 1e-4, 256)

    @jax.jit
    def eval_step(state, batch, n_real):
        pred = model.apply({"params": state.params, **state.variables},
                           batch["image"].astype(compute_dtype),
                           train=False)[..., 0].astype(jnp.float32)
        gt = (batch["mask"] > 0.5).astype(jnp.float32)
        # per-threshold tp/fp/fn summed over batch+pixels: [256];
        # padded rows masked out so the ragged final batch adds nothing
        p = pred.reshape(pred.shape[0], -1)
        g = gt.reshape(gt.shape[0], -1)
        valid = (jnp.arange(p.shape[0]) < n_real).astype(jnp.float32)
        bin_p = (p[None] > thresholds[:, None, None]).astype(jnp.float32)
        w = valid[None, :, None]
        tp = (bin_p * g[None] * w).sum(axis=(1, 2))
        fp = (bin_p * (1 - g[None]) * w).sum(axis=(1, 2))
        fn = ((1 - bin_p) * g[None] * w).sum(axis=(1, 2))
        # IoU at 0.5 per image
        b05 = (p > 0.5).astype(jnp.float32)
        inter = (b05 * g).sum(axis=1)
        union = jnp.clip(b05.sum(axis=1) + g.sum(axis=1) - inter, 1e-4, None)
        return tp, fp, fn, inter / union

    def evaluate(state):
        from ..utils.meters import SalientObjectDetectionMeter
        meter = SalientObjectDetectionMeter()
        for batch in ctx.test_loader:
            padded, n_real = pad_batch_to_multiple(batch, ctx.n_devices)
            sharded = shard_batch(padded, ctx.mesh)
            t, f, n, iou = eval_step(state, sharded, n_real)
            meter.add_sums(t, f, n, np.asarray(iou)[:n_real].tolist())
        s = meter.summary()
        return s["miou"], (f"IoU {s['miou']:.4f} maxF {s['max_f_beta']:.4f} "
                           f"precision {s['precision']:.4f} "
                           f"recall {s['recall']:.4f}")

    return evaluate
