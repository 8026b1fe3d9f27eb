"""Shared evaluators for the 6 universal-segmentation test entries.

Parity with /root/reference/tools/universal_segmentation_scripts.py
(test_semantic_segmentation_dataset / test_instance_segmentation_dataset /
test_salient_object_detection_dataset / test_human_matting_dataset /
test_face_parsing_dataset / test_human_parsing_dataset): one trained
UniversalSegmentation checkpoint is evaluated against each sub-task's
dataset with that task's own metric — streaming-confusion mIoU for the
per-pixel tasks, threshold-swept F-beta for salient-object, IoU+SAD/MAE
for matting, COCO-protocol segm mAP for instance.
"""

import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def _forward_semantic(model, config):
    """jit step: universal preds -> per-pixel class map at gt resolution."""
    import jax
    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    @jax.jit
    def step(state, images):
        mask_preds, class_preds = model.apply(
            {"params": state.params, **state.variables},
            images.astype(compute_dtype), train=False)
        probs = jax.nn.softmax(class_preds.astype(jnp.float32),
                               axis=-1)[..., :-1]
        masks = jax.nn.sigmoid(mask_preds.astype(jnp.float32))
        seg = jnp.einsum("bqc,bqhw->bchw", probs, masks)
        b, c = seg.shape[0], seg.shape[1]
        h, w = images.shape[1], images.shape[2]
        seg = jax.image.resize(seg, (b, c, h, w), "bilinear")
        return seg

    return step


def semantic_eval(model, config, ctx, mask_key="mask"):
    """Streaming-confusion mIoU (semantic / face parsing / human parsing)."""
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.parallel import shard_batch
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        pad_batch_to_multiple)

    num_classes = config.num_classes
    step = _forward_semantic(model, config)

    def evaluate(state):
        confusion = np.zeros((num_classes, num_classes), np.int64)
        for batch in ctx.test_loader:
            padded, n_real = pad_batch_to_multiple(batch, ctx.n_devices)
            sharded = shard_batch(padded, ctx.mesh)
            seg = np.asarray(step(state, sharded["image"]))
            pred = seg.argmax(axis=1)[:n_real]
            gt = np.asarray(batch[mask_key])[:n_real].astype(np.int64)
            valid = gt < num_classes  # drop ignore_index pixels
            flat = gt[valid] * num_classes + pred[valid]
            confusion += np.bincount(
                flat.reshape(-1),
                minlength=num_classes * num_classes).reshape(
                    num_classes, num_classes)
        tp = np.diag(confusion).astype(np.float64)
        fp = confusion.sum(axis=0) - tp
        fn = confusion.sum(axis=1) - tp
        present = confusion.sum(axis=1) > 0
        iou = tp / np.clip(tp + fp + fn, 1, None)
        miou = float(iou[present].mean() * 100) if present.any() else 0.0
        return miou, f"mIoU {miou:.3f}"

    return evaluate


def binary_eval(model, config, ctx, matting=False):
    """Foreground-probability eval: threshold-swept precision/recall/F-beta
    (+ SAD/MAE vs the soft alpha for matting datasets). Class 1 == fg."""
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.parallel import shard_batch
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        pad_batch_to_multiple)

    step = _forward_semantic(model, config)
    thresholds = np.linspace(0.0, 1.0 - 1e-4, 256)

    def evaluate(state):
        tp = np.zeros(256)
        fp = np.zeros(256)
        fn = np.zeros(256)
        ious, sads, maes = [], [], []
        for batch in ctx.test_loader:
            padded, n_real = pad_batch_to_multiple(batch, ctx.n_devices)
            sharded = shard_batch(padded, ctx.mesh)
            seg = np.asarray(step(state, sharded["image"]))[:n_real]
            # fg prob = everything but background class 0
            prob = 1.0 - seg[:, 0] / np.clip(seg.sum(axis=1), 1e-8, None)
            gt_key = "alpha" if ("alpha" in batch) else "mask"
            gt_soft = np.asarray(batch[gt_key])[:n_real].astype(np.float32)
            if gt_soft.max() > 1.5:
                gt_soft = gt_soft / 255.0
            gt = (gt_soft > 0.5).astype(np.float32)
            p = prob.reshape(len(prob), -1)
            g = gt.reshape(len(gt), -1)
            for th_i, th in enumerate(thresholds):
                bp = p > th
                tp[th_i] += (bp * g).sum()
                fp[th_i] += (bp * (1 - g)).sum()
                fn[th_i] += ((~bp) * g).sum()
            b05 = (p > 0.5).astype(np.float32)
            inter = (b05 * g).sum(axis=1)
            union = np.clip(b05.sum(axis=1) + g.sum(axis=1) - inter,
                            1e-4, None)
            ious.extend((inter / union).tolist())
            if matting:
                gs = gt_soft.reshape(len(gt_soft), -1)
                sads.extend(np.abs(p - gs).sum(axis=1).tolist())
                maes.extend(np.abs(p - gs).mean(axis=1).tolist())
        precision = tp / np.clip(tp + fp, 1, None)
        recall = tp / np.clip(tp + fn, 1, None)
        beta2 = 0.3
        f_beta = (1 + beta2) * precision * recall / np.clip(
            beta2 * precision + recall, 1e-8, None)
        miou = float(np.mean(ious)) * 100 if ious else 0.0
        msg = (f"IoU {miou:.3f} maxF {float(f_beta.max()):.4f} "
               f"precision {float(precision.mean()):.4f} "
               f"recall {float(recall.mean()):.4f}")
        if matting and sads:
            msg += (f" SAD {float(np.mean(sads)) / 1000.0:.3f}k "
                    f"MAE {float(np.mean(maes)):.5f}")
        return miou, msg

    return evaluate


def instance_eval(model, config, ctx):
    """COCO-protocol segm mAP through UniversalSegmentationDecoder."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.detection.coco_eval import (
        COCOMaskAveragePrecision)
    from simpleaicv_pytorch_training_examples_tpu.parallel import shard_batch
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        pad_batch_to_multiple)
    from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.segmentation_decode import (
        UniversalSegmentationDecoder)

    decoder = getattr(config, "decoder", None) or \
        UniversalSegmentationDecoder(num_classes=config.num_classes,
                                     mode="instance")
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    @jax.jit
    def forward(state, images):
        return model.apply({"params": state.params, **state.variables},
                           images.astype(compute_dtype), train=False)

    def evaluate(state):
        gts, dets = [], []
        image_id = 0
        for batch in ctx.test_loader:
            padded, n_real = pad_batch_to_multiple(batch, ctx.n_devices)
            sharded = shard_batch(padded, ctx.mesh)
            preds = forward(state, sharded["image"])
            scores, classes, masks = decoder(preds)
            gt_classes = np.asarray(batch["gt_classes"])
            gt_masks = np.asarray(batch["gt_masks"])
            h, w = gt_masks.shape[-2], gt_masks.shape[-1]
            for i in range(n_real):
                for m in range(gt_classes.shape[1]):
                    if gt_classes[i, m] < 0:
                        continue
                    gm = gt_masks[i, m]
                    gts.append({"image_id": image_id,
                                "category_id": int(gt_classes[i, m]),
                                "mask": gm, "area": float(gm.sum()),
                                "bbox": [0.0, 0.0, 1.0, float(gm.sum())],
                                "iscrowd": 0})
                for d in range(scores.shape[1]):
                    if classes[i, d] < 0:
                        continue
                    dm = masks[i, d]
                    if dm.shape != (h, w):
                        dm = np.asarray(jax.image.resize(
                            jnp.asarray(dm), (h, w), "nearest"))
                    dets.append({"image_id": image_id,
                                 "category_id": int(classes[i, d]),
                                 "score": float(scores[i, d]),
                                 "mask": dm,
                                 "bbox": [0.0, 0.0, 1.0, float(dm.sum())]})
                image_id += 1
        stats = COCOMaskAveragePrecision().evaluate(
            gts, dets, image_ids=list(range(image_id)))
        mAP = stats[0] * 100
        return mAP, f"segm mAP {mAP:.3f} AP50 {stats[1] * 100:.3f}"

    return evaluate
