"""Instance segmentation training entry (SOLOv2 / YOLACT).

Parity with /root/reference/tools/train_instance_segmentation_model.py +
tools/scripts.py:1466-1650: criterion(preds, gt_bboxes, gt_masks) returns a
loss dict; eval decodes masks on device and scores segm mAP with the
mask-IoU COCO evaluator at mask-feature resolution (pycocotools RLE is
unavailable; gt masks come from the collater in the same space, so the
metric differs from original-resolution COCOeval only by quantization).
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(
        description="train instance segmentation model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def build_loss_fn(model, config):
    import jax
    import jax.numpy as jnp

    criterion = config.train_criterion
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    def loss_fn(params, variables, batch, rng):
        images = batch["image"].astype(compute_dtype)
        mutable = list(variables.keys())
        rngs = {"dropout": rng, "droppath": jax.random.fold_in(rng, 1)}
        if mutable:
            preds, new_vars = model.apply({"params": params, **variables},
                                          images, train=True, rngs=rngs,
                                          mutable=mutable)
            new_vars = dict(new_vars)
        else:
            preds = model.apply({"params": params}, images, train=True,
                                rngs=rngs)
            new_vars = variables
        loss_dict = criterion(preds, batch["annots"], batch["mask"])
        total = sum(loss_dict.values())
        loss_dict = dict(loss_dict)
        loss_dict["loss"] = total
        return total, (new_vars, loss_dict)

    return loss_fn


def build_eval(model, config, ctx):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.detection.coco_eval import (
        COCOMaskAveragePrecision)
    from simpleaicv_pytorch_training_examples_tpu.parallel import shard_batch
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        pad_batch_to_multiple)

    decoder = config.decoder
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
            out = decoder(preds)
            if len(out) == 4:  # yolact: scores, classes, boxes, masks
                scores, classes, _, masks = out
            else:  # solov2: scores, classes, masks
                scores, classes, masks = out
            gt_boxes = np.asarray(batch["annots"])
            gt_masks = np.asarray(batch["mask"])
            for i in range(n_real):
                for m in range(gt_boxes.shape[1]):
                    if gt_boxes[i, m, 4] < 0:
                        continue
                    gm = gt_masks[i, m]
                    area = float(gm.sum())
                    gts.append({"image_id": image_id, "category_id":
                                int(gt_boxes[i, m, 4]), "mask": gm,
                                "area": area,
                                "bbox": [0.0, 0.0, 1.0, area],
                                "iscrowd": 0})
                for d in range(scores.shape[1]):
                    if classes[i, d] < 0:
                        continue
                    dm = masks[i, d]
                    dets.append({"image_id": image_id, "category_id":
                                 int(classes[i, d]),
                                 "score": float(scores[i, d]),
                                 "mask": dm,
                                 "bbox": [0.0, 0.0, 1.0, float(dm.sum())]})
                image_id += 1
        stats = COCOMaskAveragePrecision().evaluate(
            gts, dets, image_ids=list(range(image_id)))
        mAP = stats[0] * 100
        return mAP, f"segm mAP {mAP:.3f} AP50 {stats[1] * 100:.3f}"

    return evaluate


def main():
    args = parse_args()
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        run_training)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)

    config = load_config_from_work_dir(args.work_dir, "train_config")
    if not hasattr(config, "eval_epochs") and hasattr(config, "eval_epoch"):
        config.eval_epochs = config.eval_epoch
    return run_training(config, args.work_dir,
                        build_loss_fn=build_loss_fn,
                        build_eval=build_eval)


if __name__ == "__main__":
    main()
