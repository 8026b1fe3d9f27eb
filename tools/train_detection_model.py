"""Detection training entry (RetinaNet / FCOS).

Parity with /root/reference/tools/train_detection_model.py +
tools/scripts.py:884-1100: criterion returns a loss dict (cls/reg[/center])
summed into the total; eval runs the on-device decoder + COCO mAP on
config.eval_epoch milestones.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(description="train detection model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def build_loss_fn(model, config):
    import jax
    import jax.numpy as jnp

    criterion = config.train_criterion
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32
    # DETR's set loss consumes the cxcywh-normalized 'scaled_annots' the
    # DETR collater emits; anchor losses consume pixel 'annots'
    annots_key = getattr(config, "annots_key", "annots")

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
        loss_dict = criterion(preds, batch[annots_key])
        total = sum(loss_dict.values())
        loss_dict = dict(loss_dict)
        loss_dict["loss"] = total
        return total, (new_vars, loss_dict)

    return loss_fn


def main():
    args = parse_args()
    from simpleaicv_pytorch_training_examples_tpu.engine.evaluators import (
        detection_coco_evaluator, detection_voc_evaluator)
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        run_training)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)

    config = load_config_from_work_dir(args.work_dir, "train_config")
    if not hasattr(config, "eval_epochs") and hasattr(config, "eval_epoch"):
        config.eval_epochs = config.eval_epoch
    evaluator = detection_voc_evaluator \
        if getattr(config, "eval_type", "COCO") == "VOC" \
        else detection_coco_evaluator

    return run_training(config, args.work_dir,
                        build_loss_fn=build_loss_fn,
                        build_eval=evaluator)


if __name__ == "__main__":
    main()
