"""Universal segmentation training entry.

Parity with /root/reference/tools/train_universal_segmentation_model.py +
tools/universal_segmentation_scripts.py:28-400: Mask2Former-style set loss
on (mask_preds, class_preds); gt arrives from the collater as fixed-size
class labels + mask stacks.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(
        description="train universal segmentation model")
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
        rngs = {"dropout": rng}
        if mutable:
            preds, new_vars = model.apply({"params": params, **variables},
                                          images, train=True, rngs=rngs,
                                          mutable=mutable)
            new_vars = dict(new_vars)
        else:
            preds = model.apply({"params": params}, images, train=True,
                                rngs=rngs)
            new_vars = variables
        loss_dict = criterion(preds, batch["gt_classes"], batch["gt_masks"],
                              jax.random.fold_in(rng, 99))
        total = sum(loss_dict.values())
        loss_dict = dict(loss_dict)
        loss_dict["loss"] = total
        return total, (new_vars, loss_dict)

    return loss_fn


def main():
    args = parse_args()
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        run_training)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)

    config = load_config_from_work_dir(args.work_dir, "train_config")
    return run_training(config, args.work_dir,
                        build_loss_fn=build_loss_fn,
                        higher_is_better=False)


if __name__ == "__main__":
    main()
