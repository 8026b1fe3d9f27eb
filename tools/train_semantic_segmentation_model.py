"""Semantic segmentation training entry.

Parity with /root/reference/tools/train_semantic_segmentation_model.py:
criterion is a dict {loss_name: loss} weighted-summed (reference uses
CELoss by default), eval = streaming-confusion mIoU every epoch.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(
        description="train semantic segmentation model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def build_loss_fn(model, config):
    import jax
    import jax.numpy as jnp

    criterion = config.train_criterion
    if not isinstance(criterion, dict):
        criterion = {"loss": criterion}
    ratios = getattr(config, "loss_ratio",
                     {k: 1.0 for k in criterion})
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    def loss_fn(params, variables, batch, rng):
        images = batch["image"].astype(compute_dtype)
        mutable = list(variables.keys())
        rngs = {"dropout": rng, "droppath": jax.random.fold_in(rng, 1)}
        if mutable:
            pred, new_vars = model.apply({"params": params, **variables},
                                         images, train=True, rngs=rngs,
                                         mutable=mutable)
            new_vars = dict(new_vars)
        else:
            pred = model.apply({"params": params}, images, train=True,
                               rngs=rngs)
            new_vars = variables
        loss_dict = {}
        total = 0.0
        for name, loss_obj in criterion.items():
            v = loss_obj(pred, batch["mask"]) * ratios.get(name, 1.0)
            loss_dict[name] = v
            total = total + v
        loss_dict["loss"] = total
        return total, (new_vars, loss_dict)

    return loss_fn


def main():
    args = parse_args()
    from simpleaicv_pytorch_training_examples_tpu.engine.evaluators import (
        semantic_segmentation_evaluator)
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        run_training)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)

    config = load_config_from_work_dir(args.work_dir, "train_config")
    return run_training(config, args.work_dir,
                        build_loss_fn=build_loss_fn,
                        build_eval=semantic_segmentation_evaluator)


if __name__ == "__main__":
    main()
