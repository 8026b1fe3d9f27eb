"""SAM encoder distillation training entry (13.0).

Parity with /root/reference/tools/
train_interactive_segmentation_distill_encoder_model.py: frozen SAM
teacher encoder -> student encoder, MSE on the 256-dim embedding maps.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(
        description="train SAM encoder distill model")
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
        if mutable:
            (tea, stu), new_vars = model.apply(
                {"params": params, **variables}, images, train=True,
                mutable=mutable)
            new_vars = dict(new_vars)
        else:
            tea, stu = model.apply({"params": params}, images, train=True)
            new_vars = variables
        loss_dict = criterion(tea, stu)
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
    if getattr(config, "freeze_teacher", True):
        name, params_dict = config.optimizer
        params_dict = dict(params_dict)
        sub = dict(params_dict.get("sub_layer_lr") or {})
        sub["teacher"] = 0.0
        params_dict["sub_layer_lr"] = sub
        config.optimizer = (name, params_dict)
    return run_training(config, args.work_dir,
                        build_loss_fn=build_loss_fn,
                        higher_is_better=False)


if __name__ == "__main__":
    main()
