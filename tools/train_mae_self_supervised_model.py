"""MAE self-supervised pretraining entry.

Parity with /root/reference/tools/train_mae_self_supervised_model.py +
tools/scripts.py:1774-1934: model returns (pred_patches, mask); criterion is
a masked-patch reconstruction loss on collater-patchified labels; best
metric is the (lower-is-better) train loss.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(description="train MAE model")
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
        rngs = {"dropout": rng,
                "droppath": jax.random.fold_in(rng, 1),
                "masking": jax.random.fold_in(rng, 2)}
        mutable = list(variables.keys())
        if mutable:
            (pred, mask), new_vars = model.apply(
                {"params": params, **variables}, images, train=True,
                rngs=rngs, mutable=mutable)
            new_vars = dict(new_vars)
        else:
            pred, mask = model.apply({"params": params}, images, train=True,
                                     rngs=rngs)
            new_vars = variables
        loss = criterion(pred, batch["label"], mask)
        return loss, (new_vars, {"loss": loss})

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
