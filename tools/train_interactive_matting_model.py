"""SAM interactive matting training entry.

Parity with /root/reference/tools/train_interactive_matting_model.py +
tools/interactive_matting_scripts.py: SAMMatting forward on prompted
images; trimap/alpha loss-dict dispatch identical to human matting.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(
        description="train interactive matting model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def build_loss_fn(model, config):
    import jax
    import jax.numpy as jnp

    criterion = config.train_criterion
    ratios = getattr(config, "loss_ratio", {k: 1.0 for k in criterion})
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    def loss_fn(params, variables, batch, rng):
        images = batch["image"].astype(compute_dtype)
        prompts = {
            "prompt_point": batch["prompt_point"].astype(jnp.float32),
            "prompt_box": batch.get("prompt_box"),
            "prompt_box_valid": batch.get("prompt_box_valid"),
            "prompt_mask": batch.get("prompt_mask"),
            "prompt_mask_valid": batch.get("prompt_mask_valid"),
        }
        mutable = list(variables.keys())
        if mutable:
            (g, l, f, _), new_vars = model.apply(
                {"params": params, **variables}, images, prompts,
                mutable=mutable)
            new_vars = dict(new_vars)
        else:
            g, l, f, _ = model.apply({"params": params}, images, prompts)
            new_vars = variables
        alpha = batch["mask"][:, 0] if batch["mask"].ndim == 4 else \
            batch["mask"]
        trimap = batch["trimap"]
        loss_dict = {}
        total = 0.0
        for name, loss_obj in criterion.items():
            if name.startswith("Global"):
                v = loss_obj(g, trimap)
            elif name.startswith("Local"):
                v = loss_obj(l, alpha, trimap)
            elif name.startswith("Composition"):
                v = loss_obj(images.astype(jnp.float32), alpha,
                             batch["fg_map"].astype(jnp.float32),
                             batch["bg_map"].astype(jnp.float32), f)
            else:
                v = loss_obj(f, alpha)
            v = v * ratios.get(name, 1.0)
            loss_dict[name] = v
            total = total + v
        loss_dict["loss"] = total
        return total, (new_vars, loss_dict)

    return loss_fn


def init_fn(model, config, rng):
    import jax.numpy as jnp
    s = model.image_size
    dummy = jnp.zeros((1, s, s, 3), jnp.float32)
    prompts = {"prompt_point": jnp.full((1, 1, 3), -1.0, jnp.float32),
               "prompt_box": None, "prompt_mask": None}
    variables = model.init({"params": rng}, dummy, prompts)
    params = variables.pop("params")
    return params, dict(variables)


def main():
    args = parse_args()
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        run_training)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)

    config = load_config_from_work_dir(args.work_dir, "train_config")
    return run_training(config, args.work_dir,
                        build_loss_fn=build_loss_fn,
                        init_fn=init_fn,
                        higher_is_better=False)


if __name__ == "__main__":
    main()
