"""SAM2 video interactive matting training entry.

Parity with /root/reference/tools/train_video_interactive_matting_model.py
+ tools/video_interactive_matting_scripts.py: memory-conditioned tracking
over T frames with frame-0 prompts; SAM2MattingLoss (trimap/alpha family)
per frame on the matting triple.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(
        description="train video interactive matting (SAM2) model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def build_loss_fn(model, config):
    import jax
    import jax.numpy as jnp

    criterion = config.train_criterion
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    def loss_fn(params, variables, batch, rng):
        images = batch["image"].astype(compute_dtype)  # [B,T,H,W,3]
        per_frame = batch["prompt_point"].ndim == 4  # [B,T,P,3]
        if per_frame:
            # condition-frame matting recipe (SAM2VideoMattingBatchCollater)
            prompts = {
                k: batch[k].astype(jnp.float32)
                for k in ("prompt_point", "prompt_box", "prompt_box_valid",
                          "prompt_mask", "prompt_mask_valid")
            }
            kwargs = {"is_cond_frame": batch["is_cond_frame"].max(axis=0)}
        else:
            prompts = {
                "prompt_point": batch["prompt_point"].astype(jnp.float32),
                "prompt_box": None,
                "prompt_mask": None,
            }
            kwargs = {}
        mutable = list(variables.keys())
        if mutable:
            out, new_vars = model.apply({"params": params, **variables},
                                        images, prompts, mutable=mutable,
                                        **kwargs)
            new_vars = dict(new_vars)
        else:
            out = model.apply({"params": params}, images, prompts,
                              **kwargs)
            new_vars = variables
        g, l, f = out[0], out[1], out[2]
        loss_dict = criterion((g, l, f), batch["alpha"], batch["trimap"])
        total = loss_dict.pop("loss")
        loss_dict["loss"] = total
        return total, (new_vars, loss_dict)

    return loss_fn


def init_fn(model, config, rng):
    import jax.numpy as jnp

    s = model.image_size
    t = getattr(config, "frame_nums", 2)
    dummy = jnp.zeros((1, min(t, 2), s, s, 3), jnp.float32)
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
