"""SAM interactive segmentation training entry.

Parity with /root/reference/tools/train_interactive_segmentation_model.py +
tools/interactive_segmentation_scripts.py:274-461: one image-encoder pass
per step, 1 + decoder_iters prompt-decoder passes with iterative click
re-sampling from the FP/FN error region of the previous best mask and the
previous mask logits fed back as the mask prompt, SAMLoss over all
iterations.

TPU re-design (SURVEY.md §7 hard parts): the data-dependent point
re-sampling becomes a Gumbel-max draw over the error-region mask inside the
jitted step — static iteration count, fixed prompt shapes, no host
round-trips. The reference's manual per-param grad all-reduce
(scripts :442-461, needed because DDP hooks are bypassed) disappears: SPMD
grads of the global-mean loss all-reduce automatically.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(
        description="train interactive segmentation (SAM) model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def build_loss_fn(model, config):
    import jax
    import jax.numpy as jnp

    criterion = config.train_criterion
    decoder_iters = getattr(config, "decoder_iters", 4)
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32
    image_size = model.image_size
    quarter = image_size // 4

    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.error_click import (
        sample_error_point)

    def loss_fn(params, variables, batch, rng):
        images = batch["image"].astype(compute_dtype)
        gt = batch["mask"].astype(jnp.float32)  # [B,1,H,W]
        b = images.shape[0]
        mutable = list(variables.keys())

        def apply(method, *args, **kw):
            if mutable:
                out, _ = model.apply({"params": params, **variables}, *args,
                                     method=method, mutable=mutable, **kw)
                return out
            return model.apply({"params": params}, *args, method=method,
                               **kw)

        embeddings = apply(model.forward_image_encoder, images)

        prompts = {
            "prompt_point": batch["prompt_point"].astype(jnp.float32),
            "prompt_box": batch["prompt_box"].astype(jnp.float32),
            "prompt_box_valid": batch["prompt_box_valid"],
            "prompt_mask": batch["prompt_mask"].astype(jnp.float32),
            "prompt_mask_valid": batch["prompt_mask_valid"],
        }
        masks, ious = apply(model.forward_prompt_encoder_mask_decoder,
                            embeddings, prompts)
        all_masks = [masks]
        all_ious = [ious]

        points = prompts["prompt_point"]
        for it in range(decoder_iters):
            # best mask by predicted iou, used for error-driven clicks and
            # as the next mask prompt (scripts :231-271)
            best = jnp.argmax(all_ious[-1], axis=-1)
            bidx = jnp.arange(b)
            best_logits = all_masks[-1][bidx, best]  # [B,H,W]
            pred_bin = (best_logits > 0).astype(jnp.float32)

            rngs = jax.random.split(jax.random.fold_in(rng, it), b)
            new_points = jax.vmap(sample_error_point)(rngs, pred_bin,
                                                      gt[:, 0])
            points = jnp.concatenate([points, new_points[:, None, :]],
                                     axis=1)
            prompt_mask = jax.image.resize(
                best_logits[:, :, :, None], (b, quarter, quarter, 1),
                "bilinear")
            iter_prompts = {
                "prompt_point": points,
                "prompt_box": prompts["prompt_box"],
                "prompt_box_valid": prompts["prompt_box_valid"],
                "prompt_mask": prompt_mask,
                "prompt_mask_valid": jnp.ones((b,), jnp.float32),
            }
            masks, ious = apply(model.forward_prompt_encoder_mask_decoder,
                                embeddings, iter_prompts)
            all_masks.append(masks)
            all_ious.append(ious)

        loss_dict = criterion((all_masks, all_ious), gt)
        total = sum(loss_dict.values())
        loss_dict = dict(loss_dict)
        loss_dict["loss"] = total

        # batch_stats: SAM has none (LayerNorm only); keep variables as-is
        return total, (variables, loss_dict)

    return loss_fn


def init_fn(model, config, rng):
    import jax.numpy as jnp

    s = model.image_size
    dummy_images = jnp.zeros((1, s, s, 3), jnp.float32)
    dummy_prompts = {
        "prompt_point": jnp.full((1, 2, 3), -1.0, jnp.float32),
        "prompt_box": jnp.zeros((1, 4), jnp.float32),
        "prompt_box_valid": jnp.zeros((1,), jnp.float32),
        "prompt_mask": jnp.zeros((1, s // 4, s // 4, 1), jnp.float32),
        "prompt_mask_valid": jnp.zeros((1,), jnp.float32),
    }
    import jax
    variables = model.init({"params": rng}, dummy_images, dummy_prompts)
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
