"""SAM2 video interactive segmentation training entry.

Parity with /root/reference/tools/
train_video_interactive_segmentation_model.py +
tools/video_interactive_segmentation_scripts.py: memory-conditioned
tracking over T frames with frame-0 prompts, SAM2Loss per frame. The
staged frame recipes (1 -> 8 -> 16, RESULTS.md:485-493) are expressed as
separate work dirs whose configs differ only in `frame_nums` and
`trained_model_path`.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(
        description="train video interactive segmentation (SAM2) model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def build_loss_fn(model, config):
    import jax
    import jax.numpy as jnp

    criterion = config.train_criterion
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32
    # point-iteration decode count on flagged frames (reference
    # sam2video_train.py:840-911); 0 disables refinement
    point_iters = getattr(config, "decoder_point_iters", 0)

    def loss_fn(params, variables, batch, rng):
        images = batch["image"].astype(compute_dtype)  # [B,T,H,W,3]
        per_frame = batch["prompt_point"].ndim == 4  # [B,T,P,3]
        if per_frame:
            # condition-frame recipe (SAM2VideoBatchCollater): per-frame
            # prompts + cond/iter flag vectors + in-graph error clicks
            prompts = {
                k: batch[k].astype(jnp.float32)
                for k in ("prompt_point", "prompt_box", "prompt_box_valid",
                          "prompt_mask", "prompt_mask_valid")
            }
            kwargs = dict(
                gt_masks=batch["mask"].astype(jnp.float32),
                is_cond_frame=batch["is_cond_frame"].max(axis=0),
                is_iter_frame=batch["is_iter_frame"].max(axis=0),
                rng=jax.random.fold_in(rng, 3),
                point_iters=point_iters)
        else:
            prompts = {
                "prompt_point": batch["prompt_point"].astype(jnp.float32),
                "prompt_box": None,
                "prompt_mask": None,
            }
            kwargs = {}
        mutable = list(variables.keys())
        if mutable:
            preds, new_vars = model.apply({"params": params, **variables},
                                          images, prompts, mutable=mutable,
                                          **kwargs)
            new_vars = dict(new_vars)
        else:
            preds = model.apply({"params": params}, images, prompts,
                                **kwargs)
            new_vars = variables
        loss_dict = criterion(preds, batch["mask"])
        total = sum(loss_dict.values())
        loss_dict = dict(loss_dict)
        loss_dict["loss"] = total
        return total, (new_vars, loss_dict)

    return loss_fn


def build_split_grad_fn(model, config):
    """Three-stage SAM2 train gradients: encoder fwd | track+loss grads |
    encoder VJP — numerically the fused `jax.value_and_grad(loss_fn)` (the
    encoder backward recomputes the forward either way under full-block
    remat), but compiled as three XLA programs. The fused T-frame graph
    compiles superlinearly: at hiera-B+ bs1 T4 the parts compile in
    ~6 min total vs ~30 min fused (tools/perf/sam2_compile_lab.py).

    Returns grad_step(params, variables, batch, rng) -> (loss_dict,
    grads). Requires the per-frame condition-recipe batch layout and a
    model without mutable collections beyond constants (the hiera
    configs)."""
    import jax
    import jax.numpy as jnp

    criterion = config.train_criterion
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32
    point_iters = getattr(config, "decoder_point_iters", 0)

    def _encode(params, variables, images):
        return model.apply({"params": params, **variables}, images,
                           method="encode_frames_batch")

    def _track_loss(params, feats, variables, batch, rng):
        feat16, pos16, hr4, hr8 = feats
        prompts = {
            k: batch[k].astype(jnp.float32)
            for k in ("prompt_point", "prompt_box", "prompt_box_valid",
                      "prompt_mask", "prompt_mask_valid")
        }
        preds = model.apply(
            {"params": params, **variables}, feat16, pos16, hr4, hr8,
            prompts, gt_masks=batch["mask"].astype(jnp.float32),
            is_cond_frame=batch["is_cond_frame"].max(axis=0),
            is_iter_frame=batch["is_iter_frame"].max(axis=0),
            rng=jax.random.fold_in(rng, 3), point_iters=point_iters,
            method="track_from_features")
        loss_dict = criterion(preds, batch["mask"])
        total = sum(loss_dict.values())
        loss_dict = dict(loss_dict)
        loss_dict["loss"] = total
        return total, loss_dict

    enc_fwd = jax.jit(_encode)
    track_grad = jax.jit(jax.value_and_grad(_track_loss, argnums=(0, 1),
                                            has_aux=True))

    def _enc_vjp(params, variables, images, dfeats):
        _, vjp = jax.vjp(lambda p: _encode(p, variables, images), params)
        return vjp(dfeats)[0]

    enc_bwd = jax.jit(_enc_vjp)

    def grad_step(params, variables, batch, rng):
        images = batch["image"].astype(compute_dtype)
        feats = enc_fwd(params, variables, images)
        (_, loss_dict), (g_track, dfeats) = track_grad(
            params, feats, variables, batch, rng)
        # hr* may be None: zero-cotangent for absent features
        dfeats = tuple(
            jnp.zeros_like(f) if d is None and f is not None else d
            for d, f in zip(dfeats, feats))
        g_enc = enc_bwd(params, variables, images, dfeats)
        grads = jax.tree.map(jnp.add, g_track, g_enc)
        return loss_dict, grads

    return grad_step


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
