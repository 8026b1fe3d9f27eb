"""SAM2 cold-compile attribution lab (VERDICT r3 next #3).

The production hiera-B+ T=4 bs1 train step cold-compiles in ~30 min over
the axon tunnel. This lab times trace (jaxpr), lowering (StableHLO) and
XLA compile separately for each slice of the graph so the blowup can be
located rather than guessed:

  encoder   — Hiera-B+ fwd+bwd over B*T frames (remat + flash kernels)
  track     — scan-over-frames fwd+bwd from PRE-ENCODED features
              (memory attention + decoder(s) + memory encoder)
  decode    — single-frame decoder fwd+bwd
  full      — the whole train step (bench_sam2_train.bench_sam2_train's
              graph)

Usage: python tools/perf/sam2_compile_lab.py [--parts encoder,track]
       [--frames 4] [--point-iters 2] [--no-scan]
Each part prints trace/lower/compile seconds + HLO instruction counts.
Run with JAX_COMPILATION_CACHE_DIR unset (a warm cache hides the cost).
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def _measure(name, fn, *args):
    import jax
    t0 = time.perf_counter()
    traced = jax.jit(fn).trace(*args)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered = traced.lower()
    t_lower = time.perf_counter() - t0
    try:
        hlo_lines = lowered.as_text().count("\n")
    except Exception:
        hlo_lines = -1
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    try:
        mem = compiled.memory_analysis()
        peak = getattr(mem, "temp_size_in_bytes", 0) / 1e9
    except Exception:
        peak = -1
    print(f"[{name}] trace {t_trace:.1f}s  lower {t_lower:.1f}s "
          f"(hlo {hlo_lines} lines)  COMPILE {t_compile:.1f}s  "
          f"temp {peak:.2f} GB", flush=True)
    return compiled


def build(frames=4, bs=1, point_iters=2, use_scan=True, use_flash=True):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation import (
        losses)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2 import (
        sam2_hiera_base_plus_video)
    from tools.train_video_interactive_segmentation_model import (
        build_loss_fn)

    model = sam2_hiera_base_plus_video(
        image_size=1024, use_gradient_checkpoint=True, use_scan=use_scan,
        use_high_res_features=True, use_flash_attention=use_flash,
        memory_cond_slots=2, dtype=jnp.bfloat16)

    class cfg:
        train_criterion = losses.SAM2Loss()
        use_amp = True
        decoder_point_iters = point_iters

    loss_fn = build_loss_fn(model, cfg)
    b, t = bs, frames
    rs = np.random.RandomState(0)
    rq = 1024 // 4
    batch = {
        "image": jnp.asarray(rs.rand(b, t, 1024, 1024, 3), jnp.float32),
        "mask": jnp.zeros((b, t, 1024, 1024)).at[:, :, 300:700,
                                                 300:700].set(1.0),
        "prompt_point": jnp.full((b, t, 2, 3), -1.0).at[:, 0, 0].set(
            jnp.asarray([512.0, 512.0, 1.0])),
        "prompt_box": jnp.zeros((b, t, 4)),
        "prompt_box_valid": jnp.zeros((b, t)),
        "prompt_mask": jnp.zeros((b, t, rq, rq, 1)),
        "prompt_mask_valid": jnp.zeros((b, t)),
        "is_cond_frame": jnp.zeros((b, t)).at[:, 0].set(1.0),
        "is_iter_frame": jnp.zeros((b, t)).at[:, 1].set(1.0),
    }
    # eval_shape'd init: a REAL init would execute (and therefore compile)
    # the full T-frame graph before any part is measured — zero trees of
    # the right shapes are enough for compile-time attribution
    shapes = jax.eval_shape(
        lambda rng: model.init(
            rng, batch["image"],
            {k: batch[k] for k in ("prompt_point", "prompt_box",
                                   "prompt_box_valid", "prompt_mask",
                                   "prompt_mask_valid")},
            is_cond_frame=batch["is_cond_frame"][0]),
        jax.random.PRNGKey(0))
    variables = dict(jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))
    params = variables.pop("params")
    return model, loss_fn, params, variables, batch


def main():
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser()
    p.add_argument("--parts", default="encoder,track,decode,full")
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--point-iters", type=int, default=2)
    p.add_argument("--no-scan", action="store_true")
    p.add_argument("--xla", action="store_true")
    args = p.parse_args()
    parts = set(args.parts.split(","))

    model, loss_fn, params, variables, batch = build(
        frames=args.frames, bs=args.bs, point_iters=args.point_iters,
        use_scan=not args.no_scan, use_flash=not args.xla)
    b, t = batch["image"].shape[:2]

    if "encoder" in parts:
        x = batch["image"].reshape(b * t, 1024, 1024, 3)

        def enc_loss(params, x):
            out = model.apply({"params": params, **variables}, x,
                              method="encode_frame")
            return sum((o.astype(jnp.float32) ** 2).mean()
                       for o in jax.tree.leaves(out))
        _measure("encoder fwd+bwd", jax.value_and_grad(enc_loss), params, x)

    if "decode" in parts or "track" in parts:
        s16 = 64
        feat = jnp.zeros((b, s16, s16, model.fpn_planes), jnp.float32)
        pos = jnp.zeros((b, s16, s16, model.fpn_planes), jnp.float32)
        hr = (jnp.zeros((b, 256, 256, model.fpn_planes), jnp.float32),
              jnp.zeros((b, 128, 128, model.fpn_planes), jnp.float32))

    if "decode" in parts:
        prompts1 = {k: batch[k][:, 0] for k in
                    ("prompt_point", "prompt_box", "prompt_box_valid",
                     "prompt_mask", "prompt_mask_valid")}

        def dec_loss(params, feat):
            outs, _ = model.apply(
                {"params": params, **variables}, feat, prompts1,
                highres=hr, method="start_track")
            return sum((o.astype(jnp.float32) ** 2).mean() for o in outs)
        _measure("decode(start_track) fwd+bwd", jax.value_and_grad(dec_loss),
                 params, feat)

    if "track" in parts:
        featT = jnp.zeros((b, t, s16, s16, model.fpn_planes), jnp.float32)
        posT = jnp.zeros((b, t, s16, s16, model.fpn_planes), jnp.float32)
        hr4T = jnp.zeros((b, t, 256, 256, model.fpn_planes), jnp.float32)
        hr8T = jnp.zeros((b, t, 128, 128, model.fpn_planes), jnp.float32)
        prompts = {k: batch[k] for k in
                   ("prompt_point", "prompt_box", "prompt_box_valid",
                    "prompt_mask", "prompt_mask_valid")}

        def track_loss(params, featT):
            masks, ious, obj = model.apply(
                {"params": params, **variables}, featT, posT, hr4T, hr8T,
                prompts, gt_masks=batch["mask"],
                is_cond_frame=batch["is_cond_frame"][0],
                is_iter_frame=batch["is_iter_frame"][0],
                rng=jax.random.PRNGKey(1),
                point_iters=args.point_iters,
                method="track_from_features")
            return sum((o.astype(jnp.float32) ** 2).mean()
                       for o in (masks, ious, obj))
        _measure("track-from-features fwd+bwd",
                 jax.value_and_grad(track_loss), params, featT)

    if "full" in parts:
        def step(params, batch):
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, variables, batch,
                                       jax.random.PRNGKey(1))
            return loss, grads
        _measure("full train step", step, params, batch)


if __name__ == "__main__":
    main()
