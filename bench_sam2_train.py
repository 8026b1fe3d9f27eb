"""SAM2 (hiera-B+ video) full-train-step benchmark at the production
1024^2 shape: condition-frame recipe, 2-point-iteration, `nn.scan`
tracked frames, flash memory attention — the 14.1 stage-2 training path
(bs1, T=4 on one chip; the real config runs bs8 T=8 across a mesh).

Measured on v5e: 597.3 ms/step bs1 T4 = 6.70 frames/s with flash memory
attention (first compile of the scan-over-frames remat graph over the
remote tunnel is ~30 min; set JAX_COMPILATION_CACHE_DIR).
Encoder probe (--encoder, 4 frames): Hiera-B+ fwd 140.5 ms XLA ->
101.4 ms with flash global blocks (1.39x); remat fwd+bwd 454.8 ->
361.3 ms (1.26x) — the encoder is ~76% of the full step, so the
global-block kernel is worth ~93 ms/step.

Usage: python bench_sam2_train.py [--xla] [--frames 4]
"""

import argparse
import functools
import time


def bench_sam2_train(use_flash=True, frames=4, bs=1, use_remat=True):
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
        image_size=1024, use_gradient_checkpoint=use_remat, use_scan=True,
        use_high_res_features=True, use_flash_attention=use_flash,
        head_dim_padding=64 if use_flash else 0,
        memory_cond_slots=2, dtype=jnp.bfloat16)

    class cfg:
        train_criterion = losses.SAM2Loss()
        use_amp = True
        decoder_point_iters = 2

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
    variables = dict(model.init(
        jax.random.PRNGKey(0), batch["image"],
        {k: batch[k] for k in ("prompt_point", "prompt_box",
                               "prompt_box_valid", "prompt_mask",
                               "prompt_mask_valid")},
        is_cond_frame=batch["is_cond_frame"][0]))
    params = variables.pop("params")

    # donate params: grads share the param tree structure so XLA reuses
    # the buffers (the production engine step donates too, engine.py)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(params, variables, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, variables, batch, jax.random.PRNGKey(1))
        return loss, grads

    tc = time.perf_counter()
    loss, grads = step(params, variables, batch)
    float(loss)
    compile_s = time.perf_counter() - tc  # trace+lower+compile+1st step
    iters = 5
    # rebind the donated argument each iteration (grads share the param
    # tree, so the timing loop is a realistic donated update chain)
    params = grads
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = step(params, variables, batch)
        params = grads
    float(loss)
    return (time.perf_counter() - t0) / iters * 1000, compile_s


def bench_encoder(frames=4, bs=1, use_flash=True, bwd_only=False):
    """Hiera-B+ encoder forward over the T flattened frames (fwd and
    remat fwd+bwd) — attribution probe for the full-step number.
    use_flash routes the 3 global-attention blocks (4096 tokens, d=56
    zero-padded to 64) through the fused pallas kernel. bwd_only skips
    the fwd-only timing (halves cold compiles for the driver bench,
    which only consumes the fwd+bwd ratio)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2 import (
        sam2_hiera_base_plus_video)

    model = sam2_hiera_base_plus_video(
        image_size=1024, use_gradient_checkpoint=True, use_scan=True,
        use_high_res_features=True, use_flash_attention=use_flash,
        head_dim_padding=64 if use_flash else 0,
        memory_cond_slots=2, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(bs * frames, 1024, 1024, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1],
                           method="encode_frame")

    fwd = jax.jit(lambda v, x: model.apply(v, x, method="encode_frame"))

    @jax.jit
    def bwd(v, x):
        def f(v):
            out = model.apply(v, x, method="encode_frame")
            return sum((o.astype(jnp.float32) ** 2).mean()
                       for o in jax.tree.leaves(out))
        return jax.value_and_grad(f)(v)

    times = {}
    for label, fn in (("enc fwd", fwd), ("enc fwd+bwd", bwd)):
        out = fn(variables, x)
        float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(variables, x)
        float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
        dt = (time.perf_counter() - t0) / iters * 1000
        times[label] = dt
        print(f"SAM2 {label} [{bs * frames} frames]: {dt:.1f} ms",
              flush=True)
    return times


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--xla", action="store_true")
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--encoder", action="store_true",
                   help="encoder-only attribution probe")
    p.add_argument("--no-remat", action="store_true",
                   help="disable Hiera block checkpointing")
    args = p.parse_args()
    if args.encoder:
        bench_encoder(frames=args.frames, bs=args.bs,
                      use_flash=not args.xla)
        return
    ms, compile_s = bench_sam2_train(use_flash=not args.xla,
                                     frames=args.frames, bs=args.bs,
                                     use_remat=not args.no_remat)
    fps = args.bs * args.frames / (ms / 1000.0)
    print(f"SAM2 hiera-B+ train bs{args.bs} T{args.frames} "
          f"[{'xla' if args.xla else 'flash'}]: {ms:.1f} ms/step "
          f"= {fps:.2f} frames/s (compile+1st step {compile_s:.0f} s)",
          flush=True)


if __name__ == "__main__":
    main()
