"""SAM-B full-train-step benchmark (separate from bench.py to keep the
driver's bench fast): fwd+bwd with remat at 1024^2 using the
decomposed-rel-pos pallas flash kernel.

Measured on v5e (bs2): 274.6 ms/step with flash vs 665.3 ms with XLA
attention — 2.42x end-to-end (run with --xla to reproduce the baseline).
"""

import argparse
import time


def bench_sam_train(use_flash=True):
    """SAM-B 1024^2 full train step (fwd+bwd, remat, bf16) with the
    decomposed-rel-pos pallas flash kernel — the production
    sam_b_training path. Measured 274.6 ms vs 665.3 ms with XLA
    attention (2.42x end-to-end)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation import (
        losses)
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.sam import (
        SAM)

    bs = 2
    model = SAM(image_size=1024, use_gradient_checkpoint=True,
                use_flash_attention=use_flash, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(bs, 1024, 1024, 3), jnp.float32)
    gt = jnp.zeros((bs, 1, 1024, 1024)).at[:, :, 300:700,
                                           300:700].set(1.0)
    prompts = {
        "prompt_point": jnp.asarray(
            np.tile([[[512.0, 512.0, 1.0]]], (bs, 1, 1)), jnp.float32),
        "prompt_box": None, "prompt_mask": None,
    }
    criterion = losses.SAMLoss()
    variables = model.init({"params": jax.random.PRNGKey(0)}, images,
                           prompts)

    @jax.jit
    def step(v, images):
        def loss_fn(v):
            masks, ious = model.apply(v, images, prompts)
            return sum(criterion(([masks], [ious]), gt).values())
        return jax.value_and_grad(loss_fn)(v)

    loss, grads = step(variables, images)
    float(loss)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = step(variables, images)
    float(loss)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--xla", action="store_true",
                   help="disable the pallas kernel (XLA attention baseline)")
    args = p.parse_args()
    ms = bench_sam_train(use_flash=not args.xla)
    print(f"SAM-B train fwd+bwd bs2 "
          f"[{'xla' if args.xla else 'flash'}]: {ms:.1f} ms/step")


if __name__ == "__main__":
    main()
