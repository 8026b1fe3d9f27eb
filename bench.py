"""Benchmark: ViT-B/16 ImageNet-eval images/sec on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline is measured throughput divided by the reference stack's
throughput on its published hardware (RTX 4090D, fp16 autocast ViT-B/16
inference at bs256 ≈ 1400 images/s — measured class of number for
torch 2.5 + cuDNN; the reference publishes no throughput, see BASELINE.md,
so this constant is our fixed comparison anchor and stays unchanged across
rounds so the trend is meaningful).
"""

import json
import time

REFERENCE_VIT_B_EVAL_IPS = 1400.0


def main():
    import jax
    import jax.numpy as jnp

    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model

    batch_size = 128
    # bf16 softmax: +45% serving throughput on v5e (see
    # models/common.py::MultiHeadSelfAttention)
    model = backbones.vit_base_patch16(num_classes=1000,
                                       dtype=jnp.bfloat16,
                                       softmax_dtype=jnp.bfloat16)
    params, variables = init_model(model, (2, 224, 224, 3),
                                   jax.random.PRNGKey(0))

    iters = 20

    @jax.jit
    def forward_chain(params, images):
        # serial dependency chain: iteration i's input depends on i-1's
        # output, so the compiler cannot overlap/deduplicate the iterations
        # and wall-clock measures `iters` full forward passes.
        def body(_, carry):
            acc, imgs = carry
            out = model.apply({"params": params, **variables}, imgs,
                              train=False)
            acc = acc + out.astype(jnp.float32).sum()
            imgs = images * (1.0 + 1e-9 * acc.astype(images.dtype))
            return acc, imgs

        acc, _ = jax.lax.fori_loop(0, iters, body,
                                   (jnp.zeros((), jnp.float32), images))
        return acc

    images = jnp.zeros((batch_size, 224, 224, 3), jnp.bfloat16)
    # NOTE: on the axon tunnel platform block_until_ready() does not block;
    # timing must materialize the value to host (float()).
    float(forward_chain(params, images))  # compile + warmup

    t0 = time.perf_counter()
    float(forward_chain(params, images))
    dt = time.perf_counter() - t0
    ips = batch_size * iters / dt

    print(json.dumps({
        "metric": "vit_b_16_imagenet_eval_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REFERENCE_VIT_B_EVAL_IPS, 3),
    }))


if __name__ == "__main__":
    main()
