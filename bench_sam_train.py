"""SAM-B full-train-step benchmark (separate from bench.py to keep the
driver's bench fast): fwd+bwd with remat at 1024^2 using the
decomposed-rel-pos pallas flash kernel.

Measured on v5e (bs2), round-3 progression:
  274.6 ms/step  flash attention, pre einsum-patch-embed
  250.9 ms/step  + einsum patch embed (full-lane MXU patchify)
  171.3 ms/step  + one-hot rel-pos bias expansion and the fused biased
                 VMEM kernel on the 8 windowed blocks (the 6-D broadcast
                 bias and its VJP reduction were the bottleneck)
  665.3 ms/step  --xla attention baseline (3.9x vs current flash path)

Round-5 (bs4, NO remat — the headline config):
  487.7 ms/step  bs8 no-remat (HBM pressure regresses per-image rate)
  376.6 ms/step  bs6 no-remat (same)
  229.4 ms/step  bs4 no-remat round-4 shipped config   (mfu 0.2553)
  188.8 ms/step  + zero-copy packed windowed kernel    (mfu 0.3098)
                 (fused_attention_relwin_dense: qkv Dense output feeds
                 the kernel untouched; the [B,N,3,H,D]<->[3,B,H,N,D]
                 transposes + rel reshapes were ~35 ms/step of device
                 trace, tools/perf/sam_trace.py)
`--policy dots_saveable` keeps every dot output in the remat block
resident (qkv+proj+mlp = 6912 floats/token = ~0.68 GB/img for SAM-B);
it bought +4.8% on the 250.9 baseline but only 171.3 -> 169.1 once the
fused kernels shrank the recompute it skips — the default stays full
recompute. bs4: 333.4 ms/step = 12.0 img/s (encoder fwd reaches 0.230
MFU at bs4 vs 0.127 at bs2 — fixed costs amortize; production configs
run >=bs8 per device).
"""

import argparse
import time


def bench_sam_train(use_flash=True, remat_policy=None, bs=2,
                    use_remat=True, iters=5):
    """SAM-B 1024^2 full train step (fwd+bwd, bf16) with the
    decomposed-rel-pos pallas flash kernel — the production
    sam_b_training path. See module docstring for the measured table.
    use_remat=False turns block checkpointing off entirely (the flash
    kernels free enough HBM that moderate batches fit full-activation)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation import (
        losses)
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.sam import (
        SAM)

    model = SAM(image_size=1024, use_gradient_checkpoint=use_remat,
                remat_policy=remat_policy,
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
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = step(variables, images)
    float(loss)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--xla", action="store_true",
                   help="disable the pallas kernel (XLA attention baseline)")
    p.add_argument("--policy", default=None,
                   help="named remat policy (ops/remat.py), e.g. "
                        "dots_saveable")
    args = p.parse_args()
    ms = bench_sam_train(use_flash=not args.xla, remat_policy=args.policy)
    print(f"SAM-B train fwd+bwd bs2 "
          f"[{'xla' if args.xla else 'flash'}"
          f"{', ' + args.policy if args.policy else ''}]: "
          f"{ms:.1f} ms/step")


if __name__ == "__main__":
    main()
