"""SAM-B train-step component timing on TPU.

Whole-step MFU (3x-fwd model-flops accounting) is ~0.12 at bs2 even
with the flash kernels — roofline for 3x 0.96 TFLOP/img would be
~29 ms/img but the measured step is ~125 ms/img. This lab splits the
step into encoder fwd / encoder fwd+bwd(remat) / prompt+decoder+loss
so the gap can be attributed before optimizing.

Usage (persistent process, tunnel warmup ~1-3 min):
    python tools/perf/sam_lab.py [--bs 2] [--policy dots_saveable]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lab import time_apply, warmup  # noqa: E402  (same dir)

PEAK = 197e12
SAM_B_FWD_FLOPS = 0.96e12  # per 1024^2 image, 2-flops-per-MAC


def build(bs=2, use_flash=True, remat_policy=None, remat=True):
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation import (
        losses)
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.sam import (
        SAM)

    model = SAM(image_size=1024, use_gradient_checkpoint=remat,
                remat_policy=remat_policy,
                use_flash_attention=use_flash, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(bs, 1024, 1024, 3), jnp.float32)
    gt = jnp.zeros((bs, 1, 1024, 1024)).at[:, :, 300:700, 300:700].set(1.0)
    prompts = {
        "prompt_point": jnp.asarray(
            np.tile([[[512.0, 512.0, 1.0]]], (bs, 1, 1)), jnp.float32),
        "prompt_box": None, "prompt_mask": None,
    }
    criterion = losses.SAMLoss()
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, prompts)
    return model, criterion, variables, images, gt, prompts


def blocks(bs=2, use_flash=True):
    """Per-block-type forward timing: 1 windowed vs 1 global SAMBlock
    at the production [bs, 64, 64, 768] stream, plus patch embed+neck."""
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.image_encoder import (
        SAMBlock)

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(bs, 64, 64, 768), jnp.bfloat16)

    # windowed block FLOPs (2-per-MAC): qkv+proj+mlp on 4096 tokens =
    # 2*4096*768*(2304+768+3072+3072... fc1 768*3072 + fc2 3072*768)
    dense = 2 * 4096 * (768 * 2304 + 768 * 768 + 768 * 3072 * 2)
    attn_win = 2 * 2 * (196 ** 2) * 64 * 12 * 25  # 25 windows of 196
    attn_glob = 2 * 2 * (4096 ** 2) * 64 * 12
    for label, ws, flash, fl in [
            ("windowed block", 14, False, dense + attn_win),
            ("global block (flash)", 0, use_flash, dense + attn_glob),
            ("global block (xla)", 0, False, dense + attn_glob)]:
        m = SAMBlock(head_nums=12, input_size=(64, 64), window_size=ws,
                     use_flash=flash, dtype=jnp.bfloat16)
        v = m.init(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda v, x, m=m: m.apply(v, x))
        time_apply(f, (v, x), label=f"{label} fwd bs{bs}",
                   flops=fl * bs)


def blocks_fine(bs=2):
    """Windowed-block component attribution: where do the ~7 ms/block go?
    Times the pieces of one windowed SAMBlock fwd at the production
    [bs, 64, 64, 768] stream: full block / attention module only /
    attention with rel-pos disabled / qkv+proj+mlp dense-only / the
    window partition+unpartition round trip by itself."""
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.image_encoder import (
        SAMAttention, SAMBlock, window_partition, window_unpartition)

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(bs, 64, 64, 768), jnp.bfloat16)
    xw = jnp.asarray(rs.rand(bs * 25, 14, 14, 768), jnp.bfloat16)

    m = SAMBlock(head_nums=12, input_size=(64, 64), window_size=14,
                 dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)
    time_apply(jax.jit(lambda v, x: m.apply(v, x)), (v, x),
               label=f"windowed block fwd bs{bs}")

    a = SAMAttention(head_nums=12, input_size=(14, 14), dtype=jnp.bfloat16)
    va = a.init(jax.random.PRNGKey(0), xw)
    time_apply(jax.jit(lambda v, x: a.apply(v, x)), (va, xw),
               label=f"attn module (rel-pos) [{bs * 25}w x 196] bs{bs}")

    def plain_attn(v, x):
        # same qkv/proj denses, rel-pos einsums and bias dropped: the
        # delta vs the module is the full rel-pos bill (table gather +
        # fp32 rq einsums + biased kernel vs plain softmax)
        p = v["params"]
        bw, h, w, c = x.shape
        n, nh, hd = h * w, 12, c // 12
        qkv = (x.reshape(bw, n, c) @ p["qkv"]["kernel"]
               + p["qkv"]["bias"]).reshape(bw, n, 3, nh, hd)
        q, k, vv = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, vv)
        o = o.transpose(0, 2, 1, 3).reshape(bw, h, w, c)
        return o @ p["proj"]["kernel"] + p["proj"]["bias"]

    time_apply(jax.jit(plain_attn), (va, xw),
               label=f"attn plain-xla (no rel) [{bs * 25}w x 196] bs{bs}")

    def roundtrip(x):
        w, pad_hw = window_partition(x, 14)
        return window_unpartition(w * 1.000001, 14, pad_hw, (64, 64))
    time_apply(jax.jit(roundtrip), (x,), label=f"win partition rt bs{bs}")

    def dense_only(v, x):
        b, h, w_, c = x.shape
        p = v["params"]
        y = x.reshape(b, h * w_, c)
        qkv = y @ p["attn"]["qkv"]["kernel"]
        o = (qkv[..., :c] @ p["attn"]["proj"]["kernel"]
             + p["attn"]["proj"]["bias"])
        h1 = jax.nn.gelu(o @ p["lin1"]["kernel"] + p["lin1"]["bias"],
                         approximate=False)
        return h1 @ p["lin2"]["kernel"] + p["lin2"]["bias"]

    time_apply(jax.jit(dense_only), (v, x),
               label=f"dense-only (qkv+proj+mlp) bs{bs}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=2)
    p.add_argument("--policy", default=None)
    p.add_argument("--no-remat", action="store_true",
                   help="disable block checkpointing (round-4 headline "
                        "config: flash kernels freed the HBM remat bought)")
    p.add_argument("--xla", action="store_true")
    p.add_argument("--blocks", action="store_true",
                   help="per-block-type forward breakdown only")
    p.add_argument("--blocks-fine", action="store_true",
                   help="windowed-block component attribution")
    args = p.parse_args()
    bs = args.bs

    warmup()
    if args.blocks:
        blocks(bs=bs, use_flash=not args.xla)
        return
    if args.blocks_fine:
        blocks_fine(bs=bs)
        return
    model, criterion, variables, images, gt, prompts = build(
        bs=bs, use_flash=not args.xla, remat_policy=args.policy,
        remat=not args.no_remat)

    # 1. encoder fwd only
    enc_fwd = jax.jit(lambda v, x: model.apply(
        v, x, method="forward_image_encoder"))
    dt = time_apply(enc_fwd, (variables, images), label=f"enc fwd bs{bs}",
                    flops=SAM_B_FWD_FLOPS * bs)

    # 2. encoder fwd+bwd (remat) — grad wrt params of sum(emb^2)
    @jax.jit
    def enc_bwd(v, x):
        def f(v):
            emb = model.apply(v, x, method="forward_image_encoder")
            return (emb.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(f)(v)
    dt = time_apply(enc_bwd, (variables, images),
                    label=f"enc fwd+bwd bs{bs}",
                    flops=3.0 * SAM_B_FWD_FLOPS * bs)

    # 3. decoder+loss fwd+bwd at fixed embeddings
    emb = enc_fwd(variables, images)
    emb = jax.tree.map(lambda a: a, emb)

    @jax.jit
    def dec_bwd(v, emb):
        def f(v):
            m, i = model.apply(v, emb, prompts,
                               method="forward_prompt_encoder_mask_decoder")
            return sum(criterion(([m], [i]), gt).values())
        return jax.value_and_grad(f)(v)
    time_apply(dec_bwd, (variables, emb), label=f"dec+loss fwd+bwd bs{bs}")

    # 4. full step
    @jax.jit
    def step(v, x):
        def f(v):
            m, i = model.apply(v, x, prompts)
            return sum(criterion(([m], [i]), gt).values())
        return jax.value_and_grad(f)(v)
    dt = time_apply(step, (variables, images), label=f"full step bs{bs}",
                    flops=3.0 * SAM_B_FWD_FLOPS * bs)
    print(f"full-step {bs/dt:.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
