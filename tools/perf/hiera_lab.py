"""Hiera-B+ encoder per-block-type attribution at the production 1024^2
shape (4 frames, bf16) — where do the 101 ms fwd / 361 ms fwd+bwd go?

Times each MultiScaleBlock variant standalone (python loop, one host
fetch; ~1.4 ms/dispatch tunnel overhead) and scales by block count.
Block inventory for hiera-B+ (embedding 112, heads 2, blocks (2,3,16,3),
windows (8,4,14,7), globals (12,16,20)): 2x stage1 @256^2 win8,
1x pool->stage2, 2x stage2 @128^2 win4, 1x pool->stage3, 12x stage3
windowed @64^2 win14 (padded 70), 3x stage3 global, 1x pool->stage4,
2x stage4 @32^2 win7 (padded 35).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
    python tools/perf/hiera_lab.py [--frames 4] [--flash] [--bwd]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def time_block(planes, heads, pool, win, shape, use_flash, bwd, iters=20):
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.image_encoder import (
        MultiScaleBlock)

    block = MultiScaleBlock(planes, heads, 4.0, pool, win,
                            use_flash, jnp.bfloat16)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape), jnp.bfloat16)
    variables = block.init(jax.random.PRNGKey(0), x)

    if bwd:
        @jax.jit
        def fn(v, x):
            def f(v, x):
                return (block.apply(v, x).astype(jnp.float32) ** 2).mean()
            return jax.value_and_grad(f, argnums=(0, 1))(v, x)
    else:
        fn = jax.jit(block.apply)

    out = fn(variables, x)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, x)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters * 1000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--flash", action="store_true")
    p.add_argument("--bwd", action="store_true")
    args = p.parse_args()
    b = args.frames

    # (label, count, planes, heads, pool, win, input shape)
    variants = [
        ("stage1 win8   ", 2, 112, 2, 0, 8, (b, 256, 256, 112)),
        ("pool1->2      ", 1, 224, 4, 2, 4, (b, 256, 256, 112)),
        ("stage2 win4   ", 2, 224, 4, 0, 4, (b, 128, 128, 224)),
        ("pool2->3      ", 1, 448, 8, 2, 14, (b, 128, 128, 224)),
        ("stage3 win14  ", 12, 448, 8, 0, 14, (b, 64, 64, 448)),
        ("stage3 global ", 3, 448, 8, 0, 0, (b, 64, 64, 448)),
        ("pool3->4      ", 1, 896, 16, 2, 7, (b, 64, 64, 448)),
        ("stage4 win7   ", 2, 896, 16, 0, 7, (b, 32, 32, 896)),
    ]
    total = 0.0
    for label, count, planes, heads, pool, win, shape in variants:
        ms = time_block(planes, heads, pool, win, shape,
                        args.flash, args.bwd)
        total += ms * count
        print(f"{label} x{count:2d}: {ms:7.2f} ms/block -> "
              f"{ms * count:7.1f} ms", flush=True)
    print(f"sum of blocks: {total:.1f} ms "
          f"({'fwd+bwd' if args.bwd else 'fwd'}, "
          f"{'flash' if args.flash else 'xla'})", flush=True)


if __name__ == "__main__":
    main()
