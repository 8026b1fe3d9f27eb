"""Round-5 sweep: flash_attention_relpos block sizes at the SAM-B global
shape [b4 h12 4096 d64] (the trace shows these 4 kernels are 146 ms of
the 222 ms bs4 step: fwd 12.5 ms + bwd 24.1 ms per block). Is bq/bk 1024
still optimal for the SINGLE-FUSED backward (the round-3 sweep predates
it)?
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/perf")
from lab import warmup  # noqa: E402

warmup()

import jax
import jax.numpy as jnp
import numpy as np

from simpleaicv_pytorch_training_examples_tpu.ops.pallas.flash_attention import (  # noqa: E402
    flash_attention_relpos)

B, H, N, D = 4, 12, 4096, 64
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(B, H, N, D), jnp.bfloat16)
k = jnp.asarray(rs.randn(B, H, N, D), jnp.bfloat16)
v = jnp.asarray(rs.randn(B, H, N, D), jnp.bfloat16)
rh = jnp.asarray(rs.randn(B, H, N, 64) * 0.1, jnp.float32)
rw = jnp.asarray(rs.randn(B, H, N, 64) * 0.1, jnp.float32)


def timed(f, args, label, iters=10):
    out = f(*args)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


for bq, bk in [(1024, 1024), (512, 1024), (1024, 512), (512, 2048),
               (2048, 1024), (512, 512), (256, 1024), (1024, 2048),
               (2048, 2048)]:
    fwd = jax.jit(lambda q, k, v, rh, rw, bq=bq, bk=bk: flash_attention_relpos(
        q, k, v, rh, rw, block_q=bq, block_k=bk, force_pallas=True))

    def loss(q, k, v, rh, rw, bq=bq, bk=bk):
        return flash_attention_relpos(
            q, k, v, rh, rw, block_q=bq, block_k=bk,
            force_pallas=True).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    try:
        tf = timed(fwd, (q, k, v, rh, rw), f"bq{bq} bk{bk} fwd")
        tb = timed(g, (q, k, v, rh, rw), f"bq{bq} bk{bk} fwd+bwd")
    except Exception as e:
        print(f"bq{bq} bk{bk} FAILED: {type(e).__name__}", flush=True)
