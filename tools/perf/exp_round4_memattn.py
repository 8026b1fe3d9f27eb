"""Re-measure SAM2 memory cross-attention (B1 H1 4096q x 28736kv x d256,
per-key bias) with the round-4 single fused backward — the round-3
numbers (1.56x fwd / 1.34x fwd+bwd over XLA) predate it. Also sweeps a
head-split variant (2 heads x d128) to answer VERDICT r3 weak #4.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from lab import warmup  # noqa: E402

warmup()

import jax
import jax.numpy as jnp
import numpy as np

from simpleaicv_pytorch_training_examples_tpu.ops.pallas.flash_attention import (  # noqa: E402
    flash_attention)

B, NQ, NK = 1, 4096, 28736
rs = np.random.RandomState(0)


def timed(f, args, label, iters=20):
    out = f(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    # tunnel: materialize a scalar to actually block
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


def xla_attn(q, k, v, bias):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (q.shape[-1] ** -0.5)
    s = s.astype(jnp.float32) + bias[:, None, None, :]
    p = jax.nn.softmax(s, -1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


for h, d in [(1, 256), (2, 128), (4, 64)]:
    q = jnp.asarray(rs.randn(B, h, NQ, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, h, NK, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, h, NK, d), jnp.bfloat16)
    # realistic slot-validity masking: ~10% of keys masked with -1e9, the
    # production memory-attention bias pattern (ADVICE r4: a 0.0 bias never
    # exercised the large-negative softmax path)
    bias = jnp.where(jnp.asarray(rs.rand(B, NK) < 0.1), -1e9, 0.0).astype(
        jnp.float32)

    flash = jax.jit(lambda q, k, v, b: flash_attention(
        q, k, v, bias=b, force_pallas=True))
    ref = jax.jit(xla_attn)

    def loss_flash(q, k, v, b):
        return flash_attention(q, k, v, bias=b,
                               force_pallas=True).astype(jnp.float32).sum()

    def loss_ref(q, k, v, b):
        return xla_attn(q, k, v, b).astype(jnp.float32).sum()

    g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))

    # parity
    err = np.abs(np.asarray(flash(q, k, v, bias), np.float32)
                 - np.asarray(ref(q, k, v, bias), np.float32)).max()
    print(f"h{h} d{d} fwd parity: {err:.4f}", flush=True)

    tf = timed(flash, (q, k, v, bias), f"h{h} d{d} flash fwd")
    tx = timed(ref, (q, k, v, bias), f"h{h} d{d} xla fwd")
    gf = timed(g_flash, (q, k, v, bias), f"h{h} d{d} flash fwd+bwd")
    gx = timed(g_ref, (q, k, v, bias), f"h{h} d{d} xla fwd+bwd")
    print(f"h{h} d{d}: fwd {tx / tf:.2f}x  fwd+bwd {gx / gf:.2f}x",
          flush=True)
