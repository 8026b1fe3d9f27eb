"""Round-3 batch C: lane-aligned pairs attention kernel (full ViT-B train
step) + d=256 flash-vs-XLA with force_pallas actually set."""
import os
import sys
import time
sys.path.insert(0, "/root/repo")
from tools.perf.lab import *  # noqa

warmup()

import jax
import jax.numpy as jnp
import numpy as np

# 1) on-chip correctness probe of the pairs kernel (fwd + bwd)
from simpleaicv_pytorch_training_examples_tpu.ops.pallas.fused_attention \
    import fused_attention_dense

rs = np.random.RandomState(0)
b, n, h, d = 4, 197, 12, 64
c = h * d
qkv = jnp.asarray(rs.randn(b, n, 3 * c), jnp.bfloat16)
got = np.asarray(fused_attention_dense(qkv, h, force_pallas=True),
                 np.float32)
want = np.asarray(fused_attention_dense(qkv, h), np.float32)
err = np.abs(got - want).max()
print(f"pairs kernel fwd max-abs err: {err:.5f}", flush=True)
assert err < 2e-2, err

gk = jax.jit(jax.grad(lambda t: fused_attention_dense(
    t.astype(jnp.bfloat16), h, force_pallas=True).astype(
        jnp.float32).sum()))(qkv.astype(jnp.float32))
gr = jax.jit(jax.grad(lambda t: fused_attention_dense(
    t.astype(jnp.bfloat16), h).astype(jnp.float32).sum()))(
        qkv.astype(jnp.float32))
gerr = np.abs(np.asarray(gk) - np.asarray(gr)).max()
print(f"pairs kernel bwd max-abs err: {gerr:.5f}", flush=True)
assert gerr < 5e-2, gerr

# 2) full ViT-B bs256 train step with the pairs kernel
model, step, state, batch = build_vit_train(
    softmax_dtype=jnp.bfloat16, use_fused_attention=True, batch_size=256)
dt, state = time_train(step, state, batch, iters=10, label="pairs bs256")
os.makedirs("/tmp/trace_pairs", exist_ok=True)
rng = jax.random.PRNGKey(1)
with jax.profiler.trace("/tmp/trace_pairs"):
    for _ in range(3):
        state, m = step(state, batch, rng)
    float(m["loss"])
print("trace written to /tmp/trace_pairs", flush=True)
del model, step, state, batch

# 3) d=256 SAM2 memory shape, flash FOR REAL (force_pallas) vs XLA
from simpleaicv_pytorch_training_examples_tpu.ops.pallas.flash_attention \
    import flash_attention, _attention_reference

B, H, NQ, NK, D = 1, 1, 4096, 28736, 256
q = jnp.asarray(rs.randn(B, H, NQ, D), jnp.bfloat16)
k = jnp.asarray(rs.randn(B, H, NK, D), jnp.bfloat16)
v = jnp.asarray(rs.randn(B, H, NK, D), jnp.bfloat16)
bias = jnp.zeros((B, NK), jnp.float32)


def timeit(fn, label, iters=20):
    out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt


for bq, bk in [(1024, 1024), (2048, 1024), (4096, 1024), (1024, 2048),
               (2048, 2048), (512, 4096)]:
    try:
        fl = jax.jit(lambda q, k, v: flash_attention(
            q, k, v, bias, block_q=bq, block_k=bk, force_pallas=True))
        timeit(lambda: fl(q, k, v), f"d256 flash fwd bq{bq} bk{bk}")
    except Exception as e:
        print(f"d256 flash bq{bq} bk{bk} FAILED: {str(e)[:120]}",
              flush=True)

gf = jax.jit(jax.grad(lambda q, k, v: flash_attention(
    q, k, v, bias, force_pallas=True).astype(jnp.float32).sum(),
    argnums=(0, 1, 2)))
timeit(lambda: gf(q, k, v), "d256 flash fwd+bwd (default blocks)")
gx = jax.jit(jax.grad(lambda q, k, v: _attention_reference(
    q, k, v, bias).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
timeit(lambda: gx(q, k, v), "d256 xla fwd+bwd")
fx = jax.jit(lambda q, k, v: _attention_reference(q, k, v, bias))
timeit(lambda: fx(q, k, v), "d256 xla fwd")
