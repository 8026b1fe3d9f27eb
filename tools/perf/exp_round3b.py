"""Round-3 batch B: bs sweep with packed fused attention + step trace +
SAM2 memory-attention (d=256) flash profile. One process, one warmup."""
import os
import sys
import time
sys.path.insert(0, "/root/repo")
from tools.perf.lab import *  # noqa

warmup()

import jax
import jax.numpy as jnp
import numpy as np

# 1) bs sweep of the fused-attention train step
for bs in (256, 512):
    model, step, state, batch = build_vit_train(
        softmax_dtype=jnp.bfloat16, use_fused_attention=True,
        batch_size=bs)
    dt, state = time_train(step, state, batch, iters=10,
                           label=f"fused-packed bs{bs}")
    del model, step, state, batch

# 2) profiler trace of one packed bs256 step
model, step, state, batch = build_vit_train(
    softmax_dtype=jnp.bfloat16, use_fused_attention=True, batch_size=256)
rng = jax.random.PRNGKey(1)
state, m = step(state, batch, rng)
float(m["loss"])
os.makedirs("/tmp/trace_packed", exist_ok=True)
with jax.profiler.trace("/tmp/trace_packed"):
    for _ in range(3):
        state, m = step(state, batch, rng)
    float(m["loss"])
print("trace written to /tmp/trace_packed", flush=True)
del model, step, state, batch

# 3) SAM2 memory-attention shape: flash vs XLA fwd+bwd at d=256 + trace
from simpleaicv_pytorch_training_examples_tpu.ops.pallas.flash_attention \
    import flash_attention, _attention_reference

B, H, NQ, NK, D = 1, 1, 4096, 28736, 256
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(B, H, NQ, D), jnp.bfloat16)
k = jnp.asarray(rs.randn(B, H, NK, D), jnp.bfloat16)
v = jnp.asarray(rs.randn(B, H, NK, D), jnp.bfloat16)
bias = jnp.zeros((B, NK), jnp.float32)


def timeit(fn, label, iters=10):
    out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt


fwd_flash = jax.jit(lambda: flash_attention(q, k, v, bias))
fwd_xla = jax.jit(lambda: _attention_reference(q, k, v, bias))
grad_flash = jax.jit(jax.grad(
    lambda q, k, v: flash_attention(q, k, v, bias).astype(
        jnp.float32).sum(), argnums=(0, 1, 2)))
grad_xla = jax.jit(jax.grad(
    lambda q, k, v: _attention_reference(q, k, v, bias).astype(
        jnp.float32).sum(), argnums=(0, 1, 2)))

timeit(fwd_flash, "d256 flash fwd")
timeit(fwd_xla, "d256 xla fwd")
timeit(lambda: grad_flash(q, k, v), "d256 flash fwd+bwd")
timeit(lambda: grad_xla(q, k, v), "d256 xla fwd+bwd")

os.makedirs("/tmp/trace_d256", exist_ok=True)
with jax.profiler.trace("/tmp/trace_d256"):
    for _ in range(3):
        out = fwd_flash()
    float(jnp.sum(out.astype(jnp.float32)))
print("d256 trace written to /tmp/trace_d256", flush=True)
