"""Round-3 batch E: whole-block fused kernel (attn_block) train step."""
import os
import sys
sys.path.insert(0, "/root/repo")
from tools.perf.lab import *  # noqa

warmup()
import jax
import jax.numpy as jnp
import numpy as np

from simpleaicv_pytorch_training_examples_tpu.ops.pallas import attn_block as AB

rs = np.random.RandomState(0)
b, n, h, d = 4, 197, 12, 64
c = h * d
x = jnp.asarray(rs.randn(b, n, c) * 0.5, jnp.bfloat16)
wqkv = jnp.asarray(rs.randn(c, 3 * c) * 0.05, jnp.bfloat16)
bqkv = jnp.asarray(rs.randn(3 * c) * 0.02, jnp.bfloat16)
wproj = jnp.asarray(rs.randn(c, c) * 0.05, jnp.bfloat16)
bproj = jnp.asarray(rs.randn(c) * 0.02, jnp.bfloat16)
gamma = jnp.asarray(1.0 + 0.1 * rs.randn(c), jnp.float32)
beta = jnp.asarray(0.1 * rs.randn(c), jnp.float32)
args = (x, wqkv, bqkv, wproj, bproj, gamma, beta)

got = np.asarray(AB.attn_block(*args, head_nums=h, force_pallas=True),
                 np.float32)
want = np.asarray(AB._reference_block(*args, head_nums=h, eps=1e-6),
                  np.float32)
err = np.abs(got - want).max()
print(f"attn_block fwd max-abs err: {err:.5f}", flush=True)
assert err < 8e-2, err

gk = jax.jit(jax.grad(lambda x: AB.attn_block(
    x.astype(jnp.bfloat16), *args[1:], head_nums=h,
    force_pallas=True).astype(jnp.float32).sum()))(x.astype(jnp.float32))
gr = jax.jit(jax.grad(lambda x: AB._reference_block(
    x.astype(jnp.bfloat16), *args[1:], head_nums=h,
    eps=1e-6).astype(jnp.float32).sum()))(x.astype(jnp.float32))
gerr = np.abs(np.asarray(gk) - np.asarray(gr)).max()
print(f"attn_block dx max-abs err: {gerr:.5f}", flush=True)

model, step, state, batch = build_vit_train(
    softmax_dtype=jnp.bfloat16, use_fused_attention=True, batch_size=256)
dt, state = time_train(step, state, batch, iters=10, label="block bs256")
os.makedirs("/tmp/trace_block", exist_ok=True)
rng = jax.random.PRNGKey(1)
with jax.profiler.trace("/tmp/trace_block"):
    for _ in range(3):
        state, m = step(state, batch, rng)
    float(m["loss"])
print("trace written", flush=True)
