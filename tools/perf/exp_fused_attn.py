"""Measure ViT-B/16 bs256 train step: bf16-softmax baseline vs PACKED
fused pallas attention (VERDICT r2 item #1)."""
import sys
sys.path.insert(0, "/root/repo")
from tools.perf.lab import *  # noqa

warmup()

import jax.numpy as jnp
import numpy as np
from simpleaicv_pytorch_training_examples_tpu.ops.pallas.fused_attention \
    import fused_attention_qkv

# on-chip correctness probe of the packed kernel
rs = np.random.RandomState(0)
qkv = jnp.asarray(rs.randn(4, 197, 3, 12, 64), jnp.bfloat16)
got = np.asarray(fused_attention_qkv(qkv, force_pallas=True), np.float32)
want = np.asarray(fused_attention_qkv(qkv), np.float32)
err = np.abs(got - want).max()
print(f"packed kernel max-abs err vs XLA ref: {err:.5f}", flush=True)
assert err < 2e-2, err

for label, kw in [
    ("fused-attn-packed", dict(softmax_dtype=jnp.bfloat16,
                               use_fused_attention=True)),
]:
    model, step, state, batch = build_vit_train(**kw)
    time_train(step, state, batch, iters=10, label=label)
