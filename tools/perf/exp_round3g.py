"""Round-3 batch G: biased fused attention on-chip probe + SAM-B train
step with fused windowed attention."""
import sys
sys.path.insert(0, "/root/repo")
from tools.perf.lab import *  # noqa

warmup()
import jax
import jax.numpy as jnp
import numpy as np

from simpleaicv_pytorch_training_examples_tpu.ops.pallas.fused_attention \
    import fused_attention, _reference_bias

rs = np.random.RandomState(0)
b, h, n, d = 50, 12, 196, 64
q = jnp.asarray(rs.randn(b, h, n, d), jnp.bfloat16)
k = jnp.asarray(rs.randn(b, h, n, d), jnp.bfloat16)
v = jnp.asarray(rs.randn(b, h, n, d), jnp.bfloat16)
bias = jnp.asarray(rs.randn(b, h, n, n) * 0.3, jnp.float32)
got = np.asarray(fused_attention(q, k, v, bias=bias, force_pallas=True),
                 np.float32)
want = np.asarray(_reference_bias(q, k, v, bias, None), np.float32)
err = np.abs(got - want).max()
print(f"biased kernel fwd max-abs err: {err:.5f}", flush=True)
assert err < 6e-2, err

import bench_sam_train
ms = bench_sam_train.bench_sam_train(use_flash=True)
print(f"SAM-B train flash+fused-windowed: {ms:.1f} ms/step "
      f"(was 261.8 with XLA windowed)", flush=True)
