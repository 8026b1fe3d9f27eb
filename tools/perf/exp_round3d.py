"""Round-3 batch D: fused-LN A/B on the pairs-attention train step."""
import sys
sys.path.insert(0, "/root/repo")
from tools.perf.lab import *  # noqa

warmup()
import jax
import jax.numpy as jnp
import numpy as np

# on-chip correctness probe of the LN kernel fwd+bwd
from simpleaicv_pytorch_training_examples_tpu.ops.pallas.layer_norm \
    import layer_norm, _reference

rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(50432, 768), jnp.bfloat16)
g = jnp.asarray(rs.rand(768), jnp.float32)
bta = jnp.asarray(rs.randn(768), jnp.float32)
got = np.asarray(layer_norm(x, g, bta, force_pallas=True), np.float32)
want = np.asarray(_reference(x, g, bta, 1e-6), np.float32)
err = np.abs(got - want).max()
print(f"LN kernel fwd max-abs err: {err:.5f}", flush=True)
assert err < 6e-2, err

for label, kw in [
    ("pairs+fusedLN bs256", dict(softmax_dtype=jnp.bfloat16,
                                 use_fused_attention=True,
                                 use_fused_norm=True)),
]:
    model, step, state, batch = build_vit_train(batch_size=256, **kw)
    time_train(step, state, batch, iters=10, label=label)
