"""Pallas flash attention vs plain attention: exactness of the online
softmax (CPU runs the XLA fallback; the pallas path itself is exercised
in the on-chip ablations recorded in the kernel docstring)."""

import numpy as np


def test_fallback_and_grad():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas.flash_attention import (
        _attention_reference, flash_attention)

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(2, 4, 64, 32).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 4, 64, 32).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 4, 64, 32).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(flash_attention(q, k, v)),
        np.asarray(_attention_reference(q, k, v)), atol=1e-6)

    # additive bias path
    bias = jnp.asarray(rs.randn(2, 4, 64, 64).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(flash_attention(q, k, v, bias)),
        np.asarray(_attention_reference(q, k, v, bias)), atol=1e-6)

    # gradient flows
    g = jax.grad(lambda q: flash_attention(q, k, v).sum())(q)
    assert np.isfinite(float(jnp.abs(g).sum()))
