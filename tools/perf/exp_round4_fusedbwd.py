"""Round-4 experiment: single-fused-backward flash kernels (plain bias +
decomposed rel-pos) vs the round-3 two-kernel baselines, at the two hot
shapes:

1. SAM-B global attention (B H N D = bs x 12 x 4096 x 64, decomposed
   rel-pos). Round-3 baselines (recorded in flash_attention.py header):
   fwd 4.67 ms bs2; fwd+bwd 25.07 ms bs2.
2. SAM2 memory cross-attention (1 x 1 x 4096 q x 28736 kv x 256 d,
   per-key bias). Round-3: fwd 2.18 / fwd+bwd 4.78 ms (XLA 3.39 / 6.39).

Also asserts on-chip numeric parity vs the XLA reference path first.
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")
from tools.perf.lab import *  # noqa

warmup()

import jax
import jax.numpy as jnp
import numpy as np

from simpleaicv_pytorch_training_examples_tpu.ops.pallas.flash_attention \
    import flash_attention, flash_attention_relpos

rs = np.random.RandomState(0)


def relpos_case(bs, check=False):
    B, H, N, D, KH, KW = bs, 12, 4096, 64, 64, 64
    q = jnp.asarray(rs.randn(B, H, N, D) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, H, N, D) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, H, N, D) * 0.1, jnp.bfloat16)
    rh = jnp.asarray(rs.randn(B, H, N, KH) * 0.1, jnp.float32)
    rw = jnp.asarray(rs.randn(B, H, N, KW) * 0.1, jnp.float32)

    if check:
        got = np.asarray(jax.jit(lambda *a: flash_attention_relpos(
            *a, force_pallas=True))(q, k, v, rh, rw), np.float32)
        want = np.asarray(jax.jit(lambda *a: flash_attention_relpos(
            *a, force_pallas=False))(q, k, v, rh, rw), np.float32)
        err = np.abs(got - want).max()
        print(f"relpos fwd max-abs err vs xla: {err:.5f}", flush=True)
        assert err < 3e-2, err

    fwd = jax.jit(lambda *a: flash_attention_relpos(
        *a, force_pallas=True).astype(jnp.float32).sum())
    time_apply(fwd, (q, k, v, rh, rw), label=f"relpos fwd bs{bs}")

    def loss(q, k, v, rh, rw):
        return flash_attention_relpos(
            q, k, v, rh, rw, force_pallas=True).astype(jnp.float32).sum()
    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    time_apply(bwd, (q, k, v, rh, rw), label=f"relpos fwd+bwd bs{bs}")

    if check:
        gk = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v, rh, rw)
        gr = jax.jit(jax.grad(
            lambda *a: flash_attention_relpos(*a).astype(
                jnp.float32).sum(), argnums=(0, 1, 2)))(q, k, v, rh, rw)
        for name, a_, b_ in zip("qkv", gk, gr):
            e = np.abs(np.asarray(a_, np.float32)
                       - np.asarray(b_, np.float32)).max()
            print(f"relpos d{name} max-abs err vs xla: {e:.5f}", flush=True)
            assert e < 5e-2, (name, e)


def memory_case(check=False):
    B, H, NQ, NK, D = 1, 1, 4096, 28736, 256
    q = jnp.asarray(rs.randn(B, H, NQ, D) * 0.05, jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, H, NK, D) * 0.05, jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, H, NK, D) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(np.where(rs.rand(B, NK) < 0.1, -1e9, 0.0),
                       jnp.float32)

    if check:
        got = np.asarray(jax.jit(lambda *a: flash_attention(
            *a, force_pallas=True))(q, k, v, bias), np.float32)
        want = np.asarray(jax.jit(lambda *a: flash_attention(
            *a, force_pallas=False))(q, k, v, bias), np.float32)
        err = np.abs(got - want).max()
        print(f"memory fwd max-abs err vs xla: {err:.5f}", flush=True)
        assert err < 3e-2, err

    fwd = jax.jit(lambda *a: flash_attention(
        *a, force_pallas=True).astype(jnp.float32).sum())
    time_apply(fwd, (q, k, v, bias), label="memory fwd")

    def loss(q, k, v):
        return flash_attention(
            q, k, v, bias, force_pallas=True).astype(jnp.float32).sum()
    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    time_apply(bwd, (q, k, v), label="memory fwd+bwd")

    if check:
        gk = bwd(q, k, v)
        gr = jax.jit(jax.grad(lambda *a: flash_attention(
            *a, bias).astype(jnp.float32).sum(), argnums=(0, 1, 2)))(
                q, k, v)
        for name, a_, b_ in zip("qkv", gk, gr):
            e = np.abs(np.asarray(a_, np.float32)
                       - np.asarray(b_, np.float32)).max()
            print(f"memory d{name} max-abs err vs xla: {e:.5f}", flush=True)
            assert e < 5e-2, (name, e)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=2)
    p.add_argument("--check", action="store_true")
    p.add_argument("--skip-memory", action="store_true")
    args = p.parse_args()
    relpos_case(args.bs, check=args.check)
    if not args.skip_memory:
        memory_case(check=args.check)
