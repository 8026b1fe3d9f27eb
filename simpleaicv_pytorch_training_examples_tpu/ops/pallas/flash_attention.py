"""Pallas TPU flash attention: fused forward AND backward, with additive
per-key bias.

The hot kernel for the 4k-token SAM/SAM2 encoders and — above all — the
SAM2 memory cross-attention (SURVEY.md §5 "long-context"): 4096 queries
attending to a ~28.7k-token memory bank (7 mask memories x 4096 + object
pointers) with a per-key validity bias. Materializing those logits is a
[4096, 28736] fp32 tensor per layer (~470 MB per batch item); this kernel
streams K/V blocks through VMEM with an online-softmax state so the score
matrix never exists in HBM — O(N) memory, MXU matmuls in the input dtype
(bf16 at full rate) with fp32 accumulation.

Backward is fused too — and into ONE pallas kernel (round 4): the
forward saves only the per-row logsumexp; the backward streams the same
blocks once, recomputing scores/probs a single time per (q, k) block
pair and emitting dq (VMEM-accumulated) plus per-q-block dk/dv partials
that XLA sums outside. The split dkdv/dq kernel pair this replaces ran
the whole score pipeline twice; these kernels are VPU-bound (softmax
sweeps), so the recompute was the dominant cost. The per-key bias gets
a zero gradient (it encodes ring-buffer slot validity — constants).

Measured on v5e, bf16:
- SAM encoder shape (B8 H12 N4096 D64): fwd 10.7 ms vs XLA 8.7 (XLA keeps
  the inference path), fwd+bwd 30.2 ms vs XLA 67.3 — 2.2x for training;
- SAM2 memory shape at the production head width (B1 H1 4096 q x
  28736 kv x 256 d + key bias, blocks 1024^2): fwd 2.18 ms vs XLA 3.39
  (1.56x), fwd+bwd 4.78 vs 6.39 ms (1.34x) — re-measured round 3 in a
  python dispatch loop whose ~1.4 ms/call tunnel overhead inflates both
  sides (the device trace puts XLA fwd at 2.03 ms, i.e. the on-device
  ratios are higher); block sweep at this shape: bq1024/bk1024 best of
  {512..4096}^2 (tools/perf/exp_round3c.py). Plus the activation-memory
  win: the [4096, 28736] probability matrix never reaches HBM, which is
  what lets larger batch/frame counts fit at all. (At d=64 the same
  shape measures 1.7-1.8x.);
- SAM global attention with decomposed rel-pos (B8 H12 N4096 D64):
  fwd 19.4 ms vs XLA 52.0 (2.7x); fwd+bwd 55.0 ms vs ~181 ms
  XLA-equivalent (3.3x, scaled from bs2 — the XLA path OOMs HBM at bs8
  because the [96, 4096, 4096] bias and its gradients materialize).
  Block sweep at B2 (round 3): the bq1024/bk1024 default is already
  best — 4.67 ms fwd vs 4.72 (512/1024), 4.81 (1024/4096), 5.18
  (2048^2); the in-kernel one-hot rel expansion triples the attention
  FLOPs, so ~4.7 ms is near this kernel's analytic bound at bs2.

API: flash_attention(q, k, v, bias=None) with q/k/v [B, H, N, D] and bias
[B, N_k] (per-key additive, broadcast over heads/queries). Key length is
padded to the block size internally (padding keys get -1e9 bias).
Falls back to plain XLA attention off-TPU or when D > 256.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
_NEG_INF = -1e9


def _attention_reference(q, k, v, bias=None):
    """Plain XLA attention, fp32 softmax (fallback path)."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (d**-0.5)
    if bias is not None:
        logits = logits + bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------- forward


def _fwd_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, n_k_steps, sm_scale):
    """Grid = (batch*head, q_block, k_step), k innermost ("arbitrary"):
    each K/V block is DMA'd once per q-block by the pipeline; the online
    softmax state (max / sumexp / acc) lives in VMEM scratch across k
    steps. Dots run on native-dtype operands with fp32 accumulation."""
    kstep = pl.program_id(2)

    @pl.when(kstep == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[...]  # [block_q, d]
    k = k_ref[...]  # [block_k, d]
    v = v_ref[...]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
    s = s + b_ref[0].astype(jnp.float32)[None, :]
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
        l = l_scr[...]
        o_ref[...] = (acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0] = (m_scr[...] + jnp.log(l))[:, 0]


def _flash_forward(q, k, v, bias, block_q, block_k, sm_scale):
    """q/k/v [G, N, D] (G = batch*heads), bias [G, 1, N_k] fp32.
    Returns (out [G, N_q, D], lse [G, 1, N_q] fp32). sm_scale is passed
    explicitly: D may be zero-padded to a lane-friendly width by the
    caller, and the softmax scale must stay the ORIGINAL head dim's."""
    g, n_q, d = q.shape
    n_k = k.shape[1]
    n_k_steps = n_k // block_k

    kernel = functools.partial(_fwd_kernel, n_k_steps=n_k_steps,
                               sm_scale=sm_scale)
    out, lse = pl.pallas_call(
        kernel,
        grid=(g, n_q // block_q, n_k_steps),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda i, j, s: (i, s, 0)),
            pl.BlockSpec((None, block_k, d), lambda i, j, s: (i, s, 0)),
            pl.BlockSpec((None, 1, block_k), lambda i, j, s: (i, 0, s)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((None, 1, block_q), lambda i, j, s: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, n_q, d), q.dtype),
            jax.ShapeDtypeStruct((g, 1, n_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, bias)
    return out, lse


# --------------------------------------------------------------- backward


def _bwd_fused_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                      b_ref, dq_ref, dkp_ref, dvp_ref, dq_scr,
                      *, n_k_steps, sm_scale):
    """SINGLE fused backward pass, grid = (batch*head, q_block, k_step)
    with k innermost: the scores/probs are recomputed ONCE per (q, k)
    block pair and feed dV, dK and dQ together (the split dkdv/dq kernel
    pair recomputed them twice — one extra full exp/softmax sweep plus
    qk/dp dots, and the kernel is VPU-bound at the SAM shapes, so the
    recompute was the bill). dQ accumulates across k steps in VMEM
    scratch; dK/dV contributions can't (k is inner, their blocks change
    every step), so each (q_block, k_step) writes its partial into an
    EXPANDED output [g, n_qb, n_k, d] and XLA sums the n_qb partials
    outside — one cheap fused reduction in exchange for not re-running
    the whole score pipeline. sm_scale moves off the [bq, bk] ds tensor
    onto the [*, d] results (64x fewer elements, exact same algebra)."""
    kstep = pl.program_id(2)

    @pl.when(kstep == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[...]          # [block_q, d]
    do = do_ref[...]        # [block_q, d]
    lse = lse_ref[0]        # [block_q]
    delta = delta_ref[0]    # [block_q]
    k = k_ref[...]          # [block_k, d]
    v = v_ref[...]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
    s = s + b_ref[0].astype(jnp.float32)[None, :]
    p = jnp.exp(s - lse[:, None])          # [block_q, block_k]
    dvp_ref[0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dvp_ref.dtype)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds0 = (p * (dp - delta[:, None])).astype(q.dtype)  # unscaled ds
    dkp_ref[0] = (jax.lax.dot_general(
        ds0, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale).astype(
            dkp_ref.dtype)
    dq_scr[...] += jax.lax.dot_general(
        ds0, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kstep == n_k_steps - 1)
    def _finalize():
        dq_ref[...] = (dq_scr[...] * sm_scale).astype(dq_ref.dtype)


def _flash_backward(q, k, v, bias, out, lse, g_out, block_q, block_k,
                    sm_scale):
    """Single fused backward: dq accumulates in fp32 VMEM scratch; dk/dv
    are written as [g, n_qb, n_k, d] per-q-block partials in k.dtype and
    summed by XLA outside (the fp32 sum upcasts).

    Precision note (ADVICE r4): rounding each partial to bf16 before the
    fp32 sum adds n_qb (=4 at SAM-B shapes) intermediate roundings vs a
    full-fp32 VMEM accumulation — worst case ~n_qb ulps of bf16, inside
    the 5e-2 grad-parity tolerance the kernel tests assert
    (tests/test_flash_attention.py) and far below bf16 training noise.
    fp32 partials would halve the rounding steps at 2x the partial-buffer
    HBM traffic ([g, n_qb, n_k, d] x2 tensors); measured round 4, the
    bf16 variant is the faster end-to-end step, so it ships."""
    g, n_q, d = q.shape
    n_k = k.shape[1]
    n_qb = n_q // block_q
    # delta = rowsum(dO * O): tiny elementwise pass, XLA fuses it
    delta = jnp.sum(g_out.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, None, :]  # [G, 1, n_q]

    kernel = functools.partial(_bwd_fused_kernel,
                               n_k_steps=n_k // block_k, sm_scale=sm_scale)
    dq, dkp, dvp = pl.pallas_call(
        kernel,
        grid=(g, n_qb, n_k // block_k),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((None, block_q, d), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((None, 1, block_q), lambda i, j, s: (i, 0, j)),
            pl.BlockSpec((None, 1, block_q), lambda i, j, s: (i, 0, j)),
            pl.BlockSpec((None, block_k, d), lambda i, j, s: (i, s, 0)),
            pl.BlockSpec((None, block_k, d), lambda i, j, s: (i, s, 0)),
            pl.BlockSpec((None, 1, block_k), lambda i, j, s: (i, 0, s)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((None, 1, block_k, d),
                         lambda i, j, s: (i, j, s, 0)),
            pl.BlockSpec((None, 1, block_k, d),
                         lambda i, j, s: (i, j, s, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, n_q, d), q.dtype),
            jax.ShapeDtypeStruct((g, n_qb, n_k, d), k.dtype),
            jax.ShapeDtypeStruct((g, n_qb, n_k, d), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, g_out, lse, delta, k, v, bias)
    if n_qb == 1:
        return dq, dkp[:, 0], dvp[:, 0]
    dk = jnp.sum(dkp.astype(jnp.float32), axis=1).astype(k.dtype)
    dv = jnp.sum(dvp.astype(jnp.float32), axis=1).astype(v.dtype)
    return dq, dk, dv


# ------------------------------------------------------------- custom vjp


def _flash_fwd_factory(params):
    block_q, block_k, sm_scale = params

    def fn(q, k, v, bias):
        return _flash_forward(q, k, v, bias, block_q, block_k, sm_scale)
    return fn


def _flash_bwd_factory(params):
    block_q, block_k, sm_scale = params

    def fn(q, k, v, bias, out, lse, g_out):
        return _flash_backward(q, k, v, bias, out, lse, g_out,
                               block_q, block_k, sm_scale)
    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, bias, block_q, block_k, sm_scale):
    from .partitioning import cached_axis0
    fn = cached_axis0(_flash_fwd_factory, (block_q, block_k, sm_scale),
                      "g n d, g m d, g m d, g u m -> g n d, g u n")
    out, _ = fn(q, k, v, bias)
    return out


def _flash_fwd_rule(q, k, v, bias, block_q, block_k, sm_scale):
    from .partitioning import cached_axis0
    fn = cached_axis0(_flash_fwd_factory, (block_q, block_k, sm_scale),
                      "g n d, g m d, g m d, g u m -> g n d, g u n")
    out, lse = fn(q, k, v, bias)
    return out, (q, k, v, bias, out, lse)


def _flash_bwd_rule(block_q, block_k, sm_scale, res, g_out):
    q, k, v, bias, out, lse = res
    from .partitioning import cached_axis0
    fn = cached_axis0(
        _flash_bwd_factory, (block_q, block_k, sm_scale),
        "g n d, g m d, g m d, g u m, g n d, g u n, g n d"
        " -> g n d, g m d, g m d")
    dq, dk, dv = fn(q, k, v, bias, out, lse, g_out)
    # the bias encodes slot validity (constants) — zero gradient
    return dq, dk, dv, jnp.zeros_like(bias)


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def flash_attention(q, k, v, bias=None,
                    block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                    force_pallas=False, sm_scale=None):
    """[B, H, N, D] attention with optional per-key bias [B, N_k].

    On TPU with force_pallas=True (or via use_flash_attention model
    flags), runs the fused pallas forward+backward; queries/keys are
    zero-padded to the block size (padding keys get -1e9 bias, padded
    query rows are sliced off). Off-TPU or for D > 256, falls back to
    plain XLA attention."""
    b, h, n_q, d = q.shape
    n_k = k.shape[2]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not (force_pallas and on_tpu and d <= 256):
        if sm_scale is not None:  # padded heads keep the REAL scale
            q = q * (sm_scale * d ** 0.5)
        return _attention_reference(q, k, v, bias)

    # softmax scale from the ORIGINAL head dim; odd widths (e.g. Hiera's
    # d=56) are zero-padded to a lane-friendly multiple of 64 — exact:
    # zero dims add nothing to the logits and the padded V columns are
    # sliced off the output. sm_scale overrides for parameter-level
    # padded heads (the logical head dim differs from d).
    if sm_scale is None:
        sm_scale = d**-0.5
    d_pad = _round_up(d, 64) - d

    block_q = min(block_q, _round_up(n_q, 128))
    block_k = min(block_k, _round_up(n_k, 128))
    pad_q = _round_up(n_q, block_q) - n_q
    pad_k = _round_up(n_k, block_k) - n_k

    q2 = q.reshape(b * h, n_q, d)
    k2 = k.reshape(b * h, n_k, d)
    v2 = v.reshape(b * h, n_k, d)
    if d_pad:
        q2 = jnp.pad(q2, ((0, 0), (0, 0), (0, d_pad)))
        k2 = jnp.pad(k2, ((0, 0), (0, 0), (0, d_pad)))
        v2 = jnp.pad(v2, ((0, 0), (0, 0), (0, d_pad)))
    bias2 = jnp.zeros((b, n_k), jnp.float32) if bias is None \
        else bias.astype(jnp.float32)
    bias2 = jnp.repeat(bias2, h, axis=0) if h > 1 else bias2
    bias2 = bias2[:, None, :]  # [G, 1, n_k] (TPU block-rank constraint)
    if pad_q:
        q2 = jnp.pad(q2, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k2 = jnp.pad(k2, ((0, 0), (0, pad_k), (0, 0)))
        v2 = jnp.pad(v2, ((0, 0), (0, pad_k), (0, 0)))
        bias2 = jnp.pad(bias2, ((0, 0), (0, 0), (0, pad_k)),
                        constant_values=_NEG_INF)

    out = _flash(q2, k2, v2, bias2, block_q, block_k, sm_scale)
    if pad_q:
        out = out[:, :n_q]
    if d_pad:
        out = out[:, :, :d]
    return out.reshape(b, h, n_q, d)


# ------------------------------------------------ decomposed rel-pos flash
# SAM ViT encoder global attention (image_encoder.py SAMAttention): the
# score bias decomposes as bias[q, k] = rel_h[q, kh] + rel_w[q, kw] with
# k = kh * KW + kw on the 64x64 token grid. The decomposed terms are tiny
# ([N, 64] each) and stream through the kernel via one-hot matmuls on the
# MXU — the [4096, 4096] bias never materializes.


def _rel_onehot_comb(offset, block_k, kh_size, kw_size):
    """COMBINED one-hot selector [KH+KW, bk] for a k block: row i < KH
    is the kh_j == i indicator, row KH+i the kw_j == i indicator. With
    rel = concat(rel_h, rel_w) on the lane axis, ONE fp32 dot
    rel @ oh yields rel_h[., kh(j)] + rel_w[., kw(j)] — exact (each
    output column has exactly two unit entries, fp32 add) while halving
    the rel MXU dots and, more importantly for this VPU-bound kernel,
    removing one full [bq, bk] bias-add sweep per score computation."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1) + offset
    kh_j = cols // kw_size  # [1, bk]
    kw_j = cols % kw_size
    rows = jax.lax.broadcasted_iota(jnp.int32,
                                    (kh_size + kw_size, 1), 0)
    # sum of two masked indicators (a boolean select here lowers to an
    # i8->i1 truncation Mosaic rejects)
    hit_h = ((rows < kh_size) & (rows == kh_j)).astype(jnp.float32)
    hit_w = ((rows >= kh_size) & (rows - kh_size == kw_j)).astype(
        jnp.float32)
    return hit_h + hit_w


def _rel_score_block(q, k, rel, offset, sm_scale, kh_size, kw_size):
    """[bq, bk] scores with decomposed rel-pos terms (rel = [rh | rw]).

    The one-hot dot stays fp32 (exact): a bf16 A/B at the SAM-B global
    shape measured 25.07 -> 24.44 ms fwd+bwd (~2.5%, round 4) — the
    kernel is bound by the VPU softmax sweeps, not fp32 one-hot rate,
    so exactness costs almost nothing."""
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
    oh = _rel_onehot_comb(offset, k.shape[0], kh_size, kw_size)
    return s + jnp.dot(rel, oh, preferred_element_type=jnp.float32)


def _fwd_rel_kernel(q_ref, k_ref, v_ref, rel_ref, o_ref, lse_ref,
                    m_scr, l_scr, acc_scr, *, n_k_steps, sm_scale, block_k,
                    kh_size, kw_size):
    kstep = pl.program_id(2)

    @pl.when(kstep == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    s = _rel_score_block(q_ref[...], k_ref[...],
                         rel_ref[...].astype(jnp.float32),
                         kstep * block_k, sm_scale, kh_size, kw_size)
    v = v_ref[...]
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
        l = l_scr[...]
        o_ref[...] = (acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0] = (m_scr[...] + jnp.log(l))[:, 0]


def _bwd_rel_fused_kernel(q_ref, do_ref, lse_ref, delta_ref, rel_ref,
                          k_ref, v_ref, dq_ref, drel_ref, dkp_ref, dvp_ref,
                          dq_scr, drel_scr, *, n_k_steps, sm_scale, block_k,
                          kh_size, kw_size):
    """Single fused rel-pos backward (see _bwd_fused_kernel for the
    scheme): scores recomputed once per block pair; dq/drel accumulate
    in scratch across the inner k steps; dk/dv partials go to expanded
    [g, n_qb, n_k, d] outputs summed by XLA outside. drel is the
    UNSCALED ds contracted with the combined one-hot (one dot replaces
    the drh/drw pair)."""
    kstep = pl.program_id(2)

    @pl.when(kstep == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)
        drel_scr[...] = jnp.zeros_like(drel_scr)

    q = q_ref[...]
    do = do_ref[...]
    lse = lse_ref[0]
    delta = delta_ref[0]
    k = k_ref[...]
    v = v_ref[...]
    offset = kstep * block_k
    oh = _rel_onehot_comb(offset, block_k, kh_size, kw_size)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
    s = s + jnp.dot(rel_ref[...].astype(jnp.float32), oh,
                    preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse[:, None])  # [bq, bk]
    dvp_ref[0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dvp_ref.dtype)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds0f = p * (dp - delta[:, None])       # fp32, unscaled = d/dbias
    drel_scr[...] += jax.lax.dot_general(
        ds0f, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds0 = ds0f.astype(q.dtype)
    dkp_ref[0] = (jax.lax.dot_general(
        ds0, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale).astype(
            dkp_ref.dtype)
    dq_scr[...] += jax.lax.dot_general(
        ds0, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kstep == n_k_steps - 1)
    def _finalize():
        dq_ref[...] = (dq_scr[...] * sm_scale).astype(dq_ref.dtype)
        drel_ref[...] = drel_scr[...].astype(drel_ref.dtype)


def _flash_rel_forward(q, k, v, rh, rw, block_q, block_k, kh_size, kw_size):
    g, n_q, d = q.shape
    n_k = k.shape[1]
    rel = jnp.concatenate([rh, rw], axis=-1)  # [g, n_q, KH+KW]
    kernel = functools.partial(_fwd_rel_kernel, n_k_steps=n_k // block_k,
                               sm_scale=d**-0.5, block_k=block_k,
                               kh_size=kh_size, kw_size=kw_size)
    return pl.pallas_call(
        kernel,
        grid=(g, n_q // block_q, n_k // block_k),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda i, j, s: (i, s, 0)),
            pl.BlockSpec((None, block_k, d), lambda i, j, s: (i, s, 0)),
            pl.BlockSpec((None, block_q, kh_size + kw_size),
                         lambda i, j, s: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((None, 1, block_q), lambda i, j, s: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, n_q, d), q.dtype),
            jax.ShapeDtypeStruct((g, 1, n_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, rel)


def _flash_rel_backward(q, k, v, rh, rw, out, lse, g_out, block_q, block_k,
                        kh_size, kw_size):
    g, n_q, d = q.shape
    n_k = k.shape[1]
    n_qb = n_q // block_q
    rel = jnp.concatenate([rh, rw], axis=-1)  # [g, n_q, KH+KW]
    delta = jnp.sum(g_out.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, None, :]

    kernel = functools.partial(_bwd_rel_fused_kernel,
                               n_k_steps=n_k // block_k, sm_scale=d**-0.5,
                               block_k=block_k, kh_size=kh_size,
                               kw_size=kw_size)
    dq, drel, dkp, dvp = pl.pallas_call(
        kernel,
        grid=(g, n_qb, n_k // block_k),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((None, block_q, d), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((None, 1, block_q), lambda i, j, s: (i, 0, j)),
            pl.BlockSpec((None, 1, block_q), lambda i, j, s: (i, 0, j)),
            pl.BlockSpec((None, block_q, kh_size + kw_size),
                         lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda i, j, s: (i, s, 0)),
            pl.BlockSpec((None, block_k, d), lambda i, j, s: (i, s, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((None, block_q, kh_size + kw_size),
                         lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((None, 1, block_k, d),
                         lambda i, j, s: (i, j, s, 0)),
            pl.BlockSpec((None, 1, block_k, d),
                         lambda i, j, s: (i, j, s, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, n_q, d), q.dtype),
            jax.ShapeDtypeStruct((g, n_q, kh_size + kw_size),
                                 jnp.float32),
            jax.ShapeDtypeStruct((g, n_qb, n_k, d), k.dtype),
            jax.ShapeDtypeStruct((g, n_qb, n_k, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, kh_size + kw_size), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, g_out, lse, delta, rel, k, v)
    if n_qb == 1:
        dk, dv = dkp[:, 0], dvp[:, 0]
    else:
        dk = jnp.sum(dkp.astype(jnp.float32), axis=1).astype(k.dtype)
        dv = jnp.sum(dvp.astype(jnp.float32), axis=1).astype(v.dtype)
    return dq, dk, dv, drel[..., :kh_size], drel[..., kh_size:]


def _flash_rel_fwd_factory(params):
    block_q, block_k, kh_size, kw_size = params

    def fn(q, k, v, rh, rw):
        return _flash_rel_forward(q, k, v, rh, rw, block_q, block_k,
                                  kh_size, kw_size)
    return fn


def _flash_rel_bwd_factory(params):
    block_q, block_k, kh_size, kw_size = params

    def fn(q, k, v, rh, rw, out, lse, g_out):
        return _flash_rel_backward(q, k, v, rh, rw, out, lse, g_out,
                                   block_q, block_k, kh_size, kw_size)
    return fn


_REL_FWD_RULE = "g n d, g m d, g m d, g n h, g n w -> g n d, g u n"
_REL_BWD_RULE = ("g n d, g m d, g m d, g n h, g n w, g n d, g u n, g n d"
                 " -> g n d, g m d, g m d, g n h, g n w")


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_rel(q, k, v, rh, rw, block_q, block_k, kh_size, kw_size):
    from .partitioning import cached_axis0
    fn = cached_axis0(_flash_rel_fwd_factory,
                      (block_q, block_k, kh_size, kw_size), _REL_FWD_RULE)
    out, _ = fn(q, k, v, rh, rw)
    return out


def _flash_rel_fwd_rule(q, k, v, rh, rw, block_q, block_k, kh_size,
                        kw_size):
    from .partitioning import cached_axis0
    fn = cached_axis0(_flash_rel_fwd_factory,
                      (block_q, block_k, kh_size, kw_size), _REL_FWD_RULE)
    out, lse = fn(q, k, v, rh, rw)
    return out, (q, k, v, rh, rw, out, lse)


def _flash_rel_bwd_rule(block_q, block_k, kh_size, kw_size, res, g_out):
    q, k, v, rh, rw, out, lse = res
    from .partitioning import cached_axis0
    fn = cached_axis0(_flash_rel_bwd_factory,
                      (block_q, block_k, kh_size, kw_size), _REL_BWD_RULE)
    return fn(q, k, v, rh, rw, out, lse, g_out)


_flash_rel.defvjp(_flash_rel_fwd_rule, _flash_rel_bwd_rule)


def flash_attention_relpos(q, k, v, rel_h, rel_w,
                           block_q=1024, block_k=1024,
                           force_pallas=False):
    """[B, H, N, D] attention with decomposed relative-position terms:
    score[q, kh*KW+kw] = q.k*scale + rel_h[q, kh] + rel_w[q, kw]
    (SAM ViT global attention, image_encoder.py SAMAttention).

    rel_h [B, H, N, KH], rel_w [B, H, N, KW] with N == KH * KW (already
    q-contracted: rel_h = einsum('...qc,hkc->...qk', q_grid, Rh)).
    Gradients flow to q/k/v and both rel terms."""
    b, h, n, d = q.shape
    kh_size = rel_h.shape[-1]
    kw_size = rel_w.shape[-1]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    ok = (on_tpu and force_pallas and d <= 256 and n == kh_size * kw_size
          and n % min(block_q, n) == 0)
    if not ok:
        bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(
            b, h, n, n)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (d**-0.5) + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    block_q = min(block_q, n)
    block_k = min(block_k, n)
    g = b * h
    out = _flash_rel(q.reshape(g, n, d), k.reshape(g, n, d),
                     v.reshape(g, n, d),
                     rel_h.reshape(g, n, kh_size).astype(jnp.float32),
                     rel_w.reshape(g, n, kw_size).astype(jnp.float32),
                     block_q, block_k, kh_size, kw_size)
    return out.reshape(b, h, n, d)
