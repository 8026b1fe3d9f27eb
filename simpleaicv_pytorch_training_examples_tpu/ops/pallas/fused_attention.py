"""Pallas TPU fused attention for SHORT sequences (N <= ~1k): the whole
per-head score matrix lives in VMEM, so there is no online-softmax
streaming and no HBM materialization at all.

Motivation (complements ops/pallas/flash_attention.py, which streams K/V
for LONG sequences): at ViT-224 train shapes ([B256 H12 N197 D64]) the
flash kernel loses to XLA (9.1 vs 7.1 ms fwd) because its 1-kv-step grid
degenerates into 3072 tiny pipeline stages, while plain XLA attention
spends most of its time writing/reading the [B,H,N,N] score tensor
through HBM (~0.5-1 GB per pass) plus layout copies. Here each grid step
loads a BLOCK OF HEADS' q/k/v into VMEM, computes scores + softmax + the
value matmul entirely on-chip, and writes only the [N, D] outputs:
HBM traffic collapses to the unavoidable q/k/v/out tensors.

Backward recomputes the (cheap, VMEM-resident) scores per head-group and
emits dq/dk/dv in one fused kernel — the standard flash backward algebra
without the streaming machinery.

Measured v5e bf16 @ [B256, H12, N197, D64] (ViT-B/16 @224 train):
fwd 2.73 ms vs XLA 6.15 (2.3x); fwd+bwd(q,k,v) 6.63 ms vs XLA 12.45
(1.9x). In the full train step the win is bounded by the [B,N,3,H,D] ->
[3,B,H,N,D] layout transposes around the kernel (~230 MB/layer/direction
at the measured ~241 GB/s effective HBM bandwidth): full ViT-B bs256 step
280.5 -> 273.3 ms with bf16 softmax (see the packed-qkv STATUS note
below for the zero-copy design and why Mosaic rejects it today).

API: fused_attention(q, k, v, n_real=None, force_pallas=False) with
q/k/v [B, H, N, D]; n_real masks trailing key padding (defaults to N).
Falls back to plain XLA attention off-TPU, for D > 128, or N > 1024.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def _round_up(x, m):
    return (x + m - 1) // m * m


def _reference(q, k, v, n_real=None):
    n_k = k.shape[2]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (q.shape[-1] ** -0.5)
    if n_real is not None and n_real < n_k:
        mask = jnp.arange(n_k) < n_real
        logits = jnp.where(mask[None, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, bg, n_real, n_pad,
                sm_scale):
    mask = None
    if n_real < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        mask = jnp.where(col < n_real, 0.0, _NEG_INF).astype(jnp.float32)
    for g in range(bg):
        q = q_ref[g]                       # [n_pad, d]
        k = k_ref[g]
        v = v_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(q.dtype)
        o_ref[g] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                bg, n_real, n_pad, sm_scale):
    mask = None
    if n_real < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        mask = jnp.where(col < n_real, 0.0, _NEG_INF).astype(jnp.float32)
    for g in range(bg):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        do = do_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        p = e / l                              # fp32 [n_pad, n_pad]
        # dv = p^T @ do
        pb = p.astype(q.dtype)
        dv_ref[g] = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        # dp = do @ v^T ; ds = p * (dp - rowsum(dp * p)) * scale
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - row) * sm_scale).astype(q.dtype)
        dq_ref[g] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[g] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _pallas_fwd(q3, k3, v3, bg, n_real, n_pad, sm_scale, interpret):
    g_total, _, d = q3.shape
    grid = (g_total // bg,)
    spec = pl.BlockSpec((bg, n_pad, d), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bg=bg, n_real=n_real, n_pad=n_pad,
                          sm_scale=sm_scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q3.shape, q3.dtype),
        interpret=interpret,
    )(q3, k3, v3)


def _pallas_bwd(q3, k3, v3, do3, bg, n_real, n_pad, sm_scale, interpret):
    g_total, _, d = q3.shape
    grid = (g_total // bg,)
    spec = pl.BlockSpec((bg, n_pad, d), lambda i: (i, 0, 0))
    shape = jax.ShapeDtypeStruct(q3.shape, q3.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, bg=bg, n_real=n_real, n_pad=n_pad,
                          sm_scale=sm_scale),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[shape, shape, shape],
        interpret=interpret,
    )(q3, k3, v3, do3)


def _plain_fwd_factory(params):
    bg, n_real, interpret = params

    def fn(q3, k3, v3):
        sm_scale = q3.shape[-1] ** -0.5
        return _pallas_fwd(q3, k3, v3, bg, n_real, q3.shape[1], sm_scale,
                           interpret)
    return fn


def _plain_bwd_factory(params):
    bg, n_real, interpret = params

    def fn(q3, k3, v3, do3):
        sm_scale = q3.shape[-1] ** -0.5
        return _pallas_bwd(q3, k3, v3, do3, bg, n_real, q3.shape[1],
                           sm_scale, interpret)
    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused(q3, k3, v3, bg, n_real, n_pad, interpret):
    from .partitioning import cached_axis0
    fn = cached_axis0(_plain_fwd_factory, (bg, n_real, interpret),
                      "g n d, g n d, g n d -> g n d")
    return fn(q3, k3, v3)


def _fused_fwd(q3, k3, v3, bg, n_real, n_pad, interpret):
    return _fused(q3, k3, v3, bg, n_real, n_pad, interpret), (q3, k3, v3)


def _fused_bwd(bg, n_real, n_pad, interpret, res, g_out):
    q3, k3, v3 = res
    from .partitioning import cached_axis0
    fn = cached_axis0(_plain_bwd_factory, (bg, n_real, interpret),
                      "g n d, g n d, g n d, g n d -> g n d, g n d, g n d")
    dq, dk, dv = fn(q3, k3, v3, g_out.astype(q3.dtype))
    return dq, dk, dv


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attention(q, k, v, n_real=None, block_heads=8,
                    force_pallas=False, interpret=False, bias=None):
    """[B, H, N, D] self-attention fused entirely in VMEM (short N).

    n_real (static int) masks trailing padded keys; defaults to N.
    bias (optional) is a full additive per-head score bias [B, H, N, N]
    (e.g. the SAM windowed rel-pos bias) with gradient flow. Off-TPU,
    for D > 128, or N > 1024, falls back to plain XLA attention.
    interpret=True runs the kernel logic on CPU (tests)."""
    b, h, n, d = q.shape
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not (interpret or
            (force_pallas and on_tpu and d <= 128 and n <= 1024)):
        out = _reference_bias(q, k, v, bias,
                              n_real if n_real is not None and n_real < n
                              else None)
        return out

    # No HBM padding: Mosaic masks the ragged [n, d] tail inside VMEM
    # (jnp.pad here would stream the whole qkv through HBM again — ~3 ms
    # at ViT-B bs256 on the measured 241 GB/s effective bandwidth).
    n_real = n if n_real is None else min(n_real, n)
    g_total = b * h
    bg = block_heads
    while g_total % bg:
        bg //= 2

    q3 = q.reshape(g_total, n, d)
    k3 = k.reshape(g_total, n, d)
    v3 = v.reshape(g_total, n, d)
    if bias is None:
        out = _fused(q3, k3, v3, bg, n_real, n, interpret)
    else:
        b3 = jnp.broadcast_to(bias, (b, h, n, n)).reshape(g_total, n, n)
        out = _fused_bias(q3, k3, v3, b3, bg, n_real, n, interpret)
    return out.reshape(b, h, n, d)


def _reference_bias(q, k, v, bias, n_real):
    if bias is None:
        return _reference(q, k, v, n_real)
    n_k = k.shape[2]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (q.shape[-1] ** -0.5) + bias.astype(jnp.float32)
    if n_real is not None and n_real < n_k:
        mask = jnp.arange(n_k) < n_real
        logits = jnp.where(mask[None, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------- biased variant (rel-pos)
# Same in-VMEM fused attention, plus a full additive per-head score bias
# [g, n, n] (the SAM windowed rel-pos bias, materialized once by XLA from
# its decomposed rel_h/rel_w terms — cheap at window sizes). The bias
# gets a real gradient (ds before the sm_scale factor), so the decomposed
# terms train. The [n, n] probs still never reach HBM.


def _fwd_kernel_bias(q_ref, k_ref, v_ref, b_ref, o_ref, *, bg, n_real,
                     n_pad, sm_scale):
    mask = None
    if n_real < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        mask = jnp.where(col < n_real, 0.0, _NEG_INF).astype(jnp.float32)
    for g in range(bg):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = s + b_ref[g].astype(jnp.float32)
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(q.dtype)
        o_ref[g] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel_bias(q_ref, k_ref, v_ref, b_ref, do_ref, dq_ref, dk_ref,
                     dv_ref, db_ref, *, bg, n_real, n_pad, sm_scale):
    mask = None
    if n_real < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        mask = jnp.where(col < n_real, 0.0, _NEG_INF).astype(jnp.float32)
    for g in range(bg):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        do = do_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = s + b_ref[g].astype(jnp.float32)
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        p = e / l
        pb = p.astype(q.dtype)
        dv_ref[g] = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds0 = p * (dp - row)                   # d/dbias (no sm_scale)
        db_ref[g] = ds0.astype(db_ref.dtype)
        ds = (ds0 * sm_scale).astype(q.dtype)
        dq_ref[g] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[g] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _pallas_fwd_bias(q3, k3, v3, b3, bg, n_real, n_pad, sm_scale,
                     interpret):
    g_total, _, d = q3.shape
    grid = (g_total // bg,)
    spec = pl.BlockSpec((bg, n_pad, d), lambda i: (i, 0, 0))
    bspec = pl.BlockSpec((bg, n_pad, n_pad), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel_bias, bg=bg, n_real=n_real,
                          n_pad=n_pad, sm_scale=sm_scale),
        grid=grid,
        in_specs=[spec, spec, spec, bspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q3.shape, q3.dtype),
        interpret=interpret,
    )(q3, k3, v3, b3)


def _pallas_bwd_bias(q3, k3, v3, b3, do3, bg, n_real, n_pad, sm_scale,
                     interpret):
    g_total, _, d = q3.shape
    grid = (g_total // bg,)
    spec = pl.BlockSpec((bg, n_pad, d), lambda i: (i, 0, 0))
    bspec = pl.BlockSpec((bg, n_pad, n_pad), lambda i: (i, 0, 0))
    shape = jax.ShapeDtypeStruct(q3.shape, q3.dtype)
    bshape = jax.ShapeDtypeStruct(b3.shape, b3.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_bias, bg=bg, n_real=n_real,
                          n_pad=n_pad, sm_scale=sm_scale),
        grid=grid,
        in_specs=[spec, spec, spec, bspec, spec],
        out_specs=[spec, spec, spec, bspec],
        out_shape=[shape, shape, shape, bshape],
        interpret=interpret,
    )(q3, k3, v3, b3, do3)


def _bias_fwd_factory(params):
    bg, n_real, interpret = params

    def fn(q3, k3, v3, b3):
        sm_scale = q3.shape[-1] ** -0.5
        return _pallas_fwd_bias(q3, k3, v3, b3, bg, n_real, q3.shape[1],
                                sm_scale, interpret)
    return fn


def _bias_bwd_factory(params):
    bg, n_real, interpret = params

    def fn(q3, k3, v3, b3, do3):
        sm_scale = q3.shape[-1] ** -0.5
        return _pallas_bwd_bias(q3, k3, v3, b3, do3, bg, n_real,
                                q3.shape[1], sm_scale, interpret)
    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_bias(q3, k3, v3, b3, bg, n_real, n_pad, interpret):
    from .partitioning import cached_axis0
    fn = cached_axis0(_bias_fwd_factory, (bg, n_real, interpret),
                      "g n d, g n d, g n d, g n m -> g n d")
    return fn(q3, k3, v3, b3)


def _fused_bias_fwd(q3, k3, v3, b3, bg, n_real, n_pad, interpret):
    return (_fused_bias(q3, k3, v3, b3, bg, n_real, n_pad, interpret),
            (q3, k3, v3, b3))


def _fused_bias_bwd(bg, n_real, n_pad, interpret, res, g_out):
    q3, k3, v3, b3 = res
    from .partitioning import cached_axis0
    fn = cached_axis0(
        _bias_bwd_factory, (bg, n_real, interpret),
        "g n d, g n d, g n d, g n m, g n d"
        " -> g n d, g n d, g n d, g n m")
    dq, dk, dv, db = fn(q3, k3, v3, b3, g_out.astype(q3.dtype))
    return dq, dk, dv, db


_fused_bias.defvjp(_fused_bias_fwd, _fused_bias_bwd)


# ------------------------------------------- lane-aligned packed variant
# Zero-HBM-layout-copy attention over the NATIVE Dense layouts: input is
# the fused-qkv Dense output [B, N, 3C] untouched, output is [B, N, C]
# ready for the proj Dense. The round-3 step trace showed 47 ms/step of
# pure layout copies around the [B,H,N,D] kernel (transposes + their VJP
# twins) in a 270 ms ViT-B bs256 step — this variant removes all of them.
#
# The trick that makes Mosaic happy: blocks keep (n, C) as the trailing
# (sublane, lane) dims, and heads are processed as 128-lane TILES. For
# d=64 a tile holds a PAIR of heads; contracting "only head 2j's lanes"
# is done by zeroing the other head's 64 lanes of k (or v / q / ds) with
# a constant lane mask before a full 128-lane dot — algebraically exact,
# and free on the MXU, which pads 64-lane contractions to 128 anyway.
# Every slice/store is 128-aligned, so no unsupported relayouts.
#
# Measured v5e bf16, full ViT-B/16 bs256 train step: 209.0 ms/step
# (1225 img/s, MFU 0.328) vs 273.9 with the transpose-wrapped kernel and
# 280.5 with XLA attention — the step's layout-copy category collapses
# from 47 ms to ~0 (tools/perf/analyze_xplane.py over /tmp/trace_pairs);
# in-situ kernel cost is ~1.0 ms fwd / ~1.8 ms bwd per layer-batch.


def _mask_pair(n, lane, lo):
    col = jax.lax.broadcasted_iota(jnp.int32, (n, lane), 1)
    keep = (col < lane // 2) if lo else (col >= lane // 2)
    return keep


def _fwd_kernel_pairs(qkv_ref, o_ref, *, c, hpt, n_real, n_pad, sm_scale):
    """qkv_ref block (1, n, 3C); o_ref block (1, n, C). hpt = heads per
    128-lane tile (2 for d=64, 1 for d=128)."""
    lane = 128
    qkv = qkv_ref[0]
    kmask = None
    if n_real < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        kmask = jnp.where(col < n_real, 0.0, _NEG_INF).astype(jnp.float32)
    if hpt == 2:
        m_lo = _mask_pair(n_pad, lane, True)
        m_hi = _mask_pair(n_pad, lane, False)
    for j in range(c // lane):
        qp = qkv[:, j * lane:(j + 1) * lane]
        kp = qkv[:, c + j * lane:c + (j + 1) * lane]
        vp = qkv[:, 2 * c + j * lane:2 * c + (j + 1) * lane]
        if hpt == 1:
            parts = [(kp, vp, None)]
        else:
            zero = jnp.zeros((), qp.dtype)
            parts = [(jnp.where(m_lo, kp, zero), vp, m_lo),
                     (jnp.where(m_hi, kp, zero), vp, m_hi)]
        acc = None
        for k_h, vp_full, m in parts:
            s = jax.lax.dot_general(
                qp, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            if kmask is not None:
                s = s + kmask
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = (p / l).astype(qp.dtype)
            v_h = vp_full if m is None else jnp.where(m, vp_full,
                                                      jnp.zeros((),
                                                                qp.dtype))
            o = jax.lax.dot_general(
                p, v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = o if acc is None else acc + o
        o_ref[0, :, j * lane:(j + 1) * lane] = acc.astype(o_ref.dtype)


def _bwd_kernel_pairs(qkv_ref, do_ref, dqkv_ref, *, c, hpt, n_real,
                      n_pad, sm_scale):
    lane = 128
    qkv = qkv_ref[0]
    do_full = do_ref[0]
    kmask = None
    if n_real < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        kmask = jnp.where(col < n_real, 0.0, _NEG_INF).astype(jnp.float32)
    if hpt == 2:
        m_lo = _mask_pair(n_pad, lane, True)
        m_hi = _mask_pair(n_pad, lane, False)
        masks = [m_lo, m_hi]
    else:
        masks = [None]
    for j in range(c // lane):
        sl = slice(j * lane, (j + 1) * lane)
        qp = qkv[:, sl]
        kp = qkv[:, c + j * lane:c + (j + 1) * lane]
        vp = qkv[:, 2 * c + j * lane:2 * c + (j + 1) * lane]
        do_p = do_full[:, sl]
        dq = dk = dv = None
        zero = jnp.zeros((), qp.dtype)
        for m in masks:
            k_h = kp if m is None else jnp.where(m, kp, zero)
            do_h = do_p if m is None else jnp.where(m, do_p, zero)
            q_h = qp if m is None else jnp.where(m, qp, zero)
            s = jax.lax.dot_general(
                qp, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            if kmask is not None:
                s = s + kmask
            mx = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - mx)
            l = jnp.sum(e, axis=-1, keepdims=True)
            p = e / l
            pb = p.astype(qp.dtype)
            dv_h = jax.lax.dot_general(
                pb, do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do_h, vp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            row = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = (p * (dp - row) * sm_scale).astype(qp.dtype)
            dq_h = jax.lax.dot_general(
                ds, k_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk_h = jax.lax.dot_general(
                ds, q_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq = dq_h if dq is None else dq + dq_h
            dk = dk_h if dk is None else dk + dk_h
            dv = dv_h if dv is None else dv + dv_h
        dqkv_ref[0, :, sl] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, c + j * lane:c + (j + 1) * lane] = \
            dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * c + j * lane:2 * c + (j + 1) * lane] = \
            dv.astype(dqkv_ref.dtype)


def _pallas_fwd_pairs(qkv, c, hpt, n_real, sm_scale, interpret):
    b, n, c3 = qkv.shape
    grid = (b,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_pairs, c=c, hpt=hpt, n_real=n_real,
                          n_pad=n, sm_scale=sm_scale),
        grid=grid,
        in_specs=[pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        interpret=interpret,
    )(qkv)


def _pallas_bwd_pairs(qkv, do3, c, hpt, n_real, sm_scale, interpret):
    b, n, c3 = qkv.shape
    grid = (b,)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_pairs, c=c, hpt=hpt, n_real=n_real,
                          n_pad=n, sm_scale=sm_scale),
        grid=grid,
        in_specs=[pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, n, c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        interpret=interpret,
    )(qkv, do3)


def _pairs_fwd_factory(params):
    c, hpt, n_real, interpret, sm_scale = params

    def fn(qkv):
        return _pallas_fwd_pairs(qkv, c, hpt, n_real, sm_scale, interpret)
    return fn


def _pairs_bwd_factory(params):
    c, hpt, n_real, interpret, sm_scale = params

    def fn(qkv, do3):
        return _pallas_bwd_pairs(qkv, do3, c, hpt, n_real, sm_scale,
                                 interpret)
    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _fused_pairs(qkv, c, hpt, n_real, interpret, sm_scale):
    from .partitioning import cached_axis0
    fn = cached_axis0(_pairs_fwd_factory,
                      (c, hpt, n_real, interpret, sm_scale),
                      "b n q -> b n c")
    return fn(qkv)


def _fused_pairs_fwd(qkv, c, hpt, n_real, interpret, sm_scale):
    return _fused_pairs(qkv, c, hpt, n_real, interpret, sm_scale), (qkv,)


def _fused_pairs_bwd(c, hpt, n_real, interpret, sm_scale, res, g_out):
    (qkv,) = res
    from .partitioning import cached_axis0
    fn = cached_axis0(_pairs_bwd_factory,
                      (c, hpt, n_real, interpret, sm_scale),
                      "b n q, b n c -> b n q")
    dqkv = fn(qkv, g_out.astype(qkv.dtype))
    return (dqkv,)


_fused_pairs.defvjp(_fused_pairs_fwd, _fused_pairs_bwd)


def fused_attention_dense(qkv, head_nums, n_real=None,
                          force_pallas=False, interpret=False,
                          sm_scale=None):
    """Self-attention straight over the fused-qkv Dense output [B, N, 3C]
    (column order [3, H, D], i.e. reshape(B,N,3,H,D)-compatible); returns
    [B, N, C]. Head dim must be 64 or 128 for the pallas path (lane-tile
    alignment); anything else / off-TPU falls back to XLA."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // head_nums
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    use_pallas = (interpret or
                  (force_pallas and on_tpu and d in (64, 128)
                   and n <= 1024))
    if not use_pallas or d not in (64, 128):
        qkv5 = qkv.reshape(b, n, 3, head_nums, d)
        q, k, v = (qkv5[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        if sm_scale is not None:  # e.g. padded heads keep the REAL scale
            q = q * (sm_scale * d ** 0.5)
        out = _reference(q, k, v,
                         n_real if n_real is not None and n_real < n
                         else None)
        return out.transpose(0, 2, 1, 3).reshape(b, n, c)

    n_real = n if n_real is None else min(n_real, n)
    hpt = 128 // d
    if sm_scale is None:
        sm_scale = (128 // hpt) ** -0.5
    return _fused_pairs(qkv, c, hpt, n_real, interpret, float(sm_scale))


# ------------------------------------------------- packed-qkv variant
# The [B,H,N,D] API above still pays HBM layout copies around the kernel:
# a fused-qkv Dense emits [B,N,3,H,D], and transposing that to [3,B,H,N,D]
# (plus the output back to [B,N,C], plus the same copies again in the VJP)
# moves ~230 MB per ViT-B layer per direction. This variant reads q/k/v
# straight out of the packed [B,N,3,H,D] block and writes [B,N,H,D], so
# the surrounding reshapes are free and the backward emits dqkv already
# packed for the Dense VJP.
#
# STATUS: interpret-mode exact (tests/test_fused_kernels.py) but Mosaic
# rejects the layout on real TPU ("infer-vector-layout: unsupported shape
# cast"): with block (1,n,3,hg,d) the trailing (hg,d) dims become the
# (sublane,lane) tile, so every per-head (n,d) slice needs an
# outer<->sublane relayout Mosaic cannot do. A working zero-copy design
# needs each head's (n,d) as its block's trailing dims (DMA-side gather),
# so on TPU this falls back to XLA until that lands; the model wiring
# uses the [B,H,N,D] kernel with explicit transposes.


def _fwd_kernel_packed(qkv_ref, o_ref, *, hg, n_real, n_pad, sm_scale):
    mask = None
    if n_real < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        mask = jnp.where(col < n_real, 0.0, _NEG_INF).astype(jnp.float32)
    for g in range(hg):
        q = qkv_ref[0, :, 0, g, :]           # [n_pad, d]
        k = qkv_ref[0, :, 1, g, :]
        v = qkv_ref[0, :, 2, g, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(q.dtype)
        o_ref[0, :, g, :] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel_packed(qkv_ref, do_ref, dqkv_ref, *, hg, n_real, n_pad,
                       sm_scale):
    mask = None
    if n_real < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        mask = jnp.where(col < n_real, 0.0, _NEG_INF).astype(jnp.float32)
    for g in range(hg):
        q = qkv_ref[0, :, 0, g, :]
        k = qkv_ref[0, :, 1, g, :]
        v = qkv_ref[0, :, 2, g, :]
        do = do_ref[0, :, g, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        p = e / l
        pb = p.astype(q.dtype)
        dqkv_ref[0, :, 2, g, :] = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dqkv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - row) * sm_scale).astype(q.dtype)
        dqkv_ref[0, :, 0, g, :] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 1, g, :] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dqkv_ref.dtype)


def _pallas_fwd_packed(qkv5, hg, n_real, sm_scale, interpret):
    b, n, _, h, d = qkv5.shape
    grid = (b, h // hg)
    in_spec = pl.BlockSpec((1, n, 3, hg, d), lambda i, j: (i, 0, 0, j, 0))
    out_spec = pl.BlockSpec((1, n, hg, d), lambda i, j: (i, 0, j, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel_packed, hg=hg, n_real=n_real,
                          n_pad=n, sm_scale=sm_scale),
        grid=grid,
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, h, d), qkv5.dtype),
        interpret=interpret,
    )(qkv5)


def _pallas_bwd_packed(qkv5, do4, hg, n_real, sm_scale, interpret):
    b, n, _, h, d = qkv5.shape
    grid = (b, h // hg)
    qkv_spec = pl.BlockSpec((1, n, 3, hg, d), lambda i, j: (i, 0, 0, j, 0))
    do_spec = pl.BlockSpec((1, n, hg, d), lambda i, j: (i, 0, j, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel_packed, hg=hg, n_real=n_real,
                          n_pad=n, sm_scale=sm_scale),
        grid=grid,
        in_specs=[qkv_spec, do_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(qkv5.shape, qkv5.dtype),
        interpret=interpret,
    )(qkv5, do4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fused_packed(qkv5, hg, n_real, interpret):
    sm_scale = qkv5.shape[-1] ** -0.5
    return _pallas_fwd_packed(qkv5, hg, n_real, sm_scale, interpret)


def _fused_packed_fwd(qkv5, hg, n_real, interpret):
    return _fused_packed(qkv5, hg, n_real, interpret), (qkv5,)


def _fused_packed_bwd(hg, n_real, interpret, res, g_out):
    (qkv5,) = res
    sm_scale = qkv5.shape[-1] ** -0.5
    dqkv = _pallas_bwd_packed(qkv5, g_out.astype(qkv5.dtype), hg, n_real,
                              sm_scale, interpret)
    return (dqkv,)


_fused_packed.defvjp(_fused_packed_fwd, _fused_packed_bwd)


def fused_attention_qkv(qkv, n_real=None, block_heads=16,
                        force_pallas=False, interpret=False):
    """Self-attention over a PACKED fused-qkv tensor [B, N, 3, H, D] (the
    natural reshape of a fused qkv Dense output); returns [B, N, H, D].

    No HBM layout copies in or out: q/k/v are strided slices of one
    contiguous VMEM block per (batch, head-group) grid step, and the
    gradient is emitted packed. n_real (static) masks trailing padded
    keys. Off-TPU, for D > 128, or N > 1024, falls back to XLA."""
    b, n, three, h, d = qkv.shape
    assert three == 3
    if not interpret:  # Mosaic layout limitation — see STATUS above
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        out = _reference(q, k, v,
                         n_real if n_real is not None and n_real < n
                         else None)
        return out.transpose(0, 2, 1, 3)

    n_real = n if n_real is None else min(n_real, n)
    hg = min(block_heads, h)
    while h % hg:
        hg -= 1
    return _fused_packed(qkv, hg, n_real, interpret)


# ----------------------------- decomposed rel-pos windowed variant
# Same whole-window in-VMEM attention as the biased variant, but the SAM
# windowed rel-pos bias stays DECOMPOSED: inputs are the tiny q-contracted
# rel_h [g, n, KH] / rel_w [g, n, KW] terms (n = KH*KW) and the
# bias[i, jh*KW+jw] = rel_h[i, jh] + rel_w[i, jw] expansion happens
# in-kernel via static one-hot matmuls (exact in fp32). Removes every HBM
# round-trip of the [g, n, n] bias: the biased path costs
# write(bias) + 2x read + write(dbias) + read(dbias-VJP) — ~5 x 184 MB
# per SAM-B windowed block at bs4. Backward contracts d_rel directly
# in-kernel (d_rel_h = ds0 @ kh_oh^T), so no [n, n] tensor exists
# anywhere for this path.


def _win_onehot_comb(kh_size, kw_size, n):
    """Combined one-hot selector [KH+KW, n] (row i < KH: kh_j == i; row
    KH+i: kw_j == i). With rel = [rel_h | rel_w] on the lane axis, ONE
    dot expands bias[i, jh*KW+jw] = rel_h[i, jh] + rel_w[i, jw] exactly
    (two unit entries per column, fp32 add) — halves the rel dots and
    drops one full [n, n] bias-add sweep per score computation."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    kh_j = col // kw_size
    kw_j = col % kw_size
    rows = jax.lax.broadcasted_iota(jnp.int32, (kh_size + kw_size, 1), 0)
    # sum of two masked indicators (a boolean select here lowers to an
    # i8->i1 truncation Mosaic rejects)
    hit_h = ((rows < kh_size) & (rows == kh_j)).astype(jnp.float32)
    hit_w = ((rows >= kh_size) & (rows - kh_size == kw_j)).astype(
        jnp.float32)
    return hit_h + hit_w


def _fwd_kernel_relwin(q_ref, k_ref, v_ref, rel_ref, o_ref, *, bg,
                       n_real, n_pad, sm_scale, kh_size, kw_size):
    mask = None
    if n_real < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        mask = jnp.where(col < n_real, 0.0, _NEG_INF).astype(jnp.float32)
    oh = _win_onehot_comb(kh_size, kw_size, n_pad)
    for g in range(bg):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = s + jax.lax.dot_general(
            rel_ref[g].astype(jnp.float32), oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(q.dtype)
        o_ref[g] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel_relwin(q_ref, k_ref, v_ref, rel_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, drel_ref, *, bg,
                       n_real, n_pad, sm_scale, kh_size, kw_size):
    mask = None
    if n_real < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        mask = jnp.where(col < n_real, 0.0, _NEG_INF).astype(jnp.float32)
    oh = _win_onehot_comb(kh_size, kw_size, n_pad)
    for g in range(bg):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        do = do_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = s + jax.lax.dot_general(
            rel_ref[g].astype(jnp.float32), oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        p = e / l
        pb = p.astype(q.dtype)
        dv_ref[g] = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds0 = p * (dp - row)                   # d/dbias (no sm_scale)
        drel_ref[g] = jax.lax.dot_general(
            ds0, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(drel_ref.dtype)
        ds = (ds0 * sm_scale).astype(q.dtype)
        dq_ref[g] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[g] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _relwin_fwd_factory(params):
    bg, n_real, kh_size, kw_size, interpret = params

    def fn(q3, k3, v3, rel3):
        g_total, n_pad, d = q3.shape
        sm_scale = d ** -0.5
        grid = (g_total // bg,)
        spec = pl.BlockSpec((bg, n_pad, d), lambda i: (i, 0, 0))
        relspec = pl.BlockSpec((bg, n_pad, kh_size + kw_size),
                               lambda i: (i, 0, 0))
        return pl.pallas_call(
            functools.partial(_fwd_kernel_relwin, bg=bg, n_real=n_real,
                              n_pad=n_pad, sm_scale=sm_scale,
                              kh_size=kh_size, kw_size=kw_size),
            grid=grid,
            in_specs=[spec, spec, spec, relspec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(q3.shape, q3.dtype),
            interpret=interpret,
        )(q3, k3, v3, rel3)
    return fn


def _relwin_bwd_factory(params):
    bg, n_real, kh_size, kw_size, interpret = params

    def fn(q3, k3, v3, rel3, do3):
        g_total, n_pad, d = q3.shape
        sm_scale = d ** -0.5
        grid = (g_total // bg,)
        spec = pl.BlockSpec((bg, n_pad, d), lambda i: (i, 0, 0))
        relspec = pl.BlockSpec((bg, n_pad, kh_size + kw_size),
                               lambda i: (i, 0, 0))
        shape = jax.ShapeDtypeStruct(q3.shape, q3.dtype)
        return pl.pallas_call(
            functools.partial(_bwd_kernel_relwin, bg=bg, n_real=n_real,
                              n_pad=n_pad, sm_scale=sm_scale,
                              kh_size=kh_size, kw_size=kw_size),
            grid=grid,
            in_specs=[spec, spec, spec, relspec, spec],
            out_specs=[spec, spec, spec, relspec],
            out_shape=[shape, shape, shape,
                       jax.ShapeDtypeStruct(rel3.shape, rel3.dtype)],
            interpret=interpret,
        )(q3, k3, v3, rel3, do3)
    return fn


_RELWIN_FWD_RULE = "g n d, g n d, g n d, g n r -> g n d"
_RELWIN_BWD_RULE = ("g n d, g n d, g n d, g n r, g n d"
                    " -> g n d, g n d, g n d, g n r")


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused_relwin(q3, k3, v3, rel3, bg, n_real, kh_size, kw_size,
                  interpret):
    from .partitioning import cached_axis0
    fn = cached_axis0(_relwin_fwd_factory,
                      (bg, n_real, kh_size, kw_size, interpret),
                      _RELWIN_FWD_RULE)
    return fn(q3, k3, v3, rel3)


def _fused_relwin_fwd(q3, k3, v3, rel3, bg, n_real, kh_size, kw_size,
                      interpret):
    out = _fused_relwin(q3, k3, v3, rel3, bg, n_real, kh_size,
                        kw_size, interpret)
    return out, (q3, k3, v3, rel3)


def _fused_relwin_bwd(bg, n_real, kh_size, kw_size, interpret, res, g_out):
    q3, k3, v3, rel3 = res
    from .partitioning import cached_axis0
    fn = cached_axis0(_relwin_bwd_factory,
                      (bg, n_real, kh_size, kw_size, interpret),
                      _RELWIN_BWD_RULE)
    return fn(q3, k3, v3, rel3, g_out.astype(q3.dtype))


_fused_relwin.defvjp(_fused_relwin_fwd, _fused_relwin_bwd)


def fused_attention_relwin(q, k, v, rel_h, rel_w, n_real=None,
                           block_heads=8, force_pallas=False,
                           interpret=False):
    """Whole-window fused attention with DECOMPOSED rel-pos terms:
    score[i, jh*KW+jw] = q.k*scale + rel_h[i, jh] + rel_w[i, jw].

    q/k/v [B, H, N, D]; rel_h [B, H, N, KH]; rel_w [B, H, N, KW] with
    N == KH * KW (SAM windowed attention: N=196, KH=KW=14). Exact same
    numerics as materializing the bias (one-hot expansion in fp32), with
    gradients to q/k/v and both rel terms; the [N, N] bias/probs never
    reach HBM in forward OR backward. Falls back to the XLA composition
    off-TPU, for D > 128, or N > 1024."""
    b, h, n, d = q.shape
    kh_size = rel_h.shape[-1]
    kw_size = rel_w.shape[-1]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    ok = (n == kh_size * kw_size and d <= 128 and n <= 1024)
    if not (ok and (interpret or (force_pallas and on_tpu))):
        bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(
            b, h, n, kh_size * kw_size)
        if bias.shape[-1] != n:  # decomposition mismatch: plain fallback
            bias = bias[..., :n]
        return _reference_bias(q, k, v, bias,
                               n_real if n_real is not None and n_real < n
                               else None)

    n_real = n if n_real is None else min(n_real, n)
    g_total = b * h
    bg = block_heads
    while g_total % bg:
        bg //= 2
    # [rh | rw] on the lane axis: the kernel expands the combined bias
    # with ONE one-hot dot; concat's VJP splits d_rel back automatically.
    rel3 = jnp.concatenate(
        [rel_h.reshape(g_total, n, kh_size).astype(jnp.float32),
         rel_w.reshape(g_total, n, kw_size).astype(jnp.float32)], axis=-1)
    out = _fused_relwin(q.reshape(g_total, n, d), k.reshape(g_total, n, d),
                        v.reshape(g_total, n, d), rel3,
                        bg, n_real, kh_size, kw_size, interpret)
    return out.reshape(b, h, n, d)


# ---------------- packed-qkv decomposed rel-pos windowed variant
# fused_attention_relwin above still pays the [B,N,3,H,D] -> [3,B,H,N,D]
# layout copies around the kernel (plus the same again in the VJP, plus
# the rel reshapes): the round-5 bs4 SAM-B step trace attributes ~35 ms
# of the 222 ms step to exactly these copies. This variant mirrors
# fused_attention_dense/_fused_pairs: it reads q/k/v straight from the
# packed qkv Dense output [B, N, 3C] as 128-lane head-pair tiles (the
# other head's lanes masked — exact, and contraction-128 dots cost the
# MXU the same as contraction-64), expands the decomposed rel-pos bias
# in-kernel from per-head packed rel [B, N, H*(KH+KW)], and emits
# dqkv/drel already packed.


def _fwd_kernel_relwin_pairs(qkv_ref, rel_ref, o_ref, *, c, hpt, n_pad,
                             kh_size, kw_size, sm_scale):
    lane = 128
    qkv = qkv_ref[0]
    rel = rel_ref[0]  # [n, H*(KH+KW)] fp32
    rw_ = kh_size + kw_size
    oh = _win_onehot_comb(kh_size, kw_size, n_pad)  # [KH+KW, n]
    if hpt == 2:
        masks = [_mask_pair(n_pad, lane, True),
                 _mask_pair(n_pad, lane, False)]
    else:
        masks = [None]
    zero = jnp.zeros((), qkv.dtype)
    for j in range(c // lane):
        qp = qkv[:, j * lane:(j + 1) * lane]
        kp = qkv[:, c + j * lane:c + (j + 1) * lane]
        vp = qkv[:, 2 * c + j * lane:2 * c + (j + 1) * lane]
        acc = None
        for idx, m in enumerate(masks):
            head = j * hpt + idx
            k_h = kp if m is None else jnp.where(m, kp, zero)
            r = rel[:, head * rw_:(head + 1) * rw_]
            bias = jax.lax.dot_general(
                r, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = jax.lax.dot_general(
                qp, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale + bias
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = (p / l).astype(qp.dtype)
            v_h = vp if m is None else jnp.where(m, vp, zero)
            o = jax.lax.dot_general(
                p, v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = o if acc is None else acc + o
        o_ref[0, :, j * lane:(j + 1) * lane] = acc.astype(o_ref.dtype)


def _bwd_kernel_relwin_pairs(qkv_ref, rel_ref, do_ref, dqkv_ref, drel_ref,
                             *, c, hpt, n_pad, kh_size, kw_size, sm_scale):
    lane = 128
    qkv = qkv_ref[0]
    rel = rel_ref[0]
    do_full = do_ref[0]
    rw_ = kh_size + kw_size
    oh = _win_onehot_comb(kh_size, kw_size, n_pad)
    if hpt == 2:
        masks = [_mask_pair(n_pad, lane, True),
                 _mask_pair(n_pad, lane, False)]
    else:
        masks = [None]
    zero = jnp.zeros((), qkv.dtype)
    for j in range(c // lane):
        sl = slice(j * lane, (j + 1) * lane)
        qp = qkv[:, sl]
        kp = qkv[:, c + j * lane:c + (j + 1) * lane]
        vp = qkv[:, 2 * c + j * lane:2 * c + (j + 1) * lane]
        do_p = do_full[:, sl]
        dq = dk = dv = None
        for idx, m in enumerate(masks):
            head = j * hpt + idx
            k_h = kp if m is None else jnp.where(m, kp, zero)
            do_h = do_p if m is None else jnp.where(m, do_p, zero)
            q_h = qp if m is None else jnp.where(m, qp, zero)
            r = rel[:, head * rw_:(head + 1) * rw_]
            bias = jax.lax.dot_general(
                r, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = jax.lax.dot_general(
                qp, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale + bias
            mx = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - mx)
            l = jnp.sum(e, axis=-1, keepdims=True)
            p = e / l
            pb = p.astype(qp.dtype)
            dv_h = jax.lax.dot_general(
                pb, do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do_h, vp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            row = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds0f = p * (dp - row)  # fp32, UNSCALED = d/dbias
            drel_ref[0, :, head * rw_:(head + 1) * rw_] = \
                jax.lax.dot_general(
                    ds0f, oh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(
                        drel_ref.dtype)
            ds = (ds0f * sm_scale).astype(qp.dtype)
            dq_h = jax.lax.dot_general(
                ds, k_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk_h = jax.lax.dot_general(
                ds, q_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq = dq_h if dq is None else dq + dq_h
            dk = dk_h if dk is None else dk + dk_h
            dv = dv_h if dv is None else dv + dv_h
        dqkv_ref[0, :, sl] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, c + j * lane:c + (j + 1) * lane] = \
            dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * c + j * lane:2 * c + (j + 1) * lane] = \
            dv.astype(dqkv_ref.dtype)


def _pallas_fwd_relwin_pairs(qkv, rel, c, hpt, kh_size, kw_size,
                             sm_scale, interpret):
    b, n, c3 = qkv.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel_relwin_pairs, c=c, hpt=hpt, n_pad=n,
                          kh_size=kh_size, kw_size=kw_size,
                          sm_scale=sm_scale),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, n, rel.shape[-1]),
                               lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        interpret=interpret,
    )(qkv, rel)


def _pallas_bwd_relwin_pairs(qkv, rel, do3, c, hpt, kh_size, kw_size,
                             sm_scale, interpret):
    b, n, c3 = qkv.shape
    return pl.pallas_call(
        functools.partial(_bwd_kernel_relwin_pairs, c=c, hpt=hpt, n_pad=n,
                          kh_size=kh_size, kw_size=kw_size,
                          sm_scale=sm_scale),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, n, rel.shape[-1]),
                               lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, n, c), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0)),
                   pl.BlockSpec((1, n, rel.shape[-1]),
                                lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
                   jax.ShapeDtypeStruct(rel.shape, rel.dtype)],
        interpret=interpret,
    )(qkv, rel, do3)


def _relwin_pairs_fwd_factory(params):
    c, hpt, kh_size, kw_size, interpret = params

    def fn(qkv, rel):
        sm_scale = (128 // hpt) ** -0.5
        return _pallas_fwd_relwin_pairs(qkv, rel, c, hpt, kh_size,
                                        kw_size, sm_scale, interpret)
    return fn


def _relwin_pairs_bwd_factory(params):
    c, hpt, kh_size, kw_size, interpret = params

    def fn(qkv, rel, do3):
        sm_scale = (128 // hpt) ** -0.5
        return _pallas_bwd_relwin_pairs(qkv, rel, do3, c, hpt, kh_size,
                                        kw_size, sm_scale, interpret)
    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _fused_relwin_pairs(qkv, rel, c, hpt, kh_size, kw_size, interpret):
    from .partitioning import cached_axis0
    fn = cached_axis0(_relwin_pairs_fwd_factory,
                      (c, hpt, kh_size, kw_size, interpret),
                      "b n q, b n r -> b n c")
    return fn(qkv, rel)


def _fused_relwin_pairs_fwd(qkv, rel, c, hpt, kh_size, kw_size,
                            interpret):
    out = _fused_relwin_pairs(qkv, rel, c, hpt, kh_size, kw_size,
                              interpret)
    return out, (qkv, rel)


def _fused_relwin_pairs_bwd(c, hpt, kh_size, kw_size, interpret, res,
                            g_out):
    qkv, rel = res
    from .partitioning import cached_axis0
    fn = cached_axis0(_relwin_pairs_bwd_factory,
                      (c, hpt, kh_size, kw_size, interpret),
                      "b n q, b n r, b n c -> b n q, b n r")
    dqkv, drel = fn(qkv, rel, g_out.astype(qkv.dtype))
    return dqkv, drel


_fused_relwin_pairs.defvjp(_fused_relwin_pairs_fwd,
                           _fused_relwin_pairs_bwd)


def fused_attention_relwin_dense(qkv, rel_h, rel_w, head_nums,
                                 force_pallas=False, interpret=False):
    """Zero-copy windowed rel-pos attention straight over the fused-qkv
    Dense output.

    qkv [B, N, 3C] (column order [3, H, D]); rel_h [B, N, H, KH] and
    rel_w [B, N, H, KW] fp32 (q-contracted decomposed terms in their
    natural einsum layout) with N == KH * KW; returns [B, N, C]. Exact
    same numerics as fused_attention_relwin; no layout copy touches the
    qkv/out tensors, and dqkv/drel come back packed. Head dim must be 64
    or 128 for the pallas path; off-TPU falls back to the XLA
    composition."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // head_nums
    kh_size = rel_h.shape[-1]
    kw_size = rel_w.shape[-1]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    use_pallas = (interpret or
                  (force_pallas and on_tpu and d in (64, 128)
                   and n <= 1024 and n == kh_size * kw_size))
    if not use_pallas:
        qkv5 = qkv.reshape(b, n, 3, head_nums, d)
        q, k, v = (qkv5[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(
            b, n, head_nums, kh_size * kw_size)[..., :n]
        bias = bias.transpose(0, 2, 1, 3)  # [B, H, N, N]
        out = _reference_bias(q, k, v, bias, None)
        return out.transpose(0, 2, 1, 3).reshape(b, n, c)

    rel = jnp.concatenate([rel_h.astype(jnp.float32),
                           rel_w.astype(jnp.float32)],
                          axis=-1).reshape(b, n,
                                           head_nums * (kh_size + kw_size))
    hpt = 128 // d
    return _fused_relwin_pairs(qkv, rel, c, hpt, kh_size, kw_size,
                               interpret)
