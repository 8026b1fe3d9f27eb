"""Pallas TPU fused transformer ATTENTION BLOCK: LN1 + fused-qkv Dense +
self-attention + proj Dense + residual in ONE kernel, forward and
backward.

Why: after the lane-aligned fused attention removed the layout copies
(fused_attention.py), the ViT-B/16 bs256 train step still spends ~0.8 ms
per LayerNorm, ~1.15 ms per qkv/proj Dense and ~3 ms attention per layer
— each op a separate HBM round-trip of the [B,N,C] activation at the
measured ~241 GB/s effective bandwidth. This kernel holds the block
weights resident in VMEM (Wqkv 3.5 MB + Wproj 1.2 MB bf16 at ViT-B) and
streams each batch item once: HBM traffic per layer collapses from ~5
tensors to x-in + y-out. Weight grads accumulate in fp32 VMEM scratch
across the sequential grid (same pattern as the LN kernel's dgamma).

Per-head attention uses the 128-lane head-pair masking trick from
fused_attention.py (d=64: two heads per lane tile, mask the other head's
columns before full-width dots — exact, and free on the MXU which pads
64-lane contractions anyway).

Backward recomputes LN/qkv/probs from x (flash-style), so the only saved
residual is x itself. It is split into two pallas calls to stay inside
VMEM: K1 (proj bwd + attention bwd -> dqkv, dWproj, dbproj), K2
(dWqkv/dbqkv + dxn -> LN bwd -> dx).

MEASURED RESULT (v5e, ViT-B/16 bs256 full train step): 234.3 ms/step —
SLOWER than the 209.0 ms of the separate pairs-attention kernel
(fused_attention.py) + XLA Dense/LN. The step trace shows each fused
block at 9.4 ms: the qkv/proj matmuls are MXU-bound, and splitting them
into per-sample [197, C] tiles loses the batching efficiency XLA gets on
the whole [B*N, C] matmul (plus the backward recompute doubles that
cost). Lesson recorded: on this part, fuse the BANDWIDTH-bound glue
(attention core, norms) and leave big matmuls batched in XLA. Kept
opt-in (ViT use_fused_block) with full interpret-mode exactness tests as
the starting point for chips where the balance differs.

API: attn_block(x, wqkv, bqkv, wproj, bproj, gamma, beta, head_nums,
eps=1e-6, force_pallas=False, interpret=False) with x [B, N, C]; weights
in the flax Dense/LayerNorm layouts. Falls back to plain XLA composition
off-TPU or when C//head_nums not in (64, 128) or N > 1024.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANE = 128


def _row_mean_mxu(a, c):
    """Mean over the last (lane) axis via an MXU dot-with-ones."""
    ones = jnp.ones((c, 8), a.dtype)
    s = jax.lax.dot_general(a, ones, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return s[:, :1] * (1.0 / c)


def _ln_fwd(x, gamma, beta, eps):
    """x (n, c) any dtype -> (xn bf16-like-x, xhat f32, rstd f32)."""
    xf = x.astype(jnp.float32)
    c = xf.shape[-1]
    mean = _row_mean_mxu(xf, c)
    var = _row_mean_mxu(xf * xf, c) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    xn = (xhat * gamma + beta).astype(x.dtype)
    return xn, xhat, rstd


def _mask_lo_hi(n, dtype):
    col = jax.lax.broadcasted_iota(jnp.int32, (n, _LANE), 1)
    lo = (col < _LANE // 2)
    return lo, jnp.logical_not(lo)


def _attention_pairs_fwd(qkv, c, hpt, sm_scale, out_dtype,
                         keep_probs=False):
    """qkv (n, 3c) -> attnout (n, c) via lane-tile head groups.
    keep_probs additionally returns the per-part fp32 prob matrices
    (bwd recompute path reuses this function)."""
    n = qkv.shape[0]
    if hpt == 2:
        m_lo, m_hi = _mask_lo_hi(n, qkv.dtype)
        masks = [m_lo, m_hi]
    else:
        masks = [None]
    zero = jnp.zeros((), qkv.dtype)
    tiles = []
    probs = []
    for j in range(c // _LANE):
        qp = qkv[:, j * _LANE:(j + 1) * _LANE]
        kp = qkv[:, c + j * _LANE:c + (j + 1) * _LANE]
        vp = qkv[:, 2 * c + j * _LANE:2 * c + (j + 1) * _LANE]
        acc = None
        for m in masks:
            k_h = kp if m is None else jnp.where(m, kp, zero)
            s = jax.lax.dot_general(
                qp, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = p / l
            if keep_probs:
                probs.append(p)
            pb = p.astype(qkv.dtype)
            v_h = vp if m is None else jnp.where(m, vp, zero)
            o = jax.lax.dot_general(
                pb, v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = o if acc is None else acc + o
        tiles.append(acc.astype(out_dtype))
    out = jnp.concatenate(tiles, axis=-1)
    return (out, probs) if keep_probs else out


def _fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                g1_ref, b1_ref, y_ref, *, c, hpt, eps):
    x = x_ref[0]                                       # (n, c)
    g1 = g1_ref[...].astype(jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32)
    xn, _, _ = _ln_fwd(x, g1, b1, eps)
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    sm_scale = (_LANE // hpt) ** -0.5
    attnout = _attention_pairs_fwd(qkv, c, hpt, sm_scale, x.dtype)
    y = jax.lax.dot_general(
        attnout, wproj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + bproj_ref[...].astype(jnp.float32) + x.astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


def _bwd_k1_kernel(x_ref, dy_ref, wqkv_ref, bqkv_ref, wproj_ref,
                   g1_ref, b1_ref,
                   dqkv_ref, dwproj_ref, dbproj_ref, *, c, hpt, eps):
    """Recompute xn/qkv/probs; proj bwd + attention bwd.
    Emits dqkv to HBM; accumulates dWproj/dbproj in fp32 output blocks
    (constant index => resident across the sequential grid)."""
    step = pl.program_id(0)
    x = x_ref[0]
    dy = dy_ref[0].astype(jnp.float32)                  # (n, c)
    g1 = g1_ref[...].astype(jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32)
    xn, _, _ = _ln_fwd(x, g1, b1, eps)
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    sm_scale = (_LANE // hpt) ** -0.5
    attnout, probs = _attention_pairs_fwd(qkv, c, hpt, sm_scale, x.dtype,
                                          keep_probs=True)

    # proj bwd
    dyb = dy.astype(x.dtype)
    dwproj_blk = jax.lax.dot_general(
        attnout, dyb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (c, c)
    dbproj_blk = jnp.sum(dy, axis=0, keepdims=True)     # (1, c)
    dattn = jax.lax.dot_general(
        dyb, wproj_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)  # (n, c)

    # attention bwd per lane tile (head pair)
    n = x.shape[0]
    if hpt == 2:
        m_lo, m_hi = _mask_lo_hi(n, x.dtype)
        masks = [m_lo, m_hi]
    else:
        masks = [None]
    zero = jnp.zeros((), x.dtype)
    pi = 0
    for j in range(c // _LANE):
        sl = slice(j * _LANE, (j + 1) * _LANE)
        qp = qkv[:, sl]
        kp = qkv[:, c + j * _LANE:c + (j + 1) * _LANE]
        vp = qkv[:, 2 * c + j * _LANE:2 * c + (j + 1) * _LANE]
        do_p = dattn[:, sl]
        dq = dk = dv = None
        for m in masks:
            p = probs[pi]
            pi += 1
            k_h = kp if m is None else jnp.where(m, kp, zero)
            do_h = do_p if m is None else jnp.where(m, do_p, zero)
            q_h = qp if m is None else jnp.where(m, qp, zero)
            pb = p.astype(x.dtype)
            dv_h = jax.lax.dot_general(
                pb, do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do_h, vp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            row = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = (p * (dp - row) * sm_scale).astype(x.dtype)
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
        dqkv_ref[0, :, c + j * _LANE:c + (j + 1) * _LANE] = \
            dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * c + j * _LANE:2 * c + (j + 1) * _LANE] = \
            dv.astype(dqkv_ref.dtype)

    @pl.when(step == 0)
    def _init():
        dwproj_ref[...] = dwproj_blk
        dbproj_ref[...] = dbproj_blk

    @pl.when(step != 0)
    def _acc():
        dwproj_ref[...] += dwproj_blk
        dbproj_ref[...] += dbproj_blk


def _bwd_k2_kernel(x_ref, dy_ref, dqkv_ref, wqkv_ref, g1_ref, b1_ref,
                   dx_ref, dwqkv_ref, dbqkv_ref, dg1_ref, db1_ref, *,
                   c, eps):
    """dWqkv/dbqkv accumulation + dxn -> LN1 bwd -> dx (+ residual dy)."""
    step = pl.program_id(0)
    x = x_ref[0]
    dy = dy_ref[0].astype(jnp.float32)
    dqkv = dqkv_ref[0]                                  # (n, 3c) bf16
    g1 = g1_ref[...].astype(jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32)
    xn, xhat, rstd = _ln_fwd(x, g1, b1, eps)

    dwqkv_blk = jax.lax.dot_general(
        xn, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (c, 3c)
    dbqkv_blk = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)

    dxn = jax.lax.dot_general(
        dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (n, c) f32
    g = dxn * g1
    mg = _row_mean_mxu(g, c)
    mgx = _row_mean_mxu(g * xhat, c)
    dx_ln = rstd * (g - mg - xhat * mgx)
    dg1_blk = jnp.sum(dxn * xhat, axis=0, keepdims=True)
    db1_blk = jnp.sum(dxn, axis=0, keepdims=True)
    dx_ref[0] = (dx_ln + dy).astype(dx_ref.dtype)

    @pl.when(step == 0)
    def _init():
        dwqkv_ref[...] = dwqkv_blk
        dbqkv_ref[...] = dbqkv_blk
        dg1_ref[...] = dg1_blk
        db1_ref[...] = db1_blk

    @pl.when(step != 0)
    def _acc():
        dwqkv_ref[...] += dwqkv_blk
        dbqkv_ref[...] += dbqkv_blk
        dg1_ref[...] += dg1_blk
        db1_ref[...] += db1_blk


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd)


def _run_fwd(x, wqkv, bqkv, wproj, bproj, g1, b1, c, hpt, eps,
             interpret):
    b, n, _ = x.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, hpt=hpt, eps=eps),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
                  _const_spec((c, 3 * c)),
                  _const_spec((1, 3 * c)),
                  _const_spec((c, c)),
                  _const_spec((1, c)),
                  _const_spec((1, c)),
                  _const_spec((1, c))],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, wqkv, bqkv[None], wproj, bproj[None], g1[None], b1[None])


def _run_bwd(x, dy, wqkv, bqkv, wproj, g1, b1, c, hpt, eps, interpret):
    b, n, _ = x.shape
    xspec = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0))
    qspec = pl.BlockSpec((1, n, 3 * c), lambda i: (i, 0, 0))
    dqkv, dwproj, dbproj = pl.pallas_call(
        functools.partial(_bwd_k1_kernel, c=c, hpt=hpt, eps=eps),
        grid=(b,),
        in_specs=[xspec, xspec,
                  _const_spec((c, 3 * c)),
                  _const_spec((1, 3 * c)),
                  _const_spec((c, c)),
                  _const_spec((1, c)),
                  _const_spec((1, c))],
        out_specs=[qspec,
                   _const_spec((c, c)),
                   _const_spec((1, c))],
        out_shape=[jax.ShapeDtypeStruct((b, n, 3 * c), x.dtype),
                   jax.ShapeDtypeStruct((c, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        interpret=interpret,
    )(x, dy, wqkv, bqkv[None], wproj, g1[None], b1[None])

    dx, dwqkv, dbqkv, dg1, db1 = pl.pallas_call(
        functools.partial(_bwd_k2_kernel, c=c, eps=eps),
        grid=(b,),
        in_specs=[xspec, xspec, qspec,
                  _const_spec((c, 3 * c)),
                  _const_spec((1, c)),
                  _const_spec((1, c))],
        out_specs=[xspec,
                   _const_spec((c, 3 * c)),
                   _const_spec((1, 3 * c)),
                   _const_spec((1, c)),
                   _const_spec((1, c))],
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        interpret=interpret,
    )(x, dy, dqkv, wqkv, g1[None], b1[None])
    return dx, dwqkv, dbqkv[0], dwproj, dbproj[0], dg1[0], db1[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _block(x, wqkv, bqkv, wproj, bproj, g1, b1, hpt, eps, interpret):
    c = x.shape[-1]
    return _run_fwd(x, wqkv, bqkv, wproj, bproj, g1, b1, c, hpt, eps,
                    interpret)


def _block_fwd(x, wqkv, bqkv, wproj, bproj, g1, b1, hpt, eps, interpret):
    y = _block(x, wqkv, bqkv, wproj, bproj, g1, b1, hpt, eps, interpret)
    return y, (x, wqkv, bqkv, wproj, g1, b1)


def _block_bwd(hpt, eps, interpret, res, dy):
    x, wqkv, bqkv, wproj, g1, b1 = res
    c = x.shape[-1]
    dx, dwqkv, dbqkv, dwproj, dbproj, dg1, db1 = _run_bwd(
        x, dy.astype(x.dtype), wqkv, bqkv, wproj, g1, b1, c, hpt, eps,
        interpret)
    return (dx, dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
            dwproj.astype(wproj.dtype), dbproj.astype(wproj.dtype),
            dg1.astype(g1.dtype), db1.astype(b1.dtype))


_block.defvjp(_block_fwd, _block_bwd)


def _reference_block(x, wqkv, bqkv, wproj, bproj, gamma, beta, head_nums,
                     eps):
    """Plain XLA composition (fallback + tests)."""
    b, n, c = x.shape
    d = c // head_nums
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)
          * gamma.astype(jnp.float32)
          + beta.astype(jnp.float32)).astype(x.dtype)
    qkv = (xn @ wqkv.astype(x.dtype)) + bqkv.astype(x.dtype)
    qkv5 = qkv.reshape(b, n, 3, head_nums, d)
    q, k, v = (qkv5[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, c)
    y = (o @ wproj.astype(x.dtype)) + bproj.astype(x.dtype)
    return y.astype(jnp.float32).astype(x.dtype) + x


def attn_block(x, wqkv, bqkv, wproj, bproj, gamma, beta, head_nums,
               eps=1e-6, force_pallas=False, interpret=False):
    """Fused LN1+qkv+attention+proj+residual; see module docstring."""
    b, n, c = x.shape
    d = c // head_nums
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not (interpret or
            (force_pallas and on_tpu and d in (64, 128) and n <= 1024)):
        return _reference_block(x, wqkv, bqkv, wproj, bproj, gamma, beta,
                                head_nums, eps)
    hpt = _LANE // d
    return _block(x, wqkv, bqkv, wproj, bproj, gamma, beta, hpt, eps,
                  interpret)
