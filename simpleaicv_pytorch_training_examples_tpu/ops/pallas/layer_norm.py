"""Pallas TPU LayerNorm, fused forward + backward.

Why it exists: the round-3 train-step trace (tools/perf/analyze_xplane.py
over a ViT-B/16 bs256 step) showed XLA's LayerNorm costing ~48 ms of a
277 ms step (fwd `convert_reduce_fusion` 20.7 ms + bwd
`multiply_reduce_fusion` 27.8 ms across 25 norms), which looked ~4x off
the v5e HBM spec roofline.

Why it is NOT wired into the models: measuring the chip's actual
streaming bandwidth recalibrated the roofline — effective HBM bandwidth
on this part is ~241 GB/s (tools/perf/lab.py elementwise-chain probe),
which puts XLA's LayerNorm within ~1.2-1.4x of attainable. This kernel
(row-stat reductions as MXU dot-with-ones, fp32 stats in VMEM, fused
dgamma/dbeta accumulation) measured on-par-to-slower than XLA at the
ViT-B shape, so the XLA norm stays the production path. Kept with full
interpret-mode tests (tests/test_fused_kernels.py) as the starting point
for parts where the bandwidth/VPU balance differs.

fwd:  y = (x - mean) * rsqrt(var + eps) * gamma + beta     (per last dim)
bwd:  dx = rstd * (g - mean_c(g) - xhat * mean_c(g * xhat)), g = dy*gamma
      dgamma = sum_t dy * xhat ; dbeta = sum_t dy   (accumulated across
      sequential grid steps into a single [C] block)

API: layer_norm(x, gamma, beta, eps=1e-6, force_pallas=False) over the
last axis of any-rank x. Falls back to the plain jnp implementation
off-TPU (tests run the kernel via interpret mode separately).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x, m):
    return (x + m - 1) // m * m


def _reference(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * gamma.astype(jnp.float32) +
            beta.astype(jnp.float32)).astype(x.dtype)


def _row_mean(a, c):
    """Mean over the last (lane) axis via an MXU dot — far faster than the
    VPU cross-lane tree reduce. Returns [bt, 1] fp32."""
    ones = jnp.ones((c, 8), a.dtype)
    s = jax.lax.dot_general(a, ones, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return s[:, :1] * (1.0 / c)


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, mu_ref, rs_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)          # [bt, C]
    c = x.shape[-1]
    mean = _row_mean(x, c)
    # fast-variance formulation (flax use_fast_variance): E[x^2] - E[x]^2
    var = _row_mean(x * x, c) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    y = xhat * g_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    mu_ref[...] = mean
    rs_ref[...] = rstd


def _bwd_kernel(x_ref, g_ref, mu_ref, rs_ref, dy_ref, dx_ref, dg_ref,
                db_ref):
    step = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)
    rstd = rs_ref[...]
    c = x.shape[-1]
    xhat = (x - mu_ref[...]) * rstd
    g = dy * gamma
    mg = _row_mean(g, c)
    mgx = _row_mean(g * xhat, c)
    dx_ref[...] = (rstd * (g - mg - xhat * mgx)).astype(dx_ref.dtype)

    dg_blk = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_blk = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(step == 0)
    def _init():
        dg_ref[...] = dg_blk
        db_ref[...] = db_blk

    @pl.when(step != 0)
    def _acc():
        dg_ref[...] += dg_blk
        db_ref[...] += db_blk


def _run_fwd(x2, gamma, beta, eps, bt, interpret=False):
    t_pad, c = x2.shape
    grid = (t_pad // bt,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec((bt, c), lambda i: (i, 0)),
                  pl.BlockSpec((1, c), lambda i: (0, 0)),
                  pl.BlockSpec((1, c), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((bt, c), lambda i: (i, 0)),
                   pl.BlockSpec((bt, 1), lambda i: (i, 0)),
                   pl.BlockSpec((bt, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((t_pad, c), x2.dtype),
                   jax.ShapeDtypeStruct((t_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((t_pad, 1), jnp.float32)],
        interpret=interpret,
    )(x2, gamma[None], beta[None])


def _run_bwd(x2, gamma, mu, rstd, dy2, bt, interpret=False):
    t_pad, c = x2.shape
    grid = (t_pad // bt,)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bt, c), lambda i: (i, 0)),
                  pl.BlockSpec((1, c), lambda i: (0, 0)),
                  pl.BlockSpec((bt, 1), lambda i: (i, 0)),
                  pl.BlockSpec((bt, 1), lambda i: (i, 0)),
                  pl.BlockSpec((bt, c), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((bt, c), lambda i: (i, 0)),
                   pl.BlockSpec((1, c), lambda i: (0, 0)),
                   pl.BlockSpec((1, c), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((t_pad, c), dy2.dtype),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        interpret=interpret,
    )(x2, gamma[None], mu, rstd, dy2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ln(x2, gamma, beta, eps, bt, interpret):
    y, _, _ = _run_fwd(x2, gamma, beta, eps, bt, interpret)
    return y


def _ln_fwd(x2, gamma, beta, eps, bt, interpret):
    y, mu, rstd = _run_fwd(x2, gamma, beta, eps, bt, interpret)
    return y, (x2, gamma, mu, rstd)


def _ln_bwd(eps, bt, interpret, res, dy2):
    x2, gamma, mu, rstd = res
    dx, dg, db = _run_bwd(x2, gamma, mu, rstd, dy2, bt, interpret)
    return dx, dg[0].astype(gamma.dtype), db[0].astype(gamma.dtype)


_ln.defvjp(_ln_fwd, _ln_bwd)


def layer_norm(x, gamma, beta, eps=1e-6, block_tokens=512,
               force_pallas=False, interpret=False):
    """LayerNorm over the last axis; pallas-fused on TPU.

    x [..., C]; gamma/beta [C]. force_pallas gates the kernel (models set
    it from their use_fused_norm flag); interpret=True runs the kernel on
    CPU for tests."""
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not ((force_pallas and on_tpu) or interpret):
        return _reference(x, gamma, beta, eps)

    c = x.shape[-1]
    orig_shape = x.shape
    x2 = x.reshape(-1, c)
    t = x2.shape[0]
    # prefer a block size that divides t exactly: jnp.pad here would
    # stream the whole activation through HBM twice (~1.3 ms per norm at
    # ViT-B bs256 on the measured ~241 GB/s), wiping out any kernel win
    bt = None
    for cand in range(min(block_tokens, t), 7, -1):
        if t % cand == 0 and cand % 8 == 0:
            bt = cand
            break
    if bt is None:
        bt = min(block_tokens, _round_up(t, 8))
    t_pad = _round_up(t, bt)
    if t_pad != t:
        x2 = jnp.pad(x2, ((0, t_pad - t), (0, 0)))
    y = _ln(x2, gamma, beta, eps, bt, interpret)
    if t_pad != t:
        y = y[:t]
    return y.reshape(orig_shape)
