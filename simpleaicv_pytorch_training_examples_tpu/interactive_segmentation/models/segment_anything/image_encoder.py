"""SAM ViT image encoder, NHWC flax.

Parity with /root/reference/SimpleAICV/interactive_segmentation/models/
segment_anything/image_encoder.py: 16x16 patch embed, learned absolute pos
embed over the 64x64 grid, transformer blocks with 14x14 windowed attention
except 4 global-attention blocks, decomposed relative position bias
(MViTv2-style separate H/W tables), LayerNorm2d neck to 256 channels.

TPU notes: window partition is reshape/transpose (free under XLA); the
window size 14 does not divide 64, so windows pad 64->70 exactly like the
reference. Attention uses fused einsums with fp32 softmax; the rel-pos bias
keeps global blocks on the XLA path (a biased pallas kernel is future
work — at 4096 tokens XLA attention is already MXU-bound).
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ....models.common import PatchEmbed


def window_partition(x, window_size):
    b, h, w, c = x.shape
    pad_h = (window_size - h % window_size) % window_size
    pad_w = (window_size - w % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window_size, window_size, wp // window_size,
                  window_size, c)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        -1, window_size, window_size, c)
    return windows, (hp, wp)


def window_unpartition(windows, window_size, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window_size // window_size)
    x = windows.reshape(b, hp // window_size, wp // window_size,
                        window_size, window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def get_rel_pos(q_size, k_size, rel_pos):
    """Static-size rel-pos table lookup (sizes equal here, no resize)."""
    import numpy as np
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[jnp.asarray(rel.astype(np.int64))]


class SAMAttention(nn.Module):
    """MHSA over [B, H, W, C] with decomposed relative position bias.

    use_flash routes the global-attention (4096-token) blocks through the
    decomposed-rel-pos pallas flash kernel
    (ops/pallas/flash_attention.py::flash_attention_relpos): the
    [4096, 4096] bias never materializes — measured 2.7x XLA forward on
    v5e, and the XLA path cannot even fit forward+backward at bs8 in HBM.
    Small windowed blocks (<=1024 tokens) stay on the XLA path."""
    head_nums: int
    input_size: Tuple[int, int]
    use_flash: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        nh = self.head_nums
        hd = c // nh
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)

        rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, hd))
        rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, hd))
        rh = get_rel_pos(h, h, rel_pos_h.astype(jnp.float32))  # [h,h,hd]
        rw = get_rel_pos(w, w, rel_pos_w.astype(jnp.float32))

        if self.use_flash and h * w <= 1024 and hd in (64, 128) \
                and c % 128 == 0:
            # ZERO-COPY windowed path (round 5): the raw [B, N, 3C] qkv
            # Dense output feeds the packed rel-pos kernel directly and
            # the rel terms keep their natural einsum layout — the
            # [B,N,3,H,D] <-> [3,B,H,N,D] transposes (+ their VJPs +
            # the rel reshapes) were ~35 ms of the 222 ms bs4 train
            # step (device trace, tools/perf/sam_trace.py). Numerics
            # identical to the transposed path (same dots, fp32 bias).
            from ....ops.pallas.fused_attention import (
                fused_attention_relwin_dense)
            n = h * w
            qkv2 = qkv.reshape(b, n, 3 * c)
            qh = qkv2[..., :c].reshape(b, h, w, nh, hd).astype(
                jnp.float32)
            rel_h = jnp.einsum("bijnd,ikd->bijnk", qh, rh).reshape(
                b, n, nh, h)
            rel_w = jnp.einsum("bijnd,jkd->bijnk", qh, rw).reshape(
                b, n, nh, w)
            out = fused_attention_relwin_dense(qkv2, rel_h, rel_w, nh,
                                               force_pallas=True)
            out = out.reshape(b, h, w, c)
            return nn.Dense(c, dtype=self.dtype, name="proj")(out)

        qkv = qkv.reshape(b, h * w, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [B, nh, HW, hd]
        rq = q.reshape(b, nh, h, w, hd).astype(jnp.float32)
        rel_h = jnp.einsum("bnhwc,hkc->bnhwk", rq, rh)
        rel_w = jnp.einsum("bnhwc,wkc->bnhwk", rq, rw)

        if self.use_flash and h * w > 1024 and (h * w) % 128 == 0:
            from ....ops.pallas.flash_attention import (
                flash_attention_relpos)
            out = flash_attention_relpos(
                q, k, v,
                rel_h.reshape(b, nh, h * w, h),
                rel_w.reshape(b, nh, h * w, w),
                force_pallas=True)
        else:
            # Windowed/off-TPU path. The decomposed bias is expanded to
            # [B, nh, N, N] with one-hot MATMULS instead of a 6-D
            # broadcast add: bias[..,n,k*w+l] = rel_h[..,n,k] +
            # rel_w[..,n,l], and a trailing dim of w=14 pads to 128
            # lanes at ~11% utilization — the 6-D form dominated the
            # windowed block (10.8 -> 7.4 ms fwd bs2 on v5e; the shared
            # global XLA fallback went 45.2 -> 26.2). The one-hot
            # expansion is exact in fp32, so numerics (and torch
            # parity) are bit-identical.
            import numpy as np
            n = h * w
            if self.use_flash and n <= 1024:
                # decomposed rel-pos fused kernel for the 196-token
                # windows: the [n, n] bias AND probs never reach HBM in
                # fwd or bwd — the one-hot expansion happens in VMEM
                # (bit-exact vs the materialized bias: fwd diff 0.0,
                # grads ~1e-13; fwd+bwd 8.45 -> 7.27 ms at the bs4
                # 100-window shape). Falls back to XLA off-TPU.
                from ....ops.pallas.fused_attention import (
                    fused_attention_relwin)
                out = fused_attention_relwin(
                    q, k, v, rel_h.reshape(b, nh, n, h),
                    rel_w.reshape(b, nh, n, w), force_pallas=True)
            else:
                eh = jnp.asarray(np.kron(np.eye(h), np.ones((1, w))),
                                 jnp.float32)  # [h, n], 1 at [k, k*w+l]
                ew = jnp.asarray(np.tile(np.eye(w), (1, h)),
                                 jnp.float32)  # [w, n], 1 at [l, k*w+l]
                bias = jnp.einsum("bhnk,km->bhnm",
                                  rel_h.reshape(b, nh, n, h), eh)
                bias = bias + jnp.einsum("bhnk,km->bhnm",
                                         rel_w.reshape(b, nh, n, w), ew)
                attn = jnp.einsum(
                    "bhnd,bhmd->bhnm", q, k,
                    preferred_element_type=jnp.float32) * (hd**-0.5)
                attn = attn + bias
                attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
                out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SAMBlock(nn.Module):
    head_nums: int
    mlp_ratio: float = 4.0
    input_size: Tuple[int, int] = (64, 64)
    window_size: int = 0
    use_flash: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        x = SAMAttention(self.head_nums, attn_size, self.use_flash,
                         self.dtype, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (h, w))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     name="lin1")(y)
        # exact (erf) gelu: bit-faithful import of official SAM weights
        y = nn.Dense(c, dtype=self.dtype, name="lin2")(
            nn.gelu(y, approximate=False))
        return x + y


class LayerNorm2d(nn.Module):
    """Channel layer norm over NHWC (reference LayerNorm2d on NCHW)."""
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        u = x.mean(axis=-1, keepdims=True)
        s = ((x - u)**2).mean(axis=-1, keepdims=True)
        x = (x - u) / jnp.sqrt(s + self.epsilon)
        return x * weight + bias


class ViTImageEncoder(nn.Module):
    image_size: int = 1024
    patch_size: int = 16
    embedding_planes: int = 768
    block_nums: int = 12
    head_nums: int = 12
    mlp_ratio: float = 4.0
    out_planes: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = ()
    use_gradient_checkpoint: bool = False
    # named jax.checkpoint policy for the remat blocks (see ops/remat.py);
    # None = recompute everything (torch.utils.checkpoint semantics)
    remat_policy: Any = None
    # pallas flash attention for the global blocks (TPU only)
    use_flash_attention: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        grid = self.image_size // self.patch_size
        x = PatchEmbed(self.embedding_planes, self.patch_size,
                       dtype=self.dtype, name="patch_embedding")(x)
        pos_embed = self.param("position_encoding", nn.initializers.zeros,
                               (1, grid, grid, self.embedding_planes))
        x = x + pos_embed.astype(x.dtype)

        block = SAMBlock
        if self.use_gradient_checkpoint:
            from ....ops.remat import named_remat_policy
            block = nn.remat(
                SAMBlock, policy=named_remat_policy(self.remat_policy))
        for i in range(self.block_nums):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = block(self.head_nums, self.mlp_ratio, (grid, grid), ws,
                      self.use_flash_attention, self.dtype,
                      name=f"block_{i}")(x)

        x = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                    dtype=self.dtype, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(self.out_planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        return x  # [B, grid, grid, out_planes]
