"""SAM2 memory machinery: axial RoPE attention, MemoryAttention,
MemoryEncoder — flax.

Parity with /root/reference/SimpleAICV/video_interactive_segmentation/
models/segment_anything2/{memory_attention,memory_encoder}.py:
- RoPEAttention: axial 2-D rotary encoding on the 64x64 grid; memory keys
  repeat the grid freqs per memory slot (rope_k_repeat); trailing
  object-pointer tokens are excluded from rotation (num_k_exclude_rope).
- MemoryAttentionLayer/MemoryAttention: 4 pre-norm layers of
  self-attn + cross-attn-to-memory (kv dim 64) + FFN, 0.1 * pos on entry.
- MemoryEncoder: mask downsampler (stride-16 conv stack) + pix-feat fusion
  (ConvNeXt CXBlocks) projecting to 64-dim memory features + sine
  positions.

TPU re-design: the rotary math is real-valued (pairwise rotation instead of
torch complex view), and attention accepts an additive key-validity bias so
the fixed-capacity memory ring buffer can mask empty slots inside one
static-shape program.
"""

import math
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ....models.common import Conv3x3S2
from .image_encoder import sine_position_embedding_2d


def axial_rope_cos_sin(dim, end_x, end_y, theta=10000.0):
    """cos/sin tables [end_x*end_y, dim/2] for axial 2-D RoPE."""
    n = dim // 4
    freqs = 1.0 / (theta**(np.arange(0, dim, 4)[:n].astype(np.float64) /
                           dim))
    t = np.arange(end_x * end_y, dtype=np.float64)
    t_x = t % end_x
    t_y = np.floor(t / end_x)
    fx = np.outer(t_x, freqs)  # [N, dim/4]
    fy = np.outer(t_y, freqs)
    angles = np.concatenate([fx, fy], axis=-1)  # [N, dim/2]
    return (jnp.asarray(np.cos(angles), jnp.float32),
            jnp.asarray(np.sin(angles), jnp.float32))


def apply_rope(x, cos, sin):
    """x [..., N, D]; cos/sin [N, D/2]: rotate consecutive pairs."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    out1 = x1 * cos - x2 * sin
    out2 = x1 * sin + x2 * cos
    return jnp.stack([out1, out2], axis=-1).reshape(x.shape)


class RoPEAttention(nn.Module):
    inplanes: int = 256
    head_nums: int = 1
    downsample_rate: int = 1
    kv_inplanes: Optional[int] = None
    feat_sizes: tuple = (64, 64)
    rope_theta: float = 10000.0
    rope_k_repeat: bool = False
    # fused pallas flash attention (ops/pallas/flash_attention.py): never
    # materializes the [4096, ~28.7k] memory-bank score matrix; the
    # per-key validity bias rides the kernel natively
    use_flash: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, num_k_exclude_rope: int = 0,
                 key_bias=None):
        inter = self.inplanes // self.downsample_rate
        nh = self.head_nums
        hd = inter // nh
        qp = nn.Dense(inter, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(inter, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(inter, dtype=self.dtype, name="v_proj")(v)
        b, nq, _ = qp.shape
        nk = kp.shape[1]
        qp = qp.reshape(b, nq, nh, hd).transpose(0, 2, 1, 3)
        kp = kp.reshape(b, nk, nh, hd).transpose(0, 2, 1, 3)
        vp = vp.reshape(b, nk, nh, hd).transpose(0, 2, 1, 3)

        cos, sin = axial_rope_cos_sin(hd, self.feat_sizes[0],
                                      self.feat_sizes[1], self.rope_theta)
        n_grid = cos.shape[0]
        assert nq == n_grid, (nq, n_grid)
        qp = apply_rope(qp.astype(jnp.float32), cos, sin).astype(self.dtype)
        num_k_rope = nk - num_k_exclude_rope
        if num_k_rope > 0:
            k_rot = kp[:, :, :num_k_rope].astype(jnp.float32)
            if self.rope_k_repeat:
                r = num_k_rope // n_grid
                cos_k = jnp.tile(cos, (r, 1))
                sin_k = jnp.tile(sin, (r, 1))
            else:
                cos_k, sin_k = cos, sin
            k_rot = apply_rope(k_rot, cos_k, sin_k).astype(self.dtype)
            kp = jnp.concatenate([k_rot, kp[:, :, num_k_rope:]], axis=2)

        if self.use_flash:
            from ....ops.pallas.flash_attention import flash_attention
            # blocks sized for the 256-wide single head: 1024^2 keeps the
            # [bq, bk] probability tile within the VMEM stack budget
            out = flash_attention(qp, kp, vp, bias=key_bias,
                                  block_q=1024, block_k=1024,
                                  force_pallas=True)
        else:
            attn = jnp.einsum("bhqd,bhkd->bhqk", qp, kp,
                              preferred_element_type=jnp.float32) * \
                (hd**-0.5)
            if key_bias is not None:
                attn = attn + key_bias[:, None, None, :]
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, vp)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, inter)
        return nn.Dense(self.inplanes, dtype=self.dtype,
                        name="out_proj")(out)


class MemoryAttentionLayer(nn.Module):
    inplanes: int = 256
    feedforward_planes: int = 2048
    feat_sizes: tuple = (64, 64)
    use_flash: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, num_k_exclude_rope=0,
                 key_bias=None):
        t2 = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt)
        t2 = RoPEAttention(self.inplanes, 1, 1, None, self.feat_sizes,
                           use_flash=self.use_flash, dtype=self.dtype,
                           name="self_attn")(t2, t2, t2)
        tgt = tgt + t2
        t2 = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt)
        t2 = RoPEAttention(self.inplanes, 1, 1, 64, self.feat_sizes,
                           rope_k_repeat=True, use_flash=self.use_flash,
                           dtype=self.dtype,
                           name="cross_attn_image")(
                               t2, memory + pos, memory,
                               num_k_exclude_rope=num_k_exclude_rope,
                               key_bias=key_bias)
        tgt = tgt + t2
        t2 = nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt)
        t2 = nn.Dense(self.feedforward_planes, dtype=self.dtype,
                      name="linear1")(t2)
        t2 = nn.Dense(self.inplanes, dtype=self.dtype,
                      name="linear2")(nn.relu(t2))
        return tgt + t2


class MemoryAttention(nn.Module):
    inplanes: int = 256
    layer_nums: int = 4
    feat_sizes: tuple = (64, 64)
    use_flash: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, curr, memory, curr_pos, memory_pos,
                 num_obj_ptr_tokens=0, key_bias=None):
        """curr [B,N,C]; memory [B,M,64]; positions likewise (batch first
        unlike the reference's seq-first)."""
        output = curr + 0.1 * curr_pos
        for i in range(self.layer_nums):
            output = MemoryAttentionLayer(
                self.inplanes, 2048, self.feat_sizes, self.use_flash,
                self.dtype,
                name=f"layer_{i}")(output, memory, memory_pos, curr_pos,
                                   num_k_exclude_rope=num_obj_ptr_tokens,
                                   key_bias=key_bias)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(output)


class CXBlock(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        inp = x
        x = nn.Conv(c, (7, 7), padding=3, feature_group_count=c,
                    dtype=self.dtype, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * c, dtype=self.dtype, name="pwconv1")(x)
        x = nn.Dense(c, dtype=self.dtype,
                     name="pwconv2")(nn.gelu(x, approximate=False))
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (c,))
        return inp + gamma.astype(x.dtype) * x


class MemoryEncoder(nn.Module):
    inplanes: int = 256
    planes: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pix_feat, masks, skip_mask_sigmoid=False):
        """pix_feat [B,H,W,C]; masks [B,16H,16W,1] -> (features [B,H,W,64],
        positions [B,H,W,64])."""
        if not skip_mask_sigmoid:
            masks = jax.nn.sigmoid(masks)
        x = masks.astype(self.dtype)
        ch = 1
        for i in range(4):  # total stride 16
            ch = ch * 4
            # slice+dot form of nn.Conv(ch,(3,3),s2,p1) — same params,
            # same math, MXU-shaped for the 1..64-channel mask pyramid
            x = Conv3x3S2(ch, dtype=self.dtype,
                          name=f"mask_down_{i}")(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"mask_down_ln_{i}")(x)
            x = nn.gelu(x, approximate=False)
        x = nn.Conv(self.inplanes, (1, 1), dtype=self.dtype,
                    name="mask_down_out")(x)

        feat = nn.Conv(self.inplanes, (1, 1), dtype=self.dtype,
                       name="pix_feat_proj")(pix_feat)
        feat = feat + x
        for i in range(2):
            feat = CXBlock(self.dtype, name=f"fuser_{i}")(feat)
        if self.inplanes != self.planes:
            feat = nn.Conv(self.planes, (1, 1), dtype=self.dtype,
                           name="out_proj")(feat)
        pos = sine_position_embedding_2d(feat.shape[1], feat.shape[2],
                                         self.planes // 2)
        pos = jnp.broadcast_to(pos[None], feat.shape).astype(feat.dtype)
        return feat, pos
