"""SAM2 Hiera image encoder + FPN neck, NHWC flax.

Parity with /root/reference/SimpleAICV/video_interactive_segmentation/
models/segment_anything2/image_encoder.py: 7x7/4 patch embed, global +
tiled window position embeddings, 4 stages of MultiScaleBlocks (q-pooling
stride 2 at stage changes, per-stage window sizes, selected global
blocks), FpnNeck producing 256-ch features + sine positions for the top
levels (the /4 level is dropped like the reference's `features[:-1]`).
"""

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ....interactive_segmentation.models.segment_anything.image_encoder import (
    window_partition, window_unpartition)

# flash attention only pays off on long sequences (the global blocks);
# windowed blocks (<=196 tokens) stay on XLA. Patchable for CPU tests.
_FLASH_MIN_KV = 1024


class MultiScaleAttention(nn.Module):
    """Hiera attention, optionally with PADDED head params.

    head_dim_padding > 0 widens every head's qkv/proj parameter slice
    from the logical hd = planes // head_nums (56 for every Hiera stage)
    to head_dim_padding physical dims (64). Semantics: with the pad
    columns zero (the converter writes zeros for published checkpoints,
    utils/torch_convert.py) the attention is EXACT — zero q/k dims add
    nothing to the logits (the softmax scale stays hd^-0.5), and the
    padded v columns feed zero proj rows. For from-scratch training the
    pads are just extra capacity. Why: 64-wide heads are 128-lane
    alignable, so the non-pooled windowed blocks run the ZERO-COPY
    packed kernel (fused_attention_dense) straight off the qkv Dense
    output — the round-5 SAM2 device trace showed ~35 ms/step of qkv
    layout copies around the transposed kernels — and the global blocks
    stop paying flash_attention's per-call activation pad of d 56->64.
    """
    planes: int
    head_nums: int
    pool_stride: int = 0
    use_flash: bool = False
    head_dim_padding: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        nh = self.head_nums
        hd = self.planes // nh            # logical width (softmax scale)
        hdp = max(self.head_dim_padding, hd)  # physical param width
        sm_scale = hd ** -0.5
        qkv = nn.Dense(3 * nh * hdp, dtype=self.dtype, name="qkv")(x)

        if self.use_flash and not self.pool_stride and \
                h * w <= 1024 and hdp in (64, 128):
            # ZERO-COPY windowed path: raw [B, N, 3C'] qkv feeds the
            # packed head-pair kernel; dqkv comes back packed.
            from ....ops.pallas.fused_attention import (
                fused_attention_dense)
            out = fused_attention_dense(
                qkv.reshape(b, h * w, 3 * nh * hdp), nh,
                force_pallas=True, sm_scale=sm_scale)
            out = out.reshape(b, h, w, nh * hdp)
            return nn.Dense(self.planes, dtype=self.dtype,
                            name="proj")(out)

        qkv = qkv.reshape(b, h * w, 3, nh, hdp)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.pool_stride:
            s = self.pool_stride
            q = q.reshape(b, h, w, nh * hdp)
            q = nn.max_pool(q, (s, s), strides=(s, s))
            h, w = q.shape[1], q.shape[2]
            q = q.reshape(b, h * w, nh, hdp)
        if self.use_flash and k.shape[1] >= _FLASH_MIN_KV:
            # global-attention blocks (4096 tokens at 1024^2): the fused
            # pallas kernel streams K/V through VMEM so the [b, nh, 4096,
            # 4096] score matrix never reaches HBM in fwd OR bwd. Unpadded
            # d=56 heads are zero-padded to 64 inside flash_attention
            # (exact; head_dim_padding=64 skips that per-call pad).
            from ....ops.pallas.flash_attention import flash_attention
            out = flash_attention(q.transpose(0, 2, 1, 3),
                                  k.transpose(0, 2, 1, 3),
                                  v.transpose(0, 2, 1, 3),
                                  force_pallas=True, sm_scale=sm_scale)
            out = out.transpose(0, 2, 1, 3)
        elif self.use_flash and not self.pool_stride and \
                k.shape[1] <= 1024 and hdp <= 128:
            # non-pooled windowed blocks (<=196 tokens): whole-window
            # in-VMEM fused attention — probs never reach HBM in fwd or
            # the remat'd bwd (ops/pallas/fused_attention.py)
            from ....ops.pallas.fused_attention import fused_attention
            qt = q.transpose(0, 2, 1, 3)
            if hdp != hd:  # rescale so the kernel's hdp^-0.5 nets hd^-0.5
                qt = qt * (sm_scale * hdp ** 0.5)
            out = fused_attention(qt,
                                  k.transpose(0, 2, 1, 3),
                                  v.transpose(0, 2, 1, 3),
                                  force_pallas=True)
            out = out.transpose(0, 2, 1, 3)
        else:
            attn = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k,
                preferred_element_type=jnp.float32) * sm_scale
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(b, h, w, nh * hdp)
        return nn.Dense(self.planes, dtype=self.dtype, name="proj")(out)


class MultiScaleBlock(nn.Module):
    planes: int
    head_nums: int
    mlp_ratio: float = 4.0
    pool_stride: int = 0
    window_size: int = 0
    use_flash: bool = False
    dtype: Any = jnp.float32
    head_dim_padding: int = 0

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if inplanes != self.planes and self.pool_stride:
            s = self.pool_stride
            shortcut = nn.Dense(self.planes, dtype=self.dtype,
                                name="proj")(x)
            shortcut = nn.max_pool(shortcut, (s, s), strides=(s, s))

        window_size = self.window_size
        if window_size > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, window_size)
        x = MultiScaleAttention(self.planes, self.head_nums,
                                self.pool_stride, self.use_flash,
                                self.head_dim_padding,
                                self.dtype, name="attn")(x)
        if self.pool_stride:
            window_size = self.window_size // self.pool_stride
            h, w = shortcut.shape[1], shortcut.shape[2]
            pad_h = (window_size - h % window_size) % window_size \
                if window_size else 0
            pad_w = (window_size - w % window_size) % window_size \
                if window_size else 0
            pad_hw = (h + pad_h, w + pad_w)
        if self.window_size > 0:
            x = window_unpartition(x, window_size, pad_hw, (h, w))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.planes * self.mlp_ratio), dtype=self.dtype,
                     name="mlp1")(y)
        # exact (erf) gelu: bit-faithful import of official SAM2 weights
        y = nn.Dense(self.planes, dtype=self.dtype, name="mlp2")(
            nn.gelu(y, approximate=False))
        return x + y


class Hiera(nn.Module):
    embedding_planes: int = 112
    head_nums: int = 2
    block_nums: Sequence[int] = (2, 3, 16, 3)
    window_position_embedding_bkg_spatial_size: Sequence[int] = (14, 14)
    window_specification: Sequence[int] = (8, 4, 14, 7)
    global_attention_blocks: Sequence[int] = (12, 16, 20)
    use_gradient_checkpoint: bool = False
    use_flash_attention: bool = False
    dtype: Any = jnp.float32
    head_dim_padding: int = 0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.embedding_planes, (7, 7), strides=(4, 4),
                    padding=3, dtype=self.dtype, name="patch_embed")(x)
        b, h, w, c = x.shape

        bkg = self.window_position_embedding_bkg_spatial_size
        pos_embed = self.param("pos_embed", nn.initializers.zeros,
                               (1, bkg[0], bkg[1], c))
        ws0 = self.window_specification[0]
        pos_embed_window = self.param("pos_embed_window",
                                      nn.initializers.zeros,
                                      (1, ws0, ws0, c))
        pe = jax.image.resize(pos_embed.astype(jnp.float32), (1, h, w, c),
                              "bicubic")
        tile = jnp.tile(pos_embed_window.astype(jnp.float32),
                        (1, h // ws0, w // ws0, 1))
        x = x + (pe + tile).astype(x.dtype)

        stage_end_idxs = [sum(self.block_nums[:i]) - 1
                          for i in range(1, len(self.block_nums) + 1)]
        pool_block_idxs = [i + 1 for i in stage_end_idxs[:-1]]

        planes = self.embedding_planes
        head_nums = self.head_nums
        current_stage = 1
        outs = []
        block_cls = MultiScaleBlock
        if self.use_gradient_checkpoint:
            block_cls = nn.remat(MultiScaleBlock)
        for i in range(sum(self.block_nums)):
            out_planes = planes
            block_heads = head_nums
            window_size = self.window_specification[current_stage - 1]
            if i in self.global_attention_blocks:
                window_size = 0
            if i - 1 in stage_end_idxs:
                out_planes = planes * 2
                block_heads = head_nums * 2
                current_stage += 1
            x = block_cls(out_planes, block_heads, 4.0,
                          2 if i in pool_block_idxs else 0, window_size,
                          self.use_flash_attention, self.dtype,
                          head_dim_padding=self.head_dim_padding,
                          name=f"block_{i}")(x)
            planes, head_nums = out_planes, block_heads
            if i in stage_end_idxs:
                outs.append(x)
        return outs  # NHWC, strides 4/8/16/32


def sine_position_embedding_2d(h, w, planes, temperature=10000, eps=1e-6):
    """[H, W, 2*planes] sine embedding (reference PositionEmbeddingBlock)."""
    ys = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    xs = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    scale = 2 * math.pi
    y_embed = ys / (h + eps) * scale * jnp.ones((h, w))
    x_embed = xs / (w + eps) * scale * jnp.ones((h, w))
    dim_t = jnp.arange(planes, dtype=jnp.float32)
    dim_t = temperature**(2 * (dim_t // 2) / planes)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]),
                       jnp.cos(pos_x[..., 1::2])], axis=3).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]),
                       jnp.cos(pos_y[..., 1::2])], axis=3).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=2)


class ImageEncoder(nn.Module):
    """Hiera trunk + FpnNeck; returns ([/4, /8, /16 features], positions).
    """
    embedding_planes: int = 112
    head_nums: int = 2
    block_nums: Sequence[int] = (2, 3, 16, 3)
    window_position_embedding_bkg_spatial_size: Sequence[int] = (14, 14)
    window_specification: Sequence[int] = (8, 4, 14, 7)
    global_attention_blocks: Sequence[int] = (12, 16, 20)
    fpn_planes: int = 256
    use_gradient_checkpoint: bool = False
    use_flash_attention: bool = False
    dtype: Any = jnp.float32
    head_dim_padding: int = 0

    @nn.compact
    def __call__(self, x):
        feats = Hiera(self.embedding_planes, self.head_nums,
                      self.block_nums,
                      self.window_position_embedding_bkg_spatial_size,
                      self.window_specification,
                      self.global_attention_blocks,
                      self.use_gradient_checkpoint,
                      self.use_flash_attention, self.dtype,
                      head_dim_padding=self.head_dim_padding,
                      name="trunk")(x)
        x0, x1, x2, x3 = feats
        conv = lambda name: nn.Conv(self.fpn_planes, (1, 1),
                                    dtype=self.dtype, name=name)
        p3 = conv("conv0")(x3)
        p2 = conv("conv1")(x2)
        p3_up = jax.image.resize(p3, (p3.shape[0], p2.shape[1], p2.shape[2],
                                      p3.shape[3]), "nearest")
        p2 = p2 + p3_up
        p1 = conv("conv2")(x1)
        p0 = conv("conv3")(x0)

        def pos(f):
            pe = sine_position_embedding_2d(f.shape[1], f.shape[2],
                                            self.fpn_planes // 2)
            return jnp.broadcast_to(pe[None], f.shape).astype(f.dtype)

        # drop the deepest (/32) level like the reference features[:-1]
        features = [p0, p1, p2]
        positions = [pos(p0), pos(p1), pos(p2)]
        return features, positions
