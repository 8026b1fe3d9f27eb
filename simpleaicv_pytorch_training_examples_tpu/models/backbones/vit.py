"""Vision Transformer (B/16, L/16, H/14), NHWC flax.

Parity with /root/reference/SimpleAICV/classification/backbones/vit.py:
conv patch embed, cls token, learned pos embed over N+1 tokens, pre-norm
blocks with linear drop-path schedule, cls-token head or global-pool head
(MAE finetune uses global_pool=True).

TPU notes: token count is static (image_size/patch)**2; attention runs as
fused einsums with fp32 softmax, or — with use_fused_attention — through
the ops/pallas fused_attention VMEM kernel (2.3x XLA fwd at 197 tokens;
the [B,H,N,N] score tensor never touches HBM). For 1024² SAM-scale inputs
the SAM encoder substitutes the streaming flash-attention kernel instead.

Param names `patch_embedding`, `cls_token`, `position_encoding`, `block_{i}`
are load-bearing: the optimizer factory's layer-decay and Muon exclusion
rules key on them (see utils/optimizers.py, reference tools/utils.py:609).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import (Dropout, DropPath, FusedLayerNorm, Mlp,
                      MultiHeadSelfAttention, PatchEmbed, trunc_normal)

__all__ = ["vit_base_patch16", "vit_large_patch16", "vit_huge_patch14"]


class TransformerEncoderLayer(nn.Module):
    head_nums: int
    feedforward_ratio: int = 4
    dropout_prob: float = 0.0
    drop_path_prob: float = 0.0
    dtype: Any = jnp.float32
    softmax_dtype: Any = jnp.float32
    use_fused_attention: bool = False
    use_fused_norm: bool = False
    # whole-block pallas kernel (ops/pallas/attn_block.py). Measured
    # SLOWER than the default pairs-attention path on v5e (234.3 vs
    # 209.0 ms/step ViT-B bs256): the qkv/proj matmuls are MXU-bound and
    # lose batching efficiency when split into per-sample tiles, and the
    # backward recomputes them. Kept opt-in as a measured negative
    # result — the win lives in fusing the bandwidth-bound pieces only.
    use_fused_block: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        head_dim = c // self.head_nums
        dp = DropPath(self.drop_path_prob)
        # the kernel fuses the residual add, so it only applies when the
        # residual path is exact (no live drop-path/dropout). Param tree
        # is unchanged: the submodules are created as usual (tiny dummy
        # call, DCE'd) and the kernel reads their tensors.
        fuse_block = (self.use_fused_block
                      and head_dim in (64, 128) and x.shape[1] <= 1024
                      and not (train and (self.dropout_prob > 0.0
                                          or self.drop_path_prob > 0.0)))
        if fuse_block:
            from ...ops.pallas.attn_block import attn_block
            norm1 = FusedLayerNorm(epsilon=1e-6, dtype=self.dtype,
                                   use_fused=self.use_fused_norm,
                                   name="norm1")
            attn = MultiHeadSelfAttention(self.head_nums,
                                          self.dropout_prob, self.dtype,
                                          self.softmax_dtype,
                                          self.use_fused_attention,
                                          name="attn")
            _ = norm1(x[:1, :1])
            _ = attn(x[:1, :1], False)
            ap = attn.variables["params"]
            np_ = norm1.variables["params"]
            x = attn_block(
                x, ap["qkv"]["kernel"].astype(self.dtype),
                ap["qkv"]["bias"].astype(self.dtype),
                ap["proj"]["kernel"].astype(self.dtype),
                ap["proj"]["bias"].astype(self.dtype),
                np_["scale"], np_["bias"], self.head_nums,
                force_pallas=True)
        else:
            h = FusedLayerNorm(epsilon=1e-6, dtype=self.dtype,
                               use_fused=self.use_fused_norm,
                               name="norm1")(x)
            h = MultiHeadSelfAttention(self.head_nums, self.dropout_prob,
                                       self.dtype, self.softmax_dtype,
                                       self.use_fused_attention,
                                       name="attn")(h, train)
            x = x + dp(h, train)
        h = FusedLayerNorm(epsilon=1e-6, dtype=self.dtype,
                           use_fused=self.use_fused_norm, name="norm2")(x)
        h = Mlp(c * self.feedforward_ratio, c, self.dropout_prob,
                dtype=self.dtype, name="mlp")(h, train)
        x = x + dp(h, train)
        return x


class ViT(nn.Module):
    patch_size: int
    embedding_planes: int
    block_nums: int
    head_nums: int
    feedforward_ratio: int = 4
    image_size: int = 224
    dropout_prob: float = 0.0
    drop_path_prob: float = 0.0
    global_pool: bool = False
    num_classes: int = 1000
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32
    softmax_dtype: Any = jnp.float32
    use_fused_attention: bool = False
    use_fused_norm: bool = False
    use_fused_block: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        n_tokens = (self.image_size // self.patch_size)**2

        x = PatchEmbed(self.embedding_planes, self.patch_size,
                       dtype=self.dtype, kernel_init=trunc_normal(0.02),
                       name="patch_embedding")(x)
        x = x.reshape(b, -1, self.embedding_planes)  # [B, N, C]

        cls_token = self.param("cls_token", trunc_normal(1e-6),
                               (1, 1, self.embedding_planes))
        pos_embed = self.param("position_encoding", trunc_normal(0.02),
                               (1, n_tokens + 1, self.embedding_planes))
        cls = jnp.broadcast_to(cls_token.astype(x.dtype),
                               (b, 1, self.embedding_planes))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_embed.astype(x.dtype)
        x = Dropout(self.dropout_prob)(x, train)

        # linear drop-path schedule: p_i = p * i / (n-1)
        block = TransformerEncoderLayer
        if self.use_gradient_checkpoint:
            block = nn.remat(TransformerEncoderLayer, static_argnums=(2,))
        for i in range(self.block_nums):
            dpp = (0.0 if self.drop_path_prob == 0.0 else
                   self.drop_path_prob * i / max(self.block_nums - 1, 1))
            x = block(self.head_nums, self.feedforward_ratio,
                      self.dropout_prob, dpp, self.dtype,
                      self.softmax_dtype, self.use_fused_attention,
                      self.use_fused_norm, self.use_fused_block,
                      name=f"block_{i}")(x, train)

        if self.global_pool:
            x = x[:, 1:, :].mean(axis=1)
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(
                x.astype(jnp.float32))
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
            x = x[:, 0].astype(jnp.float32)
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     kernel_init=trunc_normal(2e-5), name="fc")(x)
        return x


def _vit(patch_size, embedding_planes, block_nums, head_nums,
         feedforward_ratio, **kwargs):
    return ViT(patch_size, embedding_planes, block_nums, head_nums,
               feedforward_ratio, **kwargs)


def vit_base_patch16(**kwargs):
    return _vit(16, 768, 12, 12, 4, **kwargs)


def vit_large_patch16(**kwargs):
    return _vit(16, 1024, 24, 16, 4, **kwargs)


def vit_huge_patch14(**kwargs):
    return _vit(14, 1280, 32, 16, 4, **kwargs)
