"""ConvFormer (MetaFormer with SepConv mixer) s18/s36/m36/b36, NHWC flax.

Parity with /root/reference/SimpleAICV/classification/backbones/
convformer.py: 4 stages of strided-conv downsampling (7x7/4 post-norm first,
3x3/2 pre-norm after) + MetaFormer blocks [BN -> SepConv -> residual,
BN -> MLP -> residual]. Reference uses BatchNorm2d as the block norm and
channel-last Linears for the pointwise convs — in NHWC those Linears ARE
1x1 convs, so everything fuses into MXU matmuls.
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..common import (Dropout, DropPath, avg_pool_global, drop_path_rates,
                      trunc_normal)

__all__ = ["convformer_s18", "convformer_s36", "convformer_m36",
           "convformer_b36"]


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class SepConv(nn.Module):
    """pw-Linear expand -> relu -> DW 7x7 -> pw-Linear project."""
    expand_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mid = int(self.expand_ratio * c)
        x = nn.Dense(mid, use_bias=False, kernel_init=trunc_normal(0.02),
                     dtype=self.dtype, name="pwconv1")(x)
        x = nn.relu(x)
        x = nn.Conv(mid, (7, 7), padding=3, feature_group_count=mid,
                    use_bias=False, kernel_init=trunc_normal(0.02),
                    dtype=self.dtype, name="dwconv")(x)
        x = nn.Dense(c, use_bias=False, kernel_init=trunc_normal(0.02),
                     dtype=self.dtype, name="pwconv2")(x)
        return x


class ConvFormerMlp(nn.Module):
    mlp_ratio: float = 4.0
    dropout_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.Dense(int(c * self.mlp_ratio), use_bias=False,
                     kernel_init=trunc_normal(0.02), dtype=self.dtype,
                     name="fc1")(x)
        x = nn.relu(x)
        x = Dropout(self.dropout_prob)(x, train)
        x = nn.Dense(c, use_bias=False, kernel_init=trunc_normal(0.02),
                     dtype=self.dtype, name="fc2")(x)
        x = Dropout(self.dropout_prob)(x, train)
        return x


class MetaFormerBlock(nn.Module):
    dropout_prob: float = 0.0
    drop_path_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dp = DropPath(self.drop_path_prob)
        h = _bn(train, self.dtype, "norm1")(x)
        h = SepConv(2.0, self.dtype, name="token_mixer")(h)
        x = x + dp(h, train)
        h = _bn(train, self.dtype, "norm2")(x)
        h = ConvFormerMlp(4.0, self.dropout_prob, self.dtype,
                          name="mlp")(h, train)
        x = x + dp(h, train)
        return x


class MetaFormer(nn.Module):
    embedding_planes: Sequence[int]
    block_nums: Sequence[int]
    dropout_prob: float = 0.0
    drop_path_prob: float = 0.0
    num_classes: int = 1000
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        dprs = drop_path_rates(self.drop_path_prob, sum(self.block_nums))
        idx = 0
        feats = []
        block = MetaFormerBlock
        if self.use_gradient_checkpoint:
            block = nn.remat(MetaFormerBlock, static_argnums=(2,))
        for i, n_blocks in enumerate(self.block_nums):
            if i == 0:
                x = nn.Conv(self.embedding_planes[0], (7, 7), strides=(4, 4),
                            padding=2, kernel_init=trunc_normal(0.02),
                            dtype=self.dtype, name="downsample0")(x)
                x = _bn(train, self.dtype, "downsample_postnorm0")(x)
            else:
                x = _bn(train, self.dtype, f"downsample_prenorm{i}")(x)
                x = nn.Conv(self.embedding_planes[i], (3, 3), strides=(2, 2),
                            padding=1, kernel_init=trunc_normal(0.02),
                            dtype=self.dtype, name=f"downsample{i}")(x)
            for j in range(n_blocks):
                x = block(self.dropout_prob, dprs[idx], self.dtype,
                          name=f"block{i + 1}_{j}")(x, train)
                idx += 1
            feats.append(x)
        if return_features:
            return feats
        x = avg_pool_global(x.astype(jnp.float32))
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     kernel_init=trunc_normal(0.02), name="head")(x)
        return x


def _metaformer(block_nums, embedding_planes, **kwargs):
    return MetaFormer(embedding_planes, block_nums, **kwargs)


def convformer_s18(**kwargs):
    return _metaformer([3, 3, 9, 3], [64, 128, 320, 512], **kwargs)


def convformer_s36(**kwargs):
    return _metaformer([3, 12, 18, 3], [64, 128, 320, 512], **kwargs)


def convformer_m36(**kwargs):
    return _metaformer([3, 12, 18, 3], [96, 192, 384, 576], **kwargs)


def convformer_b36(**kwargs):
    return _metaformer([3, 12, 18, 3], [128, 256, 512, 768], **kwargs)
