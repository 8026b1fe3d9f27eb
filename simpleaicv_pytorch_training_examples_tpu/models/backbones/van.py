"""VAN (Visual Attention Network) b0-b6, NHWC flax.

Parity with /root/reference/SimpleAICV/classification/backbones/van.py:
4 stages of overlap patch embed (BN) + blocks of [BN -> LKA attention ->
layer_scale residual, BN -> conv-MLP -> layer_scale residual] + stage BN.
The LKA decomposes a 21x21 receptive field into DW 5x5 + DW-dilated 7x7(d3)
+ 1x1 — all depthwise convs, which XLA maps to the VPU with the pointwise
convs on the MXU.
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..common import (ConvBnAct, Dropout, DropPath, avg_pool_global,
                      drop_path_rates, kaiming_normal_conv, trunc_normal)

__all__ = ["van_b0", "van_b1", "van_b2", "van_b3", "van_b4", "van_b5",
           "van_b6"]


def _bn(dtype, name):
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                        dtype=dtype, name=name)


class LKA(nn.Module):
    """Large-kernel attention: DW5x5 -> DW7x7 dilated 3 -> 1x1, gated."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        attn = nn.Conv(c, (5, 5), padding=2, feature_group_count=c,
                       kernel_init=kaiming_normal_conv, dtype=self.dtype,
                       name="conv0")(x)
        attn = nn.Conv(c, (7, 7), padding=9, kernel_dilation=(3, 3),
                       feature_group_count=c,
                       kernel_init=kaiming_normal_conv, dtype=self.dtype,
                       name="conv_spatial")(attn)
        attn = nn.Conv(c, (1, 1), kernel_init=kaiming_normal_conv,
                       dtype=self.dtype, name="conv1")(attn)
        return x * attn


class VANAttention(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        shortcut = x
        x = nn.Conv(c, (1, 1), kernel_init=kaiming_normal_conv,
                    dtype=self.dtype, name="proj_1")(x)
        x = nn.relu(x)
        x = LKA(self.dtype, name="spatial_gating_unit")(x)
        x = nn.Conv(c, (1, 1), kernel_init=kaiming_normal_conv,
                    dtype=self.dtype, name="proj_2")(x)
        return x + shortcut


class VANMlp(nn.Module):
    """1x1 conv -> DW3x3 -> relu -> 1x1 conv MLP."""
    hidden_planes: int
    planes: int
    dropout_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.hidden_planes, (1, 1),
                    kernel_init=kaiming_normal_conv, dtype=self.dtype,
                    name="fc1")(x)
        x = nn.Conv(self.hidden_planes, (3, 3), padding=1,
                    feature_group_count=self.hidden_planes,
                    kernel_init=kaiming_normal_conv, dtype=self.dtype,
                    name="dwconv")(x)
        x = nn.relu(x)
        x = Dropout(self.dropout_prob)(x, train)
        x = nn.Conv(self.planes, (1, 1), kernel_init=kaiming_normal_conv,
                    dtype=self.dtype, name="fc2")(x)
        x = Dropout(self.dropout_prob)(x, train)
        return x


class VANBlock(nn.Module):
    mlp_ratio: float = 4.0
    dropout_prob: float = 0.0
    drop_path_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        ls1 = self.param("layer_scale_1",
                         nn.initializers.constant(1e-5), (c,))
        ls2 = self.param("layer_scale_2",
                         nn.initializers.constant(1e-5), (c,))
        dp = DropPath(self.drop_path_prob)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = VANAttention(self.dtype, name="attn")(h)
        x = x + dp(ls1.astype(x.dtype) * h, train)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = VANMlp(int(c * self.mlp_ratio), c, self.dropout_prob,
                   self.dtype, name="mlp")(h, train)
        x = x + dp(ls2.astype(x.dtype) * h, train)
        return x


class VAN(nn.Module):
    embedding_planes: Sequence[int]
    mlp_ratios: Sequence[int]
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
        block = VANBlock
        if self.use_gradient_checkpoint:
            block = nn.remat(VANBlock, static_argnums=(2,))
        for i, n_blocks in enumerate(self.block_nums):
            # overlap patch embed: 7x7/4 first stage, 3x3/2 after
            k, s = (7, 4) if i == 0 else (3, 2)
            x = nn.Conv(self.embedding_planes[i], (k, k), strides=(s, s),
                        padding=k // 2, kernel_init=kaiming_normal_conv,
                        dtype=self.dtype, name=f"patch_embed{i + 1}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"patch_norm{i + 1}")(x)
            for j in range(n_blocks):
                x = block(self.mlp_ratios[i], self.dropout_prob, dprs[idx],
                          self.dtype, name=f"block{i + 1}_{j}")(x, train)
                idx += 1
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"norm{i + 1}")(x)
            feats.append(x)
        if return_features:
            return feats
        x = avg_pool_global(x.astype(jnp.float32))
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     kernel_init=trunc_normal(0.02), name="head")(x)
        return x


def _van(embedding_planes, mlp_ratios, block_nums, **kwargs):
    return VAN(embedding_planes, mlp_ratios, block_nums, **kwargs)


def van_b0(**kwargs):
    return _van([32, 64, 160, 256], [8, 8, 4, 4], [3, 3, 5, 2], **kwargs)


def van_b1(**kwargs):
    return _van([64, 128, 320, 512], [8, 8, 4, 4], [2, 2, 4, 2], **kwargs)


def van_b2(**kwargs):
    return _van([64, 128, 320, 512], [8, 8, 4, 4], [3, 3, 12, 3], **kwargs)


def van_b3(**kwargs):
    return _van([64, 128, 320, 512], [8, 8, 4, 4], [3, 5, 27, 3], **kwargs)


def van_b4(**kwargs):
    return _van([64, 128, 320, 512], [8, 8, 4, 4], [3, 6, 40, 3], **kwargs)


def van_b5(**kwargs):
    return _van([96, 192, 480, 768], [8, 8, 4, 4], [3, 3, 24, 3], **kwargs)


def van_b6(**kwargs):
    return _van([96, 192, 384, 768], [8, 8, 4, 4], [6, 6, 90, 6], **kwargs)
