"""DINOv3 ConvNeXt detection backbones (tiny/small/base/large), NHWC flax.

Parity with /root/reference/SimpleAICV/detection/models/backbones/
dinov3convnext.py:120-247: stem conv4x4/4 + channel LayerNorm, per-stage
(LayerNorm + conv2x2/2) downsample, ConvNeXt blocks (depthwise 7x7 ->
LayerNorm -> 4x pointwise MLP -> layer-scale gamma -> drop-path residual),
returning the four stage feature maps at strides 4/8/16/32.

TPU-first notes: NHWC keeps the channel LayerNorm and the two pointwise
convs on the lane dimension — the 1x1 convs are plain Dense matmuls on the
MXU and XLA fuses LN + GELU + layer-scale into them; the reference's
NCHW permute pair around each block disappears entirely. The depthwise
7x7 runs on the VPU. GELU is exact-erf to match torch nn.GELU.
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..common import DropPath, drop_path_rates, trunc_normal

__all__ = [
    "dinov3convnexttinybackbone",
    "dinov3convnextsmallbackbone",
    "dinov3convnextbasebackbone",
    "dinov3convnextlargebackbone",
    "Dinov3ConvNeXtBackbone",
]

_LN_EPS = 1e-6


class ConvNeXtBlock(nn.Module):
    """dw7x7 -> LN -> pw 4x -> GELU -> pw -> gamma -> drop-path residual
    (reference dinov3convnext.py:82-118 Block)."""
    planes: int
    drop_path_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        x = nn.Conv(self.planes, (7, 7), padding=3,
                    feature_group_count=self.planes,
                    kernel_init=trunc_normal(0.02), dtype=self.dtype,
                    name="dwconv")(x)
        x = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.planes, kernel_init=trunc_normal(0.02),
                     dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.planes, kernel_init=trunc_normal(0.02),
                     dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.planes,))
        x = gamma.astype(x.dtype) * x
        x = DropPath(self.drop_path_prob)(x, train)
        return shortcut + x


class Dinov3ConvNeXtBackbone(nn.Module):
    """4-stage ConvNeXt trunk returning [C2, C3, C4, C5] at strides
    4/8/16/32 — the CNN-backbone interface every detector head consumes
    (reference dinov3convnext.py:120-193)."""
    embedding_planes: Sequence[int] = (96, 192, 384, 768)
    block_nums: Sequence[int] = (3, 3, 9, 3)
    drop_path_prob: float = 0.0
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self):
        return list(self.embedding_planes)

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = True):
        dprs = drop_path_rates(self.drop_path_prob, sum(self.block_nums))
        block_cls = ConvNeXtBlock
        if self.use_gradient_checkpoint:
            block_cls = nn.remat(ConvNeXtBlock, static_argnums=(2,))
        outs = []
        idx = 0
        for i, (planes, n_blocks) in enumerate(
                zip(self.embedding_planes, self.block_nums)):
            if i == 0:
                x = nn.Conv(planes, (4, 4), strides=(4, 4),
                            kernel_init=trunc_normal(0.02),
                            dtype=self.dtype, name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype,
                                 name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype,
                                 name=f"downsample{i}_norm")(x)
                x = nn.Conv(planes, (2, 2), strides=(2, 2),
                            kernel_init=trunc_normal(0.02),
                            dtype=self.dtype, name=f"downsample{i}_conv")(x)
            for j in range(n_blocks):
                x = block_cls(planes, drop_path_prob=dprs[idx + j],
                              dtype=self.dtype,
                              name=f"stage{i}_block{j}")(x, train)
            idx += n_blocks
            outs.append(x)
        if return_features:
            return outs
        return outs[-1]


def dinov3convnexttinybackbone(pretrained_path="", **kwargs):
    del pretrained_path  # flax params load via utils.checkpoint at init
    return Dinov3ConvNeXtBackbone(embedding_planes=(96, 192, 384, 768),
                                  block_nums=(3, 3, 9, 3), **kwargs)


def dinov3convnextsmallbackbone(pretrained_path="", **kwargs):
    del pretrained_path
    return Dinov3ConvNeXtBackbone(embedding_planes=(96, 192, 384, 768),
                                  block_nums=(3, 3, 27, 3), **kwargs)


def dinov3convnextbasebackbone(pretrained_path="", **kwargs):
    del pretrained_path
    return Dinov3ConvNeXtBackbone(embedding_planes=(128, 256, 512, 1024),
                                  block_nums=(3, 3, 27, 3), **kwargs)


def dinov3convnextlargebackbone(pretrained_path="", **kwargs):
    del pretrained_path
    return Dinov3ConvNeXtBackbone(embedding_planes=(192, 384, 768, 1536),
                                  block_nums=(3, 3, 27, 3), **kwargs)
