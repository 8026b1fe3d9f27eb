"""ResNet backbones (18/34/50/101/152), NHWC flax.

Capability parity with /root/reference/SimpleAICV/classification/backbones/
resnet.py (7x7 stem, maxpool, 4 stages of BasicBlock/Bottleneck, gap + fc).
TPU-first: NHWC layout, bf16 compute via `dtype`, remat per stage when
`use_gradient_checkpoint` (the reference flag) is set.
"""

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBnAct, avg_pool_global, max_pool, trunc_normal

__all__ = ["resnet18", "resnet34", "resnet50", "resnet101", "resnet152"]


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        downsample = self.stride != 1 or inplanes != self.planes
        identity = x
        x = ConvBnAct(self.planes, 3, self.stride, 1, dtype=self.dtype,
                      name="conv1")(x, train)
        x = ConvBnAct(self.planes, 3, 1, 1, has_act=False, dtype=self.dtype,
                      name="conv2")(x, train)
        if downsample:
            identity = ConvBnAct(self.planes, 1, self.stride, 0,
                                 has_act=False, dtype=self.dtype,
                                 name="downsample")(identity, train)
        return nn.relu(x + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        out_planes = self.planes * 4
        downsample = self.stride != 1 or inplanes != out_planes
        identity = x
        x = ConvBnAct(self.planes, 1, 1, 0, dtype=self.dtype,
                      name="conv1")(x, train)
        x = ConvBnAct(self.planes, 3, self.stride, 1, dtype=self.dtype,
                      name="conv2")(x, train)
        x = ConvBnAct(out_planes, 1, 1, 0, has_act=False, dtype=self.dtype,
                      name="conv3")(x, train)
        if downsample:
            identity = ConvBnAct(out_planes, 1, self.stride, 0,
                                 has_act=False, dtype=self.dtype,
                                 name="downsample")(identity, train)
        return nn.relu(x + identity)


class ResNet(nn.Module):
    block_cls: Any
    layer_nums: Sequence[int]
    inplanes: int = 64
    num_classes: int = 1000
    use_gradient_checkpoint: bool = False
    # per-stage stride of the first block; None = classification default
    # (1,2,2,2). OCR text recognition uses (1,2,(2,1),(2,1)) — H downsampled
    # 32x but W only 8x so CTC keeps enough time steps
    # (/root/reference/SimpleAICV/text_recognition/models/backbones/
    # resnet.py:167-190)
    stage_strides: Any = None
    dtype: Any = jnp.float32

    # feature channels after each stage (used by detection/seg necks)
    @property
    def out_channels(self):
        exp = 1 if self.block_cls is BasicBlock else 4
        return [self.inplanes * (2**i) * exp for i in range(4)]

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        x = ConvBnAct(self.inplanes, 7, 2, 3, dtype=self.dtype,
                      name="stem")(x, train)
        x = max_pool(x, 3, 2, padding=[(1, 1), (1, 1)])

        feats = []
        block = self.block_cls
        if self.use_gradient_checkpoint:
            block = nn.remat(block, static_argnums=(2,))
        for stage_idx, n_blocks in enumerate(self.layer_nums):
            planes = self.inplanes * (2**stage_idx)
            for i in range(n_blocks):
                if i != 0:
                    stride = 1
                elif self.stage_strides is not None:
                    stride = self.stage_strides[stage_idx]
                    stride = tuple(stride) if isinstance(
                        stride, (tuple, list)) else stride
                else:
                    stride = 2 if stage_idx > 0 else 1
                x = block(planes, stride, dtype=self.dtype,
                          name=f"layer{stage_idx + 1}_{i}")(x, train)
            feats.append(x)
        if return_features:
            return feats

        x = avg_pool_global(x.astype(jnp.float32))
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        return x


def _resnet(block_cls, layers, inplanes=64, **kwargs):
    return ResNet(block_cls, layers, inplanes, **kwargs)


def resnet18(**kwargs):
    return _resnet(BasicBlock, [2, 2, 2, 2], 64, **kwargs)


def resnet34(**kwargs):
    return _resnet(BasicBlock, [3, 4, 6, 3], 64, **kwargs)


def resnet50(**kwargs):
    return _resnet(Bottleneck, [3, 4, 6, 3], 64, **kwargs)


def resnet101(**kwargs):
    return _resnet(Bottleneck, [3, 4, 23, 3], 64, **kwargs)


def resnet152(**kwargs):
    return _resnet(Bottleneck, [3, 8, 36, 3], 64, **kwargs)
