"""CIFAR ResNet variants (3x3 stem, no maxpool).

Parity with /root/reference/SimpleAICV/classification/backbones/
resnetforcifar.py.
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBnAct, avg_pool_global
from .resnet import BasicBlock, Bottleneck

__all__ = [
    "resnet18cifar", "resnet34cifar", "resnet50cifar", "resnet101cifar",
    "resnet152cifar"
]


class ResNetCifar(nn.Module):
    block_cls: Any
    layer_nums: Sequence[int]
    inplanes: int = 64
    num_classes: int = 100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(self.inplanes, 3, 1, 1, dtype=self.dtype,
                      name="stem")(x, train)
        for stage_idx, n_blocks in enumerate(self.layer_nums):
            planes = self.inplanes * (2**stage_idx)
            for i in range(n_blocks):
                stride = 2 if (stage_idx > 0 and i == 0) else 1
                x = self.block_cls(planes, stride, dtype=self.dtype,
                                   name=f"layer{stage_idx + 1}_{i}")(x, train)
        x = avg_pool_global(x.astype(jnp.float32))
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        return x


def resnet18cifar(**kwargs):
    return ResNetCifar(BasicBlock, [2, 2, 2, 2], 64, **kwargs)


def resnet34cifar(**kwargs):
    return ResNetCifar(BasicBlock, [3, 4, 6, 3], 64, **kwargs)


def resnet50cifar(**kwargs):
    return ResNetCifar(Bottleneck, [3, 4, 6, 3], 64, **kwargs)


def resnet101cifar(**kwargs):
    return ResNetCifar(Bottleneck, [3, 4, 23, 3], 64, **kwargs)


def resnet152cifar(**kwargs):
    return ResNetCifar(Bottleneck, [3, 8, 36, 3], 64, **kwargs)
