"""DarkNet backbones (tiny/19/53), NHWC flax with leaky-relu.

Parity with /root/reference/SimpleAICV/classification/backbones/darknet.py.
"""

from functools import partial
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..common import ConvBnAct, avg_pool_global, max_pool

__all__ = ["darknettiny", "darknet19", "darknet53"]

_leaky = partial(nn.leaky_relu, negative_slope=0.1)


def _conv(planes, k, s, p, dtype, name, has_bn=True, has_act=True):
    return ConvBnAct(planes, k, s, p, has_bn=has_bn, has_act=has_act,
                     act=_leaky, dtype=dtype, name=name)


class Darknet53Block(nn.Module):
    """1x1 squeeze + 3x3 expand residual block."""
    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        squeezed = self.planes // 2
        out = _conv(squeezed, 1, 1, 0, self.dtype, "conv1")(x, train)
        out = _conv(self.planes, 3, 1, 1, self.dtype, "conv2")(out, train)
        return out + x


class DarknetTiny(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = [16, 32, 64, 128, 256, 512]
        for i, w in enumerate(widths):
            x = _conv(w, 3, 1, 1, self.dtype, f"conv{i + 1}")(x, train)
            if i < 5:
                x = max_pool(x, 2, 2)
            else:
                # zeropad (0,1,0,1) + maxpool k2 s1 keeps spatial size
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)),
                            constant_values=-jnp.inf)
                x = max_pool(x, 2, 1)
        x = avg_pool_global(x.astype(jnp.float32))
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        return x


class Darknet19Block(nn.Module):
    """Alternating 3x3 / 1x1 conv stack, optional trailing maxpool."""
    planes: int
    layer_num: int
    use_maxpool: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        for i in range(self.layer_num):
            if i % 2 == 0:
                x = _conv(self.planes, 3, 1, 1, self.dtype,
                          f"conv{i}")(x, train)
            else:
                x = _conv(inplanes, 1, 1, 0, self.dtype, f"conv{i}")(x, train)
        if self.use_maxpool:
            x = max_pool(x, 2, 2)
        return x


class Darknet19(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv(32, 3, 1, 1, self.dtype, "layer1")(x, train)
        x = max_pool(x, 2, 2)
        x = Darknet19Block(64, 1, True, self.dtype, name="layer2")(x, train)
        x = Darknet19Block(128, 3, True, self.dtype, name="layer3")(x, train)
        x = Darknet19Block(256, 3, True, self.dtype, name="layer4")(x, train)
        x = Darknet19Block(512, 5, True, self.dtype, name="layer5")(x, train)
        x = Darknet19Block(1024, 5, False, self.dtype, name="layer6")(x, train)
        x = _conv(self.num_classes, 1, 1, 0, self.dtype, "layer7",
                  has_bn=False, has_act=False)(x, train)
        x = avg_pool_global(x.astype(jnp.float32))
        return x


class Darknet53(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        x = _conv(32, 3, 1, 1, self.dtype, "conv1")(x, train)
        x = _conv(64, 3, 2, 1, self.dtype, "conv2")(x, train)
        feats = []
        for stage, (planes, n_blocks) in enumerate([(64, 1), (128, 2),
                                                    (256, 8), (512, 8),
                                                    (1024, 4)]):
            if stage > 0:
                x = _conv(planes, 3, 2, 1, self.dtype,
                          f"conv{stage + 2}")(x, train)
            for i in range(n_blocks):
                x = Darknet53Block(planes, self.dtype,
                                   name=f"block{stage + 1}_{i}")(x, train)
            feats.append(x)
        if return_features:
            return feats[-3:]
        x = avg_pool_global(x.astype(jnp.float32))
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        return x


def darknettiny(**kwargs):
    return DarknetTiny(**kwargs)


def darknet19(**kwargs):
    return Darknet19(**kwargs)


def darknet53(**kwargs):
    return Darknet53(**kwargs)
