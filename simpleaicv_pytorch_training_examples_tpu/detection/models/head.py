"""Detection heads, NHWC flax.

Parity with /root/reference/SimpleAICV/detection/models/head.py:15-184:
RetinaClsHead (4x conv-relu + sigmoid out with -log((1-p)/p) prior bias),
RetinaRegHead, FCOSClsRegCntHead (GroupNorm towers, centerness on reg
tower). Sigmoided outputs are fp32 for loss stability (reference .float()).
"""

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

_PRIOR_BIAS = -math.log((1.0 - 0.01) / 0.01)


def _conv(planes, name, dtype, bias=True, bias_init=None):
    return nn.Conv(planes, (3, 3), padding=1, use_bias=bias,
                   kernel_init=nn.initializers.normal(0.01),
                   bias_init=bias_init or nn.initializers.zeros,
                   dtype=dtype, name=name)


class RetinaClsHead(nn.Module):
    num_anchors: int
    num_classes: int
    num_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        planes = x.shape[-1]
        for i in range(self.num_layers):
            x = nn.relu(_conv(planes, f"conv{i}", self.dtype)(x))
        x = _conv(self.num_anchors * self.num_classes, "cls_out", self.dtype,
                  bias_init=nn.initializers.constant(_PRIOR_BIAS))(x)
        b, h, w, _ = x.shape
        x = x.reshape(b, h, w, self.num_anchors, self.num_classes)
        return nn.sigmoid(x.astype(jnp.float32))


class RetinaRegHead(nn.Module):
    num_anchors: int
    num_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        planes = x.shape[-1]
        for i in range(self.num_layers):
            x = nn.relu(_conv(planes, f"conv{i}", self.dtype)(x))
        x = _conv(self.num_anchors * 4, "reg_out", self.dtype)(x)
        b, h, w, _ = x.shape
        return x.reshape(b, h, w, self.num_anchors, 4)


class FCOSClsRegCntHead(nn.Module):
    num_classes: int
    num_layers: int = 4
    use_gn: bool = True
    cnt_on_reg: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        planes = x.shape[-1]
        cls_x, reg_x = x, x
        for i in range(self.num_layers):
            cls_x = _conv(planes, f"cls_conv{i}", self.dtype,
                          bias=not self.use_gn)(cls_x)
            if self.use_gn:
                cls_x = nn.GroupNorm(32, dtype=self.dtype,
                                     name=f"cls_gn{i}")(cls_x)
            cls_x = nn.relu(cls_x)
            reg_x = _conv(planes, f"reg_conv{i}", self.dtype,
                          bias=not self.use_gn)(reg_x)
            if self.use_gn:
                reg_x = nn.GroupNorm(32, dtype=self.dtype,
                                     name=f"reg_gn{i}")(reg_x)
            reg_x = nn.relu(reg_x)

        cls_out = _conv(self.num_classes, "cls_out", self.dtype,
                        bias_init=nn.initializers.constant(_PRIOR_BIAS))(
                            cls_x)
        reg_out = _conv(4, "reg_out", self.dtype)(reg_x)
        cnt_out = _conv(1, "center_out", self.dtype)(
            reg_x if self.cnt_on_reg else cls_x)
        return (nn.sigmoid(cls_out.astype(jnp.float32)), reg_out,
                nn.sigmoid(cnt_out.astype(jnp.float32)))
