"""RetinaNet-style FPN, NHWC flax.

Parity with /root/reference/SimpleAICV/detection/models/fpn.py:14-85
(RetinaFPN): lateral 1x1 + top-down bilinear upsample + 3x3 smooth,
P6 from C5 (retina) or P5 (fcos, use_p5=True), P7 = conv(relu(P6)).
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _upsample_to(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]),
                            method="bilinear")


class RetinaFPN(nn.Module):
    planes: int = 256
    use_p5: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        c3, c4, c5 = inputs
        conv = lambda p, k, s, name: nn.Conv(
            p, (k, k), strides=(s, s), padding=k // 2, dtype=self.dtype,
            name=name)

        p5 = conv(self.planes, 1, 1, "P5_1")(c5)
        p4 = conv(self.planes, 1, 1, "P4_1")(c4)
        p4 = _upsample_to(p5, p4.shape[1], p4.shape[2]) + p4
        p3 = conv(self.planes, 1, 1, "P3_1")(c3)
        p3 = _upsample_to(p4, p3.shape[1], p3.shape[2]) + p3

        p5 = conv(self.planes, 3, 1, "P5_2")(p5)
        p4 = conv(self.planes, 3, 1, "P4_2")(p4)
        p3 = conv(self.planes, 3, 1, "P3_2")(p3)

        p6 = conv(self.planes, 3, 2, "P6")(p5 if self.use_p5 else c5)
        p7 = conv(self.planes, 3, 2, "P7")(nn.relu(p6))
        return [p3, p4, p5, p6, p7]
