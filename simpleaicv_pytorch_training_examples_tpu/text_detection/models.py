"""DBNet text detection, NHWC flax.

Parity with /root/reference/SimpleAICV/text_detection/models/
{dbnet,fpn,head}.py: C2-C5 -> 1x1 laterals (inter/4 each) + top-down adds +
3x3 smooths, all levels upsampled to C2 and concatenated -> last 3x3 conv;
head emits sigmoid probability + threshold maps, each via conv + 2x
transpose-conv upsampling back to input resolution.
Output [B, H, W, 2] (prob, thresh).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models import backbones as cls_backbones
from ..models.common import ConvBnAct
from ..models.pfan import ConvTransposeBnAct

__all__ = [
    "resnet18_dbnet", "resnet34_dbnet", "resnet50_dbnet", "resnet101_dbnet",
    "resnet152_dbnet", "vanb0_dbnet", "vanb1_dbnet", "vanb2_dbnet",
    "vanb3_dbnet", "convformers18_dbnet", "convformers36_dbnet",
    "convformerm36_dbnet", "convformerb36_dbnet",
]


def _resize(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")


class DBNetFPN(nn.Module):
    inter_planes: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train=False):
        c2, c3, c4, c5 = feats
        q = self.inter_planes // 4
        p5 = ConvBnAct(q, 1, 1, 0, dtype=self.dtype, name="c5_conv")(c5,
                                                                     train)
        p4 = ConvBnAct(q, 1, 1, 0, dtype=self.dtype, name="c4_conv")(c4,
                                                                     train)
        p4 = _resize(p5, p4.shape[1], p4.shape[2]) + p4
        p4 = ConvBnAct(q, 3, 1, 1, dtype=self.dtype, name="p4_conv")(p4,
                                                                     train)
        p3 = ConvBnAct(q, 1, 1, 0, dtype=self.dtype, name="c3_conv")(c3,
                                                                     train)
        p3 = _resize(p4, p3.shape[1], p3.shape[2]) + p3
        p3 = ConvBnAct(q, 3, 1, 1, dtype=self.dtype, name="p3_conv")(p3,
                                                                     train)
        p2 = ConvBnAct(q, 1, 1, 0, dtype=self.dtype, name="c2_conv")(c2,
                                                                     train)
        p2 = _resize(p3, p2.shape[1], p2.shape[2]) + p2
        p2 = ConvBnAct(q, 3, 1, 1, dtype=self.dtype, name="p2_conv")(p2,
                                                                     train)
        h2, w2 = p2.shape[1], p2.shape[2]
        cat = jnp.concatenate([
            p2, _resize(p3, h2, w2), _resize(p4, h2, w2),
            _resize(p5, h2, w2)
        ], axis=-1)
        return ConvBnAct(self.inter_planes, 3, 1, 1, dtype=self.dtype,
                         name="last_conv")(cat, train)


class DBNetHead(nn.Module):
    k: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]

        def branch(x, name):
            x = ConvBnAct(c // 4, 3, 1, 1, dtype=self.dtype,
                          name=f"{name}_conv")(x, train)
            x = ConvTransposeBnAct(c // 4, dtype=self.dtype,
                                   name=f"{name}_up1")(x, train)
            x = nn.ConvTranspose(1, (2, 2), strides=(2, 2),
                                 dtype=jnp.float32,
                                 name=f"{name}_up2")(
                                     x.astype(jnp.float32))
            return nn.sigmoid(x)

        prob = branch(x, "binary")
        thresh = branch(x, "thresh")
        return jnp.concatenate([prob, thresh], axis=-1)


class DBNet(nn.Module):
    backbone_type: str
    backbone_pretrained_path: str = ""
    inter_planes: int = 256
    k: int = 50
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = cls_backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")(x, train=train, return_features=True)
        x = DBNetFPN(self.inter_planes, self.dtype, name="fpn")(feats, train)
        return DBNetHead(self.k, self.dtype, name="head")(x, train)


_BACKBONES = {
    "resnet18": "resnet18", "resnet34": "resnet34", "resnet50": "resnet50",
    "resnet101": "resnet101", "resnet152": "resnet152",
    "vanb0": "van_b0", "vanb1": "van_b1", "vanb2": "van_b2",
    "vanb3": "van_b3",
    "convformers18": "convformer_s18", "convformers36": "convformer_s36",
    "convformerm36": "convformer_m36", "convformerb36": "convformer_b36",
}

for _short, _bb in _BACKBONES.items():
    def _factory(backbone_pretrained_path="", _bb=_bb, **kwargs):
        return DBNet(_bb, backbone_pretrained_path=backbone_pretrained_path,
                     **kwargs)
    globals()[f"{_short}_dbnet"] = _factory
