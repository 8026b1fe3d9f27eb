"""RetinaFace face detector, NHWC flax.

Parity with /root/reference/SimpleAICV/face_detection/models/
{retinaface,fpn,head,anchor}.py: C3-C5 -> 3-level FPN (1x1 laterals + merge
convs) -> SSH context modules (3x3 / 5x5 / 7x7 paths via stacked 3x3) ->
per-level sigmoid 1-class heads + box heads with 3 square anchors per
position. Output: (cls_heads [B,H,W,A,1] sigmoid, box_heads [B,H,W,A,4]).
"""

from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models import backbones as cls_backbones
from ..models.common import ConvBnAct

__all__ = [
    "resnet18_retinaface", "resnet34_retinaface", "resnet50_retinaface",
    "resnet101_retinaface", "resnet152_retinaface", "RetinaFaceAnchors",
]


class RetinaFaceAnchors:
    """Square anchors (size list per level), xyxy, numpy (reference
    face_detection/models/anchor.py:7-60)."""

    def __init__(self, anchor_sizes=((8, 16, 32), (32, 64, 128),
                                     (128, 256, 512)),
                 strides=(8, 16, 32)):
        self.anchor_sizes = anchor_sizes
        self.strides = strides

    def __call__(self, fpn_feature_sizes):
        out = []
        for sizes, stride, (w, h) in zip(self.anchor_sizes, self.strides,
                                         fpn_feature_sizes):
            base = np.zeros((len(sizes), 4), np.float32)
            for a, s in enumerate(sizes):
                base[a] = [-s / 2, -s / 2, s / 2, s / 2]
            sx = (np.arange(int(w)) + 0.5) * stride
            sy = (np.arange(int(h)) + 0.5) * stride
            gx, gy = np.meshgrid(sx, sy)
            shifts = np.stack([gx, gy, gx, gy], axis=-1)[:, :, None, :]
            out.append((base[None, None] + shifts).astype(np.float32))
        return out

    def flat_anchors(self, fpn_feature_sizes):
        return np.concatenate(
            [a.reshape(-1, 4) for a in self(fpn_feature_sizes)], axis=0)


def _resize(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")


class RetinaFaceFPN(nn.Module):
    planes: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train=False):
        c3, c4, c5 = inputs
        o3 = ConvBnAct(self.planes, 1, 1, 0, dtype=self.dtype,
                       name="output1")(c3, train)
        o4 = ConvBnAct(self.planes, 1, 1, 0, dtype=self.dtype,
                       name="output2")(c4, train)
        o5 = ConvBnAct(self.planes, 1, 1, 0, dtype=self.dtype,
                       name="output3")(c5, train)
        o4 = o4 + _resize(o5, o4.shape[1], o4.shape[2])
        o4 = ConvBnAct(self.planes, 3, 1, 1, dtype=self.dtype,
                       name="merge2")(o4, train)
        o3 = o3 + _resize(o4, o3.shape[1], o3.shape[2])
        o3 = ConvBnAct(self.planes, 3, 1, 1, dtype=self.dtype,
                       name="merge1")(o3, train)
        return [o3, o4, o5]


class RetinaFaceSSH(nn.Module):
    planes: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c3 = ConvBnAct(self.planes // 2, 3, 1, 1, has_act=False,
                       dtype=self.dtype, name="conv3X3")(x, train)
        c5_1 = ConvBnAct(self.planes // 4, 3, 1, 1, dtype=self.dtype,
                         name="conv5X5_1")(x, train)
        c5 = ConvBnAct(self.planes // 4, 3, 1, 1, has_act=False,
                       dtype=self.dtype, name="conv5X5_2")(c5_1, train)
        c7 = ConvBnAct(self.planes // 4, 3, 1, 1, dtype=self.dtype,
                       name="conv7X7_2")(c5_1, train)
        c7 = ConvBnAct(self.planes // 4, 3, 1, 1, has_act=False,
                       dtype=self.dtype, name="conv7x7_3")(c7, train)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class RetinaFace(nn.Module):
    backbone_type: str
    backbone_pretrained_path: str = ""
    fpn_feature_num: int = 3
    planes: int = 256
    anchor_num: int = 3
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = cls_backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")(x, train=train, return_features=True)
        feats = RetinaFaceFPN(self.planes, self.dtype,
                              name="fpn")(feats[1:4], train)
        cls_heads, box_heads = [], []
        for i, f in enumerate(feats):
            f = RetinaFaceSSH(self.planes, self.dtype,
                              name=f"ssh{i + 1}")(f, train)
            b, h, w, _ = f.shape
            cls = nn.Conv(self.anchor_num, (1, 1), dtype=jnp.float32,
                          kernel_init=nn.initializers.normal(0.01),
                          name=f"cls_head_{i}")(f.astype(jnp.float32))
            cls_heads.append(nn.sigmoid(
                cls.reshape(b, h, w, self.anchor_num, 1)))
            box = nn.Conv(self.anchor_num * 4, (1, 1), dtype=jnp.float32,
                          kernel_init=nn.initializers.normal(0.01),
                          name=f"box_head_{i}")(f.astype(jnp.float32))
            box_heads.append(box.reshape(b, h, w, self.anchor_num, 4))
        return cls_heads, box_heads


def _retinaface(backbone_type, backbone_pretrained_path="", **kwargs):
    return RetinaFace(backbone_type,
                      backbone_pretrained_path=backbone_pretrained_path,
                      **kwargs)


def resnet18_retinaface(backbone_pretrained_path="", **kwargs):
    return _retinaface("resnet18", backbone_pretrained_path, **kwargs)


def resnet34_retinaface(backbone_pretrained_path="", **kwargs):
    return _retinaface("resnet34", backbone_pretrained_path, **kwargs)


def resnet50_retinaface(backbone_pretrained_path="", **kwargs):
    return _retinaface("resnet50", backbone_pretrained_path, **kwargs)


def resnet101_retinaface(backbone_pretrained_path="", **kwargs):
    return _retinaface("resnet101", backbone_pretrained_path, **kwargs)


def resnet152_retinaface(backbone_pretrained_path="", **kwargs):
    return _retinaface("resnet152", backbone_pretrained_path, **kwargs)
