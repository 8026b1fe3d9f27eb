"""YOLACT instance segmentation, NHWC flax.

Parity with /root/reference/SimpleAICV/instance_segmentation/models/
yolact.py: C3-C5 FPN (+P6/P7 stride-2 convs), ProtoNet on P3 upsampled to
C2 resolution producing 32 prototypes, shared head predicting per-anchor
class logits (num_classes incl. background at index 0), box offsets and
tanh mask coefficients, plus a semantic-seg auxiliary conv on P3.
"""

import math
from itertools import product
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...models import backbones as cls_backbones

__all__ = [
    "resnet18_yolact", "resnet34_yolact", "resnet50_yolact",
    "resnet101_yolact", "resnet152_yolact", "vanb2_yolact", "convformerm36_yolact", "YOLACTAnchors",
    "dinov3_vit_small_patch16_yolact",
    "dinov3_vit_small_plus_patch16_yolact",
    "dinov3_vit_base_patch16_yolact",
    "dinov3_vit_large_patch16_yolact",
    "dinov3_vit_large_plus_patch16_yolact",
    "dinov3_vit_huge_plus_patch16_yolact",
]


class YOLACTAnchors:
    """Normalized cxcywh anchors (reference instance_segmentation/models/
    anchor.py:7-52)."""

    def __init__(self, resize=544, scales=(24, 48, 96, 192, 384),
                 ratios=(1, 1 / 2, 2), strides=(8, 16, 32, 64, 128)):
        self.resize = resize
        self.scales = resize / 544.0 * np.array(scales, np.float32)
        self.ratios = np.array(ratios, np.float32)
        self.strides = np.array(strides, np.float32)

    def __call__(self, fpn_feature_sizes):
        out = []
        for index, (w, h) in enumerate(fpn_feature_sizes):
            anchors = []
            for j, i in product(range(int(h)), range(int(w))):
                x = (i + 0.5) / w
                y = (j + 0.5) / h
                for r in self.ratios:
                    r = np.sqrt(r)
                    aw = self.scales[index] * r / self.resize
                    ah = self.scales[index] / r / self.resize
                    anchors.append([x, y, aw, ah])
            out.append(np.array(anchors, np.float32))
        return out

    def flat_anchors(self, fpn_feature_sizes):
        return np.concatenate(self(fpn_feature_sizes), axis=0)


def _resize(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")


def _conv(planes, k, s, name, dtype):
    return nn.Conv(planes, (k, k), strides=(s, s), padding=k // 2,
                   kernel_init=nn.initializers.normal(0.01), dtype=dtype,
                   name=name)


class YOLACTFPN(nn.Module):
    planes: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        c3, c4, c5 = inputs
        p5 = _conv(self.planes, 1, 1, "lat_p5", self.dtype)(c5)
        p4 = _conv(self.planes, 1, 1, "lat_p4", self.dtype)(c4)
        p4 = _resize(p5, p4.shape[1], p4.shape[2]) + p4
        p3 = _conv(self.planes, 1, 1, "lat_p3", self.dtype)(c3)
        p3 = _resize(p4, p3.shape[1], p3.shape[2]) + p3
        p5 = nn.relu(_conv(self.planes, 3, 1, "pred_p5", self.dtype)(p5))
        p4 = nn.relu(_conv(self.planes, 3, 1, "pred_p4", self.dtype)(p4))
        p3 = nn.relu(_conv(self.planes, 3, 1, "pred_p3", self.dtype)(p3))
        p6 = nn.relu(_conv(self.planes, 3, 2, "down_p6", self.dtype)(p5))
        p7 = nn.relu(_conv(self.planes, 3, 2, "down_p7", self.dtype)(p6))
        return p3, p4, p5, p6, p7


class ProtoNet(nn.Module):
    planes: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, out_h, out_w):
        c = x.shape[-1]
        for i in range(3):
            x = nn.relu(_conv(c, 3, 1, f"proto1_{i}", self.dtype)(x))
        x = _resize(x, out_h, out_w)
        x = nn.relu(_conv(c, 3, 1, "proto2_0", self.dtype)(x))
        x = nn.relu(_conv(self.planes, 1, 1, "proto2_1", self.dtype)(x))
        return x


class YOLACTHead(nn.Module):
    num_anchors: int = 3
    proto_planes: int = 32
    num_classes: int = 81
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.relu(_conv(c, 3, 1, "conv1", self.dtype)(x))
        b, h, w, _ = x.shape
        conf = _conv(self.num_anchors * self.num_classes, 3, 1, "conf",
                     jnp.float32)(x.astype(jnp.float32))
        box = _conv(self.num_anchors * 4, 3, 1, "box",
                    jnp.float32)(x.astype(jnp.float32))
        coef = jnp.tanh(_conv(self.num_anchors * self.proto_planes, 3, 1,
                              "coef", jnp.float32)(x.astype(jnp.float32)))
        conf = conf.reshape(b, h, w, self.num_anchors, self.num_classes)
        box = box.reshape(b, h, w, self.num_anchors, 4)
        coef = coef.reshape(b, h, w, self.num_anchors, self.proto_planes)
        return conf, box, coef


class YOLACT(nn.Module):
    backbone_type: str
    backbone_pretrained_path: str = ""
    fpn_planes: int = 256
    proto_planes: int = 32
    num_classes: int = 81  # includes background at index 0
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = cls_backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")(x, train=train, return_features=True)
        c2_h, c2_w = feats[0].shape[1], feats[0].shape[2]
        fpn_feats = YOLACTFPN(self.fpn_planes, self.dtype,
                              name="fpn")(feats[1:4])
        proto_out = ProtoNet(self.proto_planes, self.dtype,
                             name="proto_net")(fpn_feats[0], c2_h, c2_w)
        head = YOLACTHead(3, self.proto_planes, self.num_classes,
                          self.dtype, name="head")
        class_preds, box_preds, coef_preds = [], [], []
        for f in fpn_feats:
            conf, box, coef = head(f)
            class_preds.append(conf)
            box_preds.append(box)
            coef_preds.append(coef)
        seg_pred = _conv(self.num_classes - 1, 1, 1, "semantic_seg_conv",
                         jnp.float32)(fpn_feats[0].astype(jnp.float32))
        return class_preds, box_preds, coef_preds, \
            proto_out.astype(jnp.float32), seg_pred


def _yolact(backbone_type, backbone_pretrained_path="", **kwargs):
    return YOLACT(backbone_type,
                  backbone_pretrained_path=backbone_pretrained_path,
                  **kwargs)


def resnet18_yolact(backbone_pretrained_path="", **kwargs):
    return _yolact("resnet18", backbone_pretrained_path, **kwargs)


def resnet34_yolact(backbone_pretrained_path="", **kwargs):
    return _yolact("resnet34", backbone_pretrained_path, **kwargs)


def resnet50_yolact(backbone_pretrained_path="", **kwargs):
    return _yolact("resnet50", backbone_pretrained_path, **kwargs)


def resnet101_yolact(backbone_pretrained_path="", **kwargs):
    return _yolact("resnet101", backbone_pretrained_path, **kwargs)


def resnet152_yolact(backbone_pretrained_path="", **kwargs):
    return _yolact("resnet152", backbone_pretrained_path, **kwargs)


def vanb2_yolact(backbone_pretrained_path="", **kwargs):
    return _yolact("van_b2", backbone_pretrained_path, **kwargs)


def convformerm36_yolact(backbone_pretrained_path="", **kwargs):
    return _yolact("convformer_m36", backbone_pretrained_path, **kwargs)

# DINOv3 ViT backbones via the VitPyramidNeck multi-scale wrapper# (reference dinov3_vit_yolact.py factories)

def dinov3_vit_small_patch16_yolact(backbone_pretrained_path="", **kwargs):
    return _yolact("dinov3_vit_small_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_small_plus_patch16_yolact(backbone_pretrained_path="", **kwargs):
    return _yolact("dinov3_vit_small_plus_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_base_patch16_yolact(backbone_pretrained_path="", **kwargs):
    return _yolact("dinov3_vit_base_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_large_patch16_yolact(backbone_pretrained_path="", **kwargs):
    return _yolact("dinov3_vit_large_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_large_plus_patch16_yolact(backbone_pretrained_path="", **kwargs):
    return _yolact("dinov3_vit_large_plus_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_huge_plus_patch16_yolact(backbone_pretrained_path="", **kwargs):
    return _yolact("dinov3_vit_huge_plus_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)
