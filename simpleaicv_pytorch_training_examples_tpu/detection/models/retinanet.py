"""RetinaNet, NHWC flax.

Parity with /root/reference/SimpleAICV/detection/models/retinanet.py:27-120:
backbone C3-C5 -> RetinaFPN (P6 from C5) -> shared cls/reg towers over 5
levels. Output: [cls_heads, reg_heads] lists of [B, H, W, A, C] / [B,H,W,A,4].
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...models import backbones as cls_backbones
from .fpn import RetinaFPN
from .head import RetinaClsHead, RetinaRegHead

__all__ = [
    "resnet18_retinanet", "resnet34_retinanet", "resnet50_retinanet",
    "resnet101_retinanet", "resnet152_retinanet",
    "vanb2_retinanet", "convformerm36_retinanet",
    "dinov3_vit_small_patch16_retinanet",
    "dinov3_vit_small_plus_patch16_retinanet",
    "dinov3_vit_base_patch16_retinanet",
    "dinov3_vit_large_patch16_retinanet",
    "dinov3_vit_large_plus_patch16_retinanet",
    "dinov3_vit_huge_plus_patch16_retinanet",
]


class RetinaNet(nn.Module):
    backbone_type: str
    backbone_pretrained_path: str = ""
    planes: int = 256
    num_anchors: int = 9
    num_classes: int = 80
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = cls_backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")
        self.fpn = RetinaFPN(self.planes, use_p5=False, dtype=self.dtype,
                             name="fpn")
        self.cls_head = RetinaClsHead(self.num_anchors, self.num_classes,
                                      num_layers=4, dtype=self.dtype,
                                      name="cls_head")
        self.reg_head = RetinaRegHead(self.num_anchors, num_layers=4,
                                      dtype=self.dtype, name="reg_head")

    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train=train, return_features=True)
        feats = self.fpn(feats[1:4])
        cls_heads = [self.cls_head(f) for f in feats]
        reg_heads = [self.reg_head(f) for f in feats]
        return [cls_heads, reg_heads]


def _retinanet(backbone_type, backbone_pretrained_path="", **kwargs):
    return RetinaNet(backbone_type,
                     backbone_pretrained_path=backbone_pretrained_path,
                     **kwargs)


def resnet18_retinanet(backbone_pretrained_path="", **kwargs):
    return _retinanet("resnet18", backbone_pretrained_path, **kwargs)


def resnet34_retinanet(backbone_pretrained_path="", **kwargs):
    return _retinanet("resnet34", backbone_pretrained_path, **kwargs)


def resnet50_retinanet(backbone_pretrained_path="", **kwargs):
    return _retinanet("resnet50", backbone_pretrained_path, **kwargs)


def resnet101_retinanet(backbone_pretrained_path="", **kwargs):
    return _retinanet("resnet101", backbone_pretrained_path, **kwargs)


def resnet152_retinanet(backbone_pretrained_path="", **kwargs):
    return _retinanet("resnet152", backbone_pretrained_path, **kwargs)


def vanb2_retinanet(backbone_pretrained_path="", **kwargs):
    return _retinanet("van_b2", backbone_pretrained_path, **kwargs)


def convformerm36_retinanet(backbone_pretrained_path="", **kwargs):
    return _retinanet("convformer_m36", backbone_pretrained_path, **kwargs)

# DINOv3 ViT backbones via the VitPyramidNeck multi-scale wrapper# (reference dinov3_vit_retinanet.py factories)

def dinov3_vit_small_patch16_retinanet(backbone_pretrained_path="", **kwargs):
    return _retinanet("dinov3_vit_small_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_small_plus_patch16_retinanet(backbone_pretrained_path="", **kwargs):
    return _retinanet("dinov3_vit_small_plus_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_base_patch16_retinanet(backbone_pretrained_path="", **kwargs):
    return _retinanet("dinov3_vit_base_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_large_patch16_retinanet(backbone_pretrained_path="", **kwargs):
    return _retinanet("dinov3_vit_large_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_large_plus_patch16_retinanet(backbone_pretrained_path="", **kwargs):
    return _retinanet("dinov3_vit_large_plus_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_huge_plus_patch16_retinanet(backbone_pretrained_path="", **kwargs):
    return _retinanet("dinov3_vit_huge_plus_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)
