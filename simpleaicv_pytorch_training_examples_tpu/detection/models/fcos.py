"""FCOS, NHWC flax.

Parity with /root/reference/SimpleAICV/detection/models/fcos.py: backbone
C3-C5 -> RetinaFPN (use_p5=True) -> shared GN cls/reg/centerness head with
per-level learnable exp scales on the reg output.
Output: [cls_heads, reg_heads, center_heads].
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...models import backbones as cls_backbones
from .fpn import RetinaFPN
from .head import FCOSClsRegCntHead

__all__ = [
    "resnet18_fcos", "resnet34_fcos", "resnet50_fcos", "resnet101_fcos",
    "resnet152_fcos", "vanb2_fcos", "convformerm36_fcos",
    "dinov3_vit_small_patch16_fcos",
    "dinov3_vit_small_plus_patch16_fcos",
    "dinov3_vit_base_patch16_fcos",
    "dinov3_vit_large_patch16_fcos",
    "dinov3_vit_large_plus_patch16_fcos",
    "dinov3_vit_huge_plus_patch16_fcos",
]


class FCOS(nn.Module):
    backbone_type: str
    backbone_pretrained_path: str = ""
    planes: int = 256
    num_classes: int = 80
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = cls_backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")
        self.fpn = RetinaFPN(self.planes, use_p5=True, dtype=self.dtype,
                             name="fpn")
        self.clsregcnt_head = FCOSClsRegCntHead(self.num_classes,
                                                num_layers=4, use_gn=True,
                                                cnt_on_reg=True,
                                                dtype=self.dtype,
                                                name="clsregcnt_head")
        # reference fcos.py:53 inits the per-level scales to 1.0 (the reg
        # multiplier starts at e^1, not 1) — match it for training parity
        self.scales = self.param("scales", nn.initializers.ones, (5,))

    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train=train, return_features=True)
        feats = self.fpn(feats[1:4])
        cls_heads, reg_heads, center_heads = [], [], []
        for i, f in enumerate(feats):
            cls_out, reg_out, cnt_out = self.clsregcnt_head(f)
            reg_out = reg_out * jnp.exp(self.scales[i]).astype(reg_out.dtype)
            cls_heads.append(cls_out)
            reg_heads.append(reg_out)
            center_heads.append(cnt_out)
        return [cls_heads, reg_heads, center_heads]


def _fcos(backbone_type, backbone_pretrained_path="", **kwargs):
    return FCOS(backbone_type,
                backbone_pretrained_path=backbone_pretrained_path, **kwargs)


def resnet18_fcos(backbone_pretrained_path="", **kwargs):
    return _fcos("resnet18", backbone_pretrained_path, **kwargs)


def resnet34_fcos(backbone_pretrained_path="", **kwargs):
    return _fcos("resnet34", backbone_pretrained_path, **kwargs)


def resnet50_fcos(backbone_pretrained_path="", **kwargs):
    return _fcos("resnet50", backbone_pretrained_path, **kwargs)


def resnet101_fcos(backbone_pretrained_path="", **kwargs):
    return _fcos("resnet101", backbone_pretrained_path, **kwargs)


def resnet152_fcos(backbone_pretrained_path="", **kwargs):
    return _fcos("resnet152", backbone_pretrained_path, **kwargs)


def vanb2_fcos(backbone_pretrained_path="", **kwargs):
    return _fcos("van_b2", backbone_pretrained_path, **kwargs)


def convformerm36_fcos(backbone_pretrained_path="", **kwargs):
    return _fcos("convformer_m36", backbone_pretrained_path, **kwargs)

# DINOv3 ViT backbones via the VitPyramidNeck multi-scale wrapper# (reference dinov3_vit_fcos.py factories)

def dinov3_vit_small_patch16_fcos(backbone_pretrained_path="", **kwargs):
    return _fcos("dinov3_vit_small_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_small_plus_patch16_fcos(backbone_pretrained_path="", **kwargs):
    return _fcos("dinov3_vit_small_plus_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_base_patch16_fcos(backbone_pretrained_path="", **kwargs):
    return _fcos("dinov3_vit_base_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_large_patch16_fcos(backbone_pretrained_path="", **kwargs):
    return _fcos("dinov3_vit_large_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_large_plus_patch16_fcos(backbone_pretrained_path="", **kwargs):
    return _fcos("dinov3_vit_large_plus_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_huge_plus_patch16_fcos(backbone_pretrained_path="", **kwargs):
    return _fcos("dinov3_vit_huge_plus_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)
