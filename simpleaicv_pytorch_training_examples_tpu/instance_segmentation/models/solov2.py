"""SOLOv2 instance segmentation, NHWC flax.

Parity with /root/reference/SimpleAICV/instance_segmentation/models/
solov2.py: 5-level FPN over C2-C5 (+stride-2 subsample of P5), unified
mask-feature head fusing P2-P5 (coord-conv on the deepest level), per-level
kernel + category heads on grid-resized features (grids 40/36/24/16/12).

Output: (mask_feat_pred [B,H/4,W/4,E], kernel_preds list [B,G,G,E],
cate_preds list [B,G,G,C] logits).
"""

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...models import backbones as cls_backbones

__all__ = [
    "resnet18_solov2", "resnet34_solov2", "resnet50_solov2",
    "resnet101_solov2", "resnet152_solov2", "vanb2_solov2", "convformerm36_solov2",
    "dinov3_vit_small_patch16_solov2",
    "dinov3_vit_small_plus_patch16_solov2",
    "dinov3_vit_base_patch16_solov2",
    "dinov3_vit_large_patch16_solov2",
    "dinov3_vit_large_plus_patch16_solov2",
    "dinov3_vit_huge_plus_patch16_solov2",
]

_PRIOR_BIAS = -math.log((1.0 - 0.01) / 0.01)


def _resize(x, h, w):
    # antialias=False: torch F.interpolate(bilinear) semantics for the P2
    # 2x DOWNSCALE feeding the bbox head (jax antialiases downsampling by
    # default, which breaks published-checkpoint parity; upsampling paths
    # are unaffected)
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear",
                            antialias=False)


def _coord_features(x):
    b, h, w, _ = x.shape
    ys = jnp.linspace(-1, 1, h)
    xs = jnp.linspace(-1, 1, w)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([xx, yy], axis=-1)[None]
    coords = jnp.broadcast_to(coords, (b, h, w, 2)).astype(x.dtype)
    return jnp.concatenate([x, coords], axis=-1)


class ConvGnAct(nn.Module):
    planes: int
    kernel_size: int = 3
    has_gn: bool = True
    has_act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.planes, (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2, use_bias=not self.has_gn,
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name="conv")(x)
        if self.has_gn:
            x = nn.GroupNorm(32, dtype=self.dtype, name="gn")(x)
        if self.has_act:
            x = nn.relu(x)
        return x


class SOLOV2FPN(nn.Module):
    planes: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        xavier = nn.initializers.xavier_uniform()
        laterals = [
            nn.Conv(self.planes, (1, 1), kernel_init=xavier,
                    dtype=self.dtype, name=f"lateral_{i}")(f)
            for i, f in enumerate(inputs)
        ]
        for i in range(len(inputs) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _resize(
                laterals[i], laterals[i - 1].shape[1],
                laterals[i - 1].shape[2])
        outs = [
            nn.Conv(self.planes, (3, 3), padding=1, kernel_init=xavier,
                    dtype=self.dtype, name=f"fpn_{i}")(laterals[i])
            for i in range(len(inputs))
        ]
        # P6: stride-2 subsample of P5 (maxpool k1 s2)
        outs.append(outs[-1][:, ::2, ::2, :])
        return outs


class SOLOV2MaskFeatHead(nn.Module):
    planes: int = 128
    num_classes: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        h0, w0 = inputs[0].shape[1], inputs[0].shape[2]
        fused = ConvGnAct(self.planes, dtype=self.dtype,
                          name="level_0_conv1")(inputs[0])
        x = ConvGnAct(self.planes, dtype=self.dtype,
                      name="level_1_conv1")(inputs[1])
        fused = fused + _resize(x, h0, w0)
        x = ConvGnAct(self.planes, dtype=self.dtype,
                      name="level_2_conv1")(inputs[2])
        x = _resize(x, inputs[1].shape[1], inputs[1].shape[2])
        x = ConvGnAct(self.planes, dtype=self.dtype, name="level_2_conv2")(x)
        fused = fused + _resize(x, h0, w0)
        x = _coord_features(inputs[3])
        x = ConvGnAct(self.planes, dtype=self.dtype, name="level_3_conv1")(x)
        x = _resize(x, inputs[2].shape[1], inputs[2].shape[2])
        x = ConvGnAct(self.planes, dtype=self.dtype, name="level_3_conv2")(x)
        x = _resize(x, inputs[1].shape[1], inputs[1].shape[2])
        x = ConvGnAct(self.planes, dtype=self.dtype, name="level_3_conv3")(x)
        fused = fused + _resize(x, h0, w0)
        return ConvGnAct(self.num_classes, kernel_size=1, dtype=self.dtype,
                         name="pred_conv")(fused)


class SOLOV2BboxHead(nn.Module):
    inter_planes: int = 512
    instance_planes: int = 256
    stacked_conv_nums: int = 4
    grid_nums: Sequence[int] = (40, 36, 24, 16, 12)
    num_classes: int = 80
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        p2, p3, p4, p5, p6 = inputs
        p2 = _resize(p2, p3.shape[1], p3.shape[2])
        p6 = _resize(p6, p5.shape[1], p5.shape[2])
        features = [p2, p3, p4, p5, p6]

        cate_convs = [ConvGnAct(self.inter_planes, dtype=self.dtype,
                                name=f"cate_conv_{i}")
                      for i in range(self.stacked_conv_nums)]
        kernel_convs = [ConvGnAct(self.inter_planes, dtype=self.dtype,
                                  name=f"kernel_conv_{i}")
                        for i in range(self.stacked_conv_nums)]
        cate_pred_conv = nn.Conv(
            self.num_classes, (3, 3), padding=1,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(_PRIOR_BIAS),
            dtype=jnp.float32, name="cate_pred_conv")
        kernel_pred_conv = nn.Conv(
            self.instance_planes, (3, 3), padding=1,
            kernel_init=nn.initializers.normal(0.01), dtype=jnp.float32,
            name="kernel_pred_conv")

        kernel_preds, cate_preds = [], []
        for i, f in enumerate(features):
            g = self.grid_nums[i]
            kf = _coord_features(f)
            kf = _resize(kf, g, g)
            cf = kf[..., :-2]
            for conv in kernel_convs:
                kf = conv(kf)
            kernel_preds.append(kernel_pred_conv(kf.astype(jnp.float32)))
            for conv in cate_convs:
                cf = conv(cf)
            cate_preds.append(cate_pred_conv(cf.astype(jnp.float32)))
        return kernel_preds, cate_preds


class SOLOV2(nn.Module):
    backbone_type: str
    backbone_pretrained_path: str = ""
    fpn_planes: int = 256
    mask_feature_planes: int = 128
    mask_feature_num_classes: int = 256
    bbox_inter_planes: int = 512
    instance_planes: int = 256
    grid_nums: Sequence[int] = (40, 36, 24, 16, 12)
    num_classes: int = 80
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = cls_backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")(x, train=train, return_features=True)
        fpn_feats = SOLOV2FPN(self.fpn_planes, self.dtype,
                              name="fpn")(feats)
        mask_feat = SOLOV2MaskFeatHead(
            self.mask_feature_planes, self.mask_feature_num_classes,
            self.dtype, name="mask_feature_head")(fpn_feats[0:4])
        kernel_preds, cate_preds = SOLOV2BboxHead(
            self.bbox_inter_planes, self.instance_planes, 4, self.grid_nums,
            self.num_classes, self.dtype, name="bbox_head")(fpn_feats)
        return mask_feat.astype(jnp.float32), kernel_preds, cate_preds


def _solov2(backbone_type, backbone_pretrained_path="", **kwargs):
    return SOLOV2(backbone_type,
                  backbone_pretrained_path=backbone_pretrained_path,
                  **kwargs)


def resnet18_solov2(backbone_pretrained_path="", **kwargs):
    return _solov2("resnet18", backbone_pretrained_path, **kwargs)


def resnet34_solov2(backbone_pretrained_path="", **kwargs):
    return _solov2("resnet34", backbone_pretrained_path, **kwargs)


def resnet50_solov2(backbone_pretrained_path="", **kwargs):
    return _solov2("resnet50", backbone_pretrained_path, **kwargs)


def resnet101_solov2(backbone_pretrained_path="", **kwargs):
    return _solov2("resnet101", backbone_pretrained_path, **kwargs)


def resnet152_solov2(backbone_pretrained_path="", **kwargs):
    return _solov2("resnet152", backbone_pretrained_path, **kwargs)


def vanb2_solov2(backbone_pretrained_path="", **kwargs):
    return _solov2("van_b2", backbone_pretrained_path, **kwargs)


def convformerm36_solov2(backbone_pretrained_path="", **kwargs):
    return _solov2("convformer_m36", backbone_pretrained_path, **kwargs)

# DINOv3 ViT backbones via the VitPyramidNeck multi-scale wrapper# (reference dinov3_vit_solov2.py factories)

def dinov3_vit_small_patch16_solov2(backbone_pretrained_path="", **kwargs):
    return _solov2("dinov3_vit_small_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_small_plus_patch16_solov2(backbone_pretrained_path="", **kwargs):
    return _solov2("dinov3_vit_small_plus_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_base_patch16_solov2(backbone_pretrained_path="", **kwargs):
    return _solov2("dinov3_vit_base_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_large_patch16_solov2(backbone_pretrained_path="", **kwargs):
    return _solov2("dinov3_vit_large_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_large_plus_patch16_solov2(backbone_pretrained_path="", **kwargs):
    return _solov2("dinov3_vit_large_plus_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)

def dinov3_vit_huge_plus_patch16_solov2(backbone_pretrained_path="", **kwargs):
    return _solov2("dinov3_vit_huge_plus_patch16_det_backbone",
        backbone_pretrained_path, **kwargs)
