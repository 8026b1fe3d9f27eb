"""PFAN dense-prediction family (shared trunk + task heads), NHWC flax.

Capability parity with:
- /root/reference/SimpleAICV/semantic_segmentation/models/
  pfan_semantic_segmentation.py (PFANSemanticSegmentation)
- /root/reference/SimpleAICV/salient_object_detection/models/
  pfan_segmentation.py (PFANSegmentation, 1-ch sigmoid)
- /root/reference/SimpleAICV/human_matting/models/pfan_matting.py
  (PFANMatting: global trimap head + local alpha head + collaborative
  fusion)
- face/human parsing reuse PFANSemanticSegmentation with different class
  counts (reference models/pfan_face_parsing.py, pfan_human_parsing.py).

Trunk: CPFE dilated-conv pyramids on C4/C5, fused high-level path upsampled
to C2 resolution, low-level C2/C3 path, concat + reduce + 2x transpose-conv
upsampling back to input resolution.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import ConvBnAct, kaiming_normal_conv


def _resize(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")


class CPFE(nn.Module):
    """Context-aware pyramid feature extraction: 1x1 + 3 dilated 3x3."""
    planes: int = 32
    dilation_rate_list: Sequence[int] = (3, 5, 7)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = [nn.Conv(self.planes, (1, 1), use_bias=False,
                        kernel_init=kaiming_normal_conv, dtype=self.dtype,
                        name="conv_1_1")(x)]
        for d in self.dilation_rate_list:
            outs.append(nn.Conv(self.planes, (3, 3), padding=d,
                                kernel_dilation=(d, d), use_bias=False,
                                kernel_init=kaiming_normal_conv,
                                dtype=self.dtype, name=f"conv_dil_{d}")(x))
        x = jnp.concatenate(outs, axis=-1)
        x = ConvBnAct(self.planes, 3, 1, 1, dtype=self.dtype,
                      name="conv")(x, train)
        return x


class ConvTransposeBnAct(nn.Module):
    planes: int
    kernel_size: int = 2
    stride: int = 2
    has_act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.planes,
                             (self.kernel_size, self.kernel_size),
                             strides=(self.stride, self.stride),
                             use_bias=False, dtype=self.dtype,
                             name="deconv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        if self.has_act:
            x = nn.relu(x)
        return x


class PFANDecoder(nn.Module):
    """One PFAN decoder path: (C2,C3,C4,C5) -> full-res feature map."""
    cpfe_planes: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False, extra_high=None,
                 extra_low=None):
        x1, x2, x3, x4 = feats
        h1, w1 = x1.shape[1], x1.shape[2]

        x4_g = CPFE(self.cpfe_planes, dtype=self.dtype,
                    name="high_level_cpfe_4")(x4, train)
        x3_g = CPFE(self.cpfe_planes, dtype=self.dtype,
                    name="high_level_cpfe_3")(x3, train)
        x4_g = _resize(x4_g, x3.shape[1], x3.shape[2])
        high = jnp.concatenate([x3_g, x4_g], axis=-1)
        high = ConvBnAct(self.cpfe_planes, 1, 1, 0, has_act=False,
                         dtype=self.dtype, name="high_level_conv")(high,
                                                                   train)
        high = _resize(high, h1, w1)

        x1_g = ConvBnAct(self.cpfe_planes, 3, 1, 1, dtype=self.dtype,
                         name="low_level_conv_1")(x1, train)
        x2_g = ConvBnAct(self.cpfe_planes, 3, 1, 1, dtype=self.dtype,
                         name="low_level_conv_2")(x2, train)
        x2_g = _resize(x2_g, h1, w1)
        low = jnp.concatenate([x1_g, x2_g], axis=-1)
        low = ConvBnAct(self.cpfe_planes, 1, 1, 0, has_act=False,
                        dtype=self.dtype, name="low_level_conv")(low, train)

        # matting local path concatenates the global path's features
        cat = [low]
        if extra_low is not None:
            cat.append(extra_low)
        cat.append(high)
        if extra_high is not None:
            cat.append(extra_high)
        fused = jnp.concatenate(cat, axis=-1)
        fused = ConvBnAct(self.cpfe_planes, 1, 1, 0, has_act=False,
                          dtype=self.dtype, name="reduce_conv1")(fused,
                                                                 train)
        fused = ConvTransposeBnAct(self.cpfe_planes, dtype=self.dtype,
                                   name="upsample_conv1")(fused, train)
        fused = ConvBnAct(self.cpfe_planes, 3, 1, 1, dtype=self.dtype,
                          name="upsample_conv2")(fused, train)
        fused = ConvTransposeBnAct(self.cpfe_planes, dtype=self.dtype,
                                   name="upsample_conv3")(fused, train)
        return fused, high, low


class PFANSemanticSegmentation(nn.Module):
    backbone_type: str
    backbone_pretrained_path: str = ""
    cpfe_planes: int = 32
    num_classes: int = 151
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from . import backbones
        feats = backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")(x, train=train, return_features=True)
        out, _, _ = PFANDecoder(self.cpfe_planes, self.dtype,
                                name="decoder")(feats, train)
        pred = nn.Conv(self.num_classes, (3, 3), padding=1,
                       dtype=jnp.float32, name="pred_conv")(
                           out.astype(jnp.float32))
        return pred


class PFANSegmentation(nn.Module):
    """Salient-object detection: 1-channel sigmoid map."""
    backbone_type: str
    backbone_pretrained_path: str = ""
    cpfe_planes: int = 32
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from . import backbones
        feats = backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")(x, train=train, return_features=True)
        out, _, _ = PFANDecoder(self.cpfe_planes, self.dtype,
                                name="decoder")(feats, train)
        pred = nn.Conv(1, (3, 3), padding=1, dtype=jnp.float32,
                       name="pred_conv")(out.astype(jnp.float32))
        return nn.sigmoid(pred)


class PFANMatting(nn.Module):
    """Human matting: global trimap (3-ch) + local alpha + fused alpha."""
    backbone_type: str
    backbone_pretrained_path: str = ""
    cpfe_planes: int = 32
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from . import backbones
        feats = backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")(x, train=train, return_features=True)
        g_out, g_high, g_low = PFANDecoder(self.cpfe_planes, self.dtype,
                                           name="global_decoder")(feats,
                                                                  train)
        global_pred = nn.Conv(3, (3, 3), padding=1, dtype=jnp.float32,
                              name="global_pred_conv")(
                                  g_out.astype(jnp.float32))
        global_pred = nn.sigmoid(global_pred)

        l_out, _, _ = PFANDecoder(self.cpfe_planes, self.dtype,
                                  name="local_decoder")(
                                      feats, train, extra_high=g_high,
                                      extra_low=g_low)
        local_pred = nn.Conv(1, (3, 3), padding=1, dtype=jnp.float32,
                             name="local_pred_conv")(
                                 l_out.astype(jnp.float32))
        local_pred = nn.sigmoid(local_pred)

        fused_pred = self.collaborative_matting(global_pred, local_pred)
        return global_pred, local_pred, fused_pred

    @staticmethod
    def collaborative_matting(global_pred, local_pred):
        """trimap classes: 0 bg, 1 transition (local), 2 fg (global)."""
        max_cls = jnp.argmax(global_pred, axis=-1)[..., None]
        trimap_mask = (max_cls == 1).astype(local_pred.dtype)
        fg_mask = (max_cls == 2).astype(local_pred.dtype)
        return local_pred * trimap_mask + fg_mask


_BACKBONE_PLANES = {
    "resnet18": "resnet18", "resnet34": "resnet34", "resnet50": "resnet50",
    "resnet101": "resnet101", "resnet152": "resnet152",
    "vanb0": "van_b0", "vanb1": "van_b1", "vanb2": "van_b2",
    "vanb3": "van_b3",
    "convformers18": "convformer_s18", "convformers36": "convformer_s36",
    "convformerm36": "convformer_m36", "convformerb36": "convformer_b36",
    # DINOv3 ViT + VitPyramidNeck multi-scale wrappers (reference
    # dinov3_vit_pfan_*.py variants in every dense-prediction family)
    "dinov3_vit_small_patch16": "dinov3_vit_small_patch16_det_backbone",
    "dinov3_vit_small_plus_patch16":
        "dinov3_vit_small_plus_patch16_det_backbone",
    "dinov3_vit_base_patch16": "dinov3_vit_base_patch16_det_backbone",
    "dinov3_vit_large_patch16": "dinov3_vit_large_patch16_det_backbone",
    "dinov3_vit_large_plus_patch16":
        "dinov3_vit_large_plus_patch16_det_backbone",
    "dinov3_vit_huge_plus_patch16":
        "dinov3_vit_huge_plus_patch16_det_backbone",
}


def make_pfan_factories(model_cls, suffix):
    """Generate the reference's per-backbone factory functions."""
    out = {}
    for short, backbone in _BACKBONE_PLANES.items():
        def factory(backbone_pretrained_path="", _bb=backbone, **kwargs):
            return model_cls(backbone_type=_bb,
                             backbone_pretrained_path=backbone_pretrained_path,
                             **kwargs)
        out[f"{short}_{suffix}"] = factory
    return out
