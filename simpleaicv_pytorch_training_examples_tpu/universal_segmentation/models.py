"""Universal segmentation model (DINOv3 trunk + in-stream queries).

Parity with /root/reference/SimpleAICV/universal_segmentation/models/
dinov3_universal_segmentation.py:64-170 (UniversalSegmentation): 100
learned query tokens are concatenated into the DINOv3 token stream before
the last `query_block_nums` blocks (queries carry no RoPE — the backbone
rotates only the trailing grid tokens), then a linear class head on the
query tokens, a 3-layer query projection, ScaleBlock transpose-conv
upsampling of the grid features, and dot-product mask prediction upsampled
to the input size.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models import backbones as cls_backbones
from ..models.common import trunc_normal

__all__ = [
    "UniversalSegmentation",
    "dinov3_vit_small_patch16_universal_segmentation",
    "dinov3_vit_small_plus_patch16_universal_segmentation",
    "dinov3_vit_base_patch16_universal_segmentation",
    "dinov3_vit_large_patch16_universal_segmentation",
    "dinov3_vit_large_plus_patch16_universal_segmentation",
    "dinov3_vit_huge_plus_patch16_universal_segmentation",
]


class ScaleBlock(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.ConvTranspose(c, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="conv1")(x)
        x = nn.gelu(x)
        x = nn.Conv(c, (3, 3), padding=1, feature_group_count=c,
                    use_bias=False, dtype=self.dtype, name="conv2")(x)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class UniversalSegmentation(nn.Module):
    backbone_type: str
    backbone_pretrained_path: str = ""
    image_size: int = 512
    query_num: int = 100
    num_classes: int = 151  # includes background / no-object
    query_block_nums: int = 4
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = cls_backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")
        c = backbone.embedding_planes
        grid = self.image_size // backbone.patch_size

        b = x.shape[0]
        query_embedding = self.param("query_embedding",
                                     nn.initializers.normal(1.0),
                                     (self.query_num, c))
        queries = jnp.broadcast_to(query_embedding[None],
                                   (b, self.query_num, c))
        tokens = backbone(x, train=train, extra_tokens=queries,
                          extra_token_blocks=self.query_block_nums)
        q = tokens[:, :self.query_num]
        grid_tokens = tokens[:, self.query_num:]

        class_preds = nn.Dense(self.num_classes, dtype=jnp.float32,
                               kernel_init=trunc_normal(0.02),
                               name="class_pred")(q.astype(jnp.float32))

        feats = grid_tokens.reshape(b, grid, grid, c)
        n_upscale = max(1, int(math.log2(backbone.patch_size)) - 2)
        for i in range(n_upscale):
            feats = ScaleBlock(self.dtype, name=f"upscale_{i}")(feats)

        for i in range(3):
            q = nn.Dense(c, dtype=self.dtype,
                         kernel_init=trunc_normal(0.02),
                         name=f"query_proj_{i}")(q)
            if i < 2:
                q = nn.gelu(q)
        mask_preds = jnp.einsum("bqc,bhwc->bqhw", q.astype(jnp.float32),
                                feats.astype(jnp.float32))
        mask_preds = jax.image.resize(
            mask_preds,
            (b, self.query_num, self.image_size, self.image_size),
            "bilinear")
        return mask_preds, class_preds


def _universal_segmentation(backbone_type, backbone_pretrained_path="",
                            **kwargs):
    return UniversalSegmentation(
        backbone_type, backbone_pretrained_path=backbone_pretrained_path,
        **kwargs)


def dinov3_vit_small_patch16_universal_segmentation(
        backbone_pretrained_path="", **kwargs):
    return _universal_segmentation("dinov3_vit_small_patch16_backbone",
                                   backbone_pretrained_path, **kwargs)


def dinov3_vit_small_plus_patch16_universal_segmentation(
        backbone_pretrained_path="", **kwargs):
    return _universal_segmentation(
        "dinov3_vit_small_plus_patch16_backbone",
        backbone_pretrained_path, **kwargs)


def dinov3_vit_base_patch16_universal_segmentation(
        backbone_pretrained_path="", **kwargs):
    return _universal_segmentation("dinov3_vit_base_patch16_backbone",
                                   backbone_pretrained_path, **kwargs)


def dinov3_vit_large_patch16_universal_segmentation(
        backbone_pretrained_path="", **kwargs):
    return _universal_segmentation("dinov3_vit_large_patch16_backbone",
                                   backbone_pretrained_path, **kwargs)


def dinov3_vit_large_plus_patch16_universal_segmentation(
        backbone_pretrained_path="", **kwargs):
    return _universal_segmentation(
        "dinov3_vit_large_plus_patch16_backbone",
        backbone_pretrained_path, **kwargs)


def dinov3_vit_huge_plus_patch16_universal_segmentation(
        backbone_pretrained_path="", **kwargs):
    return _universal_segmentation("dinov3_vit_huge_plus_patch16_backbone",
                                   backbone_pretrained_path, **kwargs)


class UniversalMatting(nn.Module):
    """Universal matting (reference dinov3_universal_matting.py:64-250):
    the UniversalSegmentation trunk whose per-query masks feed global
    (3-ch trimap, via ScaleBlocks over the query-stacked channel dim) and
    local (alpha) upsampling branches to input resolution, fused per query
    by collaborative matting. Returns (global [B,Q,H,W,3] sigmoid,
    local [B,Q,H,W,1], fused [B,Q,H,W,1], class_preds [B,Q,C])."""
    backbone_type: str
    backbone_pretrained_path: str = ""
    image_size: int = 1024
    query_num: int = 100
    num_classes: int = 2
    query_block_nums: int = 4
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..models.pfan import PFANMatting

        backbone = cls_backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")
        c = backbone.embedding_planes
        grid = self.image_size // backbone.patch_size
        b = x.shape[0]
        query_embedding = self.param("query_embedding",
                                     nn.initializers.normal(1.0),
                                     (self.query_num, c))
        queries = jnp.broadcast_to(query_embedding[None],
                                   (b, self.query_num, c))
        tokens = backbone(x, train=train, extra_tokens=queries,
                          extra_token_blocks=self.query_block_nums)
        q = tokens[:, :self.query_num]
        grid_tokens = tokens[:, self.query_num:]

        class_preds = nn.Dense(self.num_classes, dtype=jnp.float32,
                               kernel_init=trunc_normal(0.02),
                               name="class_pred")(q.astype(jnp.float32))

        feats = grid_tokens.reshape(b, grid, grid, c)
        n_upscale = max(1, int(math.log2(backbone.patch_size)) - 2)
        for i in range(n_upscale):
            feats = ScaleBlock(self.dtype, name=f"upscale_{i}")(feats)
        for i in range(3):
            q = nn.Dense(c, dtype=self.dtype,
                         kernel_init=trunc_normal(0.02),
                         name=f"query_proj_{i}")(q)
            if i < 2:
                q = nn.gelu(q)
        mask_preds = jnp.einsum("bqc,bhwc->bhwq", q.astype(feats.dtype),
                                feats)  # NHW(Q) channel-last

        # global branch: Q*3 channels through 2 ScaleBlocks -> input res
        g = jnp.repeat(mask_preds, 3, axis=-1)
        for i in range(2):
            g = ScaleBlock(self.dtype, name=f"global_upscale_{i}")(g)
        g = g.reshape(b, self.image_size, self.image_size, self.query_num,
                      3).transpose(0, 3, 1, 2, 4)
        global_preds = nn.sigmoid(g.astype(jnp.float32))

        l = mask_preds
        for i in range(2):
            l = ScaleBlock(self.dtype, name=f"local_upscale_{i}")(l)
        l = l.reshape(b, self.image_size, self.image_size, self.query_num,
                      1).transpose(0, 3, 1, 2, 4)
        local_preds = nn.sigmoid(l.astype(jnp.float32))

        bq = b * self.query_num
        fused = PFANMatting.collaborative_matting(
            global_preds.reshape(bq, self.image_size, self.image_size, 3),
            local_preds.reshape(bq, self.image_size, self.image_size, 1))
        fused_preds = fused.reshape(b, self.query_num, self.image_size,
                                    self.image_size, 1)
        return global_preds, local_preds, fused_preds, class_preds


def dinov3_vit_small_patch16_universal_matting(backbone_pretrained_path="",
                                               **kwargs):
    return UniversalMatting("dinov3_vit_small_patch16_backbone",
                            backbone_pretrained_path, **kwargs)


def dinov3_vit_base_patch16_universal_matting(backbone_pretrained_path="",
                                              **kwargs):
    return UniversalMatting("dinov3_vit_base_patch16_backbone",
                            backbone_pretrained_path, **kwargs)


def dinov3_vit_large_patch16_universal_matting(backbone_pretrained_path="",
                                               **kwargs):
    return UniversalMatting("dinov3_vit_large_patch16_backbone",
                            backbone_pretrained_path, **kwargs)


__all__.extend(["UniversalMatting",
                "dinov3_vit_small_patch16_universal_matting",
                "dinov3_vit_base_patch16_universal_matting",
                "dinov3_vit_large_patch16_universal_matting"])
