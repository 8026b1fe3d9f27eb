"""SAM2 single-image interactive segmentation, flax.

Parity with /root/reference/SimpleAICV/video_interactive_segmentation/
models/segment_anything2/sam2image.py:423+ (SAM2Image): the Hiera encoder
+ prompt encoder + SAM2 mask decoder (object-score token) applied to one
image — the image-pretraining stage of the SAM2 recipe and the
"hiera_l_sam2image_predict" examples. Split forward mirrors SAM
(encode once, decode per prompt iteration).
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ....interactive_segmentation.models.segment_anything.prompt_encoder import (
    PromptEncoder)
from .image_encoder import ImageEncoder
from .sam2 import SAM2MaskDecoder

__all__ = ["SAM2Image", "sam2_hiera_tiny_image", "sam2_hiera_small_image",
           "sam2_hiera_base_plus_image", "sam2_hiera_large_image"]


class SAM2Image(nn.Module):
    image_size: int = 1024
    embedding_planes: int = 112
    head_nums: int = 2
    block_nums: Sequence[int] = (2, 3, 16, 3)
    window_specification: Sequence[int] = (8, 4, 14, 7)
    global_attention_blocks: Sequence[int] = (12, 16, 20)
    fpn_planes: int = 256
    sigmoid_out: bool = False
    binary_mask_out: bool = False
    mask_threshold: float = 0.0
    # stride-4/8 FPN skips into the decoder upscaling (reference
    # sam2image.py conv_s0/conv_s1 path)
    use_high_res_features: bool = False
    use_gradient_checkpoint: bool = False
    # fused pallas attention in the Hiera global blocks (TPU only)
    use_flash_attention: bool = False
    image_encoder_type: str = "hiera"
    dtype: Any = jnp.float32

    def setup(self):
        if self.image_encoder_type != "hiera":
            from ..dinov3_segment_anything2 import DINOv3SAM2ImageEncoder
            self.image_encoder = DINOv3SAM2ImageEncoder(
                backbone_type=self.image_encoder_type,
                fpn_planes=self.fpn_planes,
                use_gradient_checkpoint=self.use_gradient_checkpoint,
                dtype=self.dtype)
        else:
            self.image_encoder = ImageEncoder(
                embedding_planes=self.embedding_planes,
                head_nums=self.head_nums, block_nums=self.block_nums,
                window_specification=self.window_specification,
                global_attention_blocks=self.global_attention_blocks,
                fpn_planes=self.fpn_planes,
                use_gradient_checkpoint=self.use_gradient_checkpoint,
                use_flash_attention=self.use_flash_attention,
                dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(
            image_size=self.image_size, patch_size=16,
            embedding_planes=self.fpn_planes, dtype=self.dtype)
        self.mask_decoder = SAM2MaskDecoder(
            inplanes=self.fpn_planes,
            use_high_res_features=self.use_high_res_features,
            dtype=self.dtype)

    def forward_image_encoder(self, batch_images):
        """-> feat16, or (feat16, (feat_s4, feat_s8)) with
        use_high_res_features."""
        b = batch_images.shape[0]
        s16 = self.image_size // 16
        features, _ = self.image_encoder(batch_images)
        feat = features[-1].reshape(b, s16, s16, self.fpn_planes)
        if self.use_high_res_features:
            s4, s8 = self.image_size // 4, self.image_size // 8
            return feat, (features[0].reshape(b, s4, s4, self.fpn_planes),
                          features[1].reshape(b, s8, s8, self.fpn_planes))
        return feat

    def forward_prompt_encoder_mask_decoder(self, batch_image_embeddings,
                                            batch_prompts,
                                            high_res_features=None):
        sparse, dense = self.prompt_encoder(
            batch_prompts.get("prompt_point"),
            batch_prompts.get("prompt_box"),
            batch_prompts.get("prompt_mask"),
            boxes_valid=batch_prompts.get("prompt_box_valid"),
            masks_valid=batch_prompts.get("prompt_mask_valid"))
        image_pe = self.prompt_encoder.get_dense_pe_layer()
        mask_preds, iou_preds, _, obj_logits = self.mask_decoder(
            batch_image_embeddings, image_pe, sparse, dense,
            high_res_features=high_res_features)
        b, t = mask_preds.shape[0], mask_preds.shape[1]
        mask_preds = jax.image.resize(
            mask_preds, (b, t, self.image_size, self.image_size),
            "bilinear")
        if self.sigmoid_out:
            mask_preds = jax.nn.sigmoid(mask_preds)
        if self.binary_mask_out:
            mask_preds = (mask_preds > self.mask_threshold).astype(
                mask_preds.dtype)
        return mask_preds, iou_preds, obj_logits

    def __call__(self, batch_images, batch_prompts):
        out = self.forward_image_encoder(batch_images)
        if self.use_high_res_features:
            embeddings, highres = out
            return self.forward_prompt_encoder_mask_decoder(
                embeddings, batch_prompts, high_res_features=highres)
        return self.forward_prompt_encoder_mask_decoder(
            out, batch_prompts)


_SIZES = {
    "tiny": dict(embedding_planes=96, head_nums=1, block_nums=(1, 2, 7, 2),
                 global_attention_blocks=(5, 7, 9)),
    "small": dict(embedding_planes=96, head_nums=1,
                  block_nums=(1, 2, 11, 2),
                  global_attention_blocks=(7, 10, 13)),
    "base_plus": dict(embedding_planes=112, head_nums=2,
                      block_nums=(2, 3, 16, 3),
                      global_attention_blocks=(12, 16, 20)),
    "large": dict(embedding_planes=144, head_nums=2,
                  block_nums=(2, 6, 36, 4),
                  window_specification=(8, 4, 16, 8),
                  global_attention_blocks=(23, 33, 43)),
}


def sam2_hiera_tiny_image(**kw):
    return SAM2Image(**{**_SIZES["tiny"], **kw})


def sam2_hiera_small_image(**kw):
    return SAM2Image(**{**_SIZES["small"], **kw})


def sam2_hiera_base_plus_image(**kw):
    return SAM2Image(**{**_SIZES["base_plus"], **kw})


def sam2_hiera_large_image(**kw):
    return SAM2Image(**{**_SIZES["large"], **kw})
