"""SAM model, flax.

Parity with /root/reference/SimpleAICV/interactive_segmentation/models/
segment_anything/sam.py: ViT encoder + prompt encoder + mask decoder with
split forward paths (forward_image_encoder /
forward_prompt_encoder_mask_decoder) so the expensive image embedding is
computed once per step and the decoder re-runs per prompt iteration
(the reference's iterative-click training, scripts.py:374-413).
Mask preds are upsampled 4x back to the input resolution.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .image_encoder import ViTImageEncoder
from .mask_decoder import MaskDecoder
from .prompt_encoder import PromptEncoder

__all__ = ["SAM", "sam_b", "sam_l", "sam_h"]


class SAM(nn.Module):
    image_size: int = 1024
    patch_size: int = 16
    image_encoder_embedding_planes: int = 768
    image_encoder_block_nums: int = 12
    image_encoder_head_nums: int = 12
    image_encoder_global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    prompt_encoder_embedding_planes: int = 256
    sigmoid_out: bool = False
    binary_mask_out: bool = False
    mask_threshold: float = 0.0
    use_gradient_checkpoint: bool = False
    # named jax.checkpoint policy for the encoder remat blocks
    # (ops/remat.py); "dots_saveable" keeps MXU outputs resident and
    # recomputes only elementwise tails in backward
    remat_policy: Any = None
    # pallas flash attention for the encoder's global blocks (TPU only)
    use_flash_attention: bool = False
    # "sam_vit" or a DINOv3 backbone registry name (reference
    # dinov3_segment_anything/dinov3_sam.py swaps only the encoder)
    image_encoder_type: str = "sam_vit"
    dtype: Any = jnp.float32

    def setup(self):
        if self.image_encoder_type != "sam_vit":
            from ..dinov3_segment_anything import DINOv3SAMImageEncoder
            self.image_encoder = DINOv3SAMImageEncoder(
                backbone_type=self.image_encoder_type,
                out_planes=self.prompt_encoder_embedding_planes,
                use_gradient_checkpoint=self.use_gradient_checkpoint,
                use_flash_attention=self.use_flash_attention,
                dtype=self.dtype)
        else:
            self.image_encoder = ViTImageEncoder(
                image_size=self.image_size,
                patch_size=self.patch_size,
                embedding_planes=self.image_encoder_embedding_planes,
                block_nums=self.image_encoder_block_nums,
                head_nums=self.image_encoder_head_nums,
                out_planes=self.prompt_encoder_embedding_planes,
                window_size=14,
                global_attn_indexes=self.image_encoder_global_attn_indexes,
                use_gradient_checkpoint=self.use_gradient_checkpoint,
                remat_policy=self.remat_policy,
                use_flash_attention=self.use_flash_attention,
                dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(
            image_size=self.image_size, patch_size=self.patch_size,
            embedding_planes=self.prompt_encoder_embedding_planes,
            dtype=self.dtype)
        self.mask_decoder = MaskDecoder(
            inplanes=self.prompt_encoder_embedding_planes,
            num_multimask_outputs=3, dtype=self.dtype)

    def forward_image_encoder(self, batch_images):
        return self.image_encoder(batch_images)

    def forward_prompt_encoder_mask_decoder(self, batch_image_embeddings,
                                            batch_prompts,
                                            mask_out_idxs=(0, 1, 2, 3)):
        sparse, dense = self.prompt_encoder(
            batch_prompts.get("prompt_point"),
            batch_prompts.get("prompt_box"),
            batch_prompts.get("prompt_mask"),
            boxes_valid=batch_prompts.get("prompt_box_valid"),
            masks_valid=batch_prompts.get("prompt_mask_valid"))
        image_pe = self.prompt_encoder.get_dense_pe_layer()  # [1,H,W,C]
        mask_preds, iou_preds = self.mask_decoder(
            batch_image_embeddings, image_pe, sparse, dense, mask_out_idxs)
        b, t = mask_preds.shape[0], mask_preds.shape[1]
        mask_preds = jax.image.resize(
            mask_preds, (b, t, self.image_size, self.image_size),
            "bilinear")
        if self.sigmoid_out:
            mask_preds = jax.nn.sigmoid(mask_preds)
        if self.binary_mask_out:
            mask_preds = (mask_preds > self.mask_threshold).astype(
                mask_preds.dtype)
        return mask_preds, iou_preds

    def __call__(self, batch_images, batch_prompts,
                 mask_out_idxs=(0, 1, 2, 3)):
        embeddings = self.forward_image_encoder(batch_images)
        return self.forward_prompt_encoder_mask_decoder(
            embeddings, batch_prompts, mask_out_idxs)


def _sam(**kwargs):
    return SAM(**kwargs)


def sam_b(image_size=1024, patch_size=16, **kwargs):
    return _sam(image_size=image_size, patch_size=patch_size,
                image_encoder_embedding_planes=768,
                image_encoder_block_nums=12, image_encoder_head_nums=12,
                image_encoder_global_attn_indexes=(2, 5, 8, 11), **kwargs)


def sam_l(image_size=1024, patch_size=16, **kwargs):
    return _sam(image_size=image_size, patch_size=patch_size,
                image_encoder_embedding_planes=1024,
                image_encoder_block_nums=24, image_encoder_head_nums=16,
                image_encoder_global_attn_indexes=(5, 11, 17, 23), **kwargs)


def sam_h(image_size=1024, patch_size=16, **kwargs):
    return _sam(image_size=image_size, patch_size=patch_size,
                image_encoder_embedding_planes=1280,
                image_encoder_block_nums=32, image_encoder_head_nums=16,
                image_encoder_global_attn_indexes=(7, 15, 23, 31), **kwargs)
