"""SAM interactive matting, flax.

Parity with /root/reference/SimpleAICV/interactive_segmentation/models/
segment_anything_matting/{sam_matting,mask_decoder_matting}.py: the SAM
mask decoder additionally exposes its 64-grid transformer features (feat3)
and 256-grid upscaled features (feat1); a matting head fuses
(best-mask, feat3, feat1) through global (3-ch trimap) and local (alpha)
conv decoders with 2x transpose-conv upsampling to input resolution, and a
collaborative fusion identical to PFANMatting
(models/pfan.py::collaborative_matting).

Forward: (global_preds [B,3,H,W]->NHWC [B,H,W,3], local_preds [B,H,W,1],
fused_preds [B,H,W,1], iou_preds [B,M]).
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...models.common import ConvBnAct
from ...models.pfan import ConvTransposeBnAct, PFANMatting
from .segment_anything.image_encoder import ViTImageEncoder
from .segment_anything.mask_decoder import MLP
from .segment_anything.prompt_encoder import PromptEncoder
from .segment_anything.transformer import TwoWayTransformer
from .segment_anything.image_encoder import LayerNorm2d

__all__ = ["SAMMatting", "sam_b_matting", "sam_l_matting", "sam_h_matting"]


class MaskDecoderMatting(nn.Module):
    """SAM mask decoder that also returns feat3 (/16) and feat1 (/4)."""
    inplanes: int = 256
    num_multimask_outputs: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe,
                 sparse_prompt_embeddings, dense_prompt_embeddings,
                 mask_out_idxs=(0, 1, 2, 3)):
        c = self.inplanes
        num_mask_tokens = self.num_multimask_outputs + 1
        init = nn.initializers.normal(1.0)
        iou_token = self.param("iou_token", init, (1, c))
        mask_tokens = self.param("mask_tokens", init, (num_mask_tokens, c))
        b = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        output_tokens = jnp.broadcast_to(output_tokens[None],
                                         (b, 1 + num_mask_tokens, c))
        tokens = jnp.concatenate(
            [output_tokens,
             sparse_prompt_embeddings.astype(output_tokens.dtype)], axis=1)
        src = image_embeddings + dense_prompt_embeddings.astype(
            image_embeddings.dtype)
        hs, src = TwoWayTransformer(2, c, 8, 2048, dtype=self.dtype,
                                    name="transformer")(src, image_pe,
                                                        tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + num_mask_tokens]

        h = w = int(round((src.shape[1])**0.5))
        feat3 = src.reshape(b, h, w, c)
        x = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upscale_conv1")(feat3)
        x = nn.gelu(LayerNorm2d(name="upscale_ln")(x))
        feat1 = nn.gelu(nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2),
                                         dtype=self.dtype,
                                         name="upscale_conv2")(x))
        hyper_in = jnp.stack([
            MLP(c, c // 8, 3, self.dtype, name=f"hyper_mlp_{i}")(
                mask_tokens_out[:, i]) for i in range(num_mask_tokens)
        ], axis=1)
        mask_preds = jnp.einsum("btc,bhwc->bthw", hyper_in, feat1)
        iou_preds = MLP(c, num_mask_tokens, 3, self.dtype,
                        name="iou_prediction_head")(iou_token_out)
        idxs = jnp.asarray(mask_out_idxs)
        return mask_preds[:, idxs], iou_preds[:, idxs], feat3, feat1


class MattingHead(nn.Module):
    """(best mask /4, feat3 /16, feat1 /4) -> global trimap + local alpha at
    input resolution (reference sam_matting.py:229-302)."""
    cpfe_planes: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, masks, feat3, feat1, train: bool = False):
        h1, w1 = feat1.shape[1], feat1.shape[2]
        f3 = ConvBnAct(self.cpfe_planes, 1, 1, 0, dtype=self.dtype,
                       name="global_feat3_reduce")(feat3, train)
        f3 = jax.image.resize(f3, (f3.shape[0], h1, w1, f3.shape[-1]),
                              "bilinear")
        f1 = ConvBnAct(self.cpfe_planes, 1, 1, 0, dtype=self.dtype,
                       name="global_feat1_reduce")(feat1, train)

        def decoder(prefix):
            x = jnp.concatenate([f1, f3, masks.astype(f1.dtype)], axis=-1)
            x = ConvBnAct(self.cpfe_planes, 3, 1, 1, dtype=self.dtype,
                          name=f"{prefix}_combine")(x, train)
            x = ConvBnAct(self.cpfe_planes, 1, 1, 0, dtype=self.dtype,
                          name=f"{prefix}_reduce")(x, train)
            x = ConvTransposeBnAct(self.cpfe_planes, dtype=self.dtype,
                                   name=f"{prefix}_up1")(x, train)
            x = ConvBnAct(self.cpfe_planes, 3, 1, 1, dtype=self.dtype,
                          name=f"{prefix}_up2")(x, train)
            x = ConvTransposeBnAct(self.cpfe_planes, dtype=self.dtype,
                                   name=f"{prefix}_up3")(x, train)
            return x

        g = decoder("global")
        global_pred = nn.sigmoid(nn.Conv(3, (3, 3), padding=1,
                                         dtype=jnp.float32,
                                         name="global_pred_conv")(
                                             g.astype(jnp.float32)))
        l = decoder("local")
        local_pred = nn.sigmoid(nn.Conv(1, (3, 3), padding=1,
                                        dtype=jnp.float32,
                                        name="local_pred_conv")(
                                            l.astype(jnp.float32)))
        fused_pred = PFANMatting.collaborative_matting(global_pred,
                                                       local_pred)
        return global_pred, local_pred, fused_pred


class SAMMatting(nn.Module):
    image_size: int = 1024
    patch_size: int = 16
    image_encoder_embedding_planes: int = 768
    image_encoder_block_nums: int = 12
    image_encoder_head_nums: int = 12
    image_encoder_global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    prompt_encoder_embedding_planes: int = 256
    use_gradient_checkpoint: bool = False
    # "sam_vit" or a DINOv3 backbone registry name (reference
    # dinov3_segment_anything_matting/dinov3_sam_matting.py)
    image_encoder_type: str = "sam_vit"
    dtype: Any = jnp.float32

    def setup(self):
        if self.image_encoder_type != "sam_vit":
            from ..dinov3_segment_anything import DINOv3SAMImageEncoder
            self.image_encoder = DINOv3SAMImageEncoder(
                backbone_type=self.image_encoder_type,
                out_planes=self.prompt_encoder_embedding_planes,
                use_gradient_checkpoint=self.use_gradient_checkpoint,
                dtype=self.dtype)
        else:
            self.image_encoder = ViTImageEncoder(
                image_size=self.image_size, patch_size=self.patch_size,
                embedding_planes=self.image_encoder_embedding_planes,
                block_nums=self.image_encoder_block_nums,
                head_nums=self.image_encoder_head_nums,
                out_planes=self.prompt_encoder_embedding_planes,
                window_size=14,
                global_attn_indexes=self.image_encoder_global_attn_indexes,
                use_gradient_checkpoint=self.use_gradient_checkpoint,
                dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(
            image_size=self.image_size, patch_size=self.patch_size,
            embedding_planes=self.prompt_encoder_embedding_planes,
            dtype=self.dtype)
        self.mask_decoder = MaskDecoderMatting(
            inplanes=self.prompt_encoder_embedding_planes,
            dtype=self.dtype)
        self.matting_head = MattingHead(dtype=self.dtype)

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
        image_pe = self.prompt_encoder.get_dense_pe_layer()
        mask_preds, iou_preds, feat3, feat1 = self.mask_decoder(
            batch_image_embeddings, image_pe, sparse, dense, mask_out_idxs)
        b = mask_preds.shape[0]
        best = jnp.argmax(iou_preds, axis=-1)
        best_mask = mask_preds[jnp.arange(b), best][..., None]  # /4 res
        global_p, local_p, fused_p = self.matting_head(best_mask, feat3,
                                                       feat1)
        s = self.image_size
        global_p = jax.image.resize(global_p, (b, s, s, 3), "bilinear")
        local_p = jax.image.resize(local_p, (b, s, s, 1), "bilinear")
        fused_p = jax.image.resize(fused_p, (b, s, s, 1), "bilinear")
        return global_p, local_p, fused_p, iou_preds

    def __call__(self, batch_images, batch_prompts,
                 mask_out_idxs=(0, 1, 2, 3)):
        embeddings = self.forward_image_encoder(batch_images)
        return self.forward_prompt_encoder_mask_decoder(
            embeddings, batch_prompts, mask_out_idxs)


def _sam_matting(**kwargs):
    return SAMMatting(**kwargs)


def sam_b_matting(image_size=1024, **kwargs):
    return _sam_matting(image_size=image_size,
                        image_encoder_embedding_planes=768,
                        image_encoder_block_nums=12,
                        image_encoder_head_nums=12,
                        image_encoder_global_attn_indexes=(2, 5, 8, 11),
                        **kwargs)


def sam_l_matting(image_size=1024, **kwargs):
    return _sam_matting(image_size=image_size,
                        image_encoder_embedding_planes=1024,
                        image_encoder_block_nums=24,
                        image_encoder_head_nums=16,
                        image_encoder_global_attn_indexes=(5, 11, 17, 23),
                        **kwargs)


def sam_h_matting(image_size=1024, **kwargs):
    return _sam_matting(image_size=image_size,
                        image_encoder_embedding_planes=1280,
                        image_encoder_block_nums=32,
                        image_encoder_head_nums=16,
                        image_encoder_global_attn_indexes=(7, 15, 23, 31),
                        **kwargs)
