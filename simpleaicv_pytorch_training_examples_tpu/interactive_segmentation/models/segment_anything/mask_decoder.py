"""SAM mask decoder, flax.

Parity with /root/reference/SimpleAICV/interactive_segmentation/models/
segment_anything/mask_decoder.py: iou token + 4 mask tokens prepended to
the sparse prompts, TwoWayTransformer, 4x transpose-conv upscaling,
per-token hypernetwork MLPs producing mask kernels, IoU-prediction MLP.
Returns (mask_preds [B, n_idx, 4H, 4W], iou_preds [B, n_idx]).
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .image_encoder import LayerNorm2d
from .transformer import TwoWayTransformer


class MLP(nn.Module):
    hidden_planes: int
    planes: int
    layer_nums: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layer_nums):
            out = self.planes if i == self.layer_nums - 1 else \
                self.hidden_planes
            x = nn.Dense(out, dtype=self.dtype, name=f"layer_{i}")(x)
            if i < self.layer_nums - 1:
                x = nn.relu(x)
        return x


class MaskDecoder(nn.Module):
    inplanes: int = 256
    num_multimask_outputs: int = 3
    iou_prediction_head_block_nums: int = 3
    iou_prediction_head_hidden_planes: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt_embeddings,
                 dense_prompt_embeddings, mask_out_idxs=(0, 1, 2, 3)):
        c = self.inplanes
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, c))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (num_mask_tokens, c))
        b = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        output_tokens = jnp.broadcast_to(output_tokens[None],
                                         (b, 1 + num_mask_tokens, c))
        tokens = jnp.concatenate(
            [output_tokens,
             sparse_prompt_embeddings.astype(output_tokens.dtype)], axis=1)

        if image_embeddings.shape[0] != b:
            src = jnp.repeat(image_embeddings, b, axis=0)
        else:
            src = image_embeddings
        src = src + dense_prompt_embeddings.astype(src.dtype)

        hs, src = TwoWayTransformer(
            block_nums=2, embedding_planes=c, head_nums=8, mlp_planes=2048,
            dtype=self.dtype, name="transformer")(src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + num_mask_tokens]

        h = w = int(round((src.shape[1])**0.5))
        src = src.reshape(b, h, w, c)
        x = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upscale_conv1")(src)
        # exact (erf) gelu: torch nn.GELU default (weight-import parity)
        x = nn.gelu(LayerNorm2d(name="upscale_ln")(x), approximate=False)
        x = nn.gelu(nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2),
                                     dtype=self.dtype,
                                     name="upscale_conv2")(x),
                    approximate=False)

        hyper_in = jnp.stack([
            MLP(c, c // 8, 3, self.dtype, name=f"hyper_mlp_{i}")(
                mask_tokens_out[:, i]) for i in range(num_mask_tokens)
        ], axis=1)  # [B, T, c/8]
        mask_preds = jnp.einsum("btc,bhwc->bthw", hyper_in, x)

        iou_preds = MLP(self.iou_prediction_head_hidden_planes,
                        num_mask_tokens,
                        self.iou_prediction_head_block_nums, self.dtype,
                        name="iou_prediction_head")(iou_token_out)

        idxs = jnp.asarray(mask_out_idxs)
        return mask_preds[:, idxs], iou_preds[:, idxs]
