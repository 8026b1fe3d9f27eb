"""SAM two-way transformer, flax.

Parity with /root/reference/SimpleAICV/interactive_segmentation/models/
segment_anything/transformer.py: 2 TwoWayAttentionBlocks (query self-attn,
token->image cross-attn with 2x head downsample, MLP, image->token
cross-attn) + final token->image attention, post-layernorms.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class SAMCrossAttention(nn.Module):
    head_nums: int
    downsample_rate: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        c = q.shape[-1]
        internal = c // self.downsample_rate
        nh = self.head_nums
        hd = internal // nh
        qp = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)
        b, nq, _ = qp.shape
        nk = kp.shape[1]
        qp = qp.reshape(b, nq, nh, hd)
        kp = kp.reshape(b, nk, nh, hd)
        vp = vp.reshape(b, nk, nh, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qp, kp,
                          preferred_element_type=jnp.float32) * (hd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp).reshape(b, nq,
                                                              internal)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    head_nums: int = 8
    mlp_planes: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        c = queries.shape[-1]
        if self.skip_first_layer_pe:
            queries = SAMCrossAttention(self.head_nums, 1, self.dtype,
                                        name="self_attn")(queries, queries,
                                                          queries)
        else:
            q = queries + query_pe
            queries = queries + SAMCrossAttention(
                self.head_nums, 1, self.dtype, name="self_attn")(q, q,
                                                                 queries)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + SAMCrossAttention(
            self.head_nums, self.attention_downsample_rate, self.dtype,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm2")(queries)

        y = nn.Dense(self.mlp_planes, dtype=self.dtype,
                     name="mlp_lin1")(queries)
        # relu, not gelu: reference MLPBlock (interactive_segmentation
        # transformer.py:13) and SAM2's 2-layer MLP (transformer.py:18)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_lin2")(nn.relu(y))
        queries = nn.LayerNorm(dtype=self.dtype, name="norm3")(queries + y)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + SAMCrossAttention(
            self.head_nums, self.attention_downsample_rate, self.dtype,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    block_nums: int = 2
    embedding_planes: int = 256
    head_nums: int = 8
    mlp_planes: int = 2048
    attention_downsample_rate: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding [B,H,W,C]; image_pe [B,H,W,C] or [1,H,W,C];
        point_embedding [B,N,C]."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = jnp.broadcast_to(image_pe.reshape(
            image_pe.shape[0], h * w, c), (b, h * w, c)).astype(keys.dtype)
        queries = point_embedding

        for i in range(self.block_nums):
            queries, keys = TwoWayAttentionBlock(
                self.head_nums, self.mlp_planes,
                self.attention_downsample_rate, skip_first_layer_pe=(i == 0),
                dtype=self.dtype, name=f"layer_{i}")(queries, keys,
                                                     point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + SAMCrossAttention(
            self.head_nums, self.attention_downsample_rate, self.dtype,
            name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(dtype=self.dtype,
                               name="norm_final_attn")(queries)
        return queries, keys
