"""DETR, NHWC flax (batch-first attention).

Parity with /root/reference/SimpleAICV/detection/models/detr.py: backbone
C5 -> 1x1 proj to 256 -> 6-layer post-norm transformer encoder (with sine
position embedding computed from the padding mask, detr_resnet.py:28-64)
-> 6-layer decoder over 100 learned queries -> per-layer class head
(num_classes+1 incl. no-object) + 3-layer MLP box head with sigmoid cxcywh.
Returns cls [L,B,Q,C+1] and reg [L,B,Q,4] for deep supervision.

TPU notes: attention is batch-first fused einsum with fp32 softmax and
additive -1e9 key-padding mask; the [L,...] stack is a static python list
(6 layers) so the whole forward is one XLA program.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...models import backbones as cls_backbones
from ...models.common import Dropout

__all__ = ["resnet18_detr", "resnet34_detr", "resnet50_detr",
           "resnet101_detr", "resnet152_detr"]


def sine_position_embedding(masks, inplanes=128, temperature=10000,
                            eps=1e-6):
    """masks [B, H, W] bool (True = padding) -> [B, H, W, 2*inplanes]."""
    not_masks = (~masks).astype(jnp.float32)
    y_embed = jnp.cumsum(not_masks, axis=1)
    x_embed = jnp.cumsum(not_masks, axis=2)
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(inplanes, dtype=jnp.float32)
    dim_t = temperature**(2 * (dim_t // 2) / inplanes)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]),
                       jnp.cos(pos_x[..., 1::2])], axis=4).reshape(
                           *pos_x.shape[:3], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]),
                       jnp.cos(pos_y[..., 1::2])], axis=4).reshape(
                           *pos_y.shape[:3], -1)
    return jnp.concatenate([pos_y, pos_x], axis=3)


class MaskedMHA(nn.Module):
    """Batch-first multi-head attention with key padding mask."""
    head_nums: int
    dropout_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, train=False):
        b, nq, c = q.shape
        nk = k.shape[1]
        h = self.head_nums
        d = c // h
        xavier = nn.initializers.xavier_uniform()
        qp = nn.Dense(c, dtype=self.dtype, kernel_init=xavier,
                      name="q_proj")(q).reshape(b, nq, h, d)
        kp = nn.Dense(c, dtype=self.dtype, kernel_init=xavier,
                      name="k_proj")(k).reshape(b, nk, h, d)
        vp = nn.Dense(c, dtype=self.dtype, kernel_init=xavier,
                      name="v_proj")(v).reshape(b, nk, h, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qp, kp,
                            preferred_element_type=jnp.float32) * (d**-0.5)
        if key_padding_mask is not None:
            # True = padded key -> excluded
            logits = logits + jnp.where(
                key_padding_mask[:, None, None, :], -1e9, 0.0)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        attn = Dropout(self.dropout_prob)(attn, train)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp).reshape(b, nq, c)
        return nn.Dense(c, dtype=self.dtype, kernel_init=xavier,
                        name="out_proj")(out)


class DETRTransformerEncoderLayer(nn.Module):
    head_nums: int = 8
    feedforward_ratio: int = 4
    dropout_prob: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, key_padding_mask, pos, train=False):
        c = src.shape[-1]
        q = k = src + pos
        src2 = MaskedMHA(self.head_nums, self.dropout_prob, self.dtype,
                         name="attention")(q, k, src, key_padding_mask,
                                           train)
        src = src + Dropout(self.dropout_prob)(src2, train)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src)
        xavier = nn.initializers.xavier_uniform()
        src2 = nn.Dense(c * self.feedforward_ratio, dtype=self.dtype,
                        kernel_init=xavier, name="linear1")(src)
        src2 = Dropout(self.dropout_prob)(nn.relu(src2), train)
        src2 = nn.Dense(c, dtype=self.dtype, kernel_init=xavier,
                        name="linear2")(src2)
        src = src + Dropout(self.dropout_prob)(src2, train)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(src)


class DETRTransformerDecoderLayer(nn.Module):
    head_nums: int = 8
    feedforward_ratio: int = 4
    dropout_prob: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, memory_key_padding_mask, pos, query_pos,
                 train=False):
        c = tgt.shape[-1]
        q = k = tgt + query_pos
        tgt2 = MaskedMHA(self.head_nums, self.dropout_prob, self.dtype,
                         name="attention")(q, k, tgt, None, train)
        tgt = tgt + Dropout(self.dropout_prob)(tgt2, train)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt)

        tgt2 = MaskedMHA(self.head_nums, self.dropout_prob, self.dtype,
                         name="multihead_attention")(
                             tgt + query_pos, memory + pos, memory,
                             memory_key_padding_mask, train)
        tgt = tgt + Dropout(self.dropout_prob)(tgt2, train)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt)

        xavier = nn.initializers.xavier_uniform()
        tgt2 = nn.Dense(c * self.feedforward_ratio, dtype=self.dtype,
                        kernel_init=xavier, name="linear1")(tgt)
        tgt2 = Dropout(self.dropout_prob)(nn.relu(tgt2), train)
        tgt2 = nn.Dense(c, dtype=self.dtype, kernel_init=xavier,
                        name="linear2")(tgt2)
        tgt = tgt + Dropout(self.dropout_prob)(tgt2, train)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt)


class DETRClsRegHead(nn.Module):
    num_classes: int  # includes no-object
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        xavier = nn.initializers.xavier_uniform()
        cls_out = nn.Dense(self.num_classes, dtype=jnp.float32,
                           kernel_init=xavier, name="cls_head")(
                               x.astype(jnp.float32))
        reg = x
        c = x.shape[-1]
        for i in range(self.num_layers - 1):
            reg = nn.relu(nn.Dense(c, dtype=self.dtype, kernel_init=xavier,
                                   name=f"reg_{i}")(reg))
        reg = nn.Dense(4, dtype=jnp.float32, kernel_init=xavier,
                       name="reg_out")(reg.astype(jnp.float32))
        return cls_out, nn.sigmoid(reg)


class DETR(nn.Module):
    backbone_type: str
    backbone_pretrained_path: str = ""
    hidden_inplanes: int = 256
    query_nums: int = 100
    num_classes: int = 80
    encoder_layer_nums: int = 6
    decoder_layer_nums: int = 6
    dropout_prob: float = 0.1
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, masks, train: bool = False):
        feats = cls_backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")(x, train=train, return_features=True)
        features = feats[-1]  # [B, h, w, C5]
        b, h, w, _ = features.shape

        # downsample the pixel mask to the feature grid (nearest)
        masks = jax.image.resize(masks.astype(jnp.float32), (b, h, w),
                                 "nearest") > 0.5
        pos = sine_position_embedding(masks, self.hidden_inplanes // 2)
        pos = pos.reshape(b, h * w, self.hidden_inplanes).astype(self.dtype)

        features = nn.Conv(self.hidden_inplanes, (1, 1), dtype=self.dtype,
                           name="proj_conv")(features)
        src = features.reshape(b, h * w, self.hidden_inplanes)
        key_padding = masks.reshape(b, h * w)

        query_embed = self.param(
            "query_embedding", nn.initializers.normal(1.0),
            (self.query_nums, self.hidden_inplanes))
        query_pos = jnp.broadcast_to(
            query_embed[None].astype(self.dtype),
            (b, self.query_nums, self.hidden_inplanes))

        memory = src
        for i in range(self.encoder_layer_nums):
            memory = DETRTransformerEncoderLayer(
                8, 4, self.dropout_prob, self.dtype,
                name=f"encoder_{i}")(memory, key_padding, pos, train)

        tgt = jnp.zeros_like(query_pos)
        head = DETRClsRegHead(self.num_classes + 1, 3, self.dtype,
                              name="head")
        decoder_norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")
        cls_outs, reg_outs = [], []
        for i in range(self.decoder_layer_nums):
            tgt = DETRTransformerDecoderLayer(
                8, 4, self.dropout_prob, self.dtype,
                name=f"decoder_{i}")(tgt, memory, key_padding, pos,
                                     query_pos, train)
            cls_o, reg_o = head(decoder_norm(tgt))
            cls_outs.append(cls_o)
            reg_outs.append(reg_o)

        return [jnp.stack(cls_outs), jnp.stack(reg_outs)]


def _detr(backbone_type, backbone_pretrained_path="", **kwargs):
    return DETR(backbone_type,
                backbone_pretrained_path=backbone_pretrained_path, **kwargs)


def resnet18_detr(backbone_pretrained_path="", **kwargs):
    return _detr("resnet18", backbone_pretrained_path, **kwargs)


def resnet34_detr(backbone_pretrained_path="", **kwargs):
    return _detr("resnet34", backbone_pretrained_path, **kwargs)


def resnet50_detr(backbone_pretrained_path="", **kwargs):
    return _detr("resnet50", backbone_pretrained_path, **kwargs)


def resnet101_detr(backbone_pretrained_path="", **kwargs):
    return _detr("resnet101", backbone_pretrained_path, **kwargs)


def resnet152_detr(backbone_pretrained_path="", **kwargs):
    return _detr("resnet152", backbone_pretrained_path, **kwargs)
