"""DINOv3 ViT backbone (axial RoPE, LayerScale, optional SwiGLU), NHWC flax.

Parity with /root/reference/SimpleAICV/detection/models/backbones/
dinov3vit.py:35-720 (DinoVisionTransformer): patch embed, period-based
axial RoPE over normalized [-1,1] coords applied to the trailing H*W grid
tokens (prefix tokens — e.g. injected queries — are left unrotated),
pre-norm blocks with LayerScale residuals, final LayerNorm, output grid
features [B, H/p, W/p, C].
"""

import math
from typing import Any, Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..common import PatchEmbed, trunc_normal

__all__ = [
    "DinoVisionTransformer",
    "dinov3_vit_small_patch16_backbone",
    "dinov3_vit_small_plus_patch16_backbone",
    "dinov3_vit_base_patch16_backbone",
    "dinov3_vit_large_patch16_backbone",
    "dinov3_vit_large_plus_patch16_backbone",
    "dinov3_vit_huge_plus_patch16_backbone",
]


def rope_sincos(h, w, head_planes, base=100.0):
    """Axial RoPE tables: ([HW, head_planes], [HW, head_planes]) sin/cos."""
    d4 = head_planes // 4
    periods = base**(2 * np.arange(d4) / (head_planes // 2))
    coords_h = (np.arange(0.5, h) / h) * 2.0 - 1.0
    coords_w = (np.arange(0.5, w) / w) * 2.0 - 1.0
    gh, gw = np.meshgrid(coords_h, coords_w, indexing="ij")
    coords = np.stack([gh, gw], axis=-1).reshape(-1, 2)  # [HW, 2]
    # [HW, 2, d4] angles
    angles = 2 * math.pi * coords[:, :, None] / periods[None, None, :]
    angles = angles.reshape(-1, 2 * d4)          # [HW, D/2]
    angles = np.tile(angles, (1, 2))             # [HW, D]
    return (jnp.asarray(np.sin(angles), jnp.float32),
            jnp.asarray(np.cos(angles), jnp.float32))


def rope_sincos_augmented(h, w, head_planes, base, rng, shift_coords=None,
                          jitter_coords=None, rescale_coords=None):
    """Train-time RoPE tables with randomized coords (reference
    RopePositionEmbedding forward, dinov3vit.py:230-253: uniform shift,
    log-uniform per-axis jitter, log-uniform isotropic rescale)."""
    d4 = head_planes // 4
    periods = jnp.asarray(base**(2 * np.arange(d4) / (head_planes // 2)),
                          jnp.float32)
    coords_h = (jnp.arange(0.5, h) / h) * 2.0 - 1.0
    coords_w = (jnp.arange(0.5, w) / w) * 2.0 - 1.0
    gh, gw = jnp.meshgrid(coords_h, coords_w, indexing="ij")
    coords = jnp.stack([gh, gw], axis=-1).reshape(-1, 2)
    k_shift, k_jitter, k_rescale = jax.random.split(rng, 3)
    if shift_coords is not None:
        coords = coords + jax.random.uniform(
            k_shift, (2,), minval=-shift_coords, maxval=shift_coords)[None]
    if jitter_coords is not None:
        a = math.log(jitter_coords)
        coords = coords * jnp.exp(jax.random.uniform(
            k_jitter, (2,), minval=-a, maxval=a))[None]
    if rescale_coords is not None:
        a = math.log(rescale_coords)
        coords = coords * jnp.exp(jax.random.uniform(
            k_rescale, (1,), minval=-a, maxval=a))
    angles = 2 * math.pi * coords[:, :, None] / periods[None, None, :]
    angles = angles.reshape(-1, 2 * d4)
    angles = jnp.tile(angles, (1, 2))
    return jnp.sin(angles), jnp.cos(angles)


def rope_rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def rope_apply(x, sin, cos):
    return x * cos + rope_rotate_half(x) * sin


class LayerScale(nn.Module):
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma",
                           nn.initializers.constant(self.init_values),
                           (x.shape[-1],))
        return x * gamma.astype(x.dtype)


class SwiGLUFFN(nn.Module):
    hidden_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = (int(self.hidden_planes * 2 / 3) + 7) // 8 * 8
        x12 = nn.Dense(2 * h, dtype=self.dtype, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(c, dtype=self.dtype, name="w3")(nn.silu(x1) * x2)


class DINOv3SelfAttention(nn.Module):
    head_nums: int
    qkv_bias: bool = True
    proj_bias: bool = True
    dtype: Any = jnp.float32
    use_fused_attention: bool = False

    @nn.compact
    def __call__(self, x, rope=None):
        b, n, c = x.shape
        nh = self.head_nums
        hd = c // nh
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal(0.02), name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [B, nh, N, hd]
        if rope is not None:
            sin, cos = rope
            hw = sin.shape[0]
            prefix = n - hw
            q = q.astype(jnp.float32)
            k = k.astype(jnp.float32)
            q = jnp.concatenate(
                [q[:, :, :prefix], rope_apply(q[:, :, prefix:], sin, cos)],
                axis=2).astype(self.dtype)
            k = jnp.concatenate(
                [k[:, :, :prefix], rope_apply(k[:, :, prefix:], sin, cos)],
                axis=2).astype(self.dtype)
        if self.use_fused_attention and hd <= 128 and n <= 1024:
            # in-VMEM fused scores/softmax/value kernel (XLA fallback
            # off-TPU); the [B,H,N,D] transposes above are already paid,
            # so this is a pure score-matrix-HBM-traffic win
            from ...ops.pallas.fused_attention import fused_attention
            out = fused_attention(q, k, v, force_pallas=True)
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                              preferred_element_type=jnp.float32) * (hd**-0.5)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, use_bias=self.proj_bias, dtype=self.dtype,
                        kernel_init=trunc_normal(0.02), name="proj")(out)


class DINOv3Block(nn.Module):
    head_nums: int
    ffn_ratio: float = 4.0
    layerscale_init: float = 1e-5
    ffn_layer: str = "mlp"
    dtype: Any = jnp.float32
    use_fused_attention: bool = False

    @nn.compact
    def __call__(self, x, rope=None):
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = DINOv3SelfAttention(self.head_nums, dtype=self.dtype,
                                use_fused_attention=self.use_fused_attention,
                                name="attn")(h, rope)
        x = x + LayerScale(self.layerscale_init, name="ls1")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        if self.ffn_layer == "mlp":
            h = nn.Dense(int(c * self.ffn_ratio), dtype=self.dtype,
                         kernel_init=trunc_normal(0.02), name="mlp_fc1")(h)
            h = nn.Dense(c, dtype=self.dtype,
                         kernel_init=trunc_normal(0.02),
                         name="mlp_fc2")(nn.gelu(h, approximate=False))
        else:
            h = SwiGLUFFN(int(c * self.ffn_ratio), self.dtype,
                          name="swiglu")(h)
        return x + LayerScale(self.layerscale_init, name="ls2")(h)


class DinoVisionTransformer(nn.Module):
    patch_size: int = 16
    embedding_planes: int = 768
    block_nums: int = 12
    head_nums: int = 12
    ffn_ratio: float = 4.0
    ffn_layer: str = "mlp"
    layerscale_init: float = 1e-5
    rope_base: float = 100.0
    # train-time RoPE coordinate augmentation (reference
    # pos_embed_rope_rescale_coords=2 in every dinov3 factory,
    # dinov3vit.py:606-618; shift/jitter stay off there)
    rope_shift_coords: Optional[float] = None
    rope_jitter_coords: Optional[float] = None
    rope_rescale_coords: Optional[float] = 2.0
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32
    use_fused_attention: bool = False

    @property
    def out_channels(self):
        return self.embedding_planes

    def rope_for(self, h, w):
        return rope_sincos(h, w, self.embedding_planes // self.head_nums,
                           self.rope_base)

    @nn.compact
    def __call__(self, x, train: bool = False, extra_tokens=None,
                 extra_token_blocks: int = 0):
        """x NHWC image. extra_tokens [B, Q, C] are concatenated in FRONT of
        the grid tokens before the last `extra_token_blocks` blocks (the
        universal-segmentation query injection,
        reference universal_segmentation model :151-160).

        Returns [B, H/p, W/p, C] grid features — or, with extra_tokens,
        the [B, Q + HW, C] token stream after the final norm.
        """
        b = x.shape[0]
        x = PatchEmbed(self.embedding_planes, self.patch_size,
                       dtype=self.dtype, kernel_init=trunc_normal(0.02),
                       name="patch_embedding")(x)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(b, h * w, self.embedding_planes)
        rope_aug = (self.rope_shift_coords or self.rope_jitter_coords
                    or self.rope_rescale_coords)
        if train and rope_aug is not None and (
                self.has_rng("rope") or self.has_rng("dropout")):
            rng = self.make_rng("rope") if self.has_rng("rope") \
                else self.make_rng("dropout")
            rope = rope_sincos_augmented(
                h, w, self.embedding_planes // self.head_nums,
                self.rope_base, rng,
                shift_coords=self.rope_shift_coords,
                jitter_coords=self.rope_jitter_coords,
                rescale_coords=self.rope_rescale_coords)
        else:
            rope = self.rope_for(h, w)

        block_cls = DINOv3Block
        if self.use_gradient_checkpoint:
            block_cls = nn.remat(DINOv3Block)
        inject_at = self.block_nums - extra_token_blocks \
            if extra_tokens is not None else -1
        for i in range(self.block_nums):
            if i == inject_at:
                x = jnp.concatenate(
                    [extra_tokens.astype(x.dtype), x], axis=1)
            x = block_cls(self.head_nums, self.ffn_ratio,
                          self.layerscale_init, self.ffn_layer, self.dtype,
                          self.use_fused_attention,
                          name=f"block_{i}")(x, rope)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if extra_tokens is not None:
            return x  # [B, Q + HW, C]
        return x.reshape(b, h, w, self.embedding_planes)


def dinov3_vit_small_patch16_backbone(**kwargs):
    return DinoVisionTransformer(16, 384, 12, 6, ffn_layer="mlp", **kwargs)


def dinov3_vit_small_plus_patch16_backbone(**kwargs):
    return DinoVisionTransformer(16, 384, 12, 6, ffn_layer="swiglu",
                                 **kwargs)


def dinov3_vit_base_patch16_backbone(**kwargs):
    return DinoVisionTransformer(16, 768, 12, 12, ffn_layer="mlp", **kwargs)


def dinov3_vit_large_patch16_backbone(**kwargs):
    return DinoVisionTransformer(16, 1024, 24, 16, ffn_layer="mlp",
                                 **kwargs)


def dinov3_vit_large_plus_patch16_backbone(**kwargs):
    return DinoVisionTransformer(16, 1024, 24, 16, ffn_layer="swiglu",
                                 **kwargs)


def dinov3_vit_huge_plus_patch16_backbone(**kwargs):
    return DinoVisionTransformer(16, 1280, 32, 20, ffn_layer="swiglu",
                                 **kwargs)


class VitPyramidNeck(nn.Module):
    """Single-scale /16 grid -> 4-level pyramid (/4, /8, /16, /32), uniform
    channel width (reference detection/models/backbones/vit.py:27-80
    VitPyramidNeck; ViTDet-style simple feature pyramid)."""
    planes: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p2 = nn.gelu(nn.ConvTranspose(self.planes, (2, 2), strides=(2, 2),
                                      dtype=self.dtype,
                                      name="p2_up1")(x))
        p2 = nn.gelu(nn.ConvTranspose(self.planes, (2, 2), strides=(2, 2),
                                      dtype=self.dtype, name="p2_up2")(p2))
        p3 = nn.gelu(nn.ConvTranspose(self.planes, (2, 2), strides=(2, 2),
                                      dtype=self.dtype, name="p3_up")(x))
        p4 = nn.gelu(nn.Conv(self.planes, (1, 1), dtype=self.dtype,
                             name="p4_conv")(x))
        # uniform width: pool the projected /16 map rather than the raw
        # ViT grid (the reference pools the grid and carries the ViT width
        # into its FPN; uniform planes keeps every consumer shape-stable)
        p5 = nn.max_pool(p4, (2, 2), strides=(2, 2))
        return p2, p3, p4, p5


class DINOv3MultiScaleBackbone(nn.Module):
    """DINOv3 ViT + VitPyramidNeck, presenting the CNN-backbone interface
    (`__call__(x, train, return_features=True)` -> 4 feature maps) so
    dinov3 drops into every task head that takes a `backbone_type` string
    (reference dinov3_vit_retinanet.py:44-69 et al)."""
    embedding_planes: int = 768
    block_nums: int = 12
    head_nums: int = 12
    ffn_layer: str = "mlp"
    patch_size: int = 16
    planes: int = 256
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32
    use_fused_attention: bool = False

    @property
    def out_channels(self):
        return [self.planes] * 4

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = True):
        grid = DinoVisionTransformer(
            patch_size=self.patch_size,
            embedding_planes=self.embedding_planes,
            block_nums=self.block_nums, head_nums=self.head_nums,
            ffn_layer=self.ffn_layer,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            dtype=self.dtype, name="vit")(x, train=train)
        feats = VitPyramidNeck(self.planes, dtype=self.dtype,
                               name="neck")(grid)
        if return_features:
            return feats
        return feats[-1]


_DINOV3_DET_SIZES = {
    "dinov3_vit_small_patch16": dict(embedding_planes=384, block_nums=12,
                                     head_nums=6, ffn_layer="mlp"),
    "dinov3_vit_small_plus_patch16": dict(embedding_planes=384,
                                          block_nums=12, head_nums=6,
                                          ffn_layer="swiglu"),
    "dinov3_vit_base_patch16": dict(embedding_planes=768, block_nums=12,
                                    head_nums=12, ffn_layer="mlp"),
    "dinov3_vit_large_patch16": dict(embedding_planes=1024, block_nums=24,
                                     head_nums=16, ffn_layer="mlp"),
    "dinov3_vit_large_plus_patch16": dict(embedding_planes=1024,
                                          block_nums=24, head_nums=16,
                                          ffn_layer="swiglu"),
    "dinov3_vit_huge_plus_patch16": dict(embedding_planes=1280,
                                         block_nums=32, head_nums=20,
                                         ffn_layer="swiglu"),
}

for _name, _cfg in _DINOV3_DET_SIZES.items():
    def _det_factory(_cfg=_cfg, **kwargs):
        return DINOv3MultiScaleBackbone(**{**_cfg, **kwargs})
    globals()[f"{_name}_det_backbone"] = _det_factory
__all__ += [f"{n}_det_backbone" for n in _DINOV3_DET_SIZES]
