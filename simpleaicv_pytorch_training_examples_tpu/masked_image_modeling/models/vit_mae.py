"""MAE pretraining model (ViT encoder with random masking + light decoder).

Parity with /root/reference/SimpleAICV/masked_image_modeling/models/
vit_mae.py: 75% per-sample random masking by argsort of uniform noise,
fixed 2-D sincos position encodings (with cls token), decoder that scatters
mask tokens back via restore ids, per-patch pixel regression head.
Forward returns (pred [B, L, p*p*3], mask [B, L] with 1 = masked).

TPU notes: the shuffle/gather is jnp.take_along_axis over static shapes;
masking randomness comes from the 'masking' RNG collection so the whole
model stays a pure function under jit.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...models.common import Dropout, PatchEmbed, trunc_normal
from ...models.backbones.vit import TransformerEncoderLayer

__all__ = [
    "vit_base_patch16_224_mae_pretrain_model",
    "vit_large_patch16_224_mae_pretrain_model",
    "vit_huge_patch14_224_mae_pretrain_model",
]


def sincos_position_encoding_2d(embedding_planes: int, grid_size: int,
                                cls_token: bool = True) -> np.ndarray:
    """Fixed 2-D sine-cosine position embedding [1, N(+1), C]."""
    assert embedding_planes % 4 == 0
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first
    grid = np.stack(grid, axis=0).reshape(2, -1)  # [2, N]

    def encode_1d(planes, pos):
        omega = np.arange(planes // 2, dtype=np.float32) / (planes / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("n,d->nd", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate([
        encode_1d(embedding_planes // 2, grid[0]),
        encode_1d(embedding_planes // 2, grid[1]),
    ], axis=1)  # [N, C]
    if cls_token:
        emb = np.concatenate(
            [np.zeros((1, embedding_planes), np.float32), emb], axis=0)
    return emb[None].astype(np.float32)


class VITMAEPretrainModelEncoder(nn.Module):
    patch_size: int
    image_size: int
    embedding_planes: int
    block_nums: int
    head_nums: int
    feedforward_ratio: int = 4
    mask_ratio: float = 0.75
    dropout_prob: float = 0.0
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32
    use_fused_attention: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        c = self.embedding_planes
        n = (self.image_size // self.patch_size)**2

        x = PatchEmbed(c, self.patch_size, dtype=self.dtype,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name="patch_embedding")(x)
        x = x.reshape(b, n, c)

        pos_embed = jnp.asarray(
            sincos_position_encoding_2d(c, self.image_size //
                                        self.patch_size), x.dtype)
        x = x + pos_embed[:, 1:, :]

        # per-sample random masking by argsort of uniform noise
        keep_length = int(n * (1.0 - self.mask_ratio))
        if train:
            noise = jax.random.uniform(self.make_rng("masking"), (b, n))
        else:
            # deterministic eval: keep the first tokens
            noise = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.float32)[None] / n, (b, n))
        shuffle_ids = jnp.argsort(noise, axis=1)
        restore_ids = jnp.argsort(shuffle_ids, axis=1)
        keep_ids = shuffle_ids[:, :keep_length]
        x = jnp.take_along_axis(x, keep_ids[:, :, None], axis=1)

        mask = jnp.ones((b, n), x.dtype)
        mask = mask.at[:, :keep_length].set(0.0)
        mask = jnp.take_along_axis(mask, restore_ids, axis=1)

        cls_token = self.param("cls_token", trunc_normal(0.02), (1, 1, c))
        cls = cls_token.astype(x.dtype) + pos_embed[:, :1, :]
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c)), x], axis=1)
        x = Dropout(self.dropout_prob)(x, train)

        block = TransformerEncoderLayer
        if self.use_gradient_checkpoint:
            block = nn.remat(TransformerEncoderLayer, static_argnums=(2,))
        for i in range(self.block_nums):
            x = block(self.head_nums, self.feedforward_ratio,
                      self.dropout_prob, 0.0, self.dtype,
                      use_fused_attention=self.use_fused_attention,
                      name=f"block_{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x, mask, restore_ids


class VITMAEPretrainModelDecoder(nn.Module):
    patch_size: int
    image_size: int
    inplanes: int
    embedding_planes: int
    block_nums: int
    head_nums: int
    feedforward_ratio: int = 4
    dropout_prob: float = 0.0
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32
    use_fused_attention: bool = False

    @nn.compact
    def __call__(self, x, restore_ids, train: bool = False):
        b = x.shape[0]
        c = self.embedding_planes
        n = (self.image_size // self.patch_size)**2

        x = nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal(0.02),
                     name="embed")(x)
        mask_token = self.param("mask_token", trunc_normal(0.02), (1, 1, c))
        n_masked = n + 1 - x.shape[1]
        mask_tokens = jnp.broadcast_to(mask_token.astype(x.dtype),
                                       (b, n_masked, c))
        x_ = jnp.concatenate([x[:, 1:, :], mask_tokens], axis=1)
        x_ = jnp.take_along_axis(x_, restore_ids[:, :, None], axis=1)
        x = jnp.concatenate([x[:, :1, :], x_], axis=1)

        pos_embed = jnp.asarray(
            sincos_position_encoding_2d(c, self.image_size //
                                        self.patch_size), x.dtype)
        x = x + pos_embed

        block = TransformerEncoderLayer
        if self.use_gradient_checkpoint:
            block = nn.remat(TransformerEncoderLayer, static_argnums=(2,))
        for i in range(self.block_nums):
            x = block(self.head_nums, self.feedforward_ratio,
                      self.dropout_prob, 0.0, self.dtype,
                      use_fused_attention=self.use_fused_attention,
                      name=f"block_{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.patch_size**2 * 3, dtype=jnp.float32,
                     kernel_init=trunc_normal(0.02), name="fc")(
                         x.astype(jnp.float32))
        return x[:, 1:, :]  # drop cls


class VITMAEPretrainModel(nn.Module):
    patch_size: int = 16
    image_size: int = 224
    mask_ratio: float = 0.75
    encoder_embedding_planes: int = 768
    encoder_block_nums: int = 12
    encoder_head_nums: int = 12
    encoder_feedforward_ratio: int = 4
    encoder_dropout_prob: float = 0.0
    decoder_embedding_planes: int = 512
    decoder_block_nums: int = 8
    decoder_head_nums: int = 16
    decoder_feedforward_ratio: int = 4
    decoder_dropout_prob: float = 0.0
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32
    use_fused_attention: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        latents, mask, restore_ids = VITMAEPretrainModelEncoder(
            self.patch_size, self.image_size, self.encoder_embedding_planes,
            self.encoder_block_nums, self.encoder_head_nums,
            self.encoder_feedforward_ratio, self.mask_ratio,
            self.encoder_dropout_prob, self.use_gradient_checkpoint,
            self.dtype, self.use_fused_attention, name="encoder")(x, train)
        pred = VITMAEPretrainModelDecoder(
            self.patch_size, self.image_size,
            self.encoder_embedding_planes, self.decoder_embedding_planes,
            self.decoder_block_nums, self.decoder_head_nums,
            self.decoder_feedforward_ratio, self.decoder_dropout_prob,
            self.use_gradient_checkpoint, self.dtype,
            self.use_fused_attention, name="decoder")(latents, restore_ids,
                                                      train)
        return pred, mask


def _vitmaepretrainmodel(**kwargs):
    return VITMAEPretrainModel(**kwargs)


def vit_base_patch16_224_mae_pretrain_model(**kwargs):
    return _vitmaepretrainmodel(
        patch_size=16, image_size=224, encoder_embedding_planes=768,
        encoder_block_nums=12, encoder_head_nums=12,
        decoder_embedding_planes=512, decoder_block_nums=8,
        decoder_head_nums=16, **kwargs)


def vit_large_patch16_224_mae_pretrain_model(**kwargs):
    return _vitmaepretrainmodel(
        patch_size=16, image_size=224, encoder_embedding_planes=1024,
        encoder_block_nums=24, encoder_head_nums=16,
        decoder_embedding_planes=512, decoder_block_nums=8,
        decoder_head_nums=16, **kwargs)


def vit_huge_patch14_224_mae_pretrain_model(**kwargs):
    return _vitmaepretrainmodel(
        patch_size=14, image_size=224, encoder_embedding_planes=1280,
        encoder_block_nums=32, encoder_head_nums=16,
        decoder_embedding_planes=512, decoder_block_nums=8,
        decoder_head_nums=16, **kwargs)
