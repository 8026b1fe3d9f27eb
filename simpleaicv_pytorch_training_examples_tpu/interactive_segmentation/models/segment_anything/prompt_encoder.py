"""SAM prompt encoder, flax.

Parity with /root/reference/SimpleAICV/interactive_segmentation/models/
segment_anything/prompt_encoder.py: random-Fourier position encoding
(fixed gaussian matrix as a non-trainable variable), 4 learned point
embeddings (neg / pos / box corner 1 / box corner 2), not-a-point and
no-mask embeddings, conv mask downscaler.

TPU re-design: prompts are always fixed-shape with sentinel labels —
points [B, N, 3] (x, y, label; label -1 = padding), boxes [B, 4] with a
[B] validity flag, masks [B, H/4, W/4, 1] with a [B] validity flag — so a
single jitted program covers every prompt combination (the reference
branches on None at python level).
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ....models.common import PatchEmbed
from .image_encoder import LayerNorm2d


class PositionEmbeddingRandom(nn.Module):
    num_pos_feats: int = 128

    def setup(self):
        # fixed gaussian projection (reference registers a buffer)
        self.gaussian_matrix = self.variable(
            "constants", "positional_encoding_gaussian_matrix",
            lambda: jax.random.normal(jax.random.PRNGKey(2023),
                                      (2, self.num_pos_feats)))

    def pe_encoding(self, coords):
        coords = 2 * coords - 1
        coords = coords @ self.gaussian_matrix.value
        coords = 2 * np.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def grid_pe(self, size):
        ys = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
        xs = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        return self.pe_encoding(jnp.stack([gx, gy], axis=-1))  # [H,W,C]

    def forward_with_coords(self, coords, image_size):
        return self.pe_encoding(coords / image_size)


class PromptEncoder(nn.Module):
    image_size: int = 1024
    patch_size: int = 16
    embedding_planes: int = 256
    mask_inter_planes: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embedding_planes // 2)
        init = nn.initializers.normal(1.0)
        self.point_embeddings = self.param("point_embeddings", init,
                                           (4, self.embedding_planes))
        self.not_a_point_embed = self.param("not_a_point_embed", init,
                                            (1, self.embedding_planes))
        self.no_mask_embed = self.param("no_mask_embed", init,
                                        (1, self.embedding_planes))
        q = self.mask_inter_planes
        # reshape+dot form of nn.Conv(c,(2,2),s2) — non-overlapping, so
        # PatchEmbed(p=2) is numerically identical with the same param
        # tree; avoids 1->4->16-channel convolutions on the mask grid
        self.mask_conv1 = PatchEmbed(q // 4, 2, dtype=self.dtype,
                                     name="mask_conv1")
        self.mask_ln1 = LayerNorm2d(name="mask_ln1")
        self.mask_conv2 = PatchEmbed(q, 2, dtype=self.dtype,
                                     name="mask_conv2")
        self.mask_ln2 = LayerNorm2d(name="mask_ln2")
        self.mask_conv3 = nn.Conv(self.embedding_planes, (1, 1),
                                  dtype=self.dtype, name="mask_conv3")

    @property
    def image_embedding_size(self):
        return self.image_size // self.patch_size

    def get_dense_pe_layer(self):
        return self.pe_layer.grid_pe(self.image_embedding_size)[None]

    def __call__(self, points, boxes, masks, boxes_valid=None,
                 masks_valid=None):
        """points [B,N,3] (label -1 pad) or None; boxes [B,4] or None;
        masks [B,Hm,Wm,1] or None; *_valid [B] float flags for fixed-shape
        batched prompting (1 = use)."""
        if points is not None:
            batch = points.shape[0]
        elif boxes is not None:
            batch = boxes.shape[0]
        else:
            batch = masks.shape[0]

        sparse = []
        if points is not None:
            coords = points[..., 0:2] + 0.5
            labels = points[..., 2]
            if boxes is None:
                coords = jnp.concatenate(
                    [coords, jnp.zeros((batch, 1, 2))], axis=1)
                labels = jnp.concatenate(
                    [labels, -jnp.ones((batch, 1))], axis=1)
            pe = self.pe_layer.forward_with_coords(coords, self.image_size)
            pe = jnp.where((labels == -1)[..., None],
                           self.not_a_point_embed[0], pe)
            pe = pe + jnp.where((labels == 0)[..., None],
                                self.point_embeddings[0], 0.0)
            pe = pe + jnp.where((labels == 1)[..., None],
                                self.point_embeddings[1], 0.0)
            sparse.append(pe)
        if boxes is not None:
            corners = (boxes.reshape(-1, 2, 2) + 0.5)
            ce = self.pe_layer.forward_with_coords(corners, self.image_size)
            ce = ce.at[:, 0, :].add(self.point_embeddings[2])
            ce = ce.at[:, 1, :].add(self.point_embeddings[3])
            if boxes_valid is not None:
                # invalid boxes become not-a-point padding tokens
                ce = jnp.where(boxes_valid[:, None, None] > 0, ce,
                               self.not_a_point_embed[0])
            sparse.append(ce)
        sparse_embeddings = jnp.concatenate(sparse, axis=1) if sparse else \
            jnp.zeros((batch, 0, self.embedding_planes))

        s = self.image_embedding_size
        # always trace the mask downscaler so its params exist regardless of
        # which prompt types the init example used (fixed-shape SPMD design:
        # no-mask is expressed by masks_valid=0, not by a python branch)
        if masks is None:
            masks = jnp.zeros((batch, 4 * s, 4 * s, 1), jnp.float32)
            masks_valid = jnp.zeros((batch,), jnp.float32)
        x = self.mask_conv1(masks.astype(self.dtype))
        # exact gelu: torch nn.GELU (weight-import parity)
        x = nn.gelu(self.mask_ln1(x), approximate=False)
        x = nn.gelu(self.mask_ln2(self.mask_conv2(x)),
                    approximate=False)
        dense = self.mask_conv3(x)
        no_mask = jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1),
            dense.shape).astype(dense.dtype)
        if masks_valid is not None:
            dense = jnp.where(masks_valid[:, None, None, None] > 0, dense,
                              no_mask)
        return sparse_embeddings, dense
