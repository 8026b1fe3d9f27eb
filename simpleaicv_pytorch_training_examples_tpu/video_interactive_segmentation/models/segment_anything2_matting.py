"""SAM2 matting models (image + memory-conditioned video), flax.

Parity targets in /root/reference/SimpleAICV/video_interactive_segmentation/
models/segment_anything2_matting/:
- sam2imagematting.py:28-240  SAM2ImageMatting — Hiera encoder + SAM2 mask
  decoder extended with matting feature taps + FUSION matting head
  (global trimap / local alpha / fused alpha);
- sam2videomatting_train.py:408-1250  SAM2VideoMatting — the SAM2 tracking
  loop where every frame additionally produces the matting triple and the
  memory is encoded from the fused alpha.

TPU re-design mirrors segment_anything2/sam2.py: fixed-capacity ring
buffers with validity-bias masking instead of a growing python memory
bank; the matting head is the shared MattingHead from
interactive_segmentation/models/segment_anything_matting.py (the
reference's FUSION block plays the same role; see its sam2videomatting
_train.py:192-405).
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...interactive_segmentation.models.segment_anything.image_encoder import (
    LayerNorm2d)
from ...interactive_segmentation.models.segment_anything.mask_decoder import (
    MLP)
from ...interactive_segmentation.models.segment_anything.prompt_encoder import (
    PromptEncoder)
from ...interactive_segmentation.models.segment_anything.transformer import (
    TwoWayTransformer)
from ...interactive_segmentation.models.segment_anything_matting import (
    MattingHead)
from .segment_anything2.image_encoder import ImageEncoder
from .segment_anything2.memory import MemoryAttention, MemoryEncoder
from .segment_anything2.sam2 import get_1d_sine_pe

__all__ = [
    "SAM2ImageMatting", "SAM2VideoMatting",
    "sam2_hiera_tiny_image_matting", "sam2_hiera_small_image_matting",
    "sam2_hiera_base_plus_image_matting", "sam2_hiera_large_image_matting",
    "sam2_hiera_tiny_video_matting", "sam2_hiera_small_video_matting",
    "sam2_hiera_base_plus_video_matting", "sam2_hiera_large_video_matting",
]


class SAM2MaskDecoderMatting(nn.Module):
    """SAM2 decoder (object-score token) that also taps feat3 (/16) and
    feat1 (/4) for the matting head (reference
    sam2videomatting_train.py:33-110 MaskDecoderMatting)."""
    inplanes: int = 256
    num_multimask_outputs: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe,
                 sparse_prompt_embeddings, dense_prompt_embeddings):
        c = self.inplanes
        num_mask_tokens = self.num_multimask_outputs + 1
        init = nn.initializers.normal(1.0)
        obj_score_token = self.param("obj_score_token", init, (1, c))
        iou_token = self.param("iou_token", init, (1, c))
        mask_tokens = self.param("mask_tokens", init, (num_mask_tokens, c))
        b = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.concatenate(
            [obj_score_token, iou_token, mask_tokens], axis=0)
        output_tokens = jnp.broadcast_to(output_tokens[None],
                                         (b, 2 + num_mask_tokens, c))
        tokens = jnp.concatenate(
            [output_tokens,
             sparse_prompt_embeddings.astype(output_tokens.dtype)], axis=1)

        src = image_embeddings + dense_prompt_embeddings.astype(
            image_embeddings.dtype)
        hs, src = TwoWayTransformer(
            block_nums=2, embedding_planes=c, head_nums=8, mlp_planes=2048,
            dtype=self.dtype, name="transformer")(src, image_pe, tokens)
        object_score_logits = MLP(c, 1, 3, self.dtype,
                                  name="pred_obj_score_head")(hs[:, 0])
        iou_token_out = hs[:, 1]
        mask_tokens_out = hs[:, 2:2 + num_mask_tokens]

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
        return (mask_preds, iou_preds, mask_tokens_out,
                object_score_logits, feat3, feat1)


class _SAM2MattingBase(nn.Module):
    """Shared Hiera encoder / prompt encoder / matting decoder stack."""
    image_size: int = 1024
    embedding_planes: int = 112
    head_nums: int = 2
    block_nums: Sequence[int] = (2, 3, 16, 3)
    window_specification: Sequence[int] = (8, 4, 14, 7)
    global_attention_blocks: Sequence[int] = (12, 16, 20)
    fpn_planes: int = 256
    memory_planes: int = 64
    memory_mask_nums: int = 7
    # slots reserved for condition-frame memories (see SAM2Video)
    memory_cond_slots: int = 1
    max_object_pointers: int = 16
    use_gradient_checkpoint: bool = False
    # "hiera" or a DINOv3 backbone registry name (reference
    # dinov3_segment_anything2_matting/dinov3_sam2videomatting_train.py)
    image_encoder_type: str = "hiera"
    # fused pallas memory attention (TPU only; XLA fallback elsewhere) —
    # same flag as SAM2Video
    use_flash_attention: bool = False
    # widen Hiera head qkv/proj params d=56 -> 64 for the 128-lane
    # packed kernels — same knob as SAM2Video.head_dim_padding (exact
    # for converted checkpoints; 0 = reference-exact param shapes)
    head_dim_padding: int = 0
    dtype: Any = jnp.float32

    def _setup_core(self):
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
                dtype=self.dtype,
                head_dim_padding=self.head_dim_padding)
        self.prompt_encoder = PromptEncoder(
            image_size=self.image_size, patch_size=16,
            embedding_planes=self.fpn_planes, dtype=self.dtype)
        self.mask_decoder = SAM2MaskDecoderMatting(
            inplanes=self.fpn_planes, dtype=self.dtype)
        self.matting_head = MattingHead(dtype=self.dtype)

    def _decode_matting(self, feat, prompts):
        """feat [B,H16,W16,C]; prompts dict or None ->
        (global, local, fused at input res, ious, obj_logits, pointer
        source token, best raw mask logits)."""
        b = feat.shape[0]
        if prompts is None:
            sparse = jnp.zeros((b, 1, self.fpn_planes))
            sparse = sparse + self.prompt_encoder.not_a_point_embed[0]
            dense = jnp.broadcast_to(
                self.prompt_encoder.no_mask_embed.reshape(1, 1, 1, -1),
                feat.shape)
        else:
            sparse, dense = self.prompt_encoder(
                prompts.get("prompt_point"), prompts.get("prompt_box"),
                prompts.get("prompt_mask"),
                boxes_valid=prompts.get("prompt_box_valid"),
                masks_valid=prompts.get("prompt_mask_valid"))
        image_pe = self.prompt_encoder.get_dense_pe_layer()
        (masks, ious, mask_tokens_out, obj_logits, feat3,
         feat1) = self.mask_decoder(feat, image_pe, sparse, dense)
        bidx = jnp.arange(b)
        best = jnp.argmax(ious, axis=-1)
        best_mask = masks[bidx, best][..., None]  # [B,H4,W4,1] logits
        global_p, local_p, fused_p = self.matting_head(best_mask, feat3,
                                                       feat1)
        s = self.image_size
        global_p = jax.image.resize(global_p, (b, s, s, 3), "bilinear")
        local_p = jax.image.resize(local_p, (b, s, s, 1), "bilinear")
        fused_p = jax.image.resize(fused_p, (b, s, s, 1), "bilinear")
        return (global_p, local_p, fused_p, ious, obj_logits,
                mask_tokens_out[bidx, best], best_mask)


class SAM2ImageMatting(_SAM2MattingBase):
    """Single-image SAM2 matting (reference sam2imagematting.py:28-240).

    Forward: (global [B,H,W,3], local [B,H,W,1], fused [B,H,W,1],
    iou_preds [B,M])."""

    def setup(self):
        self._setup_core()

    def __call__(self, batch_images, batch_prompts):
        features, _ = self.image_encoder(batch_images)
        s16 = self.image_size // 16
        feat = features[-1].reshape(batch_images.shape[0], s16, s16,
                                    self.fpn_planes)
        g, l, f, ious, _, _, _ = self._decode_matting(feat, batch_prompts)
        return g, l, f, ious


class SAM2VideoMatting(_SAM2MattingBase):
    """Memory-conditioned video matting (reference
    sam2videomatting_train.py:408-1250 forward_tracking_for_train).

    Input: images [B,T,H,W,3] + frame-0 prompts.
    Output per frame: (global [B,T,H,W,3], local [B,T,H,W,1],
    fused [B,T,H,W,1], ious [B,T,M], obj logits [B,T,1]).
    Memory for tracked frames is encoded from the fused alpha."""

    def setup(self):
        self._setup_core()
        self.memory_attention = MemoryAttention(
            inplanes=self.fpn_planes, layer_nums=4,
            feat_sizes=(self.image_size // 16, self.image_size // 16),
            use_flash=self.use_flash_attention, dtype=self.dtype)
        self.memory_encoder = MemoryEncoder(inplanes=self.fpn_planes,
                                            planes=self.memory_planes,
                                            dtype=self.dtype)
        init = nn.initializers.truncated_normal(0.02)
        self.mask_memory_time_position_encoder = self.param(
            "mask_memory_time_position_encoder", init,
            (self.memory_mask_nums, self.memory_planes))
        self.no_object_pointer = self.param(
            "no_object_pointer", init, (1, self.fpn_planes))
        # occlusion signal into stored memories (reference
        # sam2videomatting_train.py no_object_embedding_spatial)
        self.no_object_embedding_spatial = self.param(
            "no_object_embedding_spatial", init, (1, self.memory_planes))
        self.object_pointer_projection = MLP(
            self.fpn_planes, self.fpn_planes, 3, self.dtype,
            name="object_pointer_projection")
        self.object_pointer_time_position_projection = nn.Dense(
            self.memory_planes, dtype=self.dtype,
            name="object_pointer_time_position_projection")

    def _occlusion_gate(self, mem, obj_logits):
        is_obj = (obj_logits[:, 0] > 0).astype(mem.dtype)
        return mem + (1.0 - is_obj)[:, None, None, None] * \
            self.no_object_embedding_spatial[0]

    def _pointer(self, token, obj_logits):
        pointer = self.object_pointer_projection(token)
        is_obj = (obj_logits[:, 0] > 0).astype(pointer.dtype)[:, None]
        return is_obj * pointer + \
            (1.0 - is_obj) * self.no_object_pointer[0]

    @staticmethod
    def _slice_prompts(prompts, t):
        if prompts is None:
            return None
        return {k: (v[:, t] if v is not None else None)
                for k, v in prompts.items()}

    def __call__(self, images, frame0_prompts, is_cond_frame=None):
        """images [B,T,H,W,3]; frame0_prompts either frame-0-only (no T
        axis) or per-frame [B,T,...] with validity flags (the reference
        condition-frame recipe, as in SAM2Video.__call__); is_cond_frame
        [T] steers the reserved memory slots for extra prompted frames."""
        b, t_frames = images.shape[0], images.shape[1]
        s16 = self.image_size // 16
        n_mem = s16 * s16

        flat = images.reshape(b * t_frames, *images.shape[2:])
        features, positions = self.image_encoder(flat)
        feat16 = features[-1].reshape(b, t_frames, s16, s16,
                                      self.fpn_planes)
        pos16 = positions[-1].reshape(b, t_frames, s16, s16,
                                      self.fpn_planes)

        pp = frame0_prompts.get("prompt_point") \
            if frame0_prompts is not None else None
        per_frame = pp is not None and pp.ndim == 4
        p0 = self._slice_prompts(frame0_prompts, 0) if per_frame \
            else frame0_prompts
        cond = is_cond_frame if is_cond_frame is not None else \
            jnp.zeros((t_frames,))
        cond_slots = max(1, min(self.memory_cond_slots,
                                self.memory_mask_nums - 1))
        ring = self.memory_mask_nums - cond_slots
        cond_count = jnp.ones((), jnp.int32)  # frame 0 takes cond slot 0
        track_count = jnp.zeros((), jnp.int32)

        # ---- frame 0: prompted, no memory conditioning ----
        g0, l0, f0, ious0, obj0, tok0, _ = self._decode_matting(
            feat16[:, 0], p0)
        ptr0 = self._pointer(tok0, obj0)
        mem_feat0, mem_pos0 = self.memory_encoder(feat16[:, 0], f0)
        mem_feat0 = self._occlusion_gate(mem_feat0, obj0)

        s_mem = self.memory_mask_nums
        mem_feats = jnp.zeros((s_mem, b, n_mem, self.memory_planes))
        mem_pos = jnp.zeros((s_mem, b, n_mem, self.memory_planes))
        mem_frame = jnp.full((s_mem,), -10**6)
        mem_valid = jnp.zeros((s_mem,))
        mem_feats = mem_feats.at[0].set(mem_feat0.reshape(
            b, n_mem, self.memory_planes))
        mem_pos = mem_pos.at[0].set(mem_pos0.reshape(
            b, n_mem, self.memory_planes))
        mem_frame = mem_frame.at[0].set(0)
        mem_valid = mem_valid.at[0].set(1.0)

        p_max = self.max_object_pointers
        ptr_bank = jnp.zeros((p_max, b, self.fpn_planes))
        ptr_frame = jnp.full((p_max,), -10**6)
        ptr_valid = jnp.zeros((p_max,))
        ptr_bank = ptr_bank.at[0].set(ptr0)
        ptr_frame = ptr_frame.at[0].set(0)
        ptr_valid = ptr_valid.at[0].set(1.0)

        ratio = self.fpn_planes // self.memory_planes

        all_g, all_l, all_f = [g0], [l0], [f0]
        all_ious, all_obj = [ious0], [obj0]
        for frame_idx in range(1, t_frames):
            feat = feat16[:, frame_idx]
            pos = pos16[:, frame_idx]

            t_rel = jnp.clip(frame_idx - mem_frame, 0, s_mem - 1)
            time_enc = self.mask_memory_time_position_encoder[
                jnp.clip(s_mem - t_rel - 1, 0, s_mem - 1).astype(jnp.int32)]
            mem_pos_t = mem_pos + time_enc[:, None, None, :]
            mem_k = mem_feats.transpose(1, 0, 2, 3).reshape(
                b, s_mem * n_mem, self.memory_planes)
            mem_p = mem_pos_t.transpose(1, 0, 2, 3).reshape(
                b, s_mem * n_mem, self.memory_planes)
            mem_bias = jnp.repeat(
                jnp.where(mem_valid > 0, 0.0, -1e9), n_mem)

            t_diff = jnp.clip(frame_idx - ptr_frame, 0, p_max - 1)
            tpos = get_1d_sine_pe(
                t_diff.astype(jnp.float32) / max(p_max - 1, 1),
                self.fpn_planes)
            tpos = self.object_pointer_time_position_projection(tpos)
            ptrs = ptr_bank.reshape(p_max, b, ratio, self.memory_planes)
            ptrs = ptrs.transpose(1, 0, 2, 3).reshape(
                b, p_max * ratio, self.memory_planes)
            ptr_p = jnp.broadcast_to(
                jnp.repeat(tpos, ratio, axis=0)[None],
                (b, p_max * ratio, self.memory_planes))
            ptr_bias = jnp.repeat(
                jnp.where(ptr_valid > 0, 0.0, -1e9), ratio)

            memory = jnp.concatenate([mem_k, ptrs], axis=1)
            memory_pos = jnp.concatenate([mem_p, ptr_p], axis=1)
            key_bias = jnp.broadcast_to(
                jnp.concatenate([mem_bias, ptr_bias])[None],
                (b, memory.shape[1]))

            cur = feat.reshape(b, n_mem, self.fpn_planes)
            cur_pos = pos.reshape(b, n_mem, self.fpn_planes)
            conditioned = self.memory_attention(
                cur, memory, cur_pos, memory_pos,
                num_obj_ptr_tokens=p_max * ratio, key_bias=key_bias)
            conditioned = conditioned.reshape(b, s16, s16, self.fpn_planes)

            g, l, f, ious, obj_logits, token, _ = self._decode_matting(
                conditioned,
                self._slice_prompts(frame0_prompts, frame_idx)
                if per_frame else None)
            all_g.append(g)
            all_l.append(l)
            all_f.append(f)
            all_ious.append(ious)
            all_obj.append(obj_logits)

            new_mem, new_mem_pos = self.memory_encoder(feat, f)
            new_mem = self._occlusion_gate(new_mem, obj_logits)
            is_cond_t = cond[frame_idx] > 0
            slot = jnp.where(
                is_cond_t,
                jnp.minimum(cond_count, cond_slots - 1),
                cond_slots + track_count % ring).astype(jnp.int32)
            cond_count = cond_count + is_cond_t.astype(jnp.int32)
            track_count = track_count + (~is_cond_t).astype(jnp.int32)
            mem_feats = mem_feats.at[slot].set(
                new_mem.reshape(b, n_mem, self.memory_planes))
            mem_pos = mem_pos.at[slot].set(
                new_mem_pos.reshape(b, n_mem, self.memory_planes))
            mem_frame = mem_frame.at[slot].set(frame_idx)
            mem_valid = mem_valid.at[slot].set(1.0)

            pointer = self._pointer(token, obj_logits)
            pslot = frame_idx % p_max
            ptr_bank = ptr_bank.at[pslot].set(pointer)
            ptr_frame = ptr_frame.at[pslot].set(frame_idx)
            ptr_valid = ptr_valid.at[pslot].set(1.0)

        return (jnp.stack(all_g, axis=1), jnp.stack(all_l, axis=1),
                jnp.stack(all_f, axis=1), jnp.stack(all_ious, axis=1),
                jnp.stack(all_obj, axis=1))


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


def _factory(cls, size, **kwargs):
    return cls(**{**_SIZES[size], **kwargs})


def sam2_hiera_tiny_image_matting(**kw):
    return _factory(SAM2ImageMatting, "tiny", **kw)


def sam2_hiera_small_image_matting(**kw):
    return _factory(SAM2ImageMatting, "small", **kw)


def sam2_hiera_base_plus_image_matting(**kw):
    return _factory(SAM2ImageMatting, "base_plus", **kw)


def sam2_hiera_large_image_matting(**kw):
    return _factory(SAM2ImageMatting, "large", **kw)


def sam2_hiera_tiny_video_matting(**kw):
    return _factory(SAM2VideoMatting, "tiny", **kw)


def sam2_hiera_small_video_matting(**kw):
    return _factory(SAM2VideoMatting, "small", **kw)


def sam2_hiera_base_plus_video_matting(**kw):
    return _factory(SAM2VideoMatting, "base_plus", **kw)


def sam2_hiera_large_video_matting(**kw):
    return _factory(SAM2VideoMatting, "large", **kw)
