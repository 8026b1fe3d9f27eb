"""SAM2 image + video models, flax.

Parity targets in /root/reference/SimpleAICV/video_interactive_segmentation/
models/segment_anything2/:
- mask_decoder.py: SAM mask decoder extended with an object-score token and
  occlusion head (returns mask_tokens for the object pointer);
- sam2image.py: Hiera encoder + prompt/mask decoder (single image);
- sam2video_train.py: memory-conditioned tracking — per frame, memory
  attention over (condition-frame memory + last-N frame memories + object
  pointers), predict mask, encode new memory.

TPU re-design (SURVEY.md §3.4 / §7): the reference's python time loop with
a growing memory bank becomes a `jax.lax.scan` over frames with
fixed-capacity ring buffers — `memory_mask_nums` mask-memory slots and
`max_object_pointers` pointer slots, each carrying a frame index and a
validity flag; invalid slots are masked out of the memory cross-attention
with an additive key bias. The reference's condition-frame sampling and
point-iteration frames (sam2video_train.py:208-357, 840-911) are expressed
as per-frame prompt arrays + [T] flag vectors with in-graph Gumbel-max
error clicks (see SAM2Video.__call__).
"""

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ....interactive_segmentation.models.segment_anything.mask_decoder import (
    MLP)
from ....interactive_segmentation.models.segment_anything.image_encoder import (
    LayerNorm2d)
from ....interactive_segmentation.models.segment_anything.prompt_encoder import (
    PromptEncoder)
from ....interactive_segmentation.models.segment_anything.transformer import (
    TwoWayTransformer)
from .image_encoder import ImageEncoder
from .memory import MemoryAttention, MemoryEncoder

__all__ = ["SAM2Video", "sam2_hiera_tiny_video", "sam2_hiera_small_video",
           "sam2_hiera_base_plus_video", "sam2_hiera_large_video"]


def get_1d_sine_pe(pos, dim, temperature=10000):
    """pos [N] -> [N, dim] sine position embedding."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature**(2 * (dim_t // 2) / pe_dim)
    pos = pos[:, None] / dim_t
    return jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=1)


class SAM2MaskDecoder(nn.Module):
    """SAM decoder + object score token / occlusion head (reference
    mask_decoder.py:53-186). With use_high_res_features, the stride-4/8
    FPN features skip into the upscaling convs (reference conv_s0/conv_s1,
    mask_decoder.py:153-161) for sharper mask boundaries."""
    inplanes: int = 256
    num_multimask_outputs: int = 3
    use_high_res_features: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe,
                 sparse_prompt_embeddings, dense_prompt_embeddings,
                 high_res_features=None):
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
        src2 = src.reshape(b, h, w, c)
        x = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upscale_conv1")(src2)
        if self.use_high_res_features:
            feat_s0, feat_s1 = high_res_features  # strides 4 and 8, NHWC
            x = x + nn.Conv(c // 4, (1, 1), dtype=self.dtype,
                            name="conv_s1")(feat_s1)
            x = nn.gelu(LayerNorm2d(name="upscale_ln")(x),
                        approximate=False)
            x = nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, name="upscale_conv2")(x)
            x = nn.gelu(x + nn.Conv(c // 8, (1, 1), dtype=self.dtype,
                                    name="conv_s0")(feat_s0),
                        approximate=False)
        else:
            x = nn.gelu(LayerNorm2d(name="upscale_ln")(x),
                        approximate=False)
            x = nn.gelu(nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2),
                                         dtype=self.dtype,
                                         name="upscale_conv2")(x),
                        approximate=False)
        hyper_in = jnp.stack([
            MLP(c, c // 8, 3, self.dtype, name=f"hyper_mlp_{i}")(
                mask_tokens_out[:, i]) for i in range(num_mask_tokens)
        ], axis=1)
        mask_preds = jnp.einsum("btc,bhwc->bthw", hyper_in, x)
        iou_preds = MLP(c, num_mask_tokens, 3, self.dtype,
                        name="iou_prediction_head")(iou_token_out)
        return mask_preds, iou_preds, mask_tokens_out, object_score_logits


class SAM2Video(nn.Module):
    """Memory-conditioned video tracking (training forward).

    Input: images [B, T, H, W, 3] + frame-0 prompts (SAM prompt dict).
    Output per frame: mask logits [B, T, M, H, W], iou preds [B, T, M],
    object score logits [B, T, 1].
    """
    image_size: int = 1024
    embedding_planes: int = 112
    head_nums: int = 2
    block_nums: Sequence[int] = (2, 3, 16, 3)
    window_specification: Sequence[int] = (8, 4, 14, 7)
    global_attention_blocks: Sequence[int] = (12, 16, 20)
    fpn_planes: int = 256
    memory_planes: int = 64
    memory_mask_nums: int = 7
    # slots reserved for condition-frame memories (frame 0 + extra
    # prompted frames); the rest of memory_mask_nums is the recent ring
    memory_cond_slots: int = 1
    max_object_pointers: int = 16
    use_gradient_checkpoint: bool = False
    # "hiera" or a DINOv3 backbone registry name (reference
    # dinov3_segment_anything2/dinov3_sam2video_train.py)
    image_encoder_type: str = "hiera"
    # nn.scan the tracked-frame loop: one compiled step body shared
    # across T-1 frames instead of T-1 inlined copies (same numerics,
    # much smaller HLO for the T=8/16 staged recipes)
    use_scan: bool = False
    # route memory attention AND the Hiera global encoder blocks through
    # the fused pallas flash kernels (TPU only; falls back to XLA
    # attention off-TPU). Widened from memory-attention-only in round 3 —
    # expect bf16-rounding-level encoder output changes when toggling.
    use_flash_attention: bool = False
    # stride-4/8 FPN features skip into the decoder upscaling (reference
    # mask_decoder.py conv_s0/conv_s1 — always on in the reference; off by
    # default here to keep the lean decode path, on in the 14.* configs)
    use_high_res_features: bool = False
    # widen every Hiera head's qkv/proj PARAMS from the logical d=56 to
    # this physical width (64): 128-lane alignable heads run the
    # zero-copy packed windowed kernel and skip flash's per-call d-pad.
    # EXACT for converted checkpoints (the converter zero-fills the pads,
    # utils/torch_convert.py); extra capacity for from-scratch training.
    # 0 = reference-exact param shapes.
    head_dim_padding: int = 0
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
                dtype=self.dtype,
                head_dim_padding=self.head_dim_padding)
        self.prompt_encoder = PromptEncoder(
            image_size=self.image_size, patch_size=16,
            embedding_planes=self.fpn_planes, dtype=self.dtype)
        self.mask_decoder = SAM2MaskDecoder(
            inplanes=self.fpn_planes,
            use_high_res_features=self.use_high_res_features,
            dtype=self.dtype)
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
        self.no_memory_embedding = self.param(
            "no_memory_embedding", init, (1, self.fpn_planes))
        self.no_object_pointer = self.param(
            "no_object_pointer", init, (1, self.fpn_planes))
        # added to encoded frame memories when the occlusion head says the
        # object is absent (reference sam2video_train.py:161,955-960) so
        # the memory bank carries an explicit "object gone" signal
        self.no_object_embedding_spatial = self.param(
            "no_object_embedding_spatial", init, (1, self.memory_planes))
        # learned 4x4/s4 downsample for mask-as-prompt tracking (reference
        # sam2video_train.py:151 mask_downsample, used by
        # use_mask_as_output :559-590). Declared as raw params (not
        # nn.Conv) so they exist in every init, including the training
        # forward that never traces the mask-prompt path.
        conv_init = nn.initializers.lecun_normal()
        self.mask_downsample_kernel = self.param(
            "mask_downsample_kernel", conv_init, (4, 4, 1, 1))
        self.mask_downsample_bias = self.param(
            "mask_downsample_bias", nn.initializers.zeros, (1,))
        self.object_pointer_projection = MLP(
            self.fpn_planes, self.fpn_planes, 3, self.dtype,
            name="object_pointer_projection")
        self.object_pointer_time_position_projection = nn.Dense(
            self.memory_planes, dtype=self.dtype,
            name="object_pointer_time_position_projection")

    def _decode_frame(self, feat, prompts, highres=None):
        """feat [B, H16, W16, C]; prompts dict or None -> per-frame preds.
        highres: (feat_s4, feat_s8) when use_high_res_features."""
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
        masks, ious, mask_tokens_out, obj_logits = self.mask_decoder(
            feat, image_pe, sparse, dense, high_res_features=highres)
        # best mask by predicted iou
        best = jnp.argmax(ious, axis=-1)
        bidx = jnp.arange(b)
        best_mask = masks[bidx, best]  # [B, H4, W4]
        # object pointer from the best mask token
        pointer = self.object_pointer_projection(
            mask_tokens_out[bidx, best])
        is_obj = (obj_logits[:, 0] > 0).astype(pointer.dtype)[:, None]
        pointer = is_obj * pointer + \
            (1.0 - is_obj) * self.no_object_pointer[0]
        # upsample all masks to input resolution
        t = masks.shape[1]
        masks_up = jax.image.resize(
            masks, (b, t, self.image_size, self.image_size), "bilinear")
        return masks_up, ious, obj_logits, pointer, best_mask

    # ---- streaming step primitives (also the nn.scan body; see
    # sam2_stream.SAM2VideoStream for the test-time entry points) ----

    def encode_frame(self, images):
        """images [B,H,W,3] -> (feat16 [B,s,s,C], pos16 [B,s,s,C]); with
        use_high_res_features also the stride-4/8 skip features:
        (feat16, pos16, (feat_s4, feat_s8))."""
        s16 = self.image_size // 16
        features, positions = self.image_encoder(images)
        b = images.shape[0]
        feat = features[-1].reshape(b, s16, s16, self.fpn_planes)
        pos = positions[-1].reshape(b, s16, s16, self.fpn_planes)
        if self.use_high_res_features:
            s4, s8 = self.image_size // 4, self.image_size // 8
            hr = (features[0].reshape(b, s4, s4, self.fpn_planes),
                  features[1].reshape(b, s8, s8, self.fpn_planes))
            return feat, pos, hr
        return feat, pos

    def _empty_carry(self, b):
        s16 = self.image_size // 16
        n_mem = s16 * s16
        s_mem = self.memory_mask_nums
        p_max = self.max_object_pointers
        return {
            "mem_feats": jnp.zeros((s_mem, b, n_mem, self.memory_planes)),
            "mem_pos": jnp.zeros((s_mem, b, n_mem, self.memory_planes)),
            "mem_frame": jnp.full((s_mem,), -10**6),
            "mem_valid": jnp.zeros((s_mem,)),
            "ptr_bank": jnp.zeros((p_max, b, self.fpn_planes)),
            "ptr_frame": jnp.full((p_max,), -10**6),
            "ptr_valid": jnp.zeros((p_max,)),
            "frame_idx": jnp.zeros((), jnp.int32),
            # condition-frame slots used / tracked frames written (memory
            # layout: slots [0, memory_cond_slots) hold condition-frame
            # memories, the rest is the recent-frame ring)
            "cond_count": jnp.zeros((), jnp.int32),
            "track_count": jnp.zeros((), jnp.int32),
        }

    def _write_memory(self, carry, feat, best_mask, pointer, is_cond,
                      obj_logits=None):
        """Encode (feat, mask) into memory. Condition (prompted) frames fill
        slots [0, memory_cond_slots); tracked frames rotate through the
        remaining ring slots (reference prepare_memory_conditioned_features
        keeps all cond-frame memories + the last N tracked memories,
        sam2video_train.py:591-729 — here cond capacity is the static
        memory_cond_slots)."""
        b = feat.shape[0]
        s16 = self.image_size // 16
        n_mem = s16 * s16
        s_mem = self.memory_mask_nums
        frame_idx = carry["frame_idx"]
        mem, mem_pos = self.memory_encoder(
            feat, jax.image.resize(
                best_mask[..., None],
                (b, self.image_size, self.image_size, 1), "bilinear"))
        if obj_logits is not None:
            # occlusion signal into the stored memory (reference
            # sam2video_train.py:950-960)
            is_obj = (obj_logits[:, 0] > 0).astype(mem.dtype)
            mem = mem + (1.0 - is_obj)[:, None, None, None] * \
                self.no_object_embedding_spatial[0]
        cond_slots = max(1, min(self.memory_cond_slots, s_mem - 1))
        ring = s_mem - cond_slots
        is_cond_f = jnp.asarray(is_cond, jnp.float32)
        cond_slot = jnp.minimum(carry["cond_count"], cond_slots - 1)
        track_slot = cond_slots + carry["track_count"] % ring
        slot = jnp.where(is_cond_f > 0, cond_slot,
                         track_slot).astype(jnp.int32)
        carry = dict(carry)
        carry["mem_feats"] = carry["mem_feats"].at[slot].set(
            mem.reshape(b, n_mem, self.memory_planes))
        carry["mem_pos"] = carry["mem_pos"].at[slot].set(
            mem_pos.reshape(b, n_mem, self.memory_planes))
        carry["mem_frame"] = carry["mem_frame"].at[slot].set(frame_idx)
        carry["mem_valid"] = carry["mem_valid"].at[slot].set(1.0)

        pslot = carry["frame_idx"] % self.max_object_pointers
        carry["ptr_bank"] = carry["ptr_bank"].at[pslot].set(pointer)
        carry["ptr_frame"] = carry["ptr_frame"].at[pslot].set(frame_idx)
        carry["ptr_valid"] = carry["ptr_valid"].at[pslot].set(1.0)
        carry["frame_idx"] = frame_idx + 1
        carry["cond_count"] = carry["cond_count"] + \
            (is_cond_f > 0).astype(jnp.int32)
        carry["track_count"] = carry["track_count"] + \
            (is_cond_f <= 0).astype(jnp.int32)
        return carry

    def _point_iter_refine(self, conditioned, outs, gt_mask, rng, n_iters,
                           highres=None):
        """Point-iteration refinement on a tracked frame (reference
        sam2video_train.py:840-911 decoder_point_iters_sampling_and_
        predict_mask): n_iters times, click the FP/FN region of the current
        best mask (in-graph Gumbel-max draw) and re-decode on the SAME
        memory-conditioned features with the accumulated clicks + the
        previous best mask as dense prompt."""
        from ....interactive_segmentation.error_click import (
            sample_error_points_batch)

        b = conditioned.shape[0]
        masks_up, ious, obj, pointer, best_mask = outs
        points = jnp.full((b, n_iters, 3), -1.0)
        for it in range(n_iters):
            best = jnp.argmax(ious, axis=-1)
            bidx = jnp.arange(b)
            pred_bin = (masks_up[bidx, best] > 0).astype(jnp.float32)
            new_pt = sample_error_points_batch(
                jax.random.fold_in(rng, it), pred_bin, gt_mask)
            points = points.at[:, it].set(new_pt)
            prompts = {
                "prompt_point": points,
                "prompt_box": jnp.zeros((b, 4)),
                "prompt_box_valid": jnp.zeros((b,)),
                "prompt_mask": best_mask[..., None],
                "prompt_mask_valid": jnp.ones((b,)),
            }
            masks_up, ious, obj, pointer, best_mask = self._decode_frame(
                conditioned, prompts, highres=highres)
        return masks_up, ious, obj, pointer, best_mask

    def start_track(self, feat, prompts, highres=None):
        """Prompted first frame: decode + seed the memory carry."""
        b = feat.shape[0]
        masks, ious, obj, pointer, best_mask = self._decode_frame(
            feat, prompts, highres=highres)
        carry = self._empty_carry(b)
        carry = self._write_memory(carry, feat, best_mask, pointer,
                                   is_cond=jnp.bool_(True),
                                   obj_logits=obj)
        return (masks, ious, obj), carry

    def track_frame(self, feat, pos, carry, frame_prompts=None,
                    is_cond=None, gt_mask=None, iter_flag=None, rng=None,
                    point_iters=0, highres=None):
        """Memory-conditioned frame: decode + memory update. frame_idx is
        traced — one compiled program serves every frame.

        Training extensions (all optional, defaults reproduce the
        unprompted tracking step):
        - frame_prompts: fixed-shape per-frame prompt dict; a non-condition
          frame carries all-invalid prompts (label -1 points, valid=0
          flags), which the prompt encoder maps to the no-prompt embeddings;
        - is_cond: traced flag steering the memory slot (condition frames
          fill the reserved cond slots);
        - gt_mask [B,H,W] + iter_flag + rng + static point_iters: on
          point-iteration frames, refine with in-graph error clicks."""
        b = feat.shape[0]
        s16 = self.image_size // 16
        n_mem = s16 * s16
        s_mem = self.memory_mask_nums
        p_max = self.max_object_pointers
        frame_idx = carry["frame_idx"]

        t_rel = jnp.clip(frame_idx - carry["mem_frame"], 0, s_mem - 1)
        time_enc = self.mask_memory_time_position_encoder[
            jnp.clip(s_mem - t_rel - 1, 0, s_mem - 1).astype(jnp.int32)]
        mem_pos_t = carry["mem_pos"] + time_enc[:, None, None, :]
        mem_k = carry["mem_feats"].transpose(1, 0, 2, 3).reshape(
            b, s_mem * n_mem, self.memory_planes)
        mem_p = mem_pos_t.transpose(1, 0, 2, 3).reshape(
            b, s_mem * n_mem, self.memory_planes)
        mem_bias = jnp.repeat(
            jnp.where(carry["mem_valid"] > 0, 0.0, -1e9), n_mem)

        ratio = self.fpn_planes // self.memory_planes
        t_diff = jnp.clip(frame_idx - carry["ptr_frame"], 0, p_max - 1)
        tpos = get_1d_sine_pe(
            t_diff.astype(jnp.float32) / max(p_max - 1, 1),
            self.fpn_planes)
        tpos = self.object_pointer_time_position_projection(tpos)
        ptrs = carry["ptr_bank"].reshape(p_max, b, ratio,
                                         self.memory_planes)
        ptrs = ptrs.transpose(1, 0, 2, 3).reshape(
            b, p_max * ratio, self.memory_planes)
        ptr_p = jnp.broadcast_to(
            jnp.repeat(tpos, ratio, axis=0)[None],
            (b, p_max * ratio, self.memory_planes))
        ptr_bias = jnp.repeat(
            jnp.where(carry["ptr_valid"] > 0, 0.0, -1e9), ratio)

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

        outs = self._decode_frame(conditioned, frame_prompts,
                                  highres=highres)
        if point_iters > 0 and gt_mask is not None:
            if iter_flag is None:
                outs = self._point_iter_refine(conditioned, outs, gt_mask,
                                               rng, point_iters,
                                               highres=highres)
            else:
                # lifted cond: the 2x-point_iters extra decoder passes run
                # ONLY on flagged iteration frames (one of T in the recipe)
                # instead of computing refinement on every scan frame and
                # masking the result — a traced-predicate lax.cond executes
                # a single branch at runtime
                def _refine(mdl, outs):
                    return mdl._point_iter_refine(
                        conditioned, outs, gt_mask, rng, point_iters,
                        highres=highres)

                def _keep(mdl, outs):
                    return outs

                outs = nn.cond(iter_flag > 0, _refine, _keep, self, outs)
        masks, ious, obj, pointer, best_mask = outs
        carry = self._write_memory(
            carry, feat, best_mask, pointer,
            is_cond=jnp.bool_(False) if is_cond is None else is_cond,
            obj_logits=obj)
        return (masks, ious, obj), carry

    def add_mask_frame(self, feat, mask, carry, highres=None):
        """Prompt a frame with a full mask instead of points/boxes
        (reference use_mask_as_output, sam2video_train.py:559-590): the
        given mask IS the output (logits mask*20-10, iou 1); the decoder
        runs on the learned-downsampled mask prompt only to harvest the
        object pointer and occlusion score; memory encodes the given
        mask. mask: [B, H, W] float {0,1} at input resolution."""
        b = feat.shape[0]
        m = mask.astype(jnp.float32)
        # non-overlapping 4x4/s4 1->1-channel conv as reshape + dot
        # (same [4,4,1,1] params; the conv form is ~0%-lane-utilization)
        bm, hm, wm = m.shape
        patches = m.reshape(bm, hm // 4, 4, wm // 4, 4)
        small = jnp.einsum(
            "bhpwq,pq->bhw", patches,
            self.mask_downsample_kernel[:, :, 0, 0],
            precision=jax.lax.Precision.HIGHEST)[..., None] \
            + self.mask_downsample_bias
        prompts = {
            "prompt_point": jnp.full((b, 1, 3), -1.0),
            "prompt_box": jnp.zeros((b, 4)),
            "prompt_box_valid": jnp.zeros((b,)),
            "prompt_mask": small,
            "prompt_mask_valid": jnp.ones((b,)),
        }
        _, _, obj, pointer, _ = self._decode_frame(feat, prompts,
                                                   highres=highres)
        # reference gates on the downsampled mask's occupancy (:584-588)
        is_obj = jnp.any(small.reshape(b, -1) > 0.0,
                         axis=1).astype(pointer.dtype)[:, None]
        pointer = is_obj * pointer + \
            (1.0 - is_obj) * self.no_object_pointer[0]
        s4 = self.image_size // 4
        best_mask = jax.image.resize(m, (b, s4, s4), "nearest") * 20.0 \
            - 10.0
        carry = self._write_memory(carry, feat, best_mask, pointer,
                                   is_cond=jnp.bool_(True), obj_logits=obj)
        n_masks = self.mask_decoder.num_multimask_outputs + 1
        masks_up = jnp.broadcast_to(
            (m * 20.0 - 10.0)[:, None],
            (b, n_masks, self.image_size, self.image_size))
        return (masks_up, jnp.ones((b, n_masks)), obj), carry

    def add_prompt_frame(self, feat, prompts, carry, highres=None):
        """Add a new prompted (condition) frame mid-stream (reference
        sam2video_test.py add_new_object_prompt_input:286)."""
        masks, ious, obj, pointer, best_mask = self._decode_frame(
            feat, prompts, highres=highres)
        carry = self._write_memory(carry, feat, best_mask, pointer,
                                   is_cond=jnp.bool_(True),
                                   obj_logits=obj)
        return (masks, ious, obj), carry

    @staticmethod
    def _slice_prompts(prompts, t):
        """Per-frame slice of a [B,T,...] prompt dict (None passthrough)."""
        if prompts is None:
            return None
        return {k: (v[:, t] if v is not None else None)
                for k, v in prompts.items()}

    def __call__(self, images, frame0_prompts, gt_masks=None,
                 is_cond_frame=None, is_iter_frame=None, rng=None,
                 point_iters=0):
        """images [B, T, H, W, 3].

        frame0_prompts: SAM prompt dict. Two layouts:
        - frame-0 only (arrays without a T axis, e.g. prompt_point
          [B,P,3]): the original recipe — prompts on frame 0, pure
          tracking afterwards;
        - per-frame (arrays with a T axis, e.g. prompt_point [B,T,P,3]):
          the reference condition-frame recipe
          (sam2video_train.py:208-357 prepare_batch_prompt_inputs) —
          non-condition frames carry all-invalid prompts, which the prompt
          encoder maps to no-prompt embeddings.

        Training extensions (used with per-frame prompts):
        - is_cond_frame [T]: 1.0 where the frame is a condition frame
          (frame 0 is always one); steers the reserved memory slots;
        - is_iter_frame [T] + gt_masks [B,T,H,W] + rng + static
          point_iters > 0: point-iteration frames re-click the error
          region in-graph and re-decode (reference
          sam2video_train.py:840-911)."""
        feat16, pos16, hr4, hr8 = self.encode_frames_batch(images)
        return self.track_from_features(
            feat16, pos16, hr4, hr8, frame0_prompts, gt_masks=gt_masks,
            is_cond_frame=is_cond_frame, is_iter_frame=is_iter_frame,
            rng=rng, point_iters=point_iters)

    def encode_frames_batch(self, images):
        """images [B, T, H, W, 3] -> (feat16, pos16, hr4, hr8) with a
        leading [B, T] on each (hr* None unless use_high_res_features).
        The encoder half of __call__, exposed so the train step can be
        compiled as encoder / track / encoder-VJP stages (the fused
        T-frame graph compiles superlinearly — tools/perf/
        sam2_compile_lab.py)."""
        b, t_frames = images.shape[0], images.shape[1]
        s16 = self.image_size // 16
        flat = images.reshape(b * t_frames, *images.shape[2:])
        features, positions = self.image_encoder(flat)
        feat16 = features[-1].reshape(b, t_frames, s16, s16,
                                      self.fpn_planes)
        pos16 = positions[-1].reshape(b, t_frames, s16, s16,
                                      self.fpn_planes)
        hr4 = hr8 = None
        if self.use_high_res_features:
            s4, s8 = self.image_size // 4, self.image_size // 8
            hr4 = features[0].reshape(b, t_frames, s4, s4, self.fpn_planes)
            hr8 = features[1].reshape(b, t_frames, s8, s8, self.fpn_planes)
        return feat16, pos16, hr4, hr8

    def track_from_features(self, feat16, pos16, hr4, hr8, frame0_prompts,
                            gt_masks=None, is_cond_frame=None,
                            is_iter_frame=None, rng=None, point_iters=0):
        """The post-encoder half of __call__: prompt frame 0 then
        memory-track the remaining frames (nn.scan or unrolled). Split out
        so the encoder and the track loop can be profiled/compiled
        separately (tools/perf/sam2_compile_lab.py)."""
        b, t_frames = feat16.shape[0], feat16.shape[1]

        def hr_at(t):
            if hr4 is None:
                return None
            return (hr4[:, t], hr8[:, t])

        # per-frame prompts iff prompt_point carries a T axis: [B,T,P,3]
        pp = frame0_prompts.get("prompt_point") \
            if frame0_prompts is not None else None
        per_frame = pp is not None and pp.ndim == 4
        p0 = self._slice_prompts(frame0_prompts, 0) if per_frame \
            else frame0_prompts

        (masks0, ious0, obj0), carry = self.start_track(
            feat16[:, 0], p0, highres=hr_at(0))
        if t_frames == 1:
            return (masks0[:, None], ious0[:, None], obj0[:, None])

        refine = point_iters > 0 and gt_masks is not None and per_frame
        cond = is_cond_frame if is_cond_frame is not None else \
            jnp.zeros((t_frames,))
        iters = is_iter_frame if is_iter_frame is not None else \
            jnp.zeros((t_frames,))
        frame_rngs = jax.random.split(
            rng if rng is not None else jax.random.PRNGKey(0), t_frames)

        if self.use_scan:
            def body(mdl, carry, xt):
                out, carry = mdl.track_frame(
                    xt["feat"], xt["pos"], carry,
                    frame_prompts=xt.get("prompts"),
                    is_cond=xt["cond"],
                    gt_mask=xt.get("gt"),
                    iter_flag=xt["iter"],
                    rng=xt["rng"],
                    point_iters=point_iters if refine else 0,
                    highres=xt.get("hr"))
                return carry, out

            # broadcast every non-param collection too (the prompt
            # encoder keeps its gaussian PE matrix under "constants")
            scan = nn.scan(body,
                           variable_broadcast=("params", "constants",
                                               "batch_stats"),
                           split_rngs={"params": False},
                           in_axes=0, out_axes=0)
            xs = {
                "feat": feat16[:, 1:].swapaxes(0, 1),
                "pos": pos16[:, 1:].swapaxes(0, 1),
                "cond": cond[1:],
                "iter": iters[1:],
                "rng": frame_rngs[1:],
            }
            if per_frame:
                xs["prompts"] = {
                    k: v[:, 1:].swapaxes(0, 1)
                    for k, v in frame0_prompts.items() if v is not None}
            if refine:
                xs["gt"] = gt_masks[:, 1:].swapaxes(0, 1)
            if hr4 is not None:
                xs["hr"] = (hr4[:, 1:].swapaxes(0, 1),
                            hr8[:, 1:].swapaxes(0, 1))
            _, (m, i, o) = scan(self, carry, xs)
            return (jnp.concatenate([masks0[:, None],
                                     m.swapaxes(0, 1)], axis=1),
                    jnp.concatenate([ious0[:, None],
                                     i.swapaxes(0, 1)], axis=1),
                    jnp.concatenate([obj0[:, None],
                                     o.swapaxes(0, 1)], axis=1))

        # static python loop over frames (T is a static 1/8/16 in the
        # staged recipes); numerics identical to the scan path
        all_masks, all_ious, all_obj = [masks0], [ious0], [obj0]
        for t in range(1, t_frames):
            (masks, ious, obj), carry = self.track_frame(
                feat16[:, t], pos16[:, t], carry,
                frame_prompts=self._slice_prompts(frame0_prompts, t)
                if per_frame else None,
                is_cond=cond[t],
                gt_mask=gt_masks[:, t] if refine else None,
                iter_flag=iters[t],
                rng=frame_rngs[t],
                point_iters=point_iters if refine else 0,
                highres=hr_at(t))
            all_masks.append(masks)
            all_ious.append(ious)
            all_obj.append(obj)

        return (jnp.stack(all_masks, axis=1), jnp.stack(all_ious, axis=1),
                jnp.stack(all_obj, axis=1))


def sam2_hiera_tiny_video(**kwargs):
    return SAM2Video(embedding_planes=96, head_nums=1,
                     block_nums=(1, 2, 7, 2),
                     global_attention_blocks=(5, 7, 9), **kwargs)


def sam2_hiera_small_video(**kwargs):
    return SAM2Video(embedding_planes=96, head_nums=1,
                     block_nums=(1, 2, 11, 2),
                     global_attention_blocks=(7, 10, 13), **kwargs)


def sam2_hiera_base_plus_video(**kwargs):
    return SAM2Video(embedding_planes=112, head_nums=2,
                     block_nums=(2, 3, 16, 3),
                     global_attention_blocks=(12, 16, 20), **kwargs)


def sam2_hiera_large_video(**kwargs):
    return SAM2Video(embedding_planes=144, head_nums=2,
                     block_nums=(2, 6, 36, 4),
                     window_specification=(8, 4, 16, 8),
                     global_attention_blocks=(23, 33, 43), **kwargs)
