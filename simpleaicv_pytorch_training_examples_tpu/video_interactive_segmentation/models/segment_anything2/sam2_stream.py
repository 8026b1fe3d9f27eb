"""SAM2 streaming inference (test-time tracking).

Parity with /root/reference/SimpleAICV/video_interactive_segmentation/
models/segment_anything2/sam2video_test.py:55-900 (SAM2VideoTest): the
reference carries a growing python `video_state_dict` cache
(init_video_state_dict:238, add_new_object_prompt_input:286,
forward_tracking_for_test:385) and walks frames eagerly.

TPU re-design: tracking state is an explicit fixed-shape pytree carry
(the same validity-masked ring buffers the training model uses), and each
of encode_frame / start_track / track_frame is one jittable function of
(variables, carry) -> (outputs, carry). A video of any length streams
through three compiled programs with zero recompilation and zero host
state; the carry can live on device for an entire stream.

Usage:
    model = SAM2VideoStream(**sizes)
    variables = model.init(...)                      # or restored
    feat, pos = model.apply(v, img, method=SAM2VideoStream.encode_frame)
    (mask, iou, obj), carry = model.apply(
        v, feat, prompts, method=SAM2VideoStream.start_track)
    for each next frame:
        feat, pos = model.apply(v, img, method=...encode_frame)
        (mask, iou, obj), carry = model.apply(
            v, feat, pos, carry, method=SAM2VideoStream.track_frame)
"""

import jax
import jax.numpy as jnp

from .sam2 import SAM2Video, get_1d_sine_pe

__all__ = ["SAM2VideoStream"]


class SAM2VideoStream(SAM2Video):
    """SAM2Video with per-frame streaming methods and an explicit carry."""

    def encode_frame(self, images):
        """images [B,H,W,3] -> (feat16 [B,s,s,C], pos16 [B,s,s,C])."""
        s16 = self.image_size // 16
        features, positions = self.image_encoder(images)
        b = images.shape[0]
        feat = features[-1].reshape(b, s16, s16, self.fpn_planes)
        pos = positions[-1].reshape(b, s16, s16, self.fpn_planes)
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
        }

    def _write_memory(self, carry, feat, best_mask, pointer, is_cond):
        """Encode (feat, mask) into memory; condition frames take slot 0,
        tracked frames rotate through slots 1..S-1."""
        b = feat.shape[0]
        s16 = self.image_size // 16
        n_mem = s16 * s16
        s_mem = self.memory_mask_nums
        frame_idx = carry["frame_idx"]
        mem, mem_pos = self.memory_encoder(
            feat, jax.image.resize(
                best_mask[..., None],
                (b, self.image_size, self.image_size, 1), "bilinear"))
        slot = jnp.where(is_cond, 0,
                         1 + (frame_idx - 1) % max(s_mem - 1, 1))
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
        return carry

    def start_track(self, feat, prompts):
        """Prompted first frame: decode + seed the memory carry."""
        b = feat.shape[0]
        masks, ious, obj, pointer, best_mask = self._decode_frame(
            feat, prompts)
        carry = self._empty_carry(b)
        carry = self._write_memory(carry, feat, best_mask, pointer,
                                   is_cond=jnp.bool_(True))
        return (masks, ious, obj), carry

    def track_frame(self, feat, pos, carry):
        """Unprompted frame: memory-conditioned decode + memory update.
        frame_idx is traced — one compiled program serves every frame."""
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

        masks, ious, obj, pointer, best_mask = self._decode_frame(
            conditioned, None)
        carry = self._write_memory(carry, feat, best_mask, pointer,
                                   is_cond=jnp.bool_(False))
        return (masks, ious, obj), carry

    def add_prompt_frame(self, feat, prompts, carry):
        """Add a new prompted (condition) frame mid-stream (reference
        add_new_object_prompt_input:286): decode with prompts, write the
        result into the condition slot."""
        masks, ious, obj, pointer, best_mask = self._decode_frame(
            feat, prompts)
        carry = self._write_memory(carry, feat, best_mask, pointer,
                                   is_cond=jnp.bool_(True))
        return (masks, ious, obj), carry
