"""SAM2 streaming inference (test-time tracking).

Parity with /root/reference/SimpleAICV/video_interactive_segmentation/
models/segment_anything2/sam2video_test.py:55-900 (SAM2VideoTest): the
reference carries a growing python `video_state_dict` cache
(init_video_state_dict:238, add_new_object_prompt_input:286,
forward_tracking_for_test:385) and walks frames eagerly.

TPU re-design: tracking state is an explicit fixed-shape pytree carry
(the same validity-masked ring buffers the training model uses), and each
of encode_frame / start_track / track_frame / add_prompt_frame /
add_mask_frame (mask-as-prompt, reference use_mask_as_output) is one
jittable function of (variables, carry) -> (outputs, carry). A video of
any length streams through a handful of compiled programs with zero
recompilation and zero host state. The step methods live on SAM2Video
itself (sam2.py — they double as the nn.scan training body); this alias
class is the test-time entry point:

    model = SAM2VideoStream(**sizes)
    feat, pos = model.apply(v, img, method=SAM2VideoStream.encode_frame)
    (mask, iou, obj), carry = model.apply(
        v, feat, prompts, method=SAM2VideoStream.start_track)
    for each next frame:
        feat, pos = model.apply(v, img, method=...encode_frame)
        (mask, iou, obj), carry = model.apply(
            v, feat, pos, carry, method=SAM2VideoStream.track_frame)
"""

from .sam2 import SAM2Video

__all__ = ["SAM2VideoStream"]


class SAM2VideoStream(SAM2Video):
    """Alias exposing SAM2Video's streaming step methods as the test-time
    tracker (the parity test proves stream == batched training forward)."""
