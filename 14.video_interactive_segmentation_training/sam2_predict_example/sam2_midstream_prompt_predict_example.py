"""SAM2 mid-stream prompt (correction click) example.

Covers the reference's add-prompt-mid-video flow
(sam2video_test.py add_new_object_prompt_input:286, exercised by the
test-predict notebooks): track from a frame-0 click, then at --refine-at
apply a correction click through add_prompt_frame — the frame becomes a
new condition frame whose memory occupies a reserved cond slot, steering
all subsequent tracking.

Usage:
  python sam2_midstream_prompt_predict_example.py --synthetic
  python sam2_midstream_prompt_predict_example.py --video clip.mp4 \
      --point 128,256 --refine-at 6 --refine-point 200,260
"""

import argparse
import os

import numpy as np

from _example_common import (build_stream_model, frame_prep_fn,
                             load_or_synthesize_frames)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--network", default="sam2_hiera_base_plus_video")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--point", default="128,256")
    p.add_argument("--refine-at", type=int, default=6,
                   help="frame index to apply the correction click")
    p.add_argument("--refine-point", default="176,256")
    p.add_argument("--max-frames", type=int, default=12)
    p.add_argument("--out-dir", default="sam2_midstream_tracked")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2_stream import (
        SAM2VideoStream)

    frames = load_or_synthesize_frames(
        None if args.synthetic else args.video, args.max_frames)
    h, w = frames[0].shape[:2]

    probe = {"prompt_point": jnp.full((1, 1, 3), -1.0, jnp.float32),
             "prompt_box": None, "prompt_mask": None}
    model, variables = build_stream_model(args.network, args.checkpoint,
                                          probe)
    prep, factor, (rh, rw) = frame_prep_fn(model.image_size, (h, w))

    def click(spec):
        x, y = [float(v) for v in spec.split(",")]
        return {"prompt_point": jnp.asarray(
            [[[x * factor, y * factor, 1.0]]], jnp.float32),
            "prompt_box": None, "prompt_mask": None}

    encode = jax.jit(lambda v, im: model.apply(
        v, im, method=SAM2VideoStream.encode_frame))
    start = jax.jit(lambda v, f, pr: model.apply(
        v, f, pr, method=SAM2VideoStream.start_track))
    step = jax.jit(lambda v, f, pos, c: model.apply(
        v, f, pos, c, method=SAM2VideoStream.track_frame))
    add_prompt = jax.jit(lambda v, f, pr, c: model.apply(
        v, f, pr, c, method=SAM2VideoStream.add_prompt_frame))

    os.makedirs(args.out_dir, exist_ok=True)

    def save(i, frame, masks, ious, corrected=False):
        best = np.asarray(masks)[0][int(np.asarray(ious)[0].argmax())]
        m = cv2.resize((best[:rh, :rw] > 0).astype(np.uint8), (w, h),
                       interpolation=cv2.INTER_NEAREST)
        vis = frame.astype(np.float32)
        color = [255, 128, 0] if corrected else [0, 255, 0]
        vis[m > 0] = vis[m > 0] * 0.5 + np.array(color, np.float32) * 0.5
        cv2.imwrite(os.path.join(args.out_dir, f"{i:05d}.jpg"),
                    cv2.cvtColor(vis.astype(np.uint8), cv2.COLOR_RGB2BGR))

    feat, _ = encode(variables, prep(frames[0]))
    (masks, ious, _), carry = start(variables, feat, click(args.point))
    save(0, frames[0], masks, ious)
    for i, frame in enumerate(frames[1:], start=1):
        feat, pos = encode(variables, prep(frame))
        if i == args.refine_at:
            # correction click: this frame becomes a condition frame
            (masks, ious, _), carry = add_prompt(
                variables, feat, click(args.refine_point), carry)
            save(i, frame, masks, ious, corrected=True)
        else:
            (masks, ious, _), carry = step(variables, feat, pos, carry)
            save(i, frame, masks, ious)
    print(f"tracked {len(frames)} frames with a correction at frame "
          f"{args.refine_at} -> {args.out_dir}/")


if __name__ == "__main__":
    main()
