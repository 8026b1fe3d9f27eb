"""SAM2 mask-as-prompt tracking example.

Covers the reference's mask-input flow (sam2video_train.py
use_mask_as_output:559-590, exercised by the mask-prompt predict
notebooks): seed tracking from a FULL first-frame mask instead of clicks
— the given mask is the frame-0 output verbatim, its memory conditions
every later frame, and the decoder is consulted only for the object
pointer and occlusion score.

Usage:
  python sam2_mask_prompt_predict_example.py --synthetic
  python sam2_mask_prompt_predict_example.py --video clip.mp4 \
      --mask first_frame_mask.png
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
    p.add_argument("--mask", default="",
                   help="first-frame binary mask png; synthetic when empty")
    p.add_argument("--network", default="sam2_hiera_base_plus_video")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--max-frames", type=int, default=12)
    p.add_argument("--out-dir", default="sam2_mask_prompt_tracked")
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

    if args.mask:
        mask = cv2.imread(args.mask, cv2.IMREAD_GRAYSCALE)
        mask = (mask > 127).astype(np.float32)
    else:
        # synthetic disc roughly matching the synthetic moving object
        mask = np.zeros((h, w), np.float32)
        cv2.circle(mask, (w // 4, h // 2), min(h, w) // 6, 1.0, -1)
    # resize to the model input grid (same letterboxing as the frames)
    mfull = np.zeros((model.image_size, model.image_size), np.float32)
    mr = cv2.resize(mask, (rw, rh), interpolation=cv2.INTER_NEAREST)
    mfull[:rh, :rw] = mr

    encode = jax.jit(lambda v, im: model.apply(
        v, im, method=SAM2VideoStream.encode_frame))
    add_mask = jax.jit(lambda v, f, m, c: model.apply(
        v, f, m, c, method=SAM2VideoStream.add_mask_frame))
    step = jax.jit(lambda v, f, pos, c: model.apply(
        v, f, pos, c, method=SAM2VideoStream.track_frame))

    os.makedirs(args.out_dir, exist_ok=True)

    def save(i, frame, masks, ious, seeded=False):
        best = np.asarray(masks)[0][int(np.asarray(ious)[0].argmax())]
        m = cv2.resize((best[:rh, :rw] > 0).astype(np.uint8), (w, h),
                       interpolation=cv2.INTER_NEAREST)
        vis = frame.astype(np.float32)
        color = [255, 0, 128] if seeded else [0, 255, 0]
        vis[m > 0] = vis[m > 0] * 0.5 + np.array(color, np.float32) * 0.5
        cv2.imwrite(os.path.join(args.out_dir, f"{i:05d}.jpg"),
                    cv2.cvtColor(vis.astype(np.uint8), cv2.COLOR_RGB2BGR))

    feat, _ = encode(variables, prep(frames[0]))
    carry = model.apply(variables, 1,
                        method=lambda mdl, b: mdl._empty_carry(b))
    (masks, ious, _), carry = add_mask(
        variables, feat, jnp.asarray(mfull)[None], carry)
    save(0, frames[0], masks, ious, seeded=True)
    for i, frame in enumerate(frames[1:], start=1):
        feat, pos = encode(variables, prep(frame))
        (masks, ious, _), carry = step(variables, feat, pos, carry)
        save(i, frame, masks, ious)
    print(f"tracked {len(frames)} frames from a mask prompt -> "
          f"{args.out_dir}/")


if __name__ == "__main__":
    main()
