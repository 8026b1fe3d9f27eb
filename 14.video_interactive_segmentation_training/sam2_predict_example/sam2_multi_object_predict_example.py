"""SAM2 multi-object streaming prediction example.

Covers the reference's multi-object tracking notebooks
(/root/reference/14.video_interactive_segmentation_training/
sam2_predict_example/hiera_*_sam2video_test_predict_example*.ipynb with
several prompted objects): each clicked object gets its own batch row and
memory carry — the TPU-native fold of the reference's per-object memory
banks — and all objects stream through ONE jitted track_frame program.

Usage:
  python sam2_multi_object_predict_example.py --synthetic
  python sam2_multi_object_predict_example.py --video clip.mp4 \
      --points 128,256;384,256 [--checkpoint ckpt]
"""

import argparse
import os

import numpy as np

from _example_common import (build_stream_model, frame_prep_fn,
                             load_or_synthesize_frames)

COLORS = [(0, 255, 0), (255, 0, 0), (0, 128, 255), (255, 0, 255)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--network", default="sam2_hiera_base_plus_video")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--points", default="128,256;384,256",
                   help="semicolon-separated x,y per object")
    p.add_argument("--max-frames", type=int, default=16)
    p.add_argument("--out-dir", default="sam2_multi_tracked")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2_stream import (
        SAM2VideoStream)

    frames = load_or_synthesize_frames(
        None if args.synthetic else args.video, args.max_frames)
    h, w = frames[0].shape[:2]

    objects = [[float(v) for v in pt.split(",")]
               for pt in args.points.split(";")]
    n_obj = len(objects)

    probe = {"prompt_point": jnp.full((1, 1, 3), -1.0, jnp.float32),
             "prompt_box": None, "prompt_mask": None}
    model, variables = build_stream_model(args.network, args.checkpoint,
                                          probe)
    prep, factor, (rh, rw) = frame_prep_fn(model.image_size, (h, w))

    # one batch row per object, shared frames
    pts = np.full((n_obj, 1, 3), -1.0, np.float32)
    for i, (x, y) in enumerate(objects):
        pts[i, 0] = [x * factor, y * factor, 1.0]
    prompts = {"prompt_point": jnp.asarray(pts),
               "prompt_box": None, "prompt_mask": None}

    encode = jax.jit(lambda v, im: model.apply(
        v, im, method=SAM2VideoStream.encode_frame))
    start = jax.jit(lambda v, f, pr: model.apply(
        v, f, pr, method=SAM2VideoStream.start_track))
    step = jax.jit(lambda v, f, pos, c: model.apply(
        v, f, pos, c, method=SAM2VideoStream.track_frame))

    os.makedirs(args.out_dir, exist_ok=True)

    def save(i, frame, masks, ious):
        vis = frame.astype(np.float32)
        masks = np.asarray(masks)
        ious = np.asarray(ious)
        for obj in range(n_obj):
            best = masks[obj][int(ious[obj].argmax())]
            m = cv2.resize((best[:rh, :rw] > 0).astype(np.uint8), (w, h),
                           interpolation=cv2.INTER_NEAREST)
            color = np.array(COLORS[obj % len(COLORS)], np.float32)
            vis[m > 0] = vis[m > 0] * 0.5 + color * 0.5
        cv2.imwrite(os.path.join(args.out_dir, f"{i:05d}.jpg"),
                    cv2.cvtColor(vis.astype(np.uint8), cv2.COLOR_RGB2BGR))

    # encode each frame ONCE and broadcast the features across the
    # object rows (the encoder dominates per-frame cost; the per-object
    # work is only the memory-conditioned decode)
    def tile(t):
        return jnp.tile(t, (n_obj, 1, 1, 1))

    feat, _ = encode(variables, prep(frames[0]))
    (masks, ious, _), carry = start(variables, tile(feat), prompts)
    save(0, frames[0], masks, ious)
    for i, frame in enumerate(frames[1:], start=1):
        feat, pos = encode(variables, prep(frame))
        (masks, ious, _), carry = step(variables, tile(feat), tile(pos),
                                       carry)
        save(i, frame, masks, ious)
    print(f"tracked {n_obj} objects over {len(frames)} frames -> "
          f"{args.out_dir}/")


if __name__ == "__main__":
    main()
